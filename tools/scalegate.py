#!/usr/bin/env python3
"""k-replica scale correctness gate (VERDICT r9 item #1).

Runs graft.ScaleGate (dumps the gated queries' results on a k x
replica of sf0.1), then replays each query's oracle SQL in DuckDB over
the SAME replica tables and compares STREAMING, inside DuckDB itself:
both sides reduce to one digest row — (count, sum(hash(row)),
bit_xor(hash(row))) over name-sorted, type-normalized columns — so the
comparator's memory is bounded by DuckDB's aggregate pipeline, not the
frame (r12's pandas comparator peaked ~90 GB RSS on the 74.7M-row
fs_es_docs frame; this is the r12 verdict's "move the compare into
DuckDB" item). The row-hash digest is exactly as strict as the old
exact compare on hash-clean queries (sum+xor+count over per-row hashes;
floats hash bit-exactly) — it only loses the ulp-vs-hard diagnostic,
so on a mismatch SMALL frames fall back to the pandas comparator for
the detailed per-column diff.

Usage: python3 tools/scalegate.py [k] [--skip-dump]
"""
import json
import os
import resource
import shutil
import subprocess
import sys
import time
from pathlib import Path

import duckdb

from diffcheck import ADD_OPENS, REPO, cmp_frames

K = next((a for a in sys.argv[1:] if not a.startswith("-")), "10")
# honor the same override graft.ScaleGate itself honors — the scrubbed
# subprocess env would otherwise silently pin the default corpus
SFDIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = REPO / "target" / "scalegate"
OUT = ROOT / "verify"

# below this row count a digest mismatch re-runs the pandas comparator
# for the per-column diagnosis; above it the digest verdict stands
FALLBACK_ROWS = 5_000_000

# replica-reuse mode (see ScaleGate.scala): the materialized-oracle db
# rides the replica's lifetime — kept and reused across reuse
# invocations (a CTE whose effective SQL hash matches its registry
# entry is not rebuilt; at k=1000 the es_docs rollup alone is ~19 min),
# wiped with the replica on any fresh run
REUSE = os.environ.get("SPARK_GRAFT_REUSE_REPLICA") == "1"


def run_dump():
    # SPARK_GRAFT_SHARDS=S (>1) drives S sequential CHILD JVM passes:
    # pass i dumps bucket i of each sharded query (ScaleGate
    # .shardedForms — exact per-key slices; digests are abelian so the
    # union of shard files compares like one dump). One JVM per pass
    # guarantees each pass's shuffle files are gone before the next —
    # the in-JVM alternative leaks them until GC and re-hits the disk
    # reservation the sharding exists to fit under.
    n = int(os.environ.get("SPARK_GRAFT_SHARDS", "1"))
    if n > 1:
        for i in range(n):
            run_dump_pass(shard=(i, n))
    else:
        run_dump_pass(shard=None)


def run_dump_pass(shard=None, attempt=0):
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += [
        # dump-JVM heap: 24g covers every dump now that ScaleGate
        # scales shuffle partitions with k (per-task window/sort state
        # stays flat); SPARK_GRAFT_DUMP_XMX remains as an escape hatch
        f"-Xmx{os.environ.get('SPARK_GRAFT_DUMP_XMX', '24g')}",
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        # shuffle/spill compression: the k>=100 dumps are disk-bound on
        # repetitive path strings — zstd packs them 2-4x tighter than
        # lz4, which is the difference between fitting the sandbox disk
        # and r13's ENOSPC (core conf: must be set at context creation)
        "-Dspark.io.compression.codec=zstd",
        "-Dspark.io.compression.zstd.level=6",
        "-Dspark.shuffle.mapStatus.compression.codec=zstd",
        "-cp",
        f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.ScaleGate", K, SFDIR, str(ROOT),
    ]
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "SPARK_GRAFT_CPUS": "32",
           # a gate JVM touches each fixture frame once: the bench-side
           # MEMORY_AND_DISK persist of files/entries is pure downside
           # here (its overflow alone is ~100 GB of disk at k=1000 —
           # the r13 "disk-bound" root cause)
           "SPARK_GRAFT_NO_CACHE": "1"}
    # pass the gate-subset override through the scrubbed env (the
    # k=100 decade runs only the heaviest rows)
    if os.environ.get("SPARK_GRAFT_GATED"):
        env["SPARK_GRAFT_GATED"] = os.environ["SPARK_GRAFT_GATED"]
    # replica-reuse recovery path (see ScaleGate.scala): dump against
    # the replica an earlier invocation materialized, no wipe
    if os.environ.get("SPARK_GRAFT_REUSE_REPLICA"):
        env["SPARK_GRAFT_REUSE_REPLICA"] = \
            os.environ["SPARK_GRAFT_REUSE_REPLICA"]
    if shard is not None:
        env["SPARK_GRAFT_SHARD"] = str(shard[0])
        env["SPARK_GRAFT_SHARDS"] = str(shard[1])
    r = subprocess.run(cmd, env=env)
    if r.returncode != 0:
        # one retry per pass: every pass is idempotent (overwrite-mode
        # dumps; staging gated on _SUCCESS so a torn build restarts
        # from scratch) and the one observed transient is Spark's
        # async shuffle-GC racing a still-running AQE write job
        if attempt == 0:
            print(f"pass {shard} exited {r.returncode} — retrying once")
            return run_dump_pass(shard=shard, attempt=1)
        sys.exit(f"scalegate dump exited {r.returncode}")


def type_category(t):
    """Map a DuckDB type name to a compare category."""
    t = t.upper()
    if t.endswith("[]"):
        return "list:" + type_category(t[:-2])
    if t.startswith("DECIMAL") or t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t.startswith("TIMESTAMP"):
        return "timestamp"
    return t


def norm_expr(name, t):
    """Normalized column expression so equal logical values hash
    identically on both sides: integer widths already hash-normalize in
    DuckDB; floats/decimals pin to DOUBLE, timestamps to naive
    TIMESTAMP (the session is UTC on both engines), float lists to
    DOUBLE[]."""
    cat = type_category(t)
    q = f'"{name}"'
    if cat == "float":
        return f"CAST({q} AS DOUBLE)"
    if cat == "timestamp":
        return f"CAST({q} AS TIMESTAMP)"
    if cat == "list:float":
        return f"CAST({q} AS DOUBLE[])"
    return q


def digest(con, from_sql, cols_types):
    """One streaming pass -> (rows, sum-of-row-hashes, xor-of-row-
    hashes) over name-sorted normalized columns."""
    packed = ", ".join(
        f"c{i} := {norm_expr(n, t)}"
        for i, (n, t) in enumerate(sorted(cols_types)))
    h = f"hash(struct_pack({packed}))"
    row = con.execute(
        f"SELECT count(*), sum({h}::HUGEINT), bit_xor({h}) "
        f"FROM {from_sql}").fetchone()
    return row


def slice_at_site(sql, site, key, nb, i):
    """Rewrite `sql` so the bucket slice lands INSIDE the named CTE
    (`site AS (SELECT * FROM (body) WHERE hash(key) % nb = i)`) rather
    than above the whole query. Needed for window-topped oracles:
    DuckDB pushes an output-level hash-slice through joins and GROUP
    BYs on the key but NOT below a WINDOW, so each fs_merge_upsert
    bucket pass re-materialized the full 1.2B-row row_number window
    (~80 GB spill x 8 passes — the r16 ENOSPC). Exactness is declared
    per query in ScaleGate.bucketSites (the site must be
    partition-aligned with the key); the failure mode is loud — an
    overlapping or leaky slice changes the digest count/sum and the
    compare FAILs. Returns None when the site CTE is not present in
    `sql` (e.g. it was materialized away) — caller falls back to the
    output-level slice."""
    ctes, final = split_ctes(sql)
    if not any(n == site for n, _ in ctes):
        return None
    out = []
    for n, b in ctes:
        if n == site:
            b = (f'SELECT * FROM ({b}) '
                 f'WHERE hash("{key}") % {nb} = {i}')
        out.append(f"{n} AS ({b})")
    return "WITH " + ", ".join(out) + " " + final


def digest_bucketed(con, oracle_sql, cols_types, key, nb, site=None):
    """The oracle digest computed bucket-by-bucket and combined —
    digests are abelian (count/sum add, xor xors), so slicing the
    oracle's OUTPUT rows on `hash(key) % nb` is exact for ANY column,
    while a key that is the query's final join/group key lets DuckDB
    push the slice through that operator and bound its state to ~1/nb
    of the frame per pass (the r13 verdict's key-range-bucketed
    compare: the 600-747M-row joins at k=1000 never materialize in one
    hash table). For window-topped queries the slice is instead
    injected at the declared partition-aligned CTE (`site`, from
    ScaleGate.bucketSites — see slice_at_site). Inputs are re-scanned
    nb times — scan bandwidth traded for a fixed memory cap, on a
    once-per-round tool."""
    tot_n, tot_sum, tot_xor = 0, 0, 0
    for i in range(nb):
        sliced = site and slice_at_site(oracle_sql, site, key, nb, i)
        if sliced is None:
            sliced = (f'SELECT * FROM ({oracle_sql}) '
                      f'WHERE hash("{key}") % {nb} = {i}')
        n, s, x = digest(con, f"({sliced})", cols_types)
        tot_n += n
        tot_sum += s or 0
        tot_xor ^= x or 0
    return (tot_n, tot_sum if tot_n else None,
            tot_xor if tot_n else None)


def split_ctes(sql):
    """Split `WITH a AS (...), b AS (...) SELECT ...` into
    ([(name, body), ...], final_select). Paren-depth scan, aware of
    single-quoted strings ('' escape). Returns ([], sql) for anything
    it cannot handle exactly (not a WITH query, WITH RECURSIVE, parse
    surprise) — the caller then runs the oracle untransformed."""
    import re as _re
    s = sql.strip()
    m0 = _re.match(r"(?is)^\s*WITH\s+", s)
    if not m0 or _re.match(r"(?is)^\s*WITH\s+RECURSIVE\b", s):
        return [], sql
    i, n, ctes = m0.end(), len(s), []
    while True:
        m = _re.match(r"(?is)\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(",
                      s[i:])
        if not m:
            return [], sql
        body_start = i + m.end()
        j, depth, inq = body_start, 1, False
        while j < n and depth:
            c = s[j]
            if inq:
                if c == "'":
                    if j + 1 < n and s[j + 1] == "'":
                        j += 1
                    else:
                        inq = False
            elif c == "'":
                inq = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            j += 1
        if depth:
            return [], sql
        ctes.append((m.group(1), s[body_start:j - 1]))
        k = j
        while k < n and s[k] in " \t\r\n":
            k += 1
        if k < n and s[k] == ",":
            i = k + 1
        else:
            return ctes, s[k:]


def strip_top_order(sql):
    """Drop a TRAILING top-level ORDER BY from the oracle — the DuckDB
    mirror of ScaleGate.stripTopSort: the digest is order-insensitive,
    and at k=1000 the final sort materializes the full (or per-bucket)
    output before the aggregate ever sees a row — tens of GB of spill
    for nothing. Only strips when nothing but sort terms follow (an
    ORDER BY feeding a LIMIT/OFFSET is semantics and stays). Quote- and
    paren-aware; returns sql unchanged when unsure."""
    import re as _re
    s = sql.rstrip()
    depth, inq, last = 0, False, -1
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if inq:
            if c == "'":
                if i + 1 < n and s[i + 1] == "'":
                    i += 1
                else:
                    inq = False
        elif c == "'":
            inq = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and s[i:i + 8].upper() == "ORDER BY":
            last = i
        i += 1
    if last < 0:
        return sql
    tail = s[last:]
    if _re.search(r"(?i)\b(LIMIT|OFFSET|FETCH)\b", tail):
        return sql
    return s[:last].rstrip()


def materialize_ctes(con, name, oracle_sql, only=None):
    """Materialize (part of) a WITH chain into temp tables,
    dependency-aware: a chosen CTE becomes a TEMP TABLE (later bodies
    resolve to it by name), and a table is dropped the moment no
    remaining body or the final SELECT references it — so peak disk is
    the live working set, not the whole chain. CTEs NOT chosen stay
    INLINE: each CREATE and the returned final select carry a WITH
    prefix of the preceding un-materialized CTEs (DuckDB does not
    execute unreferenced CTEs, so over-listing costs nothing).
    Returns (final_sql, created_tables).

    WHY `only`: at k=1000 DuckDB's per-use CTE inlining replicates the
    corpus-synthesis join in EVERY consumer branch of one pass (the
    EXPLAIN shows lineitem⋈orders built 4× concurrently — >60 GB of
    spill, ENOSPC three times), while materializing EVERY corpus CTE
    is its own disk blow-up (the linear fs_base→fs_named→fs_files
    chain stored three corpus-sized tables). The fix is to materialize
    exactly the SHARED/expensive nodes (`fs_files,fs_entries,...`) and
    leave single-use chain links inline. Exactness: CREATE TABLE AS
    evaluates the identical CTE body; digests are unaffected."""
    import re as _re
    ctes, final = split_ctes(oracle_sql)
    if not ctes:
        return oracle_sql, []
    matset = {n for n, _ in ctes} if only is None else set(only)
    # prune the chosen set to CTEs actually REACHABLE from the final
    # select: the oracles share a common CTE prelude (fs_dirs/
    # fs_entries/fs_links exist in every fs oracle's text), so a
    # caller-chosen shared node can be dead code for one query — and
    # materializing a dead CTE at k=1000 is corpus-scale disk and
    # compute for nothing (DuckDB never executes unreferenced inline
    # CTEs; keep that property under materialization)
    bodies = dict(ctes)
    live_names = set()
    frontier = [final]
    while frontier:
        t = frontier.pop()
        for n in bodies:
            if n not in live_names and \
                    _re.search(rf"\b{_re.escape(n)}\b", t):
                live_names.add(n)
                frontier.append(bodies[n])
    dead = sorted(matset - live_names)
    if dead:
        print(f"  [{name}] skipping dead CTE(s) {dead} — not reachable "
              "from this oracle's final select", flush=True)
        matset &= live_names
    created = []

    def prefix(upto, target):
        """WITH-prefix of kept (inline) CTEs for `target` (a CREATE
        body or the final select) — restricted to CTEs the target
        actually reaches, walking kept bodies only (a materialized
        name resolves to its table and stops the walk). The pruning is
        LOAD-BEARING, not cosmetic: DuckDB auto-materializes a CTE
        referenced more than once, so a DEAD prefix entry that
        re-references a live one (es_docs: `anc` references
        `fs_entries` after `roll` is materialized) double-counts the
        reference and DuckDB materialized the 747M-row fs_entries —
        ~40 GB of temp and the second r16 ENOSPC."""
        keep = [(n, b) for n, b in ctes[:upto] if n not in matset]
        if not keep:
            return ""
        kb = dict(keep)
        need, frontier = set(), [target]
        while frontier:
            t = frontier.pop()
            for n2, b2 in kb.items():
                if n2 not in need and \
                        _re.search(rf"\b{_re.escape(n2)}\b", t):
                    need.add(n2)
                    frontier.append(b2)
        keep = [(n, b) for n, b in keep if n in need]
        if not keep:
            return ""
        return "WITH " + ", ".join(
            f"{n} AS ({b})" for n, b in keep) + " "

    import hashlib
    con.execute("CREATE TABLE IF NOT EXISTS _mat_registry"
                "(name VARCHAR, hash VARCHAR)")
    for idx, (nm, body) in enumerate(ctes):
        if nm not in matset:
            continue
        # cross-invocation reuse (REUSE mode): a stored table is valid
        # iff its EFFECTIVE SQL (inline prefix + body — two oracles
        # can declare different CTEs under one name, e.g. the two
        # `roll` variants) hashes to its registry entry; a mismatch
        # rebuilds under the same name
        eff = f"{prefix(idx, body)}{body}"
        h = hashlib.md5(eff.encode()).hexdigest()
        if REUSE:
            reg = con.execute(
                "SELECT hash FROM _mat_registry WHERE name = ?",
                [nm]).fetchone()
            have = con.execute(
                "SELECT count(*) FROM duckdb_tables() "
                "WHERE table_name = ?", [nm]).fetchone()[0]
            if reg and reg[0] == h and have:
                created.append(nm)
                print(f"  [{name}] cte {nm} reused from a previous "
                      "invocation (effective-SQL hash match)",
                      flush=True)
                continue
        t0 = time.time()
        # a plain (file-backed) table, NOT a temp table: the connection
        # is opened on ROOT/oracle-mat.db, so the stored chain gets
        # DuckDB's real columnar compression (~20 B/row on the fs_base
        # corpus vs ~4x that in temp-storage blocks) — at k=1000 that
        # is the difference between ~16 GB and ~60 GB of held disk
        con.execute(f'DROP TABLE IF EXISTS "{nm}"')
        con.execute("DELETE FROM _mat_registry WHERE name = ?", [nm])
        con.execute(f'CREATE TABLE "{nm}" AS {eff}')
        con.execute("INSERT INTO _mat_registry VALUES (?, ?)", [nm, h])
        created.append(nm)
        # liveness must count kept (INLINE) CTEs already passed, not
        # just remaining bodies: prefix() re-inlines every kept body
        # into each later CREATE and into the final select, so a kept
        # CTE that references a materialized table keeps that table
        # live for the whole chain. (r15 advice: ctes [A(mat),
        # B(inline, refs A), C(mat)], final refs B — dropping A at C's
        # step made the final's re-inlined 'WITH B AS (...)' fail with
        # table-not-found, and under DROP_AFTER_COMPARE the spark dump
        # was already gone, so the spurious FAIL cost a full re-dump.)
        later = " ".join(b for n2, b in ctes if n2 not in matset) + \
            " " + " ".join(b for _, b in ctes[idx + 1:]) + " " + final
        dropped = False
        # under REUSE, keep dead-chain tables too: a later invocation
        # against the same replica may reuse them, and the db is wiped
        # with the replica anyway
        for t in ([] if REUSE else list(created)):
            if not _re.search(rf"\b{_re.escape(t)}\b", later):
                con.execute(f'DROP TABLE IF EXISTS "{t}"')
                con.execute(
                    "DELETE FROM _mat_registry WHERE name = ?", [t])
                created.remove(t)
                dropped = True
        if dropped:
            # reclaim the dropped tables' blocks now (file-backed db):
            # without the checkpoint the freed blocks stay pinned by
            # the WAL until some later auto-checkpoint — exactly the
            # window the drop exists to shrink
            con.execute("CHECKPOINT")
        tmp = ROOT / "duckdb-tmp"
        tmp_gb = sum(f.stat().st_size for f in tmp.glob("*")
                     if f.is_file()) / 1e9 if tmp.exists() else 0.0
        db_gb = sum(os.path.getsize(p) for p in
                    [ROOT / "oracle-mat.db",
                     ROOT / "oracle-mat.db.wal"] if p.exists()) / 1e9
        print(f"  [{name}] cte {nm} materialized in "
              f"{time.time() - t0:.1f} s (live: {created}, "
              f"db {db_gb:.1f} GB, temp-dir {tmp_gb:.1f} GB)",
              flush=True)
    return prefix(len(ctes), final) + final, created


def cmp_digest(con, name, spark_from, oracle_sql, bucket_key=None,
               n_buckets=1, drop_dump=None, bucket_site=None,
               recorded=None):
    """DuckDB-side streaming compare; returns None on match, else a
    message (FAIL unless it starts with OK).

    `drop_dump`: a directory to delete the moment the SPARK side's
    digest is captured, BEFORE the oracle runs — the oracle's
    corpus-scale spill (rollup rebuild + join builds, NOT sliceable by
    the output-bucket predicate) and the dump cannot coexist under the
    k=1000 disk ceiling. Only taken for frames too large for the
    pandas fallback anyway (the fallback re-reads the dump)."""
    # `recorded`: a sidecar digest persisted by a previous invocation
    # whose ORACLE leg failed after DROP_AFTER_COMPARE deleted the dump
    # — the spark side was already read and digested by this same tool,
    # so a retry must not cost a multi-hundred-GB re-dump
    if recorded is not None:
        s_cols = sorted((c, t) for c, t in recorded["cols"])
    else:
        sc = con.execute(
            f"DESCRIBE SELECT * FROM {spark_from}").fetchall()
        s_cols = sorted((r[0], r[1]) for r in sc)
    oc = con.execute(f"DESCRIBE ({oracle_sql})").fetchall()
    o_cols = sorted((r[0], r[1]) for r in oc)
    if [c for c, _ in s_cols] != [c for c, _ in o_cols]:
        return (f"SCHEMA cols {[c for c, _ in s_cols]} vs "
                f"{[c for c, _ in o_cols]}")
    for (n1, t1), (_, t2) in zip(s_cols, o_cols):
        c1, c2 = type_category(t1), type_category(t2)
        if c1 != c2:
            # driver fidelity: int-vs-float drift fails the driver's
            # typed hash even when values match — fail it here too
            return (f"{n1}(DTYPE-DRIFT {t1} vs {t2} — pin the oracle "
                    "with CAST)")
    if recorded is not None:
        sd = (recorded["rows"], int(recorded["sum"]),
              int(recorded["xor"]))
        print(f"  [{name}] spark digest from sidecar {sd}", flush=True)
    else:
        sd = digest(con, spark_from, s_cols)
    if recorded is None and drop_dump is not None \
            and sd[0] > FALLBACK_ROWS:
        # persist the digest BEFORE deleting the dump: a failed oracle
        # leg can then retry with --skip-dump against the sidecar
        (OUT / f"{name}.sparkdigest.json").write_text(json.dumps(
            {"rows": sd[0], "sum": str(sd[1]), "xor": str(sd[2]),
             "cols": s_cols}))
        print(f"  [{name}] spark digest captured {sd} — "
              "dropping the dump before the oracle runs "
              "(digest persisted to sidecar)", flush=True)
        shutil.rmtree(drop_dump, ignore_errors=True)
    # the SPARK side is a plain parquet glob — one streaming aggregate,
    # constant space — so only the ORACLE (whose joins/windows carry
    # the memory) is ever bucketed. SPARK_GRAFT_ORACLE_MATERIALIZE=1
    # additionally pre-materializes the oracle's CTE chain into temp
    # tables so the corpus-synthesis joins are paid ONCE, not per pass.
    created = []
    oracle_sql0 = oracle_sql  # the untransformed SQL, for the fallback
    try:
        # the digest never needs the oracle's trailing global sort —
        # drop it (the DuckDB mirror of ScaleGate.stripTopSort; at
        # k=1000 that sort materialized the full output under the
        # aggregate, tens of GB of spill for nothing)
        oracle_sql = strip_top_order(oracle_sql)
        mat = os.environ.get("SPARK_GRAFT_ORACLE_MATERIALIZE")
        if mat:  # "1" = every CTE; else a comma list of shared nodes
            oracle_sql, created = materialize_ctes(
                con, name, oracle_sql,
                only=None if mat == "1"
                else [t.strip() for t in mat.split(",") if t.strip()])
        od = digest_bucketed(con, oracle_sql, o_cols, bucket_key,
                             n_buckets, site=bucket_site) \
            if n_buckets > 1 and bucket_key \
            else digest(con, f"({oracle_sql})", o_cols)
    finally:
        # REUSE keeps the materialized chain for later invocations
        # against the same replica (wiped with it on any fresh run)
        for t in ([] if REUSE else created):
            con.execute(f'DROP TABLE IF EXISTS "{t}"')
            con.execute("DELETE FROM _mat_registry WHERE name = ?", [t])
        if created and not REUSE:  # reclaim blocks for the next query
            con.execute("CHECKPOINT")
    if sd[0] != od[0]:
        return f"ROWS {sd[0]} vs {od[0]}"
    if sd == od:
        return None
    # digests disagree: small frames get the pandas diagnosis
    if sd[0] <= FALLBACK_ROWS:
        spark_df = con.execute(f"SELECT * FROM {spark_from}").df()
        oracle_df = con.execute(oracle_sql0).df()
        return cmp_frames(name, spark_df, oracle_df) or \
            "DIGEST mismatch but pandas compare clean (hash-norm bug?)"
    return (f"DIGEST sum {sd[1]} vs {od[1]} / xor {sd[2]} vs {od[2]} "
            f"on {sd[0]} rows (too large for the per-column fallback)")


def main():
    if "--skip-dump" not in sys.argv:
        print(f"running graft.ScaleGate k={K} ...")
        run_dump()
    # file-backed connection: SPARK_GRAFT_ORACLE_MATERIALIZE stores its
    # CTE chain as plain tables here, getting DuckDB's columnar
    # compression instead of temp-storage blocks (see materialize_ctes)
    # — always started fresh and removed on exit; an in-memory default
    # would silently fall back to temp tables
    matdb = ROOT / "oracle-mat.db"
    if not REUSE:  # the mat db rides the replica's lifetime
        matdb.unlink(missing_ok=True)
        Path(str(matdb) + ".wal").unlink(missing_ok=True)
    con = duckdb.connect(str(matdb))
    # the digest comparator is constant-space, but the ORACLE queries
    # themselves build hash joins/windows over the k-replica (33 GB
    # observed at k=100 unbounded) — cap DuckDB so the k=1000 decade
    # spills to disk instead of OOMing the box
    mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "24GB")
    con.execute(f"SET memory_limit='{mem}'")
    # order is irrelevant to an order-insensitive digest, and dropping
    # insertion-order preservation lets DuckDB stream several of the
    # big pipelines instead of materializing them
    con.execute("SET preserve_insertion_order=false")
    tmp = ROOT / "duckdb-tmp"
    # an aborted earlier run can leave tens of GB of spill here —
    # start from an empty spill dir, and empty it again on exit
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        src = ROOT / "data" / f"{t}.parquet"
        glob = f"{src}/*.parquet" if src.is_dir() else str(src)
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{glob}')")
    oracles = json.loads((OUT / "oracle_sql.json").read_text())
    meta_p = OUT / "gate_meta.json"
    bucket_keys = {}
    if meta_p.exists():
        meta = json.loads(meta_p.read_text())
        tag = "OVERRIDE subset" if meta.get("override") else "full gate"
        print(f"gate_meta: k={meta.get('k')} {tag}: "
              f"{', '.join(meta.get('gated', []))}")
        bucket_keys = meta.get("bucket_keys", {})
        bucket_sites = meta.get("bucket_sites", {})
    # SPARK_GRAFT_ORACLE_BUCKETS=B (default 1 = single pass) slices
    # each oracle's digest into B hash-range passes over its declared
    # bucket key — the memory-capped mode for the k=1000 decade
    n_buckets = int(os.environ.get("SPARK_GRAFT_ORACLE_BUCKETS", "1"))
    if n_buckets > 1:
        print(f"oracle digests bucketed x{n_buckets} on: "
              f"{bucket_keys or '(no keys — single pass)'}")
    # oracle_sql.json / gate_meta.json are MERGED across reuse
    # invocations (the full record of what the artifact covers), but
    # THIS invocation only compares the queries it was asked to gate —
    # a recorded sibling compared-and-dropped by an earlier pass must
    # not re-fail here as NO SPARK OUTPUT
    subset = os.environ.get("SPARK_GRAFT_GATED")
    names = sorted(oracles)
    if subset:
        asked = [n.strip() for n in subset.split(",") if n.strip()]
        skipped = [n for n in names if n not in asked]
        names = [n for n in names if n in asked]
        if skipped:
            print("comparing this invocation's subset "
                  f"{names}; recorded siblings {skipped} keep their "
                  "earlier verdicts")
    n_fail = 0
    for name in names:
        # rglob: sharded dumps nest shard-i/ dirs under the query dir
        files = list((OUT / name).rglob("*.parquet")) \
            if (OUT / name).is_dir() else []
        sidecar = OUT / f"{name}.sparkdigest.json"
        recorded = None
        if not files and sidecar.exists():
            recorded = json.loads(sidecar.read_text())
            print(f"  [{name}] no dump on disk — retrying against the "
                  f"persisted spark digest ({recorded['rows']} rows)")
        elif not files:
            print(f"FAIL {name}: NO SPARK OUTPUT")
            n_fail += 1
            continue
        glob_sql = f"read_parquet('{OUT / name}/**/*.parquet')" \
            if any(f.parent != OUT / name for f in files) \
            else f"read_parquet('{OUT / name}/*.parquet')"
        t0 = time.time()
        # SPARK_GRAFT_DROP_AFTER_COMPARE=1: free each query's dump as
        # soon as its SPARK-side digest is captured (inside cmp_digest,
        # before the oracle runs) — at k=1000 a dump and the oracle's
        # per-pass spill cannot coexist under the disk ceiling (the
        # first r15 run lost both compares to exactly that ENOSPC)
        drop = (OUT / name) \
            if os.environ.get("SPARK_GRAFT_DROP_AFTER_COMPARE") == "1" \
            else None
        nrows = recorded["rows"] if recorded else con.execute(
            f"SELECT count(*) FROM {glob_sql}").fetchone()[0]
        try:
            r = cmp_digest(con, name, glob_sql, oracles[name],
                           bucket_key=bucket_keys.get(name),
                           n_buckets=n_buckets, drop_dump=drop,
                           bucket_site=bucket_sites.get(name),
                           recorded=recorded)
        except Exception as e:
            r = f"ORACLE/DIGEST ERROR: {str(e).splitlines()[0][:200]}"
        flag = "PASS" if r is None or r.startswith("OK") else "FAIL"
        if flag == "FAIL":
            n_fail += 1
        print(f"{flag} {name}: {r or f'OK ({nrows} rows, digest)'} "
              f"[compare {time.time() - t0:.1f} s]", flush=True)
        if drop is not None and flag == "PASS" and drop.is_dir():
            shutil.rmtree(drop, ignore_errors=True)
        if flag == "PASS":
            sidecar.unlink(missing_ok=True)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"== scalegate k={K}: {len(names) - n_fail}/{len(names)} "
          f"clean == (comparator peak RSS {rss_gb:.1f} GB)")
    con.close()
    if not REUSE:
        matdb.unlink(missing_ok=True)
        Path(str(matdb) + ".wal").unlink(missing_ok=True)
    if tmp.exists():  # drop any leftover spill before exiting
        shutil.rmtree(tmp, ignore_errors=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
