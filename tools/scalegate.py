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


def digest_bucketed(con, oracle_sql, cols_types, key, nb):
    """The oracle digest computed bucket-by-bucket and combined —
    digests are abelian (count/sum add, xor xors), so slicing the
    oracle's OUTPUT rows on `hash(key) % nb` is exact for ANY column,
    while a key that is the query's final window/group key lets DuckDB
    push the slice through that operator and bound its state to ~1/nb
    of the frame per pass (the r13 verdict's key-range-bucketed
    compare: the 600-747M-row joins at k=1000 never materialize in one
    hash table). Inputs are re-scanned nb times — scan bandwidth traded
    for a fixed memory cap, on a once-per-round tool."""
    tot_n, tot_sum, tot_xor = 0, 0, 0
    for i in range(nb):
        sliced = (f'SELECT * FROM ({oracle_sql}) '
                  f'WHERE hash("{key}") % {nb} = {i}')
        n, s, x = digest(con, f"({sliced})", cols_types)
        tot_n += n
        tot_sum += s or 0
        tot_xor ^= x or 0
    return (tot_n, tot_sum if tot_n else None,
            tot_xor if tot_n else None)


def cmp_digest(con, name, spark_from, oracle_sql, bucket_key=None,
               n_buckets=1):
    """DuckDB-side streaming compare; returns None on match, else a
    message (FAIL unless it starts with OK)."""
    sc = con.execute(f"DESCRIBE SELECT * FROM {spark_from}").fetchall()
    oc = con.execute(f"DESCRIBE ({oracle_sql})").fetchall()
    s_cols = sorted((r[0], r[1]) for r in sc)
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
    sd = digest(con, spark_from, s_cols)
    # the SPARK side is a plain parquet glob — one streaming aggregate,
    # constant space — so only the ORACLE (whose joins/windows carry
    # the memory) is ever bucketed
    od = digest_bucketed(con, oracle_sql, o_cols, bucket_key,
                         n_buckets) \
        if n_buckets > 1 and bucket_key \
        else digest(con, f"({oracle_sql})", o_cols)
    if sd[0] != od[0]:
        return f"ROWS {sd[0]} vs {od[0]}"
    if sd == od:
        return None
    # digests disagree: small frames get the pandas diagnosis
    if sd[0] <= FALLBACK_ROWS:
        spark_df = con.execute(f"SELECT * FROM {spark_from}").df()
        oracle_df = con.execute(oracle_sql).df()
        return cmp_frames(name, spark_df, oracle_df) or \
            "DIGEST mismatch but pandas compare clean (hash-norm bug?)"
    return (f"DIGEST sum {sd[1]} vs {od[1]} / xor {sd[2]} vs {od[2]} "
            f"on {sd[0]} rows (too large for the per-column fallback)")


def main():
    if "--skip-dump" not in sys.argv:
        print(f"running graft.ScaleGate k={K} ...")
        run_dump()
    con = duckdb.connect()
    # the digest comparator is constant-space, but the ORACLE queries
    # themselves build hash joins/windows over the k-replica (33 GB
    # observed at k=100 unbounded) — cap DuckDB so the k=1000 decade
    # spills to disk instead of OOMing the box
    mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "24GB")
    con.execute(f"SET memory_limit='{mem}'")
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
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    oracles = json.loads((OUT / "oracle_sql.json").read_text())
    meta_p = OUT / "gate_meta.json"
    bucket_keys = {}
    if meta_p.exists():
        meta = json.loads(meta_p.read_text())
        tag = "OVERRIDE subset" if meta.get("override") else "full gate"
        print(f"gate_meta: k={meta.get('k')} {tag}: "
              f"{', '.join(meta.get('gated', []))}")
        bucket_keys = meta.get("bucket_keys", {})
    # SPARK_GRAFT_ORACLE_BUCKETS=B (default 1 = single pass) slices
    # each oracle's digest into B hash-range passes over its declared
    # bucket key — the memory-capped mode for the k=1000 decade
    n_buckets = int(os.environ.get("SPARK_GRAFT_ORACLE_BUCKETS", "1"))
    if n_buckets > 1:
        print(f"oracle digests bucketed x{n_buckets} on: "
              f"{bucket_keys or '(no keys — single pass)'}")
    n_fail = 0
    for name in sorted(oracles):
        # rglob: sharded dumps nest shard-i/ dirs under the query dir
        files = list((OUT / name).rglob("*.parquet")) \
            if (OUT / name).is_dir() else []
        if not files:
            print(f"FAIL {name}: NO SPARK OUTPUT")
            n_fail += 1
            continue
        glob_sql = f"read_parquet('{OUT / name}/**/*.parquet')" \
            if any(f.parent != OUT / name for f in files) \
            else f"read_parquet('{OUT / name}/*.parquet')"
        t0 = time.time()
        try:
            r = cmp_digest(con, name, glob_sql, oracles[name],
                           bucket_key=bucket_keys.get(name),
                           n_buckets=n_buckets)
        except Exception as e:
            r = f"ORACLE/DIGEST ERROR: {str(e).splitlines()[0][:200]}"
        flag = "PASS" if r is None or r.startswith("OK") else "FAIL"
        if flag == "FAIL":
            n_fail += 1
        nrows = con.execute(
            f"SELECT count(*) FROM {glob_sql}").fetchone()[0]
        print(f"{flag} {name}: {r or f'OK ({nrows} rows, digest)'} "
              f"[compare {time.time() - t0:.1f} s]", flush=True)
        # SPARK_GRAFT_DROP_AFTER_COMPARE=1: free each query's dump the
        # moment its digest lands — at k=1000 the two fs dumps are
        # ~34 GB that would otherwise sit under the NEXT query's oracle
        # spill (the r15 run lost both compares to exactly that ENOSPC)
        if os.environ.get("SPARK_GRAFT_DROP_AFTER_COMPARE") == "1" \
                and flag == "PASS" and (OUT / name).is_dir():
            shutil.rmtree(OUT / name, ignore_errors=True)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    print(f"== scalegate k={K}: {len(oracles) - n_fail}/{len(oracles)} "
          f"clean == (comparator peak RSS {rss_gb:.1f} GB)")
    con.close()
    if tmp.exists():  # drop any leftover spill before exiting
        shutil.rmtree(tmp, ignore_errors=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
