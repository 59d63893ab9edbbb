#!/usr/bin/env python3
"""Standalone ORACLE-side digest for a scale-gate query whose spark
digest was already captured (scalegate.py prints the (count, sum, xor)
triple before dropping a >FALLBACK_ROWS dump). Recomputes the oracle's
digest over the SAME replica tables with scalegate's exact
normalization (name-sorted columns, norm_expr casts, hash(struct_pack),
abelian bucket combine) and compares against the given triple — the
recovery path when dump + oracle spill cannot coexist on disk even
one-at-a-time.

usage: oracle_digest.py <query> <count> <sum> <xor> [buckets]
env: SPARK_GRAFT_ORACLE_MEM (default 80GB — the sandbox's RAM is the
     abundant resource once the dump JVMs exit; disk is the scarce one)
"""
import json
import os
import resource
import sys
import time
from pathlib import Path

import duckdb

from scalegate import (ROOT, OUT, digest, digest_bucketed,
                       materialize_ctes, strip_top_order)


def main():
    name, cnt, sm, xr = (sys.argv[1], int(sys.argv[2]),
                         int(sys.argv[3]), int(sys.argv[4]))
    nb = int(sys.argv[5]) if len(sys.argv) > 5 else 1
    con = duckdb.connect()
    mem = os.environ.get("SPARK_GRAFT_ORACLE_MEM", "80GB")
    con.execute(f"SET memory_limit='{mem}'")
    con.execute("SET preserve_insertion_order=false")
    tmp = ROOT / "duckdb-tmp"
    con.execute(f"SET temp_directory='{tmp}'")
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        src = ROOT / "data" / f"{t}.parquet"
        glob = f"{src}/*.parquet" if src.is_dir() else str(src)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    oracles = json.loads((OUT / "oracle_sql.json").read_text())
    meta = json.loads((OUT / "gate_meta.json").read_text())
    sql = strip_top_order(oracles[name])
    key = meta.get("bucket_keys", {}).get(name)
    cols = sorted((r[0], r[1]) for r in
                  con.execute(f"DESCRIBE ({sql})").fetchall())
    t0 = time.time()
    mat = os.environ.get("SPARK_GRAFT_ORACLE_MATERIALIZE")
    if mat:
        sql, _ = materialize_ctes(
            con, name, sql,
            only=None if mat == "1"
            else [t.strip() for t in mat.split(",") if t.strip()])
    od = digest_bucketed(con, sql, cols, key, nb) if nb > 1 and key \
        else digest(con, f"({sql})", cols)
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    ok = od == (cnt, sm, xr)
    print(f"{'PASS' if ok else 'FAIL'} {name}: oracle {od} vs spark "
          f"({cnt}, {sm}, {xr}) [{time.time() - t0:.1f} s, "
          f"mem_limit {mem}, peak RSS {rss:.1f} GB, buckets {nb}]")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
