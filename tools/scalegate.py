#!/usr/bin/env python3
"""k-replica scale correctness gate (VERDICT r9 item #1).

Runs graft.ScaleGate (dumps the 10 gated queries' results on a k x
replica of sf0.1), then replays each query's oracle SQL in DuckDB over
the SAME replica tables and compares with diffcheck's exact frame
comparator — the sf0.01 gate's discipline at ~6M lineitem rows / 50k
docs, where scale-dependent knife-edges (r8's round(avg) boundary)
actually surface.

Usage: python3 tools/scalegate.py [k] [--skip-dump]
"""
import json
import os
import subprocess
import sys
from pathlib import Path

import duckdb

from diffcheck import ADD_OPENS, REPO, cmp_frames

K = next((a for a in sys.argv[1:] if not a.startswith("-")), "10")
# honor the same override graft.ScaleGate itself honors — the scrubbed
# subprocess env would otherwise silently pin the default corpus
SFDIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = REPO / "target" / "scalegate"
OUT = ROOT / "verify"


def run_dump():
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += [
        "-Xmx24g",
        "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp",
        f"{REPO}/target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.ScaleGate", K, SFDIR, str(ROOT),
    ]
    env = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "SPARK_GRAFT_CPUS": "32"}
    # pass the gate-subset override through the scrubbed env (the
    # k=100 decade runs only the heaviest rows)
    if os.environ.get("SPARK_GRAFT_GATED"):
        env["SPARK_GRAFT_GATED"] = os.environ["SPARK_GRAFT_GATED"]
    r = subprocess.run(cmd, env=env)
    if r.returncode != 0:
        sys.exit(f"scalegate dump exited {r.returncode}")


def main():
    if "--skip-dump" not in sys.argv:
        print(f"running graft.ScaleGate k={K} ...")
        run_dump()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        src = ROOT / "data" / f"{t}.parquet"
        glob = f"{src}/*.parquet" if src.is_dir() else str(src)
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")
    oracles = json.loads((OUT / "oracle_sql.json").read_text())
    import time
    n_fail = 0
    for name in sorted(oracles):
        files = list((OUT / name).glob("*.parquet")) \
            if (OUT / name).is_dir() else []
        if not files:
            print(f"FAIL {name}: NO SPARK OUTPUT")
            n_fail += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{OUT / name}/*.parquet')").df()
        t0 = time.time()
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: ORACLE SQL ERROR: "
                  f"{str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        r = cmp_frames(name, spark_df, oracle_df)
        flag = "PASS" if r is None or r.startswith("OK") else "FAIL"
        if flag == "FAIL":
            n_fail += 1
        print(f"{flag} {name}: {r or f'OK ({len(spark_df)} rows)'} "
              f"[oracle {time.time() - t0:.1f} s]")
    print(f"== scalegate k={K}: {len(oracles) - n_fail}/{len(oracles)} "
          "clean ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
