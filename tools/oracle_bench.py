#!/usr/bin/env python3
"""Times each headline oracle SQL in DuckDB (warm: 2nd run timed) on a
scale dir, for the PERF.md Spark-vs-oracle table."""
import json, sys, time
from pathlib import Path
import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
# The headline list is whatever graft.Bench last ran (single source of
# truth: target/bench.json's query keys) — no hand-maintained copy that
# could drift from Bench.scala.
HEADLINE = list(json.loads(
    Path("target/bench.json").read_text())["queries"].keys())
oracles = json.loads(Path("target/verify_out/oracle_sql.json").read_text())
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")
out = {}
for name in HEADLINE:
    sql = oracles.get(name)
    if not sql:
        out[name] = None
        continue
    con.execute(sql).fetchall()  # warmup
    t0 = time.time()
    con.execute(sql).fetchall()
    out[name] = round(time.time() - t0, 3)
print(json.dumps({"sf": SFDIR, "queries": out, "total": round(
    sum(v for v in out.values() if v is not None), 3)}))
