#!/bin/bash
# Round-16 scale-gate driver: close the k=1000 (~sf100) decade.
# The r15 verdict's one open evidence cell: both heavy fs legs' dumps
# are green with digests captured, but every oracle compare ENOSPC'd.
# This round's comparator materializes the shared corpus-synthesis CTEs
# ONCE into a file-backed DuckDB db (compressed, dropped when dead), so
# each run below holds: replica (~17 GB) + one dump at a time (dropped
# the moment its Spark digest lands) + the materialized chain (~12-16
# GB) + one bucket pass's spill. Sequenced one query per invocation
# against the shared replica (SPARK_GRAFT_REUSE_REPLICA), so a failure
# in one never costs another's dump.
set -u
cd /root/repo
mkdir -p target/r16logs
note() { echo "[$(date +%H:%M:%S)] $*"; df -h / | tail -1; }

note "run A: k=1000 fs_merge_upsert (3-shard dump, 8-bucket oracle, mat fs_base)"
SPARK_GRAFT_GATED=fs_merge_upsert SPARK_GRAFT_SHARDS=3 \
SPARK_GRAFT_ORACLE_BUCKETS=8 SPARK_GRAFT_ORACLE_MATERIALIZE=fs_base \
SPARK_GRAFT_DROP_AFTER_COMPARE=1 \
  python3 tools/scalegate.py 1000 > target/r16logs/gateA_merge_k1000.log 2>&1
note "run A exit: $?"

note "run B: k=1000 fs_es_docs (reuse replica, mat fs_base,fs_links,roll)"
SPARK_GRAFT_GATED=fs_es_docs SPARK_GRAFT_REUSE_REPLICA=1 \
SPARK_GRAFT_SHARDS=3 SPARK_GRAFT_ORACLE_BUCKETS=8 \
SPARK_GRAFT_ORACLE_MATERIALIZE=fs_base,fs_links,roll \
SPARK_GRAFT_DROP_AFTER_COMPARE=1 \
  python3 tools/scalegate.py 1000 > target/r16logs/gateB_esdocs_k1000.log 2>&1
note "run B exit: $?"

note "run C: k=1000 fs_dir_rollup_explode (reuse replica, mat fs_base,roll)"
SPARK_GRAFT_GATED=fs_dir_rollup_explode SPARK_GRAFT_REUSE_REPLICA=1 \
SPARK_GRAFT_ORACLE_BUCKETS=8 SPARK_GRAFT_ORACLE_MATERIALIZE=fs_base,roll \
SPARK_GRAFT_DROP_AFTER_COMPARE=1 \
  python3 tools/scalegate.py 1000 > target/r16logs/gateC_rollup_k1000.log 2>&1
note "run C exit: $?"

note "run D: k=1000 docs_bm25_indexed (reuse replica, serving-store row)"
SPARK_GRAFT_GATED=docs_bm25_indexed SPARK_GRAFT_REUSE_REPLICA=1 \
SPARK_GRAFT_DROP_AFTER_COMPARE=1 \
  python3 tools/scalegate.py 1000 > target/r16logs/gateD_bm25_k1000.log 2>&1
note "run D exit: $?"

note "run E: k=1000 docs_exact_substrings (reuse replica, 8-bucket oracle)"
SPARK_GRAFT_GATED=docs_exact_substrings SPARK_GRAFT_REUSE_REPLICA=1 \
SPARK_GRAFT_ORACLE_BUCKETS=8 SPARK_GRAFT_DROP_AFTER_COMPARE=1 \
  python3 tools/scalegate.py 1000 > target/r16logs/gateE_substr_k1000.log 2>&1
note "run E exit: $?"
note "=== all r16 gate runs done ==="
