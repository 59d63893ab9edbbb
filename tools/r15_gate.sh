#!/bin/bash
# Round-15 scale-gate driver: the three runs the r14 verdict ordered,
# sequenced so a failure in one never blocks the next, each fully
# logged. Run from /root/repo in the background.
set -u
cd /root/repo
mkdir -p target/r15logs

echo "=== run A: k=1000 fs legs, 3-shard dumps + 8-bucket oracle ==="
SPARK_GRAFT_GATED=fs_merge_upsert,fs_es_docs \
SPARK_GRAFT_SHARDS=3 \
SPARK_GRAFT_ORACLE_BUCKETS=8 \
  python3 tools/scalegate.py 1000 \
  > target/r15logs/gateA_fs_k1000.log 2>&1
echo "run A exit: $?"
df -h / | tail -1

echo "=== run B: k=1000 events_sessionize, DEFAULT 24g dump heap ==="
SPARK_GRAFT_GATED=events_sessionize \
  python3 tools/scalegate.py 1000 \
  > target/r15logs/gateB_sessionize_k1000.log 2>&1
echo "run B exit: $?"

echo "=== run C: k=100 docs_bm25_indexed (serving-store gate row) ==="
SPARK_GRAFT_GATED=docs_bm25_indexed \
  python3 tools/scalegate.py 100 \
  > target/r15logs/gateC_bm25_k100.log 2>&1
echo "run C exit: $?"
echo "=== all runs done ==="
