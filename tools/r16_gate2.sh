#!/bin/bash
# Round-16 follow-up: the three gate rows still without a k=1000 cell
# after r16_gate.sh — closing these makes the ENTIRE 11-row gate
# hash-clean at ~sf100. Reuses the replica r16_gate.sh materialized.
# docs_exact_substrings also re-runs here with the materialize set its
# oracle needs (dup+a: the gram-occurrence join computed once, not 4x
# per bucket pass) in case the first script's plain pass was killed.
set -u
cd /root/repo
mkdir -p target/r16logs
note() { echo "[$(date +%H:%M:%S)] $*"; df -h / | tail -1; }

note "run E2: k=1000 docs_exact_substrings (mat dup,a; site-injected buckets)"
SPARK_GRAFT_GATED=docs_exact_substrings SPARK_GRAFT_REUSE_REPLICA=1 \
SPARK_GRAFT_ORACLE_BUCKETS=8 SPARK_GRAFT_ORACLE_MATERIALIZE=dup,a \
SPARK_GRAFT_DROP_AFTER_COMPARE=1 \
  python3 tools/scalegate.py 1000 > target/r16logs/gateE2_substr_k1000.log 2>&1
note "run E2 exit: $?"

note "run F: k=1000 q21_waiting_suppliers (2-row output, single-pass oracle)"
SPARK_GRAFT_GATED=q21_waiting_suppliers SPARK_GRAFT_REUSE_REPLICA=1 \
SPARK_GRAFT_DROP_AFTER_COMPARE=1 \
  python3 tools/scalegate.py 1000 > target/r16logs/gateF_q21_k1000.log 2>&1
note "run F exit: $?"

note "run G: k=1000 docs_pack_segments_sharded"
SPARK_GRAFT_GATED=docs_pack_segments_sharded SPARK_GRAFT_REUSE_REPLICA=1 \
SPARK_GRAFT_DROP_AFTER_COMPARE=1 \
  python3 tools/scalegate.py 1000 > target/r16logs/gateG_pack_k1000.log 2>&1
note "run G exit: $?"

note "run H: k=1000 docs_curriculum_order_ranged"
SPARK_GRAFT_GATED=docs_curriculum_order_ranged SPARK_GRAFT_REUSE_REPLICA=1 \
SPARK_GRAFT_DROP_AFTER_COMPARE=1 \
  python3 tools/scalegate.py 1000 > target/r16logs/gateH_curric_k1000.log 2>&1
note "run H exit: $?"
note "=== all r16 follow-up runs done ==="
