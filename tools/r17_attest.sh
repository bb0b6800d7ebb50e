#!/bin/bash
# Round-17 attestation chain, phase 2 (after the scan-parallelization
# rework). Gating artifacts first (full suite, sf0.1 bench refresh),
# then the long sf10 attestation (Verify + budgeted DuckDB replay) —
# its per-query OK lines stream to the log, so a partial replay still
# yields a snapshot artifact at round close. Serial on purpose
# (sbt lock + quiet-box timing hygiene).
set -x
cd /root/repo

echo "PHASE1_TESTGATE_START $(date +%T)"
python3 tools/testgate.py --log /tmp/sbt_test_r17b.log
echo "PHASE1_TESTGATE_EXIT $? $(date +%T)"

echo "PHASE2_SF01_BENCH_START $(date +%T)"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_ITERS=3 SPARK_GRAFT_BENCH_OUT=BENCH_FULL.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf01_r17.log 2>&1
echo "PHASE2_SF01_BENCH_EXIT $? $(date +%T)"

echo "PHASE3_VERIFY_SF10_START $(date +%T)"
SPARK_DRIVER_MEM=16g sbt -batch \
  'runMain graft.Verify /root/repo/testdata/sf10 /tmp/graft_verify_sf10' \
  > /tmp/verify_sf10_r17.log 2>&1
echo "PHASE3_VERIFY_SF10_EXIT $? $(date +%T)"

echo "PHASE4_SF10_CROSSCHECK_START $(date +%T)"
python3 tools/crosscheck.py /root/repo/testdata/sf10 /tmp/graft_verify_sf10 \
  --no-run --oracle-timeout 600 > /tmp/crosscheck_sf10_r17.log 2>&1
echo "PHASE4_SF10_CROSSCHECK_EXIT $? $(date +%T)"

echo "ALL_PHASES_DONE $(date +%T)"
