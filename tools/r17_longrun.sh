#!/bin/bash
# Round-17 serial long-run: full suite -> sf10 bench (16g) -> sf1 patch
# bench -> sf1 crosscheck. Serial on purpose (sbt lock + quiet-box
# timing hygiene). Each phase stamps a marker line.
set -x
cd /root/repo

echo "PHASE1_TESTGATE_START $(date +%T)"
python3 tools/testgate.py --log /tmp/sbt_test_r17.log
echo "PHASE1_TESTGATE_EXIT $? $(date +%T)"

echo "PHASE2_SF10_BENCH_START $(date +%T)"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf10 \
  SPARK_GRAFT_BENCH_ITERS=1 SPARK_GRAFT_BENCH_OUT=BENCH_FULL_sf10.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf10_r17.log 2>&1
echo "PHASE2_SF10_BENCH_EXIT $? $(date +%T)"

echo "PHASE3_SF1_PATCH_START $(date +%T)"
SPARK_DRIVER_MEM=16g SPARK_GRAFT_SF_DIR=/root/repo/testdata/sf1 \
  SPARK_GRAFT_BENCH_ITERS=3 \
  SPARK_GRAFT_BENCH_ONLY=dedup_embedding,dedup_threshold_sweep,ann_ivf,ann_ivf_pq,ann_kmeans_step,hard_neg_mine,ann_centroid_stats,ann_nprobe_curve,ann_filtered,knn_join,ann_nndescent,ann_nndescent_conv,ann_knn_graph,ann_retrieve,ann_lsh,ann_shard_fanout,sketch_hll,sketch_ams,sketch_cms,sketch_kmv,fuzzy_join \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf1_patch_r17.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf1_patch_r17.log 2>&1
echo "PHASE3_SF1_PATCH_EXIT $? $(date +%T)"

echo "PHASE4_SF1_CROSSCHECK_START $(date +%T)"
python3 tools/crosscheck.py /root/repo/testdata/sf1 /tmp/graft_verify_sf1_r17 \
  --oracle-timeout 180 > /tmp/crosscheck_sf1_r17.log 2>&1
echo "PHASE4_SF1_CROSSCHECK_EXIT $? $(date +%T)"

echo "ALL_PHASES_DONE $(date +%T)"
