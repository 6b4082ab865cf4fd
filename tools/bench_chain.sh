#!/bin/bash
# Round bench chain — run DETACHED (setsid bash tools/bench_chain.sh
# < /dev/null > /tmp/bench_chain.log 2>&1 &) on an otherwise-quiet
# host; the in-bench load gate + per-query requeue handle transients.
#
#   1. full-registry bench at sf0.1 (reps=3)       -> bench_out.json
#   2. full-registry bench on the x10 replica      -> bench_x10.json
#   3. slope regression gate over the pair         -> /tmp/slope_r11.log
#   4. x100 spot-check, reps=1, adaptive-k/band-cap/sampled-eval
#      queries (pair-EMITTING near-dup queries are excluded by design:
#      the clone replica makes their OUTPUT grow ~x4950 per group, so
#      at x100 they measure output materialization, not operator
#      scaling — their gate is the x10 artifact)   -> bench_x100.json
set -e
cd /root/repo

export SPARK_GRAFT_BENCH_REPS=3
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf01_run.log 2>&1
grep -o '{"metric".*}' /tmp/bench_sf01_run.log | tail -1 > bench_out.json
[ -s bench_out.json ]

SPARK_GRAFT_SF_DIR=/tmp/sf1x10 \
  sbt -batch "runMain graft.Bench" > /tmp/bench_x10_run.log 2>&1
grep -o '{"metric".*}' /tmp/bench_x10_run.log | tail -1 > bench_x10.json
[ -s bench_x10.json ]

sbt -batch "runMain graft.tools.SlopeCheck bench_out.json bench_x10.json" \
  > /tmp/slope_r11.log 2>&1 || true

SPARK_GRAFT_SF_DIR=/tmp/sf1x100 SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_GRAFT_BENCH_ONLY=q15_dedup_minhash,q16_dedup_simhash,q23_ann_ivf,q31_corpus_clean,q43_ann_ivf_trained,q70_lsh_capped,q92_semantic_dedup,q178_cms_ivm,q221_dedup_recall,q222_triplet_mining,q253_knn_graph,q254_ivf_cell_stats \
  sbt -batch "runMain graft.Bench" > /tmp/bench_x100_run.log 2>&1
grep -o '{"metric".*}' /tmp/bench_x100_run.log | tail -1 > bench_x100.json

echo "chain done"
