#!/bin/bash
# Round bench chain — run DETACHED (setsid bash tools/bench_chain.sh
# < /dev/null > /tmp/bench_chain.log 2>&1 &) on an otherwise-quiet
# host; the in-bench load gate + per-query requeue handle transients.
#
#   1. full-registry bench at sf0.1 (reps=3)       -> bench_out.json
#   2. full-registry bench on the x10 replica      -> bench_x10.json
#   3. slope regression gate over the pair         -> /tmp/slope_chain.log
#   4. x100 spot-check, reps=1, adaptive-k/band-cap/sampled-eval
#      queries (pair-EMITTING near-dup queries are excluded by design:
#      the clone replica makes their OUTPUT grow ~x4950 per group, so
#      at x100 they measure output materialization, not operator
#      scaling — their gate is the x10 artifact)   -> bench_x100.json
#
# Each stage names its own SPARK_GRAFT_BENCH_OUT: graft.Bench writes
# its artifact file directly (stdout tails truncate), and without an
# explicit path every stage would clobber bench_out.json.
set -e
cd /root/repo

export SPARK_GRAFT_BENCH_REPS=3
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_out.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf01_run.log 2>&1
[ -s bench_out.json ]

# replicas are host-local scratch — rebuild when a cleaned /tmp ate them
if [ ! -s /tmp/sf1x10/documents.parquet/_SUCCESS ]; then
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1x10 10" \
    > /tmp/scaleup_x10.log 2>&1
fi
SPARK_GRAFT_SF_DIR=/tmp/sf1x10 SPARK_GRAFT_BENCH_OUT=bench_x10.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_x10_run.log 2>&1
[ -s bench_x10.json ]

sbt -batch "runMain graft.tools.SlopeCheck bench_out.json bench_x10.json" \
  > /tmp/slope_chain.log 2>&1 || true

# x100 needs two env overrides the smaller stages don't:
#   - SPARK_DRIVER_MEM=64g — the default 8g execution pool OOMs under
#     32 concurrent tasks on x100 shuffle state (a real cluster gives
#     each executor tens of GB; the spot-check should too);
#   - requeue disabled (threshold 64) — per-query self-load scales
#     with DURATION (a multi-minute local[32] query alone drives the
#     1-min loadavg past any fixed co-tenant bound), so on a reps=1
#     multi-minute run the requeue can only false-fire; the per-row
#     recorded load still labels any genuinely contaminated row.
#
# Query set: the adaptive-k IVF family + the sampled dedup eval + the
# banded-simhash and snapshot-IVM paths. PAIRWISE dedup queries
# (q15/q31/q70/q92 and every pair emitter) are excluded at x100 BY
# MEASUREMENT, not guess: the clone replica gives each doc 99 verbatim
# twins, so every same-signature group emits C(100,2)=4950 pairs
# (~25M candidate pairs corpus-wide, each carrying a shingle-set
# verification join) — at 8g they OOM and at 64g q15 alone ran >100
# min of pure legitimate output materialization. Their scale gate is
# the x10 artifact (pairs ~x100 there, measured within bounds); a
# x100 replica with UNIQUE texts would be the right instrument for
# them (ScaleUp improvement, future round).
if [ ! -s /tmp/sf1x100/documents.parquet/_SUCCESS ]; then
  SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1x100 100" \
    > /tmp/scaleup_x100.log 2>&1
fi
SPARK_GRAFT_SF_DIR=/tmp/sf1x100 SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_BENCH_REQUEUE_LOAD=64 \
  SPARK_GRAFT_BENCH_OUT=bench_x100.json \
  SPARK_GRAFT_BENCH_ONLY=q16_dedup_simhash,q23_ann_ivf,q43_ann_ivf_trained,q178_cms_ivm,q221_dedup_recall,q222_triplet_mining,q253_knn_graph,q254_ivf_cell_stats \
  sbt -batch "runMain graft.Bench" > /tmp/bench_x100_run.log 2>&1

# 5. UNIQUE-text x100 replica + the pairwise dedup queries the clone
#    replica excludes by construction (their clone-pair output is
#    C(100,2)=4950 pairs/group — pure output materialization). The
#    unique replica (ScaleUp 4th arg) suffixes every token per copy
#    and applies a signed coordinate permutation per embedding copy,
#    so cross-copy content is distinct while the within-copy near-dup
#    RATE stays sf0.1-shaped — the right instrument for q15/q31/q70
#    and for q92's first completed x100 measurement.
if [ ! -s /tmp/sf1x100u/embeddings.parquet/_SUCCESS ]; then
  SPARK_DRIVER_MEM=48g \
    sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1x100u 100 unique" \
    > /tmp/scaleup_x100u.log 2>&1
fi
SPARK_GRAFT_SF_DIR=/tmp/sf1x100u SPARK_GRAFT_BENCH_REPS=1 \
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_BENCH_REQUEUE_LOAD=64 \
  SPARK_GRAFT_BENCH_OUT=bench_x100_unique.json \
  SPARK_GRAFT_BENCH_ONLY=q15_dedup_minhash,q31_corpus_clean,q70_lsh_capped,q92_semantic_dedup \
  sbt -batch "runMain graft.Bench" > /tmp/bench_x100u_run.log 2>&1

echo "chain done"
