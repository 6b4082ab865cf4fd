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

# 3b. Fresh-JVM requeue of slope outliers. A 270-query suite shares one
# JVM's accumulated GC/JIT state, and occasionally a row absorbs that
# debt instead of the query's own cost (round 12: q19 measured 6.2 s
# inside the suite vs 0.33 s in a fresh JVM on the same replica).
# Outliers = slope-gate VIOLations plus ratios under x0.5 (an inflated
# BASE row deflates the slope). Both rows of each outlier are
# re-measured isolated under the same reps/load protocol, the patched
# artifacts list them in "requeued_isolated", and the gate re-runs —
# a query that is genuinely superlinear fails again on clean rows.
OUTLIERS=$( { awk '/VIOL q/{print $3}' /tmp/slope_chain.log; \
  python3 -c '
import json
b = json.load(open("bench_out.json"))["queries"]
x = json.load(open("bench_x10.json"))["queries"]
for q in b:
    if q in x and b[q] > 0 and x[q] / b[q] < 0.5: print(q)
'; } | sort -u | paste -sd, )
if [ -n "$OUTLIERS" ]; then
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/requeue_base.json \
    SPARK_GRAFT_BENCH_ONLY="$OUTLIERS" \
    sbt -batch "runMain graft.Bench" > /tmp/requeue_base_run.log 2>&1
  SPARK_GRAFT_SF_DIR=/tmp/sf1x10 SPARK_GRAFT_BENCH_OUT=/tmp/requeue_x10.json \
    SPARK_GRAFT_BENCH_ONLY="$OUTLIERS" \
    sbt -batch "runMain graft.Bench" > /tmp/requeue_x10_run.log 2>&1
  python3 tools/merge_bench.py patch bench_out.json /tmp/requeue_base.json
  python3 tools/merge_bench.py patch bench_x10.json /tmp/requeue_x10.json
  sbt -batch "runMain graft.tools.SlopeCheck bench_out.json bench_x10.json" \
    > /tmp/slope_chain2.log 2>&1 || true
fi

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
# ONE QUERY PER JVM at x100: in a shared JVM a single query's full-GC
# pause on the 64g heap can exceed the 2-min heartbeat timeout, which
# kills the local executor and cascades "stopped SparkContext" into
# every query after it (round-12 first attempt: 5 of 8 queries died
# that way, and the survivors carried the shared JVM's GC debt —
# q178 measured 194 s shared vs its isolated cost). The timeout
# override is belt-and-braces for within-query pauses.
X100Q="q16_dedup_simhash q23_ann_ivf q43_ann_ivf_trained q178_cms_ivm q221_dedup_recall q222_triplet_mining q253_knn_graph q254_ivf_cell_stats"
rm -f /tmp/x100_part_*.json
for q in $X100Q; do
  SPARK_GRAFT_SF_DIR=/tmp/sf1x100 SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_BENCH_REQUEUE_LOAD=64 \
    SPARK_GRAFT_BENCH_OUT=/tmp/x100_part_$q.json \
    SPARK_GRAFT_BENCH_ONLY=$q \
    SPARK_EXTRA_JAVA_OPTS="-Dspark.network.timeout=600s" \
    sbt -batch "runMain graft.Bench" > /tmp/bench_x100_$q.log 2>&1 || true
done
python3 tools/merge_bench.py concat bench_x100.json /tmp/x100_part_*.json

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
X100UQ="q15_dedup_minhash q31_corpus_clean q70_lsh_capped q92_semantic_dedup"
rm -f /tmp/x100u_part_*.json
for q in $X100UQ; do
  SPARK_GRAFT_SF_DIR=/tmp/sf1x100u SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_BENCH_REQUEUE_LOAD=64 \
    SPARK_GRAFT_BENCH_OUT=/tmp/x100u_part_$q.json \
    SPARK_GRAFT_BENCH_ONLY=$q \
    SPARK_EXTRA_JAVA_OPTS="-Dspark.network.timeout=600s" \
    sbt -batch "runMain graft.Bench" > /tmp/bench_x100u_$q.log 2>&1 || true
done
python3 tools/merge_bench.py concat bench_x100_unique.json /tmp/x100u_part_*.json

echo "chain done"
