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

# snapshot the previous round's committed clean artifact BEFORE stage 1
# overwrites it — the round-over-round mover gate below compares to it
git show HEAD:bench_out.json > /tmp/bench_prev.json 2>/dev/null || true

export SPARK_GRAFT_BENCH_REPS=3
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=bench_out.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_sf01_run.log 2>&1
[ -s bench_out.json ]

# 1b. Round-over-round mover requeue at sf0.1. Suite-state contamination
# (accumulated GC/JIT debt in the shared 270-query JVM) shows up as
# rows that move >2x vs the previous committed artifact with no code
# change on their path (round 12: q19 6.19 s in-suite vs 0.33 s
# fresh-JVM). The slope gate only catches it when the x10 row is the
# contaminated one; this gate catches the sf0.1 side: any row >2x its
# previous committed value (and above 0.5 s — sub-second rows jitter
# 2-3x on scheduling alone) is re-measured in ONE fresh JVM and the
# artifact patched, disclosed via "requeued_isolated".
MOVERS=$(python3 -c '
import json, sys
try:
    prev = json.load(open("/tmp/bench_prev.json"))["queries"]
except Exception:
    sys.exit(0)
cur = json.load(open("bench_out.json"))["queries"]
for q in sorted(cur):
    if q in prev and prev[q] > 0 and cur[q] > 0.5 and cur[q] / prev[q] > 2.0:
        print(q)
' | paste -sd,)
if [ -n "$MOVERS" ]; then
  echo "[chain] sf0.1 movers >2x vs previous committed artifact: $MOVERS"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/movers_sf01.json \
    SPARK_GRAFT_BENCH_ONLY="$MOVERS" \
    sbt -batch "runMain graft.Bench" > /tmp/movers_sf01_run.log 2>&1
  python3 tools/merge_bench.py patch bench_out.json /tmp/movers_sf01.json
fi

# replicas are host-local scratch — rebuild when a cleaned /tmp ate them
if [ ! -s /tmp/sf1x10/documents.parquet/_SUCCESS ]; then
  sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1x10 10" \
    > /tmp/scaleup_x10.log 2>&1
fi
# Shuffle partitions scale with the replica factor (AQE coalesces
# over-partitioning at runtime; it CANNOT split under-partitioning —
# the x100-unique instrument measured the shingle family superlinear
# through a fixed 32, r12 verdict item 2). 96 ≈ 32·sqrt(10) keeps
# per-partition shuffle bytes near the sf0.1 row's.
SPARK_GRAFT_SF_DIR=/tmp/sf1x10 SPARK_GRAFT_BENCH_OUT=bench_x10.json \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=96 \
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
# anchor on the VIOL token itself, not a field position — sbt's
# '[info] ' prefix made $3 the query name only by accident
OUTLIERS=$( { grep -oE 'VIOL q[a-z0-9_]+' /tmp/slope_chain.log | awk '{print $2}'; \
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
    SPARK_GRAFT_BENCH_ONLY="$OUTLIERS" SPARK_GRAFT_SHUFFLE_PARTITIONS=96 \
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
# q178's x100 rows have swung x13.6 / x106 / 38.65 s across reps=1
# measurements (r11/r12/r10) — it gets reps=3 so the row is a median,
# closing the outlier history with a defensible number.
X100Q="q16_dedup_simhash q23_ann_ivf q43_ann_ivf_trained q178_cms_ivm q221_dedup_recall q222_triplet_mining q253_knn_graph q254_ivf_cell_stats"
rm -f /tmp/x100_part_*.json
for q in $X100Q; do
  REPS=1; [ "$q" = q178_cms_ivm ] && REPS=3
  SPARK_GRAFT_SF_DIR=/tmp/sf1x100 SPARK_GRAFT_BENCH_REPS=$REPS \
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_BENCH_REQUEUE_LOAD=64 \
    SPARK_GRAFT_BENCH_OUT=/tmp/x100_part_$q.json \
    SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_SHUFFLE_PARTITIONS=320 \
    SPARK_EXTRA_JAVA_OPTS="-Dspark.network.timeout=600s" \
    sbt -batch "runMain graft.Bench" > /tmp/bench_x100_$q.log 2>&1 || true
done
python3 tools/merge_bench.py concat bench_x100.json \
  --expect "$(echo $X100Q | tr ' ' ,)" /tmp/x100_part_*.json

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
# Shuffle partitions scaled x10 over the sf0.1 default (AQE coalesces
# down where the shuffle is small) — the r12 x100-unique instrument
# measured q15 SLOWER on unique text than on clones (1118.9 s vs
# 560 s), falsifying the output-volume theory and pointing at a
# 100x-larger shingle shuffle through a fixed 32 partitions: spill +
# GC per oversized partition, which AQE cannot fix (it only merges).
X100UQ="q15_dedup_minhash q31_corpus_clean q70_lsh_capped q92_semantic_dedup"
rm -f /tmp/x100u_part_*.json
for q in $X100UQ; do
  SPARK_GRAFT_SF_DIR=/tmp/sf1x100u SPARK_GRAFT_BENCH_REPS=1 \
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_BENCH_REQUEUE_LOAD=64 \
    SPARK_GRAFT_BENCH_OUT=/tmp/x100u_part_$q.json \
    SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_SHUFFLE_PARTITIONS=320 \
    SPARK_EXTRA_JAVA_OPTS="-Dspark.network.timeout=600s" \
    sbt -batch "runMain graft.Bench" > /tmp/bench_x100u_$q.log 2>&1 || true
done
python3 tools/merge_bench.py concat bench_x100_unique.json \
  --expect "$(echo $X100UQ | tr ' ' ,)" /tmp/x100u_part_*.json

# 6. q24 slope-drift A/B (r12 verdict item 9): its in-suite x10 slope
#    crept x75.5 -> x103.5 -> x120 against a bound of 200 with no code
#    change on its path. One isolated fresh-JVM pair (reps=3) decides
#    noise-vs-growth: if the isolated slope sits near the r10 value,
#    the in-suite drift is suite-state and the bound is re-pinned on
#    this evidence; if it reproduces, the growth is real.
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/q24_base.json \
  SPARK_GRAFT_BENCH_ONLY=q24_embedding_neardup \
  sbt -batch "runMain graft.Bench" > /tmp/q24_base_run.log 2>&1 || true
SPARK_GRAFT_SF_DIR=/tmp/sf1x10 SPARK_GRAFT_BENCH_OUT=/tmp/q24_x10.json \
  SPARK_GRAFT_BENCH_ONLY=q24_embedding_neardup SPARK_GRAFT_SHUFFLE_PARTITIONS=96 \
  sbt -batch "runMain graft.Bench" > /tmp/q24_x10_run.log 2>&1 || true
python3 -c '
import json
b = json.load(open("/tmp/q24_base.json"))["queries"]["q24_embedding_neardup"]
x = json.load(open("/tmp/q24_x10.json"))["queries"]["q24_embedding_neardup"]
print(f"[chain] q24 isolated A/B: base={b:.2f}s x10={x:.2f}s slope=x{x/b:.1f}")
' || true

echo "chain done"
