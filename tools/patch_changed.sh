#!/bin/bash
# Re-measure queries whose code changed this round and patch BOTH
# committed bench artifacts (sf0.1 + x10) in place, disclosed via
# "requeued_isolated". Used when a full x10 re-run (~2.3h) does not
# fit the round's chain deadline: the unchanged 260+ rows keep their
# committed clean values, the changed rows get fresh-JVM reps=3
# measurements on both replicas BEFORE the round commit.
#
#   tools/patch_changed.sh q266_url_canonical,q267_domain_stats,...
set -e
cd /root/repo
QS="$1"
[ -n "$QS" ] || { echo "usage: patch_changed.sh q1,q2,..."; exit 2; }

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_REPS=3 \
  SPARK_GRAFT_BENCH_OUT=/tmp/patch_sf01.json SPARK_GRAFT_BENCH_ONLY="$QS" \
  sbt -batch "runMain graft.Bench" > /tmp/patch_sf01_run.log 2>&1
python3 tools/merge_bench.py patch bench_out.json /tmp/patch_sf01.json

SPARK_GRAFT_SF_DIR=/tmp/sf1x10 SPARK_GRAFT_BENCH_REPS=3 \
  SPARK_GRAFT_SHUFFLE_PARTITIONS=96 \
  SPARK_GRAFT_BENCH_OUT=/tmp/patch_x10.json SPARK_GRAFT_BENCH_ONLY="$QS" \
  sbt -batch "runMain graft.Bench" > /tmp/patch_x10_run.log 2>&1
python3 tools/merge_bench.py patch bench_x10.json /tmp/patch_x10.json

sbt -batch "runMain graft.tools.SlopeCheck bench_out.json bench_x10.json" \
  | grep -E "VIOL|OK|checked" | tail -5
