#!/bin/bash
# Round-10/11 newcomer 10x-step measurements + saltLanes sweep + the
# v3b sf10 decade point, run sequentially in ONE quiet window.
# Usage: newcomer_decade.sh <out-dir>
set -u
OUT=${1:-/tmp/newcomer_r11}
mkdir -p "$OUT"
cd /root/repo

NEWCOMERS="knn1_graph knn1b_graph_store w17_point_in_time q23_hll_register_store q23b_hll64_register_store q24_hist_quantile_store ks1_drift pf1_skew_profile fp1_compaction_plan cm1_corr_matrix seq1_pattern_match"
STREAMS="st11_stream_asof st12_stream_scd2 st13_stream_hll st14_stream_hist"

# 1) batch newcomers at sf0.1 (baseline) and sf1 (10x step), one JVM
#    per scale, median-of-3 inside the JVM
for d in /root/testdata/sf0.1 /tmp/sf1; do
  tag=$(basename "$d")
  echo "=== newcomers $tag $(date -u +%T)"
  rm -f bench_detail.json
  SPARK_GRAFT_SF_DIR="$d" SPARK_GRAFT_BENCH_ITERS=3 \
  SPARK_GRAFT_BENCH_ONLY="${NEWCOMERS// /,}" SPARK_GRAFT_CPUS=32 TOOL_MEM=48g \
    scripts/run-tool.sh graft.Bench > "$OUT/newcomers_$tag.log" 2>&1
  cp bench_detail.json "$OUT/newcomers_$tag.json"
done

# 2) streaming newcomers: COLD pass (fresh staging/state/checkpoint)
for d in /root/testdata/sf0.1 /tmp/sf1; do
  tag=$(basename "$d")
  echo "=== streams $tag $(date -u +%T)"
  rm -f bench_detail.json
  SPARK_GRAFT_SF_DIR="$d" SPARK_GRAFT_BENCH_ITERS=1 \
  SPARK_GRAFT_BENCH_COLD_STREAMS=1 \
  SPARK_GRAFT_BENCH_ONLY="${STREAMS// /,}" SPARK_GRAFT_CPUS=32 TOOL_MEM=48g \
    scripts/run-tool.sh graft.Bench > "$OUT/streams_$tag.log" 2>&1
  cp bench_detail.json "$OUT/streams_$tag.json"
done

# 3) saltLanes sweep at sf1 (uncapped mining, n=20k): lanes 1/2/4/8
for lanes in 1 2 4 8; do
  echo "=== v3b sf1 lanes=$lanes $(date -u +%T)"
  SPARK_GRAFT_SF_DIR=/tmp/sf1 SPARK_GRAFT_SALT_LANES=$lanes SPARK_GRAFT_CPUS=32 \
  TOOL_MEM=48g scripts/run-tool.sh graft.tools.DiagV3b \
    > "$OUT/v3b_sf1_lanes$lanes.log" 2>&1
  grep "\[diag\]" "$OUT/v3b_sf1_lanes$lanes.log"
done

# 4) the v3b sf10 decade point (lanes=4 default) - the committed number
echo "=== v3b sf10 $(date -u +%T)"
SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32 TOOL_MEM=96g \
  scripts/run-tool.sh graft.tools.DiagV3b > "$OUT/v3b_sf10_lanes4.log" 2>&1
grep "\[diag\]" "$OUT/v3b_sf10_lanes4.log"

# 5) saltLanes alternates at sf10 (the sweep's decision point)
for lanes in 2 8; do
  echo "=== v3b sf10 lanes=$lanes $(date -u +%T)"
  SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_SALT_LANES=$lanes SPARK_GRAFT_CPUS=32 \
  TOOL_MEM=96g scripts/run-tool.sh graft.tools.DiagV3b \
    > "$OUT/v3b_sf10_lanes$lanes.log" 2>&1
  grep "\[diag\]" "$OUT/v3b_sf10_lanes$lanes.log"
done
echo "=== newcomer study done $(date -u +%T)"
