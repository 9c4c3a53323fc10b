#!/bin/bash
# Round-12 measurement campaign, run sequentially in ONE quiet window:
#  1. newcomer 10x steps (sf0.1 -> /tmp/sf1) for knn2/q27 (the r11
#     verdict's missing rows) and the round-12 operators
#     d6c/ov2/knn1c/r1b/tc2;
#  2. cold streaming 10x for st18 (missing row) + st19;
#  3. the documents-table second decade re-run under the io gate
#     (replaces the r11 gate_waits=10 caveated rows) for the
#     ov1/ov1b/d6b trio plus the new ov2/d6c;
#  4. a cold-store pass at sf0.1 exercising the new
#     SPARK_GRAFT_BENCH_COLD_STORES hook (store INIT cost per family).
# Usage: newcomer_r12.sh <out-dir>
set -u
OUT=${1:-/tmp/newcomer_r12}
mkdir -p "$OUT"
cd /root/repo

NEWCOMERS="knn2_semantic_clusters q27_cms_store d6c_bucketed_components ov2_overlap_sparse knn1c_graph_refresh r1b_bm25_store tc2_triangle_store"
STREAMS="st18_stream_components st19_stream_components_bucketed"
DOCSTRIO="ov1_overlap_matrix ov1b_overlap_store ov2_overlap_sparse d6b_incremental_components d6c_bucketed_components"
STORES="d9_incremental_neardup d3c_incremental_simhash d11b_incremental_semdedup j11b_incr_setsim d6b_incremental_components d6c_bucketed_components q23_hll_register_store q23b_hll64_register_store q24_hist_quantile_store q25_kmv_store q27_cms_store ov1b_overlap_store knn1b_graph_store knn1c_graph_refresh r1b_bm25_store tc2_triangle_store"

for d in /root/testdata/sf0.1 /tmp/sf1; do
  tag=$(basename "$d")
  echo "=== newcomers $tag $(date -u +%T)"
  rm -f bench_detail.json
  SPARK_GRAFT_SF_DIR="$d" SPARK_GRAFT_BENCH_ITERS=3 \
  SPARK_GRAFT_BENCH_ONLY="${NEWCOMERS// /,}" SPARK_GRAFT_CPUS=32 TOOL_MEM=48g \
    scripts/run-tool.sh graft.Bench > "$OUT/newcomers_$tag.log" 2>&1
  cp bench_detail.json "$OUT/newcomers_$tag.json"
done

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

for d in /tmp/sf1 /tmp/sf10docs; do
  tag=$(basename "$d")
  echo "=== docs trio $tag $(date -u +%T)"
  rm -f bench_detail.json
  SPARK_GRAFT_SF_DIR="$d" SPARK_GRAFT_BENCH_ITERS=3 \
  SPARK_GRAFT_BENCH_ONLY="${DOCSTRIO// /,}" SPARK_GRAFT_CPUS=32 TOOL_MEM=48g \
    scripts/run-tool.sh graft.Bench > "$OUT/docs_$tag.log" 2>&1
  cp bench_detail.json "$OUT/docs_$tag.json"
done

echo "=== cold stores sf0.1 $(date -u +%T)"
rm -f bench_detail.json
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_ITERS=1 \
SPARK_GRAFT_BENCH_COLD_STORES=1 \
SPARK_GRAFT_BENCH_ONLY="${STORES// /,}" SPARK_GRAFT_CPUS=32 TOOL_MEM=48g \
  scripts/run-tool.sh graft.Bench > "$OUT/coldstores_sf0.1.log" 2>&1
cp bench_detail.json "$OUT/coldstores_sf0.1.json"
echo "=== r12 study done $(date -u +%T)"
