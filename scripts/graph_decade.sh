#!/bin/bash
# Graph-family decade study: each query in its OWN fresh JVM (the r8
# protocol - no cross-query checkpoint/GC pollution), ITERS=1 at the
# big scales. Usage: graph_decade.sh <sf-dir> <out-dir> [mem] [queries]
set -u
DIR=${1:?sf dir}
OUT=${2:?out dir}
MEM=${3:-96g}
QUERIES=${4:-pr1_pagerank pr2_personalized lp1_communities tc1_triangles gc1_kcore}
mkdir -p "$OUT"
cd /root/repo
for q in $QUERIES; do
  echo "=== $q $(date -u +%T)"
  # a crashed run must not inherit the previous query's detail file
  rm -f bench_detail.json
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_BENCH_ITERS=1 \
  SPARK_GRAFT_BENCH_ONLY="$q" SPARK_GRAFT_CPUS=32 TOOL_MEM="$MEM" \
    scripts/run-tool.sh graft.Bench > "$OUT/$q.log" 2>&1
  cp bench_detail.json "$OUT/$q.json" 2>/dev/null
  grep -o '"queries":{[^}]*}' "$OUT/$q.json" 2>/dev/null | head -1
done
echo "=== study done $(date -u +%T)"
