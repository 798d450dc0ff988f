#!/usr/bin/env bash
# Standing scale gate — the round-ritual tier that runs every round
# (r13/r14 asked for it; the manual r14 sf1 sweep caught two real
# cent-level money bugs, so the tier is now scripted instead of relying
# on someone remembering).
#
# What it does, at 10x the driver gate scale (sf1 = ScaleUp of sf0.1):
#   1. builds the sf1 corpus if absent (deterministic replication —
#      referential integrity preserved, see graft.ScaleUp);
#   2. Verify-dumps the FOCUS query set and oracle-compares it in DuckDB
#      (CHECK_ORACLE_OVERLAY substitutes the documented lossless
#      large-SF oracle variants; 900 s per-oracle budget);
#   3. benches the same set isolated (SPARK_GRAFT_ONLY, min-of-3 warm).
#
# Usage: tools/scale_gate.sh [sf1_dir] [query ...]
#   sf1_dir  where the scaled corpus lives/should be built
#            (default /tmp/testdata/sf1)
#   query…   focus set override. Default = the standing set below:
#            the ~20 slowest by cross-round record. EVERY ROUND: append
#            the queries whose code changed that round, and paste the
#            resulting table into SURVEY's round state.
set -euo pipefail
cd "$(dirname "$0")/.."

SF1=${1:-/tmp/testdata/sf1}
shift || true

# Standing focus set: the ~20 slowest by cross-round record as of r15
# (regenerate when the slow set shifts) PLUS every query that has an
# oracle_overlay_sf1.json variant — the overlay entries only earn their
# keep if the standing gate actually exercises them at sf1 every round
# (an overlay that silently stops parsing or times out must show up
# here, not in an ad-hoc sweep).
DEFAULT_FOCUS=(
  text_langid graph_build search_cypher_write_onmatch graph_paths
  graph_lpa graph_triangles search_cypher_shortest graph_ppr graph_kcore
  search_cypher_fn graph_metrics graph_mutation_ledger pipeline_metrics
  pipeline_update graph_mutations search_temporal_graph
  dedup_ngram_jaccard graph_khop search_context_triplets graph_formatted
  graph_pagerank search_cypher_write
  graph_metrics_full search_completion_extension text_chunk_paragraph
  mm_ahash_dedup vec_knn_graph dedup_cluster curate_dedup_apply
  curate_semdedup curate_decontaminate_fuzzy
  stream_cdc_migrate stream_sessionize stream_window_agg
)
FOCUS=("${@:-${DEFAULT_FOCUS[@]}}")

if [ ! -e "$SF1/lineitem.parquet" ]; then
  echo "[scale_gate] building sf1 corpus at $SF1 (ScaleUp x10 of sf0.1)"
  sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 $SF1 10"
fi

OUT=${SCALE_GATE_OUT:-/tmp/scale_gate_out}
rm -rf "$OUT"
echo "[scale_gate] Verify ${#FOCUS[@]} queries at $SF1"
sbt -batch "runMain graft.Verify $SF1 $OUT ${FOCUS[*]}"

echo "[scale_gate] DuckDB oracle compare (overlay + 900s budget)"
CHECK_ORACLE_OVERLAY=tools/oracle_overlay_sf1.json CHECK_TIMEOUT_S=900 \
  python3 tools/check.py "$OUT" "$SF1" "${FOCUS[@]}" | tee "$OUT/check.txt"

echo "[scale_gate] bench the focus set isolated at sf1"
# sbt writes to a file first: a `sbt | grep | head -1` pipeline under
# pipefail dies with a spurious SIGPIPE (141) as soon as head closes the
# pipe after the first JSON line — a false red on a green gate.
SPARK_GRAFT_SF_DIR=$SF1 SPARK_GRAFT_ONLY=$(IFS=,; echo "${FOCUS[*]}") \
  sbt -batch "runMain graft.Bench" > "$OUT/bench_raw.log" 2>&1
grep -E '^\{' "$OUT/bench_raw.log" | head -1 | tee "$OUT/bench.json"

echo "[scale_gate] done — record $OUT/check.txt + $OUT/bench.json in SURVEY's round state"
