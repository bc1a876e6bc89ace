#!/usr/bin/env bash
# Regenerates CORRECTNESS_SF1.md — the DuckDB oracle gate on the
# testdata-sf1/ 10x corpus (100x the driver-gated sf0.01 scale) for the
# TOP-50 most bench-expensive registry queries (r15 widening; was top-22).
# This is the family where integer-exact headroom, LSH/band collision
# structure, bloom decontamination and CC round counts actually stress.
#
# Usage (repo root): tools/correctness_sf1.sh [outfile]
# Needs: compiled classes, testdata-sf1/ (tools/run.sh graft.ScaleUp
# /root/testdata/sf0.1 testdata-sf1 10), duckdb (driver-side python).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-CORRECTNESS_SF1.md}"
SF1=testdata-sf1
[ -d "$SF1" ] || { echo "missing $SF1 — see header" >&2; exit 2; }

# Top-50 by committed sf0.1 bench cost (BENCH_LOCAL_DETAIL.json).
NAMES=(
  q65_dedup_components q170_greedy_cover q167_dedup_savings
  q84_near_dup_keep_best q118_dup_cluster_histogram q70_minhash_components
  q69_corpus_curation q116_minhash_error q137_lsh_recall_curve
  q74_bloom_decontaminate q181_pair_explain q111_aligned_runs
  q77_containment_pairs q157_method_agreement q126_source_copy_matrix
  q42_ngram_jaccard q146_pagerank q135_dup_graph_degrees
  q79_curation_pipeline q192_price_band_revenue q73_incremental_minhash
  q133_shingle_df_histogram q201_source_overlap q152_split_leakage
  q171_lsh_precision q86_bigram_lm_score q66_decontaminate
  q99_contamination_attribution q57_tfidf q87_pretraining_pipeline
  q43_minhash_lsh q124_suite_overlap q123_hard_negatives
  q128_bigram_entropy q129_windowed_heavy_hitters q20_deterministic_sample
  q98_pmi_collocations q88_winnowed_overlap q153_curriculum_order
  q104_diversified_topk q78_importance_sample q22_regional_revenue
  q82_semantic_dedup q110_ngram_novelty q158_cdc_chunk_dedup
  q32_anomaly_topk q203_decile_divergence q63_ann_ivf_lloyd
  q85_vocab_topk q103_source_diversity
)

VOUT=/tmp/vsf1_top50
rm -rf "$VOUT"
echo "[sf1-gate] Verify ${#NAMES[@]} queries on $SF1..." >&2
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run.sh graft.Verify "$SF1" "$VOUT" "${NAMES[@]}" >/dev/null
echo "[sf1-gate] DuckDB oracle compare (--timing)..." >&2
CHECK_OUT=$(python3 tools/check.py "$SF1" "$VOUT" --timing "${NAMES[@]}" 2>&1 | grep -E "^(PASS|FAIL)|pass, ")

python3 - "$OUT" "${#NAMES[@]}" <<EOF
import subprocess, sys, datetime
out, n = sys.argv[1], sys.argv[2]
head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                      capture_output=True, text=True).stdout.strip() or "?"
now = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
check = """$CHECK_OUT"""
tail = [l for l in check.splitlines() if "pass, " in l]
summary = tail[-1] if tail else "NO SUMMARY LINE — inspect manually"
with open(out, "w") as f:
    f.write(f"""# CORRECTNESS_SF1 — top-{n} DuckDB gate at sf1 (generated)

The r13 sf0.1 gate argument, taken one decade further: the {n} most
bench-expensive registry queries hash-matched against DuckDB on the
\`testdata-sf1/\` 10x corpus — 100x the driver-gated scale. This is the
family where integer-exact headroom, LSH/band collision structure,
bloom decontamination and CC round counts actually stress.

Generated {now} at HEAD {head} by \`tools/correctness_sf1.sh\`
(graft.Verify on testdata-sf1 + tools/check.py --timing).

## Result: {summary}

\`\`\`
{check}
\`\`\`
""")
print(f"wrote {out}: {summary}")
EOF
