#!/usr/bin/env bash
# Regenerates CORRECTNESS_SF1.md — the DuckDB oracle gate on the
# testdata-sf1/ 10x corpus (100x the driver-gated sf0.01 scale) for the
# TOP-103 most bench-expensive registry queries (r16 widening; r15 was
# top-50, r14 top-22): the r15 set plus the next 50 by committed sf0.1
# bench cost plus the drift family (q94/q95/q96 — float-statistic
# queries whose integer-grid headroom deserves a decade of stress even
# though they are cheap). This is the family where integer-exact
# headroom, LSH/band collision structure, bloom decontamination,
# window/sessionization shapes and CC round counts actually stress.
#
# Usage (repo root): tools/correctness_sf1.sh [outfile]
# Needs: compiled classes, testdata-sf1/ (tools/run.sh graft.ScaleUp
# /root/testdata/sf0.1 testdata-sf1 10), duckdb (driver-side python).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-CORRECTNESS_SF1.md}"
SF1=testdata-sf1
[ -d "$SF1" ] || { echo "missing $SF1 — see header" >&2; exit 2; }

# Top-50 by committed sf0.1 bench cost (BENCH_LOCAL_DETAIL.json)...
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
  # ...plus the next 50 by the same ordering + the drift family (r16).
  q143_large_orders q140_event_transitions q138_small_qty_parts
  q100_quality_deciles q177_jackknife_se q131_dup_quality_gap
  q44_simhash_dedup q145_column_profile q186_quality_volume_curve
  q56_ann_ivf q107_cluster_balanced_sample q173_keyword_search
  q90_ewma q14_depth_topn q196_retention_bitmap q154_returned_revenue
  q75_mixture_sample q174_lang_margin q76_line_dedup q130_lang_confusion
  q191_recall_at_k q142_winsorized_quality q18_book_levels
  q134_shipping_priority q184_seasonal_decomposition q162_ship_priority_mix
  q189_vocab_bands q178_ab_test q139_supplier_nations
  q127_boilerplate_segments q114_self_repetition q183_iqr_outliers
  q163_event_trigrams q102_temperature_mix q119_inter_event_gaps
  q166_promo_share q141_interval_join_outer q59_cluster_histogram
  q106_incremental_embedding q161_rolling_wau q160_argmax_join
  q101_sessionization q89_ann_recall q172_twap q45_embedding_dedup
  q190_dq_rules q54_cube_agg q155_key_skew q117_cms_error q33_rollup_agg
  q94_ks_drift q95_chi2_drift q96_psi_drift
)

VOUT=/tmp/vsf1_top103
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
