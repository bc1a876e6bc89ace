#!/usr/bin/env bash
# Regenerates BENCH_SF1.md — the committed two-point (sf0.1 → sf1) scaling
# table for the top-22 most expensive registry queries. The r13 parallelism
# -starvation find proved the two-point run is the arbiter single-scale A/Bs
# cannot be (a one-file 10x corpus ran the shingle family on 2 of 32
# threads, invisible at sf0.1); this script makes that run per-round and
# diffable instead of hand-rolled.
#
# Usage (repo root): tools/benchsf1.sh [outfile]
# Needs: compiled classes (sbt compile), /root/testdata/sf0.1, testdata-sf1/
# (regenerate the latter with: tools/run.sh graft.ScaleUp /root/testdata/sf0.1 testdata-sf1 10)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-BENCH_SF1.md}"
SF01=/root/testdata/sf0.1
SF1=testdata-sf1
[ -d "$SF1" ] || { echo "missing $SF1 — see header for the ScaleUp command" >&2; exit 2; }

# Top-22 by sf0.1 cost (the r13 selection; revisit when the registry's
# expensive tail changes).
QUERIES=q01_pricing_summary,q111_aligned_runs,q116_minhash_error,q118_dup_cluster_histogram,q126_source_copy_matrix,q135_dup_graph_degrees,q137_lsh_recall_curve,q146_pagerank,q152_split_leakage,q157_method_agreement,q167_dedup_savings,q170_greedy_cover,q181_pair_explain,q42_ngram_jaccard,q43_minhash_lsh,q65_dedup_components,q69_corpus_curation,q70_minhash_components,q73_incremental_minhash,q76_line_dedup,q77_containment_pairs,q84_near_dup_keep_best

run_point () { # $1 = sf dir, $2 = detail-out prefix
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_BENCH_REPS=3 SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_BENCH_OUT="$2.json" tools/run.sh graft.Bench >/dev/null
}

echo "[benchsf1] sf0.1 point (3 reps)..." >&2
run_point "$SF01" /tmp/benchsf1_a
echo "[benchsf1] sf1 point (3 reps)..." >&2
run_point "$SF1" /tmp/benchsf1_b

python3 - "$OUT" <<'EOF'
import json, math, subprocess, sys, datetime
out = sys.argv[1]
a = json.load(open("/tmp/benchsf1_a_DETAIL.json"))
b = json.load(open("/tmp/benchsf1_b_DETAIL.json"))
head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                      capture_output=True, text=True).stdout.strip() or "?"
rows, exps = [], []
for q in sorted(a):
    t0, t1 = a[q]["sec"], b[q]["sec"]
    if not (a[q]["ok"] and b[q]["ok"]):
        rows.append(f"| `{q}` | {t0:.3f} | {t1:.3f} | FAILED | — |"); continue
    exp = math.log(t1 / t0) / math.log(10)
    exps.append(exp)
    rows.append(f"| `{q}` | {t0:.3f} | {t1:.3f} | {t1/t0:.2f}x | {exp:.2f} |")
exps.sort()
med = exps[len(exps)//2] if exps else float("nan")
now = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
with open(out, "w") as f:
    f.write(f"""# BENCH_SF1 — one-scale-up bench point (generated)

Two-point scaling run, regenerated per round by `tools/benchsf1.sh`
(generated {now} at HEAD {head}): top-22 most expensive registry queries
at sf0.1 and the `testdata-sf1/` 10x corpus (`graft.ScaleUp` key-disjoint
replicas, replica-private content universes, so pair work grows LINEARLY
in the factor). local[32], 3 reps (median), the committed Bench session
config.

exp = ln(t_sf1 / t_sf0.1) / ln(10): 1.0 = linear in rows, < 1 =
per-query fixed overhead amortizing, > 1 = super-linear (a scale bug —
the r13 shingle-starvation class; investigate before shipping).

| query | sf0.1 s | sf1 s | ratio | exp |
|---|---|---|---|---|
""")
    f.write("\n".join(rows) + "\n\n")
    f.write(f"Top-{len(exps)} exponents: median **{med:.2f}**, mean "
            f"{sum(exps)/len(exps):.2f}, max **{max(exps):.2f}**.\n")
print(f"wrote {out}: median exp {med:.2f}, max {max(exps):.2f}")
EOF
