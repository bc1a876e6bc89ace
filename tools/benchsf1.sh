#!/usr/bin/env bash
# Regenerates BENCH_SF1.md — the committed scaling table for the top-22
# most expensive registry queries. The r13 parallelism-starvation find
# proved the multi-point run is the arbiter single-scale A/Bs cannot be (a
# one-file 10x corpus ran the shingle family on 2 of 32 threads, invisible
# at sf0.1); this script makes that run per-round and diffable instead of
# hand-rolled.
#
# Two scale points (sf0.1, sf1 = 10x) for all 22; a THIRD middle point
# (sf0.3 = ScaleUp 3x) for the top-10 by sf1 cost, so a non-monotone
# regime change (cache cliff, broadcast-to-shuffle flip) can't hide
# between the two outer points — the per-segment exponents bracket it.
#
# Usage (repo root): tools/benchsf1.sh [outfile]
# Needs: compiled classes (sbt compile), /root/testdata/sf0.1, testdata-sf1/
# (regenerate the latter with: tools/run.sh graft.ScaleUp /root/testdata/sf0.1 testdata-sf1 10)
# The sf0.3 corpus is generated on demand into testdata-sf0.3/.
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-BENCH_SF1.md}"
SF01=/root/testdata/sf0.1
SF03=testdata-sf0.3
SF1=testdata-sf1
[ -d "$SF1" ] || { echo "missing $SF1 — see header for the ScaleUp command" >&2; exit 2; }
[ -d "$SF03" ] || {
  echo "[benchsf1] generating $SF03 (ScaleUp 3x)..." >&2
  tools/run.sh graft.ScaleUp "$SF01" "$SF03" 3 >/dev/null
}

# Top-22 by sf0.1 cost (the r13 selection; revisit when the registry's
# expensive tail changes).
QUERIES=q01_pricing_summary,q111_aligned_runs,q116_minhash_error,q118_dup_cluster_histogram,q126_source_copy_matrix,q135_dup_graph_degrees,q137_lsh_recall_curve,q146_pagerank,q152_split_leakage,q157_method_agreement,q167_dedup_savings,q170_greedy_cover,q181_pair_explain,q42_ngram_jaccard,q43_minhash_lsh,q65_dedup_components,q69_corpus_curation,q70_minhash_components,q73_incremental_minhash,q76_line_dedup,q77_containment_pairs,q84_near_dup_keep_best
# Top-10 by sf1 cost (r14 BENCH_SF1 ordering) — the three-point subset.
TOP10=q69_corpus_curation,q111_aligned_runs,q116_minhash_error,q137_lsh_recall_curve,q181_pair_explain,q167_dedup_savings,q118_dup_cluster_histogram,q126_source_copy_matrix,q65_dedup_components,q70_minhash_components

# Reps per query (median taken by Bench itself). Default 3; raise via
# BENCHSF1_REPS on a host with bursty interference — a noise burst
# spanning two of three reps drags the median, and the burst length
# observed on shared-VM hosts (tens of seconds) makes reps correlated,
# so more reps genuinely de-noise where a wider median window cannot.
REPS="${BENCHSF1_REPS:-3}"

run_point () { # $1 = sf dir, $2 = detail-out prefix, $3 = query list
  SPARK_GRAFT_SF_DIR="$1" SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  SPARK_GRAFT_BENCH_REPS="$REPS" SPARK_GRAFT_BENCH_ONLY="$3" \
  SPARK_GRAFT_BENCH_OUT="$2.json" tools/run.sh graft.Bench >/dev/null
}

echo "[benchsf1] sf0.1 point ($REPS reps)..." >&2
run_point "$SF01" /tmp/benchsf1_a "$QUERIES"
echo "[benchsf1] sf0.3 point, top-10 ($REPS reps)..." >&2
run_point "$SF03" /tmp/benchsf1_m "$TOP10"
echo "[benchsf1] sf1 point ($REPS reps)..." >&2
run_point "$SF1" /tmp/benchsf1_b "$QUERIES"

python3 - "$OUT" "$REPS" <<'EOF'
import json, math, statistics, subprocess, sys, datetime
out, reps = sys.argv[1], sys.argv[2]
a = json.load(open("/tmp/benchsf1_a_DETAIL.json"))
m = json.load(open("/tmp/benchsf1_m_DETAIL.json"))
b = json.load(open("/tmp/benchsf1_b_DETAIL.json"))
head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                      capture_output=True, text=True).stdout.strip() or "?"
rows, exps, exps_min = [], [], []
for q in sorted(a):
    t0, t1 = a[q]["sec"], b[q]["sec"]
    if not (a[q]["ok"] and b[q]["ok"]):
        rows.append(f"| `{q}` | {t0:.3f} | {t1:.3f} | FAILED | — | — |")
        continue
    exp = math.log(t1 / t0) / math.log(10)
    # Min-of-reps exponent: host interference is ONE-SIDED (a noise burst
    # only ever adds time), so when a burst spans most reps the median is
    # dragged up and fabricates a super-linear flag; the per-point minimum
    # is the interference-robust bound on intrinsic cost. A query is only
    # genuinely super-linear when BOTH columns say so.
    e_min = math.log(min(b[q]["reps"]) / min(a[q]["reps"])) / math.log(10)
    exps.append(exp); exps_min.append(e_min)
    rows.append(f"| `{q}` | {t0:.3f} | {t1:.3f} | {t1/t0:.2f}x "
                f"| {exp:.2f} | {e_min:.2f} |")
rows3 = []
for q in sorted(m):
    if not (q in a and q in b and a[q]["ok"] and m[q]["ok"] and b[q]["ok"]):
        rows3.append(f"| `{q}` | FAILED | — | — | — | — | — |"); continue
    t0, tm, t1 = a[q]["sec"], m[q]["sec"], b[q]["sec"]
    e_lo = math.log(tm / t0) / math.log(3)       # sf0.1 -> sf0.3 (3x)
    e_hi = math.log(t1 / tm) / math.log(10 / 3)  # sf0.3 -> sf1 (10/3 x)
    e_hi_min = (math.log(min(b[q]["reps"]) / min(m[q]["reps"]))
                / math.log(10 / 3))
    rows3.append(f"| `{q}` | {t0:.3f} | {tm:.3f} | {t1:.3f} "
                 f"| {e_lo:.2f} | {e_hi:.2f} | {e_hi_min:.2f} |")
now = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
with open(out, "w") as f:
    f.write(f"""# BENCH_SF1 — scale-up bench points (generated)

Scaling run, regenerated per round by `tools/benchsf1.sh`
(generated {now} at HEAD {head}): top-22 most expensive registry queries
at sf0.1 and the `testdata-sf1/` 10x corpus (`graft.ScaleUp` key-disjoint
replicas, replica-private content universes, so pair work grows LINEARLY
in the factor). local[32], {reps} reps (median), the committed Bench
session config.

exp = ln(t_sf1 / t_sf0.1) / ln(10) over the per-point MEDIANS: 1.0 =
linear in rows, < 1 = per-query fixed overhead amortizing, > 1 =
super-linear (a scale bug — the r13 shingle-starvation class;
investigate before shipping). exp_min is the same fit over the
per-point MINIMUM rep: host interference only ever ADDS time, so a
noise burst spanning most reps drags the median into a false flag
while the minimum bounds the intrinsic cost. exp_min is ADVISORY,
never a veto — at the default 3 reps the minimum is a weak 3-sample
statistic, and an INTERMITTENT real cliff (e.g. spill triggered on 2
of 3 reps) can leave one clean rep. A median-only flag therefore
warrants a re-run at higher BENCHSF1_REPS (bursts are tens of
seconds, so extra reps genuinely de-noise); only dismiss it as host
noise once the high-rep re-run's median clears.

| query | sf0.1 s | sf1 s | ratio | exp | exp_min |
|---|---|---|---|---|---|
""")
    f.write("\n".join(rows) + "\n\n")
    if exps:
        f.write(f"Top-{len(exps)} exponents: median "
                f"**{statistics.median(exps):.2f}**, mean "
                f"{sum(exps)/len(exps):.2f}, max **{max(exps):.2f}**; "
                f"min-of-reps fit: median "
                f"{statistics.median(exps_min):.2f}, max "
                f"**{max(exps_min):.2f}**.\n")
    else:
        f.write("ALL QUERIES FAILED at one or both scale points — "
                "no exponents; inspect the detail JSONs in /tmp.\n")
    f.write("""
## Three-point segment exponents (top-10 by sf1 cost)

Middle point `testdata-sf0.3/` (ScaleUp 3x). Per-segment exponents
bracket any regime change between the outer points: a segment exponent
far above the two-point exp (and above 1) flags a cliff the end-to-end
fit averaged away. The short upper segment (3.3x) is the most
noise-sensitive fit in this file — its min-of-reps column decides
whether a >1 median reading is a cliff or a burst.

| query | sf0.1 s | sf0.3 s | sf1 s | exp 0.1→0.3 | exp 0.3→1 | 0.3→1 min |
|---|---|---|---|---|---|---|
""")
    f.write("\n".join(rows3) + "\n")
    # Max-exponent adjudication (VERDICT-r17 #4): the table's top two-point
    # exponent is always "the one to watch" — say in the artifact itself
    # whether the segment data reads as amortization or a cliff, so the
    # reading is committed evidence rather than per-round prose.
    okq = [q for q in sorted(a) if q in b and a[q]["ok"] and b[q]["ok"]]
    if okq:
        qmax = max(okq, key=lambda q: b[q]["sec"] / a[q]["sec"])
        emax = math.log(b[qmax]["sec"] / a[qmax]["sec"]) / math.log(10)
        if qmax in m and m[qmax]["ok"]:
            t0, tm, t1 = a[qmax]["sec"], m[qmax]["sec"], b[qmax]["sec"]
            e_lo = math.log(tm / t0) / math.log(3)
            e_hi = math.log(t1 / tm) / math.log(10 / 3)
            e_hi_min = (math.log(min(b[qmax]["reps"]) / min(m[qmax]["reps"]))
                        / math.log(10 / 3))
            if max(e_lo, e_hi) <= 1.0:
                verdict = (
                    "fixed-overhead amortization completing, not a cliff "
                    "onset: a pipeline whose per-doc work is linear "
                    "approaches exp 1.0 FROM BELOW as its fixed per-job "
                    "floor dilutes, which is exactly a rising-but-"
                    "sub-linear segment profile; a cliff instead reads as "
                    "a segment exponent ABOVE 1 and rising (the r13 "
                    "class), which no segment here shows")
            else:
                verdict = (
                    f"INVESTIGATE — the upper segment exceeds linear "
                    f"(exp {e_hi:.2f}, min-of-reps {e_hi_min:.2f}); "
                    f"re-run at higher BENCHSF1_REPS and, if it holds, "
                    f"profile the dominant stage before shipping")
            f.write(
                f"\n### Max-exponent adjudication\n\n"
                f"`{qmax}` carries the table's max two-point exponent "
                f"(**{emax:.2f}**). Segments: 0.1→0.3 exp {e_lo:.2f}, "
                f"0.3→1 exp {e_hi:.2f} (min-of-reps {e_hi_min:.2f}). "
                f"Reading: {verdict}.\n")
        else:
            f.write(
                f"\n### Max-exponent adjudication\n\n"
                f"`{qmax}` (exp **{emax:.2f}**) is NOT in the three-point "
                f"set — add it to TOP10 next regeneration so its segment "
                f"profile is committed evidence.\n")
if exps:
    print(f"wrote {out}: median exp {statistics.median(exps):.2f}, "
          f"max {max(exps):.2f}")
else:
    print(f"wrote {out}: ALL FAILED — no exponents")
EOF
