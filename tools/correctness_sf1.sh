#!/usr/bin/env bash
# Regenerates CORRECTNESS_SF1.md — the DuckDB oracle gate on the
# testdata-sf1/ 10x corpus (100x the driver-gated sf0.01 scale) for the
# FULL 203-query registry (r16 final widening; earlier in r16 it gated
# the top-103 most bench-expensive, r15 top-50, r14 top-22 — the
# remaining 100 are the registry's cheap tail, ~13 s of sf0.1 oracle
# between them, so full coverage costs little beyond the heavy half).
# This is where integer-exact headroom, LSH/band collision structure,
# bloom decontamination, window/sessionization shapes and CC round
# counts actually stress.
#
# Also refreshes ORACLE_TIMING_sf1.json (the sf1 single-node DuckDB
# denominator; multi-threaded — check.py uses a default duckdb.connect()).
#
# Usage (repo root): tools/correctness_sf1.sh [outfile]
#   SF1_ONLY="q65_dedup_components q42_ngram_jaccard" limits to a subset
#   (local iteration). A subset run REQUIRES an explicit [outfile] — the
#   default outfile is the committed full-registry artifact, and a subset
#   run must never overwrite it with a subset-sized "full" claim
#   (ADVICE-r16); subset reports are additionally titled SUBSET.
# Needs: compiled classes, testdata-sf1/ (tools/run.sh graft.ScaleUp
# /root/testdata/sf0.1 testdata-sf1 10), duckdb (driver-side python).
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-CORRECTNESS_SF1.md}"
SF1=testdata-sf1
[ -d "$SF1" ] || { echo "missing $SF1 — see header" >&2; exit 2; }
if [ -n "${SF1_ONLY:-}" ] && [ $# -lt 1 ]; then
  echo "SF1_ONLY is set: pass an explicit outfile (refusing to overwrite" \
       "the committed full-registry $OUT with a subset report)" >&2
  exit 2
fi

# shellcheck disable=SC2206
NAMES=(${SF1_ONLY:-})

VOUT=/tmp/vsf1_full
rm -rf "$VOUT"
echo "[sf1-gate] Verify ${SF1_ONLY:+subset }on $SF1..." >&2
SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=24g \
  tools/run.sh graft.Verify "$SF1" "$VOUT" ${NAMES[@]+"${NAMES[@]}"} >/dev/null
echo "[sf1-gate] DuckDB oracle compare (--timing)..." >&2
# check.py exits 1 on any FAIL; under pipefail that used to abort the
# script here — after the ~2 h run, with NO report written (ADVICE-r16:
# the FAIL branch of the template was unreachable). Capture the exit code
# and keep going so a failing gate still leaves diagnosable evidence.
# The raw output goes to a file FIRST so CHECK_RC is check.py's OWN exit
# code — in the old `check.py | grep` pipeline under pipefail, grep
# finding no PASS/FAIL lines turned a check.py SUCCESS into a reported
# "check.py exit 1" (ADVICE-r17: misattributed, though conservative).
CHECK_RC=0
CHECK_RAW=/tmp/sf1_check_raw.txt
python3 tools/check.py "$SF1" "$VOUT" --timing \
  ${NAMES[@]+"${NAMES[@]}"} >"$CHECK_RAW" 2>&1 || CHECK_RC=$?
CHECK_OUT=$(grep -E "^(PASS|FAIL)|pass, " "$CHECK_RAW" || true)
if [ -z "${SF1_ONLY:-}" ] && [ -f "$VOUT/oracle_timing.json" ]; then
  cp "$VOUT/oracle_timing.json" ORACLE_TIMING_sf1.json
  echo "[sf1-gate] refreshed ORACLE_TIMING_sf1.json" >&2
fi

# grep -c exits 1 at zero matches — benign here (N=0 is itself reported).
N=$(grep -cE "^(PASS|FAIL)" <<<"$CHECK_OUT" || true)
NFAIL=$(grep -cE "^FAIL" <<<"$CHECK_OUT" || true)
SUBSET="${SF1_ONLY:+subset}"
python3 - "$OUT" "$N" "$NFAIL" "$CHECK_RC" "$SUBSET" <<EOF
import subprocess, sys, datetime
out, n, nfail, rc, subset = sys.argv[1:6]
head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                      capture_output=True, text=True).stdout.strip() or "?"
now = datetime.datetime.now(datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
check = """$CHECK_OUT"""
tail = [l for l in check.splitlines() if "pass, " in l]
summary = tail[-1] if tail else "NO SUMMARY LINE — inspect manually"
if nfail != "0" or rc != "0":
    summary += f" — GATE FAILED (check.py exit {rc})"
scope = (f"SUBSET ({n} of the registry — NOT a full-registry gate)"
         if subset else f"full-registry ({n} queries)")
with open(out, "w") as f:
    f.write(f"""# CORRECTNESS_SF1 — {scope} DuckDB gate at sf1 (generated)

The r13 sf0.1 gate argument, taken one decade further: {"the listed subset of" if subset else f"all {n}"} registry
queries hash-matched against DuckDB on the \`testdata-sf1/\` 10x corpus
— 100x the driver-gated scale. This is the family where integer-exact
headroom, LSH/band collision structure, bloom decontamination and CC
round counts actually stress.

Generated {now} at HEAD {head} by \`tools/correctness_sf1.sh\`
(graft.Verify on testdata-sf1 + tools/check.py --timing; a full run
also refreshes ORACLE_TIMING_sf1.json).

## Result: {summary}

\`\`\`
{check}
\`\`\`
""")
print(f"wrote {out}: {summary}")
EOF
exit "$CHECK_RC"
