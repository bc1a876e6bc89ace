#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [--timing] [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB with the
parquet tables registered as views, loads the Spark result parquet, sorts
columns by name, and compares values cell-by-cell (exact, with timestamp
normalization). Reports per-query: rows / schema / values.

--timing additionally records each oracle query's DuckDB wall seconds and
writes {"total_sec":…, "queries":{name:sec}} to
<verifyOutDir>/oracle_timing.json — the single-node baseline the bench
numbers ratio against, reproducible in-band instead of via a hand-rolled
harness.
"""
import sys, os, json, glob, time, subprocess
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # object columns that hold dates etc -> string
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    return df


def main():
    args = [a for a in sys.argv[1:] if a != "--timing"]
    timing = "--timing" in sys.argv[1:]
    sf_dir, out_dir = args[0], args[1]
    only = set(args[2:])
    times = {}
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (testdata-sf1 via ScaleUp)
            p = f"{p}/*.parquet"
        if glob.glob(p) or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        res_dir = f"{out_dir}/{name}"
        parts = sorted(glob.glob(f"{res_dir}/*.parquet"))
        if not parts:
            print(f"FAIL {name}: no spark result at {res_dir}")
            n_fail += 1
            continue
        try:
            t0 = time.monotonic()
            want = norm(con.execute(sql).df())
            times[name] = round(time.monotonic() - t0, 3)
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            n_fail += 1
            continue
        got = norm(con.execute(
            f"SELECT * FROM read_parquet({parts!r})").df())
        probs = []
        if list(got.columns) != list(want.columns):
            probs.append(f"schema: spark={list(got.columns)} oracle={list(want.columns)}")
        elif len(got) != len(want):
            probs.append(f"rows: spark={len(got)} oracle={len(want)}")
        else:
            for c in got.columns:
                a, b = got[c], want[c]
                try:
                    if a.dtype != b.dtype:
                        try:
                            b = b.astype(a.dtype)
                        except Exception:
                            probs.append(f"col {c}: dtype spark={a.dtype} oracle={b.dtype}")
                            continue
                    neq = ~((a == b) | (a.isna() & b.isna()))
                    if neq.any():
                        i = neq.idxmax()
                        probs.append(
                            f"col {c}: {int(neq.sum())}/{len(a)} differ; first@{i}: "
                            f"spark={a[i]!r} oracle={b[i]!r}")
                except Exception as e:
                    probs.append(f"col {c}: compare error {e}")
        if probs:
            print(f"FAIL {name}: " + " | ".join(probs[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {len(got.columns)} cols)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    if timing:
        # "head" records the repo HEAD the denominator was generated at, so
        # a bench artifact stamping ratio_vs_oracle can name WHICH oracle
        # measurement it divided by (VERDICT-r17 #1: the ratio's provenance
        # used to need hand-reconstruction from git history).
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip() or None
        out = {"total_sec": round(sum(times.values()), 3), "queries": times}
        if head:
            out["head"] = head
        with open(f"{out_dir}/oracle_timing.json", "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
        print(f"oracle timing: {out['total_sec']} s over {len(times)} queries "
              f"-> {out_dir}/oracle_timing.json")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
