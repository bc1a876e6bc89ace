#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads <verifyOutDir>/oracle_sql.json, runs each oracle SQL in DuckDB with the
parquet tables registered as views, loads the Spark result parquet, sorts
columns by name, and compares values cell-by-cell (exact, with timestamp
normalization). Reports per-query: rows / schema / values.
"""
import sys, os, json, glob
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
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
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
            want = norm(con.execute(sql).df())
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
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
