#!/usr/bin/env python3
"""Local development self-check mimicking the driver's DuckDB oracle:
reads each <out>/<name> parquet produced by graft.Verify, runs the
corresponding SQL from oracle_sql.json in DuckDB over the same sf dir,
and compares (columns sorted by name, rows sorted by all columns).

Usage: selfcheck.py <sfDir> <verifyOutDir> [onlyCsv]
onlyCsv (dev-only) mirrors graft.Verify's subset arg — without it the
check covers the UNION of oracle keys and output dirs, so a query that
threw (and wrote nothing) is a FAIL, not silently absent.
NOT part of the Scala library — dev tooling only.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            sample = df[c].dropna()
            if len(sample) and isinstance(sample.iloc[0], datetime.date) \
                    and not isinstance(sample.iloc[0], datetime.datetime):
                df[c] = pd.to_datetime(df[c])
            else:
                df[c] = df[c].map(
                    lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                    type(v).__name__ == "ndarray" else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Iterate the UNION of registered oracle keys and written output
    # dirs: a query that THREW inside graft.Verify writes no dir, and
    # iterating only what exists silently shrank the pass count (the
    # r17 xq44 blind spot). A registered key with no output is a FAIL.
    dirs = set(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
    expected = set(oracle.keys())
    if len(sys.argv) > 3:  # dev subset run — mirror Verify's filter
        expected &= set(sys.argv[3].split(","))
    names = sorted(dirs | expected)
    n_pass = n_fail = n_noracle = 0
    for name in names:
        if name not in dirs:
            print(f"FAIL {name}: registered oracle but no verify output "
                  "(query threw?)")
            n_fail += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet written")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)")
            n_noracle += 1
            continue
        try:
            want = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_fail += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_fail += 1
            continue
        try:
            # Strict compare: exact values for non-float columns, and the
            # dtype KIND (int/float/bool/object/…) must agree — the driver
            # hashes rendered values, so int-vs-float drift (DuckDB HUGEINT
            # → pandas float64: 1.0 vs Spark's 1) is a real failure, while
            # integer width (int32 vs int64) renders identically and isn't.
            for c in g.columns:
                gk, wk = g[c].dtype.kind, w[c].dtype.kind
                if gk != wk:
                    raise AssertionError(
                        f"column {c}: dtype kind {g[c].dtype} != {w[c].dtype}")
                is_float = gk == "f"
                pd.testing.assert_series_equal(
                    g[c], w[c], check_dtype=False,
                    check_exact=not is_float, rtol=1e-9)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as e:
            msg = str(e).split("\n")
            print(f"FAIL {name}: {' | '.join(msg[:6])}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} no-oracle")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
