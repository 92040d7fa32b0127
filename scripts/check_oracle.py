#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (builder-side tooling,
not part of the shipped library).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs
the matching oracle SQL from oracle_sql.json in DuckDB over the sfDir
tables, sorts columns by name, and compares values. Reports per-query
match/mismatch with a diff preview.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, floats stay as-is (both sides round in SQL)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(got)})"
            continue
        try:
            want = norm(con.sql(oracles[name]).df())
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        if list(got.columns) != list(want.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(got.columns)} want={list(want.columns)}"
            continue
        if len(got) != len(want):
            results[name] = f"ROWCOUNT got={len(got)} want={len(want)}"
            continue
        bad = None
        for c in got.columns:
            g, w = got[c], want[c]
            try:
                if str(g.dtype).startswith("float") or str(w.dtype).startswith("float"):
                    import numpy as np
                    eq = (g.isna() & w.isna()) | (g == w)
                else:
                    eq = (g.isna() & w.isna()) | (g.astype(str) == w.astype(str))
                if not eq.all():
                    i = int((~eq).idxmax())
                    bad = f"col={c} row={i} got={g[i]!r} want={w[i]!r} (dtypes {g.dtype}/{w.dtype})"
                    break
            except Exception as e:
                bad = f"col={c} compare error: {e} (dtypes {g.dtype}/{w.dtype})"
                break
        results[name] = "OK" if bad is None else f"VALUE_MISMATCH {bad}"
    # missing outputs for declared oracles
    for name in oracles:
        if name not in results:
            results[name] = "MISSING_OUTPUT"
    n_ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY"))
    for name in sorted(results):
        v = results[name]
        flag = "PASS" if v == "OK" else ("weak" if v.startswith("ROWS_ONLY") else "FAIL")
        print(f"[{flag}] {name}: {v}")
    print(f"== {n_ok}/{len(results)} ok ==")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
