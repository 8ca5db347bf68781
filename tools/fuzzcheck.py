#!/usr/bin/env python3
"""Differential-fuzz twin of check.py (r12 verdict task 8).

Usage: python3 tools/fuzzcheck.py <fuzz_out_dir> <tables_dir>

Same canon/hash comparison as the driver-gate replica, but the DuckDB
views come from EVERY parquet in <tables_dir> (the fuzz generator's
random tables, named t<seed>m / t<seed>a) instead of the fixed TPC-H-ish
list. Each <out>/<name> parquet is the engine's result for one random
op-chain; oracle_sql.json carries the generated equivalent SQL.
"""
import sys, json, glob, os
import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # r20: the engine side may carry TIMESTAMP_NTZ (naive walls) where
    # the generated-SQL side carries tz-aware UTC instants, or vice
    # versa — the engine's pinned mapping is NTZ wall == UTC instant, so
    # compare both flavors as naive UTC walls.
    for col in df.columns:
        if isinstance(df[col].dtype, pd.DatetimeTZDtype):
            df[col] = df[col].dt.tz_convert("UTC").dt.tz_localize(None)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def hash_df(df: pd.DataFrame) -> str:
    import hashlib
    h = hashlib.md5()
    for col in df.columns:
        s = df[col]
        if s.dtype == object:
            vals = s.astype(str)
        else:
            vals = s.map(repr)
        h.update(("\x00".join(vals.tolist()) + "|" + col).encode())
    return h.hexdigest()


def main():
    out_dir, tables_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(tables_dir, "*.parquet"))):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}/*.parquet'"
                    if os.path.isdir(p) else
                    f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    results = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = "NO_ORACLE"
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH got={len(g)} exp={len(e)}"
        elif hash_df(g) != hash_df(e):
            diff = None
            for col in g.columns:
                try:
                    if not g[col].equals(e[col]):
                        neq = (g[col].astype(str) != e[col].astype(str))
                        i = neq.idxmax()
                        diff = f"col={col} row={i} got={g[col][i]!r} exp={e[col][i]!r} ndiff={int(neq.sum())}"
                        break
                except Exception as ex:
                    diff = f"col={col} cmp_error={ex}"
                    break
            results[name] = f"HASH_MISMATCH {diff}"
        else:
            results[name] = f"OK rows={len(g)}"
    npass = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        if not v.startswith("OK"):
            print(f" ! {k}: {v}")
            # the generated chain is the repro: print it next to the failure
            if k in oracle:
                print(f"   sql: {oracle[k]}")
    print(f"== fuzz {npass}/{len(results)} exact-match")
    sys.exit(0 if npass == len(results) and results else 1)


if __name__ == "__main__":
    main()
