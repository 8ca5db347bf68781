#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <out>/oracle_sql.json in DuckDB with the sf
tables registered under bare names, and compares: schema (column names),
row count, and a hash of the values with columns sorted by name and rows
sorted by all columns.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
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
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    results = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        name = os.path.basename(d)
        if not os.path.isdir(d) or (only and name not in only):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
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
        mark = "+" if v.startswith("OK") else ("~" if v.startswith("ROWS_ONLY") else "!")
        print(f" {mark} {k}: {v}")
    print(f"== {npass}/{len(results)} exact-match, "
          f"{sum(1 for v in results.values() if v.startswith('ROWS_ONLY'))} rows-only")
    # nonzero on any hard mismatch so OracleSweep (and CI-style callers)
    # can treat this as a gate; ROWS_ONLY is by-design, not a failure
    bad = [k for k, v in results.items()
           if not (v.startswith("OK") or v.startswith("ROWS_ONLY"))]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
