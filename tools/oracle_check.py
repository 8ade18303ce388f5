#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare (columns sorted by name, rows sorted by
all columns, exact value match).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
(dev-only tooling; the shipped Scala library never depends on this)
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    if len(df) > 0:
        df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    for name in sorted(oracles):
        rp = os.path.join(out_dir, name)
        if not os.path.isdir(rp):
            results[name] = "MISSING_RESULT"
            print(f"{name}: MISSING_RESULT")
            continue
        try:
            got = normalize(con.execute(f"SELECT * FROM '{rp}/*.parquet'").df())
            want = normalize(con.execute(oracles[name]).df())
        except Exception as e:
            results[name] = f"ERROR {e}"
            print(f"{name}: ERROR {str(e)[:200]}")
            continue
        status = "MATCH"
        if list(got.columns) != list(want.columns):
            status = f"SCHEMA_MISMATCH got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWCOUNT got={len(got)} want={len(want)}"
        else:
            for c in got.columns:
                gv, wv = got[c].tolist(), want[c].tolist()
                bad = [(i, g, w) for i, (g, w) in enumerate(zip(gv, wv)) if not values_equal(g, w)]
                if bad:
                    i, g, w = bad[0]
                    status = f"VALUE_MISMATCH col={c} row={i} got={g!r} want={w!r} ({len(bad)} diffs)"
                    break
        results[name] = status
        print(f"{name}: {status}")

    n_ok = sum(1 for v in results.values() if v == "MATCH")
    print(f"\n{n_ok}/{len(results)} MATCH")
    sys.exit(0 if n_ok == len(results) else 1)


if __name__ == "__main__":
    main()
