#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare (columns sorted by name, rows sorted by
all columns, exact value match).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
(dev-only tooling; the shipped Scala library never depends on this)
"""
import sys, os, json, math
import duckdb
import numpy as np
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


def dtype_kind(dt) -> str:
    """Coarse dtype family: int widths are interchangeable (the driver hashes
    stringified values, '1234' == '1234'), but int vs float is NOT ('1234' !=
    '1234.0'). HUGEINT leaking through a DuckDB twin lands in the object/float
    family and must be flagged even when every value is numerically equal."""
    k = getattr(dt, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def values_equal(a, b):
    if a is None and b is None:
        return True
    a_int = isinstance(a, (int, np.integer)) and not isinstance(a, bool)
    b_int = isinstance(b, (int, np.integer)) and not isinstance(b, bool)
    a_flt = isinstance(a, (float, np.floating))
    b_flt = isinstance(b, (float, np.floating))
    # dtype-strict: an int on one side and a float on the other hash apart in
    # the driver even when numerically equal (the d23/HUGEINT class) — fail.
    if (a_int and b_flt) or (a_flt and b_int):
        return False
    a_bool = isinstance(a, (bool, np.bool_))
    b_bool = isinstance(b, (bool, np.bool_))
    if a_bool != b_bool:
        return False
    if a_flt and b_flt:
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def selftest():
    """Pin the dtype-strict behavior: numerically-equal int vs float must FAIL
    (the d23/HUGEINT drift class the lenient mirror missed in r13)."""
    assert not values_equal(1234, 1234.0), "int/float drift must not be equal"
    assert not values_equal(np.int64(7), np.float64(7.0))
    assert values_equal(1234, 1234) and values_equal(1.5, 1.5)
    assert values_equal(float("nan"), float("nan"))
    assert not values_equal(True, 1.0)
    con = duckdb.connect()
    ints = con.execute("SELECT CAST(1234 AS BIGINT) AS v").df()
    huge = con.execute("SELECT CAST(1234 AS HUGEINT) AS v").df()
    assert dtype_kind(ints["v"].dtype) == "int"
    assert dtype_kind(huge["v"].dtype) != "int", (
        f"HUGEINT maps to {huge['v'].dtype}; if this ever becomes int the "
        "driver hash would agree too and strictness is moot")
    print("selftest: OK (int/float drift detected, HUGEINT flagged as "
          f"{dtype_kind(huge['v'].dtype)})")


def main():
    if sys.argv[1:] == ["--selftest"]:
        selftest()
        return
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
                gk, wk = dtype_kind(got[c].dtype), dtype_kind(want[c].dtype)
                if gk != wk:
                    status = f"DTYPE_MISMATCH col={c} got={gk}({got[c].dtype}) want={wk}({want[c].dtype})"
                    break
            for c in got.columns:
                if status != "MATCH":
                    break
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
