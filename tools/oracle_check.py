"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry from ``__spark_entry__`` at a given SF
and compares against ``oracle_sql()`` via DuckDB: row count, sorted
column names, and an order-insensitive value comparison (exact for
non-floats, tolerant for floats). Queries without an oracle get a
rows-only check.

Usage:  python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            import numpy as np

            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple, np.ndarray)) else v
            )
    # stable sort over stringified rows (floats rounded so engine noise
    # doesn't reorder) for order-insensitive compare
    if len(df):
        keydf = df.copy()
        for c in keydf.columns:
            if pd.api.types.is_float_dtype(keydf[c]):
                keydf[c] = keydf[c].round(4)
        key = keydf.astype(str).agg(tuple, axis=1)
        df = df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def _values_match(a: pd.DataFrame, b: pd.DataFrame, rtol=1e-6, atol=1e-6) -> str | None:
    """Tolerant by default; SPARK_GRAFT_STRICT=1 demands bit-identical
    floats — a local simulation of the driver's exact hash compare
    (r1 q25: values within tolerance still hash-mismatch)."""
    strict = bool(os.environ.get("SPARK_GRAFT_STRICT"))
    if strict:
        rtol = atol = 0.0
    if list(a.columns) != list(b.columns):
        return f"columns differ: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"row count differ: {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if strict and (
            pd.api.types.is_float_dtype(av) != pd.api.types.is_float_dtype(bv)
        ):
            # The driver's canonical hash is bit-exact over the
            # materialized values, so int64-vs-float64 is a mismatch
            # even when every value is numerically equal.  The classic
            # leak: DuckDB sum(bigint) returns HUGEINT, which fetchdf()
            # materializes as float64 (r8's q120 red row) — the oracle
            # must cast (::bigint) at the SQL level.
            return f"col {c}: dtype mismatch {av.dtype} vs {bv.dtype} (int/float)"
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            for i, (x, y) in enumerate(zip(av.astype(float), bv.astype(float))):
                if pd.isna(x) and pd.isna(y):
                    continue
                if pd.isna(x) != pd.isna(y) or (
                    x != y and not math.isclose(x, y, rel_tol=rtol, abs_tol=atol)
                ):
                    return f"col {c} row {i}: {x!r} vs {y!r}"
        else:
            eq = (av.astype(str) == bv.astype(str)) | (av.isna() & bv.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                return f"col {c} row {i}: {av[i]!r} vs {bv[i]!r}"
    return None


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as mod

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # driver-like session: none of engine.session's configs —
        # catches hidden config dependencies in the contract
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("oracle_check_vanilla").getOrCreate()
    else:
        from engine.session import get_session

        spark = get_session("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    qs, oracles = mod.queries(), mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        err = _values_match(_normalize(sdf), _normalize(odf))
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"pass {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
