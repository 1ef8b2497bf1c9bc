"""Driver-contract smoke tests (BASELINE.md t1)."""

from __future__ import annotations

import __spark_entry__ as contract


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_every_oracle_key_has_query():
    qs, oracles = contract.queries(), contract.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


def test_queries_run_and_have_stable_schema(spark, sf_dir):
    # structural check on a cheap subset: schema is non-empty & named
    qs = contract.queries()
    for name in ("q01_pricing_summary", "q42_census", "q50_dedup_exact"):
        df = qs[name](spark, sf_dir)
        assert df.columns, name
