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


def test_q30_approx_distinct_within_error_bound(spark, sf_dir):
    # q30's HLL++ sketches are configured at 2% rsd; assert the
    # estimates land within 3 sigma of the exact twin counts
    from pyspark.sql import functions as F

    from engine import relational
    from engine.session import table

    approx = relational.q30_approx_distinct(spark, sf_dir).collect()[0]
    exact = (
        table(spark, sf_dir, "lineitem")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()[0]
    )
    assert abs(approx.approx_orders - exact.orders) / exact.orders < 0.06
    assert abs(approx.approx_parts - exact.parts) / exact.parts < 0.06
