"""Salted aggregation must be exactly equivalent to direct aggregation
for algebraic functions (the skew-spread is a physical rewrite only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.session import table
from engine.skew import salted_agg


def test_salted_agg_equals_direct(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    salted = salted_agg(
        li,
        "l_returnflag",
        {
            "sum_qty": ("l_quantity", "sum"),
            "n": ("*", "count"),
            "min_price": ("l_extendedprice", "min"),
            "max_price": ("l_extendedprice", "max"),
        },
        n_salts=8,
    )
    direct = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )
    s = {r.l_returnflag: (round(r.sum_qty, 6), r.n, r.min_price, r.max_price) for r in salted.collect()}
    d = {r.l_returnflag: (round(r.sum_qty, 6), r.n, r.min_price, r.max_price) for r in direct.collect()}
    assert s == d


def test_salted_agg_spreads_partials(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem")
    plan = salted_agg(li, "l_returnflag", {"n": ("*", "count")})._jdf.queryExecution().executedPlan().toString()
    # two aggregation phases → two hash exchanges (salted then merged)
    assert plan.count("Exchange hashpartitioning") == 2


def test_salted_join_equals_direct(spark, sf_dir):
    from engine.skew import salted_join

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    salted = salted_join(li, o, "l_orderkey", n_salts=8)
    direct = li.join(o, "l_orderkey")
    assert salted.count() == direct.count()
    s = sorted(map(tuple, salted.collect()))
    d = sorted(map(tuple, direct.collect()))
    assert s == d
    # left join keeps unmatched big-side rows exactly once
    li_extra = li.union(spark.createDataFrame([(-1, 0.0)], li.schema))
    left = salted_join(li_extra, o, "l_orderkey", n_salts=8, how="left")
    assert left.filter(F.col("l_orderkey") == -1).count() == 1


def test_salted_join_spreads_key(spark, sf_dir):
    from engine.skew import salted_join

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    plan = salted_join(li, o, "l_orderkey", n_salts=8)._jdf.queryExecution().executedPlan().toString()
    # the join key must include the salt so the hot key spreads
    assert "_salt" in plan
