"""Relational operator inventory (SURVEY.md §2.6) over the testdata star schema.

Every function is a declarative DataFrame plan — scans, joins, aggs,
windows, set ops, scalar functions — so Catalyst/AQE pick the physical
strategy: broadcast-hash for the small dims (region/nation/supplier),
sort-merge for lineitem⋈orders, partial+final hash aggregation,
parquet predicate pushdown + column pruning.

Scale notes (100 TB posture):
* Dim tables are explicitly ``broadcast()`` — at TPC-H-like ratios
  region/nation/part/supplier stay tiny relative to the fact table, so
  the fact side never shuffles for those joins.
* Fact⋈fact (lineitem⋈orders) is left to sort-merge on the join key;
  with AQE skew-join splitting on. At 100 TB both sides would be
  bucketed by orderkey at write time to elide the shuffle entirely —
  see engine/io.py:write_bucketed.
* Aggregations are expressed groupBy().agg() so map-side partial
  aggregation happens before the exchange.
* Every computed column is aliased to match ``ORACLE`` (driver hashes
  sort columns by name); doubles are rounded to fixed precision in
  BOTH engines to absorb summation-order noise.

Reference parity: the reference has no joins/windows/set-ops (SURVEY
§2.6 — single-matrix world); this module is the engine surface the
driver contract (BASELINE.json) requires on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .session import load_events, table


# ---------------------------------------------------------------- aggregations

def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: filter → hash-agg → sort.

    Filter pushed to the parquet scan; partial aggregation map-side.
    """
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped single global aggregate with range predicates —
    all three filters reach the parquet scan (PushedFilters)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.04, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"))
    )


def q18_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count + countDistinct per group (expand-based distinct aggregation)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


def q19_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; grouping-set nulls coalesced to 'ALL'
    so the oracle hash is label-stable.

    Empty-input semantics (whole grouping family, q19/q20/q26): Spark
    expands each input row into its grouping-set combinations before
    the hash agg, so an EMPTY input yields zero rows — including no
    grand-total row — where the SQL standard (and DuckDB) produce one
    ()-set row with count 0. The engine ships Spark's behavior (an
    empty slice producing a phantom all-zero total is rarely what a
    report wants); the oracles mirror it with HAVING count(*) > 0,
    which is a no-op on any non-empty input. Found by the relational
    fuzzer (tests/test_fuzz_oracle.py) on an empty lineitem."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


def q20_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    o = table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "avg_price",
        )
    )


# ---------------------------------------------------------------------- joins

def q02_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q5-shaped): fact ⋈ dims with explicit broadcast
    of every dim — the lineitem side shuffles only for the final agg.
    sort-merge is reserved for lineitem⋈orders (both scale with SF).
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


def q03_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective dim filter → join → agg → top-k.
    Deterministic top-10 via (revenue desc, orderkey) total order."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q07_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim broadcast-hash join, no shuffle on either side."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name", "r_name")
        .orderBy("n_nationkey")
    )


def q08_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers having ≥1 order (EXISTS). No fan-out —
    the semi join short-circuits on first match."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def q09_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no orders (NOT EXISTS)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


def q10_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join: equi part on nationkey keeps it a hash
    join with a residual predicate — never a raw cross product."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return (
        c.join(
            F.broadcast(s),
            (c.c_nationkey == s.s_nationkey) & (c.c_acctbal > s.s_acctbal),
        )
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("n_richer_customers"))
        .orderBy("s_suppkey")
    )


def q04_outer_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving orderless customers, counting orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("c_custkey")
    )


# -------------------------------------------------------------------- windows

def q11_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via row_number over a total order (ties broken
    by orderkey → deterministic across partitionings)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("totalprice"), "rn")
    )


def q12_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag()/lead(): days since previous / until next order."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("days_since_prev"),
        F.datediff(
            F.lead("o_orderdate").over(w), F.col("o_orderdate")
        ).alias("days_until_next"),
    )


def q36_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function surface: rank, dense_rank, percent_rank,
    ntile, cume_dist over order value within status."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def q13_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative frame: rowsBetween(unboundedPreceding, currentRow)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", F.round(F.sum("o_totalprice").over(w), 2).alias("running_total")
    )


def q31_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: per customer, rolling 30-day order-value sum
    (value-based frame, vs the row-based frame in q13)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        # o_orderdate scans as TIMESTAMP_NTZ which has no direct long
        # cast; route via TIMESTAMP (session TZ is pinned to UTC)
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("rolling_30d_total"),
    )


def q14_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: TakeOrderedAndProject — O(k) per partition, no
    full sort shuffle."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
        .limit(10)
    )


# --------------------------------------------------------------------- set ops

def q15_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two segment slices."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey", "c_mktsegment")
    b = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_mktsegment")
    return a.unionByName(b)


def q16_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers appearing in both order-status slices."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


def q17_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: multiset difference of order-status slices."""
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.exceptAll(b)


# ------------------------------------------------------------- scalar functions

def q21_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface: lower/concat/regexp_extract/split/substring/length."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower(F.col("p_name")).alias("name_lower"),
        F.regexp_extract(F.col("p_brand"), r"(\d+)", 1).alias("brand_num"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.length(F.col("p_name")).alias("name_len"),
        F.substring(F.col("p_name"), 1, 5).alias("name_pfx"),
    )


def q22_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date surface: truncate to month, extract year, aggregate."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.date_trunc("month", F.col("o_orderdate")).alias("month"),
            F.year(F.col("o_orderdate")).alias("yr"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


def q23_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (events.props) + aggregate over it.

    Hostile-input hardening (r6, found by fuzzing the composite
    members): a props value whose $.k is non-numeric ('{"k": "x"}',
    '{"k": [1]}') made the bare int cast THROW under ANSI mode —
    at crawl scale malformed metadata is routine and one bad row must
    not kill the aggregate. try_cast maps it to NULL (avg skips it),
    matching the oracle's json_valid + try_cast guard; fixture
    values are unchanged (all fixture props are well-formed)."""
    e = load_events(spark, sf_dir)
    return (
        e.select(
            "event_type",
            F.get_json_object(F.col("props"), "$.k").try_cast("int").alias("k"),
            "value",
        )
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


def q99_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment + stratification
    census: split = md5-derived hash of the row key mod 100 (the
    engine-portable 'randomness' pattern, SURVEY §5) — every engine,
    run, and partitioning assigns identical rows to identical splits,
    and adding data never reshuffles existing assignments (the property
    randomSplit lacks). One narrow projection + one tiny hash agg."""
    e = table(spark, sf_dir, "embeddings")
    h = F.expr(
        "cast(conv(substr(md5(concat('split:', vec_id)), 1, 15), 16, 10) as bigint) % 100"
    )
    split = (
        F.when(h < 80, F.lit("train")).when(h < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return (
        e.select(split.alias("split"), "label")
        .groupBy("split", "label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("split", "label")
    )


def q98_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding int8 quantization (training-data storage pattern: 4×
    less I/O than float32 at 100 TB): per-vector symmetric scale
    s = max|v|/127, q_i = floor(v_i/s + 0.5) clipped to [-127, 127],
    plus the dequantization error actually incurred — all JVM
    higher-order functions, one narrow projection, no shuffle.

    floor(x + 0.5) instead of round(): identical IEEE ops in both
    engines (Spark's round() differs from DuckDB's on ties — see
    SCALING.md float-determinism notes). Quantized vectors are emitted
    '|'-joined (driver canonicalizer can't hash raw arrays).

    Degenerate vectors (r7 similarity fuzzer finds): the all-zero
    vector quantizes to all-zero at scale 1 (with a NULL scale, both
    engines' NULL-ignoring least/greatest drove every element to 127
    and the error legs diverged — Spark's greatest dropped the NULL
    error terms to 0, DuckDB's list max returned NULL); a NaN/Inf
    vector gets NULL quantized/max_err (int8 quantization of a
    non-finite value is undefined, and the NaN error leg crashed the
    oracle's ANSI bigint cast) — the CASE guard keeps the throwing
    cast out of the taken branch on both engines."""
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    d = (
        e.select("vec_id", v.alias("v"))
        .withColumn(
            "fin",
            F.expr(
                "aggregate(v, true, (acc, x) ->"
                " acc AND NOT isnan(x) AND abs(x) != double('Infinity'))"
            ),
        )
        .withColumn(
            "s",
            F.coalesce(
                F.nullif(
                    F.expr("aggregate(v, 0D, (acc, x) -> greatest(acc, abs(x)))") / F.lit(127.0),
                    F.lit(0.0),
                ),
                F.lit(1.0),
            ),
        )
    )
    clip = "greatest(-127D, least(127D, floor(x / s + 0.5D)))"
    return d.select(
        "vec_id",
        F.when(
            F.col("fin"),
            F.array_join(F.expr(f"transform(v, x -> cast({clip} as int))"), "|"),
        ).alias("quantized"),
        F.when(
            F.col("fin"),
            F.floor(
                F.expr(
                    f"aggregate(v, 0D, (acc, x) -> greatest(acc, abs({clip} * s - x)))"
                )
                * F.lit(1e6)
            ).cast("bigint"),
        ).alias("max_err_1e6"),
    )


def q96_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches surface, Spark 3.5+):
    per-event-type distinct-user sketches, then the GLOBAL distinct
    estimate by unioning the three group sketches — no second scan.

    This is the 100 TB incremental-cardinality pattern that plain
    approx_count_distinct (q30) can't do: persist tiny sketch binaries
    per partition/day, merge on demand for any rollup grain.
    Rows-only (sketch internals aren't SQL-portable); the error-bound
    test pins every estimate to its exact twin."""
    e = load_events(spark, sf_dir)
    sketches = e.groupBy("event_type").agg(F.expr("hll_sketch_agg(user_id)").alias("s"))
    per_type = sketches.select(
        "event_type", F.expr("hll_sketch_estimate(s)").alias("approx_users")
    )
    overall = sketches.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(s))").alias("approx_users")
    ).select(F.lit("ALL").alias("event_type"), "approx_users")
    return per_type.unionByName(overall).orderBy("event_type")


def q95_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured shredding via Spark 4 VARIANT: JSON text →
    ``parse_json`` → typed path extraction (`variant_get`), including a
    nested object, an array element, and a missing-path probe — the
    schema-on-read ingest pattern (at 100 TB: parse once into a
    variant column, shred hot paths into typed columns).

    The JSON input is built row-wise from orders (the fixture has no
    rich JSON), so the oracle is the direct projection of the source
    fields — verifying the text→variant→typed round trip is lossless
    (shortest-repr double printing parses back bit-identical)."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    j = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.struct(
                F.col("o_custkey").alias("cust"), F.col("o_orderpriority").alias("prio")
            ).alias("meta"),
            F.array(F.col("o_totalprice")).alias("amounts"),
        )
    )
    v = F.parse_json(j)
    return o.select(v.alias("v")).select(
        F.expr("variant_get(v, '$.id', 'bigint')").alias("o_id"),
        F.expr("variant_get(v, '$.meta.cust', 'bigint')").alias("cust"),
        F.expr("variant_get(v, '$.meta.prio', 'string')").alias("prio"),
        F.round(F.expr("variant_get(v, '$.amounts[0]', 'double')"), 2).alias("amount"),
        F.expr("try_variant_get(v, '$.missing', 'int') IS NULL").alias("missing_is_null"),
    )


def q24_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math + conditional surface: CASE WHEN, abs/ceil/floor/sqrt/pow/mod.

    Domain note (relational fuzzer find): sqrt of a negative quantity
    is NaN in Spark but an ERROR in DuckDB — the oracle carries an
    explicit NaN CASE so both engines agree on out-of-domain rows
    (fixture quantities are all positive; the hostile case exists at
    ingest scale, e.g. sign-flipped returns)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.when(F.col("l_discount") > 0.05, F.lit("HIGH"))
            .when(F.col("l_discount") > 0.02, F.lit("MID"))
            .otherwise(F.lit("LOW"))
            .alias("disc_band"),
            F.round(F.sqrt(F.col("l_quantity")), 6).alias("sqrt_qty"),
            F.round(F.pow(F.col("l_discount"), F.lit(2)), 8).alias("disc_sq"),
            (F.col("l_linenumber") % 3).alias("ln_mod3"),
            F.ceil(F.col("l_quantity")).alias("qty_ceil"),
            F.abs(F.col("l_quantity") - 25).cast("double").alias("qty_dev"),
        )
    )


def q25_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders above their customer's
    average — Catalyst de-correlates to an aggregate + join.

    The average is computed as exact-decimal sum ÷ count (one IEEE
    double division) instead of avg(double): double summation is
    order-dependent, so avg differs by 1 ulp between engines/runs
    (r1: 28/7540 rows flipped at round-4). Decimal sum is exact and
    associative — the same value on any partitioning, at any scale.
    No broadcast hint: the aggregate has one row per customer, which
    scales with SF — AQE picks the join strategy."""
    o = table(spark, sf_dir, "orders")
    avg_per_cust = o.groupBy(F.col("o_custkey").alias("k")).agg(
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("cust_avg")
    )
    return (
        o.join(avg_per_cust, o.o_custkey == avg_per_cust.k)
        .filter(F.col("o_totalprice") > F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"),
                "cust_avg")
    )


def q26_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (finer control than rollup/cube)."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("q26_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM q26_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


def q27_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: document count per (source, lang) with langs as columns."""
    d = table(spark, sf_dir, "documents")
    langs = ["de", "en", "es", "fr", "zh"]
    out = (
        d.groupBy("source")
        .pivot("lang", langs)
        .agg(F.count(F.lit(1)))
        .orderBy("source")
    )
    return out.select(
        "source", *[F.coalesce(F.col(lg), F.lit(0)).cast("bigint").alias(f"n_{lg}") for lg in langs]
    )


def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (custom operator, SURVEY §2.6 'operator Spark lacks'):
    for every event, the timestamp of the same user's most recent
    *prior* purchase. Expressed as a conditional running max over an
    ordered window — one shuffle on user_id, no self-join blow-up,
    linear at 100 TB (vs the naive inequality self-join)."""
    e = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(w).alias("prev_purchase_ts"),
    )


def q29_map_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/map scalar surface: construction, transform, contains,
    slicing, element access, map_from / element lookup.

    Array results are emitted as '|'-joined strings: the driver's
    canonicalizer (pandas sort_values) crashes on raw list columns
    (r1: TypeError unhashable type 'list'), and the string form is
    hashable in every harness with identical semantics."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.array_join(
            F.expr("transform(split(p_type, ' '), t -> upper(t))"), "|"
        ).alias("type_tokens_upper"),
        F.array_contains(F.split(F.col("p_type"), " "), "PROMO").alias("is_promo"),
        F.array_join(F.slice(F.split(F.col("p_name"), " "), 1, 2), "|").alias("name_head2"),
        F.expr("element_at(split(p_type, ' '), -1)").alias("type_tail"),
        F.expr("map('brand', p_brand, 'type', p_type)['brand']").alias("brand_via_map"),
        F.size(F.split(F.col("p_name"), " ")).alias("n_name_tokens"),
    )


def q30_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++). Rows-only: DuckDB's HLL sketch
    differs; the exact twin is q18. tests assert the error bound."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
    )


def q32_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate surface: corr, covariance, population/
    sample variance & stddev — per return flag.

    corr is computed as covar_pop / nullif(σx·σy, 0) — algebraically
    identical to Pearson's r (the n's cancel) but NULL instead of a
    DIVIDE_BY_ZERO crash on a zero-variance group (a single-row or
    constant-valued group — found by the relational fuzzer: Spark's
    built-in corr THROWS under ANSI mode there, and one degenerate
    group must not kill the whole aggregate at crawl scale). The
    oracle carries the same guarded quotient.

    r7 (ADVICE): the σ legs are computed over PAIRWISE-COMPLETE rows
    (both columns non-null), matching built-in corr/covar_pop's
    pairwise deletion — a bare stddev_pop ranges over its own
    column's non-null rows, so asymmetric NULLs would make the
    quotient diverge from Pearson's r. The fixture columns are
    non-nullable (identical output, hash unchanged); the guard is for
    real nullable inputs."""
    li = table(spark, sf_dir, "lineitem")
    pairwise = F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    corr_den = F.stddev_pop(F.when(pairwise, F.col("l_quantity"))) * F.stddev_pop(
        F.when(pairwise, F.col("l_extendedprice"))
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.covar_pop("l_quantity", "l_extendedprice")
                / F.nullif(corr_den, F.lit(0.0)),
                6,
            ).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covar_s"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covar_p"),
            F.round(F.var_samp("l_discount"), 8).alias("var_disc"),
            F.round(F.stddev_pop("l_quantity"), 6).alias("stdp_qty"),
        )
        .orderBy("l_returnflag")
    )


def q33_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list/collect_set as deterministic sorted arrays (raw
    collect order is partition-dependent — always sort before compare).
    Output joined to '|' strings: hashable for the driver canonicalizer
    (raw list columns crash its pandas sort, r1 q29/q33)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_custkey") < 20)
        .groupBy("o_custkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("o_orderstatus")), "|").alias("statuses"),
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "|").alias("priorities"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_custkey")
    )


def q34_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic surface: add_months, date_add, last_day,
    dayofweek, quarter, interval difference."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("order_date"),
        F.add_months(d, 3).alias("plus_3m"),
        F.date_add(d, 45).alias("plus_45d"),
        F.last_day(d).alias("month_end"),
        F.dayofweek(d).alias("dow"),
        F.quarter(d).alias("qtr"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
    )


def q35_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join of two small dims (the one join shape where
    a cross product is intended — never for scaling tables)."""
    n = table(spark, sf_dir, "nation").select("n_name")
    r = table(spark, sf_dir, "region").select("r_name")
    return n.crossJoin(F.broadcast(r)).select("n_name", "r_name")


def q39_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide numeric columns → long (metric, value) rows
    (the inverse of q27's pivot)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'price', l_extendedprice, 'discount', l_discount)"
        ).alias("metric", "value"),
    ).select("l_orderkey", "l_linenumber", "metric", F.round("value", 4).alias("value"))


QUERIES = {
    "q01_pricing_summary": q01_pricing_summary,
    "q02_revenue_by_nation": q02_revenue_by_nation,
    "q03_top_orders": q03_top_orders,
    "q04_outer_join_agg": q04_outer_join_agg,
    "q06_forecast_revenue": q06_forecast_revenue,
    "q07_broadcast_join": q07_broadcast_join,
    "q08_semi_join": q08_semi_join,
    "q09_anti_join": q09_anti_join,
    "q10_theta_join": q10_theta_join,
    "q11_window_rank": q11_window_rank,
    "q12_window_lag": q12_window_lag,
    "q13_window_running_sum": q13_window_running_sum,
    "q14_topk_orders": q14_topk_orders,
    "q15_union_all": q15_union_all,
    "q16_intersect": q16_intersect,
    "q17_except": q17_except,
    "q18_distinct_agg": q18_distinct_agg,
    "q19_rollup": q19_rollup,
    "q20_cube": q20_cube,
    "q21_string_funcs": q21_string_funcs,
    "q22_date_funcs": q22_date_funcs,
    "q23_json_funcs": q23_json_funcs,
    "q24_math_case": q24_math_case,
    "q25_correlated_subquery": q25_correlated_subquery,
    "q26_grouping_sets": q26_grouping_sets,
    "q27_pivot": q27_pivot,
    "q28_asof_join": q28_asof_join,
    "q29_map_array_funcs": q29_map_array_funcs,
    "q30_approx_distinct": q30_approx_distinct,
    "q31_window_range_frame": q31_window_range_frame,
    "q32_stat_aggregates": q32_stat_aggregates,
    "q33_collect_sorted": q33_collect_sorted,
    "q34_date_arithmetic": q34_date_arithmetic,
    "q35_cross_join": q35_cross_join,
    "q36_rank_functions": q36_rank_functions,
    "q39_unpivot": q39_unpivot,
}

ORACLE = {
    "q01_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q02_revenue_by_nation": """
        SELECT n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
    "q03_top_orders": """
        SELECT o_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderkey
        LIMIT 10
    """,
    "q04_outer_join_agg": """
        SELECT c_custkey, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey
    """,
    "q06_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
          AND l_discount BETWEEN 0.04 AND 0.07
          AND l_quantity < 24
    """,
    "q07_broadcast_join": """
        SELECT n_nationkey, n_name, r_name
        FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY n_nationkey
    """,
    "q08_semi_join": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q09_anti_join": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "q10_theta_join": """
        SELECT s_suppkey, s_name, count(*) AS n_richer_customers
        FROM customer JOIN supplier
          ON c_nationkey = s_nationkey AND c_acctbal > s_acctbal
        GROUP BY s_suppkey, s_name ORDER BY s_suppkey
    """,
    "q11_window_rank": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
        FROM (SELECT *, row_number() OVER
                (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)::int AS rn
              FROM orders) t
        WHERE rn <= 3
    """,
    "q12_window_lag": """
        SELECT o_custkey, o_orderkey,
               datediff('day',
                        lag(o_orderdate) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate, o_orderkey),
                        o_orderdate)::int AS days_since_prev,
               datediff('day', o_orderdate,
                        lead(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey))::int
                 AS days_until_next
        FROM orders
    """,
    "q39_unpivot": """
        SELECT l_orderkey, l_linenumber, metric, round(value, 4) AS value
        FROM (
            UNPIVOT (SELECT l_orderkey, l_linenumber,
                            l_quantity AS quantity,
                            l_extendedprice AS price,
                            l_discount AS discount
                     FROM lineitem WHERE l_orderkey < 100)
            ON quantity, price, discount
            INTO NAME metric VALUE value) u
    """,
    "q36_rank_functions": """
        SELECT o_orderstatus, o_orderkey,
               rank() OVER w::int AS rnk,
               dense_rank() OVER w::int AS drnk,
               round(percent_rank() OVER w, 6) AS prnk,
               ntile(4) OVER w::int AS quartile,
               round(cume_dist() OVER w, 6) AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey)
    """,
    "q13_window_running_sum": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        FROM orders
    """,
    "q14_topk_orders": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "q15_union_all": """
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        UNION ALL
        SELECT c_custkey, c_mktsegment FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    "q16_intersect": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "q17_except": """
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    "q18_distinct_agg": """
        SELECT o_orderstatus,
               count(DISTINCT o_custkey) AS n_customers,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    "q19_rollup": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               count(*) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        HAVING count(*) > 0
    """,
    "q20_cube": """
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n,
               round(avg(o_totalprice), 4) AS avg_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        HAVING count(*) > 0
    """,
    "q21_string_funcs": """
        SELECT p_partkey,
               lower(p_name) AS name_lower,
               -- Spark regexp_extract: NULL in -> NULL out, no-match -> '';
               -- DuckDB returns NULL for both, so the '' backstop must
               -- not fire on NULL input (relational fuzzer find)
               CASE WHEN p_brand IS NULL THEN NULL
                    ELSE coalesce(regexp_extract(p_brand, '(\\d+)', 1), '') END
                 AS brand_num,
               -- DuckDB split_part(NULL, ...) is '' not NULL; Spark's
               -- split(NULL)[0] is NULL (relational fuzzer find)
               CASE WHEN p_type IS NULL THEN NULL
                    ELSE split_part(p_type, ' ', 1) END AS type_head,
               -- || propagates NULL like Spark's concat; DuckDB's
               -- concat() skips NULL args (relational fuzzer find)
               p_brand || ':' || p_type AS brand_type,
               length(p_name)::int AS name_len,
               substring(p_name, 1, 5) AS name_pfx
        FROM part
    """,
    "q22_date_funcs": """
        SELECT date_trunc('month', o_orderdate) AS month,
               year(o_orderdate)::int AS yr,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS total
        FROM orders GROUP BY 1, 2
    """,
    "q23_json_funcs": """
        SELECT event_type,
               -- json_valid + try_cast mirror Spark's lenient parser +
               -- try_cast: malformed/non-numeric props -> NULL, not error
               round(avg(CASE WHEN props IS NOT NULL AND json_valid(props)
                              THEN try_cast(json_extract_string(props, '$.k') AS int)
                         END), 6) AS avg_k,
               round(sum(value), 4) AS sum_value,
               count(*) AS n
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "q32_stat_aggregates": """
        SELECT l_returnflag,
               -- same guarded quotient as the Spark side: NULL (not an
               -- ANSI crash / engine-dependent NaN) on zero variance;
               -- sigma legs over pairwise-complete rows, like corr
               round(covar_pop(l_quantity, l_extendedprice)
                     / nullif(stddev_pop(CASE WHEN l_quantity IS NOT NULL
                                          AND l_extendedprice IS NOT NULL
                                         THEN l_quantity END)
                              * stddev_pop(CASE WHEN l_quantity IS NOT NULL
                                            AND l_extendedprice IS NOT NULL
                                           THEN l_extendedprice END), 0),
                     6) AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 4) AS covar_s,
               round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_p,
               round(var_samp(l_discount), 8) AS var_disc,
               round(stddev_pop(l_quantity), 6) AS stdp_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q33_collect_sorted": """
        SELECT o_custkey,
               array_to_string(list_sort(list(o_orderstatus)), '|') AS statuses,
               array_to_string(list_sort(list(DISTINCT o_orderpriority)), '|') AS priorities,
               count(*) AS n
        FROM orders WHERE o_custkey < 20
        GROUP BY o_custkey ORDER BY o_custkey
    """,
    "q34_date_arithmetic": """
        SELECT o_orderkey,
               o_orderdate::date AS order_date,
               (o_orderdate::date + INTERVAL 3 month)::date AS plus_3m,
               (o_orderdate::date + 45)::date AS plus_45d,
               last_day(o_orderdate::date) AS month_end,
               (dayofweek(o_orderdate::date) + 1)::int AS dow,
               quarter(o_orderdate::date)::int AS qtr,
               datediff('day', o_orderdate::date, DATE '2000-01-01')::int AS days_to_y2k
        FROM orders WHERE o_orderkey < 500
    """,
    "q35_cross_join": """
        SELECT n_name, r_name FROM nation CROSS JOIN region
    """,
    "q31_window_range_frame": """
        SELECT o_custkey, o_orderkey,
               round(sum(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)::bigint
                  RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2)
                 AS rolling_30d_total
        FROM orders
    """,
    "q25_correlated_subquery": """
        -- exact decimal sum ÷ count: order-independent, so the double
        -- result is bit-identical to Spark's (avg(double) is not)
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice,
               a.cust_avg
        FROM orders o
        JOIN (SELECT o_custkey AS k,
                     sum(o_totalprice::decimal(18,2))::double / count(*) AS cust_avg
              FROM orders GROUP BY o_custkey) a ON o.o_custkey = a.k
        WHERE o_totalprice > a.cust_avg
    """,
    "q26_grouping_sets": """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               count(*) AS n,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        HAVING count(*) > 0
    """,
    "q27_pivot": """
        SELECT source,
               count(*) FILTER (lang = 'de') AS n_de,
               count(*) FILTER (lang = 'en') AS n_en,
               count(*) FILTER (lang = 'es') AS n_es,
               count(*) FILTER (lang = 'fr') AS n_fr,
               count(*) FILTER (lang = 'zh') AS n_zh
        FROM documents GROUP BY source ORDER BY source
    """,
    "q28_asof_join": """
        -- ::timestamp casts: events.ts is TIMESTAMP_NS in DuckDB but
        -- Spark is µs; the cast truncates ns→µs exactly like Spark's
        -- integer division in load_events
        SELECT event_id, user_id, ts::timestamp AS ts, event_type,
               (max(CASE WHEN event_type = 'purchase' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 )::timestamp AS prev_purchase_ts
        FROM events
    """,
    "q29_map_array_funcs": """
        SELECT p_partkey,
               array_to_string(list_transform(string_split(p_type, ' '), t -> upper(t)), '|')
                 AS type_tokens_upper,
               list_contains(string_split(p_type, ' '), 'PROMO') AS is_promo,
               array_to_string(string_split(p_name, ' ')[1:2], '|') AS name_head2,
               string_split(p_type, ' ')[-1] AS type_tail,
               map(['brand', 'type'], [p_brand, p_type])['brand'][1] AS brand_via_map,
               len(string_split(p_name, ' '))::int AS n_name_tokens
        FROM part
    """,
    "q24_math_case": """
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_discount > 0.05 THEN 'HIGH'
                    WHEN l_discount > 0.02 THEN 'MID'
                    ELSE 'LOW' END AS disc_band,
               -- Spark's sqrt(negative) is NaN; DuckDB's THROWS
               -- (OutOfRange) — mirror the NaN (relational fuzzer find)
               round(CASE WHEN l_quantity < 0 THEN 'NaN'::double
                          ELSE sqrt(l_quantity) END, 6) AS sqrt_qty,
               round(pow(l_discount, 2), 8) AS disc_sq,
               (l_linenumber % 3)::int AS ln_mod3,
               ceil(l_quantity)::bigint AS qty_ceil,
               abs(l_quantity - 25)::double AS qty_dev
        FROM lineitem
    """,
}


# ------------------------------------------------- range join / time rollup

def q81_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: band each lineitem by price via
    ``lo <= l_extendedprice < hi`` against a tiny band dimension.

    The band table is explicitly ``broadcast()`` so the non-equi join
    is a broadcast probe — the fact side never shuffles and the plan is
    a single narrow pass at any scale. A big⋈big range join would
    instead bucketize BOTH sides on ``floor(price / width)``, equi-join
    on the bucket, and re-check the residual range predicate (turns
    O(n·m) nested-loop into a co-partitioned hash join)."""
    bands = spark.createDataFrame(
        [(i, i * 10000.0, (i + 1) * 10000.0) for i in range(12)],
        "band_id int, lo double, hi double",
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(
            F.broadcast(bands),
            (li.l_extendedprice >= bands.lo) & (li.l_extendedprice < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
        .orderBy("band_id")
    )


def q82_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: events aggregated at
    hour AND day AND grand-total grain in ONE pass via ``rollup`` —
    partial aggregation happens map-side per grain, one shuffle total
    (vs. three separate scans at 100 TB). Grain labeled from the
    rollup's null pattern so the oracle needs no GROUPING_ID dialect."""
    e = load_events(spark, sf_dir)
    rolled = (
        e.select(
            F.date_trunc("day", F.col("ts")).alias("d"),
            F.date_trunc("hour", F.col("ts")).alias("h"),
            "value",
        )
        .rollup("d", "h")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )
    return rolled.select(
        F.when(F.col("h").isNotNull(), F.lit("hour"))
        .when(F.col("d").isNotNull(), F.lit("day"))
        .otherwise(F.lit("total"))
        .alias("grain"),
        "d",
        "h",
        "n",
        "sum_value",
    )


def q83_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / quartiles / p95) per
    group — Spark ``percentile`` ≡ DuckDB ``quantile_cont``. At 100 TB
    prefer ``percentile_approx`` — the first-class contract twin q83b
    (KLL-style mergeable sketch, bounded memory); the exact form here
    materializes per-group value multisets and exists as the
    oracle-checked variant.

    The three quartiles share ONE percentile(col, array(...)) buffer —
    three scalar calls build three identical per-group value maps
    (measured 2× slower at sf0.1)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").alias("qs"),
            F.expr("percentile(l_quantity, 0.95D)").alias("p95q"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("qs")[0], 4).alias("p25_price"),
            F.round(F.col("qs")[1], 4).alias("median_price"),
            F.round(F.col("qs")[2], 4).alias("p75_price"),
            F.round(F.col("p95q"), 4).alias("p95_qty"),
        )
        .orderBy("l_returnflag")
    )


def q83b_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch percentiles — the scale-safe twin of q83 and
    the form a 100 TB user should reach FIRST (promoted to a contract
    query per the r3 verdict): ``percentile_approx`` keeps a bounded
    KLL-style sketch per group (accuracy 1000 ⇒ rank error ≤ 0.1%)
    where the exact form materializes per-group value multisets — a
    real memory cliff with 3 giant groups at scale.

    Same output shape as q83. Rows-only: sketch internals aren't
    reproducible in DuckDB; the ≤1% value-error bound vs the exact
    quartiles is pinned by tests/test_contract.py
    (test_q83_approx_percentile_twin_within_error)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile_approx(l_extendedprice, array(0.25D, 0.5D, 0.75D), 1000)"
            ).alias("qs"),
            F.expr("percentile_approx(l_quantity, 0.95D, 1000)").alias("p95q"),
        )
        .select(
            "l_returnflag",
            F.round(F.col("qs")[0], 4).alias("p25_price"),
            F.round(F.col("qs")[1], 4).alias("median_price"),
            F.round(F.col("qs")[2], 4).alias("p75_price"),
            F.round(F.col("p95q"), 4).alias("p95_qty"),
        )
        .orderBy("l_returnflag")
    )


QUERIES.update(
    {
        "q81_range_join": q81_range_join,
        "q82_time_rollup": q82_time_rollup,
        "q83_percentiles": q83_percentiles,
        "q83b_percentiles_approx": q83b_percentiles_approx,
    }
)

ORACLE.update(
    {
        "q81_range_join": """
            WITH bands AS (
                SELECT i::int AS band_id, i * 10000.0 AS lo, (i + 1) * 10000.0 AS hi
                FROM range(0, 12) t(i)
            )
            SELECT band_id, count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
            FROM lineitem JOIN bands
              ON l_extendedprice >= lo AND l_extendedprice < hi
            GROUP BY band_id
        """,
        "q82_time_rollup": """
            WITH g AS (
                SELECT date_trunc('day', ts) AS d, date_trunc('hour', ts) AS h,
                       count(*) AS n, round(sum(value), 4) AS sum_value
                FROM events GROUP BY ROLLUP (d, h)
            )
            SELECT CASE WHEN h IS NOT NULL THEN 'hour'
                        WHEN d IS NOT NULL THEN 'day'
                        ELSE 'total' END AS grain,
                   d::timestamp AS d, h::timestamp AS h, n, sum_value
            FROM g
        """,
        "q83_percentiles": """
            SELECT l_returnflag,
                   round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_price,
                   round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
                   round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_price,
                   round(quantile_cont(l_quantity, 0.95), 4) AS p95_qty
            FROM lineitem GROUP BY l_returnflag
        """,
    }
)


def q86_explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral/table-generating surface: posexplode each part name into
    (position, token) rows — the row-expanding dual of the array
    functions in q29. Narrow (no shuffle before the agg): expansion
    happens inside the scan stage at any scale."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 2000)
    return (
        p.select("p_partkey", F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("pos"), 6).alias("avg_pos"),
        )
    )


def q87_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface over a left join that manufactures real
    nulls (customers with no orders): coalesce, nullif, null-safe
    equality (<=> ≡ IS NOT DISTINCT FROM), and null-aware counts."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum("o_totalprice").alias("spend"), F.count(F.lit(1)).alias("n_orders")
    )
    j = c.filter(F.col("c_custkey") <= 1000).join(
        per_cust, c.c_custkey == per_cust.o_custkey, "left"
    )
    return j.select(
        "c_custkey",
        F.round(F.coalesce(F.col("spend"), F.lit(0.0)), 2).alias("spend0"),
        F.nullif(F.col("n_orders"), F.lit(1)).alias("orders_unless_one"),
        (F.col("spend").eqNullSafe(F.lit(None).cast("double"))).alias("never_ordered"),
        F.when(F.col("spend").isNull(), F.lit("none"))
        .when(F.col("spend") > 200000, F.lit("big"))
        .otherwise(F.lit("small"))
        .alias("spend_band"),
    )


def q88_value_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value window functions: first_value / last_value / nth_value
    over each customer's order history. The frame is pinned to the
    full partition (rowsBetween unbounded/unbounded) — the default
    RANGE..CURRENT ROW frame makes last_value degenerate (≡ current
    row) in both engines, so the explicit frame is the semantics."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 500)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


def q89_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: Levenshtein edit distance between part
    names, blocked on a COMPOSITE key (p_brand, name-length band of
    width 16). Brand alone has 25 values, so block size — and the
    per-block quadratic pair count — grows linearly with data; the
    second key bounds it. Standard blocking trade-off: pairs whose
    name lengths straddle a band boundary are not compared (recall
    loss, mirrored exactly in the oracle). The single equi-join on
    the composite block_key is the 100 TB plan shape."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 400).select(
        "p_partkey",
        "p_name",
        F.concat_ws(
            ":", F.col("p_brand"), F.floor(F.length("p_name") / 16).cast("int")
        ).alias("block_key"),
    )
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 25)
    )


def q90_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width histogram via width_bucket: 12 buckets over order
    value [0, 600k), plus under/overflow buckets 0 and 13. One narrow
    projection + one hash agg on a ≤14-value key — the distributed
    histogram pattern (map-side partials make the shuffle O(buckets)
    per partition regardless of input size)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket(
                F.col("o_totalprice"), F.lit(0.0), F.lit(600000.0), F.lit(12)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q91_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/filtered aggregation surface: count_if, sum-where
    (≡ SQL FILTER clause), bool_and / bool_or — all single-pass
    map-side-combinable aggregates, no extra scan per condition."""
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.round(
            F.sum(F.when(F.col("l_tax") > 0.04, F.col("l_extendedprice"))), 2
        ).alias("taxed_revenue"),
        F.bool_and(F.col("l_quantity") > 0).alias("all_positive_qty"),
        F.bool_or(F.col("l_quantity") > 49).alias("any_max_qty"),
    )


def q92_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a session breaks when a
    user's gap since their previous event exceeds 30 minutes; session
    number = running sum of break flags. The batch dual of streaming
    session_window (q72) — one shuffle on user_id, then both window
    passes and the final agg run within the sorted partition. Interval
    arithmetic on timestamps (not epoch-second casts) keeps sub-second
    precision identical across engines."""
    e = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    is_start = F.when(
        prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    sess = e.select("user_id", "event_id", "ts", "value").withColumn(
        "is_start", is_start
    ).withColumn("session_no", F.sum("is_start").over(wcum))
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("session_value"),
    )


def q93_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest-record dedup via max_by / min_by: one hash agg
    collapses each user's event history to its newest (and oldest)
    record — the CDC-compaction pattern. Cheaper than the
    window+filter form at scale: partial max_by state is one row per
    (partition × user), so the shuffle is O(users), and no sort is
    needed.

    The ordering key is TOTAL: max_by(x, ts) alone picks an arbitrary
    winner among same-microsecond events (routine at scale; the q47
    tie class), and DuckDB's arg_max only orders by scalar types, so
    the (ts, event_id) tiebreak is encoded as a zero-padded string —
    bytewise comparison of fixed-width decimal strings equals numeric
    order in both engines. Among tied ts the larger event_id is
    'latest' and the smaller is 'first' (documented choice). Fixture
    outputs unchanged ((user_id, ts) is unique there).

    Each component is biased by +2^63 (decimal(38,0) arithmetic, both
    engines) before zero-padding: bytewise order equals numeric order
    only for NON-NEGATIVE values — a pre-1970 timestamp (negative
    unix_micros) or negative event_id would left-pad a '-' (ASCII 45
    < '0') and misorder against positives (r5 ADVICE). The bias maps
    the whole int64 domain onto [0, 2^64), always 20 digits or fewer,
    so the encoding is total everywhere, not just on post-epoch data
    (planted pre-epoch test in test_fuzz_oracle)."""
    e = load_events(spark, sf_dir)
    bias = F.expr("CAST(9223372036854775808 AS DECIMAL(38,0))")
    key = F.concat(
        F.lpad((F.unix_micros(F.col("ts")).cast("decimal(38,0)") + bias).cast("string"), 20, "0"),
        F.lpad((F.col("event_id").cast("decimal(38,0)") + bias).cast("string"), 20, "0"),
    )
    return e.groupBy("user_id").agg(
        F.max_by("event_id", key).alias("latest_event_id"),
        F.max_by("event_type", key).alias("latest_event_type"),
        F.round(F.max_by("value", key), 4).alias("latest_value"),
        F.min_by("event_id", key).alias("first_event_id"),
        F.max("ts").alias("latest_ts"),
    )


def _trunc4(col):
    """floor(x·10⁴)/10⁴ — engine-portable 4-decimal truncation (the
    q57 _trunc6 pattern): round(x, 4) is HALF_UP on the decimal repr
    in Spark but binary rounding in DuckDB, so exact .xxxx5 ties flip
    between engines; floor of the identical IEEE product cannot."""
    return F.floor(col * F.lit(1e4)) / F.lit(1e4)


def q46_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling + LOCF interpolation: per-user daily
    activity densified to a complete calendar (missing days
    materialized via sequence+explode) with last-observation-carried-
    forward values — the standard feature-store/resampling operator
    the raw windows (q11-q13) don't cover.

    Scale shape: the grid generation is one row per (user, day-span) —
    output-proportional, no cross-user shuffle; the LOCF window sorts
    within the same user partitioning the join already established.
    Bounded here to user_id < 30 (≈900 grid rows at sf0.01)."""
    e = load_events(spark, sf_dir).filter(F.col("user_id") < 30)
    day = F.to_date("ts").alias("day")
    per_day = e.groupBy("user_id", day).agg(
        _trunc4(F.sum("value")).alias("day_value"),
        F.count(F.lit(1)).alias("n"),
    )
    spans = per_day.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = spans.select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    j = grid.join(per_day, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.col("day_value").isNull().alias("is_gap"),
        F.last("day_value", ignorenulls=True).over(w).alias("locf_value"),
    )


def q47_scd2_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) assembly from a change
    stream: each user's events become versioned validity intervals
    [valid_from, valid_to) via lead() over event time, open-ended
    current row flagged — the standard warehouse dimension-history
    build (and the batch twin of CDC merge compaction, q93).

    One shuffle on the dimension key; interval construction is
    streaming window evaluation within each sorted partition.
    Bounded to user_id < 20 for output size.

    The version order tiebreaks on event_id: ordering by ts alone is
    total only while (user_id, ts) happens to be unique — true in the
    fixtures, NOT at scale, where same-microsecond events are routine
    and an untiebroken row_number is free to permute between runs,
    partitionings, and engines (the determinism class SCALING.md
    pins). Fixture outputs are unchanged (no ties there)."""
    e = load_events(spark, sf_dir).filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        _trunc4(F.col("value")).alias("value"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )


def q77_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality report — the validation pass a training-data
    pipeline runs before ingest: per-table row counts, key-uniqueness
    violations, referential orphans (anti-join counts), and
    value-range violations, as one tall (table, metric, value) frame.

    Scale shape: each per-table block is ONE single-pass aggregation
    with conditional sums (no one-scan-per-check); the FK orphan
    checks are anti joins on the key — at 100 TB the orders side
    builds the hash/broadcast side exactly like any fact⋈dim join.
    All outputs are exact integers (oracle hash-matches trivially)."""
    li = table(spark, sf_dir, "lineitem")
    od = table(spark, sf_dir, "orders")
    cu = table(spark, sf_dir, "customer")

    def row(tbl: str, metric: str, value):
        return F.struct(F.lit(tbl).alias("tbl"), F.lit(metric).alias("metric"),
                        value.cast("bigint").alias("value"))

    def tall(agged: DataFrame) -> DataFrame:
        return agged.select(F.explode("rs").alias("r"))

    li_agg = tall(li.agg(F.array(
        row("lineitem", "n_rows", F.count(F.lit(1))),
        row("lineitem", "null_orderkey", F.sum(F.col("l_orderkey").isNull().cast("int"))),
        row("lineitem", "bad_quantity", F.sum((F.col("l_quantity") <= 0).cast("int"))),
        row("lineitem", "bad_discount",
            F.sum(((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).cast("int"))),
        row("lineitem", "bad_tax",
            F.sum(((F.col("l_tax") < 0) | (F.col("l_tax") > 1)).cast("int"))),
    ).alias("rs")))
    od_agg = tall(od.agg(F.array(
        row("orders", "n_rows", F.count(F.lit(1))),
        row("orders", "dup_orderkey", F.count(F.lit(1)) - F.countDistinct("o_orderkey")),
        row("orders", "bad_totalprice", F.sum((F.col("o_totalprice") <= 0).cast("int"))),
    ).alias("rs")))
    cu_agg = tall(cu.agg(F.array(
        row("customer", "n_rows", F.count(F.lit(1))),
        row("customer", "dup_custkey", F.count(F.lit(1)) - F.countDistinct("c_custkey")),
    ).alias("rs")))
    orphan_li = tall(
        li.join(od, li.l_orderkey == od.o_orderkey, "left_anti")
        .agg(F.array(row("lineitem", "orphan_orderkey", F.count(F.lit(1)))).alias("rs"))
    )
    orphan_od = tall(
        od.join(cu, od.o_custkey == cu.c_custkey, "left_anti")
        .agg(F.array(row("orders", "orphan_custkey", F.count(F.lit(1)))).alias("rs"))
    )
    out = li_agg.unionByName(od_agg).unionByName(cu_agg).unionByName(orphan_li).unionByName(orphan_od)
    return out.select("r.tbl", "r.metric", "r.value").orderBy("tbl", "metric")


QUERIES.update(
    {
        "q46_gap_fill": q46_gap_fill,
        "q47_scd2_assembly": q47_scd2_assembly,
        "q77_dq_report": q77_dq_report,
        "q86_explode_lateral": q86_explode_lateral,
        "q87_null_semantics": q87_null_semantics,
        "q88_value_window_funcs": q88_value_window_funcs,
        "q89_fuzzy_match": q89_fuzzy_match,
        "q90_histogram": q90_histogram,
        "q91_filtered_agg": q91_filtered_agg,
        "q92_sessionization": q92_sessionization,
        "q93_keep_latest": q93_keep_latest,
        "q95_variant_shred": q95_variant_shred,
        "q96_hll_sketch_union": q96_hll_sketch_union,
        "q98_embedding_quantize": q98_embedding_quantize,
        "q99_deterministic_split": q99_deterministic_split,
    }
)

ORACLE.update(
    {
        "q46_gap_fill": """
            WITH per_day AS (
                SELECT user_id, ts::date AS day,
                       floor(sum(value) * 1e4) / 1e4 AS day_value, count(*) AS n
                FROM events WHERE user_id < 30 GROUP BY 1, 2),
            spans AS (
                SELECT user_id, min(day) AS d0, max(day) AS d1
                FROM per_day GROUP BY 1),
            grid AS (
                SELECT user_id,
                       unnest(generate_series(d0, d1, INTERVAL 1 DAY))::date AS day
                FROM spans),
            j AS (
                SELECT g.user_id, g.day, p.day_value, coalesce(p.n, 0) AS n_events
                FROM grid g LEFT JOIN per_day p USING (user_id, day))
            SELECT user_id, day, n_events::bigint AS n_events,
                   (day_value IS NULL) AS is_gap,
                   last_value(day_value IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS locf_value
            FROM j
        """,
        "q47_scd2_assembly": """
            SELECT user_id,
                   row_number() OVER w AS version,
                   ts::timestamp AS valid_from,
                   lead(ts) OVER w::timestamp AS valid_to,
                   floor(value * 1e4) / 1e4 AS value,
                   (lead(ts) OVER w IS NULL) AS is_current
            FROM events WHERE user_id < 20
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "q77_dq_report": """
            WITH m AS (
                SELECT 'lineitem' AS tbl, 'n_rows' AS metric, count(*)::bigint AS value FROM lineitem
                UNION ALL SELECT 'lineitem', 'null_orderkey',
                    coalesce(sum((l_orderkey IS NULL)::int), 0)::bigint FROM lineitem
                UNION ALL SELECT 'lineitem', 'bad_quantity',
                    coalesce(sum((l_quantity <= 0)::int), 0)::bigint FROM lineitem
                UNION ALL SELECT 'lineitem', 'bad_discount',
                    coalesce(sum((l_discount < 0 OR l_discount > 1)::int), 0)::bigint FROM lineitem
                UNION ALL SELECT 'lineitem', 'bad_tax',
                    coalesce(sum((l_tax < 0 OR l_tax > 1)::int), 0)::bigint FROM lineitem
                UNION ALL SELECT 'orders', 'n_rows', count(*)::bigint FROM orders
                UNION ALL SELECT 'orders', 'dup_orderkey',
                    (count(*) - count(DISTINCT o_orderkey))::bigint FROM orders
                UNION ALL SELECT 'orders', 'bad_totalprice',
                    coalesce(sum((o_totalprice <= 0)::int), 0)::bigint FROM orders
                UNION ALL SELECT 'customer', 'n_rows', count(*)::bigint FROM customer
                UNION ALL SELECT 'customer', 'dup_custkey',
                    (count(*) - count(DISTINCT c_custkey))::bigint FROM customer
                UNION ALL SELECT 'lineitem', 'orphan_orderkey', count(*)::bigint
                    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
                UNION ALL SELECT 'orders', 'orphan_custkey', count(*)::bigint
                    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
            )
            SELECT tbl, metric, value FROM m ORDER BY tbl, metric
        """,
        "q86_explode_lateral": """
            WITH tok AS (
                SELECT p_partkey, unnest(string_split(p_name, ' ')) AS token,
                       generate_subscripts(string_split(p_name, ' '), 1) - 1 AS pos
                FROM part WHERE p_partkey <= 2000
            )
            SELECT token, count(*) AS n, round(avg(pos), 6) AS avg_pos
            FROM tok GROUP BY token
        """,
        "q87_null_semantics": """
            WITH per_cust AS (
                SELECT o_custkey, sum(o_totalprice) AS spend, count(*) AS n_orders
                FROM orders GROUP BY o_custkey
            )
            SELECT c_custkey,
                   round(coalesce(spend, 0.0), 2) AS spend0,
                   nullif(n_orders, 1) AS orders_unless_one,
                   (spend IS NOT DISTINCT FROM NULL) AS never_ordered,
                   CASE WHEN spend IS NULL THEN 'none'
                        WHEN spend > 200000 THEN 'big'
                        ELSE 'small' END AS spend_band
            FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
            WHERE c_custkey <= 1000
        """,
        "q88_value_window_funcs": """
            SELECT o_custkey, o_orderkey,
                   first_value(o_totalprice) OVER w AS first_price,
                   last_value(o_totalprice) OVER w AS last_price,
                   nth_value(o_totalprice, 2) OVER w AS second_price
            FROM orders
            WHERE o_custkey <= 500
            WINDOW w AS (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
            )
        """,
        "q89_fuzzy_match": """
            SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
                   levenshtein(a.p_name, b.p_name) AS edit_dist
            FROM part a JOIN part b
              ON a.p_brand = b.p_brand
             AND floor(length(a.p_name) / 16) = floor(length(b.p_name) / 16)
             AND a.p_partkey < b.p_partkey
            WHERE a.p_partkey <= 400 AND b.p_partkey <= 400
              AND levenshtein(a.p_name, b.p_name) <= 25
        """,
        "q90_histogram": """
            -- DuckDB has no width_bucket; same arithmetic spelled out
            -- (bucket width 600000/12 = 50000 exactly, so FP-identical)
            SELECT CASE WHEN o_totalprice < 0 THEN 0
                        WHEN o_totalprice >= 600000 THEN 13
                        ELSE CAST(floor(o_totalprice / 50000.0) AS BIGINT) + 1
                   END AS bucket,
                   count(*) AS n
            FROM orders GROUP BY 1
        """,
        "q91_filtered_agg": """
            SELECT l_returnflag,
                   count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
                   round(sum(l_extendedprice) FILTER (WHERE l_tax > 0.04), 2) AS taxed_revenue,
                   bool_and(l_quantity > 0) AS all_positive_qty,
                   bool_or(l_quantity > 49) AS any_max_qty
            FROM lineitem GROUP BY l_returnflag
        """,
        "q92_sessionization": """
            WITH ev AS (
                SELECT user_id, event_id, ts::timestamp AS ts, value FROM events
            ), marked AS (
                SELECT user_id, event_id, ts, value,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS is_start
                FROM ev
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
                SELECT user_id, ts, value,
                       CAST(sum(is_start) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS BIGINT) AS session_no
                FROM marked
            )
            SELECT user_id, session_no, count(*) AS n_events,
                   min(ts) AS session_start, max(ts) AS session_end,
                   round(sum(value), 4) AS session_value
            FROM sess GROUP BY user_id, session_no
        """,
        "q99_deterministic_split": """
            WITH a AS (
                SELECT CASE WHEN h < 80 THEN 'train'
                            WHEN h < 90 THEN 'val' ELSE 'test' END AS split,
                       label
                FROM (SELECT (('0x' || substr(md5('split:' || vec_id), 1, 15))::bigint) % 100 AS h,
                             label
                      FROM embeddings) t)
            SELECT split, label, count(*) AS n
            FROM a GROUP BY split, label ORDER BY split, label
        """,
        "q98_embedding_quantize": """
            WITH d AS (
                -- all-zero vector: scale 1 (quantizes to zeros, error 0);
                -- NaN/Inf vector: NULL outputs (CASE keeps the throwing
                -- NaN->bigint cast out of the taken branch)
                SELECT vec_id, embedding::double[] AS v,
                       list_aggregate(list_transform(embedding,
                           x -> isfinite(x::double)), 'bool_and') AS fin,
                       coalesce(nullif(
                           list_aggregate(list_transform(embedding, x -> abs(x::double)), 'max')
                           / 127.0, 0.0), 1.0) AS s
                FROM embeddings)
            SELECT vec_id,
                   CASE WHEN fin THEN array_to_string(list_transform(v,
                       x -> greatest(-127.0, least(127.0, floor(x / s + 0.5)))::int), '|')
                   END AS quantized,
                   CASE WHEN fin THEN floor(list_aggregate(list_transform(v,
                       x -> abs(greatest(-127.0, least(127.0, floor(x / s + 0.5))) * s - x)),
                       'max') * 1e6)::bigint
                   END AS max_err_1e6
            FROM d
        """,
        "q95_variant_shred": """
            -- lossless round-trip oracle: the variant extraction must
            -- reproduce the source fields exactly
            SELECT o_orderkey AS o_id, o_custkey AS cust,
                   o_orderpriority AS prio,
                   round(o_totalprice, 2) AS amount,
                   TRUE AS missing_is_null
            FROM orders WHERE o_orderkey < 1000
        """,
        "q93_keep_latest": """
            WITH k AS (
                -- +2^63 bias mirrors the Spark side: bytewise order of
                -- zero-padded decimals is numeric only for non-negatives
                SELECT *,
                       lpad((epoch_us(ts::timestamp)::HUGEINT
                             + 9223372036854775808::HUGEINT)::varchar, 20, '0')
                         || lpad((event_id::HUGEINT
                             + 9223372036854775808::HUGEINT)::varchar, 20, '0') AS okey
                FROM events)
            SELECT user_id,
                   max_by(event_id, okey) AS latest_event_id,
                   max_by(event_type, okey) AS latest_event_type,
                   round(max_by(value, okey), 4) AS latest_value,
                   min_by(event_id, okey) AS first_event_id,
                   max(ts::timestamp) AS latest_ts
            FROM k GROUP BY user_id
        """,
    }
)


# ---------------------------------------------- event-journey analytics

FUNNEL_STAGES = ("view", "click", "purchase")


def q100_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view → click → purchase): how many
    users completed each stage IN ORDER — the canonical product-
    analytics query every event store ships.

    Plan shape for 100 TB: NO per-user event arrays (collect_list of a
    user's history is the memory cliff) — stage k is a conditional
    min-timestamp aggregation joined user-to-user against stage k-1,
    so each step is one filtered scan + one users-sized shuffle; the
    event stream itself is never shuffled unfiltered. Conversion is
    reported per stage with rate vs the stage-1 population; conv_ppm
    is NULL when that population is EMPTY (no stage-1 events in the
    window — routine for a sliced/filtered event feed), where the bare
    division crashed the whole query under ANSI mode (found by the
    events fuzzer, tests/test_fuzz_oracle.py)."""
    e = load_events(spark, sf_dir)

    stage = (
        e.filter(F.col("event_type") == FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    reached = [stage]
    for i, ev in enumerate(FUNNEL_STAGES[1:], start=1):
        prev = reached[-1]
        t_prev = prev.columns[-1]
        nxt = (
            e.filter(F.col("event_type") == ev)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(t_prev))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t{i}"))
        )
        reached.append(nxt)

    counts = [df.agg(F.count(F.lit(1)).alias("n")) for df in reached]
    rows = None
    for name, cnt in zip(FUNNEL_STAGES, counts):
        r = cnt.select(F.lit(name).alias("stage"), F.col("n").cast("bigint").alias("n_users"))
        rows = r if rows is None else rows.unionByName(r)
    base = counts[0].select(F.col("n").alias("base"))
    return (
        rows.join(F.broadcast(base))
        .select(
            "stage",
            "n_users",
            F.floor(F.col("n_users") / F.nullif(F.col("base"), F.lit(0)) * 1e6)
            .cast("bigint")
            .alias("conv_ppm"),
        )
        .orderBy(F.desc("n_users"), "stage")
    )


def q101_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their
    first event; for each cohort × week-offset k, how many came back.
    The other canonical event-analytics query (the retention triangle).

    Plan: first-seen week per user (one agg), distinct (user, week)
    activity (one agg), one user-keyed join, then a cohort-grain agg —
    every shuffle is users- or (users × active-weeks)-sized, never
    event-sized past the first pass."""
    e = load_events(spark, sf_dir)
    weeks = e.select("user_id", F.date_trunc("week", F.col("ts")).alias("wk"))
    first = weeks.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = weeks.distinct()
    return (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7).cast("bigint").alias("k"),
        )
        .groupBy("cohort_week", "k")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "k")
    )


QUERIES.update(
    {
        "q100_funnel": q100_funnel,
        "q101_retention_cohorts": q101_retention_cohorts,
    }
)

ORACLE.update(
    {
        "q100_funnel": """
            WITH s0 AS (
                SELECT user_id, min(ts::timestamp) AS t0 FROM events
                WHERE event_type = 'view' GROUP BY user_id),
            s1 AS (
                SELECT e.user_id, min(ts::timestamp) AS t1 FROM events e
                JOIN s0 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts::timestamp > s0.t0
                GROUP BY e.user_id),
            s2 AS (
                SELECT e.user_id, min(ts::timestamp) AS t2 FROM events e
                JOIN s1 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts::timestamp > s1.t1
                GROUP BY e.user_id),
            counts AS (
                SELECT 'view' AS stage, (SELECT count(*) FROM s0) AS n_users
                UNION ALL SELECT 'click', (SELECT count(*) FROM s1)
                UNION ALL SELECT 'purchase', (SELECT count(*) FROM s2))
            SELECT stage, n_users::bigint AS n_users,
                   floor(n_users::double
                         / nullif((SELECT count(*) FROM s0), 0) * 1e6)::bigint
                       AS conv_ppm
            FROM counts ORDER BY n_users DESC, stage
        """,
        "q101_retention_cohorts": """
            WITH weeks AS (
                SELECT user_id, date_trunc('week', ts::timestamp) AS wk FROM events),
            first AS (
                SELECT user_id, min(wk) AS cohort_week FROM weeks GROUP BY user_id),
            active AS (SELECT DISTINCT user_id, wk FROM weeks)
            SELECT cohort_week::timestamp AS cohort_week,
                   (date_diff('day', cohort_week, wk) // 7)::bigint AS k,
                   count(DISTINCT user_id)::bigint AS n_users
            FROM active JOIN first USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
    }
)


BAND_W = 1.0          # price-similarity band
BAND_JOIN_BUCKET = 10  # JOIN bucket width: must be >= BAND_W (so ±1 bucket
                       # covers the band) and should be CLOSE to it — the
                       # equi-join emits occupancy(bucket) rows per probe
                       # before the residual filter, so a bucket 1000x the
                       # band pre-filters 100x more pairs than one 10x it
                       # (measured at sf0.1: 4.7 s at width 1000 vs 1.1 s
                       # at width 10, identical output)
BAND_BUCKET = 1000     # REPORTING grain only (rows per output bucket)


def q81b_band_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Big⋈big interval join via bucketization — the scale path a
    broadcast band probe (q81) can't take when BOTH sides are fact-
    sized: find order pairs with |totalprice₁ − totalprice₂| ≤ BAND_W
    (near-duplicate detection by amount, the numeric cousin of text
    near-dup).

    A naive theta join is O(n·m); here each row probes the buckets
    {b−1, b, b+1} of ``floor(price / BAND_BUCKET)`` (a 3× fan-out on
    one side), the join is a hash EQUI-join on the probed bucket, and
    the band plus key-order predicates run as residual filters. Every
    qualifying pair matches on exactly ONE probe (the right side keeps
    its own bucket; probe values are distinct), so no distinct-dedup
    pass is needed. Output: pairs per bucket of the lower price —
    partition-order independent."""
    o = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("p"),
        F.floor(F.col("o_totalprice") / BAND_JOIN_BUCKET).alias("bk"),
    )
    probes = o.select(
        F.col("k").alias("k1"),
        F.col("p").alias("p1"),
        F.explode(
            F.array(F.col("bk") - 1, F.col("bk"), F.col("bk") + 1)
        ).alias("probe"),
    )
    pairs = (
        probes.join(o, probes.probe == o.bk)
        .filter((F.col("k1") < F.col("k")) & (F.abs(F.col("p1") - F.col("p")) <= BAND_W))
        .select(
            F.floor(F.least("p1", "p") / BAND_BUCKET).cast("bigint").alias("bucket"),
            "k1",
        )
    )
    return (
        pairs.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("bucket")
    )


QUERIES.update({"q81b_band_self_join": q81b_band_self_join})

ORACLE.update(
    {
        "q81b_band_self_join": """
            SELECT floor(least(a.o_totalprice, b.o_totalprice) / 1000)::bigint
                       AS bucket,
                   count(*)::bigint AS n_pairs
            FROM orders a JOIN orders b
              ON a.o_orderkey < b.o_orderkey
             AND abs(a.o_totalprice - b.o_totalprice) <= 1.0
            GROUP BY 1 ORDER BY 1
        """,
    }
)


# ------------------------------------------- sketch error surface (r5)

# per-op relative-error bounds asserted by the report (and by
# tests/test_contract.py): approx_count_distinct is configured at
# rsd=0.02 (3σ ≈ 6%); hll_sketch_agg defaults to lgConfigK=12
# (σ ≈ 1.04/√4096 ≈ 1.6%, bound 5%); percentile_approx at
# accuracy=1000 has ≤0.1% RANK error — the VALUE bound 1% mirrors the
# q83b twin test's measured margin on this data.
SKETCH_BOUNDS = {
    "approx_count_distinct": 0.06,
    "hll_union": 0.05,
    "percentile_approx": 0.01,
}


def sketch_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured error of every approximate/sketch operator against its
    exact twin, as one small (op, item, exact, approx, rel_err, bound,
    within_bound) frame — the ann_recall_report pattern applied to the
    sketch surface (r4 verdict item 5): q30's HLL++ distinct counts,
    q96's mergeable HLL union (including the merged ALL row), and
    q83b's KLL-style approximate percentiles each get a driver-visible
    error row, so a sketch regression (changed default lgK, a broken
    union, an accuracy knob typo) shows up as within_bound=false in
    the driver record, not only in a local test run.

    Everything is computed in-plan (the exact twins are the same
    one-pass aggregations the exact queries run; the joins are
    group-count-sized). Rows-only by nature: the sketch estimates
    aren't reproducible in DuckDB — which is exactly why the report
    exists.

    The approx legs CALL the contract queries (q30_approx_distinct /
    q96_hll_sketch_union) rather than re-spelling their aggregations:
    the report is those rows-only entries' machinery-carrier in the
    driver rotation — a composite-style claim that is only honest if a
    green report row genuinely executed the member plans (the rows-only
    analogue of rotation.py's embedded member oracles). Plan cost is
    unchanged: q30 is the same one-row HLL++ agg, q96 shares one
    sketches frame between its per-type and union legs exactly as the
    inlined form did. The exact twins stay in-plan here (q18's
    countDistinct, one events rollup); the percentile leg keeps its
    single grouped agg — one lineitem scan instead of q83 ⟕ q83b's two
    (q83's coverage is rot_agg_sketch_shapes', not this report's)."""
    li = table(spark, sf_dir, "lineitem")
    e = load_events(spark, sf_dir)

    # approx (q30's plan, via the query itself) and the exact twin in
    # SEPARATE one-row aggs, cross-joined: mixing countDistinct with a
    # non-distinct agg in one agg forces the Expand-based
    # multi-distinct plan where the HLL buffers are updated per
    # expanded copy (measured 7.7 s vs 1.5 s + 1.8 s for the split
    # form at sf0.1 — two narrow scans are 2.3× cheaper than one
    # expanded scan)
    acd = (
        q30_approx_distinct(spark, sf_dir)
        .crossJoin(
            li.agg(
                F.countDistinct("l_orderkey").alias("e_orders"),
                F.countDistinct("l_partkey").alias("e_parts"),
            )
        )
        .select(
            F.expr(
                "stack(2,"
                " 'approx_count_distinct', 'l_orderkey', double(approx_orders), double(e_orders),"
                " 'approx_count_distinct', 'l_partkey',  double(approx_parts),  double(e_parts))"
                " AS (op, item, approx, exact)"
            )
        )
    )

    # a genuinely-NULL event_type becomes the '(null)' item: an inner
    # equi-join never matches NULL = NULL, so without the coalesce that
    # group's sketch-vs-exact row would silently VANISH from the report
    # — the exact failure mode this report exists to prevent (q96
    # itself reports the raw NULL group; the coalesce is this report's
    # join-key concern)
    hll_approx = q96_hll_sketch_union(spark, sf_dir).select(
        F.coalesce(F.col("event_type"), F.lit("(null)")).alias("event_type"),
        F.col("approx_users").cast("double").alias("approx"),
    )
    # per-type and ALL exact counts in one rollup pass (one events
    # scan instead of two; grouping() labels the grand-total row so a
    # genuinely-NULL event_type could never be mistaken for it)
    exact_by_type = e.rollup("event_type").agg(
        F.countDistinct("user_id").cast("double").alias("exact"),
        F.grouping("event_type").alias("g"),
    ).select(
        F.when(F.col("g") == 1, F.lit("ALL"))
        .otherwise(F.coalesce(F.col("event_type"), F.lit("(null)")))
        .alias("event_type"),
        "exact",
    )
    hll = (
        hll_approx
        .join(exact_by_type, "event_type")
        .select(
            F.lit("hll_union").alias("op"),
            F.col("event_type").alias("item"),
            "approx",
            "exact",
        )
    )

    # exact + approx percentiles in ONE grouped agg (one lineitem scan
    # instead of q83 ⟕ q83b's two — the values are identical to the
    # contract queries': same expressions, same round-4)
    pct = (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").alias("eqs"),
            F.expr("percentile(l_quantity, 0.95D)").alias("ep95"),
            F.expr(
                "percentile_approx(l_extendedprice, array(0.25D, 0.5D, 0.75D), 1000)"
            ).alias("aqs"),
            F.expr("percentile_approx(l_quantity, 0.95D, 1000)").alias("ap95"),
        )
        .select(
            F.expr(
                "stack(4,"
                " 'p25_price',    round(aqs[0], 4), round(eqs[0], 4),"
                " 'median_price', round(aqs[1], 4), round(eqs[1], 4),"
                " 'p75_price',    round(aqs[2], 4), round(eqs[2], 4),"
                " 'p95_qty',      round(ap95, 4),   round(ep95, 4))"
                " AS (metric, approx, exact)"
            ),
            "l_returnflag",
        )
        .select(
            F.lit("percentile_approx").alias("op"),
            F.concat_ws("/", "l_returnflag", "metric").alias("item"),
            "approx",
            "exact",
        )
    )

    bound = (
        F.when(F.col("op") == "approx_count_distinct", F.lit(SKETCH_BOUNDS["approx_count_distinct"]))
        .when(F.col("op") == "hll_union", F.lit(SKETCH_BOUNDS["hll_union"]))
        .otherwise(F.lit(SKETCH_BOUNDS["percentile_approx"]))
    )
    # exact == 0 must still yield a NON-NULL verdict (a NULL
    # within_bound would slip past a `WHERE within_bound = false`
    # driver check): both-zero is a perfect sketch (rel_err 0),
    # approx≠0 over a zero truth is an unbounded miss (Infinity,
    # within_bound false)
    rel_err = (
        F.when(F.col("exact") != 0, F.round(F.abs(F.col("approx") - F.col("exact")) / F.col("exact"), 6))
        .when(F.col("approx") == 0, F.lit(0.0))
        .otherwise(F.lit(float("inf")))
    )
    return (
        acd.unionByName(hll)
        .unionByName(pct)
        .withColumn("rel_err", rel_err)
        .withColumn("bound", bound)
        .withColumn("within_bound", F.col("rel_err") <= F.col("bound"))
        .select("op", "item", "exact", "approx", "rel_err", "bound", "within_bound")
        .orderBy("op", "item")
    )


QUERIES.update({"sketch_error_report": sketch_error_report})


# ------------------------------------------------ snapshot diff (r5)

# fixture snapshot simulation (deterministic mods so the oracle
# reproduces the split): snapshot A lacks doc_id % 7 == 0, snapshot B
# lacks doc_id % 5 == 0, and B carries an edit on doc_id % 11 == 0.
SNAP_ABSENT_A_MOD = 7
SNAP_ABSENT_B_MOD = 5
SNAP_EDIT_B_MOD = 11


def q107_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff — the audit step between two crawls /
    dataset releases: classify every doc_id as added / removed /
    changed between snapshot A and snapshot B by content hash, and
    emit only the non-identical rows (the diff, not the corpus).

    Scale shape: each snapshot is projected to (doc_id, 16-byte md5)
    BEFORE the join, so the full-outer join shuffles 24-byte rows on
    an int64 key — the text never moves; at 100 TB both sides are
    one narrow scan + one hash-partitioned exchange, and with both
    snapshots stored bucketed by doc_id (the layout q102's
    fingerprint store already argues for) the exchange disappears
    entirely. The unchanged majority (the common case: daily diffs
    touch a sliver) is filtered before any ordering. Fixture
    snapshots derive from `documents` by deterministic mods (header
    note) so the DuckDB oracle replays the exact split."""
    d = table(spark, sf_dir, "documents")
    snap_a = d.filter(F.col("doc_id") % SNAP_ABSENT_A_MOD != 0).select(
        "doc_id", F.md5(F.col("text")).alias("h_a")
    )
    b_text = F.when(
        F.col("doc_id") % SNAP_EDIT_B_MOD == 0, F.concat(F.col("text"), F.lit(" rev2"))
    ).otherwise(F.col("text"))
    snap_b = d.filter(F.col("doc_id") % SNAP_ABSENT_B_MOD != 0).select(
        "doc_id", F.md5(b_text).alias("h_b")
    )
    status = (
        F.when(F.col("h_a").isNull(), F.lit("added"))
        .when(F.col("h_b").isNull(), F.lit("removed"))
        .when(F.col("h_a") != F.col("h_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        snap_a.join(snap_b, "doc_id", "full_outer")
        .withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select("doc_id", "status")
    )


QUERIES.update({"q107_snapshot_diff": q107_snapshot_diff})

ORACLE.update(
    {
        "q107_snapshot_diff": f"""
            WITH a AS (
                SELECT doc_id, md5(text) AS h_a FROM documents
                WHERE doc_id % {SNAP_ABSENT_A_MOD} <> 0),
            b AS (
                SELECT doc_id,
                       md5(CASE WHEN doc_id % {SNAP_EDIT_B_MOD} = 0
                                THEN text || ' rev2' ELSE text END) AS h_b
                FROM documents
                WHERE doc_id % {SNAP_ABSENT_B_MOD} <> 0)
            SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.h_a IS NULL THEN 'added'
                        WHEN b.h_b IS NULL THEN 'removed'
                        WHEN a.h_a <> b.h_b THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
            WHERE (CASE WHEN a.h_a IS NULL THEN 'added'
                        WHEN b.h_b IS NULL THEN 'removed'
                        WHEN a.h_a <> b.h_b THEN 'changed'
                        ELSE 'unchanged' END) <> 'unchanged'
        """,
    }
)


# ------------------------------------------ CDC merge / upsert (r5)

CDC_BASE_ABSENT_MOD = 13  # customers missing from the base snapshot
CDC_DELETE_MOD = 10       # change op: delete on every 10th orderkey


def q112_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO / upsert-apply — the lakehouse compaction primitive
    (Delta/Iceberg MERGE, Hudi upsert): apply a CDC changelog to a
    base snapshot. The LATEST change per key wins (q93's max_by
    compaction applied to the changelog); op semantics are the
    standard three-way MERGE: matched + D deletes, matched + U
    updates, unmatched + U inserts, unmatched + D is a no-op.
    Fixture derivation (deterministic, oracle-replayable): base =
    customers with custkey % CDC_BASE_ABSENT_MOD != 0; changelog =
    orders keyed on o_custkey with o_orderkey as the sequence number,
    op = D on every CDC_DELETE_MOD-th orderkey else U carrying
    o_totalprice as the new balance (values copied bit-exact — no
    float arithmetic anywhere, so the driver hash compare is safe).

    Output: the merged snapshot plus an `action` audit column
    (kept / updated / inserted; deleted rows are gone by definition).

    Scale shape: the changelog compacts FIRST — one changelog-sized
    hash agg (max_by is algebraic: map-side partial combine) — so the
    full-outer join's right side is one row per TOUCHED key, typically
    a sliver of the base; the base shuffles once on the merge key, and
    with the base stored bucketed by key (the layout every lakehouse
    table format maintains for exactly this op) that exchange
    disappears and the merge is a co-located join. Nothing in the
    plan is proportional to base × changelog."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    base = cust.filter(F.col("c_custkey") % CDC_BASE_ABSENT_MOD != 0).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    changes = orders.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("seq"),
        F.when(F.col("o_orderkey") % CDC_DELETE_MOD == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("o_totalprice").alias("new_bal"),
    )
    latest = changes.groupBy("custkey").agg(
        F.max_by(F.struct(F.col("op"), F.col("new_bal")), F.col("seq")).alias("c")
    )
    action = (
        F.when(F.col("c").isNull(), F.lit("kept"))
        .when(F.col("c.op") == "D", F.lit("deleted"))
        .when(F.col("name").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
    )
    return (
        base.join(latest, "custkey", "full_outer")
        .withColumn("action", action)
        .filter(F.col("action") != "deleted")
        .select(
            "custkey",
            F.coalesce(
                F.col("name"), F.concat(F.lit("cdc-"), F.col("custkey").cast("string"))
            ).alias("name"),
            F.when(F.col("action") == "kept", F.col("acctbal"))
            .otherwise(F.col("c.new_bal"))
            .alias("acctbal"),
            "action",
        )
    )


QUERIES.update({"q112_cdc_merge": q112_cdc_merge})

ORACLE.update(
    {
        "q112_cdc_merge": f"""
            WITH base AS (
                SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal
                FROM customer WHERE c_custkey % {CDC_BASE_ABSENT_MOD} <> 0),
            latest AS (
                SELECT o_custkey AS custkey,
                       max_by(CASE WHEN o_orderkey % {CDC_DELETE_MOD} = 0
                                   THEN 'D' ELSE 'U' END, o_orderkey) AS op,
                       max_by(o_totalprice, o_orderkey) AS new_bal
                FROM orders GROUP BY o_custkey),
            j AS (
                SELECT coalesce(b.custkey, l.custkey) AS custkey,
                       b.name, b.acctbal, l.op, l.new_bal,
                       CASE WHEN l.op IS NULL THEN 'kept'
                            WHEN l.op = 'D' THEN 'deleted'
                            WHEN b.name IS NULL THEN 'inserted'
                            ELSE 'updated' END AS action
                FROM base b FULL OUTER JOIN latest l ON b.custkey = l.custkey)
            SELECT custkey,
                   coalesce(name, 'cdc-' || custkey) AS name,
                   CASE WHEN action = 'kept' THEN acctbal ELSE new_bal END AS acctbal,
                   action
            FROM j WHERE action <> 'deleted'
        """,
    }
)


# ------------------------------------- crawl-graph authority (r5)

PR_ITERS = 10
PR_DAMPING = 0.85
PR_OUT_DEGREE = 3  # synthetic fixture graph: every page has 3 out-links
PR_TOP = 20
PR_ID_RANGES = 32  # range partitions for the dense-id assignment
# node frames at/below this row count provably fit the broadcast cap
# (~16 B/row → ≤160 MB; Spark's hard relation cap is 8 GB / 512M
# rows): below it the power-iteration joins broadcast the node-sized
# side, above it they keep the shuffle form (web-scale node frames
# do not broadcast)
PR_BROADCAST_MAX_NODES = 10_000_000


def pagerank(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
             iters: int = PR_ITERS, damping: float = PR_DAMPING) -> DataFrame:
    """Distributed power-iteration PageRank over (src, dst) edges —
    pure DataFrame joins/aggs, the Spark-idiomatic form (no GraphX,
    no RDDs): per iteration, each node's rank splits evenly over its
    out-links (broadcast-joined out-degree), contributions hash-agg
    by dst, and the damping term re-adds (1-d)/N through a left join
    against the node frame so sink-only nodes keep mass.

    Scale shape: the edge table is the only big operand and it is
    NEVER mutated — the (src, dst, out_deg) frame is built ONCE
    (degree join hoisted out of the loop) and each iteration shuffles
    (edge-count) 16-byte (dst, contrib) rows into a node-sized agg;
    ranks (node-sized) are localCheckpoint-ed per round to truncate
    lineage exactly like connected_components' loop (engine/text.py).
    Dangling mass (nodes with no out-links) redistributes uniformly;
    it is Σrank over the no-out-link nodes — a broadcast 1-row
    aggregate over the PREVIOUS round's checkpointed node-sized ranks,
    computed INSIDE the round's plan, so each round is exactly ONE
    eager job and the loop makes NO driver round-trips (the r5 first
    cut collected the dangling mass per round — 10 extra sync
    barriers, ~30% of q108's wall; the second cut checkpointed the
    contribution agg per round just to derive it as 1 − Σemitted —
    2 jobs per round where 1 suffices, ~20%). Σrank = 1 is invariant
    every round (asserted in tests)."""
    n_row = nodes.count()
    # localCheckpointed frames carry no size statistics, so the
    # planner sort-merge-joins the node-sized ranks/contribs frames
    # every round (2 extra exchanges + sorts per iteration). Below
    # PR_BROADCAST_MAX_NODES the node frame provably fits the
    # broadcast cap (~16 B/row → ≤160 MB) and we hint what the
    # optimizer would choose with statistics: broadcast ranks into
    # the edge join (edges never shuffle) and contribs into the
    # damping join (nodes never shuffle) — one exchange per round
    # (the contribution agg). Above it the shuffle form stays: at
    # web scale node frames do not broadcast. Float effect: only the
    # FETCH order into the dst-sum changes, which the contract
    # already treats as noise (rows-only + 1e-9 numpy parity test).
    bc = F.broadcast if n_row <= PR_BROADCAST_MAX_NODES else (lambda df: df)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edges_deg = (
        edges.join(deg, "src")
        .select("src", "dst", "out_deg")
        .localCheckpoint(eager=True)
    )
    # node-sized, built once: the nodes with no out-links — their rank
    # is the dangling mass each round
    no_out = (
        nodes.join(deg, nodes["node"] == deg["src"], "left_anti")
        .select("node")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n_row).alias("rank")).localCheckpoint(
        eager=True
    )
    for _ in range(iters):
        contribs = (
            edges_deg.join(bc(ranks), edges_deg["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        dangling = (
            ranks.join(F.broadcast(no_out), "node")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dangling_mass"))
        )
        ranks = (
            nodes.join(bc(contribs), nodes["node"] == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_row)
                    + F.lit(damping / n_row) * F.col("dangling_mass")
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def q108_crawl_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-graph authority scores for the document corpus — the
    link-graph quality signal web-scale pretraining pipelines rank
    crawl frontiers with (Common Crawl publishes exactly this as its
    harmonic-centrality/PageRank rankings; quality-weighting docs by
    link authority is the OTHER quality axis next to q57's content
    heuristics and ml_quality_classifier's model). Fixture link graph
    is derived deterministically from the corpus itself (no link
    column exists): pages get dense ids by doc_id order and page u
    links to md5-hash-derived targets h(u, k) mod N for k < 3 —
    engine-portable, so the graph (not the float iteration) is
    SQL-reproducible. Returns the top-20 authorities.

    Rows-only: 10 rounds of float power iteration aren't
    SQL-expressible (each round's sums are order-sensitive at the
    ulp); invariants pinned in tests instead — Σrank = 1 after every
    round, and the fixture ranks match an independent numpy power
    iteration to 1e-9."""
    d = table(spark, sf_dir, "documents").select("doc_id")
    # dense 0..N-1 ids in doc_id order WITHOUT a single-partition
    # global window (the zipWithIndex pattern in DataFrame form):
    # range-repartition on doc_id — partition i holds strictly
    # smaller keys than partition i+1 — rank within each range in
    # parallel, then add per-range row-count offsets. The id each
    # row gets is its global doc_id rank regardless of where the
    # sampled range boundaries fall, so the output is boundary- and
    # partitioning-invariant. The eager checkpoint pins the sampled
    # boundaries so the counts subtree and the rank subtree see the
    # SAME pid assignment.
    ranged = (
        d.repartitionByRange(PR_ID_RANGES, "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    # per-range offsets stay IN-PLAN: a running sum over the per-pid
    # counts — that window is global but partition-COUNT-sized (32
    # rows), never data-sized, and no count ever visits the driver
    offw = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    off = (
        ranged.groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("pid", F.coalesce(F.sum("n").over(offw), F.lit(0)).alias("off"))
    )
    pw = Window.partitionBy("pid").orderBy("doc_id")
    nodes = (
        ranged.withColumn("rn", F.row_number().over(pw))
        .join(F.broadcast(off), "pid")
        .select("doc_id", (F.col("off") + F.col("rn") - 1).alias("node"))
        .localCheckpoint(eager=True)
    )
    n_row = nodes.count()
    ks = F.explode(F.array(*[F.lit(k) for k in range(PR_OUT_DEGREE)])).alias("k")
    h = (
        "cast(conv(substr(md5(concat('pr:', doc_id, ':', k)), 1, 15), 16, 10) as bigint)"
        f" % {n_row}"
    )
    edges = (
        nodes.select("doc_id", F.col("node").alias("src"))
        .select("doc_id", "src", ks)
        .withColumn("dst", F.expr(h))
        .filter(F.col("src") != F.col("dst"))  # drop self-links
        .select("src", "dst")
    )
    ranks = pagerank(spark, nodes.select("node"), edges)
    # cut the top-20 on the ROUNDED rank so the published tie rule
    # (rank-6 ties broken by node id) is the actual cut rule — cutting
    # on the unrounded float would let sub-1e-6 noise at the #20/#21
    # boundary pick a different node than an independent implementation
    top = (
        ranks.select("node", F.round("rank", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "node")
        .limit(PR_TOP)
        .join(nodes, "node")
        .select("doc_id", F.col("node"), "rank")
        .orderBy(F.col("rank").desc(), "node")
    )
    return top


QUERIES.update({"q108_crawl_pagerank": q108_crawl_pagerank})


# ---------------------------------- frequent-itemset mining (r5)

FPG_MIN_COUNT = 3   # absolute support floor (baskets containing the set)
FPG_TOP_PER_SIZE = 20


def ml_fpgrowth_baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset mining (MLlib FPGrowth) over order baskets —
    the co-occurrence-mining leg of the analytics surface (same
    algorithm family a corpus pipeline uses for frequent template /
    co-occurring-span detection; here in its classic market-basket
    form: parts that ship together). Output: the top
    FPG_TOP_PER_SIZE itemsets PER itemset size by (freq desc,
    itemset asc) — per-size ranking because singleton frequencies
    always dominate raw pair frequencies and would crowd every
    multi-item discovery out of a global top-k. Items sorted within
    each set so the output is canonical.

    minSupport derives from the basket count as an ABSOLUTE count
    floor (FPG_MIN_COUNT baskets): co-occurrence support is a count
    phenomenon — a fixed fraction shrinks emitted sets to singletons
    as N grows (measured here: max pair support 5 baskets at both
    sf0.001 and sf0.01).

    Scale shape: basket assembly is ONE hash agg (collect_set on the
    order key); FPGrowth is MLlib's parallel FP-growth (PFP, Li et
    al. 2008) — frequency census, then group-dependent conditional
    trees built per partition of the item-rank space, which is the
    published way this scales past single-node memory. The absolute
    floor admits most items as "frequent", which is honest about
    cost: conditional-tree work scales with the frequent-item census
    and per-basket set size (~4 here), not raw basket count.
    Rows-only (FP-tree construction isn't SQL-expressible); the
    emitted supports are exactly recounted against the basket table
    in tests/test_contract.py.

    r6 contract fix: ``items`` is emitted as the canonical
    comma-joined string (``concat_ws(',', array_sort(items))``) —
    the r5 driver canonicalizer crashed sorting an ``array<bigint>``
    column (pandas "unhashable type: 'list'", CORRECTNESS_r05), so
    the one schema the contract consumer cannot canonicalize is an
    array. Row content and order are unchanged ON THE FIXTURES
    (verified at sf0.001/0.01 before/after; the contract hash was
    regenerated from the new output, not assumed stable). In general
    the two keys are NOT order-identical: the old tiebreak compared
    ``'[1, 2]'``-style strings, the new one ``'1,2'`` — on a prefix
    tie (e.g. equal-freq ``{1}`` vs ``{12}``) ``']' > '2'`` ordered
    ``{12}`` first while the comma key orders ``{1}`` first, so
    freq-tied top-K membership at the cut could differ from r5."""
    from pyspark.ml.fpm import FPGrowth

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("items"))
    n_baskets = baskets.count()
    # MLlib applies the floor as ceil(minSupport * n_baskets); passing
    # exactly FPG_MIN_COUNT / n_baskets round-trips through float and
    # for ~5% of basket counts (e.g. n=187: (3/187)*187 =
    # 3.0000000000000004) ceils to FPG_MIN_COUNT + 1, silently
    # dropping itemsets AT the documented absolute floor.  Half a
    # basket below the floor ceils to exactly FPG_MIN_COUNT for every
    # n, with no float hazard anywhere near the 0.5 margin.
    model = FPGrowth(
        itemsCol="items",
        minSupport=(FPG_MIN_COUNT - 0.5) / n_baskets,
        minConfidence=0.1,
    ).fit(baskets)
    w = Window.partitionBy("set_size").orderBy(F.col("freq").desc(), "items")
    return (
        model.freqItemsets.select(
            F.concat_ws(",", F.array_sort("items").cast("array<string>")).alias("items"),
            F.size("items").alias("set_size"),
            "freq",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= FPG_TOP_PER_SIZE)
        .select("set_size", "items", "freq")
        .orderBy("set_size", F.col("freq").desc(), "items")
    )


QUERIES.update({"ml_fpgrowth_baskets": ml_fpgrowth_baskets})
