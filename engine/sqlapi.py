"""SQL-text entry point: the engine surface as ``spark.sql`` over
registered views.

Everything else in this package builds plans with the DataFrame API;
this module proves the SAME engine is drivable with ANSI SQL strings —
Catalyst parses/optimizes identically (both APIs meet at the logical
plan), so broadcast/pushdown/partial-agg behavior carries over.

Reference parity: the reference (a dask.array ML notebook) has no SQL
surface at all (SURVEY.md §2.6); this is engine-to-build surface
required by the driver contract.

Scale notes: identical posture to engine/relational.py — the views are
parquet scans, so filter pushdown and column pruning still reach the
files; AQE still replans joins at runtime. At 100 TB these views would
be catalog tables (saveAsTable, bucketed) rather than path views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import load_events, table

_TABLES = "region nation customer supplier part orders lineitem documents embeddings".split()


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for SQL access.

    Idempotent (replace semantics); ``events`` goes through
    ``load_events`` for the nanos-timestamp conversion.
    """
    for t in _TABLES:
        table(spark, sf_dir, t).createOrReplaceTempView(t)
    load_events(spark, sf_dir).createOrReplaceTempView("events")


def q84_sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped top-k revenue query, expressed as a SQL STRING
    (parser → same Catalyst plan as the DataFrame twin would build):
    customer ⋈ orders ⋈ lineitem, date-window filters on both fact
    sides (pushed to the scans), hash-agg, top-10."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1997-03-15'
          AND l_shipdate > DATE '1997-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
        """
    )


def q85_sql_cte_window_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-parser surface: CTE + window function + HAVING + scalar
    subquery in one statement — each customer's single largest order,
    kept only for nations whose customers' average balance beats the
    global average."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH top_order AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        SELECT c_nationkey,
               count(*) AS n_customers,
               round(avg(t.o_totalprice), 2) AS avg_top_order
        FROM customer c
        JOIN top_order t ON t.o_custkey = c.c_custkey AND t.rn = 1
        GROUP BY c_nationkey
        HAVING avg(c.c_acctbal) > (SELECT avg(c_acctbal) FROM customer)
        """
    )


# one SQL text, two engines: Spark 4 and DuckDB both run this
# recursive CTE verbatim. The recursion walks each customer's order
# history in date order (an acyclic chain, so UNION ALL terminates —
# Spark does not yet support UNION dedup recursion), accumulating
# spend hop by hop. Additions happen in the same sequential order in
# both engines, so the doubles are bit-identical.
_Q94_SEQ_SQL = """
    SELECT * FROM (
        SELECT o_custkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders WHERE o_custkey <= 200
    ) WHERE rn <= 12
"""

_Q94_REC_SQL = """
    WITH RECURSIVE chain AS (
        SELECT o_custkey, rn, o_totalprice AS cum_spend
        FROM {seq} WHERE rn = 1
        UNION ALL
        SELECT s.o_custkey, s.rn, c.cum_spend + s.o_totalprice
        FROM {seq} s JOIN chain c
          ON s.o_custkey = c.o_custkey AND s.rn = c.rn + 1
    )
    SELECT o_custkey, rn AS hop, round(cum_spend, 2) AS cum_spend
    FROM chain
"""


def q94_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): per-customer order-chain
    traversal with hop-by-hop spend accumulation, walk bounded to 12
    hops (each recursion step is a full join stage — cap the depth
    explicitly, the standard recursive-query discipline).

    The anchor (ordered per-customer sequence) is localCheckpointed
    before the recursion: Spark re-inlines a CTE anchor into EVERY
    iteration, so without materialization each of the 12 steps re-ran
    the scan + window (measured ~4.4 s → ~3.1 s steady-state at sf0.1;
    same lineage-truncation discipline as q80's iterative components).
    The checkpointed anchor is also coalesced to a few partitions: it
    is ≤ 2400 rows BY CONSTRUCTION (200 customers × 12 hops), and each
    of the 12 recursion stages schedules a task per partition, so 32
    near-empty partitions were pure scheduling overhead (measured
    ~2.0 s → ~1.65 s at sf0.1). A recursion over an unbounded anchor
    would keep the natural partitioning instead. The oracle runs the
    identical recursion over the identical anchor SQL."""
    register_views(spark, sf_dir)
    seq = spark.sql(_Q94_SEQ_SQL).coalesce(4)
    seq.localCheckpoint(eager=True).createOrReplaceTempView("q94_seq")
    return spark.sql(_Q94_REC_SQL.format(seq="q94_seq"))


QUERIES = {
    "q84_sql_shipping_priority": q84_sql_shipping_priority,
    "q85_sql_cte_window_having": q85_sql_cte_window_having,
    "q94_recursive_cte": q94_recursive_cte,
}

ORACLE = {
    "q84_sql_shipping_priority": """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               o_orderdate, o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < DATE '1997-03-15'
          AND l_shipdate > DATE '1997-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "q85_sql_cte_window_having": """
        WITH top_order AS (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rn
            FROM orders
        )
        SELECT c_nationkey,
               count(*)::bigint AS n_customers,
               round(avg(t.o_totalprice), 2) AS avg_top_order
        FROM customer c
        JOIN top_order t ON t.o_custkey = c.c_custkey AND t.rn = 1
        GROUP BY c_nationkey
        HAVING avg(c.c_acctbal) > (SELECT avg(c_acctbal) FROM customer)
    """,
    "q94_recursive_cte": "WITH RECURSIVE seq AS (" + _Q94_SEQ_SQL + ")\n" + _Q94_REC_SQL.replace("WITH RECURSIVE chain", ", chain").format(seq="seq"),
}
