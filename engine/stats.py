"""Statistics / EDA operators (SURVEY.md §2.3 A1–A6) on the embeddings fixture.

Reference parity (on the EMNIST stand-in, FIXTURES.md §B):
* A1 class census          (main.py:93-101)  → q42_census
* A3 summary statistics    (main.py:215-220) → q43_summary_stats
* A5 sparsity              (main.py:228-235) → q44_sparsity
* A4 per-class mean vector (main.py:237-243) → q45_per_class_mean

Scale posture: the reference runs A4 as 39 separate filtered jobs
under joblib; here it is ONE hash aggregation (posexplode → partial
avg map-side → final). A5 is a single pass with the elementwise
reduction pushed into a JVM higher-order function (``aggregate``) —
no Python in the hot path, no second scan for the denominator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import table


def q42_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: class census (group-count)."""
    e = table(spark, sf_dir, "embeddings")
    return e.groupBy("label").count().orderBy("label")


def q43_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: describe()-style stats of 4 fixed feature columns.

    The reference samples 12 random columns of 1024 (main.py:217-218)
    driver-side; we fix dims {0, 7, 21, 42} of 64 for determinism.
    Long format (dim, stat aggregates) — one scan, all dims at once.
    Full describe() stat set incl. the reference's 25%/50%/75% rows
    (main.py:215-220).
    """
    e = table(spark, sf_dir, "embeddings")
    dims = [0, 7, 21, 42]
    unpivoted = e.select(
        F.posexplode(F.array(*[F.col("embedding").getItem(i).cast("double") for i in dims])).alias(
            "idx", "x"
        )
    ).select(F.array(*[F.lit(d) for d in dims]).getItem(F.col("idx")).alias("dim"), "x")
    return (
        unpivoted.groupBy("dim")
        .agg(
            F.count("x").alias("n"),
            F.round(F.avg("x"), 6).alias("mean"),
            F.round(F.stddev_samp("x"), 6).alias("std"),
            F.round(F.min("x"), 6).alias("min"),
            # one shared value-map buffer for all three quartiles
            F.expr("percentile(x, array(0.25D, 0.5D, 0.75D))").alias("qs"),
            F.round(F.max("x"), 6).alias("max"),
        )
        .select(
            "dim",
            "n",
            "mean",
            "std",
            "min",
            F.round(F.col("qs")[0], 6).alias("p25"),
            F.round(F.col("qs")[1], 6).alias("median"),
            F.round(F.col("qs")[2], 6).alias("p75"),
            "max",
        )
        .orderBy("dim")
    )


def q44_sparsity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: fraction of (near-)zero elements across the whole matrix.

    One pass; the per-row element count is reduced JVM-side with the
    ``aggregate`` higher-order function (no shuffle, no UDF).
    """
    e = table(spark, sf_dir, "embeddings")
    near_zero = F.expr(
        "aggregate(embedding, 0L, (acc, x) -> acc + CASE WHEN abs(x) < 0.01 THEN 1 ELSE 0 END)"
    )
    exact_zero = F.expr("aggregate(embedding, 0L, (acc, x) -> acc + CASE WHEN x = 0.0 THEN 1 ELSE 0 END)")
    return e.agg(
        F.sum(near_zero).alias("n_near_zero"),
        F.sum(exact_zero).alias("n_exact_zero"),
        F.sum(F.size("embedding")).alias("n_total"),
        F.round(F.sum(near_zero) / F.sum(F.size("embedding")), 6).alias("near_zero_frac"),
    )


def q45_per_class_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: per-class mean vector, long format (label, dim, mean).

    One hash aggregation replaces the reference's per-class filtered
    jobs (main.py:237-243); partial aggregation runs map-side so the
    shuffle carries 10 classes × 64 dims, not the data.
    """
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("mean"))
        .orderBy("label", "dim")
    )


QUERIES = {
    "q42_census": q42_census,
    "q43_summary_stats": q43_summary_stats,
    "q44_sparsity": q44_sparsity,
    "q45_per_class_mean": q45_per_class_mean,
}

ORACLE = {
    "q42_census": "SELECT label, count(*) AS count FROM embeddings GROUP BY label ORDER BY label",
    "q43_summary_stats": """
        WITH u AS (
            SELECT d.dim, embedding[d.dim + 1]::double AS x
            FROM embeddings, (VALUES (0), (7), (21), (42)) AS d(dim)
        )
        SELECT dim, count(x) AS n,
               round(avg(x), 6) AS mean,
               round(stddev_samp(x), 6) AS std,
               round(min(x), 6) AS min,
               round(quantile_cont(x, 0.25), 6) AS p25,
               round(quantile_cont(x, 0.5), 6) AS median,
               round(quantile_cont(x, 0.75), 6) AS p75,
               round(max(x), 6) AS max
        FROM u GROUP BY dim ORDER BY dim
    """,
    "q44_sparsity": """
        SELECT sum(len(list_filter(embedding, x -> abs(x) < 0.01)))::bigint AS n_near_zero,
               sum(len(list_filter(embedding, x -> x = 0.0)))::bigint AS n_exact_zero,
               sum(len(embedding))::bigint AS n_total,
               round(sum(len(list_filter(embedding, x -> abs(x) < 0.01)))::double
                     / sum(len(embedding)), 6) AS near_zero_frac
        FROM embeddings
    """,
    "q45_per_class_mean": """
        SELECT label, t.dim::int AS dim,
               round(avg(embedding[t.dim + 1]::double), 6) AS mean
        FROM embeddings, generate_series(0, 63) AS t(dim)
        GROUP BY label, t.dim ORDER BY label, dim
    """,
}
