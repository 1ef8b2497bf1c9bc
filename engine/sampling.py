"""Sampling & partitioning operators (SURVEY.md §2.2 P4–P7).

Reference parity:
* P4 balanced stratified sampling (main.py:157-165): the reference
  draws ``random.sample(files, limit)`` per class with
  ``limit = min(class_counts)``. Spark-first: one window per class
  ordered by a **deterministic hash shuffle** (md5 of the row id) —
  no driver-side listing, no per-class jobs, linear scale-out, and
  (unlike the reference's unseeded RNG) reproducible, so the DuckDB
  oracle computes the *same* sample.
* P5 shuffled split (main.py:199-204): the reference materializes the
  whole matrix to numpy (`X.compute()`) before sklearn's split — a
  cliff that cannot scale. `randomSplit` stays distributed.

At 100 TB the window sample shuffles once on the class key; for a
heavily skewed label distribution, AQE skew-join/partition splitting
handles the fat classes, and the md5 order key is computed map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .session import table


def balanced_sample(df: DataFrame, label_col: str, id_col: str) -> DataFrame:
    """Exact-count stratified sample: every class downsampled to the
    size of the smallest class (reference main.py:157-165).

    The "random" order is md5(id) — deterministic, uniform, and
    engine-independent (so the oracle reproduces it bit-for-bit).
    """
    min_count = (
        df.groupBy(label_col).count().agg(F.min("count").alias("m"))
    )
    w = Window.partitionBy(label_col).orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(min_count))
        .filter(F.col("rn") <= F.col("m"))
        .drop("rn", "m")
    )


def train_test_split(df: DataFrame, test_frac: float = 0.15, seed: int = 42):
    """P5: distributed shuffled split — no materialization cliff."""
    return df.randomSplit([1.0 - test_frac, test_frac], seed=seed)


def q40_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced stratified sample of embeddings; returns the sampled
    ids + labels (sorted columns hash-stable)."""
    e = table(spark, sf_dir, "embeddings")
    return balanced_sample(e, "label", "vec_id").select("vec_id", "label")


def q41_sample_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-sample census — the reference's balanced-load invariant
    (every class exactly `limit` rows, main.py:178-189)."""
    e = table(spark, sf_dir, "embeddings")
    return balanced_sample(e, "label", "vec_id").groupBy("label").count().orderBy("label")


_BALANCED_SAMPLE_SQL = """
    SELECT vec_id, label FROM (
        SELECT vec_id, label,
               row_number() OVER (PARTITION BY label
                                  ORDER BY md5(vec_id::varchar), vec_id) AS rn
        FROM embeddings) t
    WHERE rn <= (SELECT min(n) FROM
                 (SELECT count(*) AS n FROM embeddings GROUP BY label))
"""

QUERIES = {
    "q40_balanced_sample": q40_balanced_sample,
    "q41_sample_census": q41_sample_census,
}

ORACLE = {
    "q40_balanced_sample": _BALANCED_SAMPLE_SQL,
    "q41_sample_census": f"""
        SELECT label, count(*) AS count FROM ({_BALANCED_SAMPLE_SQL}) s
        GROUP BY label ORDER BY label
    """,
}
