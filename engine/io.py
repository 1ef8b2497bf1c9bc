"""Sources & sinks (SURVEY.md §2.1 S3–S9).

Reference parity:
* S7/S8 pickle checkpoint round-trip (main.py:343-363) → parquet
  stage checkpoints (schema-preserving, splittable, predicate-
  pushdown-capable — everything pickle is not).
* S9 model pickle (main.py:421-423) → MLlib ``.save()/.load()``.
* S3–S5 directory-tree image loading → ``binaryFile`` reader plumbing
  (engine/multimodal.py holds the decode path).

Scale additions beyond the reference:
* ``write_bucketed`` — bucketing fact tables by join key at write
  time so fact⋈fact joins (lineitem⋈orders at 100 TB) elide the
  shuffle entirely (sort-merge over co-located buckets).
* ``write_partitioned`` — directory partition pruning for
  low-cardinality predicates (ship date months, regions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def checkpoint(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Stage checkpoint (S7 parity): persist an intermediate DataFrame."""
    df.write.mode(mode).parquet(path)


def restore(spark: SparkSession, path: str) -> DataFrame:
    """Resume from a checkpoint (S8 parity)."""
    return spark.read.parquet(path)


def write_partitioned(df: DataFrame, path: str, *cols: str, mode: str = "overwrite") -> None:
    """Hive-style directory partitioning → partition pruning on read."""
    df.write.mode(mode).partitionBy(*cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Bucket (and sort) by the join key — co-located storage so a
    later sort-merge join on ``bucket_col`` needs no exchange/sort.
    Saved as a managed table (bucketing metadata lives in the catalog);
    pass ``path`` to store the files at an external location instead
    of the warehouse dir.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """S3/S4 plumbing: binary-file source (path, modificationTime,
    length, content) — partition discovery replaces the reference's
    os.listdir walk (main.py:95-101)."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def save_model(model, path: str) -> None:
    """S9 parity: MLlib-native persistence instead of pickle."""
    model.write().overwrite().save(path)


def load_model(cls, path: str):
    return cls.load(path)


def read_csv(spark: SparkSession, path: str, schema=None, header: bool = True) -> DataFrame:
    """CSV source (schema-first: at scale, never infer — a full extra
    pass over the data)."""
    r = spark.read.option("header", str(header).lower())
    return (r.schema(schema) if schema else r.option("inferSchema", "true")).csv(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source (same schema-first rule as CSV)."""
    r = spark.read
    return (r.schema(schema) if schema else r).json(path)
