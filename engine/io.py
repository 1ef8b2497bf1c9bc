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


def materialize(df: DataFrame, path: str | None = None) -> DataFrame:
    """Pin a SMALL shared frame so Catalyst's per-use subplan
    duplication cannot multiply corpus scans.

    Catalyst plans a shared subtree once PER USE: a census fed to a
    median leg, a deviation leg, and a final leg re-scans the corpus
    three extra times (q125's PLANS.json pins scans=4 on the default
    path; q124's matched/totals frames plan twice each). At fixture
    scale that is noise; at 100 TB it is 2-4 redundant scans of the
    most expensive read in the plan. The fix is to MATERIALIZE the
    narrow derived frame once — it is census-sized (≤ langs × max
    doc length rows for q125, O(matching tokens) for q124), so the
    pin is tiny while the savings are corpus-sized.

    Two mechanisms, chosen by ``path``:

    * ``path=None`` → ``localCheckpoint(eager=True)``: executes the
      subtree NOW, pins the result blocks on the executors, and
      truncates lineage — every later use plans as ``Scan
      ExistingRDD`` with ZERO file scans. The right call inside one
      job on a healthy cluster (no disk round-trip).
    * ``path=...`` → parquet write + read-back (the S7/S8 checkpoint
      pair): survives executor loss and is shareable across jobs —
      the right call when the frame feeds SEVERAL downstream jobs
      (the 100 TB census a whole pipeline reads).

    Plan-pinned by tests/test_plans.py::test_checkpoint_collapses_scans:
    the checkpointed q124/q125/q129 paths drop to zero (resp. one)
    corpus FileScans with byte-identical output."""
    if path is None:
        return df.localCheckpoint(eager=True)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


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


def read_text_docs(spark: SparkSession, path: str, source: str = "raw") -> DataFrame:
    """Raw-text corpus ingestion (``text`` built-in source): one
    document per line, shaped to the ``documents`` schema (doc_id,
    text, lang=null, source, n_chars) so the whole text/dedup operator
    suite runs on it unchanged.

    doc_id is a DETERMINISTIC content+position address — xxhash64 of
    (file, line-offset-within-file via monotonically_increasing_id is
    NOT used: it renumbers on repartition) — here: xxhash64(file path,
    line text, line length) which is stable across partitioning for
    distinct lines and collides only for byte-identical lines within
    one file (those are exact dupes q50 removes anyway — but note the
    consequence: doc_id is NOT unique until that dedup runs, so any
    per-doc_id aggregation placed BEFORE q50 silently merges the
    duplicate rows; a within-file occurrence index would make ids
    unique at the cost of a per-file window shuffle in the ingest
    path, the wrong default for a scan that is otherwise
    shuffle-free). At 100 TB
    this is the property that matters: re-running ingestion on the
    same files yields the same ids, so downstream incremental dedup
    and splits stay stable."""
    from pyspark.sql import functions as F

    t = spark.read.text(path).select(
        F.col("value").alias("text"),
        F.input_file_name().alias("_file"),
    )
    return t.select(
        F.xxhash64("_file", "text", F.length("text")).alias("doc_id"),
        "text",
        F.lit(None).cast("string").alias("lang"),
        F.lit(source).alias("source"),
        F.length("text").cast("bigint").alias("n_chars"),
    )


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Small-files compaction — the table-maintenance pass every
    long-lived 100 TB dataset needs (streaming sinks and fine-grained
    partitions accrete kilobyte files; scans then pay per-file open
    cost and driver memory for file listings).

    Uses the AQE ``REBALANCE`` hint rather than ``coalesce(n)`` or
    ``repartition(n)``: coalesce narrows the scan's parallelism (the
    read itself runs on n tasks) and repartition is a full shuffle to
    a HAND-PICKED n that is wrong at any other data size — REBALANCE
    lets AQE size output partitions to
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` from observed
    bytes, splitting large partitions and merging small ones.
    ``maxRecordsPerFile`` bounds the worst case. Returns the number of
    files written."""
    df = spark.read.parquet(in_path)
    (
        df.hint("rebalance")
        .write.option("maxRecordsPerFile", target_rows_per_file)
        .mode("overwrite")
        .parquet(out_path)
    )
    return count_parquet_files(spark, out_path)


def count_parquet_files(spark: SparkSession, path: str) -> int:
    """Count data files under ``path`` through the Hadoop FileSystem
    API — the scheme-aware route (``file://``, ``hdfs://``, ``s3a://``
    all resolve to the right FS impl), where an ``os.walk`` would
    silently see nothing on an object store even though the write
    succeeded."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    n = 0
    it = fs.listFiles(hpath, True)  # recursive RemoteIterator
    while it.hasNext():
        f = it.next()
        if f.getPath().getName().endswith(".parquet"):
            n += 1
    return n
