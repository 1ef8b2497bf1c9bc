"""SparkSession management (reference parity: main.py:209-213 client get-or-create).

The reference bootstraps a Dask ``distributed.Client`` with
get-or-create semantics; the Spark-native equivalent is
``SparkSession.builder.getOrCreate()`` with a config tuned for both
the local[32] test harness and a large-cluster deployment:

* AQE on — runtime re-planning (broadcast conversion, skew-join
  splitting, partition coalescing) is the scale story for 100 TB.
* Arrow on — every pandas UDF crosses the JVM↔Python boundary in
  columnar batches, not rows.
* shuffle.partitions kept moderate locally; on a real cluster AQE
  coalesces from a high initial number, so we set the initial high
  via advisory sizing rather than hand-tuning per query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def get_session(app_name: str = "engine", shuffle_partitions: int | None = None) -> SparkSession:
    """Get-or-create a SparkSession (reference main.py:209-213 pattern)."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        # events.parquet stores TIMESTAMP(NANOS); Spark has no nanos
        # timestamp type — read as long and convert (see load_events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Parquet scan → column pruning and
    predicate pushdown come free from the DataSource V2 reader."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` normalized to Spark's native
    (session-tz) microsecond TIMESTAMP, whatever the fixture stores:

    * TIMESTAMP(NANOS): under ``spark.sql.legacy.parquet.nanosAsLong``
      it scans as bigint nanos → converted JVM-side (no UDF).
    * timestamp[us] (NTZ, current fixtures): cast NTZ→LTZ, an identity
      on the wall clock under the UTC session timezone pinned below —
      needed because event-time ops (withWatermark) require the LTZ
      TimestampType.

    Both confs are set defensively at runtime: the DRIVER owns the
    SparkSession passed to the contract and won't have them —
    without nanosAsLong a nanos fixture dies with
    PARQUET_TYPE_ILLEGAL, and a non-UTC session timezone would shift
    day-window boundaries vs the (tz-naive) oracle.
    """
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _normalize_event_ts(table(spark, sf_dir, "events"))


def _normalize_event_ts(e: DataFrame) -> DataFrame:
    """The ts-normalization transform of ``load_events``, factored so a
    ``readStream`` over the same files (engine/streaming.py replays the
    source parquet directly instead of re-staging a projection of it)
    applies the identical conversion."""
    from pyspark.sql import functions as F

    ts_type = dict(e.dtypes).get("ts")
    if ts_type == "bigint":
        # integer div: double division loses µs exactness at ~1.7e18 ns
        e = e.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type != "timestamp":
        e = e.withColumn("ts", F.col("ts").cast("timestamp"))
    return e


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``readStream`` file source over one testdata table's OWN parquet
    directory — the streaming replays read the source files directly
    (one footer read for the schema, then the stream scan prunes
    columns like any parquet scan). Staging a projection of the table
    to a temp dir first was a full extra write per replay for zero
    semantic difference under a one-shot availableNow trigger
    (guide §1.2: remove passes; measured in OPTIMIZATION_r11.md).

    The file-stream source only takes directories; a single-file
    table (the fixture layout) is read via its parent directory with
    a ``pathGlobFilter`` pinned to exactly that file."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if os.path.isdir(path):
        return reader.parquet(path)
    return reader.option("pathGlobFilter", f"{name}.parquet").parquet(
        os.path.dirname(path) or "."
    )


def load_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ``load_events``: same source files, same
    defensive confs, same ts normalization — the frame a replay's
    transform sees is column-identical to the batch twin's."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return _normalize_event_ts(stream_table(spark, sf_dir, "events"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in _TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
