"""Structured Streaming surface over the events table (SURVEY §2.6 streaming row).

The reference is batch-only; the engine adds the standard streaming
operator set: watermarked tumbling/sliding windows, session windows,
and stateful dedup. Correctness strategy (SURVEY §7 phase 6): every
windowed aggregation is *batch-equivalent* — ``window()`` /
``session_window()`` produce identical results in batch mode, so the
driver's DuckDB oracle checks the semantics (q70–q73), while the
actual ``readStream → writeStream`` path is exercised by
``run_stream_demo`` (tests/test_streaming.py) and checked against
the batch result.

Scale posture: streaming state is keyed by (window, group); the
watermark bounds state size; ``dropDuplicatesWithinWatermark`` keeps
the dedup state window-bounded instead of unbounded.
"""

from __future__ import annotations

import os
import tempfile
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .session import load_events, load_events_stream, stream_table

# State-store partition count for the bounded stream REPLAYS. Safe
# even for the float-aggregating pipelines: each key's state merges
# its map-side partials in map-id order, and the map partitioning
# (file splits) is untouched by the state width, so the per-key
# merge sequence — hence every double — is reduce-count-invariant
# (re-verified empirically: equal=true 3× at every SF after the
# flip). A streaming query snapshots
# spark.sql.shuffle.partitions at START and every stateful operator
# then maintains one state store (plus per-batch checkpoint delta
# files) PER partition PER store — the interval join keeps four
# stores, so the session's 32 partitions meant 128 store instances
# committing twice per replay while the join itself costs less than a
# second (measured: the 0-input watermark-finalization batch alone
# took 4 s). State sizing is a real deployment decision (it is frozen
# into the checkpoint, and operators size it to state volume, not to
# cluster cores); for these benchmark-scale replays the state is a
# few MB, so a small fixed width bounds the store-commit overhead at
# ANY driver core count — env-overridable for a deployment replaying
# real volumes.
STREAM_STATE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "4"))


@contextmanager
def _state_partitions(spark: SparkSession, n: int = 0):
    """Scope spark.sql.shuffle.partitions around a streaming-query
    START (the query pins the value for its lifetime; the session
    value is restored immediately, so batch twins are unaffected)."""
    n = n or STREAM_STATE_PARTITIONS
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _dir_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


@contextmanager
def _stream_scan_splits(spark: SparkSession, *source_paths: str):
    """Scope spark.sql.files.maxPartitionBytes around a replay whose
    file source is the SOURCE table itself (guide §6 input split
    size, made scale-adaptive per the round rules): a fixture table
    is one small parquet file, which at the 128 MB default is ONE
    scan split — any in-stream compute (the ingest projection, the
    row-wise scrub) would run serial. Derive the split size from the
    actual input bytes so the replay scan yields ~2 tasks per core,
    clamped to [1 MB, the 128 MB default] — a 100 TB source keeps the
    default (never raised), a 2 MB fixture file splits ~32 ways.
    Scoped around start→awaitTermination because the conf is read at
    each micro-batch's scan planning, not pinned at query start."""
    cores = spark.sparkContext.defaultParallelism
    total = sum(_dir_bytes(p) for p in source_paths)
    target = min(max(total // max(2 * cores, 1), 1 << 20), 128 << 20)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def tumbling_counts(events: DataFrame) -> DataFrame:
    """1-day tumbling window counts per event_type."""
    return (
        events.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    """2-day windows sliding by 1 day (each event lands in 2 windows)."""
    return (
        events.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based merge)."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """Exact dedup on event_id (batch twin of
    dropDuplicatesWithinWatermark in the stream path)."""
    return events.dropDuplicates(["event_id"])


# ------------------------------------------------------------ driver queries

def q70_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_events(spark, sf_dir))


def q71_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load_events(spark, sf_dir))


def q72_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_counts(load_events(spark, sf_dir))


def q73_stream_dedup_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_events(spark, sf_dir)
    return dedup_events(e).agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


# --------------------------------------------- custom stateful operator

def running_user_totals(stream: DataFrame, timeout_minutes: int = 60) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running event count + value total, state expiring after
    ``timeout_minutes`` of event-time inactivity.

    This is the escape hatch for operators Structured Streaming lacks
    (SURVEY §2.6 custom-operator rule): state is a tiny fixed-width
    tuple per key, partitioned by user_id — state size O(active users),
    bounded by the processing-time timeout.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        state.setTimeoutDuration(timeout_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
        )

    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, total double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )



# ------------------------------------- streaming heavy hitters (MG state)

def streaming_heavy_hitter_state(stream: DataFrame, capacity: int | None = None) -> DataFrame:
    """Streaming Misra-Gries: the SAME mergeable summary q67b folds per
    partition, kept as per-shard ``applyInPandasWithState`` state — the
    canonical "sketch as streaming state" pattern (state is O(capacity)
    per shard forever, regardless of stream length; the capture bound
    N_shard/(capacity+1) holds across any micro-batch arrival order
    because MG merge is associative).

    Input: a token stream (``tok string``). Tokens are sharded by
    ``xxhash64(tok) % HH_SHARDS`` so each shard owns a slice of the key
    domain. Each update emits the shard's full current summary tagged
    with a state version, so the sink's max-version rows ARE the
    current summary (update-mode-friendly; no sink-side merge)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .text import HH_CAPACITY, HH_SHARDS, mg_merge

    cap = capacity or HH_CAPACITY

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            toks, counts, ver = state.get
            counters = pd.Series(list(counts), index=list(toks), dtype="int64")
        else:
            counters, ver = pd.Series(dtype="int64"), 0
        for pdf in pdfs:
            counters = mg_merge(counters, pdf["tok"].value_counts(), cap)
        ver += 1
        state.update((list(counters.index), [int(v) for v in counters.values], ver))
        yield pd.DataFrame(
            {
                "shard": key[0],
                "ver": ver,
                "tok": counters.index.astype(str),
                "lb": counters.values.astype("int64"),
            }
        )

    sharded = stream.withColumn("shard", F.pmod(F.xxhash64("tok"), F.lit(HH_SHARDS)))
    return sharded.groupBy("shard").applyInPandasWithState(
        _update,
        outputStructType="shard bigint, ver bigint, tok string, lb bigint",
        stateStructType="toks array<string>, counts array<bigint>, ver bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_hh_stream_demo(
    spark: SparkSession, sf_dir: str, out_dir: str | None = None
) -> DataFrame:
    """Real readStream run of the MG-state operator: the corpus token
    stream staged as TWO parquet files replayed one file per
    micro-batch (maxFilesPerTrigger=1), so the summary provably folds
    ACROSS batches through state, not within one batch. Returns the
    final (max-version) per-shard summaries."""
    from .session import table

    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))
    )
    stage = out_dir or tempfile.mkdtemp(prefix="hh_stream_")
    stage_in = os.path.join(stage, "in")
    toks.repartition(2).write.mode("overwrite").parquet(stage_in)

    stream = (
        spark.readStream.schema("tok string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_in)
    )
    out = streaming_heavy_hitter_state(stream)
    name = "hh_stream_out"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    all_rows = spark.table(name)
    w = Window.partitionBy("shard")
    return (
        all_rows.withColumn("max_ver", F.max("ver").over(w))
        .filter(F.col("ver") == F.col("max_ver"))
        .select("shard", "ver", "tok", "lb")
    )

# ----------------------------------------------------- true streaming harness

def run_stream_demo(spark: SparkSession, sf_dir: str, out_dir: str | None = None) -> DataFrame:
    """Real readStream → watermark → windowed agg → writeStream run.

    Replays events.parquet as a file stream (one-shot availableNow
    trigger), applies a 1-day watermark + tumbling count, writes to an
    in-memory sink, and returns the result for batch-equivalence
    checks. Late rows beyond the watermark would be dropped — with a
    static replay nothing is late, so the result must equal the batch
    twin exactly.

    The file source is the SOURCE parquet itself (r11, guide §1.2):
    under a one-shot availableNow trigger a staged copy replays the
    same rows through the same runtime, so the staging write was a
    full extra pass per check; the stream scan prunes to the columns
    the agg reads just like the batch scan does. ``out_dir`` is kept
    for callers that pass one (unused now).
    """
    stream = load_events_stream(spark, sf_dir).withWatermark("ts", "1 day")
    agg = tumbling_counts(stream)
    name = "stream_demo_out"
    # the sum(value) doubles are reduce-partition-count-invariant:
    # each key's state merges its map-side partials in map-id order,
    # and the map partitioning (file splits) is untouched by the
    # state width — equality with the 32-partition batch twin is
    # re-verified at every SF (stream_eq + tests)
    with _state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(120)
    return spark.table(name)


def run_stateful_demo(spark: SparkSession, sf_dir: str, out_dir: str | None = None) -> DataFrame:
    """Real streaming run of the custom stateful operator, plus
    dropDuplicatesWithinWatermark on the way in. Returns the final
    per-user state (update mode → keep the last row per user)."""
    batch = load_events(spark, sf_dir)
    stage = out_dir or tempfile.mkdtemp(prefix="stream_stateful_")
    stage_in = os.path.join(stage, "in")
    batch.write.mode("overwrite").parquet(stage_in)

    stream = (
        spark.readStream.schema(batch.schema)
        .parquet(stage_in)
        .withWatermark("ts", "1 day")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = running_user_totals(stream)
    name = "stream_stateful_out"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    res = spark.table(name)
    # update mode emits one row per user per micro-batch; final state =
    # the max-count row per user
    w_latest = F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    )
    return res.withColumn("rn", w_latest).filter(F.col("rn") == 1).drop("rn")


def run_foreach_batch_demo(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """foreachBatch sink: per-micro-batch custom write (the idempotent
    exactly-once pattern — batch_id keys the write so replays
    overwrite instead of duplicating)."""
    batch = load_events(spark, sf_dir)
    stage_in = os.path.join(out_dir, "in")
    batch.write.mode("overwrite").parquet(stage_in)
    sink_dir = os.path.join(out_dir, "sink")

    def _write_batch(bdf: DataFrame, batch_id: int) -> None:
        # idempotent: path keyed by batch_id; replay overwrites
        tumbling_counts(bdf).write.mode("overwrite").parquet(
            os.path.join(sink_dir, f"batch_{batch_id}")
        )

    q = (
        spark.readStream.schema(batch.schema)
        .parquet(stage_in)
        .writeStream.foreachBatch(_write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(out_dir, "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(os.path.join(sink_dir, "*"))


def click_to_purchase(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream inner join with an event-time bound: each purchase
    matched to the same user's clicks in the preceding hour.

    Watermarks on BOTH sides plus the time-bound condition let Spark
    evict join state (without them a stream-stream join buffers
    forever). The same builder is the batch twin: Catalyst's
    EliminateEventTimeWatermark drops the watermark nodes on static
    inputs, so one definition serves oracle-checking AND the real run.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    ).withWatermark("click_ts", "1 hour")
    p = purchases.select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    ).withWatermark("purchase_ts", "1 hour")
    return p.join(
        c,
        (p.user_id == c.c_user)
        & (c.click_ts <= p.purchase_ts)
        & (c.click_ts >= p.purchase_ts - F.expr("INTERVAL 1 HOUR")),
    ).select("event_id", "user_id", "purchase_ts", "click_ts")


def q74_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream join (the oracle-checked entry;
    tests/test_streaming.py runs the real two-readStream version)."""
    e = load_events(spark, sf_dir)
    return click_to_purchase(
        e.filter(F.col("event_type") == "click"),
        e.filter(F.col("event_type") == "purchase"),
    )


# ----------------------------------------- streaming decontamination

def decontaminate_rowwise(docs: DataFrame, eval_shingles: list[str]) -> DataFrame:
    """Stateless per-row decontamination — the streaming-INGEST shape
    of q48: the eval shingle set travels as a broadcast literal (a
    benchmark-scale model object, the PQ-codebook/IVF-centroid
    pattern), and each document is flagged row-locally via
    array_intersect — no shuffle, no state, no watermark, so it runs
    under append mode and emits per arriving doc.

    Works on a static OR streaming ``docs`` frame (the transform is
    identical — that is the point). The trade vs q48's broadcast
    semi-join: the eval set must be expression-sized (fine for real
    benchmark suites up to ~10^5 n-grams); beyond that the batch scrub
    (q48) or a stream-static join is the tool. Output schema and
    semantics match q48 exactly (distinct-shingle hit counts), so the
    same DuckDB oracle value-checks both.

    Two measured hot-path rules (this was the heaviest bench row,
    28.8 s at sf0.1, before they landed — ~6 s after):

    * The row filter is ``size(toks) >= 3`` on the TOKEN array, not
      ``n_shingles > 0`` on the shingle array (provably equivalent:
      ``sequence(0, size-3)`` is non-empty iff size ≥ 3 and
      array_distinct of a non-empty array is non-empty). The shingle
      form let PushDownPredicates inline the whole higher-order
      shingle expression — including ``split(trim(text))`` INSIDE the
      per-index lambda — beneath the tokenize projection, re-splitting
      the full document text once per shingle (~765k regex splits of
      whole documents at sf0.1, ~9 s on one partition). The token form
      pushes as one split per row and keeps the shingle transform in
      the projection, where ``toks`` stays a materialized reference.
    * The eval literal ships as ONE array-typed Literal node (``F.lit``
      on a numpy 1-d array → a single JVM ``lit(Array[String])`` call),
      not ``F.array(*map(F.lit, …))`` — the latter builds |eval|
      expression nodes (4,548 at sf0.1) that every micro-batch
      re-analyzes (~2.7× slower per replan measured at 5k elements).
    * ``array_intersect(eval_lit, sh)``, not ``(sh, eval_lit)``:
      ArrayIntersect builds its hash set from the SECOND argument per
      row, so the set comes from the ~50-shingle document side (2.4M
      inserts total at sf0.1) instead of rebuilding a 4,548-string set
      per document (22M inserts). Only the SIZE of the intersection is
      consumed, and the distinct-common-element count is symmetric, so
      the output is unchanged.

    Values/order/semantics are byte-identical — same sorted list, same
    distinct-intersection count."""
    import numpy as np

    from .text import _SPARK_SHINGLES, DECON_MIN_HITS, _trunc6

    eval_arr = F.lit(np.array(sorted(eval_shingles), dtype=np.str_)).cast(
        "array<string>"
    )
    sh = F.expr(_SPARK_SHINGLES)
    return (
        docs.withColumn("toks", F.split(F.trim(F.col("text")), " +"))
        .filter(F.size("toks") >= 3)
        .withColumn("sh", sh)
        .withColumn("n_shingles", F.size("sh").cast("bigint"))
        .withColumn("n_hits", F.size(F.array_intersect(eval_arr, "sh")).cast("bigint"))
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            _trunc6(F.col("n_hits") / F.col("n_shingles")).alias("contam_rate"),
            (F.col("n_hits") >= DECON_MIN_HITS).alias("contaminated"),
        )
    )


def _eval_shingles(spark: SparkSession, sf_dir: str) -> list[str]:
    """Distinct shingles of the eval holdout — driver-side bounded
    collect (the eval set is benchmark-scale by definition)."""
    from .session import table
    from .text import DECON_HOLDOUT_MOD, _with_shingles

    d = table(spark, sf_dir, "documents")
    rows = (
        _with_shingles(d.filter(F.col("doc_id") % DECON_HOLDOUT_MOD == 0))
        .select("shingle")
        .distinct()
        .collect()
    )
    return [r.shingle for r in rows]


def q74b_stream_decontaminate(
    spark: SparkSession, sf_dir: str, eval_shingles: list[str] | None = None
) -> DataFrame:
    """Batch-mode evaluation of the stateless row-wise decontamination
    (the oracle-checked entry; tests/test_streaming.py runs the real
    readStream append-mode version and pins stream ≡ batch ≡ q48).
    ``eval_shingles`` lets a caller that already collected the eval set
    (stream_eq_check runs this twin next to the stream leg) skip the
    second collect — the set is deterministic, so output is unchanged."""
    from .session import table
    from .text import DECON_HOLDOUT_MOD

    d = table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % DECON_HOLDOUT_MOD != 0
    )
    if eval_shingles is None:
        eval_shingles = _eval_shingles(spark, sf_dir)
    return decontaminate_rowwise(d, eval_shingles)


def run_decontaminate_stream_demo(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    eval_shingles: list[str] | None = None,
) -> DataFrame:
    """Real readStream run of the row-wise scrub: the documents table
    replayed as a file stream, the identical transform, append-mode
    memory sink (stateless ⇒ no watermark needed), availableNow
    replay. The file source is the source parquet itself (r11, see
    run_stream_demo) — the stream scan prunes to doc_id + text."""
    from .text import DECON_HOLDOUT_MOD

    ev = eval_shingles if eval_shingles is not None else _eval_shingles(spark, sf_dir)
    stream = stream_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % DECON_HOLDOUT_MOD != 0
    )
    out = decontaminate_rowwise(stream, ev)
    name = "stream_decon_out"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def run_stream_join_demo(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """Real stream-stream join run: two readStreams over the SOURCE
    events parquet (clicks / purchases), joined with watermarked
    state, append sink. availableNow single-batch replay → equals the
    batch twin. No staging write (r11, see run_stream_demo); the two
    stream scans prune to the columns the join reads."""

    def _typed(kind: str) -> DataFrame:
        return load_events_stream(spark, sf_dir).filter(F.col("event_type") == kind)

    joined = click_to_purchase(_typed("click"), _typed("purchase"))
    name = "stream_join_out"
    # exact-valued output (ids + timestamps): state width is safe to
    # size to the replay (see STREAM_STATE_PARTITIONS)
    with _state_partitions(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(180)
    return spark.table(name)


def _doc_quality_census(docs: DataFrame) -> DataFrame:
    """Shared batch/stream tail of the training-data ingest pipeline:
    quality gate + per-lang census. Every input the census touches is
    derived from the NORMALIZED text (``norm`` and the content-ID'd
    ``lang`` — see _staged_docs), so every member of a
    fingerprint-duplicate group contributes identically and the
    aggregate is invariant to which duplicate the dedup stage keeps
    (batch arbitrary keeper vs streaming keep-first-arrival)."""
    toks = F.split(F.col("norm"), " ")
    n_tokens = F.size(toks)
    quality = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.size(F.array_distinct(toks)) / n_tokens)
        + 0.3 * F.least(
            F.length(F.regexp_replace(F.col("norm"), " ", "")) / n_tokens / F.lit(10.0),
            F.lit(1.0),
        )
    )
    return (
        docs.withColumn("n_tokens", n_tokens)
        .withColumn("quality", quality)
        .filter(F.col("quality") >= 0.5)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("token_budget"))
    )


def _ingest_projection(d: DataFrame) -> DataFrame:
    """The ingest projection over a documents frame (batch OR stream):
    normalized text, content fingerprint (q51 semantics) and a
    synthetic deterministic event time (streaming needs one; the
    fixture table has none). Row-local expressions only, so the same
    transform runs identically on a readStream frame — which is how
    run_doc_stream_demo applies it (r11): the stream leg computes the
    projection THROUGH the streaming runtime instead of reading a
    pre-staged copy, so the two equivalence legs derive it
    independently again (r10 ADVICE)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    d = d.select("doc_id", norm.alias("norm"), F.md5(norm).alias("fingerprint"))
    # content-derived language (same marker argmax as q56, over norm)
    from .text import _LANG_MARKERS

    scores = [
        F.struct(
            F.expr(
                " + ".join(
                    f"size(filter(split(norm, ' '), t -> t = '{m}'))" for m in markers
                )
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(_LANG_MARKERS.items())
    ]
    return d.select(
        "doc_id",
        F.array_max(F.array(*scores)).getField("lang").alias("lang"),
        "norm",
        "fingerprint",
        F.expr(
            "timestamp'2025-01-01 00:00:00'"
            " + make_interval(0, 0, 0, 0, 0, 0, pmod(xxhash64(fingerprint), 86400))"
        ).alias("ts"),
    )


def _staged_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_ingest_projection`` over the documents table.

    Two properties make the downstream census keeper-invariant and
    the stream/batch twins provably equal at ANY scale factor:

    - ``lang`` is content-ID'd from the normalized text (the q56
      marker heuristic), not taken from the fixture label — a crawl
      ingest has no labels, and fingerprint-duplicate rows can carry
      different labels, which would make the census depend on which
      duplicate survives dedup.
    - ``ts`` is derived from the fingerprint, so all members of a
      duplicate group are co-timed and the dedup watermark window
      always covers the whole group. (A real crawl has dups spread
      over time; beyond-watermark dups are by design NOT caught by
      streaming dedup — that is the periodic batch-compaction path's
      job, q50/q80.)
    """
    from .session import table

    return _ingest_projection(table(spark, sf_dir, "documents"))


def doc_pipeline_batch(
    spark: SparkSession, sf_dir: str, staged: DataFrame | None = None
) -> DataFrame:
    """Batch twin of the streaming ingest pipeline: fingerprint dedup →
    quality gate → per-lang census. ``staged`` lets a caller that
    already materialized the (deterministic) _staged_docs frame — the
    stream leg stages it to parquet anyway — reuse it instead of
    re-deriving the normalization/langid projection; the dedup+census
    machinery under comparison is unchanged (tests/test_streaming.py
    keeps the fully independent twin)."""
    src = staged if staged is not None else _staged_docs(spark, sf_dir)
    return _doc_quality_census(src.dropDuplicates(["fingerprint"]))


def run_doc_stream_demo(spark: SparkSession, sf_dir: str, out_dir: str) -> DataFrame:
    """The LLM-training-data ingest pipeline as a REAL stream: document
    micro-batches → ``dropDuplicatesWithinWatermark`` on the content
    fingerprint (state bounded by the watermark — the streaming form
    of exact dedup q50/q51) → quality gate → per-lang census.

    This is the shape a continuous crawl-ingest runs at 100 TB: dedup
    state holds only the watermark window's fingerprints (16-byte
    keys), the census is an incremental streaming aggregation.

    The file source is the documents parquet itself and the ingest
    projection runs IN-STREAM (r11): no staging write, and the stream
    leg derives norm/fingerprint/lang through the streaming runtime —
    independently of the batch twin (restores the independence the
    r10 staged-frame sharing had weakened; r10 ADVICE item 2)."""
    stream = (
        _ingest_projection(stream_table(spark, sf_dir, "documents"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    agg = _doc_quality_census(stream)
    name = "doc_stream_out"
    # exact-valued output (counts + integer token sums; the quality
    # gate is a row-local filter): state width is safe to size to the
    # replay (see STREAM_STATE_PARTITIONS)
    with _state_partitions(spark):
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
    q.awaitTermination(120)
    return spark.table(name)


def streaming_neardup_state(stream: DataFrame, cap: int | None = None) -> DataFrame:
    """Streaming within-batch near-dup probe — the stateful leg of
    q118's streaming twin (the r7 verdict's item 5: the one ingest
    shape that had no stream leg). State per band key is the ≤``cap``
    EARLIEST batch docs of that band — exactly the hot-band-capped
    b-side of ``text._batch_band_candidates`` — kept as two flat
    arrays (ids + flattened signatures, O(cap·N_MINHASH) bigints per
    band forever). Each arriving doc is verified (≥ NEARDUP_MATCH_MIN
    of N_MINHASH positions agree) against the stored earlier docs of
    its band and every verified (doc_id, match_id) pair is emitted;
    the sink-side min-agg picks the keep-first evidence (the
    run_hh_stream_demo pattern: emission is mergeable, the final
    reduction happens once on the sink).

    Equality with the batch leg requires doc_id-ordered arrival
    (batch "first" = smallest id; a real ingest's "first" = arrival
    order, which IS its id order when ids are assigned at ingest) —
    run_neardup_stream_demo stages the replay files accordingly and
    the kernel sorts within each micro-batch group."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from .text import N_MINHASH, NEARDUP_BAND_CAP, NEARDUP_MATCH_MIN

    cap = cap or NEARDUP_BAND_CAP

    def _update(key, pdfs, state: GroupState):
        import pandas as pd

        ids, flat = (list(state.get[0]), list(state.get[1])) if state.exists else ([], [])
        out_a, out_b = [], []
        # one sort over the WHOLE micro-batch group: a band group split
        # across Arrow chunks must still process docs in doc_id order
        # or keep-first equivalence with the batch leg breaks (r8
        # ADVICE) — per-chunk sorts only order within a chunk.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        group = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame(columns=["doc_id", "sig"])
        )
        for row in group.sort_values("doc_id").itertuples(index=False):
            # state round-trips through the JVM pickler: plain ints
            # only (numpy scalars are not constructible JVM-side)
            doc, sig = int(row.doc_id), [int(x) for x in row.sig]
            for j, mid in enumerate(ids):
                stored = flat[j * N_MINHASH : (j + 1) * N_MINHASH]
                if sum(a == b for a, b in zip(sig, stored)) >= NEARDUP_MATCH_MIN:
                    out_a.append(doc)
                    out_b.append(mid)
            if len(ids) < cap:
                ids.append(doc)
                flat.extend(sig)
        state.update((ids, flat))
        yield pd.DataFrame({"doc_id": out_a, "match_id": out_b})

    return stream.groupBy("band_key").applyInPandasWithState(
        _update,
        outputStructType="doc_id bigint, match_id bigint",
        stateStructType="ids array<bigint>, flat array<bigint>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_neardup_stream_demo(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    index_table: str | None = None,
    bands: DataFrame | None = None,
) -> DataFrame:
    """q118's streaming twin as a REAL two-query readStream run — the
    continuous-crawl ingest probing near-dups against the standing
    corpus AND itself as documents arrive:

    * history leg — STATELESS stream-static equi-join of arriving
      band rows against the standing band store (at 100 TB: the
      bucketed store q118 probes; per micro-batch a map-side probe),
      signature-verified in-stream, verified pairs appended to the
      sink. No state at all: the store is static within a batch run.
    * within-batch leg — ``streaming_neardup_state``: band-keyed
      state of the ≤cap earliest docs (the batch leg's exact hot-band
      cap), verified pairs appended across micro-batches.

    The batch band rows are staged as TWO doc_id-range files written
    low-half first and replayed one file per micro-batch, so pairs
    provably form ACROSS batches through state (a doc in file 2
    matching a doc in file 1 can only come from state) and arrival
    order equals id order (the batch keep-first tiebreak). The final
    assembly — min evidence per doc, history-beats-batch status — is
    ``text._neardup_assemble``, the very function q118 returns
    through; stream ≡ batch is pinned by stream_equivalence_report's
    incremental_neardup row and tests/test_streaming.py."""
    from .session import table
    from .text import (
        INCR_BATCH_MOD,
        N_MINHASH,
        NEARDUP_MATCH_MIN,
        _banded_signatures,
        _neardup_assemble,
    )

    d = table(spark, sf_dir, "documents")
    # index_table= (opt-in): the history leg probes the persisted
    # text.build_band_index store — per micro-batch the stream-static
    # join reads the bucketed store co-located instead of re-deriving
    # the standing corpus's band rows on every trigger. The inline
    # path pins the derived band rows once (localCheckpoint): a
    # stream-static join re-evaluates its static side EVERY trigger,
    # so without the pin the shingle/minhash subtree ran per
    # micro-batch (and thrice more for the batch staging writes and
    # the median probe below).
    if bands is None:
        bands = (
            spark.table(index_table)
            if index_table
            else _banded_signatures(d).localCheckpoint(eager=True)
        )
    batch = bands.filter(F.col("doc_id") % INCR_BATCH_MOD == 0)
    hist = bands.filter(F.col("doc_id") % INCR_BATCH_MOD != 0)

    # stage the arriving batch as two id-ranged files, low half first;
    # FileStreamSource replays in mod-time order and same-granularity
    # writes can TIE, so pin strictly increasing mtimes explicitly (r8
    # ADVICE) — a tie replaying the high half first would change the
    # within-batch keep-first pairs vs q118.
    stage_in = os.path.join(out_dir, "in")
    mid = batch.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    batch.filter(F.col("doc_id") <= mid).coalesce(1).write.mode("overwrite").parquet(stage_in)
    low_files = {f for f in os.listdir(stage_in) if f.endswith(".parquet")}
    batch.filter(F.col("doc_id") > mid).coalesce(1).write.mode("append").parquet(stage_in)
    anchor = os.path.getmtime(stage_in)
    for f in os.listdir(stage_in):
        if f.endswith(".parquet"):
            t = anchor - 60 if f in low_files else anchor
            os.utime(os.path.join(stage_in, f), (t, t))

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage_in)
    )

    n_match = F.expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), t -> t))")
    hist_pairs = (
        stream.alias("n")
        .join(hist.alias("h"), "band_key")
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("h.doc_id").alias("match_id"),
            F.col("n.sig").alias("sa"),
            F.col("h.sig").alias("sb"),
        )
        .withColumn("m", n_match)
        .filter(F.col("m") >= NEARDUP_MATCH_MIN)
        .select("doc_id", "match_id")
    )
    batch_pairs = streaming_neardup_state(stream)

    sinks = {}
    # exact-valued outputs (id pairs): state width is safe to size to
    # the replay (see STREAM_STATE_PARTITIONS)
    with _state_partitions(spark):
        for name, src in (("nd_hist_pairs", hist_pairs), ("nd_batch_pairs", batch_pairs)):
            sinks[name] = (
                src.writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .option("checkpointLocation", os.path.join(out_dir, "ckpt_" + name))
                .trigger(availableNow=True)
                .start()
            )
    for q in sinks.values():
        q.awaitTermination(120)

    hmatch = (
        spark.table("nd_hist_pairs")
        .groupBy("doc_id")
        .agg(F.min("match_id").alias("hist_match"))
    )
    bmatch = (
        spark.table("nd_batch_pairs")
        .groupBy("doc_id")
        .agg(F.min("match_id").alias("batch_match"))
    )
    base = d.filter(F.col("doc_id") % INCR_BATCH_MOD == 0).select("doc_id")
    return _neardup_assemble(base, hmatch, bmatch)


def enrich_stream_with_dim(stream: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: the dim side is broadcast, so
    each micro-batch joins map-side with NO shuffle and no streaming
    state — the standard pattern for attaching dimension attributes to
    a 100 TB/day event stream."""
    return stream.join(
        F.broadcast(dim), stream.user_id == dim.c_custkey, "inner"
    ).select("event_id", "user_id", "ts", "event_type", "c_name", "c_mktsegment")


def stream_equivalence_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible stream ≡ batch equality surface (r4 verdict item
    4 — the ann_recall_report pattern applied to streaming): each row
    runs one REAL ``readStream → transform → writeStream`` pipeline
    (availableNow file replay through the actual streaming runtime,
    including watermarks, stream-stream join state, and
    dropDuplicatesWithinWatermark state) next to its batch twin and
    records multiset equality via two ``exceptAll`` probes. A
    regression in watermark handling, state eviction, or the shared
    transform builders shows up as equal=false in the driver record
    instead of only in a local pytest run.

    Covered operators: watermarked tumbling aggregation, watermarked
    stream-stream interval join, stateless row-wise decontamination,
    the fingerprint-dedup → quality-gate → census ingest pipeline
    (streaming state: dropDuplicatesWithinWatermark), and the
    incremental near-dup ingest probe (r8: stream-static band-store
    join + band-keyed applyInPandasWithState, q118's twin). Equality is
    exact, not approximate: both sides evaluate the same column
    expressions over the same rows, so even the float columns must
    match bit-for-bit. Rows-only by nature (the streaming runtime is
    the thing under test).

    Each pipeline is individually runnable via ``stream_eq_check``
    (r8 verdict item 5): bench.py times every pipeline as its own
    BENCH_DETAIL row, so a 2× regression in ONE stream is visible
    against its own baseline instead of hiding inside a 69 s blob."""
    rows = [stream_eq_check(spark, sf_dir, name) for name in STREAM_EQ_OPERATORS]
    return spark.createDataFrame(
        rows, "operator string, batch_rows bigint, stream_rows bigint, equal boolean"
    ).orderBy("operator")


# the five stream≡batch pipelines, in the report's execution order
STREAM_EQ_OPERATORS = [
    "tumbling_watermark_agg",
    "stream_stream_interval_join",
    "rowwise_decontaminate",
    "dedup_quality_census",
    "incremental_neardup",
]


def _stream_eq_pair(
    spark: SparkSession, sf_dir: str, name: str, tmp: str
) -> tuple[DataFrame, DataFrame]:
    """(stream result, batch twin) for one named equivalence pipeline."""
    if name == "tumbling_watermark_agg":
        return (
            run_stream_demo(spark, sf_dir, os.path.join(tmp, "t")),
            q70_stream_tumbling(spark, sf_dir),
        )
    if name == "stream_stream_interval_join":
        return (
            run_stream_join_demo(spark, sf_dir, os.path.join(tmp, "j")),
            q74_stream_join(spark, sf_dir),
        )
    if name == "rowwise_decontaminate":
        # collect the (deterministic) eval shingle set once for both legs
        ev = _eval_shingles(spark, sf_dir)
        return (
            run_decontaminate_stream_demo(
                spark, sf_dir, os.path.join(tmp, "d"), eval_shingles=ev
            ),
            q74b_stream_decontaminate(spark, sf_dir, eval_shingles=ev),
        )
    if name == "dedup_quality_census":
        # both legs derive the ingest projection independently (the
        # stream leg in-stream, the batch twin from the source table)
        # — r11 restores the full twin independence the r10 staged-
        # frame sharing had weakened (r10 ADVICE item 2), and the
        # staging write it bought is gone entirely
        return (
            run_doc_stream_demo(spark, sf_dir, os.path.join(tmp, "c")),
            doc_pipeline_batch(spark, sf_dir),
        )
    if name == "incremental_neardup":
        from .session import table as _table
        from .text import _banded_signatures, q118_incremental_neardup

        # pin the deterministic band-signature projection ONCE and hand
        # it to both legs (the census-twin precedent): the stream-static
        # probe, the stateful kernel and the batch band joins — the
        # machinery under comparison — all recompute in full; the fully
        # independent twin comparison stays in tests/test_streaming.py
        bands = _banded_signatures(
            _table(spark, sf_dir, "documents")
        ).localCheckpoint(eager=True)
        return (
            run_neardup_stream_demo(spark, sf_dir, os.path.join(tmp, "n"), bands=bands),
            q118_incremental_neardup(spark, sf_dir, bands=bands),
        )
    raise ValueError(f"unknown stream-equivalence pipeline: {name}")


def stream_eq_check(spark: SparkSession, sf_dir: str, name: str):
    """Run ONE stream≡batch pipeline end-to-end and return its report
    row ``(operator, batch_rows, stream_rows, equal)``."""
    import shutil

    tmp = tempfile.mkdtemp(prefix=f"stream_eq_{name}_")
    try:
        stream_df, batch_df = _stream_eq_pair(spark, sf_dir, name, tmp)
        # localCheckpoint truncates both lineages before exceptAll:
        # each side is compared as materialized rows (also dodges a
        # Catalyst ATTRIBUTE_NOT_FOUND rewrite bug when exceptAll
        # wraps generate-bearing census plans in this Spark build)
        s = stream_df.localCheckpoint(eager=True)
        b = batch_df.localCheckpoint(eager=True)
        b_rows = b.count()
        s_rows = s.count()
        # with |s| == |b|, one multiset difference being empty implies
        # the other (|s\b| = |s| - |s∩b| = |b| - |s∩b| = |b\s|), so a
        # single exceptAll probe suffices
        equal = b_rows == s_rows and s.exceptAll(b).isEmpty()
        return (name, b_rows, s_rows, equal)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


QUERIES = {
    "stream_equivalence_report": stream_equivalence_report,
    "q70_stream_tumbling": q70_stream_tumbling,
    "q71_stream_sliding": q71_stream_sliding,
    "q72_stream_sessions": q72_stream_sessions,
    "q73_stream_dedup_count": q73_stream_dedup_count,
    "q74_stream_join": q74_stream_join,
    "q74b_stream_decontaminate": q74b_stream_decontaminate,
}


def _q48_oracle() -> str:
    # identical semantics to the batch scrub — one oracle serves both
    from .text import ORACLE as _TEXT_ORACLE

    return _TEXT_ORACLE["q48_decontaminate"]


ORACLE = {
    "q74b_stream_decontaminate": _q48_oracle(),
    "q70_stream_tumbling": """
        SELECT time_bucket(INTERVAL 1 day, ts)::timestamp AS window_start,
               event_type, count(*) AS n, round(sum(value), 4) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "q71_stream_sliding": """
        WITH offs AS (SELECT unnest([0, 1]) AS off),
        assigned AS (
            -- Spark aligns sliding windows to the epoch; DuckDB's
            -- default time_bucket origin (2000-01-01) is NOT 2-day
            -- aligned with it, so pin the origin explicitly.
            SELECT time_bucket(INTERVAL 2 day, ts - off * INTERVAL 1 day,
                               TIMESTAMP '1970-01-01 00:00:00')::timestamp
                     + off * INTERVAL 1 day AS window_start
            FROM events, offs)
        SELECT window_start, count(*) AS n FROM assigned GROUP BY 1
    """,
    "q72_stream_sessions": """
        -- Both windows order by (ts, event_id): the lag flags and the
        -- running sum are evaluated in SEPARATE window passes, and with
        -- same-microsecond events an untiebroken ORDER BY ts lets the
        -- two passes permute tied rows DIFFERENTLY — a flag-0 tied row
        -- sorted before its flag-1 twin in the ROWS frame joins the
        -- PREVIOUS session (observed: run-to-run flaky sessions in the
        -- events fuzzer's exploration). Spark's session_window merges
        -- by interval and has no such order dependence; the total
        -- order makes the oracle match it under ties.
        WITH ordered AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                             >= INTERVAL 30 minutes
                        OR lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events),
        sessions AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM ordered)
        SELECT min(ts)::timestamp AS session_start, user_id,
               count(*) AS n_events, round(sum(value), 4) AS sum_value
        FROM sessions GROUP BY user_id, session_id
    """,
    "q73_stream_dedup_count": """
        SELECT count(*) AS n_unique, round(sum(value), 4) AS sum_value
        FROM (SELECT DISTINCT ON (event_id) * FROM events ORDER BY event_id, ts) t
    """,
    "q74_stream_join": """
        SELECT p.event_id, p.user_id,
               p.ts::timestamp AS purchase_ts, c.ts::timestamp AS click_ts
        FROM events p JOIN events c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
        WHERE p.event_type = 'purchase' AND c.event_type = 'click'
    """,
}
