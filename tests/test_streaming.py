"""Streaming batch-equivalence (SURVEY §7 phase 6): the real
readStream→writeStream run must equal the batch twin exactly."""

from __future__ import annotations

from engine.session import load_events
from engine.streaming import run_stream_demo, session_counts, tumbling_counts


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_stream_equals_batch(spark, sf_dir, tmp_path):
    streamed = run_stream_demo(spark, sf_dir, str(tmp_path))
    batch = tumbling_counts(load_events(spark, sf_dir))
    assert _as_set(streamed) == _as_set(batch)


def test_sessions_merge_within_gap(spark, sf_dir):
    events = load_events(spark, sf_dir)
    wide = session_counts(events, "365 days")
    # with a gap longer than the fixture span, each user has ONE session
    per_user = wide.groupBy("user_id").count().collect()
    assert all(r["count"] == 1 for r in per_user)
    total = sum(r.n_events for r in wide.collect())
    assert total == events.count()


def test_stateful_operator_final_counts(spark, sf_dir, tmp_path):
    from engine.streaming import run_stateful_demo

    final = run_stateful_demo(spark, sf_dir, str(tmp_path / "stateful"))
    events = load_events(spark, sf_dir)
    expected = {
        (r.user_id, r["count"]) for r in events.groupBy("user_id").count().collect()
    }
    got = {(r.user_id, r.n_events) for r in final.collect()}
    assert got == expected


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    from engine.streaming import run_foreach_batch_demo

    out = run_foreach_batch_demo(spark, sf_dir, str(tmp_path / "fb"))
    batch = tumbling_counts(load_events(spark, sf_dir))
    # single availableNow batch over static input → sink equals batch twin
    assert _as_set(out) == _as_set(batch)


def test_watermark_drops_late_data(spark, tmp_path):
    """Two availableNow runs over a shared checkpoint: run 1 advances
    the event-time watermark; run 2 appends events far older than the
    watermark, which the stateful aggregation must DROP (the late-data
    semantics a single static replay can never exercise)."""
    import os

    from pyspark.sql import functions as F

    stage_in = str(tmp_path / "in")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage_in)

    def run_once():
        stream = (
            spark.readStream.schema("event_id bigint, ts timestamp, value double")
            .parquet(stage_in)
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: fresh events on Jan 20-21 -> watermark advances to ~Jan 21
    recent = spark.createDataFrame(
        [(i, f"2024-01-2{i % 2} 12:00:00", 1.0) for i in range(10)],
        "event_id bigint, ts string, value double",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    recent.write.mode("append").parquet(stage_in)
    run_once()

    # run 2: events on Jan 01 — weeks behind the watermark -> dropped
    late = spark.createDataFrame(
        [(100 + i, "2024-01-01 12:00:00", 1.0) for i in range(5)],
        "event_id bigint, ts string, value double",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    late.write.mode("append").parquet(stage_in)
    run_once()

    out = spark.read.parquet(sink)
    # If the late rows had entered state, their window (end << watermark)
    # would have been emitted at the end of run 2 — its absence IS the drop.
    jan1 = out.filter(F.col("ws") == F.lit("2024-01-01 00:00:00").cast("timestamp"))
    assert jan1.count() == 0
    # append mode emits only windows the watermark has passed: the
    # Jan-20 window (5 events); Jan-21 is still held in state
    rows = {(str(r.ws), r.n) for r in out.collect()}
    assert rows == {("2024-01-20 00:00:00", 5)}


def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    from engine.session import load_events
    from engine.streaming import click_to_purchase, run_stream_join_demo

    streamed = run_stream_join_demo(spark, sf_dir, str(tmp_path / "ssj"))
    e = load_events(spark, sf_dir)
    batch = click_to_purchase(
        e.filter(e.event_type == "click"), e.filter(e.event_type == "purchase")
    )
    assert _as_set(streamed) == _as_set(batch)
    assert streamed.count() > 0


def test_stream_static_enrichment(spark, sf_dir, tmp_path):
    import os

    from pyspark.sql import functions as F

    from engine.session import load_events, table
    from engine.streaming import enrich_stream_with_dim

    batch = load_events(spark, sf_dir)
    stage_in = str(tmp_path / "enrich_in")
    batch.write.mode("overwrite").parquet(stage_in)
    dim = table(spark, sf_dir, "customer")

    stream = spark.readStream.schema(batch.schema).parquet(stage_in)
    name = "stream_enrich_out"
    q = (
        enrich_stream_with_dim(stream, dim)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table(name)
    want = enrich_stream_with_dim(batch, dim)
    assert _as_set(got) == _as_set(want)
    assert got.count() > 0


def test_doc_ingest_stream_equals_batch(spark, sf_dir, tmp_path):
    """Streaming LLM-data ingest (fingerprint dedup within watermark ->
    quality gate -> census) must equal the batch twin: every census
    input (quality, token count, content-ID'd lang) derives from the
    normalized text, so the aggregate is keeper-invariant, and dup
    groups are co-timed (ts from fingerprint) so the watermark always
    covers them — the only degrees of freedom left are the
    dedup/watermark mechanics under test."""
    from engine.streaming import doc_pipeline_batch, run_doc_stream_demo

    got = {
        r.lang: (r.n_docs, r.token_budget)
        for r in run_doc_stream_demo(spark, sf_dir, str(tmp_path)).collect()
    }
    want = {
        r.lang: (r.n_docs, r.token_budget)
        for r in doc_pipeline_batch(spark, sf_dir).collect()
    }
    assert got == want
    assert sum(n for n, _ in want.values()) > 0


def test_doc_ingest_invariant_under_cross_label_dups(spark, tmp_path):
    """Regression for the r2 advisory: fingerprint-duplicate groups
    whose members carry DIFFERENT fixture lang labels and far-apart
    doc_ids (previously: far-apart event times, exceeding the dedup
    watermark) must still census identically in stream and batch.
    Builds a synthetic documents table where every dup group spans two
    labels and a doc_id gap of 50k (≈14h under the old doc_id-based
    ts), then checks twin equality and that each group counts once."""
    from pyspark.sql import Row

    from engine.streaming import doc_pipeline_batch, run_doc_stream_demo

    texts = [  # long enough to clear the quality gate (>=0.5)
        "the cat " + " ".join(f"en{i}" for i in range(120)),
        "der hund und " + " ".join(f"de{i}" for i in range(120)),
        "el perro la " + " ".join(f"es{i}" for i in range(120)),
    ]
    rows = []
    for i, t in enumerate(texts):
        # two copies per group: different labels, doc_ids 50_000 apart
        rows.append(Row(doc_id=i, lang="en", text=t))
        rows.append(Row(doc_id=i + 50_000, lang="zh", text="  " + t.upper() + "  "))
        # .upper()+pad normalizes to the same norm → same fingerprint
    # and one short doc the quality gate must drop (not double-drop)
    rows.append(Row(doc_id=90_000, lang="fr", text=" ".join(["le chat les chiens"] * 8)))
    sf_dir = str(tmp_path / "synth")
    spark.createDataFrame(rows).write.parquet(sf_dir + "/documents.parquet")

    batch = doc_pipeline_batch(spark, sf_dir)
    streamed = run_doc_stream_demo(spark, sf_dir, str(tmp_path / "run"))
    got = {r.lang: (r.n_docs, r.token_budget) for r in streamed.collect()}
    want = {r.lang: (r.n_docs, r.token_budget) for r in batch.collect()}
    assert got == want
    # 4 distinct norms survive dedup, the gate drops the short one →
    # exactly one census row per surviving group, never two
    assert sum(n for n, _ in want.values()) == 3


def test_doc_dedup_state_survives_across_micro_batches(spark, tmp_path):
    """Cross-batch dedup state: a duplicate arriving in a LATER
    micro-batch (same fingerprint, within the watermark window) must
    be dropped by state carried in the checkpoint — the property a
    single availableNow replay never exercises."""
    import os

    from pyspark.sql import functions as F

    stage_in = str(tmp_path / "in")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(stage_in)
    schema = "doc_id bigint, fingerprint string, ts timestamp"

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .parquet(stage_in)
            .withWatermark("ts", "1 hour")
            .dropDuplicatesWithinWatermark(["fingerprint"])
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def batch(rows):
        spark.createDataFrame(
            rows, "doc_id bigint, fingerprint string, ts_s string"
        ).select(
            "doc_id", "fingerprint", F.col("ts_s").cast("timestamp").alias("ts")
        ).write.mode("append").parquet(stage_in)

    # batch 1: three unique docs at 12:00
    batch([(1, "fp_a", "2024-01-20 12:00:00"),
           (2, "fp_b", "2024-01-20 12:00:00"),
           (3, "fp_c", "2024-01-20 12:00:00")])
    run_once()
    # batch 2 (same checkpoint): a dup of fp_a 10 min later (inside
    # the 1h window -> must be DROPPED by carried state) and one new doc
    batch([(4, "fp_a", "2024-01-20 12:10:00"),
           (5, "fp_d", "2024-01-20 12:10:00")])
    run_once()

    out = spark.read.parquet(sink)
    kept = {r.doc_id for r in out.collect()}
    assert kept == {1, 2, 3, 5}, kept
    assert out.filter(F.col("fingerprint") == "fp_a").count() == 1


def test_stream_decontaminate_equals_batch_and_q48(spark, sf_dir, tmp_path):
    """The stateless row-wise scrub must produce identical rows from a
    real readStream (append mode, no watermark) and from batch — and
    both must equal the broadcast-semi-join batch scrub q48 (same
    distinct-shingle hit semantics, different physical plan)."""
    from engine.streaming import q74b_stream_decontaminate, run_decontaminate_stream_demo
    from engine.text import q48_decontaminate

    streamed = sorted(
        map(tuple, run_decontaminate_stream_demo(spark, sf_dir, str(tmp_path)).collect())
    )
    batch = sorted(map(tuple, q74b_stream_decontaminate(spark, sf_dir).collect()))
    q48 = sorted(map(tuple, q48_decontaminate(spark, sf_dir).collect()))
    assert streamed == batch
    assert batch == q48


def test_streaming_heavy_hitters_state_across_batches(spark, sf_dir, tmp_path):
    """MG summary as streaming state: a real 2-micro-batch readStream
    run must (a) actually fold across batches through state (final
    version >= 2 on some shard), (b) end with per-shard counters that
    equal the exact per-shard token counts (fixture vocab is far under
    capacity, so MG never prunes -> summaries are exact), and (c)
    after the exact recount, reproduce q67b's batch top-k exactly."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from engine.session import table
    from engine.streaming import run_hh_stream_demo
    from engine.text import HH_SHARDS, HH_TOPK, q67b_heavy_hitters

    final = run_hh_stream_demo(spark, sf_dir, str(tmp_path / "hh")).collect()
    assert max(r.ver for r in final) >= 2, "state never crossed a micro-batch"
    got = {(r.shard, r.tok): r.lb for r in final}

    toks = (
        table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))
        .withColumn("shard", F.pmod(F.xxhash64("tok"), F.lit(HH_SHARDS)))
    )
    exact = {
        (r.shard, r.tok): r["count"]
        for r in toks.groupBy("shard", "tok").count().collect()
    }
    assert got == exact

    # recount + top-k over the streamed candidates == the batch answer
    cand = sorted({tok for (_, tok) in got})
    recount = (
        toks.filter(F.col("tok").isin(cand))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(HH_TOPK)
        .collect()
    )
    want = [(r.tok, r.n_occurrences) for r in q67b_heavy_hitters(spark, sf_dir).collect()]
    assert [(r.tok, r.n) for r in recount] == want


def test_stream_equivalence_report_all_equal(spark, sf_dir):
    """The driver-visible stream ≡ batch surface: every covered
    operator's real readStream run must equal its batch twin exactly
    (multiset equality, bit-exact floats — same expressions over the
    same rows on both sides)."""
    from engine.streaming import stream_equivalence_report

    rows = stream_equivalence_report(spark, sf_dir).collect()
    assert {r.operator for r in rows} == {
        "tumbling_watermark_agg",
        "stream_stream_interval_join",
        "rowwise_decontaminate",
        "dedup_quality_census",
        "incremental_neardup",
    }
    for r in rows:
        assert r.equal, (r.operator, r.batch_rows, r.stream_rows)
        assert r.batch_rows == r.stream_rows > 0


def test_neardup_stream_equals_batch(spark, sf_dir, tmp_path):
    """q118's streaming twin (r7 verdict item 5): the two-query
    readStream run — stateless stream-static band-store probe +
    band-keyed applyInPandasWithState within-batch probe — must equal
    the batch probe row-for-row, including the keep-first evidence
    ids and the history-beats-batch status precedence."""
    from engine.streaming import run_neardup_stream_demo
    from engine.text import q118_incremental_neardup

    s = [tuple(r) for r in run_neardup_stream_demo(spark, sf_dir, str(tmp_path)).collect()]
    b = [tuple(r) for r in q118_incremental_neardup(spark, sf_dir).collect()]
    assert s == b and len(s) > 0
    assert {r[1] for r in s} >= {"new"}


def test_neardup_state_pairs_across_micro_batches(spark, tmp_path):
    """The within-batch leg must pair ACROSS micro-batches through
    state, not just within one Arrow group: four planted docs in one
    band — two per staged file — all near-identical; the last doc's
    keep-first match is the FIRST doc, which only state can deliver
    (they never share a micro-batch)."""
    import os

    from pyspark.sql import functions as F

    from engine.streaming import streaming_neardup_state
    from engine.text import N_MINHASH

    sig = list(range(N_MINHASH))
    rows = [(i, sig, 42) for i in (10, 11, 20, 21)]
    df = spark.createDataFrame(
        rows, "doc_id bigint, sig array<bigint>, band_key bigint"
    )
    stage = str(tmp_path / "in")
    df.filter("doc_id < 15").coalesce(1).write.mode("overwrite").parquet(stage)
    df.filter("doc_id >= 15").coalesce(1).write.mode("append").parquet(stage)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    q = (
        streaming_neardup_state(stream)
        .writeStream.format("memory")
        .queryName("nd_cross_batch")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pairs = {
        (r.doc_id, r.match_id)
        for r in spark.table("nd_cross_batch").collect()
    }
    # every later-vs-earlier pair, including the cross-file ones
    assert pairs == {(11, 10), (20, 10), (20, 11), (21, 10), (21, 11), (21, 20)}
    best = {d: min(m for dd, m in pairs if dd == d) for d in (11, 20, 21)}
    assert best == {11: 10, 20: 10, 21: 10}
