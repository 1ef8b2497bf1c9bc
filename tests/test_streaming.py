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
