"""Dedup / text-analysis invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.session import table
from engine.text import (
    N_MINHASH,
    minhash_signatures,
    q52_ngram_jaccard,
    q54_minhash_candidates,
    q55_simhash,
    q57_quality_score,
)


def test_minhash_identical_docs_share_signature(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(20)
    dup = d.withColumn("doc_id", F.col("doc_id") + 1_000_000)  # same text, new ids
    sigs = minhash_signatures(d.unionByName(dup))
    a = {(r.doc_id, r.seed): r.minhash for r in sigs.filter("doc_id < 1000000").collect()}
    b = {(r.doc_id - 1_000_000, r.seed): r.minhash for r in sigs.filter("doc_id >= 1000000").collect()}
    assert a == b
    assert len(a) == 20 * N_MINHASH


def test_simhash_stable_and_bounded(spark, sf_dir):
    rows = q55_simhash(spark, sf_dir).collect()
    assert all(0 <= r.simhash < (1 << 16) for r in rows)
    again = {r.doc_id: r.simhash for r in q55_simhash(spark, sf_dir).collect()}
    assert {r.doc_id: r.simhash for r in rows} == again


def test_minhash_candidates_estimate_tracks_true_jaccard(spark, sf_dir):
    true = {(r.doc_a, r.doc_b): r.jaccard for r in q52_ngram_jaccard(spark, sf_dir).collect()}
    est = {(r.doc_a, r.doc_b): r.est_jaccard for r in q54_minhash_candidates(spark, sf_dir).collect()}
    # banding with 8 sigs is coarse; require candidates to be plausible:
    # every candidate with est >= 0.5 should have true jaccard >= 0.1
    strong = {p for p, e in est.items() if e >= 0.5}
    for p in strong:
        assert true.get(p, 0.0) >= 0.1, p


def test_quality_score_bounds(spark, sf_dir):
    rows = q57_quality_score(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.quality <= 1.0
        assert 0.0 < r.distinct_ratio <= 1.0
        assert r.bucket in ("high", "mid", "low")


def test_connected_components_known_graph(spark):
    from engine.text import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)],
        "src bigint, dst bigint",
    )
    comps = {r.doc_id: r.component for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_minhash_lsh_candidate_recall(spark, sf_dir):
    """q54's banded candidates must recall (almost) every true
    near-dup pair: measured 28/28 pairs with exact jaccard >= 0.5
    found at sf0.001 (floor 0.85 for seed robustness). This is the
    guarantee that makes q52's candidate-restricted verification
    sound."""
    from engine.text import _with_shingles, q54_minhash_candidates
    from engine.session import table
    from collections import defaultdict

    docs = defaultdict(set)
    for r in _with_shingles(table(spark, sf_dir, "documents")).collect():
        docs[r.doc_id].add(r.shingle)
    ids = sorted(docs)
    exact = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(docs[a] & docs[b])
            if inter and inter / len(docs[a] | docs[b]) >= 0.5:
                exact.add((a, b))
    cand = {(r.doc_a, r.doc_b) for r in q54_minhash_candidates(spark, sf_dir).collect()}
    assert exact, "fixture should contain planted near-dups"
    assert len(exact & cand) / len(exact) >= 0.85


def test_paragraph_dedup_global_invariants(spark, sf_dir):
    """Every distinct chunk survives exactly once across the corpus,
    and the first document (lowest doc_id) keeps all its chunks."""
    from pyspark.sql import functions as F

    from engine.session import table
    from engine.text import CHUNK_TOKENS, q97_paragraph_dedup

    out = q97_paragraph_dedup(spark, sf_dir)
    kept_total = out.agg(F.sum("n_kept")).collect()[0][0]

    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " +")
    distinct_chunks = (
        d.select("doc_id", toks.alias("t"))
        .select(
            F.explode(
                F.expr(
                    f"transform(sequence(0, cast(ceil(size(t) / {CHUNK_TOKENS}.0) as int) - 1),"
                    f" i -> concat_ws(' ', slice(t, i * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS})))"
                )
            ).alias("chunk")
        )
        .distinct()
        .count()
    )
    assert kept_total == distinct_chunks
    first = out.orderBy("doc_id").first()
    assert first.n_kept == first.n_chunks
