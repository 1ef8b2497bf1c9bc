"""Similarity-search invariants: brute-force is ground truth; LSH variants
are subsets/approximations of it."""

from __future__ import annotations

from engine.similarity import TOP_K, q60_knn_brute, q61_knn_lsh_bucketed, q62_brp_lsh_join


def test_brute_force_shape_and_ordering(spark, sf_dir):
    rows = q60_knn_brute(spark, sf_dir).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        assert len(rs) == TOP_K
        rs = sorted(rs, key=lambda r: r.rank)
        sims = [r.cosine for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r.vec_id != qid for r in rs)
        assert all(-1.000001 <= s <= 1.000001 for s in sims)


def test_lsh_results_subset_of_bucket(spark, sf_dir):
    brute = {(r.query_id, r.vec_id): r.cosine for r in q60_knn_brute(spark, sf_dir).collect()}
    lsh = q61_knn_lsh_bucketed(spark, sf_dir).collect()
    # LSH cosine values must agree with brute-force where pairs overlap
    for r in lsh:
        if (r.query_id, r.vec_id) in brute:
            assert abs(brute[(r.query_id, r.vec_id)] - r.cosine) < 1e-9


def test_brp_lsh_pairs_canonical(spark, sf_dir):
    rows = q62_brp_lsh_join(spark, sf_dir).collect()
    assert all(r.vec_a < r.vec_b for r in rows)
    assert all(r.euclidean_dist >= 0 for r in rows)


def _topk_pairs(df):
    return {(r.query_id, r.vec_id) for r in df.collect()}


def test_multiprobe_lsh_recall_floor(spark, sf_dir):
    # single-bucket probing measured 0.02 recall on this fixture
    # (neighbors at cosine ~0.3); Hamming<=2 multi-probe measured 0.38.
    # Floor at 0.25 so the knob can't silently regress.
    from engine.similarity import q60_knn_brute, q61_knn_lsh_bucketed

    brute = _topk_pairs(q60_knn_brute(spark, sf_dir))
    lsh = _topk_pairs(q61_knn_lsh_bucketed(spark, sf_dir))
    assert len(brute & lsh) / len(brute) >= 0.25


def test_ivf_recall_floor(spark, sf_dir):
    # measured 0.72 at nprobe=6 (0.58 at 4, 0.80 at 8); floor 0.5
    from engine.similarity import q60_knn_brute, q65_knn_ivf

    brute = _topk_pairs(q60_knn_brute(spark, sf_dir))
    ivf = _topk_pairs(q65_knn_ivf(spark, sf_dir))
    assert len(brute & ivf) / len(brute) >= 0.5


def _lsh_candidate_count(spark, sf_dir, n_planes):
    # the exact candidate-generation join q66 runs, without the top-20
    from pyspark.sql import functions as F

    from engine.similarity import _bucket, _corpus_normed, _probe_masks

    corpus = _corpus_normed(spark, sf_dir).withColumn(
        "bucket", F.expr(_bucket("emb", n_planes)).cast("int")
    )
    probes = corpus.select(
        F.col("vec_id").alias("vec_a"),
        F.explode(F.array(*[F.lit(m) for m in _probe_masks(n_planes)])).alias("mask"),
        "bucket",
    ).select("vec_a", F.expr("int(bucket ^ mask)").alias("probe_bucket"))
    return probes.join(
        corpus, (F.col("probe_bucket") == F.col("bucket")) & (F.col("vec_a") < F.col("vec_id"))
    ).count()


def test_bucket_occupancy_bounded_and_scales_with_planes(spark, sf_dir):
    # The within-bucket join output is quadratic in bucket occupancy, so
    # n_planes must be able to grow with corpus size (VERDICT r2's one
    # scale-killer). Pin both properties: candidates stay ~linear in N
    # at the fixture default (measured 36.4/doc at sf0.001), and adding
    # planes SHRINKS the candidate set (measured 7.5x from 8 -> 12 bits).
    from engine.session import table

    n = table(spark, sf_dir, "embeddings").count()
    c8 = _lsh_candidate_count(spark, sf_dir, 8)
    c12 = _lsh_candidate_count(spark, sf_dir, 12)
    assert c8 < 60 * n, f"8-bit candidate set superlinear: {c8} pairs for N={n}"
    assert c12 < c8 / 3, f"wider bucket space did not shrink candidates: {c12} vs {c8}"


def test_q66_n_planes_parameter_threads_through(spark, sf_dir):
    # q66 at 12 planes must still emit canonical, correctly-scored pairs
    # (recall drops by design; correctness of what IS returned must not)
    from engine.similarity import q66_embedding_near_dup

    base = {(r.vec_a, r.vec_b): r.cosine for r in q66_embedding_near_dup(spark, sf_dir).collect()}
    wide = q66_embedding_near_dup(spark, sf_dir, n_planes=12).collect()
    assert len(wide) == 20
    for r in wide:
        assert r.vec_a < r.vec_b
        if (r.vec_a, r.vec_b) in base:
            assert abs(base[(r.vec_a, r.vec_b)] - r.cosine) < 1e-9


def test_embedding_near_dup_recall_floor(spark, sf_dir):
    # exact top-20 cosine pairs vs q66's multi-probe LSH top-20:
    # measured 0.55 (single-bucket was 0.05); floor 0.4
    import numpy as np

    from engine.session import table
    from engine.similarity import q66_embedding_near_dup

    rows = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    E = np.array([r.embedding for r in rows], dtype=float)
    norms = np.linalg.norm(E, axis=1)
    S = (E @ E.T) / np.outer(norms, norms)
    iu = np.triu_indices(len(ids), 1)
    sims = S[iu]
    order = np.argsort(-sims)[:20]
    exact = {
        (int(min(ids[iu[0][k]], ids[iu[1][k]])), int(max(ids[iu[0][k]], ids[iu[1][k]])))
        for k in order
    }
    got = {(r.vec_a, r.vec_b) for r in q66_embedding_near_dup(spark, sf_dir).collect()}
    assert len(exact & got) / 20 >= 0.4
