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
