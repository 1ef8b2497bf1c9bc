"""Balanced-sampling invariants (reference main.py:157-189 inline checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine.sampling import balanced_sample, train_test_split
from engine.session import table


def test_balanced_sample_equalizes_classes(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    min_count = e.groupBy("label").count().agg(F.min("count")).first()[0]
    sampled = balanced_sample(e, "label", "vec_id")
    counts = {r["label"]: r["count"] for r in sampled.groupBy("label").count().collect()}
    assert set(counts.values()) == {min_count}
    assert len(counts) == e.select("label").distinct().count()


def test_balanced_sample_deterministic(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    a = sorted(r.vec_id for r in balanced_sample(e, "label", "vec_id").collect())
    b = sorted(r.vec_id for r in balanced_sample(e, "label", "vec_id").collect())
    assert a == b


def test_split_is_partition(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    train, test = train_test_split(e, 0.15, 42)
    n_train, n_test, n = train.count(), test.count(), e.count()
    assert n_train + n_test == n
    assert 0.05 < n_test / n < 0.30  # stochastic but seeded
    # disjoint
    assert train.join(test, "vec_id", "inner").count() == 0
