"""ML-pipeline invariants (SURVEY.md §5 strategy #2, reference inline checks)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.ml.feature import PCA, StandardScaler
from pyspark.sql import functions as F

from engine.pipeline import (
    assemble,
    evaluate,
    find_n,
    fit_feature_pipeline,
    fit_gaussian_nb,
    fit_random_forest,
    inverse_transform,
    prepare_splits,
)
from engine.session import table


@pytest.fixture(scope="module")
def assembled(spark, sf_dir):
    return assemble(table(spark, sf_dir, "embeddings")).cache()


def test_find_n_matches_brute_force():
    rng = np.random.RandomState(42)
    ratios = rng.dirichlet(np.ones(64))
    ratios = np.sort(ratios)[::-1]
    for tol in (0.95, 0.99):
        brute = next(k for k in range(1, 65) if ratios[:k].sum() > tol)
        assert find_n(ratios, tol) == brute
    assert find_n(np.array([0.5, 0.3, 0.2]), 0.999) == 3  # clamp at dim


def test_scaler_centers_and_scales(spark, assembled):
    scaler = StandardScaler(withMean=True, withStd=True, inputCol="features", outputCol="scaled").fit(
        assembled
    )
    from pyspark.ml.stat import Summarizer

    scaled = scaler.transform(assembled)
    stats = scaled.select(
        Summarizer.mean(F.col("scaled")).alias("m"), Summarizer.variance(F.col("scaled")).alias("v")
    ).first()
    assert np.allclose(np.array(stats.m), 0.0, atol=1e-9)
    assert np.allclose(np.array(stats.v), 1.0, atol=1e-6)


def test_pca_variance_monotone_and_k_choice(spark, assembled):
    scaler, full_pca, pca, k = fit_feature_pipeline(assembled, tol=0.95)
    ratios = np.array(full_pca.explainedVariance)
    assert (np.diff(ratios) <= 1e-12).all()  # non-increasing
    assert ratios[:k].sum() > 0.95
    assert k == find_n(ratios, 0.95)
    assert pca.getK() == k


def test_inverse_transform_roundtrip(spark, assembled):
    # with k = full dim the round-trip must reconstruct exactly
    scaler = StandardScaler(withMean=True, withStd=True, inputCol="features", outputCol="scaled").fit(
        assembled
    )
    scaled = scaler.transform(assembled)
    dim = len(scaler.mean)
    pca = PCA(k=dim, inputCol="scaled", outputCol="pca").fit(scaled)
    projected = (
        pca.transform(scaled)
        .select("vec_id", F.col("features").alias("orig"), F.col("pca").alias("features"))
    )
    recon = inverse_transform(projected, scaler, pca)

    from pyspark.ml.functions import vector_to_array

    err = (
        recon.withColumn("orig_arr", vector_to_array("orig"))
        .select(
            F.expr(
                "aggregate(zip_with(reconstructed, orig_arr, (x, y) -> abs(x - y)),"
                " 0D, (a, v) -> greatest(a, v))"
            ).alias("max_err")
        )
        .agg(F.max("max_err"))
        .first()[0]
    )
    assert err < 1e-6


def test_models_beat_chance_and_ordering(spark, sf_dir):
    from engine.pipeline import fit_gbt_ovr

    train, test, *_ = prepare_splits(spark, sf_dir)
    train = train.cache()
    nb = evaluate(fit_gaussian_nb(train).transform(test))
    rf = evaluate(fit_random_forest(train, num_trees=20, max_depth=8).transform(test))
    gbt = evaluate(fit_gbt_ovr(train).transform(test))
    n_classes = 10
    assert nb["accuracy"] > 1.5 / n_classes  # well above chance
    assert rf["accuracy"] > 1.5 / n_classes
    assert gbt["accuracy"] > 1.5 / n_classes
    # reference ordering claim (main.py:431-433): ensembles >= NB baseline
    assert rf["f1"] >= nb["f1"] - 0.05
    assert gbt["f1"] >= nb["f1"] - 0.05


def test_gbt_ovr_seeded_determinism(spark, sf_dir):
    """Two OVR-GBT fits under the same SEED must predict identically —
    the same determinism contract the tuning grid carries (the OVR
    wrapper trains K seeded binary GBTs; parallelism must not leak
    nondeterminism into the per-class models)."""
    from engine.pipeline import fit_gbt_ovr

    train, test, *_ = prepare_splits(spark, sf_dir)
    train = train.cache()
    a = fit_gbt_ovr(train).transform(test).select("vec_id", "prediction")
    b = fit_gbt_ovr(train).transform(test).select("vec_id", "prediction")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    train.unpersist()


def test_composite_pipeline_persistence(spark, sf_dir, tmp_path):
    """Fit the whole pipeline as one object, save, reload, predictions
    must match exactly (S7/S9 parity at pipeline granularity)."""
    from pyspark.ml import PipelineModel

    from engine.pipeline import build_pipeline
    from engine.session import table

    e = assemble(table(spark, sf_dir, "embeddings"))
    model = build_pipeline(k=8, classifier="nb").fit(e)
    p = str(tmp_path / "pipe")
    model.write().overwrite().save(p)
    back = PipelineModel.load(p)
    a = sorted((r.vec_id, r.prediction) for r in model.transform(e).select("vec_id", "prediction").collect())
    b = sorted((r.vec_id, r.prediction) for r in back.transform(e).select("vec_id", "prediction").collect())
    assert a == b
    assert len(back.stages) == 3


def test_successive_halving_adaptive_tuning(spark, sf_dir):
    """M8 adaptive alternate: budget halves per rung, history is
    complete, and the whole search is deterministic under its seed."""
    from engine.pipeline import assemble
    from engine.session import table
    from engine.tuning import tune_successive_halving

    train = assemble(table(spark, sf_dir, "embeddings"))
    best, cfg, hist = tune_successive_halving(train, n_configs=4, fractions=(0.4, 1.0))
    rung_sizes = {}
    for rung, *_rest in hist:
        rung_sizes[rung] = rung_sizes.get(rung, 0) + 1
    assert rung_sizes == {0: 4, 1: 2}  # halving schedule
    # exactly one final survivor, and it matches the returned config
    finals = [h for h in hist if h[0] == 1 and h[5]]
    assert len(finals) == 1
    assert (finals[0][1], finals[0][2]) == (cfg["maxDepth"], cfg["numTrees"])
    # the fitted best model carries the winning config
    assert best.getMaxDepth() == cfg["maxDepth"]
    assert best.getNumTrees == cfg["numTrees"]
    # deterministic: same seed -> same history
    _b2, cfg2, hist2 = tune_successive_halving(train, n_configs=4, fractions=(0.4, 1.0))
    assert cfg2 == cfg and hist2 == hist
