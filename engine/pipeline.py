"""The reference ML pipeline, Spark-first (SURVEY.md §2.4 M1–M10, A6–A7).

Reference pipeline (main.py:199-428) re-expressed as pyspark.ml:

    balanced sample (P4) → randomSplit (P5)
      → StandardScaler fit on train (M1, main.py:269-272)
      → PCA(k=dim) fit → explainedVariance → find_n (A6, main.py:289-320)
      → PCA(k) refit (M4, main.py:328-335) → transform ×splits (M2/M5)
      → GaussianNB (M6, main.py:370-380) and RandomForest (M7 — the
        idiomatic stand-in for DaskLGBMClassifier, see SURVEY §2.4 M7:
        same distributed-histogram dataflow, multiclass, no extra deps)
      → MulticlassClassificationEvaluator (A7, main.py:376-380,415-419)
      → inverse-transform of misclassified rows (M9/P3, main.py:443-446)

Scale posture: fits are MLlib's distributed treeAggregate paths (PCA
Gramian, tree histograms); transforms are narrow maps; nothing
materializes to the driver except model params (≤ dim², as in the
reference where fitted state lives on the driver too). The inverse
transform is an Arrow-batched pandas UDF with the (k × dim) component
matrix broadcast — O(rows) distributed, not a driver loop.

Semantic deltas vs the reference (documented, SURVEY §7 risk register):
* MLlib StandardScaler uses ddof=1 std (sklearn: ddof=0) — ~1e-5
  relative at fixture scale.
* DaskLGBMClassifier → RandomForestClassifier default (GBTClassifier
  is binary-only in Spark 4.1.2); fit_gbt_ovr provides the boosted
  OneVsRest alternate for semantic parity with LightGBM's boosting.
* All RNG is seeded (the reference is unseeded).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.classification import NaiveBayes, RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.feature import PCA, StandardScaler
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sampling import balanced_sample, train_test_split
from .session import table

SEED = 42


def assemble(df: DataFrame) -> DataFrame:
    """embeddings(vec_id, embedding: array<float>, label) → MLlib shape:
    features VectorUDT + label double (FIXTURES.md §B mapping)."""
    return df.select(
        "vec_id",
        F.col("label").cast("double").alias("label"),
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )


def find_n(ratios: np.ndarray, tol: float) -> int:
    """A6 (main.py:289-320): smallest k with sum(ratios[:k]) > tol.

    The reference implements this as a hand-rolled bisection returning
    ``high``; cumsum+searchsorted replicates the *semantics* on the
    driver (the array is ≤ feature-dim long — no distribution needed).
    """
    c = np.cumsum(ratios)
    k = int(np.searchsorted(c, tol, side="right") + 1)
    return min(k, len(ratios))


def fit_feature_pipeline(train: DataFrame, tol: float = 0.95):
    """M1 + M3 + A6 + M4: scaler fit, full-width PCA for the variance
    curve, choose k, refit PCA at k (the reference refits — M4)."""
    scaler = StandardScaler(
        withMean=True, withStd=True, inputCol="features", outputCol="scaled"
    ).fit(train)
    scaled = scaler.transform(train)
    dim = len(scaler.mean)
    full_pca = PCA(k=dim, inputCol="scaled", outputCol="pca").fit(scaled)
    ratios = np.array(full_pca.explainedVariance)
    k = find_n(ratios, tol)
    pca = PCA(k=k, inputCol="scaled", outputCol="pca").fit(scaled)
    return scaler, full_pca, pca, k


def transform_features(df: DataFrame, scaler, pca) -> DataFrame:
    """M2 + M5: scaler then PCA projection (narrow maps, no shuffle)."""
    return pca.transform(scaler.transform(df)).select(
        "vec_id", "label", F.col("pca").alias("features")
    )


def prepare_splits(spark: SparkSession, sf_dir: str, tol: float = 0.95):
    """P4 → P5 → M1..M5 end-to-end; returns (train, test, scaler, pca, k)."""
    e = assemble(balanced_sample(table(spark, sf_dir, "embeddings"), "label", "vec_id"))
    train, test = train_test_split(e, 0.15, SEED)
    scaler, _full, pca, k = fit_feature_pipeline(train, tol)
    return transform_features(train, scaler, pca), transform_features(test, scaler, pca), scaler, pca, k


def fit_gaussian_nb(train: DataFrame):
    """M6: Gaussian Naive Bayes baseline (main.py:370-380)."""
    return NaiveBayes(modelType="gaussian", featuresCol="features", labelCol="label").fit(train)


def fit_random_forest(train: DataFrame, num_trees: int = 50, max_depth: int = 8):
    """M7: distributed tree ensemble — the reference's
    DaskLGBMClassifier(max_depth=8, n_estimators=50, tree_learner='data')
    (main.py:411-412) maps to the same distributed-histogram training."""
    return RandomForestClassifier(
        numTrees=num_trees, maxDepth=max_depth, seed=SEED,
        featuresCol="features", labelCol="label",
    ).fit(train)


def fit_gbt_ovr(train: DataFrame, max_iter: int = 10, max_depth: int = 4):
    """M7 alternate: BOOSTED trees for multiclass via one-vs-rest —
    the closest pure-MLlib counterpart to the reference's LightGBM
    semantics (main.py:408-419 is gradient boosting; GBTClassifier is
    binary-only in Spark 4.1.2, so OneVsRest trains one boosted model
    per class — SURVEY §2.4 M7 option (b)).

    Same fit(train) → model.transform interface as the RF default.
    Scale note: K binary fits over the full set — each is the same
    distributed-histogram dataflow, but total work is K× a single
    multiclass forest; the RF default stays the 100 TB choice, this
    exists for semantic parity with boosting."""
    from pyspark.ml.classification import GBTClassifier, OneVsRest

    gbt = GBTClassifier(
        maxIter=max_iter, maxDepth=max_depth, seed=SEED,
        featuresCol="features", labelCol="label",
    )
    return OneVsRest(
        classifier=gbt, featuresCol="features", labelCol="label", parallelism=4
    ).fit(train)


def evaluate(predictions: DataFrame) -> dict[str, float]:
    """A7: accuracy + macro-F1 (main.py:376-380)."""
    out = {}
    for metric in ("accuracy", "f1"):
        out[metric] = MulticlassClassificationEvaluator(
            metricName=metric, labelCol="label", predictionCol="prediction"
        ).evaluate(predictions)
    return out


def inverse_transform(df: DataFrame, scaler, pca) -> DataFrame:
    """M9 (main.py:443-446): scaler⁻¹(pca⁻¹(y)) back to feature space.

    pca⁻¹: y @ pcᵀ ; scaler⁻¹: x·std + mean. Not built into MLlib —
    implemented as one Arrow-batched pandas UDF with the small
    (dim × k) component matrix captured in the closure (broadcast via
    task serialization). Distributed, O(rows)."""
    pc = np.array(pca.pc.toArray())          # (dim, k)
    mean = np.array(scaler.mean.toArray())   # (dim,)
    std = np.array(scaler.std.toArray())     # (dim,)

    @F.pandas_udf("array<double>")
    def _inv(batch: pd.Series) -> pd.Series:
        y = np.vstack(batch.to_numpy())      # (n, k)
        x = y @ pc.T                          # undo PCA projection
        x = x * std + mean                    # undo standardization
        return pd.Series(list(x))

    return df.withColumn("reconstructed", _inv(vector_to_array(F.col("features"))))


def misclassified_slice(predictions: DataFrame, scaler, pca, limit: int = 15) -> DataFrame:
    """P3 + M9: first-k misclassified rows (deterministic order by id),
    inverse-transformed for inspection (main.py:443-454)."""
    wrong = (
        predictions.filter(F.col("prediction") != F.col("label"))
        .orderBy("vec_id")
        .limit(limit)
    )
    return inverse_transform(wrong, scaler, pca).select(
        "vec_id", "label", "prediction", "reconstructed"
    )


def build_pipeline(k: int, classifier: str = "rf", num_trees: int = 20, max_depth: int = 8):
    """The whole reference pipeline as ONE pyspark.ml Pipeline object
    (scaler → PCA(k) → classifier) — fit/transform/persist as a unit
    (the reference pickles each fitted object separately,
    main.py:343-350, 421-423; MLlib persists the composite)."""
    from pyspark.ml import Pipeline

    stages = [
        StandardScaler(withMean=True, withStd=True, inputCol="features", outputCol="scaled"),
        PCA(k=k, inputCol="scaled", outputCol="pca"),
    ]
    if classifier == "rf":
        stages.append(
            RandomForestClassifier(
                numTrees=num_trees, maxDepth=max_depth, seed=SEED,
                featuresCol="pca", labelCol="label",
            )
        )
    else:
        stages.append(NaiveBayes(modelType="gaussian", featuresCol="pca", labelCol="label"))
    return Pipeline(stages=stages)


# ------------------------------------------------------------ driver queries

def ml_explained_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3 + A6 surface: variance ratio per component (rows-only check;
    eigen-solver output is deterministic but not SQL-expressible)."""
    e = assemble(table(spark, sf_dir, "embeddings"))
    scaler = StandardScaler(withMean=True, withStd=True, inputCol="features", outputCol="scaled").fit(e)
    full = PCA(k=len(scaler.mean), inputCol="scaled", outputCol="pca").fit(scaler.transform(e))
    ratios = [float(r) for r in full.explainedVariance]
    return spark.createDataFrame(
        [(i, round(r, 8)) for i, r in enumerate(ratios)], "component int, variance_ratio double"
    )


def ml_nb_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6 end-to-end: sample→split→scale→PCA→GaussianNB→predict test."""
    train, test, *_ = prepare_splits(spark, sf_dir)
    model = fit_gaussian_nb(train)
    return model.transform(test).select("vec_id", "label", "prediction")


def ml_rf_predictions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M7 end-to-end with the RF stand-in (reduced trees at fixture scale)."""
    train, test, *_ = prepare_splits(spark, sf_dir)
    model = fit_random_forest(train, num_trees=20, max_depth=8)
    return model.transform(test).select("vec_id", "label", "prediction")


def ml_model_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/A8: metric comparison frame (main.py:425-428) — model,
    accuracy, macro-F1 for both classifiers."""
    train, test, *_ = prepare_splits(spark, sf_dir)
    train = train.cache()  # three fits share the projected features
    rows = []
    for name, model in (
        ("gaussian_nb", fit_gaussian_nb(train)),
        ("random_forest", fit_random_forest(train, num_trees=20, max_depth=8)),
        ("gbt_ovr", fit_gbt_ovr(train)),
    ):
        m = evaluate(model.transform(test))
        rows.append((name, round(m["accuracy"], 6), round(m["f1"], 6)))
    train.unpersist()
    return spark.createDataFrame(rows, "model string, accuracy double, f1 double")


def ml_misclassified_inverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M9/P3 end-to-end: inverse-transformed misclassified slice."""
    train, test, scaler, pca, _k = prepare_splits(spark, sf_dir)
    preds = fit_gaussian_nb(train).transform(test)
    out = misclassified_slice(preds, scaler, pca)
    return out.select(
        "vec_id", "label", "prediction",
        F.round(F.expr("aggregate(reconstructed, 0D, (a, x) -> a + x * x)"), 4).alias("recon_sq_norm"),
    )


QUERIES = {
    "ml_explained_variance": ml_explained_variance,
    "ml_nb_predictions": ml_nb_predictions,
    "ml_rf_predictions": ml_rf_predictions,
    "ml_model_metrics": ml_model_metrics,
    "ml_misclassified_inverse": ml_misclassified_inverse,
}

# ML fits are not SQL-expressible — rows-only checks (driver contract).
ORACLE: dict[str, str] = {}
