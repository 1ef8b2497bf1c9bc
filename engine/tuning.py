"""Hyperparameter tuning (SURVEY.md §2.4 M8, main.py:388-406).

The reference declares TPE search (hyperopt, max_evals=4) over
``max_depth ∈ {2..7}`` scored by macro-F1 on the validation split.
Idiomatic Spark substitution (SURVEY §2.4 M8): a
``TrainValidationSplit`` — a single held-out split exactly like the
reference's Train/Validation layout — over a small param grid, scored
by ``MulticlassClassificationEvaluator(metricName='f1')``.

Scale posture: each grid point trains distributed; ``parallelism``
fits several models concurrently — the cluster-native analogue of
TPE's sequential trials.
"""

from __future__ import annotations

from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit
from pyspark.sql import DataFrame, SparkSession

from .pipeline import SEED, prepare_splits


def tune_random_forest(
    train: DataFrame,
    max_depths: list[int] = (2, 4, 6, 7),
    num_trees: int = 20,
    train_ratio: float = 0.85,
):
    """M8: grid of max_evals-sized depth candidates (reference tuned
    ranges main.py:404-406), single validation split, macro-F1."""
    rf = RandomForestClassifier(
        numTrees=num_trees, seed=SEED, featuresCol="features", labelCol="label"
    )
    grid = ParamGridBuilder().addGrid(rf.maxDepth, list(max_depths)).build()
    tvs = TrainValidationSplit(
        estimator=rf,
        estimatorParamMaps=grid,
        evaluator=MulticlassClassificationEvaluator(
            metricName="f1", labelCol="label", predictionCol="prediction"
        ),
        trainRatio=train_ratio,
        parallelism=4,
        seed=SEED,
    )
    return tvs.fit(train)


def ml_tuning_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: (max_depth, val_f1) per grid point + best flag."""
    train, _test, *_ = prepare_splits(spark, sf_dir)
    model = tune_random_forest(train)
    best_depth = model.bestModel.getMaxDepth()
    rows = [
        (int(pm[next(iter(pm))]), round(float(metric), 6), int(pm[next(iter(pm))]) == best_depth)
        for pm, metric in zip(model.getEstimatorParamMaps(), model.validationMetrics)
    ]
    return spark.createDataFrame(rows, "max_depth int, val_f1 double, is_best boolean")


QUERIES = {"ml_tuning_results": ml_tuning_results}
ORACLE: dict[str, str] = {}
