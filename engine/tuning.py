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

``tune_successive_halving`` adds the ADAPTIVE search the grid lacks:
random config draws + halving rungs, allocating budget by
intermediate validation scores (TPE's defining trait re-expressed as
a resource-allocation schedule, fully seeded).
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


def tune_successive_halving(
    train: DataFrame,
    n_configs: int = 5,
    fractions: tuple[float, ...] = (0.25, 1.0),
    depth_range: tuple[int, int] = (2, 8),
    trees_range: tuple[int, int] = (8, 18),
    seed: int = SEED,
):
    """M8 adaptive alternate: randomly-sampled configs + successive
    halving — budget flows to promising configs based on intermediate
    results, the adaptive character of the reference's TPE search
    (main.py:388-401; ranges main.py:404-406) that a static grid
    lacks. Fully seeded (config draw, subsamples, fits, split).

    Rung r trains the surviving configs on ``fractions[r]`` of the
    training split and keeps the top half by validation macro-F1;
    the final rung trains survivors on the full split. Each fit is an
    ordinary distributed MLlib fit; the driver only orchestrates
    O(log n_configs) rungs — same control-plane shape as TPE's
    sequential trials, but each trial is cluster-parallel.

    Returns (best_model, best_config, history) where history rows are
    (rung, max_depth, num_trees, fraction, val_f1, survived).

    Default rung budgets are sized so the demo query fits a
    correctness-gate wall-time (measured 18.7 s → 10.9 s at sf0.01 for
    6→5 configs / 0.3→0.25 first rung / trees 10-30→8-18, warm
    splits) — the halving STRUCTURE, not the budget, is the operator
    under test; a real search passes bigger n_configs/trees_range.
    """
    import random as _random

    rng = _random.Random(seed)
    configs = [
        {
            "maxDepth": rng.randint(depth_range[0], depth_range[1]),
            "numTrees": rng.randint(trees_range[0], trees_range[1]),
        }
        for _ in range(n_configs)
    ]
    fit_df, val_df = train.randomSplit([0.85, 0.15], seed=seed)
    fit_df, val_df = fit_df.cache(), val_df.cache()
    evaluator = MulticlassClassificationEvaluator(
        metricName="f1", labelCol="label", predictionCol="prediction"
    )

    history: list[tuple] = []
    best_model = None
    survivors = list(range(len(configs)))
    for rung, frac in enumerate(fractions):
        # NB: fraction must be passed by KEYWORD — a positional float
        # binds to withReplacement and the seed is silently ignored
        # (non-deterministic sampling)
        sample = (
            fit_df
            if frac >= 1.0
            else fit_df.sample(fraction=frac, seed=seed + rung).cache()
        )
        scored = []
        for i in survivors:
            c = configs[i]
            model = RandomForestClassifier(
                numTrees=c["numTrees"], maxDepth=c["maxDepth"], seed=seed,
                featuresCol="features", labelCol="label",
            ).fit(sample)
            f1 = float(evaluator.evaluate(model.transform(val_df)))
            scored.append((f1, i, model))
        # deterministic keep: top half by (f1, config index)
        scored.sort(key=lambda t: (-t[0], t[1]))
        keep = max(len(scored) // 2, 1) if rung < len(fractions) - 1 else 1
        kept = {i for _f, i, _m in scored[:keep]}
        for f1, i, model in scored:
            history.append(
                (rung, configs[i]["maxDepth"], configs[i]["numTrees"], frac, round(f1, 6), i in kept)
            )
        survivors = [i for _f, i, _m in scored[:keep]]
        best_model = scored[0][2]
        if frac < 1.0:
            sample.unpersist()
    fit_df.unpersist()
    val_df.unpersist()
    return best_model, configs[survivors[0]], history


def ml_adaptive_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query for the successive-halving search: the full rung
    history (rows-only check — model fits aren't SQL-expressible)."""
    train, _test, *_ = prepare_splits(spark, sf_dir)
    _best, _cfg, history = tune_successive_halving(train)
    return spark.createDataFrame(
        history,
        "rung int, max_depth int, num_trees int, fraction double, val_f1 double, survived boolean",
    )


QUERIES = {
    "ml_tuning_results": ml_tuning_results,
    "ml_adaptive_tuning": ml_adaptive_tuning,
}
ORACLE: dict[str, str] = {}
