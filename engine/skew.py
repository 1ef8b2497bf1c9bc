"""Skew mitigation utilities (100 TB posture, SURVEY §7 risk register).

Where each tool actually applies — measured, not assumed (bench.py
``_skew_ablation`` at sf0.1, 99%-hot-key fact side):

* Join skew: ``salted_join`` cut the ablation's hot-key join from
  6.2 s to 3.7 s. AQE's skew-join splitter is nominally the default
  fix, but the ablation caught it NOT firing (its DEBUG logs report
  "0 skewed partitions" even with the detection thresholds floored —
  the rule runs before child-stage map stats exist in this build), so
  the engine treats the splitter as best-effort and salting as the
  deterministic path — also required for the shapes the splitter
  can't touch by design (bucketed joins, stream-static joins).
* Aggregation skew: for ALGEBRAIC aggs (sum/count/min/max) Catalyst's
  partial-aggregation stage already collapses the hot key map-side —
  the ablation measures direct groupBy-sum at 0.57 s vs 0.90 s through
  ``salted_agg``'s extra shuffle. ``salted_agg`` therefore targets only
  the NON-algebraic residue (collect_list-class buffers, pandas UDAFs)
  where no partial merge exists; for the algebraic funcs it supports it
  is exactly equivalent to direct aggregation (property-tested), which
  is what makes it safe to reach for at all.

``salted_agg`` implements the classic two-phase aggregation: salt the
key into N sub-keys (map-side spread), partially aggregate, then merge
partials per original key.

For a catalog of supported merges the helper takes (col, func) pairs
with func ∈ {sum, count, min, max}: count merges via sum of partial
counts; the rest merge with themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output-column → (input-column, func-name). Example::

        salted_agg(li, "l_returnflag",
                   {"sum_qty": ("l_quantity", "sum"), "n": ("*", "count")})

    Phase 1 groups on (key, salt) — the hot key spreads over
    ``n_salts`` reducers; phase 2 merges the tiny partials per key.
    """
    for func_name in (f for _, f in aggs.values()):
        if func_name not in _MERGE:
            raise ValueError(f"unsupported agg func: {func_name}")

    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(key, "_salt").agg(
        *[
            _PARTIAL[func]( col if col != "*" else "_salt").alias(f"_p_{out}")
            for out, (col, func) in aggs.items()
        ]
    )
    return partial.groupBy(key).agg(
        *[
            _MERGE[func](f"_p_{out}").alias(out)
            for out, (col, func) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    For the case AQE's skew split can't fix — one pathological key on
    a big⋈medium join where the medium side exceeds the broadcast
    threshold. The big side gets a random salt ∈ [0, n_salts); the
    small side is replicated n_salts× (explode over the salt range);
    the join runs on (key, salt), spreading the hot key's rows over
    ``n_salts`` reducers. Row-for-row equivalent to ``big.join(small,
    key, how)`` for inner/left joins; shuffle volume of the small side
    grows n_salts× — size n_salts to the observed skew ratio, not
    higher.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (salting the right side)")
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    salted_big = big.withColumn("_salt", (F.rand(seed=43) * n_salts).cast("int"))
    replicated = small.select("*", salts)
    return salted_big.join(replicated, [key, "_salt"], how).drop("_salt")


def grouped_topk(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    salt_col,
    k: int,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe grouped top-K: the two-phase salted window behind
    q115's per-source quota cap, factored out because any "keep the
    best K per group" rule hits the same wall — a single hot group
    funnels the whole window into one task.

    Phase 1 ranks within (group, salt) shards — ``salt_col`` must be a
    deterministic per-row expression (hash a unique id) so reruns
    shard identically — and keeps each shard's top K; phase 2 re-ranks
    the ≤ K·n_salts survivors per group. ``order_cols`` must be a
    TOTAL order (break ties on a unique column) or phase-1 shard
    boundaries could cut a tie group arbitrarily. Containment law
    (group top-K ⊆ union of shard top-Ks under a total order) is
    property-tested in tests/test_properties.py; Spark-level equality
    with the single-window plan is asserted in the bench ablation and
    the planted q115 test.

    Output = input columns + ``grp_rank`` (1-based within group).
    """
    from pyspark.sql.window import Window

    salted = df.withColumn("_salt", F.pmod(salt_col, F.lit(n_salts)))
    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    survivors = (
        salted.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return survivors.withColumn("grp_rank", F.row_number().over(w2)).filter(
        F.col("grp_rank") <= k
    )
