"""Skew mitigation utilities (100 TB posture, SURVEY §7 risk register).

AQE's skew-join splitting handles join-side skew automatically; this
module covers the remaining case — *aggregation* skew, where one hot
group overwhelms a reducer. ``salted_agg`` implements the classic
two-phase aggregation: salt the key into N sub-keys (map-side spread),
partially aggregate, then merge partials per original key. For
algebraic aggregates (sum/count/min/max) this is exactly equivalent to
the direct aggregation.

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
