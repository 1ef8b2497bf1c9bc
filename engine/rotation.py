"""Composite rotation queries — one driver slot re-proves many frozen
single-pass operators.

The driver's correctness gate checks a 50-entry window over a contract
of 150+ queries, so a frozen singleton's latest driver row can go 3+
rounds stale (the r5 verdict's "driver-row debt"). Each composite here
UNION-ALLs several frozen single-pass query shapes into ONE plan with a
``shape`` discriminator column, and its oracle is the UNION ALL of the
very same singleton oracles — so one green driver hash row re-proves
every member's machinery each round, while the singletons keep their
own (unweakened) oracles in the contract for their direct rotation
turns.

Canonical row form: ``(shape string, k string)`` where ``k`` serializes
every column of the member query with engine-portable rules applied
IDENTICALLY on the Spark and DuckDB sides:

* string / int / bigint / boolean → CAST AS string (both engines render
  ``true``/``false`` and decimal digits identically), NULL → ``∅``;
* double → ``floor(x · 10⁴)`` on the bigint grid (the q57/q93 _trunc
  pattern: floor of the identical IEEE product cannot flip between
  engines, unlike decimal-vs-binary rounding), with explicit
  ``nan``/``inf``/``-inf`` legs so ANSI casts never throw;
* date → CAST AS string (ISO in both engines);
* timestamp → ``unix_micros`` / ``epoch_us`` (sessions pin UTC).

The serialization is NOT a weaker check in practice: every member is
hash-green at full float precision in some past round, so a value that
moves off its 1e-4 grid cell (or any key/count/flag change at all)
flips the composite's hash. What the composite buys is arithmetic: 25
singleton slots collapse into 4, bringing max driver-row staleness
back under the window size.

Scale shape: a UNION ALL of narrow single-pass shapes executes each
member exactly as its standalone plan (Catalyst plans each branch
independently; no barrier, no cross-member shuffle) plus one final
column projection — the composite adds no operator a 1000-executor run
would notice.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import relational

NULL_S = "∅"

# (column, kind) per member, in output order. kinds:
#   s string · i int/bigint · b boolean · f double (1e-4 floor grid)
#   d date · t timestamp (unix micros)
_LEGS: dict[str, list[tuple[str, str]]] = {
    "q03_top_orders": [("o_orderkey", "i"), ("o_orderdate", "t"), ("revenue", "f")],
    "q12_window_lag": [("o_custkey", "i"), ("o_orderkey", "i"), ("days_since_prev", "i"), ("days_until_next", "i")],
    "q14_topk_orders": [("o_orderkey", "i"), ("o_custkey", "i"), ("totalprice", "f")],
    "q15_union_all": [("c_custkey", "i"), ("c_mktsegment", "s")],
    "q16_intersect": [("o_custkey", "i")],
    "q17_except": [("o_custkey", "i")],
    "q19_rollup": [("returnflag", "s"), ("linestatus", "s"), ("sum_qty", "f"), ("n", "i")],
    "q20_cube": [("status", "s"), ("priority", "s"), ("n", "i"), ("avg_price", "f")],
    "q21_string_funcs": [("p_partkey", "i"), ("name_lower", "s"), ("brand_num", "s"), ("type_head", "s"), ("brand_type", "s"), ("name_len", "i"), ("name_pfx", "s")],
    "q22_date_funcs": [("month", "t"), ("yr", "i"), ("n_orders", "i"), ("total", "f")],
    "q23_json_funcs": [("event_type", "s"), ("avg_k", "f"), ("sum_value", "f"), ("n", "i")],
    "q24_math_case": [("l_orderkey", "i"), ("l_linenumber", "i"), ("disc_band", "s"), ("sqrt_qty", "f"), ("disc_sq", "f"), ("ln_mod3", "i"), ("qty_ceil", "i"), ("qty_dev", "f")],
    "q27_pivot": [("source", "s"), ("n_de", "i"), ("n_en", "i"), ("n_es", "i"), ("n_fr", "i"), ("n_zh", "i")],
    "q29_map_array_funcs": [("p_partkey", "i"), ("type_tokens_upper", "s"), ("is_promo", "b"), ("name_head2", "s"), ("type_tail", "s"), ("brand_via_map", "s"), ("n_name_tokens", "i")],
    "q32_stat_aggregates": [("l_returnflag", "s"), ("corr_qty_price", "f"), ("covar_s", "f"), ("covar_p", "f"), ("var_disc", "f"), ("stdp_qty", "f")],
    "q33_collect_sorted": [("o_custkey", "i"), ("statuses", "s"), ("priorities", "s"), ("n", "i")],
    "q34_date_arithmetic": [("o_orderkey", "i"), ("order_date", "d"), ("plus_3m", "d"), ("plus_45d", "d"), ("month_end", "d"), ("dow", "i"), ("qtr", "i"), ("days_to_y2k", "i")],
    "q36_rank_functions": [("o_orderstatus", "s"), ("o_orderkey", "i"), ("rnk", "i"), ("drnk", "i"), ("prnk", "f"), ("quartile", "i"), ("cume", "f")],
    "q86_explode_lateral": [("token", "s"), ("n", "i"), ("avg_pos", "f")],
    "q87_null_semantics": [("c_custkey", "i"), ("spend0", "f"), ("orders_unless_one", "i"), ("never_ordered", "b"), ("spend_band", "s")],
    "q88_value_window_funcs": [("o_custkey", "i"), ("o_orderkey", "i"), ("first_price", "f"), ("last_price", "f"), ("second_price", "f")],
    "q90_histogram": [("bucket", "i"), ("n", "i")],
    "q91_filtered_agg": [("l_returnflag", "s"), ("n_discounted", "i"), ("taxed_revenue", "f"), ("all_positive_qty", "b"), ("any_max_qty", "b")],
    "q92_sessionization": [("user_id", "i"), ("session_no", "i"), ("n_events", "i"), ("session_start", "t"), ("session_end", "t"), ("session_value", "f")],
    "q95_variant_shred": [("o_id", "i"), ("cust", "i"), ("prio", "s"), ("amount", "f"), ("missing_is_null", "b")],
}

# Composite membership: scalar-function shapes, aggregation shapes,
# window-function shapes, and sort/limit/set-op shapes.
ROTATIONS: dict[str, list[str]] = {
    "rot_scalar_shapes": [
        "q21_string_funcs", "q22_date_funcs", "q23_json_funcs",
        "q24_math_case", "q29_map_array_funcs", "q34_date_arithmetic",
        "q95_variant_shred",
    ],
    "rot_agg_shapes": [
        "q19_rollup", "q20_cube", "q27_pivot", "q32_stat_aggregates",
        "q90_histogram", "q91_filtered_agg",
    ],
    "rot_window_shapes": [
        "q12_window_lag", "q36_rank_functions", "q88_value_window_funcs",
        "q92_sessionization",
    ],
    "rot_order_setop_shapes": [
        "q03_top_orders", "q14_topk_orders", "q15_union_all",
        "q16_intersect", "q17_except", "q33_collect_sorted",
        "q86_explode_lateral", "q87_null_semantics",
    ],
}


def _spark_ser(col: str, kind: str):
    c = F.col(col)
    if kind == "f":
        return (
            F.when(c.isNull(), F.lit(NULL_S))
            .when(F.isnan(c), F.lit("nan"))
            .when(c == F.lit(float("inf")), F.lit("inf"))
            .when(c == F.lit(float("-inf")), F.lit("-inf"))
            .otherwise(F.floor(c * F.lit(10000)).cast("string"))
        )
    if kind == "t":
        return F.coalesce(
            F.unix_micros(c.cast("timestamp")).cast("string"), F.lit(NULL_S)
        )
    return F.coalesce(c.cast("string"), F.lit(NULL_S))


def _duck_ser(col: str, kind: str) -> str:
    if kind == "f":
        return (
            f"CASE WHEN {col} IS NULL THEN '{NULL_S}' "
            f"WHEN isnan({col}::DOUBLE) THEN 'nan' "
            f"WHEN {col}::DOUBLE = 'infinity'::DOUBLE THEN 'inf' "
            f"WHEN {col}::DOUBLE = '-infinity'::DOUBLE THEN '-inf' "
            f"ELSE CAST(floor({col}::DOUBLE * 10000) AS BIGINT)::VARCHAR END"
        )
    if kind == "t":
        return f"coalesce(epoch_us({col}::TIMESTAMP)::VARCHAR, '{NULL_S}')"
    return f"coalesce(CAST({col} AS VARCHAR), '{NULL_S}')"


def _leg_frame(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = relational.QUERIES[name](spark, sf_dir)
    k = F.concat_ws("|", *[_spark_ser(c, kind) for c, kind in _LEGS[name]])
    return df.select(F.lit(name).alias("shape"), k.alias("k"))


def _composite(members: list[str]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        frames = [_leg_frame(spark, sf_dir, n) for n in members]
        return reduce(DataFrame.unionByName, frames)

    return run


def _composite_oracle(members: list[str]) -> str:
    parts = []
    for n in members:
        exprs = ", ".join(_duck_ser(c, kind) for c, kind in _LEGS[n])
        parts.append(
            f"SELECT '{n}' AS shape, concat_ws('|', {exprs}) AS k"
            f"\nFROM ({relational.ORACLE[n]}) leg"
        )
    return "\nUNION ALL\n".join(parts)


QUERIES = {name: _composite(members) for name, members in ROTATIONS.items()}
ORACLE = {name: _composite_oracle(members) for name, members in ROTATIONS.items()}
