"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory
(SURVEY.md §2) with DuckDB-oracle SQL for everything SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from engine import multimodal, pipeline, relational, sampling, sqlapi, stats, similarity, streaming, text, text_ml, tuning, udfs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by nation) on /root/testdata/sf0.001."""
    return relational.q02_revenue_by_nation(spark, "/root/testdata/sf0.001")


def _modules():
    # Non-relational families FIRST: the driver's correctness check
    # covers only the first 50 queries() entries, and round 1 (r1)
    # spent all 50 on relational+sampling+q42 — every text/similarity/
    # streaming/sqlapi/udf/ML query shipped unverified. Relational
    # proved green in r1, so it goes last, with a hand-picked head
    # (below) for the queries changed this round.
    return [text, similarity, multimodal, streaming, stats, sampling, sqlapi, udfs, text_ml, tuning, pipeline, relational]


# Relational queries that must re-enter the driver's 50-entry window:
# the four changed this round (q25 decimal avg, q29/q33 array
# stringification, q89 composite block key) + three green canaries.
_RELATIONAL_HEAD = [
    "q25_correlated_subquery",
    "q29_map_array_funcs",
    "q33_collect_sorted",
    "q89_fuzzy_match",
    "q95_variant_shred",
]


def _ordered(table_of: dict[str, dict]) -> dict:
    out: dict = {}
    for m in _modules():
        d = table_of[id(m)]
        if m is relational:
            out.update({k: d[k] for k in _RELATIONAL_HEAD if k in d})
        out.update(d)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered({id(m): m.QUERIES for m in _modules()})


def oracle_sql() -> dict[str, str]:
    return _ordered({id(m): m.ORACLE for m in _modules()})
