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
    return [relational, sampling, stats, pipeline, text, similarity, multimodal, streaming, tuning, udfs, text_ml, sqlapi]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _modules():
        out.update(m.ORACLE)
    return out
