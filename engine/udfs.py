"""Python UDF surface: scalar pandas UDF, grouped-agg pandas UDF
(UDAF), and a Python UDTF (SURVEY §2.6 'UDF/UDAF/UDTF' row).

These exist to prove the full extension surface; per the engine's
design rules the hot paths use JVM built-ins, and each UDF here has a
pure-SQL twin the oracle verifies against (Arrow-batched, so the
Python boundary cost is per-batch, not per-row — the only acceptable
shape at 100 TB).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import table


def _geo_mean_udaf():
    """Grouped-agg pandas UDF (UDAF): geometric mean of (1+discount).
    SQL twin: exp(avg(ln(1+x))) — verified by the oracle. Built
    lazily: pandas_udf parses its return type against the active
    session, so the decorator can't run at import time."""

    @F.pandas_udf("double")
    def geo_mean_discount(d: pd.Series) -> float:
        return float(np.exp(np.log1p(d.to_numpy()).mean()))

    return geo_mean_discount


def q37_grouped_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag geometric mean discount via a pandas UDAF."""
    geo_mean_discount = _geo_mean_udaf()
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(geo_mean_discount(F.col("l_discount")), 8).alias("geo_mean_disc"))
        .orderBy("l_returnflag")
    )


def q38_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one input doc row → N (position, token) rows.
    (Production tokenization stays JVM-side — split+posexplode; the
    UDTF proves the table-function extension point.)"""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: int, token: string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for i, tok in enumerate(text.strip().split()):
                yield doc_id, i, tok

    spark.udtf.register("tokenize_udtf", Tokenize)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("q38_docs")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM q38_docs, LATERAL tokenize_udtf(doc_id, text) t"
    )


QUERIES = {
    "q37_grouped_udaf": q37_grouped_udaf,
    "q38_python_udtf": q38_python_udtf,
}

ORACLE = {
    "q37_grouped_udaf": """
        SELECT l_returnflag,
               round(exp(avg(ln(1 + l_discount))), 8) AS geo_mean_disc
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "q38_python_udtf": """
        WITH t AS (
            SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
            FROM documents WHERE doc_id < 20)
        SELECT doc_id, (g.i - 1)::int AS pos, toks[g.i] AS token
        FROM t, generate_series(1, 1000) AS g(i)
        WHERE g.i <= len(toks)
    """,
}
