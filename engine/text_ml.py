"""MLlib text-feature stack + exact TF-IDF (SURVEY §2.6 north-star row:
Tokenizer / StopWordsRemover / NGram / HashingTF + IDF).

Two tiers:
* q69_tfidf: TF-IDF computed exactly with DataFrame ops (tf × smoothed
  idf) — fully SQL-expressible, oracle-checked, and the shape that
  scales: two hash aggregations (term-per-doc counts, doc frequency)
  + a broadcast join of the tiny per-term idf table.
* ml_tfidf_features: the MLlib pipeline variant (Tokenizer →
  StopWordsRemover → NGram → HashingTF → IDF). Rows-only: HashingTF's
  murmur bucketing isn't portable to the oracle. At 100 TB the
  hashing trick is exactly what you want — fixed-width vectors, no
  vocabulary shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import table

_STOPWORDS = ("a", "the", "of", "and")  # fixture-vocab stopword set
TOP_TERMS = 5


def q69_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact TF-IDF, top-N terms per document (doc_id < 50).

    tf = term count in doc; idf = ln((N+1)/(df+1)) + 1 (smoothed).
    Stopwords removed. Deterministic top-N via (tfidf desc, term).
    """
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents")
    # corpus size as a broadcast 1-row aggregate INSIDE the plan — no
    # separate driver job (r1 ran d.count() eagerly per composition)
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    terms = d.select(
        "doc_id", F.explode(F.split(F.trim(F.lower(F.col("text"))), " +")).alias("term")
    ).filter(~F.col("term").isin(*_STOPWORDS))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = terms.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = (
        df_.crossJoin(F.broadcast(n))
        .withColumn("idf", F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1)
        .drop("n_docs")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        tf.filter(F.col("doc_id") < 50)
        .join(F.broadcast(idf), "term")
        .withColumn("tfidf", F.round(F.col("tf") * F.col("idf"), 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS)
        .select("doc_id", "term", "tf", F.col("rank").alias("rank"), "tfidf")
    )


def ml_tfidf_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib text pipeline: Tokenizer → StopWordsRemover → NGram(2) →
    HashingTF(64) → IDF; returns per-doc norms of the hashed TF-IDF
    vector (rows-only — murmur bucketing is engine-internal)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, HashingTF, NGram, StopWordsRemover, Tokenizer
    from pyspark.ml.functions import vector_to_array

    d = table(spark, sf_dir, "documents").select("doc_id", F.lower(F.col("text")).alias("text"))
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="tokens"),
            StopWordsRemover(inputCol="tokens", outputCol="clean", stopWords=list(_STOPWORDS)),
            NGram(n=2, inputCol="clean", outputCol="bigrams"),
            HashingTF(numFeatures=64, inputCol="bigrams", outputCol="tf_vec"),
            IDF(inputCol="tf_vec", outputCol="tfidf_vec"),
        ]
    )
    out = pipe.fit(d).transform(d).withColumn("arr", vector_to_array(F.col("tfidf_vec")))
    return out.select(
        "doc_id",
        F.size("clean").alias("n_clean_tokens"),
        F.size("bigrams").alias("n_bigrams"),
        F.round(
            F.sqrt(F.expr("aggregate(transform(arr, x -> x * x), 0D, (a, v) -> a + v)")),
            6,
        ).alias("tfidf_l2"),
    )


QUERIES = {
    "q69_tfidf": q69_tfidf,
    "ml_tfidf_features": ml_tfidf_features,
}

ORACLE = {
    "q69_tfidf": f"""
        WITH terms AS (
            SELECT doc_id, unnest(string_split_regex(trim(lower(text)), ' +')) AS term
            FROM documents),
        filtered AS (
            SELECT * FROM terms
            WHERE term NOT IN ({", ".join(f"'{s}'" for s in _STOPWORDS)})),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM filtered GROUP BY doc_id, term),
        df AS (
            SELECT term, count(DISTINCT doc_id) AS dfreq FROM filtered GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf,
                   round(tf.tf * (ln((n.n_docs + 1.0) / (df.dfreq + 1.0)) + 1), 6) AS tfidf
            FROM tf, n JOIN df ON tf.term = df.term
            WHERE tf.doc_id < 50),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term)::int AS rank
            FROM scored)
        SELECT doc_id, term, tf, rank, tfidf FROM ranked WHERE rank <= {TOP_TERMS}
    """,
}


# ---------------------------------- model-based quality filter (r5)

# deterministic holdout: doc_id % 5 == 0 is the eval fold
QCLF_EVAL_MOD = 5
# weak-label threshold on the q57 heuristic composite (its "mid"
# bucket boundary)
QCLF_LABEL_THRESHOLD = 0.5
# hashed feature width — the no-vocabulary-shuffle knob; at real
# corpus scale this goes to 2^18-2^20 without changing the plan
QCLF_FEATURES = 256


def ml_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based document quality filter — the CCNet/GPT-3-style
    second stage the heuristic q57 filter feeds: weak labels from the
    heuristic composite (quality ≥ 0.5), a hashed-TF logistic
    regression trained on the non-holdout folds, and every holdout
    doc scored by the MODEL (not the heuristic). In production the
    weak labels come from a trusted reference corpus (Wikipedia vs
    crawl); the trainable surface is identical — this pins it with
    the in-repo heuristic as the label source so the whole query is
    self-contained and seeded.

    Scale shape: HashingTF is the part that survives 100 TB — fixed
    QCLF_FEATURES-wide vectors, NO vocabulary shuffle (the hashing
    trick); LogisticRegression is MLlib's distributed LBFGS (each
    iteration one treeAggregate over gradient partials); scoring is a
    single narrow transform. Nothing collects but the model
    coefficients (model-scale). Rows-only: murmur bucketing + LBFGS
    internals aren't SQL-expressible; the accuracy floor and
    determinism are pinned in tests/test_text.py."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Tokenizer

    from .text import q57_quality_score

    labels = q57_quality_score(spark, sf_dir).select(
        "doc_id", (F.col("quality") >= QCLF_LABEL_THRESHOLD).cast("int").alias("label")
    )
    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.lower(F.col("text")).alias("text"))
        .join(labels, "doc_id")
    )
    train = d.filter(F.col("doc_id") % QCLF_EVAL_MOD != 0)
    heldout = d.filter(F.col("doc_id") % QCLF_EVAL_MOD == 0)
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="tokens"),
            HashingTF(numFeatures=QCLF_FEATURES, inputCol="tokens", outputCol="features"),
            LogisticRegression(maxIter=25, regParam=0.01, labelCol="label"),
        ]
    )
    model = pipe.fit(train)
    return model.transform(heldout).select(
        "doc_id",
        "label",
        F.col("prediction").cast("int").alias("pred"),
        (F.col("prediction").cast("int") == F.col("label")).alias("correct"),
    )


QUERIES["ml_quality_classifier"] = ml_quality_classifier
