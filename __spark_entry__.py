"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory
(SURVEY.md §2) with DuckDB-oracle SQL for everything SQL-expressible.

Driver-window rotation policy
-----------------------------
The driver's correctness gate checks only the FIRST 50 ``queries()``
entries, and the full inventory is 119.  Policy: every query gets a
driver CORRECTNESS row at least every other round, and any query whose
code changed this round re-enters the window immediately.

* r1 window: relational + sampling head (all green except q25/q29/q33).
* r2 window: all 45 non-relational + 5 changed/canary relational
  (CORRECTNESS_r02: 50/50 green).
* r3 window: the 46 relational queries with no r2 row — including
  q96/q98/q99, never driver-checked — plus the 4 queries changed that
  round (q54/q61/q66/q64).  CORRECTNESS_r03: 50/50 green.
* r4 window (this file's state): the 8 queries with no driver row in
  ANY round (q46/q47/q75-q79/ml_adaptive_tuning), the 10 queries
  added this round (q83b, ann_recall_report, q48/q49/q49b/q49c,
  q74b, q57b, q67b, q80b), everything changed this round (q61/q66
  n_planes derivation, q80 connected-components probe rework), then
  the non-relational block (r2-green, due for rotation).  The
  candidates exceed the 50 slots: the entries deferred to r5
  (``_DEFERRED_TO_R5``) are unchanged-since-r2 green rows — mostly
  rows-only MLlib fits (weakest check class, most driver wall-time
  per slot), plus the four frozen oracle-backed SQL-text/Python-
  extension queries (q84/q85/q37/q38) displaced by the late-r4
  operator additions; new/changed queries always outrank frozen
  green ones for slots.
* r5: relational block rotation + the deferred entries above +
  whatever changes in r4+1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from engine import multimodal, pipeline, relational, sampling, sqlapi, stats, similarity, streaming, text, text_ml, tuning, udfs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by nation) on /root/testdata/sf0.001."""
    return relational.q02_revenue_by_nation(spark, "/root/testdata/sf0.001")


def _modules():
    return [text, similarity, multimodal, streaming, stats, sampling, sqlapi, udfs, text_ml, tuning, pipeline, relational]


# The only contract queries with no driver CORRECTNESS row in any of
# r1-r3 (judge strict-verified in the r3 session; the bar is a driver
# row) — they lead the r4 window unconditionally.
_UNPROVEN = [
    "q46_gap_fill",
    "q47_scd2_assembly",
    "q75_semantic_dedup",
    "q76_pq_ann",
    "q77_dq_report",
    "q78_pii_scrub",
    "q79_corpus_mix",
    "ml_adaptive_tuning",
]

# Queries ADDED in round 4.
_NEW_IN_R4 = [
    "q83b_percentiles_approx",  # scale-safe percentile twin, rows-only
    "ann_recall_report",        # driver-visible ANN-quality surface
    "q48_decontaminate",        # benchmark n-gram overlap scrub
    "q49_sequence_packing",     # GPT-style concat-and-chop layout
    "q49b_greedy_packing",      # no-straddle SFT packing (applyInPandas)
    "q74b_stream_decontaminate",  # stateless ingest-shape scrub (stream ≡ batch)
    "q57b_repetition_signals",  # Gopher dup/top n-gram repetition fractions
    "q57c_unigram_logprob",     # CCNet-style unigram-LM quality score
    "q67b_heavy_hitters",       # exact top-k tokens via merged Misra-Gries
    "q67c_stream_heavy_hitters",  # sharded-MG streaming shape, same oracle
    "q49c_rag_chunking",        # overlapping token-window chunking (RAG prep)
    "q80b_component_representatives",  # keep best-quality doc per near-dup cluster
    "q100_funnel",              # ordered event funnel (view->click->purchase)
    "q101_retention_cohorts",   # weekly cohort retention triangle
    "q81b_band_self_join",      # big-big interval join via bucketization
]

# Queries whose implementation changed in round 4 — they re-enter the
# driver window regardless of rotation parity. (q46/q47/q75/q76/q79
# also changed but already head the window as unproven.)
_CHANGED_THIS_ROUND = [
    "q61_knn_lsh_bucketed",     # n_planes derived from corpus count
    "q66_embedding_near_dup",   # n_planes derived from corpus count
    "q80_dedup_components",     # component probe checkpoint + threshold
]

# r2-green rows-only queries deferred to the r5 window: the candidate
# set above exceeds the 50-entry head, and these are unchanged since
# their green r2 rows, carry the weakest check form (rows-only — seven
# MLlib fits plus the MLlib LSH library variant), and cost the most
# driver wall-time per slot.
_DEFERRED_TO_R5 = {
    "ml_tuning_results",
    "ml_explained_variance",
    "ml_nb_predictions",
    "ml_rf_predictions",
    "ml_model_metrics",
    "ml_misclassified_inverse",
    "ml_tfidf_features",
    "q62_brp_lsh_join",
    # oracle-backed but its sampling machinery is the same code q40
    # (in-window) exercises — the cheapest oracle row to defer
    "q41_sample_census",
    # displaced by the four late-r4 additions (q57b/q67b/q49c/q80b):
    # oracle-backed, r2-green, unchanged since — the SQL-text pair and
    # the Python-extension pair lose the least signal of the remaining
    # rotation block (their code paths are frozen and each has a green
    # value-hash row plus in-suite tests)
    "q84_sql_shipping_priority",
    "q85_sql_cte_window_having",
    "q37_grouped_udaf",
    "q38_python_udtf",
    # displaced by q67c (late r4): r2-green oracle-backed, frozen code
    "q69_tfidf",
    # displaced by q57c (late r4): r2-green oracle-backed, frozen code;
    # its recursion machinery has dedicated in-suite tests
    "q94_recursive_cte",
    # displaced by q100/q101 (late r4): r2-green oracle-backed stats
    # queries whose aggregation machinery q42/q44 (in-window) share
    "q43_summary_stats",
    "q45_per_class_mean",
    # displaced by q81b (late r4): the simplest frozen r2-green agg
    "q42_census",
}


def _window_head() -> list[str]:
    """The r4 driver-window head: unproven + new + changed, then the
    non-relational block (due for rotation; the relational block holds
    r3 rows), minus the five deferred entries."""
    head = _UNPROVEN + _NEW_IN_R4 + _CHANGED_THIS_ROUND
    seen = set(head)
    for m in _modules():
        if m is relational:
            continue
        for q in m.QUERIES:
            if q not in seen and q not in _DEFERRED_TO_R5:
                head.append(q)
                seen.add(q)
    return head


def _ordered(table_of: dict[int, dict]) -> dict:
    merged: dict = {}
    for m in _modules():
        merged.update(table_of[id(m)])
    head = [k for k in _window_head() if k in merged]
    out = {k: merged[k] for k in head}
    out.update(merged)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered({id(m): m.QUERIES for m in _modules()})


def oracle_sql() -> dict[str, str]:
    return _ordered({id(m): m.ORACLE for m in _modules()})
