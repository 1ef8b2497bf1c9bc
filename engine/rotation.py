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
flips the composite's hash. What the composite buys is arithmetic: r6
collapsed 25 relational singleton slots into 4 composites; r7 applies
the same move to the text / stream / similarity / multimodal /
sampling / stats / SQL-API families (the r6 verdict's item 1) — 63
more members into 9 composites — so EVERY hash-green singleton's
machinery earns a driver row each round, direct or composite.

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

from . import multimodal, relational, sampling, similarity, sqlapi, stats, streaming, text, text_ml, udfs

NULL_S = "∅"

# Member registry: composites may draw from any single-pass contract
# module (r6 covered only `relational`; r7 extends the pattern to the
# text / stream / similarity / multimodal / sampling / stats / SQL-API
# families — the r6 verdict's item 1). Keys are globally unique across
# modules (asserted by the contract's merge).
_MEMBER_MODULES = [relational, text, text_ml, similarity, streaming, multimodal, sampling, stats, sqlapi, udfs]
MEMBER_QUERIES: dict = {}
MEMBER_ORACLE: dict = {}
for _m in _MEMBER_MODULES:
    MEMBER_QUERIES.update(_m.QUERIES)
    MEMBER_ORACLE.update(_m.ORACLE)

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


# members whose runtime default is the PINNED (eager io.materialize)
# path since r10: the composites exist to re-prove the member's pure-
# Catalyst machinery as one lazy plan, so their legs call the lazy
# variant explicitly — byte-identical output (pinned vs lazy equality
# is asserted by tests/test_plans.py::test_checkpoint_collapses_scans)
# and no pin jobs run during composite construction.
_LAZY_LEG_KWARGS = {
    "q124_hybrid_rrf": {"checkpointed": False},
    "q125_length_outliers": {"checkpointed": False},
    "q135_incremental_curation": {"checkpointed": False},
}


def _leg_frame(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = MEMBER_QUERIES[name](spark, sf_dir, **_LAZY_LEG_KWARGS.get(name, {}))
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
            f"\nFROM ({MEMBER_ORACLE[n]}) leg"
        )
    return "\nUNION ALL\n".join(parts)


# r7 members — the 38-query r4-stale block plus the r5-stale
# single-pass family (the r6 verdict's item 1: the relational
# composites' arithmetic applied to the text / stream / similarity /
# multimodal / sampling / stats / SQL-API shapes). Schemas captured
# from the live queries at sf0.001 and pinned by
# tests/test_rotation.py::test_every_member_spec_matches_member_schema.
_LEGS_R7: dict[str, list[tuple[str, str]]] = {
    "q50_dedup_exact": [("text_hash", "s"), ("keeper_doc_id", "i"), ("n_copies", "i")],
    "q51_fingerprint": [("doc_id", "i"), ("fingerprint", "s")],
    "q52_ngram_jaccard": [("doc_a", "i"), ("doc_b", "i"), ("jaccard", "f")],
    "q53_minhash_signatures": [("doc_id", "i"), ("seed", "i"), ("minhash", "i")],
    "q54_minhash_candidates": [("doc_a", "i"), ("doc_b", "i"), ("est_jaccard", "f")],
    "q55_simhash": [("doc_id", "i"), ("simhash", "i")],
    "q59_char_fingerprint": [("doc_id", "i"), ("rolling_min_hash", "i")],
    "q81b_band_self_join": [("bucket", "i"), ("n_pairs", "i")],
    "q56_langid": [("doc_id", "i"), ("lang", "s"), ("predicted_lang", "s"), ("marker_hits", "i")],
    "q57_quality_score": [("doc_id", "i"), ("n_tokens", "i"), ("n_distinct", "i"), ("distinct_ratio", "f"), ("mean_tok_len", "f"), ("quality", "f"), ("bucket", "s")],
    "q57b_repetition_signals": [("doc_id", "i"), ("n_tokens", "i"), ("dup_2gram_frac", "f"), ("top_2gram_frac", "f"), ("dup_3gram_frac", "f"), ("top_3gram_frac", "f"), ("repetitive", "b")],
    "q57c_unigram_logprob": [("doc_id", "i"), ("n_tokens", "i"), ("avg_neg_logprob", "f")],
    "q58_token_stats": [("lang", "s"), ("n_docs", "i"), ("n_tokens", "i"), ("vocab", "i"), ("tokens_per_doc", "f")],
    "q67b_heavy_hitters": [("tok", "s"), ("n_occurrences", "i"), ("rank", "i")],
    "q68_data_pipeline": [("lang", "s"), ("n_docs", "i"), ("token_budget", "i"), ("avg_quality", "f")],
    "q48_decontaminate": [("doc_id", "i"), ("n_shingles", "i"), ("n_hits", "i"), ("contam_rate", "f"), ("contaminated", "b")],
    "q49_sequence_packing": [("doc_id", "i"), ("shard", "i"), ("n_tokens", "i"), ("start_tok", "i"), ("end_tok", "i"), ("first_window", "i"), ("last_window", "i"), ("n_windows", "i")],
    "q49c_rag_chunking": [("doc_id", "i"), ("chunk_idx", "i"), ("start_tok", "i"), ("n_chunk_tokens", "i"), ("chunk_hash", "s")],
    "q77_dq_report": [("tbl", "s"), ("metric", "s"), ("value", "i")],
    "q78_pii_scrub": [("doc_id", "i"), ("n_email", "i"), ("n_phone", "i"), ("n_ssn", "i"), ("n_ipv4", "i"), ("scrubbed_hash", "s"), ("scrubbed_len", "i")],
    "q79_corpus_mix": [("lang", "s"), ("n_before", "i"), ("n_selected", "i"), ("rate_ppm", "i")],
    "q74b_stream_decontaminate": [("doc_id", "i"), ("n_shingles", "i"), ("n_hits", "i"), ("contam_rate", "f"), ("contaminated", "b")],
    "q70_stream_tumbling": [("window_start", "t"), ("event_type", "s"), ("n", "i"), ("sum_value", "f")],
    "q71_stream_sliding": [("window_start", "t"), ("n", "i")],
    "q73_stream_dedup_count": [("n_unique", "i"), ("sum_value", "f")],
    "q74_stream_join": [("event_id", "i"), ("user_id", "i"), ("purchase_ts", "t"), ("click_ts", "t")],
    "q63_multimodal_meta": [("doc_id", "i"), ("n_bytes", "i"), ("payload_sha256", "s"), ("lang", "s"), ("emb_dim", "i")],
    "q64_media_features": [("shard", "i"), ("n", "i"), ("total_pixel_sum", "i"), ("min_byte", "i"), ("max_byte", "i"), ("total_bytes", "i"), ("avg_byte_mean", "f")],
    "q40_balanced_sample": [("vec_id", "i"), ("label", "i")],
    "q44_sparsity": [("n_near_zero", "i"), ("n_exact_zero", "i"), ("n_total", "i"), ("near_zero_frac", "f")],
    "q46_gap_fill": [("user_id", "i"), ("day", "d"), ("n_events", "i"), ("is_gap", "b"), ("locf_value", "f")],
    "q101_retention_cohorts": [("cohort_week", "t"), ("k", "i"), ("n_users", "i")],
    "q80_dedup_components": [("component", "i"), ("cluster_size", "i"), ("keeper", "i")],
    "q80b_component_representatives": [("component", "i"), ("cluster_size", "i"), ("keeper_doc_id", "i"), ("keeper_quality", "f")],
    "q102_incremental_dedup": [("doc_id", "i"), ("fingerprint", "s"), ("status", "s")],
    "q102b_bloom_incremental_dedup": [("doc_id", "i"), ("fingerprint", "s"), ("status", "s")],
    "q106_leakage_safe_split": [("doc_id", "i"), ("split_key", "i"), ("split", "s")],
    "q107_snapshot_diff": [("doc_id", "i"), ("status", "s")],
    "q112_cdc_merge": [("custkey", "i"), ("name", "s"), ("acctbal", "f"), ("action", "s")],
    "q113_substring_dedup": [("doc_id", "i"), ("n_tokens", "i"), ("n_dup_windows", "i"), ("n_removed", "i"), ("clean_text_hash", "s")],
    "q114_boilerplate_scrub": [("doc_id", "i"), ("n_chunks", "i"), ("n_boiler", "i"), ("clean_text_hash", "s")],
    "q97_paragraph_dedup": [("doc_id", "i"), ("n_chunks", "i"), ("n_kept", "i"), ("dedup_text_hash", "s")],
    "q103_bpe_pair_census": [("left_sym", "s"), ("right_sym", "s"), ("pair_count", "i")],
    "q104_temperature_mixture": [("lang", "s"), ("n_tokens_before", "i"), ("p_target", "f"), ("rate_ppm", "i"), ("docs_selected", "i"), ("tokens_selected", "i")],
    "q109_pmi_collocations": [("w1", "s"), ("w2", "s"), ("cab", "i"), ("pmi", "f")],
    "q111_dsir_selection": [("doc_id", "i"), ("n_grams", "i"), ("dsir_score", "i"), ("rank", "i")],
    "q67c_stream_heavy_hitters": [("tok", "s"), ("n_occurrences", "i"), ("rank", "i")],
    "q69_tfidf": [("doc_id", "i"), ("term", "s"), ("tf", "i"), ("rank", "i"), ("tfidf", "f")],
    "q48b_span_decontaminate": [("doc_id", "i"), ("n_chunks", "i"), ("n_removed", "i"), ("removed_rate", "f"), ("clean_text_hash", "s")],
    "q25_correlated_subquery": [("o_orderkey", "i"), ("o_custkey", "i"), ("totalprice", "f"), ("cust_avg", "f")],
    "q37_grouped_udaf": [("l_returnflag", "s"), ("geo_mean_disc", "f")],
    "q38_python_udtf": [("doc_id", "i"), ("pos", "i"), ("token", "s")],
    "q84_sql_shipping_priority": [("l_orderkey", "i"), ("revenue", "f"), ("o_orderdate", "t"), ("o_orderpriority", "s")],
    "q85_sql_cte_window_having": [("c_nationkey", "i"), ("n_customers", "i"), ("avg_top_order", "f")],
    "q94_recursive_cte": [("o_custkey", "i"), ("hop", "i"), ("cum_spend", "f")],
    "q41_sample_census": [("label", "i"), ("count", "i")],
    "q105_semantic_decontamination": [("vec_id", "i"), ("max_eval_sim", "f"), ("n_hits", "i"), ("contaminated", "b")],
    "q61_knn_lsh_bucketed": [("query_id", "i"), ("vec_id", "i"), ("bucket", "i"), ("cosine", "f"), ("rank", "i")],
    "q66_embedding_near_dup": [("vec_a", "i"), ("vec_b", "i"), ("cosine", "f")],
    "q64b_frame_sample": [("doc_id", "i"), ("frame_idx", "i"), ("src_frame", "i"), ("frame_bytes", "i"), ("byte_sum", "i")],
    "q42_census": [("label", "i"), ("count", "i")],
    "q43_summary_stats": [("dim", "i"), ("n", "i"), ("mean", "f"), ("std", "f"), ("min", "f"), ("p25", "f"), ("median", "f"), ("p75", "f"), ("max", "f")],
    "q45_per_class_mean": [("label", "i"), ("dim", "i"), ("mean", "f")],
    "q60_knn_brute": [("query_id", "i"), ("vec_id", "i"), ("cosine", "f"), ("rank", "i")],
    "q98_embedding_quantize": [("vec_id", "i"), ("quantized", "s"), ("max_err_1e6", "i")],
}
_LEGS.update(_LEGS_R7)

# r7 composite membership (9 composites, 63 members). Groups are
# thematic: each composite UNION-ALLs shapes that exercise one family
# of the SURVEY-§2 surface, so a red composite row localizes quickly.
ROTATIONS.update(
    {
        # MinHash / SimHash / fingerprint dedup machinery (r4-stale)
        "rot_text_dedup_shapes": [
            "q50_dedup_exact", "q51_fingerprint", "q52_ngram_jaccard",
            "q53_minhash_signatures", "q54_minhash_candidates",
            "q55_simhash", "q59_char_fingerprint", "q81b_band_self_join",
        ],
        # language-ID / quality / repetition / token-census machinery
        "rot_text_quality_shapes": [
            "q56_langid", "q57_quality_score", "q57b_repetition_signals",
            "q57c_unigram_logprob", "q58_token_stats",
            "q67b_heavy_hitters", "q68_data_pipeline",
        ],
        # decontamination / packing / scrub / mix pipeline shapes
        "rot_text_pipeline_shapes": [
            "q48_decontaminate", "q49_sequence_packing",
            "q49c_rag_chunking", "q77_dq_report", "q78_pii_scrub",
            "q79_corpus_mix", "q74b_stream_decontaminate",
        ],
        # batch-equivalent streaming shapes (tumbling/sliding/dedup/join)
        "rot_stream_shapes": [
            "q70_stream_tumbling", "q71_stream_sliding",
            "q73_stream_dedup_count", "q74_stream_join",
        ],
        # multimodal metadata + sampling + event-shape machinery
        "rot_mm_sample_shapes": [
            "q63_multimodal_meta", "q64_media_features",
            "q40_balanced_sample", "q44_sparsity", "q46_gap_fill",
            "q101_retention_cohorts", "q80_dedup_components",
            "q80b_component_representatives",
        ],
        # incremental-ingest dedup + snapshot/CDC + span dedup (r5-stale)
        "rot_ingest_dedup_shapes": [
            "q102_incremental_dedup", "q102b_bloom_incremental_dedup",
            "q106_leakage_safe_split", "q107_snapshot_diff",
            "q112_cdc_merge", "q113_substring_dedup",
            "q114_boilerplate_scrub", "q97_paragraph_dedup",
        ],
        # corpus statistics: BPE census, mixing, PMI, DSIR, TF-IDF
        "rot_corpus_stats_shapes": [
            "q103_bpe_pair_census", "q104_temperature_mixture",
            "q109_pmi_collocations", "q111_dsir_selection",
            "q67c_stream_heavy_hitters", "q69_tfidf",
            "q48b_span_decontaminate",
        ],
        # SQL-text API / subquery / Python UDF-UDTF / census shapes
        "rot_sql_udf_shapes": [
            "q25_correlated_subquery", "q37_grouped_udaf",
            "q38_python_udtf", "q84_sql_shipping_priority",
            "q85_sql_cte_window_having", "q94_recursive_cte",
            "q41_sample_census",
        ],
        # vector / embedding machinery + frame sampling + stats
        # (q60/q98 joined at the r7 freeze: both changed this round —
        # -0.0 canonicalization / degenerate-vector semantics — and a
        # composite hash row re-proves them without a direct slot)
        "rot_vector_shapes": [
            "q105_semantic_decontamination", "q61_knn_lsh_bucketed",
            "q66_embedding_near_dup", "q64b_frame_sample",
            "q42_census", "q43_summary_stats", "q45_per_class_mean",
            "q60_knn_brute", "q98_embedding_quantize",
        ],
    }
)


# r8 members — the join-shape and event/time-shape families: the 15
# r6-green relational singletons whose direct rows would otherwise
# consume 15 of the 50 window slots (the r8 verdict's arithmetic:
# 34 r6-last non-members + 4 relational composites + the 15-entry
# promised head exceed the window). Two composites re-prove them all
# in 2 slots; the singletons keep their own oracles for direct turns.
_LEGS_R8: dict[str, list[tuple[str, str]]] = {
    "q04_outer_join_agg": [("c_custkey", "i"), ("n_orders", "i")],
    "q07_broadcast_join": [("n_nationkey", "i"), ("n_name", "s"), ("r_name", "s")],
    "q08_semi_join": [("c_custkey", "i"), ("c_name", "s"), ("c_mktsegment", "s")],
    "q09_anti_join": [("c_custkey", "i"), ("c_name", "s")],
    "q10_theta_join": [("s_suppkey", "i"), ("s_name", "s"), ("n_richer_customers", "i")],
    "q28_asof_join": [("event_id", "i"), ("user_id", "i"), ("ts", "t"), ("event_type", "s"), ("prev_purchase_ts", "t")],
    "q35_cross_join": [("n_name", "s"), ("r_name", "s")],
    "q81_range_join": [("band_id", "i"), ("n", "i"), ("sum_price", "f")],
    "q06_forecast_revenue": [("revenue", "f")],
    "q47_scd2_assembly": [("user_id", "i"), ("version", "i"), ("valid_from", "t"), ("valid_to", "t"), ("value", "f"), ("is_current", "b")],
    "q82_time_rollup": [("grain", "s"), ("d", "t"), ("h", "t"), ("n", "i"), ("sum_value", "f")],
    "q89_fuzzy_match": [("part_a", "i"), ("part_b", "i"), ("edit_dist", "i")],
    "q93_keep_latest": [("user_id", "i"), ("latest_event_id", "i"), ("latest_event_type", "s"), ("latest_value", "f"), ("first_event_id", "i"), ("latest_ts", "t")],
    "q99_deterministic_split": [("split", "s"), ("label", "i"), ("n", "i")],
    "q100_funnel": [("stage", "s"), ("n_users", "i"), ("conv_ppm", "i")],
}
_LEGS.update(_LEGS_R8)

ROTATIONS.update(
    {
        # join strategies: outer/broadcast/semi/anti/theta/asof/cross/
        # range — one slot re-proves the whole §2.6 join row
        "rot_join_shapes": [
            "q04_outer_join_agg", "q07_broadcast_join", "q08_semi_join",
            "q09_anti_join", "q10_theta_join", "q28_asof_join",
            "q35_cross_join", "q81_range_join",
        ],
        # event/time machinery: forecast regression, SCD2 assembly,
        # calendar rollup, blocked fuzzy match, max_by compaction,
        # deterministic split census, ordered funnel
        "rot_event_shapes": [
            "q06_forecast_revenue", "q47_scd2_assembly", "q82_time_rollup",
            "q89_fuzzy_match", "q93_keep_latest", "q99_deterministic_split",
            "q100_funnel",
        ],
    }
)


# r10 members — the last three uncompressed strict families. The r10
# window arithmetic forces this round's application of the same move:
# the ≤1-round-stale invariant demands rows for 67 entries while the
# promised leads + the 27 r4-stale direct rotations fill 33 slots, so
# the 24 strict singletons below (9 relational agg/window shapes with
# only direct r8 rows, the 8 selection/retrieval shapes and 7
# quality-guard shapes from the q120-q131 post-freeze generation) fold
# into 3 composite slots. q30/q96 (the HLL sketches) are rows-only and
# cannot compose; their machinery rides the in-window
# sketch_error_report, which CALLS them (the rows-only analogue of the
# changed-via-composite rule). Schemas captured from the live queries
# at sf0.001 and pinned by tests/test_rotation.py.
_LEGS_R10: dict[str, list[tuple[str, str]]] = {
    "q01_pricing_summary": [("l_returnflag", "s"), ("l_linestatus", "s"), ("sum_qty", "f"), ("sum_base_price", "f"), ("sum_disc_price", "f"), ("sum_charge", "f"), ("avg_qty", "f"), ("avg_price", "f"), ("avg_disc", "f"), ("count_order", "i")],
    "q02_revenue_by_nation": [("n_name", "s"), ("revenue", "f")],
    "q11_window_rank": [("o_custkey", "i"), ("o_orderkey", "i"), ("totalprice", "f"), ("rn", "i")],
    "q13_window_running_sum": [("o_custkey", "i"), ("o_orderkey", "i"), ("running_total", "f")],
    "q18_distinct_agg": [("o_orderstatus", "s"), ("n_customers", "i"), ("n_orders", "i"), ("total", "f")],
    "q26_grouping_sets": [("returnflag", "s"), ("linestatus", "s"), ("n", "i"), ("sum_price", "f")],
    "q31_window_range_frame": [("o_custkey", "i"), ("o_orderkey", "i"), ("rolling_30d_total", "f")],
    "q39_unpivot": [("l_orderkey", "i"), ("l_linenumber", "i"), ("metric", "s"), ("value", "f")],
    "q83_percentiles": [("l_returnflag", "s"), ("p25_price", "f"), ("median_price", "f"), ("p75_price", "f"), ("p95_qty", "f")],
    "q115_source_quota_cap": [("source", "s"), ("src_rank", "i"), ("doc_id", "i"), ("quality", "f")],
    "q116_bm25_topk": [("query_id", "s"), ("rank", "i"), ("doc_id", "i"), ("score", "f")],
    "q117_weighted_sample": [("rank", "i"), ("doc_id", "i"), ("source", "s"), ("quality", "f"), ("key_1e6", "i")],
    "q121_source_diversity_report": [("lang", "s"), ("n_docs", "i"), ("n_sources", "i"), ("simpson_ppm", "i"), ("eff_sources_1e3", "i")],
    "q123_hard_negatives": [("query_id", "i"), ("query_label", "i"), ("vec_id", "i"), ("neg_label", "i"), ("cosine", "f"), ("rank", "i"), ("margin", "f"), ("harder_than_positive", "b")],
    "q124_hybrid_rrf": [("query_id", "s"), ("rank", "i"), ("doc_id", "i"), ("rrf_score", "i"), ("n_legs", "i"), ("bm25_rank", "i"), ("ql_rank", "i")],
    "q127_stratified_sample": [("lang", "s"), ("rank", "i"), ("doc_id", "i"), ("quality", "f"), ("key_1e6", "i")],
    "q130_source_quality_report": [("source", "s"), ("n_docs", "i"), ("q25_1e6", "i"), ("median_1e6", "i"), ("q75_1e6", "i"), ("corpus_median_1e6", "i"), ("below_corpus_median", "b")],
    "q67_token_counting": [("doc_id", "i"), ("ws_tokens", "i"), ("bpe_tokens", "i"), ("n_chars", "i"), ("chars_per_token", "f")],
    "q122_token_entropy": [("doc_id", "i"), ("n_tokens", "i"), ("n_distinct", "i"), ("entropy_1e6", "i"), ("low_entropy", "b")],
    "q125_length_outliers": [("lang", "s"), ("n_docs", "i"), ("med2_tokens", "i"), ("mad2_tokens", "i"), ("max_dev2", "i"), ("n_outliers", "i"), ("outlier_ppm", "i")],
    "q126_vocab_drift": [("rank", "i"), ("tok", "s"), ("a_count", "i"), ("b_count", "i"), ("a_ppm", "i"), ("b_ppm", "i"), ("shift_ppm", "i"), ("is_novel", "b"), ("n_novel_types", "i"), ("novel_ppm", "i")],
    "q128_bigram_logprob": [("doc_id", "i"), ("n_tokens", "i"), ("n_bigrams", "i"), ("nll_mean_1e6", "i"), ("too_short", "b")],
    "q129_decontamination_defense": [("doc_id", "i"), ("ngram_hits", "i"), ("ngram_contaminated", "b"), ("semantic_scored", "b"), ("max_eval_sim", "f"), ("semantic_hits", "i"), ("semantic_contaminated", "b"), ("contaminated_any", "b")],
    "q131_phash_neardup": [("doc_a", "i"), ("doc_b", "i"), ("hamming", "i")],
}
_LEGS.update(_LEGS_R10)

ROTATIONS.update(
    {
        # aggregation/window shapes whose only prior coverage was
        # direct rows: pricing summary, revenue rollup, rank /
        # running-sum / range-frame windows, distinct & grouping-set
        # aggs, unpivot, exact percentiles
        "rot_agg_sketch_shapes": [
            "q01_pricing_summary", "q02_revenue_by_nation",
            "q11_window_rank", "q13_window_running_sum",
            "q18_distinct_agg", "q26_grouping_sets",
            "q31_window_range_frame", "q39_unpivot", "q83_percentiles",
        ],
        # corpus selection / retrieval shapes: per-source caps, BM25,
        # weighted & stratified sampling, diversity report, hard
        # negatives, hybrid RRF, source quality league
        "rot_selection_shapes": [
            "q115_source_quota_cap", "q116_bm25_topk",
            "q117_weighted_sample", "q121_source_diversity_report",
            "q123_hard_negatives", "q124_hybrid_rrf",
            "q127_stratified_sample", "q130_source_quality_report",
        ],
        # quality-guard shapes: token counting, entropy, length
        # outliers, vocab drift, bigram LM, decontamination
        # defense-in-depth, perceptual-hash media near-dup
        "rot_quality_guard_shapes": [
            "q67_token_counting", "q122_token_entropy",
            "q125_length_outliers", "q126_vocab_drift",
            "q128_bigram_logprob", "q129_decontamination_defense",
            "q131_phash_neardup",
        ],
    }
)


QUERIES = {name: _composite(members) for name, members in ROTATIONS.items()}
ORACLE = {name: _composite_oracle(members) for name, members in ROTATIONS.items()}
