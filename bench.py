"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

The LAST stdout line is one compact JSON object:
  {"metric": "headline_queries_total_wall", "value": <total sec>,
   "unit": "sec", "n_queries": N, "sf": <sf>}
Per-query timings go to stderr (and BENCH_DETAIL.json) — the driver
captures only a tail window of stdout, and r1's single long line with
70 embedded timings got its head truncated ("parsed": null).

One SparkSession is reused across all queries (per SURVEY §6 the risk
at small SF is per-query session overhead, not data volume). Each
query is materialized with a ``noop``-format write: unlike ``count()``
(under which Catalyst prunes the projected expressions away, timing
projection-only queries as bare scans), the noop sink evaluates every
output column and discards the rows executor-side — full-plan cost,
no driver collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# headline set: every oracle-checked operator family, no ML fits
# (fits are covered by tests; bench targets the query engine).
HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q03_top_orders",
    "q04_outer_join_agg",
    "q06_forecast_revenue",
    "q07_broadcast_join",
    "q08_semi_join",
    "q09_anti_join",
    "q10_theta_join",
    "q11_window_rank",
    "q12_window_lag",
    "q13_window_running_sum",
    "q14_topk_orders",
    "q15_union_all",
    "q16_intersect",
    "q17_except",
    "q18_distinct_agg",
    "q19_rollup",
    "q20_cube",
    "q21_string_funcs",
    "q22_date_funcs",
    "q23_json_funcs",
    "q24_math_case",
    "q25_correlated_subquery",
    "q26_grouping_sets",
    "q27_pivot",
    "q28_asof_join",
    "q29_map_array_funcs",
    "q31_window_range_frame",
    "q32_stat_aggregates",
    "q33_collect_sorted",
    "q34_date_arithmetic",
    "q35_cross_join",
    "q36_rank_functions",
    "q37_grouped_udaf",
    "q38_python_udtf",
    "q39_unpivot",
    "q84_sql_shipping_priority",
    "q85_sql_cte_window_having",
    "q94_recursive_cte",
    "q81_range_join",
    "q81b_band_self_join",
    "q82_time_rollup",
    "q83_percentiles",
    "q83b_percentiles_approx",
    "q86_explode_lateral",
    "q88_value_window_funcs",
    "q89_fuzzy_match",
    "q90_histogram",
    "q91_filtered_agg",
    "q92_sessionization",
    "q93_keep_latest",
    "q87_null_semantics",
    "q46_gap_fill",
    "q100_funnel",
    "q101_retention_cohorts",
    "q47_scd2_assembly",
    "q40_balanced_sample",
    "q42_census",
    "q44_sparsity",
    "q45_per_class_mean",
    "q48_decontaminate",
    "q48b_span_decontaminate",
    "q49_sequence_packing",
    "q49b_greedy_packing",
    "q49c_rag_chunking",
    "q50_dedup_exact",
    "q57b_repetition_signals",
    "q57c_unigram_logprob",
    "q67b_heavy_hitters",
    "q67c_stream_heavy_hitters",
    "q80b_component_representatives",
    "q77_dq_report",
    "q78_pii_scrub",
    "q79_corpus_mix",
    "q97_paragraph_dedup",
    "q113_substring_dedup",
    "q114_boilerplate_scrub",
    "q102_incremental_dedup",
    "q103_bpe_pair_census",
    "q103b_bpe_train",
    "q103c_bpe_tokenize",
    "q104_temperature_mixture",
    "q105_semantic_decontamination",
    "q106_leakage_safe_split",
    "scaling_law_report",
    "q52_ngram_jaccard",
    "q54_minhash_candidates",
    "q55_simhash",
    "q57_quality_score",
    "q58_token_stats",
    "q66_embedding_near_dup",
    "q67_token_counting",
    "q68_data_pipeline",
    "q69_tfidf",
    "q80_dedup_components",
    "q60_knn_brute",
    "q61_knn_lsh_bucketed",
    "q75_semantic_dedup",
    "q76_pq_ann",
    "q76b_ivfpq_ann",
    "q102b_bloom_incremental_dedup",
    "q107_snapshot_diff",
    "q112_cdc_merge",
    "q108_crawl_pagerank",
    "q109_pmi_collocations",
    "q110_embedding_drift",
    "q111_dsir_selection",
    "dedup_recall_report",
    "q115_source_quota_cap",
    "q116_bm25_topk",
    "q117_weighted_sample",
    "packing_invariants_report",
    "q118_incremental_neardup",
    "q119_context_budget_report",
    "q120_budget_selection",
    "q121_source_diversity_report",
    "q122_token_entropy",
    "q123_hard_negatives",
    "q124_hybrid_rrf",
    "q125_length_outliers",
    "q126_vocab_drift",
    "q127_stratified_sample",
    "q128_bigram_logprob",
    "q129_decontamination_defense",
    "q130_source_quality_report",
    "rot_scalar_shapes",
    "rot_agg_shapes",
    "rot_window_shapes",
    "rot_order_setop_shapes",
    # NOT benched: the nine r7 family composites (rot_text_dedup /
    # text_quality / text_pipeline / stream / mm_sample / ingest_dedup
    # / corpus_stats / sql_udf / vector _shapes), the two r8 ones
    # (rot_join / rot_event _shapes), and the three r10 ones
    # (rot_agg_sketch / rot_selection / rot_quality_guard _shapes —
    # every member is individually benched above). Each is a UNION ALL
    # of already-benched member plans plus a final projection —
    # benching them would double-count ~54 s of member wall-time as
    # new cost without measuring any new operator. The four relational
    # composites above stay: they predate r7 in the bench artifacts
    # (comparability) and pin that the UNION-ALL wrapper itself costs
    # ~nothing over its members. r7 also adds the nine previously
    # unbenched member singletons below, so every composite member is
    # individually benched.
    "q51_fingerprint",
    "q53_minhash_signatures",
    "q56_langid",
    "q59_char_fingerprint",
    "q63_multimodal_meta",
    "q64_media_features",
    # q74b_stream_decontaminate is NOT benched — same class as
    # stream_equivalence_report below: it runs a REAL readStream
    # pipeline (state store + checkpoint dir), measured 13.6 s at
    # sf0.1, nearly all streaming-runtime fixed overhead rather than
    # engine throughput. It stays a contract query (driver gate at
    # sf0.01, rot_text_pipeline_shapes composite, batch-equivalence
    # tests at every SF).
    "q41_sample_census",
    "q43_summary_stats",
    "q64b_frame_sample",
    "q70_stream_tumbling",
    "q71_stream_sliding",
    "q72_stream_sessions",
    "q73_stream_dedup_count",
    "q74_stream_join",
    "sketch_error_report",
    # r8 (the r7 verdict's item 3): the four previously unwatched
    # perf surfaces join the headline so BENCH_COMPARE covers every
    # contract query directly or via an exact-twin report. The first
    # three are cheap MLlib-tier plans; stream_equivalence_report is
    # DOMINATED by streaming-runtime fixed overhead (state stores,
    # per-query checkpoint dirs, staged file sources — measured
    # ~48 s at sf0.1, by far the most expensive headline row), but an
    # invisible regression in the stateful-streaming twins is worse
    # than an ugly row; read its timing as runtime overhead, not
    # engine throughput (q74b stays unbenched: its machinery is this
    # report's q74b twin plus rot_text_pipeline's batch leg).
    "q62_brp_lsh_join",
    "q65_knn_ivf",
    "ann_recall_report",
    "stream_equivalence_report",
    # r8 additions
    "q131_phash_neardup",
    "q132_phash_clusters",
    "q133_shingle_containment",
    "q134_curation_funnel",
    # r9 additions: the nightly cross-snapshot delta funnel and the
    # curriculum shard manifest
    "q135_incremental_curation",
    "q136_curriculum_shards",
    # r10 post-freeze additions: the duplicate-13-gram memorization
    # report, the length-bucketed dynamic-batching manifest, and the
    # per-funnel-stage dup-mass acceptance audit
    "q137_dup_ngram_report",
    "q138_padded_batch_manifest",
    "q139_funnel_acceptance",
]


def _bucketed_join_ablation(spark, sf_dir: str) -> dict:
    """SCALING.md evidence: lineitem⋈orders as a shuffle sort-merge
    join vs the same join over co-bucketed tables (shuffle elided).
    Broadcast is disabled for the measurement — at 100 TB neither side
    broadcasts; this models exactly the case bucketing exists for.
    One-time bucketing write cost is reported too (it amortizes over
    every subsequent join on the key)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from engine.io import write_bucketed

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))

    def _join(l, o):
        return (
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("l_extendedprice").alias("rev"))
        )

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    tmp = tempfile.mkdtemp(prefix="bucket_bench_")
    out: dict = {}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        t0 = time.perf_counter()
        _join(li, od).write.format("noop").mode("overwrite").save()
        out["join_unbucketed_s"] = round(time.perf_counter() - t0, 4)

        t0 = time.perf_counter()
        write_bucketed(li, "bench_li_b", "l_orderkey", 32, path=os.path.join(tmp, "li"))
        write_bucketed(od, "bench_od_b", "o_orderkey", 32, path=os.path.join(tmp, "od"))
        out["bucketing_write_s"] = round(time.perf_counter() - t0, 4)

        lb, ob = spark.table("bench_li_b"), spark.table("bench_od_b")
        t0 = time.perf_counter()
        _join(lb, ob).write.format("noop").mode("overwrite").save()
        out["join_bucketed_s"] = round(time.perf_counter() - t0, 4)

        # the claim itself: no exchange feeds the bucketed join
        plan = _join(lb, ob)._jdf.queryExecution().executedPlan().toString()
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        out["bucketed_join_exchanges"] = join_part.count("Exchange hashpartitioning")
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        for t in ("bench_li_b", "bench_od_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def _grouped_topk_ablation(spark, sf_dir: str) -> dict:
    """SCALING.md evidence for q115's two-phase salted grouped top-K:
    a 2M-row frame with 98% of rows in ONE hot group, top-10 per group
    by (value DESC, id). The single-window plan funnels the hot group
    into one task's sort; the two-phase plan shards it 8 ways first.
    Result equality (not just counts) is asserted via exceptAll both
    ways — the containment law says the answers must be identical."""
    from pyspark.sql import functions as F

    from engine.skew import grouped_topk

    n = 2_000_000
    base = (
        spark.range(0, n)
        .select(
            F.col("id"),
            F.when(F.col("id") % 50 != 0, F.lit("hot"))
            .otherwise(F.concat(F.lit("src"), (F.col("id") % 100).cast("string")))
            .alias("grp"),
            # deterministic pseudo-quality
            (F.pmod(F.xxhash64(F.col("id")), F.lit(1_000_003)) / 1_000_003.0).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    order = [F.col("v").desc(), F.col("id")]

    from pyspark.sql.window import Window

    def _single():
        w = Window.partitionBy("grp").orderBy(*order)
        return (
            base.withColumn("grp_rank", F.row_number().over(w))
            .filter(F.col("grp_rank") <= 10)
        )

    def _two_phase():
        return grouped_topk(base, ["grp"], order, F.xxhash64(F.col("id")), 10, 8)

    out: dict = {}
    for label, make in (("topk_single_window_s", _single), ("topk_two_phase_s", _two_phase)):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            make().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[label] = round(best, 4)
    a, b = _single(), _two_phase().select(*_single().columns)
    out["topk_results_equal"] = (
        a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    )
    return out


def _skew_ablation(spark, sf_dir: str) -> dict:
    """SCALING.md evidence for the skew section, measured honestly.

    JOIN skew: lineitem exploded ×20 with 99% of rows remapped to one
    hot key, joined to a 200k-row dim too big to broadcast (broadcast
    disabled anyway, as at 100 TB). Three ways: no mitigation (the one
    hot SMJ reducer sorts ~99% of the fact side), AQE with its
    skew-join rule enabled at defaults, and salted_join. Row counts
    must agree across all three.

    Measured finding (kept honest in SCALING.md): in this Spark build
    the AQE skew rule consistently reports "0 skewed partitions" for
    this query — verified via OptimizeSkewedJoin DEBUG logs even with
    skewedPartitionThresholdInBytes=1 and skewedPartitionFactor=0, so
    the rule is evaluating before the child-stage map statistics
    exist, and the AQE variant times like no-mitigation. salted_join
    is the deterministic mitigation; do NOT assume the splitter fires.

    AGG skew: the same hot key direct groupBy-sum vs salted_agg.
    Expectation (recorded either way): Catalyst's partial aggregation
    already collapses algebraic aggs map-side, so salting buys ~nothing
    — salted_agg exists for the non-algebraic residue; the measurement
    keeps that claim tested rather than assumed."""
    from pyspark.sql import functions as F

    from engine.skew import salted_agg, salted_join

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    # materialize the skewed fact ONCE (localCheckpoint) so every
    # variant times the join, not the shared ×20 explode generation —
    # without this the generation constant dilutes the contrast below
    # run-to-run noise
    big = (
        li.select(
            F.when(F.col("l_orderkey") % 100 != 0, F.lit(0))   # 99% on one key
            .otherwise(F.col("l_orderkey") % 200_000)
            .alias("k"),
            "l_quantity",
        )
        .withColumn("_x", F.explode(F.sequence(F.lit(1), F.lit(20))))
        .drop("_x")
        .localCheckpoint(eager=True)
    )
    small = spark.range(0, 200_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("w")
    ).localCheckpoint(eager=True)

    def _agg(j):
        return j.groupBy("w").agg(
            F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
        )

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
        )
    }
    out: dict = {}
    counts: dict = {}

    def _time(label, skew_join_conf, make):
        # min of 2 reps: the least-interference estimate of plan cost
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skew_join_conf)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            counts[label] = make().count()
            best = min(best, time.perf_counter() - t0)
        out[label] = round(best, 4)

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        _time("skew_join_no_mitigation_s", "false", lambda: _agg(big.join(small, "k")))
        _time("skew_join_aqe_default_s", "true", lambda: _agg(big.join(small, "k")))
        _time(
            "skew_join_salted_s",
            "false",
            lambda: _agg(salted_join(big, small, "k", n_salts=16)),
        )
        assert len(set(counts.values())) == 1, counts

        for label, make in (
            (
                "skew_agg_direct_s",
                lambda: big.groupBy("k").agg(
                    F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("s")
                ),
            ),
            (
                "skew_agg_salted_s",
                lambda: salted_agg(
                    big, "k", {"n": ("*", "count"), "s": ("l_quantity", "sum")}, n_salts=16
                ),
            ),
        ):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                make().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            out[label] = round(best, 4)
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import __spark_entry__ as contract
    from engine.session import get_session

    spark = get_session("bench")
    qs = contract.queries()

    # warm the JVM + parquet footers once, outside the timings
    qs["q07_broadcast_join"](spark, sf_dir).count()
    # warm MLlib too (class loading + netlib BLAS probe): the first
    # MLlib fit in a JVM pays ~1.5-2s of one-time overhead that
    # otherwise lands on whichever KMeans-using query runs first
    # (r3: q75 billed 5.4s of which ~1.7s was this warmup)
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    _warm = spark.range(64).select(
        array_to_vector(F.array(F.rand(1), F.rand(2))).alias("features")
    )
    KMeans(k=2, seed=1, maxIter=1).fit(_warm)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name == "stream_equivalence_report":
            # r8 verdict item 5: the report aggregates 5 real streaming
            # pipelines (~22% of the headline wall as one blob) — time
            # each pipeline as its OWN row so a regression in one
            # stream compares against its own baseline. The rows sum
            # to what the blob row measured, keeping the total
            # comparable round-over-round.
            from engine.streaming import STREAM_EQ_OPERATORS, stream_eq_check

            for op in STREAM_EQ_OPERATORS:
                t0 = time.perf_counter()
                row = stream_eq_check(spark, sf_dir, op)
                key = f"stream_eq.{op}"
                timings[key] = round(time.perf_counter() - t0, 4)
                print(
                    f"# {key}: {timings[key]:.3f}s equal={row[3]}", file=sys.stderr
                )
            continue
        if name == "ann_recall_report":
            # r9 verdict item 3 — the stream_eq treatment applied to
            # the ANN report: the exact-truth leg, the four top-k
            # tiers, and the threshold-join parity rows each get their
            # OWN BENCH_DETAIL row (summing to what the blob measured),
            # so a regression in one tier compares against its own
            # baseline instead of hiding inside an ~11 s aggregate.
            from engine.similarity import ANN_BENCH_LEGS, ann_bench_leg

            ctx: dict = {}
            for leg in ANN_BENCH_LEGS:
                t0 = time.perf_counter()
                n = ann_bench_leg(spark, sf_dir, leg, ctx)
                key = f"ann.{leg}"
                timings[key] = round(time.perf_counter() - t0, 4)
                print(f"# {key}: {timings[key]:.3f}s rows={n}", file=sys.stderr)
            continue
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    # ablation hygiene: 89 queries leave cached relations, shuffle
    # files and localCheckpoint blocks behind; without a sweep the
    # ablation joins time memory pressure, not plan shape (observed:
    # salted_join 3.7 s standalone vs 8.6 s at the end of a full run)
    def _sweep():
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    _sweep()
    ablations = _bucketed_join_ablation(spark, sf_dir)
    print(f"# bucketed-join ablation: {ablations}", file=sys.stderr)
    _sweep()
    ablations.update(_skew_ablation(spark, sf_dir))
    print(f"# skew ablation: { {k: v for k, v in ablations.items() if k.startswith('skew')} }", file=sys.stderr)
    _sweep()
    ablations.update(_grouped_topk_ablation(spark, sf_dir))
    print(f"# grouped-topk ablation: { {k: v for k, v in ablations.items() if k.startswith('topk')} }", file=sys.stderr)

    total = round(sum(timings.values()), 4)
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "ablations": ablations,
        "sf": sf,
    }
    print(json.dumps(detail), file=sys.stderr)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    # compact machine-readable line LAST on stdout (driver tail window)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
