"""Plan-shape regressions: the physical plans we iterated to must not
silently degrade (SURVEY §4: Catalyst covers the reference's optimizer
surface — these tests pin the wins)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from engine import relational, text


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q01_pushdown_and_single_shuffle(spark, sf_dir):
    plan = _plan(relational.q01_pricing_summary(spark, sf_dir))
    # filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # partial+final agg → exactly one exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_sum" in plan


def test_q01_column_pruning(spark, sf_dir):
    plan = _plan(relational.q01_pricing_summary(spark, sf_dir))
    # 7 of 11 lineitem columns read — never the whole row
    import re

    cols = re.search(r"FileScan parquet \[([^\]]*)\]", plan).group(1).split(",")
    assert len(cols) == 7


def test_q02_dims_broadcast(spark, sf_dir):
    plan = _plan(relational.q02_revenue_by_nation(spark, sf_dir))
    # all explicitly-broadcast dims become BroadcastExchange (customer,
    # nation, region; AQE may add orders at small SF)
    assert plan.count("BroadcastExchange") >= 3
    # the fact table never shuffles for the dim joins: at most the
    # lineitem⋈orders join + final agg produce exchanges
    assert plan.count("Exchange hashpartitioning") <= 3


def test_q06_no_shuffle_single_scan(spark, sf_dir):
    plan = _plan(relational.q06_forecast_revenue(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 0  # global agg: partial+final, no hash exchange
    assert plan.count("FileScan") == 1


def test_text_ops_stay_jvm_side(spark, sf_dir):
    # dedup/minhash/simhash must not spawn Python workers (hot path)
    for fn in (text.q50_dedup_exact, text.q54_minhash_candidates, text.q55_simhash):
        plan = _plan(fn(spark, sf_dir))
        assert "EvalPython" not in plan, fn.__name__


def test_q81_range_join_broadcasts_bands(spark, sf_dir):
    plan = _plan(relational.q81_range_join(spark, sf_dir))
    # non-equi join against the tiny band dim must be a broadcast
    # nested-loop probe — the lineitem side shuffles only for the agg
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_q82_rollup_single_shuffle(spark, sf_dir):
    plan = _plan(relational.q82_time_rollup(spark, sf_dir))
    # one-pass rollup: expand + partial agg before a single exchange
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Expand" in plan
    assert "partial_" in plan

def test_q89_joins_on_composite_block_key(spark, sf_dir):
    plan = _plan(relational.q89_fuzzy_match(spark, sf_dir))
    # the self-join's equi key is the composite (brand, length-band)
    # block key — never an unblocked cross/nested-loop pair explosion
    assert "block_key" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q52_verifies_lsh_candidates_not_all_pairs(spark, sf_dir):
    plan = _plan(text.q52_ngram_jaccard(spark, sf_dir))
    # exact-jaccard verification must be driven by the LSH banding
    # candidate pairs (band_key bucket join), not a corpus-wide
    # shingle self-join
    assert "band_key" in plan
    assert "CartesianProduct" not in plan


def test_q79_mix_broadcasts_census_no_global_window(spark, sf_dir):
    plan = _plan(text.q79_corpus_mix(spark, sf_dir))
    # the per-lang census + budget attach to the corpus via broadcast
    # joins — NO window anywhere (the global-min-window formulation
    # would funnel the whole corpus through one partition; the only
    # SinglePartition exchange allowed is the |langs|-row budget agg)
    assert plan.count("BroadcastExchange") >= 2
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_q78_pii_scrub_stays_jvm_side(spark, sf_dir):
    plan = _plan(text.q78_pii_scrub(spark, sf_dir))
    # regex work is codegen'd expressions, not Python
    assert "EvalPython" not in plan
    # narrow projection: no exchange at all
    assert "Exchange" not in plan


def test_q46_gap_fill_single_user_partitioning(spark, sf_dir):
    plan = _plan(relational.q46_gap_fill(spark, sf_dir))
    # one user_id-keyed exchange family serves agg+join+window; no
    # single-partition collapse
    assert "Exchange SinglePartition" not in plan
    assert "EvalPython" not in plan


def test_q48_decontaminate_broadcasts_eval_no_python(spark, sf_dir):
    # the eval shingle set (benchmark-scale) must broadcast — the
    # corpus side never shuffles its shingle stream for the probe —
    # and the whole scrub stays JVM-side
    plan = _plan(text.q48_decontaminate(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    # one corpus pass: the documents scan appears exactly twice in the
    # whole plan (corpus side + eval side), never a third time
    assert plan.count("FileScan parquet") == 2


def test_q49c_chunking_is_shuffle_free(spark, sf_dir):
    # per-doc chunking is scan → project → generate: any Exchange
    # would mean the layout op started paying a 100 TB shuffle
    plan = _plan(text.q49c_rag_chunking(spark, sf_dir))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert plan.count("FileScan") == 1


def test_q57b_shuffle_carries_hashes_not_grams(spark, sf_dir):
    # the gram-count shuffle must be keyed on xxhash64, never the gram
    # strings (q48's discipline: 8-byte keys at 100 TB)
    plan = _plan(text.q57b_repetition_signals(spark, sf_dir))
    assert "EvalPython" not in plan
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)", plan):
        assert "gram" not in m.group(1), m.group(0)


def test_q67b_recount_broadcasts_candidates(spark, sf_dir):
    # phase 2's exact recount must be a broadcast join (candidate set
    # is O(capacity × partitions)); the token stream itself must never
    # hash-shuffle to meet the candidates
    plan = _plan(text.q67b_heavy_hitters(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "BroadcastHashJoin" in plan


def test_q81b_band_join_is_equi_hash_join(spark, sf_dir):
    # the whole point of bucketizing the band: a hash EQUI-join on the
    # probed bucket, never a cartesian/nested-loop theta join
    plan = _plan(relational.q81b_band_self_join(spark, sf_dir))
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
    assert any(j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))


def test_q122_entropy_is_shuffle_free(spark, sf_dir):
    # the run-length fold computes per-doc entropy WITHOUT exploding:
    # scan -> project (+ the fixture orderBy's range exchange is the
    # only allowed movement); a hash exchange would mean the op
    # regressed to the explode->groupBy form
    plan = _plan(text.q122_token_entropy(spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan
    assert "EvalPython" not in plan
    assert plan.count("FileScan") == 1


def test_checkpoint_collapses_scans(spark, sf_dir):
    """The 100 TB shared-subtree fix, pinned as a plan shape (r7
    verdict item 2): Catalyst plans a shared subtree once PER USE, so
    q125's census scans the corpus 4x, q124's matched/totals frames
    2x each, and q129's composition re-plans its members. The
    ``checkpointed=True`` paths pin the narrow derived frames via
    io.materialize — the corpus FileScan count in the returned plan
    must drop to 0 (q125/q124: every leg reads the pin) resp. 1
    (q129: only the doc_id spine), with byte-identical output."""
    # lazy plans really do multiply the corpus subtree — the fact
    # that makes the fix worth pinning (r10: the pin IS the default
    # for q124/q125/q135; the lazy variant stays the reference shape)
    assert _plan(
        text.q125_length_outliers(spark, sf_dir, checkpointed=False)
    ).count("FileScan") == 4
    assert _plan(
        text.q124_hybrid_rrf(spark, sf_dir, checkpointed=False)
    ).count("FileScan") == 4

    from engine import multimodal

    for fn, n_scans in (
        (text.q125_length_outliers, 0),
        (text.q124_hybrid_rrf, 0),
        (text.q129_decontamination_defense, 1),
        # q131: the pin means payloads are DECODED once, not twice —
        # no FileScan and no MapInPandas subtree left in the plan
        (multimodal.q131_phash_neardup, 0),
        # q135: 57 lazy FileScans (6 count legs × the stage chain)
        # drop to zero — every leg reads a pinned doc_id spine
        (text.q135_incremental_curation, 0),
    ):
        ck = fn(spark, sf_dir, checkpointed=True)
        plan = _plan(ck)
        assert plan.count("FileScan") == n_scans, fn.__name__
        assert "ExistingRDD" in plan, fn.__name__  # the pinned frames
        lazy = [tuple(r) for r in fn(spark, sf_dir, checkpointed=False).collect()]
        pinned = [tuple(r) for r in ck.collect()]
        assert pinned == lazy, fn.__name__


def test_band_index_consumers_probe_shared_store(spark, sf_dir):
    """r8 verdict item 6, pinned: with the banded index PERSISTED once
    (build_band_index, bucketed+sorted on the band key), every
    consumer probes the store instead of rebuilding it —

    * q118 index path: the history side reads the bucketed scan
      (SelectedBucketsCount), the probe join's only band_key exchange
      is the batch side's, and no shingle/minhash subtree remains in
      the plan (zero index rebuild).
    * q66 index path: BOTH sides of the bucket self-join read the
      bucketed scan co-located; the only exchange is the probe side's
      xor'd bucket. No normalization/hashing recompute in-plan.
    * q61 index path: probes broadcast, store side exchange-free.

    Outputs byte-identical to the in-plan derivations (asserted here
    at fixture SF; the equivalence is deterministic by construction)."""
    from engine import similarity
    from engine.text import build_band_index, q118_incremental_neardup

    spark.sql("DROP TABLE IF EXISTS t_band_idx")
    spark.sql("DROP TABLE IF EXISTS s_band_idx")
    build_band_index(spark, sf_dir, "t_band_idx", n_buckets=8)
    similarity.build_band_index(spark, sf_dir, "s_band_idx", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # --- q118 through the store
        df = q118_incremental_neardup(spark, sf_dir, index_table="t_band_idx")
        plan = _plan(df)
        assert "SelectedBucketsCount" in plan
        # zero index rebuild: the minhash derivation (posexplode of the
        # shingle array + the seed/minhash agg) is absent
        assert "posexplode" not in plan and "minhash" not in plan
        default = [tuple(r) for r in q118_incremental_neardup(spark, sf_dir).collect()]
        assert [tuple(r) for r in df.collect()] == default

        # --- q66 through the store: one exchange, the probe side's
        df66 = similarity.q66_embedding_near_dup(spark, sf_dir, index_table="s_band_idx")
        plan66 = _plan(df66)
        assert plan66.count("SelectedBucketsCount") == 2
        import re

        keys = re.findall(r"Exchange hashpartitioning\((\w+)", plan66)
        assert keys == ["probe_bucket"], keys
        d66 = [tuple(r) for r in similarity.q66_embedding_near_dup(spark, sf_dir).collect()]
        assert [tuple(r) for r in df66.collect()] == d66

        # --- q61 through the store: store side exchange-free
        df61 = similarity.q61_knn_lsh_bucketed(spark, sf_dir, index_table="s_band_idx")
        d61 = [tuple(r) for r in similarity.q61_knn_lsh_bucketed(spark, sf_dir).collect()]
        assert [tuple(r) for r in df61.collect()] == d61
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_band_idx")
        spark.sql("DROP TABLE IF EXISTS s_band_idx")


def test_band_index_banded_variant_identical(spark, sf_dir):
    """The multi-band index (forced wide width ⇒ n_bands>1, the 100 TB
    derived geometry) round-trips through the store byte-identically
    for both consumers, width/bands recovered from the index itself."""
    from engine import similarity

    spark.sql("DROP TABLE IF EXISTS s_band_idx_b")
    similarity.build_band_index(spark, sf_dir, "s_band_idx_b", n_planes=12, n_bands=3, n_buckets=8)
    try:
        for fn in (similarity.q61_knn_lsh_bucketed, similarity.q66_embedding_near_dup):
            direct = [tuple(r) for r in fn(spark, sf_dir, n_planes=12, n_bands=3).collect()]
            via = [tuple(r) for r in fn(spark, sf_dir, index_table="s_band_idx_b").collect()]
            assert via == direct, fn.__name__
    finally:
        spark.sql("DROP TABLE IF EXISTS s_band_idx_b")


def test_append_band_index_matches_rebuild(spark, sf_dir):
    """Nightly index maintenance (append_band_index): building the
    store from the standing split and APPENDING the batch split must
    equal the from-scratch full build row-for-row, keep the q118
    consumer byte-identical, and keep the bucketed probe co-located
    (SelectedBucketsCount survives appends — insertInto writes into
    the same bucket space)."""
    from pyspark.sql import functions as F

    from engine import text
    from engine.session import table

    d = table(spark, sf_dir, "documents")
    hist = d.filter(F.col("doc_id") % text.INCR_BATCH_MOD != 0)
    batch = d.filter(F.col("doc_id") % text.INCR_BATCH_MOD == 0)
    spark.sql("DROP TABLE IF EXISTS idx_full_t")
    spark.sql("DROP TABLE IF EXISTS idx_incr_t")
    try:
        text.build_band_index(spark, sf_dir, "idx_full_t", n_buckets=8)
        text.build_band_index(spark, sf_dir, "idx_incr_t", n_buckets=8, docs=hist)
        text.append_band_index(spark, "idx_incr_t", batch)
        full = sorted(map(tuple, spark.table("idx_full_t").collect()))
        incr = sorted(map(tuple, spark.table("idx_incr_t").collect()))
        assert full == incr and len(full) > 0
        a = text.q118_incremental_neardup(spark, sf_dir).collect()
        b = text.q118_incremental_neardup(spark, sf_dir, index_table="idx_incr_t").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            probe = text._banded_signatures(batch).alias("n").join(
                spark.table("idx_incr_t").alias("h"), "band_key"
            )
            assert "SelectedBucketsCount" in _plan(probe)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS idx_full_t")
        spark.sql("DROP TABLE IF EXISTS idx_incr_t")
