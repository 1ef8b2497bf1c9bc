"""Text-analysis & deduplication operators (north-star extension, SURVEY §2.6 last row).

The LLM-training-data surface over ``documents``: exact dedup,
content fingerprinting, n-gram Jaccard near-dup, MinHash+LSH banding,
SimHash, language-ID heuristic, quality scoring, token statistics.

Everything here is pure JVM-side expression work (split/transform/
aggregate higher-order functions + md5) — no Python UDFs in any hot
path. Hashes are md5-based so the DuckDB oracle reproduces every
value bit-for-bit (engine-portable content addressing; xxhash64 etc.
differ per engine).

Scale posture (100 TB):
* exact dedup = one hash aggregation on the text hash (not the text);
  at scale, group on sha2/md5 so the shuffle carries 16-byte keys,
  not documents.
* near-dup: candidate generation is MinHash banding (q54) — the
  classic shingle→minhash→band→bucket-join pipeline whose shuffle
  volume is O(docs × bands), independent of pair count; exact
  verification (q52) joins the candidate pair list to the shingle
  index — linear in candidates, never all-pairs.
* SimHash (q55) gives a 16-bit bucket key; near-dup candidates are
  same-bucket or Hamming-1 buckets — O(docs) shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .session import table

N_MINHASH = 8          # signature length
N_BANDS = 4            # LSH bands (rows per band = 2)
SIMHASH_BITS = 16

# affine universal hash family for MinHash: h_s(x) = (a_s·h(x) + b_s) mod M.
# M = 2³¹−1 (Mersenne prime); a_s odd, large, fixed — one base md5 per
# shingle instead of one per (shingle, seed).
MINHASH_M = (1 << 31) - 1
MINHASH_A = [1103515245, 1299709387, 1500450271, 1700000077, 1103547991, 1327144003, 1611623797, 1805651261]
MINHASH_B = [12345, 7919, 104729, 224737, 350377, 479909, 611953, 746773]

# deterministic 60-bit hash of a string, identical in Spark and DuckDB
_SPARK_H60 = "cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"
_DUCK_H60 = "(('0x' || substr(md5({expr}), 1, 15))::bigint)"

# word-3-gram shingle set (distinct), Spark side; tokens 0-indexed
_SPARK_SHINGLES = """
    array_distinct(CASE WHEN size(toks) >= 3 THEN
        transform(sequence(0, size(toks) - 3),
                  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
        ELSE array() END)
"""
# same in DuckDB; lists 1-indexed
_DUCK_TOKS = "string_split_regex(trim(text), ' +')"
_DUCK_SHINGLES_SQL = f"""
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(toks) >= 3 THEN
            list_transform(generate_series(1, len(toks) - 2),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        ELSE [] END)) AS shingle
    FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents) t
"""


CHUNK_TOKENS = 12  # fixed span/chunk width shared by q97 and q48b

# DuckDB twin of _doc_chunks, shared by the q97/q48b oracles: expects
# a `toks` relation (doc_id, t) in scope; fixed series + WHERE because
# DuckDB lateral generate_series can't reference outer columns.
_DUCK_CHUNKS = f"""
    SELECT doc_id, g.i::int AS pos,
           t[(g.i * {CHUNK_TOKENS} + 1):((g.i + 1) * {CHUNK_TOKENS})] AS ct
    FROM toks, generate_series(0, 100000) AS g(i)
    WHERE g.i < ceil(len(t) / {CHUNK_TOKENS}.0)"""


def _duck_kept_md5(keep: str) -> str:
    """DuckDB twin of _kept_text_md5: md5 of the pos-ordered rebuild
    from the chunks satisfying ``keep`` (md5('') when none survive)."""
    return (
        f"md5(coalesce(string_agg(chunk, ' ' ORDER BY pos)"
        f" FILTER (WHERE {keep}), ''))"
    )


def _with_shingles(df: DataFrame) -> DataFrame:
    """(doc_id, shingle) — exploded distinct word-3-gram shingles."""
    return (
        df.select("doc_id", F.split(F.trim(F.col("text")), " +").alias("toks"))
        .select("doc_id", F.explode(F.expr(_SPARK_SHINGLES)).alias("shingle"))
    )


# ------------------------------------------------------------------ exact dedup

def q50_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by content hash, keep lowest doc_id.

    Grouping on md5(text) — at 100 TB the shuffle carries 16-byte
    keys; the keeper choice (min id) is deterministic.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.col("text")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def q51_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc content fingerprint of normalized text (lower, squeeze
    whitespace) — the canonical-form dedup key."""
    d = table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


# --------------------------------------------------------------- near-dup exact

def q52_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard over the q54 LSH candidate pairs — the
    verification stage of the candidate→verify near-dup pipeline.

    The pair set comes from MinHash banding (O(docs × bands) shuffle,
    q54); each candidate pair's exact intersection is then counted by
    joining the pair list to the shingle index on (doc, shingle-hash).
    Work is O(candidates × shingles-per-doc) — linear in candidates,
    never all-pairs, so one viral shingle can no longer fan out k²
    join rows (that was the r1 corpus-wide shape; the same final
    jaccard ≥ 0.2 cut applies, restricted to LSH candidates)."""
    # NB: measured — caching the exploded shingles here is 5× SLOWER
    # than recompute (materialization + lost codegen pipelining); at
    # real scale the shingle/signature stage is checkpointed to
    # parquet instead (engine/io.py:checkpoint)
    # The join key is xxhash64(shingle), not the string — same pairs
    # (collisions ~2⁻⁶⁴), a fraction of the shuffle bytes. The key
    # never appears in the output, so it doesn't need to be
    # oracle-portable (measured: md5-based portable key was 45% slower
    # than xxhash64 — hex parsing dominates).
    cand = q54_minhash_candidates(spark, sf_dir).select("doc_a", "doc_b")
    sh = _with_shingles(table(spark, sf_dir, "documents")).select(
        "doc_id", F.xxhash64("shingle").alias("sh_h")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh_h")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh_h")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh_h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("jaccard", F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6))
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
    )


CONTAIN_MIN = 0.8  # flag a pair when either side is ≥80% contained


def q133_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT verification — the asymmetric near-dup
    Jaccard under-reports (Broder's containment c(A,B) = |A∩B|/|A|):
    a document quoted whole inside a 2× larger page has c(A,B) = 1.0
    but Jaccard only ~0.5, so a Jaccard-thresholded pipeline keeps
    BOTH copies. The quote-expansion / boilerplate-wrapper case is
    the classic miss in crawl dedup (Lee et al. 2021 §4); this emits
    both directed containments plus their max over the q54 candidate
    graph so the curation policy can drop the contained side.

    Honest recall note: candidates still come from MinHash banding,
    which models JACCARD — a pair at containment 1.0 but Jaccard
    ≪ LSH_TARGET_SIM may not band-collide (at fixture thresholds a
    ≥50%-size contained doc does; the planted test pins one). The
    extreme small-inside-huge case is q113's substring-dedup job
    (exact, alignment-invariant); this operator is the shingle-set
    middle ground.

    Scale shape: identical to q52 — pair-list ⋈ shingle index on
    xxhash64 keys, O(candidates × shingles/doc), never all-pairs;
    sizes ride the same index scan. Output: (doc_a, doc_b, n_inter,
    contain_a, contain_b, max_containment ≥ CONTAIN_MIN), rounded to
    the 1e-6 grid from exact integer counts — bit-portable."""
    cand = q54_minhash_candidates(spark, sf_dir).select("doc_a", "doc_b")
    sh = _with_shingles(table(spark, sf_dir, "documents")).select(
        "doc_id", F.xxhash64("shingle").alias("sh_h")
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh_h")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh_h")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "sh_h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = F.round(F.col("n_inter") / F.col("na"), 6)
    cb = F.round(F.col("n_inter") / F.col("nb"), 6)
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_inter",
            ca.alias("contain_a"),
            cb.alias("contain_b"),
            F.greatest(ca, cb).alias("max_containment"),
        )
        .filter(F.col("max_containment") >= CONTAIN_MIN)
        .orderBy("doc_a", "doc_b")
    )


def q134_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation FUNNEL — the survival report every training-data
    pipeline publishes: how many documents clear each cumulative gate,
    and what each gate costs. Stages (each applied to the previous
    stage's survivors):

    0. ingested — the raw corpus;
    1. holdout_carveout — the q48 eval split (doc_id %
       DECON_HOLDOUT_MOD == 0) leaves the training side;
    2. exact_dedup — q50 semantics within the survivors (keep min
       doc_id per md5);
    3. near_dup — q54 candidates at q80's est_jaccard ≥ 0.5 threshold
       restricted to surviving endpoints → connected components →
       non-keepers (doc ≠ component min) drop;
    4. quality — q57/q68's exact composite score ≥ 0.5;
    5. decontaminated — q48's verdict (n_hits ≥ DECON_MIN_HITS)
       drops flagged docs; docs with no shingles are structurally
       clean (q48's own semantics).

    Composition, not duplication: every gate reuses the member
    operator's exact expressions/machinery (md5 keep-first window,
    q54 candidates, shared connected_components, q68's quality
    column, q48's output), and the oracle embeds the member SQL the
    same way. Counts are exact bigints; drop_ppm is integer-division
    ppm of the PREVIOUS stage (nullif-guarded) — bit-portable.

    Scale shape: each gate is the member's documented plan; the
    funnel adds only doc_id semi/anti joins (16-byte keys) and a
    six-row final frame. The component input is the verified
    candidate list (output-scale, q80's argument). r10: the s2/s4
    spines are pinned (io.materialize — Catalyst otherwise replans
    the nested stage chain once per count leg, q139's measured
    O(stages²) recompute: 20 corpus scans / 44 exchanges in the lazy
    plan) and the independent q48 verdict leg overlaps the dedup
    chain on a driver thread (guide-§2.6 back-fill); output is
    byte-identical — the strict q134 oracle gates the refactor."""
    d = table(spark, sf_dir, "documents")
    from concurrent.futures import ThreadPoolExecutor

    from .io import materialize

    s1 = d.filter(F.col("doc_id") % DECON_HOLDOUT_MOD != 0)
    with ThreadPoolExecutor(max_workers=1) as pool:
        contaminated_fut = pool.submit(
            lambda: materialize(
                q48_decontaminate(spark, sf_dir)
                .filter(F.col("contaminated"))
                .select("doc_id")
            )
        )
        s2 = materialize(
            s1.groupBy(F.md5(F.col("text")).alias("h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        pairs = (
            q54_minhash_candidates(spark, sf_dir)
            .filter(F.col("est_jaccard") >= 0.5)
            .join(s2.withColumnRenamed("doc_id", "doc_a"), "doc_a")
            .join(s2.withColumnRenamed("doc_id", "doc_b"), "doc_b")
            .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        )
        comps = connected_components(pairs)
        contaminated = contaminated_fut.result()
    s3 = s2.join(
        comps.filter(F.col("doc_id") != F.col("component")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    toks = F.split(F.trim(F.col("text")), " +")
    n_tokens = F.size(toks)
    quality = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.size(F.array_distinct(toks)) / n_tokens)
        + 0.3 * F.least(
            F.length(F.regexp_replace(F.trim(F.col("text")), " +", "")) / n_tokens / F.lit(10.0),
            F.lit(1.0),
        )
    )
    s4 = materialize(
        s3.join(d, "doc_id")
        .withColumn("quality", quality)
        .filter(F.col("quality") >= 0.5)
        .select("doc_id")
    )
    s5 = s4.join(contaminated, "doc_id", "left_anti")

    stages = [
        (0, "ingested", d.select("doc_id")),
        (1, "holdout_carveout", s1.select("doc_id")),
        (2, "exact_dedup", s2),
        (3, "near_dup", s3),
        (4, "quality", s4),
        (5, "decontaminated", s5),
    ]
    return _funnel_tail(stages)


def _funnel_tail(stages) -> DataFrame:
    """Shared survival-report tail for the curation funnels (q134,
    q135): per-stage exact counts, drops vs the previous stage, and
    integer-division ppm — bit-portable by construction."""
    counts = None
    for i, gate, frame in stages:
        row = frame.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(i).alias("stage"), F.lit(gate).alias("gate"), "n_docs"
        )
        counts = row if counts is None else counts.unionAll(row)
    w = Window.orderBy("stage")  # 6-row frame: the single partition is bounded
    return (
        counts.withColumn("prev", F.lag("n_docs").over(w))
        .select(
            "stage",
            "gate",
            "n_docs",
            F.coalesce(F.col("prev") - F.col("n_docs"), F.lit(0)).alias("n_dropped"),
            F.coalesce(
                F.expr("(prev - n_docs) * 1000000 div nullif(prev, 0)"), F.lit(0)
            ).alias("drop_ppm"),
        )
        .orderBy("stage")
    )


def q135_incremental_curation(
    spark: SparkSession,
    sf_dir: str,
    index_table: str | None = None,
    checkpointed: bool = True,
    index_is_corpus: bool = False,
    return_survivors: bool = False,
) -> DataFrame:
    """Cross-snapshot INCREMENTAL curation — q134's funnel run as the
    nightly DELTA job (r8 verdict item 8): only the documents that are
    ADDED or CHANGED between snapshot A and snapshot B (q107's diff
    semantics, same fixture constants) pass through the gates, and the
    dedup gates probe the STANDING already-curated corpus instead of
    re-curating it. This is the shape real pipelines run nightly: the
    full q134 funnel is the quarterly compaction; this is the daily
    increment.

    Stages over the delta (each gate reuses the member machinery):

    0. delta_ingested — q107's added ∪ changed rows, snapshot-B text;
    1. holdout_carveout — q48's eval split leaves the training side;
    2. exact_dedup — within-delta keep-first md5 (q50) PLUS an
       anti-join against the standing corpus's md5 store (q102's
       fingerprint-store probe);
    3. near_dup — q118's ingest probe verbatim: banded-signature
       candidates against the standing corpus AND within the delta
       (hot-band-capped), verified at ≥ NEARDUP_MATCH_MIN/8 agreeing
       minhash positions (= q134's est_jaccard ≥ 0.5 gate);
    4. quality — q57/q68's exact composite ≥ 0.5 on the B-text;
    5. decontaminated — q48's verdict against the FROZEN eval suite
       (benchmarks don't change nightly, so eval shingles come from
       the original documents' holdout split).

    Scale shape (100 TB standing, TB-scale delta): every standing-side
    touch is a probe — md5 anti-join on 16-byte keys, band-store
    equi-join (pass ``index_table=`` to read the persisted
    ``build_band_index`` store co-located; standing docs are by
    definition unchanged, so their indexed signatures are valid),
    broadcast eval shingles. Nothing re-scans, re-pairs, or re-scores
    the standing corpus; delta-side work is q134's machinery at delta
    size. No connected components: the delta probes keep-first against
    history (q118's pairwise argument — global transitive closure is
    the compaction job's, not the nightly's).

    Oracle: member-SQL composition over the same snapshot CTEs (the
    within-delta band self-join is uncapped there, valid while fixture
    band occupancy < NEARDUP_BAND_CAP — q118's documented pattern).

    ``index_is_corpus=True`` (opt-in, with ``index_table=``): the store
    is trusted as EXACTLY the curated standing corpus — the production
    nightly shape, where the band index is maintained by
    ``q135_admit_survivors`` appends and outlives any one snapshot pair
    — so the standing-id semi-join (needed when the shared index was
    built over the FULL documents table and must be restricted to the
    standing split) is skipped. On such a store the near-dup gate sees
    every previously ADMITTED doc, including docs the snapshot mod-math
    cannot express as standing; a re-ingested already-admitted doc
    self-matches its own store rows and drops, which is the correct
    ingest-dedup verdict.

    ``return_survivors=True``: return the survivors themselves —
    (doc_id, text) with snapshot-B text — instead of the funnel
    summary; this is the admission leg's input (the funnel numbers are
    unchanged, it is the same s5 spine).

    ``checkpointed=True`` (the r10 DEFAULT — measured ×0.67 at sf0.1;
    q124/q125's shared-subtree fix): Catalyst plans the stage chain
    once PER COUNT LEG — 57 FileScans in the lazy returned plan
    (PLANS.json still snapshots that variant via
    tools/plan_snapshot.py's lazy-variant hook). The pin materializes
    each narrow per-stage doc_id spine (delta-sized, tiny) via
    io.materialize, so every count leg reads a pinned frame and each
    stage build replans from the previous pin + one corpus scan:
    returned-plan FileScans drop to ZERO (plan-pinned in
    tests/test_plans.py) with byte-identical output."""
    from .relational import SNAP_ABSENT_A_MOD, SNAP_ABSENT_B_MOD, SNAP_EDIT_B_MOD

    def _pin(df: DataFrame) -> DataFrame:
        if not checkpointed:
            return df
        from . import io as _io

        return _io.materialize(df)

    d = table(spark, sf_dir, "documents")
    b_text = F.when(
        F.col("doc_id") % SNAP_EDIT_B_MOD == 0, F.concat(F.col("text"), F.lit(" rev2"))
    ).otherwise(F.col("text"))
    snap_b = d.filter(F.col("doc_id") % SNAP_ABSENT_B_MOD != 0).select(
        "doc_id", b_text.alias("text")
    )
    in_a = F.col("doc_id") % SNAP_ABSENT_A_MOD != 0
    edited = F.col("doc_id") % SNAP_EDIT_B_MOD == 0
    delta = snap_b.filter(~in_a | edited)
    standing = snap_b.filter(in_a & ~edited)

    delta_ids = _pin(delta.select("doc_id"))
    s1 = delta.filter(F.col("doc_id") % DECON_HOLDOUT_MOD != 0)
    s1_ids = _pin(s1.select("doc_id"))
    # under the pin, downstream gates replan from the pinned spine +
    # one snap_b join instead of the whole delta chain
    s1_src = s1 if not checkpointed else s1_ids.join(snap_b, "doc_id")

    # gate 2: within-delta keep-first + standing fingerprint-store probe
    stand_h = standing.select(F.md5("text").alias("h"))
    s2 = _pin(
        s1_src.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .join(stand_h, "h", "left_anti")
        .select("doc_id")
    )

    # gate 3: q118's probe — delta bands vs standing store + within-delta
    dbands = _banded_signatures(s2.join(snap_b, "doc_id"))
    if index_table:
        sbands = spark.table(index_table)
        if not index_is_corpus:
            # shared FULL-corpus index: standing docs are unchanged, so
            # the store's rows for them ARE their snapshot-B signatures
            # — but the store also indexes non-standing docs, so
            # restrict to the standing split
            sbands = sbands.join(standing.select("doc_id"), "doc_id", "left_semi")
    else:
        sbands = _banded_signatures(standing)
    n_match = F.expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), t -> t))")
    hist_dup = (
        dbands.alias("n")
        .join(sbands.alias("h"), "band_key")
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("n.sig").alias("sa"),
            F.col("h.sig").alias("sb"),
        )
        .withColumn("m", n_match)
        .filter(F.col("m") >= NEARDUP_MATCH_MIN)
        .select("doc_id")
        .distinct()
    )
    batch_dup = (
        _batch_band_candidates(dbands)
        .withColumn("m", n_match)
        .filter(F.col("m") >= NEARDUP_MATCH_MIN)
        .select("doc_id")
        .distinct()
    )
    s3 = _pin(
        s2.join(hist_dup, "doc_id", "left_anti").join(
            batch_dup, "doc_id", "left_anti"
        )
    )

    # gate 4: q134's exact quality composite on the B-text
    toks = F.split(F.trim(F.col("text")), " +")
    n_tokens = F.size(toks)
    quality = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.size(F.array_distinct(toks)) / n_tokens)
        + 0.3 * F.least(
            F.length(F.regexp_replace(F.trim(F.col("text")), " +", "")) / n_tokens / F.lit(10.0),
            F.lit(1.0),
        )
    )
    s4 = _pin(
        s3.join(snap_b, "doc_id")
        .withColumn("quality", quality)
        .filter(F.col("quality") >= 0.5)
        .select("doc_id")
    )

    # gate 5: q48 against the frozen eval suite (original holdout text)
    eval_sh = (
        _with_shingles(d.filter(F.col("doc_id") % DECON_HOLDOUT_MOD == 0))
        .select(F.xxhash64("shingle").alias("sh_h"))
        .distinct()
    )
    surv_sh = _with_shingles(s4.join(snap_b, "doc_id")).select(
        "doc_id", F.xxhash64("shingle").alias("sh_h")
    )
    contaminated = (
        surv_sh.join(F.broadcast(eval_sh), "sh_h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= DECON_MIN_HITS)
        .select("doc_id")
    )
    s5 = _pin(s4.join(contaminated, "doc_id", "left_anti"))

    if return_survivors:
        return s5.join(snap_b, "doc_id").select("doc_id", "text")
    return _funnel_tail(
        [
            (0, "delta_ingested", delta_ids),
            (1, "holdout_carveout", s1_ids),
            (2, "exact_dedup", s2),
            (3, "near_dup", s3),
            (4, "quality", s4),
            (5, "decontaminated", s5),
        ]
    )


def q135_admit_survivors(
    spark: SparkSession,
    sf_dir: str,
    index_table: str,
    checkpointed: bool = False,
) -> DataFrame:
    """The night-CLOSE leg of the q135 cycle: run tonight's delta
    through the gates against the standing-corpus band store, then
    ADMIT the survivors into that same store (``append_band_index``),
    so tomorrow night's probe sees them as history. This closes the
    loop the probe-only q135 leaves open — without admission, a
    near-dup of tonight's survivor sails through tomorrow.

    The store must be a curated-corpus index (``build_band_index``
    over the standing split, maintained solely by this function) —
    the run probes it with ``index_is_corpus=True``. Append-only
    semantics and the rebuild-equality contract are
    ``append_band_index``'s; the two-night planted test pins that a
    night-1 admit is flagged near_dup on night 2 byte-equal to a
    from-scratch rebuild over standing ∪ admitted."""
    survivors = q135_incremental_curation(
        spark,
        sf_dir,
        index_table=index_table,
        checkpointed=checkpointed,
        index_is_corpus=True,
        return_survivors=True,
    )
    return append_band_index(spark, index_table, survivors)


# -------------------------------------------------------------------- MinHash

def minhash_signatures(df: DataFrame) -> DataFrame:
    """(doc_id, seed, minhash): ONE base md5 per shingle, then the
    classic affine universal family h_s(x) = (a_s·h(x) + b_s) mod M
    per seed — signature = min over the doc's shingle set.

    One explode + one hash agg, O(docs × seeds) shuffle; hashing cost
    is O(shingles), not O(shingles × seeds): deriving the 8 per-seed
    values from the base hash with two integer ops each measured 2.8×
    faster than 8 fresh md5s at sf0.1 (2.5 s → 0.9 s). All constants
    fit int64 (a_s < 2³¹, h mod M < 2³¹ ⇒ a_s·h < 2⁶², no overflow in
    either engine), and the identical arithmetic runs in the DuckDB
    oracle."""
    sh = _with_shingles(df)
    base = sh.select(
        "doc_id", (F.expr(_SPARK_H60.format(expr="shingle")) % F.lit(MINHASH_M)).alias("h0")
    )
    seeds = F.explode(F.array(*[F.lit(i) for i in range(N_MINHASH)])).alias("seed")
    mixed = base.select("doc_id", "h0", seeds).withColumn(
        "h",
        (
            F.element_at(F.array(*[F.lit(a) for a in MINHASH_A]), F.col("seed") + 1) * F.col("h0")
            + F.element_at(F.array(*[F.lit(b) for b in MINHASH_B]), F.col("seed") + 1)
        )
        % F.lit(MINHASH_M),
    )
    return mixed.groupBy("doc_id", "seed").agg(F.min("h").alias("minhash"))


def q53_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(table(spark, sf_dir, "documents")).orderBy("doc_id", "seed")


def _per_doc_sig_frame(df: DataFrame) -> DataFrame:
    """(doc_id, sig array<bigint>) — the per-doc minhash signature in
    ONE aggregation: the N_MINHASH per-seed minima are N_MINHASH
    aggregate expressions over the base-hash rows (identical affine
    arithmetic to minhash_signatures, exact int64, so sig[i] is
    bit-identical to the row form's seed-i minhash), assembled into
    the array inside the agg. The r9 shape exploded every shingle
    hash ×N_MINHASH and paid TWO shuffles (min per (doc, seed), then
    collect_list+sort per doc); this is one map-side-partial agg over
    shingle rows with no row explosion — the shuffle carries
    N_MINHASH longs per doc per map partition (guide §2.3 "aggregate
    before you shuffle"). q54's candidates and every _banded_signatures
    consumer (q118/q135/the stream twin/the band store) inherit it;
    q53 keeps the row-form output unchanged."""
    sh = _with_shingles(df)
    base = sh.select(
        "doc_id", (F.expr(_SPARK_H60.format(expr="shingle")) % F.lit(MINHASH_M)).alias("h0")
    )
    return base.groupBy("doc_id").agg(
        F.array(
            *[
                F.min(
                    (F.lit(MINHASH_A[i]) * F.col("h0") + F.lit(MINHASH_B[i]))
                    % F.lit(MINHASH_M)
                )
                for i in range(N_MINHASH)
            ]
        ).alias("sig")
    )


def q54_minhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: N_BANDS bands × 2 rows; docs sharing any band key
    become candidates; est_jaccard = matching signature fraction.

    Shuffle volume is O(docs × bands) — independent of the number of
    pairs, which is what makes this the 100 TB near-dup path.

    The band key is xxhash64 over (band index, signature slice) — an
    8-byte bigint hashed straight from ints, no string concat/md5 hex
    work. Like q52's join key, it never appears in the output, so it
    need not be oracle-portable: the oracle's own (md5-based) band
    keys induce the SAME doc groupings, hence the same pairs. A
    cross-band xxhash64 collision (≈2⁻⁶⁴ per key pair) could only ADD
    a candidate, which the q52 exact-verify stage filters — the
    standard LSH false-positive path. (Measured: md5 band keys were
    the q54 r2 regression; xxhash64 restores it, see BENCH_COMPARE.)

    r10: the per-doc signature comes from _per_doc_sig_frame — one
    aggregation, no ×N_MINHASH row explosion, bit-identical sig
    values (strict oracle re-verified at all three SFs)."""
    per_doc = _per_doc_sig_frame(table(spark, sf_dir, "documents"))
    rows_per_band = N_MINHASH // N_BANDS
    bands = per_doc.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(*[
                F.xxhash64(
                    F.lit(b),
                    *[F.expr(f"sig[{b * rows_per_band + r}]") for r in range(rows_per_band)],
                )
                for b in range(N_BANDS)
            ])
        ).alias("band_key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sa"),
            F.col("b.sig").alias("sb"),
        )
        .distinct()
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.round(
            F.expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), t -> t))") / F.lit(N_MINHASH), 6
        ).alias("est_jaccard"),
    )


# ------------------------------------------------- intra-corpus span dedup

def _doc_chunks(d: DataFrame) -> DataFrame:
    """Fixed CHUNK_TOKENS-token chunking shared by q97 (span dedup)
    and q48b (span decontamination): one (doc_id, pos, ct:
    array<string>) row per chunk, produced by a single in-plan
    posexplode over an array transform — the document is tokenized
    exactly once and never re-scanned by the chunker."""
    toks = F.split(F.trim(F.col("text")), " +")
    return (
        d.select(
            "doc_id",
            toks.alias("t"),
            F.ceil(F.size(toks) / F.lit(CHUNK_TOKENS)).cast("int").alias("nc"),
        )
        .select(
            "doc_id",
            F.expr(
                f"posexplode(transform(sequence(0, nc - 1),"
                f" i -> slice(t, i * {CHUNK_TOKENS} + 1, {CHUNK_TOKENS})))"
            ).alias("pos", "ct"),
        )
    )


def _kept_text_md5(keep: str):
    """Aggregate expression shared by q97/q48b reassembly: md5 of the
    document rebuilt, in chunk-pos order, from the (pos, chunk) rows
    satisfying SQL predicate ``keep`` (md5('') when none survive).
    One definition so the two span operators can never drift on the
    reassembly-hash semantics (their DuckDB oracles share the twin
    fragments _DUCK_CHUNKS / _duck_kept_md5 for the same reason)."""
    return F.md5(
        F.array_join(
            F.expr(
                f"transform(array_sort(collect_list(CASE WHEN {keep}"
                " THEN struct(pos, chunk) END)), s -> s.chunk)"
            ),
            " ",
        )
    )


def q97_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style intra-corpus span dedup: split every document into
    fixed CHUNK_TOKENS-token chunks (the fixture has no paragraph
    breaks; on real data the splitter is '\\n\\n'), keep only the
    globally FIRST occurrence of each chunk (by (doc_id, pos)), and
    reassemble each document from its surviving chunks in order.

    The dedup decision is one hash-keyed window over the exploded
    chunk set — shuffle carries (16-byte chunk hash, ids), never
    documents; reassembly is one ordered aggregation back on doc_id.
    Output carries md5 of the reassembled text (compact + hashable);
    per-doc kept/total counts quantify the dedup."""
    d = table(spark, sf_dir, "documents")
    chunks = _doc_chunks(d).select(
        "doc_id", "pos", F.concat_ws(" ", F.col("ct")).alias("chunk")
    )
    w = Window.partitionBy(F.md5(F.col("chunk"))).orderBy("doc_id", "pos")
    marked = chunks.withColumn("rn", F.row_number().over(w))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_if(F.col("rn") == 1).alias("n_kept"),
            _kept_text_md5("rn = 1").alias("dedup_text_hash"),
        )
        .orderBy("doc_id")
    )


BOILER_MIN_COUNT = 3  # corpus occurrences at which a span is boilerplate


def q114_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate/template span removal (the CCNet/C4 pre-dedup
    step): any CHUNK_TOKENS-token span occurring >= BOILER_MIN_COUNT
    times across the corpus is template text (headers, footers,
    license banners, nav chrome) and is removed from EVERY document —
    including the first occurrence, which is what distinguishes this
    from q97's keep-first dedup (the two compose: scrub boilerplate,
    then dedup the remainder).  Frequency is total occurrences (a
    template normally appears once per afflicted doc; the occurrence
    count equals document frequency for that shape and needs no
    distinct pass).

    Scale shape: q97's exact machinery — the shared chunker
    (one tokenizer pass), then ONE hash-keyed window over the
    exploded chunk set whose shuffle carries (16-byte chunk hash,
    ids, chunk text — the same rows q97 ships), a count(*) frame
    instead of row_number, and the shared ordered reassembly agg.
    No join: the frequency decision and the surviving text ride the
    same window partition."""
    return _boilerplate_scrub(table(spark, sf_dir, "documents"))


def _boilerplate_scrub(d: DataFrame) -> DataFrame:
    """Core of q114 over any (doc_id, text) frame (factored out so
    tests can plant template spans)."""
    chunks = _doc_chunks(d).select(
        "doc_id", "pos", F.concat_ws(" ", F.col("ct")).alias("chunk")
    )
    w = Window.partitionBy(F.md5(F.col("chunk")))
    marked = chunks.withColumn("cnt", F.count(F.lit(1)).over(w))
    keep = f"cnt < {BOILER_MIN_COUNT}"
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_if(F.col("cnt") >= BOILER_MIN_COUNT).alias("n_boiler"),
            _kept_text_md5(keep).alias("clean_text_hash"),
        )
        .orderBy("doc_id")
    )


SUBSTR_W = 8  # rolling-window width for offset-invariant substring dedup


def _substring_dedup(docs: DataFrame) -> DataFrame:
    """Core of q113 over any (doc_id, text) frame (factored out so
    tests can plant misaligned duplicates).  See q113 for semantics
    and the scale shape."""
    W = SUBSTR_W
    toks = docs.select("doc_id", F.split(F.trim(F.col("text")), " +").alias("t"))
    # CASE guard matters: sequence(0, n - W) DESCENDS for n < W
    # (Spark's sequence defaults to step -1 when stop < start).
    wins = toks.select(
        "doc_id",
        F.expr(
            f"posexplode(CASE WHEN size(t) >= {W} THEN"
            f" transform(sequence(0, size(t) - {W}),"
            f" i -> xxhash64(concat_ws(' ', slice(t, i + 1, {W}))))"
            f" ELSE cast(array() as array<bigint>) END)"
        ).alias("pos", "win_h"),
    )
    w = Window.partitionBy("win_h").orderBy("doc_id", "pos")
    dup_starts = (
        wins.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("pos")).alias("ds"))
    )
    covered = f"s -> s >= p - {W - 1} AND s <= p"
    return (
        toks.join(dup_starts, "doc_id", "left")
        .withColumn("ds", F.coalesce(F.col("ds"), F.expr("cast(array() as array<int>)")))
        .select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tokens"),
            F.size("ds").cast("bigint").alias("n_dup_windows"),
            F.expr(
                f"cast(size(filter(sequence(0, size(t) - 1),"
                f" p -> exists(ds, {covered}))) as bigint)"
            ).alias("n_removed"),
            F.md5(
                F.expr(
                    f"concat_ws(' ', transform(filter(sequence(0, size(t) - 1),"
                    f" p -> NOT exists(ds, {covered})), p -> t[p]))"
                )
            ).alias("clean_text_hash"),
        )
        .orderBy("doc_id")
    )


def q113_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-invariant exact substring dedup — the suffix-array
    method's semantics (Lee et al. 2021, "Deduplicating Training Data
    Makes Language Models Better") re-expressed Spark-first: every
    SUBSTR_W-token window that reappears ANYWHERE in the corpus, at
    ANY alignment (q97's fixed chunk grid only catches grid-aligned
    repeats), is removed from every occurrence except the globally
    first (ordered by (doc_id, pos)); a token is dropped iff some
    removed window covers it.  Output: per-doc token / dup-window /
    removed counts and the md5 of the surviving text.

    Scale shape: window fingerprints are an in-plan array transform
    over ONE tokenizer pass (xxhash64 of each W-token slice — 8-byte
    keys; a 64-bit collision would merge two distinct windows, the
    standard fingerprint trade at ~N²/2⁶⁵).  The first-occurrence
    decision is one hash-keyed window whose shuffle carries only
    (hash, doc_id, pos) — O(corpus tokens) rows, the same asymptotic
    work the reference method pays to build its suffix array, but
    never carrying text.  Duplicate starts then collapse to ONE
    small (doc_id, sorted-starts-array) row per affected document,
    and the corpus re-scan joins that frame on doc_id, so document
    text crosses the wire exactly once; coverage and reassembly are
    in-plan array ops (exists() over the per-doc dup-start array —
    O(n·dups) per doc, dup-start arrays are duplicated-region-sized),
    adding no further shuffle."""
    return _substring_dedup(table(spark, sf_dir, "documents"))


# -------------------------------------------------------------------- SimHash

def q55_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash over the distinct token set: bit j is the sign
    of Σ_tokens (2·bit_j(h(token)) − 1). Same-bucket docs are near-dup
    candidates at O(docs) shuffle cost."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.trim(F.col("text")), " +"))).alias("tok")
    ).withColumn("h", F.expr(_SPARK_H60.format(expr="tok")))
    bit_sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.expr(f"(h >> {j}) & 1") == 1, 1).otherwise(-1)).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("bigint").alias("simhash"))


# --------------------------------------------------------------- text analysis

_LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "de": ["der", "die", "und"],
    "es": ["el", "la", "los"],
    "fr": ["le", "la", "les"],
    "zh": ["de", "le", "shi"],
}


def q56_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID: marker-token hit counts per language,
    argmax with deterministic tie-break (lexicographic), compared to
    the labeled lang. (The fixture text is synthetic word soup, so
    accuracy is structural, not linguistic.)"""
    d = table(spark, sf_dir, "documents")
    d = d.withColumn("toks", F.split(F.trim(F.lower(F.col("text"))), " +"))
    scores = [
        F.struct(
            F.expr(
                " + ".join(f"size(filter(toks, t -> t = '{m}'))" for m in markers)
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(_LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return d.select(
        "doc_id",
        "lang",
        best.getField("lang").alias("predicted_lang"),
        best.getField("score").cast("bigint").alias("marker_hits"),
    )


def _trunc6(col):
    """floor(x·10⁶)/10⁶ — engine-portable 6-decimal truncation. Unlike
    round(x, 6), identical in Spark and DuckDB on ties: Spark rounds
    the shortest decimal repr (HALF_UP on Double.toString) while DuckDB
    rounds the binary value, so a quotient of small ints landing on an
    exact x.xxxxxx5 boundary flips between engines (observed: q57
    quality 0.428937 vs 0.428938 at sf0.01). floor of the identical
    product is the same IEEE op in both."""
    return F.floor(col * F.lit(1e6)) / F.lit(1e6)


def _quality_col():
    """The q57 composite-quality column as a row-wise expression over
    ``text`` — exposed so consumers that need only the SCORE (q111's
    target split) can evaluate it inline on their own scan instead of
    joining against q57's output (an inline projection is free; the
    join doubles the corpus scans)."""
    toks = F.split(F.trim(F.col("text")), " +")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    mean_tok_len = (F.length(F.regexp_replace(F.trim(F.col("text")), " +", "")) / n_tokens)
    return _trunc6(
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (n_distinct / n_tokens)
        + 0.3 * F.least(mean_tok_len / F.lit(10.0), F.lit(1.0))
    )


def q57_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, lexical diversity, mean token length →
    composite score and bucket (the classic pre-training filters).
    Float outputs are 6-decimal truncations (see _trunc6) so the
    driver's exact hash compare is deterministic across engines."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " +")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    mean_tok_len = (F.length(F.regexp_replace(F.trim(F.col("text")), " +", "")) / n_tokens)
    score = _quality_col()
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_distinct.alias("n_distinct"),
        _trunc6(n_distinct / n_tokens).alias("distinct_ratio"),
        _trunc6(mean_tok_len).alias("mean_tok_len"),
        score.alias("quality"),
        F.when(score >= 0.7, "high").when(score >= 0.5, "mid").otherwise("low").alias("bucket"),
    )


def q58_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token statistics per language: docs, tokens, vocabulary."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("lang", "doc_id", F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))
    return (
        toks.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("tok").alias("vocab"),
            F.round(F.count(F.lit(1)) / F.countDistinct("doc_id"), 6).alias("tokens_per_doc"),
        )
        .orderBy("lang")
    )


def q59_char_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-lite): minimum
    60-bit hash over all 8-char windows of the text.

    Cost note: one hash per character position, all inside a JVM
    higher-order function (narrow, no shuffle) — the wall-time is the
    md5-based PORTABLE hash (the oracle computes the identical value
    in DuckDB). A deployment that doesn't need cross-engine parity
    swaps _SPARK_H60 for xxhash64(substr(...)) and cuts the per-window
    cost ~5x (q113's substring dedup already uses xxhash64 windows —
    its parity is structural, not value-level)."""
    d = table(spark, sf_dir, "documents")
    expr = (
        "array_min(transform(sequence(1, greatest(1, length(text) - 7)), "
        "i -> " + _SPARK_H60.format(expr="substr(text, i, 8)") + "))"
    )
    return d.select("doc_id", F.expr(expr).alias("rolling_min_hash"))


def q67_token_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (pre-training budget accounting):
    whitespace tokens and a BPE-ish regex segmentation
    (word pieces | digit runs | single punctuation).

    chars_per_token is NULL for a doc with zero BPE tokens (empty or
    whitespace-only text — real rows in any crawl): under ANSI mode a
    bare division crashed the whole query on such a row (found by the
    oracle fuzzer, tests/test_fuzz_oracle.py), and the DuckDB oracle's
    divide-by-zero NaN matches nothing — both sides now nullif the
    divisor. Fixture outputs are unchanged (no empty docs there)."""
    d = table(spark, sf_dir, "documents")
    # NB: Spark SQL string literals process backslash escapes, so \s
    # must be doubled to survive to the regex engine
    bpe_pattern = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\\\s]"
    return d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " +")).alias("ws_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{bpe_pattern}', 0))").alias("bpe_tokens"),
        F.length("text").alias("n_chars"),
        F.round(
            F.length("text")
            / F.expr(f"nullif(size(regexp_extract_all(text, '{bpe_pattern}', 0)), 0)"),
            6,
        ).alias("chars_per_token"),
    )


def q68_data_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM-training-data pipeline as ONE declarative plan:
    exact dedup (keep-first) → quality filter → language census with
    token budget. Catalyst fuses the whole chain; one scan of the
    corpus, two shuffles (dedup group + final census)."""
    d = table(spark, sf_dir, "documents")
    w_keep = Window.partitionBy(F.md5(F.col("text"))).orderBy("doc_id")
    toks = F.split(F.trim(F.col("text")), " +")
    n_tokens = F.size(toks)
    quality = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.size(F.array_distinct(toks)) / n_tokens)
        + 0.3 * F.least(
            F.length(F.regexp_replace(F.trim(F.col("text")), " +", "")) / n_tokens / F.lit(10.0),
            F.lit(1.0),
        )
    )
    return (
        d.withColumn("rn", F.row_number().over(w_keep))
        .filter(F.col("rn") == 1)                      # dedup: keep lowest doc_id
        .withColumn("n_tokens", n_tokens)
        .withColumn("quality", quality)
        .filter(F.col("quality") >= 0.5)               # quality gate
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("token_budget"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("lang")
    )


def connected_components(
    edges: DataFrame, max_iter: int = 20, driver_threshold: int = 100_000
) -> DataFrame:
    """Connected components by iterative min-label propagation.

    ``edges(src, dst)`` undirected. Returns (doc_id, component) with
    component = min doc_id in the component. The loop is driver-
    orchestrated but each step is a distributed join+agg; iteration
    count is bounded by the graph diameter (near-dup clusters are
    shallow). At 100 TB the input is the *candidate* graph (MinHash
    pairs), which is orders of magnitude smaller than the corpus.

    Below ``driver_threshold`` edges the computation switches to
    driver-side union-find: the edge list is OUTPUT-scale (the
    thresholded candidate pairs — the same frame q52 verifies and a
    user would materialize anyway). The 100k default bounds the probe
    collect at tens of MB of driver heap *including* PySpark Row
    overhead (~a few hundred bytes/Row — the raw-payload estimate
    undercounts by an order of magnitude), while the distributed loop
    pays 3-4 join+checkpoint+convergence rounds of pure scheduling for
    such graphs (measured 3.5 s → <0.2 s on a 307-edge graph at
    sf0.1). Identical output either way; the distributed path remains
    for genuinely large graphs.
    """
    # The edge list is localCheckpointed BEFORE the routing probe so
    # the upstream candidate pipeline (MinHash banding / within-cell
    # cosine) runs exactly once: the probe's limit+collect and — when
    # the graph exceeds the threshold — the distributed loop both read
    # the checkpoint instead of re-deriving the candidates.
    if driver_threshold:
        edges = edges.localCheckpoint(eager=True)
    head = edges.limit(driver_threshold + 1).collect() if driver_threshold else []
    if driver_threshold and len(head) <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent.setdefault(root, root) != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for r in head:
            ra, rb = find(r[0]), find(r[1])
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo  # union by MIN → root IS the label
        out = [(int(x), int(find(x))) for x in parent]
        return edges.sparkSession.createDataFrame(
            out, "doc_id bigint, component bigint"
        )

    # iterative algorithms MUST truncate lineage: without checkpoints,
    # iteration k re-derives the whole upstream pipeline (here: the
    # MinHash candidate generation) k times over — measured 21.6s → ~6s
    # at sf0.01 with eager localCheckpoints on edges and labels
    both = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .localCheckpoint(eager=True)
    )
    labels = both.select(F.col("a").alias("doc_id")).distinct().withColumn(
        "component", F.col("doc_id")
    )
    for _ in range(max_iter):
        neighbor_min = (
            both.join(labels, both.b == labels.doc_id)
            .groupBy(F.col("a").alias("doc_id2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.doc_id2, "left")
            .select(
                "doc_id",
                F.least(F.col("component"), F.coalesce("nbr_min", F.col("component"))).alias(
                    "new_component"
                ),
                "component",
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("new_component") != F.col("component")).count()
        labels = updated.select("doc_id", F.col("new_component").alias("component"))
        if n_changed == 0:
            break
    return labels


def q80_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: MinHash candidates (est_jaccard ≥ 0.5) →
    connected components → one canonical keeper per cluster."""
    pairs = q54_minhash_candidates(spark, sf_dir).filter(F.col("est_jaccard") >= 0.5)
    comps = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    return (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"), F.min("doc_id").alias("keeper"))
        .orderBy("component")
    )


# ------------------------------------------------- PII scrubbing

# classic pre-training redaction classes; plain character-class +
# quantifier syntax only, so Java regex (Spark) and RE2 (DuckDB)
# match identically
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def q78_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (the standard pre-training scrub):
    count matches per class, then redact each class to a typed token
    ([EMAIL] etc.), emitting the scrubbed text's hash + length.

    One narrow projection — regex work is per-row JVM code, no
    shuffle; at 100 TB this is the map stage of the ingest pipeline.
    The fixture's synthetic text contains no PII (counts are 0 and the
    scrubbed hash equals the original's) — the redaction semantics are
    pinned by tests/test_text.py on planted-PII documents; the oracle
    (DuckDB, identical regexes) value-checks both paths either way."""
    d = table(spark, sf_dir, "documents")
    # NB: F.regexp_extract_all / F.regexp_replace take the pattern
    # directly (no SQL string-literal escape processing — a '\\b' in
    # F.expr would need doubling, see q67)
    counts = [
        F.size(F.regexp_extract_all("text", F.lit(p), F.lit(0))).alias(f"n_{name}")
        for name, p in _PII_PATTERNS.items()
    ]
    scrubbed = F.col("text")
    for name, p in _PII_PATTERNS.items():
        scrubbed = F.regexp_replace(scrubbed, p, f"[{name.upper()}]")
    return d.select(
        "doc_id",
        *counts,
        F.md5(scrubbed).alias("scrubbed_hash"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


# ------------------------------------------------- corpus mixing

# target language shares for the training mix (uniform here; any
# weights that sum to 1 work)
MIX_TARGET = {"de": 0.2, "en": 0.2, "es": 0.2, "fr": 0.2, "zh": 0.2}


def q79_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus mixing: down-sample each language toward a
    target mix, taking the LARGEST budget B where no language is
    oversampled (B = min_l n_l / p_l; acceptance rate_l = B·p_l / n_l).

    Selection is the engine-portable md5 split (q99 pattern): a doc is
    kept iff hash(doc_id) mod 1e6 < floor(rate·1e6) — reproducible
    across engines/runs, and stable under corpus growth (a kept doc
    stays kept as data is appended, unlike rand()/randomSplit).

    Scale shape: the per-lang census is one partial-agg shuffle down
    to |langs| rows; the budget is an agg over that tiny frame; both
    broadcast back onto the corpus — the corpus itself never
    re-partitions (a global-min WINDOW here would move 100 TB to one
    partition; the census/broadcast form is the correct plan).
    Output: per-lang census of the mix.

    A lang present in the corpus but absent from MIX_TARGET gets an
    explicit rate of 0 (census row with n_selected=0, excluded from
    the budget min) rather than NULL-propagating — a fixture regen
    that adds a language surfaces as a visible zero row, not as
    silently-wrong NULLs.
    """
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    target = F.create_map(
        *[F.lit(x) for kv in MIX_TARGET.items() for x in kv]
    )
    census = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l")).withColumn(
        "p_l", F.coalesce(target[F.col("lang")], F.lit(0.0))
    )
    budget = census.agg(
        F.min(F.when(F.col("p_l") > 0, F.col("n_l") / F.col("p_l"))).alias("budget")
    )
    # floor() in BOTH engines: Spark's double->bigint cast truncates,
    # DuckDB's rounds — floor of the identical IEEE product is the
    # portable threshold
    rates = (
        census.crossJoin(F.broadcast(budget))
        .withColumn("rate", F.col("budget") * F.col("p_l") / F.col("n_l"))
        .select("lang", "n_l", "rate", F.floor(F.col("rate") * 1e6).alias("thresh"))
    )
    h = F.expr(
        "cast(conv(substr(md5(concat('mix:', doc_id)), 1, 15), 16, 10) as bigint) % 1000000"
    )
    sel = d.join(F.broadcast(rates), "lang").withColumn("keep", h < F.col("thresh"))
    return (
        sel.groupBy("lang")
        .agg(
            F.max("n_l").alias("n_before"),
            F.sum(F.col("keep").cast("int")).alias("n_selected"),
            F.max("thresh").alias("rate_ppm"),
        )
        .orderBy("lang")
    )


# ------------------------------------------------- benchmark decontamination

# synthetic "benchmark holdout": every 50th doc stands in for an eval
# set (at real scale this is the concatenated benchmark suite — tiny
# versus the training corpus, which is what makes the broadcast work)
DECON_HOLDOUT_MOD = 50
# flag threshold: >= 2 distinct overlapping n-grams (1 lone shingle
# collision on a small vocabulary is ambient; the knob is caller-set
# per benchmark policy, cf. GPT-3 appx C / The Pile's 13-gram rule)
DECON_MIN_HITS = 2


def q48_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the train/test-overlap scrub every
    serious pretraining pipeline runs (GPT-3 appx C, The Pile): flag
    training documents sharing word-n-gram shingles with an eval set.

    Output: one row per corpus doc that HAS shingles — (doc_id,
    n_shingles, n_hits = distinct shingles also present anywhere in
    the eval set, contam_rate, contaminated). Docs with < 3 tokens
    have no shingles and are structurally uncontaminatable — absent.

    Scale shape: the eval shingle set is benchmark-sized (thousands
    of docs) while the corpus is 100 TB — so the eval side is
    broadcast and the corpus side is ONE narrow scan + explode +
    broadcast semi-join + per-doc agg; shuffle carries one row per
    corpus doc, never the shingle stream. The join key is xxhash64 of
    the shingle (16x smaller than the strings; collisions ~2^-64;
    internal only, so portability doesn't matter — the oracle joins
    on the string itself, q52's pattern)."""
    d = table(spark, sf_dir, "documents")
    sh = _with_shingles(d).select("doc_id", F.xxhash64("shingle").alias("sh_h"))
    is_eval = F.col("doc_id") % DECON_HOLDOUT_MOD == 0
    eval_sh = sh.filter(is_eval).select("sh_h").distinct().withColumn("hit", F.lit(1))
    # ONE corpus pass: left join against the broadcast (distinct, so
    # no fanout) eval set marks hits, then a single per-doc agg counts
    # shingles and hits together — vs the separate sizes/hits aggs
    # which scanned and shuffled the corpus shingle stream twice
    return (
        sh.filter(~is_eval)
        .join(F.broadcast(eval_sh), "sh_h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("hit").alias("n_hits"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_hits",
            _trunc6(F.col("n_hits") / F.col("n_shingles")).alias("contam_rate"),
            (F.col("n_hits") >= DECON_MIN_HITS).alias("contaminated"),
        )
    )


def q48b_span_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level benchmark decontamination — q48's doc-level flag
    condemns whole documents; production scrubbers (The Pile's
    13-gram rule, LLaMA's dedup-then-redact pass) REMOVE the
    contaminated span and keep the rest of the document, because at
    trillion-token scale dropping every doc that brushes a benchmark
    costs real data. Span unit = q97's fixed CHUNK_TOKENS chunk (on
    real data the splitter is the paragraph break): a chunk is
    contaminated iff ANY of its within-chunk word-3-gram shingles
    occurs anywhere in the eval set; each document is reassembled
    from its surviving chunks in order.

    Output: one row per corpus doc — (doc_id, n_chunks, n_removed,
    removed_rate, clean_text_hash = md5 of the reassembled text,
    md5('') when every chunk was removed). Boundary caveat, shared
    with every chunk-granular scrubber: a shingle straddling a chunk
    seam is not matched within either chunk — policy pipelines run
    the q48 doc-level flag first and use this pass for the keep-side
    redaction, so seam misses are bounded by the doc-level threshold.

    Scale shape: the eval shingle set is benchmark-sized and
    broadcast (hash table built once per executor); the corpus side
    is ONE scan — q97's shared chunker (`_doc_chunks`, the document
    tokenized once), per-chunk shingles as an in-plan array
    transform, and an explode_outer that carries the chunk text
    alongside its shingles so the broadcast hit-join and the
    reassembly ride the SAME subtree (the first cut built them as
    two consumers of the chunk relation, which re-scanned and
    re-tokenized the whole corpus). The per-chunk fanout (~chunk
    shingle count) is map-side only: hash partial agg collapses it
    back to ONE (doc_id, pos, chunk, hit) row per chunk before the
    first exchange, so the shuffle never carries the shingle stream
    and chunk text crosses the wire exactly once; reassembly is
    q97's shared ordered agg (`_kept_text_md5`)."""
    d = table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECON_HOLDOUT_MOD == 0
    eval_sh = (
        _with_shingles(d.filter(is_eval))
        .select(F.xxhash64("shingle").alias("sh_h"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ch_sh = F.expr(
        "CASE WHEN size(ct) >= 3 THEN array_distinct(transform(sequence(0, size(ct) - 3),"
        " i -> concat_ws(' ', ct[i], ct[i + 1], ct[i + 2]))) ELSE array() END"
    )
    per_chunk = (
        _doc_chunks(d.filter(~is_eval))
        .select(
            "doc_id",
            "pos",
            F.concat_ws(" ", F.col("ct")).alias("chunk"),
            # explode_outer keeps shingle-less (<3-token) chunks as a
            # single null-shingle row, so every chunk survives to the agg
            F.explode_outer(ch_sh).alias("shingle"),
        )
        # xxhash64(NULL) is the seed (42), not NULL — guard so the null
        # shingle can never collide into the eval set via the join key
        .select(
            "doc_id",
            "pos",
            "chunk",
            F.when(F.col("shingle").isNotNull(), F.xxhash64("shingle")).alias("sh_h"),
        )
        .join(F.broadcast(eval_sh), "sh_h", "left")
        # chunk text rides in the GROUP KEY, not an any_value() buffer:
        # HashAggregate allows variable-width keys but falls back to
        # SortAggregate (partial+final sorts) on variable-width buffers
        .groupBy("doc_id", "pos", "chunk")
        .agg(F.max("hit").alias("hit"))
        .withColumn("contaminated", F.coalesce(F.col("hit") == 1, F.lit(False)))
    )
    return (
        per_chunk.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count_if(F.col("contaminated")).alias("n_removed"),
            _kept_text_md5("NOT contaminated").alias("clean_text_hash"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_removed",
            _trunc6(F.col("n_removed") / F.col("n_chunks")).alias("removed_rate"),
            "clean_text_hash",
        )
    )


# ---------------------------------------------------- sequence packing layout

PACK_WINDOW = 256   # tokens per training sequence
PACK_SHARDS = 8     # independent packing streams (files/workers at scale)


def q49_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence-packing layout: concatenate documents in
    doc_id order within each shard and chop the token stream into
    fixed PACK_WINDOW training sequences — each doc's row gives its
    token span [start_tok, end_tok) in the shard stream and the
    window range it lands in (docs may straddle windows; that IS the
    concat-and-chop semantics of GPT-style pretraining loaders).

    Scale shape: one shuffle on the shard key, then everything is a
    streaming window evaluation within each sorted shard partition —
    the cumsum never needs a global ordering (a single global stream
    would serialize 100 TB through one partition; sharding is how
    real loaders parallelize packing, one stream per data file).
    Deterministic: shard = doc_id % PACK_SHARDS and doc_id order."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), " +"))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.select(
            "doc_id",
            (F.col("doc_id") % PACK_SHARDS).alias("shard"),
            n_tokens.cast("bigint").alias("n_tokens"),
        )
        .withColumn("end_tok", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "shard",
            "n_tokens",
            (F.col("end_tok") - F.col("n_tokens")).alias("start_tok"),
            "end_tok",
            F.floor((F.col("end_tok") - F.col("n_tokens")) / PACK_WINDOW).alias("first_window"),
            F.floor((F.col("end_tok") - 1) / PACK_WINDOW).alias("last_window"),
        )
        .withColumn("n_windows", F.col("last_window") - F.col("first_window") + 1)
    )


def q49b_greedy_packing(
    spark: SparkSession, sf_dir: str, window: int = PACK_WINDOW
) -> DataFrame:
    """First-fit-in-order (no-straddle) sequence packing per shard —
    the OTHER packing discipline: every document lands whole in one
    bin, and a bin closes greedily when the next doc would overflow
    the token budget. SFT / instruction-tuning loaders pack this way
    (examples must not be split); q49 is the pretraining
    concat-and-chop twin.

    The bin assignment has a data-dependent RESET (fill returns to 0
    whenever it would exceed the budget) — a running state no window
    cumsum can express, so this is the canonical grouped-map
    ``applyInPandas`` operator: one shuffle on the shard key, then
    each shard's docs are packed in a single Arrow-batched pandas
    call holding only (doc_id, n_tokens) pairs — bin-packing state is
    O(1), the group buffer is rows × 16 bytes, and shards bound group
    size (a shard is one file/worker stream at real scale). Docs
    longer than the budget get a bin alone (truncation is the
    tokenizer's job downstream). Rows-only: sequential state isn't
    SQL-expressible; the greedy invariants (fit, reset-only-on-
    overflow, driver-mirror equality) are pinned in tests."""
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), " +"))

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_id, fill = 0, 0
        bins, fills = [], []
        for t in pdf["n_tokens"]:
            if fill > 0 and fill + t > window:
                bin_id += 1
                fill = 0
            fill += int(t)
            bins.append(bin_id)
            fills.append(fill)
        pdf["bin_id"] = bins
        pdf["bin_fill"] = fills
        return pdf

    return (
        d.select(
            "doc_id",
            (F.col("doc_id") % PACK_SHARDS).alias("shard"),
            n_tokens.cast("bigint").alias("n_tokens"),
        )
        .groupBy("shard")
        .applyInPandas(
            _pack,
            "doc_id bigint, shard bigint, n_tokens bigint, bin_id bigint, bin_fill bigint",
        )
    )


def packing_invariants_report(
    spark: SparkSession, sf_dir: str, window: int = PACK_WINDOW
) -> DataFrame:
    """Driver-visible invariant surface for q49b's greedy no-straddle
    packing — the sketch_error_report pattern (engine/relational.py's
    stream/sketch report rows): instead of the invariants living only
    in the test suite, one row PER BIN carries the checked flags so a
    correctness regression in the grouped-map packer shows up as a
    changed driver row.

    Per (shard, bin): docs, tokens, and three flags that must all be
    true — ``capacity_ok`` (bin total ≤ budget, or a single oversized
    doc alone in its bin — the documented overflow rule),
    ``fill_consistent`` (the packer's running bin_fill ends exactly at
    the bin's token total), and ``greedy_tight`` (the NEXT bin's first
    doc would NOT have fit here — greedy means a bin only closes on
    overflow; vacuously true for a shard's last bin).

    Scale shape: rides q49b's single shard shuffle, then one
    bins-sized hash agg and a bins-sized lead window per shard —
    output is O(bins), flags computed JVM-side. Rows-only by design
    (the packer itself is the non-SQL part); the all-true flags are
    asserted in tests/test_text.py."""
    packed = q49b_greedy_packing(spark, sf_dir, window=window)
    bins = (
        packed.groupBy("shard", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            F.max("bin_fill").alias("end_fill"),
            F.min_by("n_tokens", "doc_id").alias("first_tok"),
        )
    )
    w = Window.partitionBy("shard").orderBy("bin_id")
    return (
        bins.withColumn("next_first_tok", F.lead("first_tok").over(w))
        .select(
            "shard",
            "bin_id",
            "docs",
            "tokens",
            ((F.col("tokens") <= window) | (F.col("docs") == 1)).alias("capacity_ok"),
            (F.col("end_fill") == F.col("tokens")).alias("fill_consistent"),
            F.coalesce(
                F.col("tokens") + F.col("next_first_tok") > window, F.lit(True)
            ).alias("greedy_tight"),
        )
        .orderBy("shard", "bin_id")
    )


# ------------------------------------------------- repetition quality signals

# Gopher-style repetition caps (Rae et al. 2021, table A1 uses
# CHARACTER fractions; these are token-OCCURRENCE fractions over the
# whitespace tokenization — same signal, engine-portable arithmetic)
REP_TOP2_MAX = 0.20   # max fraction of 2-gram slots taken by the single top 2-gram
REP_DUP3_MAX = 0.18   # max fraction of 3-gram slots that are repeat occurrences


def q57b_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals — the Gopher repetition
    filters (duplicate/top n-gram fractions) that catch boilerplate
    and degenerate generations q57's diversity ratio misses.

    Per doc: for n ∈ {2, 3}, the fraction of n-gram occurrences that
    are repeats (occurrences − distinct)/occurrences and the top
    n-gram's share of all occurrences; ``repetitive`` flags docs over
    the Gopher-style caps.

    Scale shape: both n-gram sizes ride ONE exploded pass — grams are
    tagged with n and grouped by (doc_id, n, xxhash64(gram)), so the
    shuffle carries 8-byte hashes, never gram strings (q48's trick);
    a second doc-keyed agg folds both sizes into one row. Docs too
    short for an n-gram get 0 fractions (nothing repeats)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " +")
    base = d.select("doc_id", F.size(toks).cast("bigint").alias("n_tokens"), toks.alias("toks"))
    gram_expr = """
        flatten(transform(array(2, 3), n ->
            CASE WHEN size(toks) >= n THEN
                transform(sequence(0, size(toks) - n),
                          i -> named_struct('n', n, 'gram',
                                            concat_ws(' ', slice(toks, i + 1, n))))
            ELSE array() END))
    """
    grams = base.select("doc_id", F.explode(F.expr(gram_expr)).alias("g")).select(
        "doc_id", F.col("g.n").alias("n"), F.xxhash64("g.gram").alias("gh")
    )
    counts = grams.groupBy("doc_id", "n", "gh").agg(F.count(F.lit(1)).alias("c"))

    def _side(n):
        tot = F.sum(F.when(F.col("n") == n, F.col("c")))
        dis = F.count(F.when(F.col("n") == n, F.lit(1)))
        top = F.max(F.when(F.col("n") == n, F.col("c")))
        return tot.alias(f"tot{n}"), dis.alias(f"dis{n}"), top.alias(f"top{n}")

    per_doc = counts.groupBy("doc_id").agg(*_side(2), *_side(3))
    dup2 = F.coalesce(_trunc6((F.col("tot2") - F.col("dis2")) / F.col("tot2")), F.lit(0.0))
    top2 = F.coalesce(_trunc6(F.col("top2") / F.col("tot2")), F.lit(0.0))
    dup3 = F.coalesce(_trunc6((F.col("tot3") - F.col("dis3")) / F.col("tot3")), F.lit(0.0))
    top3 = F.coalesce(_trunc6(F.col("top3") / F.col("tot3")), F.lit(0.0))
    return (
        base.select("doc_id", "n_tokens")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            dup2.alias("dup_2gram_frac"),
            top2.alias("top_2gram_frac"),
            dup3.alias("dup_3gram_frac"),
            top3.alias("top_3gram_frac"),
            ((top2 > REP_TOP2_MAX) | (dup3 > REP_DUP3_MAX)).alias("repetitive"),
        )
    )


# ------------------------------------------------- corpus heavy hitters

HH_TOPK = 20       # tokens reported
HH_CAPACITY = 256  # Misra-Gries counters per partition summary


def mg_merge(counters, batch_counts, capacity: int):
    """One Misra-Gries merge step (Agarwal et al., PODS'12 mergeable
    summaries): add the batch's exact counts into the running summary,
    and if it overflows ``capacity`` counters, subtract the
    (capacity+1)-th largest count from all and keep the positive ones.

    Invariants (property-tested): every kept count is a lower bound on
    the true count, the summary never exceeds ``capacity`` entries, and
    after folding an entire stream of N tokens any token with true
    frequency > N/(capacity+1) is still present."""
    counters = counters.add(batch_counts, fill_value=0)
    if len(counters) > capacity:
        counters = counters.sort_values(ascending=False, kind="mergesort")
        counters = counters.iloc[:capacity] - counters.iloc[capacity]
        counters = counters[counters > 0]
    return counters


def q67b_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT corpus-wide top-k tokens via two-phase distributed heavy
    hitters — the vocabulary-census shape a tokenizer-training /
    contamination-triage pipeline runs at 100 TB.

    Phase 1 (candidates): each partition folds its token stream into
    a Misra-Gries summary of ``HH_CAPACITY`` counters inside ONE
    ``mapInPandas`` pass (vectorized value_counts merge + the
    standard mergeable-summaries prune: subtract the (c+1)-th count,
    keep positives — Agarwal et al., PODS'12). The union of summaries
    is guaranteed to contain every token with global frequency
    > N/(capacity+1); memory is O(capacity) per partition and the
    shuffle carries ≤ capacity × partitions candidate rows.

    Phase 2 (exact recount): one corpus pass re-counts ONLY the
    candidates via a broadcast semi-join, so the reported counts are
    exact, not sketch estimates — the guarantee test asserts the
    k-th count clears the N/(capacity+1) capture threshold. The
    deliberate Python surface is the sketch fold (Arrow-batched,
    O(batch) vectorized); everything else is JVM-side.

    When to use which: for a BOUNDED key domain (word vocabulary) the
    plain JVM ``groupBy(tok).count()`` + top-k is already the scale
    answer — map-side combine shrinks the shuffle to distinct keys per
    partition (the guarantee test computes exactly that plan as its
    truth). The MG pass earns its Python cost when the key domain is
    UNBOUNDED (URLs, n-grams, join keys), where the full groupBy's
    shuffle and reducer state grow with distinct-key count but the
    summary stays O(capacity) per partition regardless."""
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))

    def _mg(batches):
        counters = pd.Series(dtype="int64")
        for pdf in batches:
            counters = mg_merge(counters, pdf["tok"].value_counts(), HH_CAPACITY)
        if len(counters):
            yield pd.DataFrame(
                {"tok": counters.index.astype(str), "lb": counters.values.astype("int64")}
            )

    cand = toks.mapInPandas(_mg, "tok string, lb bigint").select("tok").distinct()
    exact = (
        toks.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.orderBy(F.desc("n_occurrences"), "tok")
    return (
        exact.orderBy(F.desc("n_occurrences"), "tok")
        .limit(HH_TOPK)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


def q57c_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality scoring — the CCNet-style language-model
    filter (docs whose tokens are improbable under a corpus LM are
    noise/outlier candidates; production pipelines use a KenLM 5-gram,
    and this unigram form keeps the identical data flow with no
    external model: the corpus count pass IS the LM training).

    Per doc: mean negative log-probability of its tokens under the
    corpus unigram distribution p(t) = count(t)/N. Low = boring/
    boilerplate-typical, high = rare-token-heavy (OCR noise, garbled
    encodings, exotic vocab) — both tails are filter candidates.

    Scale shape: pass 1 trains the LM (token agg — vocab-bounded
    shuffle after map-side combine), with the corpus total N attached
    as a broadcast 1-row aggregate (q69's in-plan pattern, no eager
    driver job); pass 2 re-scans tokens and broadcast-joins the LM
    for per-doc scoring — two corpus scans, which is exactly the LM
    train/apply structure, and the only shuffles are vocab-sized or
    one-row-per-doc.

    VOCAB-BOUNDED ASSUMPTION (the broadcast's precondition): a word
    unigram LM tops out at ~10^6-10^7 distinct tokens — tens of MB,
    comfortably broadcastable — which is what makes the explicit
    broadcast hint correct here. For the UNBOUNDED key domains q67b's
    docstring warns about (URLs, raw n-grams, ids), a "unigram LM" over
    them is not vocab-bounded: drop the hint (shuffle-join the LM) or
    cap the vocabulary first (min-count prune / q67b heavy hitters),
    exactly as CCNet prunes its LM vocabulary before scoring."""
    d = table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))
    lm = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    n_total = lm.agg(F.sum("c").alias("n"))
    return (
        toks.join(F.broadcast(lm), "tok")
        .join(F.broadcast(n_total))
        .select("doc_id", (-F.log(F.col("c") / F.col("n"))).alias("nlp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            _trunc6(F.avg("nlp")).alias("avg_neg_logprob"),
        )
    )


HH_SHARDS = 8      # key-domain shards for the streaming/sharded variant


def q67c_stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded heavy hitters — the streaming-ingest shape of q67b,
    evaluated in batch (the oracle-checked entry; the REAL stateful
    ``applyInPandasWithState`` run lives in engine/streaming.py with a
    stream ≡ batch test).

    Tokens are sharded by ``xxhash64(tok) % HH_SHARDS`` — every
    occurrence of a token lands in exactly ONE shard, so the shards
    partition the key domain and each shard's Misra-Gries summary
    (the exact state a streaming micro-batch loop would hold per
    shard) carries a per-shard capture bound N_shard/(capacity+1),
    tighter than q67b's corpus-wide bound. The candidate union then
    gets the same exact broadcast recount, so the output is IDENTICAL
    to q67b — one distributed top-k, three interchangeable plans
    (plain JVM agg, partition-MG, shard-MG), all value-checked
    against the same SQL.

    Memory shape (r4 advisory fix): the shard fold is TWO stages, the
    same map-side-combine structure a JVM agg has. Stage 1 folds each
    scan partition's tokens into HH_SHARDS per-shard MG summaries
    inside ``mapInPandas`` — O(shards × capacity) memory per task, and
    parallelism stays at the scan's width. Stage 2 merges each shard's
    ≤ capacity × n_partitions summary ROWS (not tokens) with one
    grouped-map fold — the earlier single-stage form
    (``groupBy(shard).applyInPandas`` over raw tokens) materialized
    ~1/HH_SHARDS of ALL corpus tokens as one pandas frame on one
    executor and capped parallelism at HH_SHARDS: a memory cliff at
    100 TB. MG merge is associative (Agarwal et al.), so the two-stage
    fold yields a valid summary with the same capture bound."""
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.trim(F.col("text")), " +")).alias("tok"))
    sharded = toks.withColumn("shard", F.pmod(F.xxhash64("tok"), F.lit(HH_SHARDS)))

    def _partition_fold(batches):
        # one MG summary per shard seen in THIS partition
        counters: dict[int, pd.Series] = {}
        for pdf in batches:
            for shard, grp in pdf.groupby("shard"):
                counters[shard] = mg_merge(
                    counters.get(shard, pd.Series(dtype="int64")),
                    grp["tok"].value_counts(),
                    HH_CAPACITY,
                )
        for shard, c in counters.items():
            if len(c):
                yield pd.DataFrame(
                    {
                        "shard": int(shard),
                        "tok": c.index.astype(str),
                        "lb": c.values.astype("int64"),
                    }
                )

    def _shard_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        # input: ≤ capacity × n_partitions (shard, tok, lb) summary rows
        counters = mg_merge(
            pd.Series(dtype="int64"),
            pdf.groupby("tok")["lb"].sum(),
            HH_CAPACITY,
        )
        return pd.DataFrame(
            {"tok": counters.index.astype(str), "lb": counters.values.astype("int64")}
        )

    cand = (
        sharded.mapInPandas(_partition_fold, "shard bigint, tok string, lb bigint")
        .groupBy("shard")
        .applyInPandas(_shard_merge, "tok string, lb bigint")
        .select("tok")
        .distinct()
    )
    exact = (
        toks.join(F.broadcast(cand), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    w = Window.orderBy(F.desc("n_occurrences"), "tok")
    return (
        exact.orderBy(F.desc("n_occurrences"), "tok")
        .limit(HH_TOPK)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )


# ------------------------------------------------- RAG overlap chunking

RAG_CHUNK_TOKENS = 64   # tokens per chunk
RAG_CHUNK_STRIDE = 48   # stride (overlap = 16)


def q49c_rag_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking — the retrieval / embedding-
    index prep step (split every document into ``RAG_CHUNK_TOKENS``-
    token windows advancing by ``RAG_CHUNK_STRIDE``, so consecutive
    chunks share a 16-token overlap and no sentence is stranded on a
    boundary). Unlike q49's packing (concatenate-and-chop ACROSS
    docs) this is a per-document layout: every doc emits ≥ 1 chunk
    and the last chunk may run short.

    Pure narrow work: tokenize → ``sequence``/``explode`` chunk
    indices → slice + hash, all JVM-side expression evaluation — no
    shuffle at all, so it trivially scales (the plan is scan →
    project → generate). chunk_hash = md5(chunk text) gives the
    content address an embedding cache / vector index would key on."""
    W, S = RAG_CHUNK_TOKENS, RAG_CHUNK_STRIDE
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), " +")
    base = d.select("doc_id", toks.alias("toks")).withColumn("n", F.size("toks"))
    chunks = base.select(
        "doc_id",
        "n",
        "toks",
        F.explode(
            F.expr(f"sequence(0, cast((greatest(0, n - {W}) + {S} - 1) / {S} as int))")
        ).alias("chunk_idx"),
    )
    chunk_len = F.least(F.lit(W), F.col("n") - F.col("chunk_idx") * S)
    chunk_text = F.expr(f"concat_ws(' ', slice(toks, chunk_idx * {S} + 1, least({W}, n - chunk_idx * {S})))")
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.col("chunk_idx") * S).cast("bigint").alias("start_tok"),
        chunk_len.cast("bigint").alias("n_chunk_tokens"),
        F.md5(chunk_text).alias("chunk_hash"),
    )


def q80b_component_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster collapse keeping the best-QUALITY member —
    the production dedup semantics (Lee et al. 2022 keep one doc per
    duplicate cluster; keeping the highest-quality member beats q80's
    min-id keeper when near-dups differ in cleanliness). Keeper =
    argmax over (quality, then lowest doc_id) per component.

    Scale shape: components come from the CANDIDATE graph (orders of
    magnitude smaller than the corpus), so the component labels are
    broadcast into one corpus-side quality join — the corpus is
    scanned once and never shuffled; the per-component argmax then
    runs on the candidate-sized joined frame."""
    pairs = q54_minhash_candidates(spark, sf_dir).filter(F.col("est_jaccard") >= 0.5)
    comps = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    quality = q57_quality_score(spark, sf_dir).select("doc_id", "quality")
    j = quality.join(F.broadcast(comps), "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("quality"), "doc_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("cluster_size", F.count(F.lit(1)).over(Window.partitionBy("component")))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            "cluster_size",
            F.col("doc_id").alias("keeper_doc_id"),
            F.col("quality").alias("keeper_quality"),
        )
        .orderBy("component")
    )


QUERIES = {
    "q48_decontaminate": q48_decontaminate,
    "q48b_span_decontaminate": q48b_span_decontaminate,
    "q49_sequence_packing": q49_sequence_packing,
    "q49b_greedy_packing": q49b_greedy_packing,
    "packing_invariants_report": packing_invariants_report,
    "q49c_rag_chunking": q49c_rag_chunking,
    "q57b_repetition_signals": q57b_repetition_signals,
    "q57c_unigram_logprob": q57c_unigram_logprob,
    "q67b_heavy_hitters": q67b_heavy_hitters,
    "q67c_stream_heavy_hitters": q67c_stream_heavy_hitters,
    "q80b_component_representatives": q80b_component_representatives,
    "q50_dedup_exact": q50_dedup_exact,
    "q51_fingerprint": q51_fingerprint,
    "q52_ngram_jaccard": q52_ngram_jaccard,
    "q133_shingle_containment": q133_shingle_containment,
    "q53_minhash_signatures": q53_minhash_signatures,
    "q54_minhash_candidates": q54_minhash_candidates,
    "q55_simhash": q55_simhash,
    "q56_langid": q56_langid,
    "q57_quality_score": q57_quality_score,
    "q58_token_stats": q58_token_stats,
    "q59_char_fingerprint": q59_char_fingerprint,
    "q67_token_counting": q67_token_counting,
    "q68_data_pipeline": q68_data_pipeline,
    "q78_pii_scrub": q78_pii_scrub,
    "q79_corpus_mix": q79_corpus_mix,
    "q80_dedup_components": q80_dedup_components,
    "q97_paragraph_dedup": q97_paragraph_dedup,
    "q113_substring_dedup": q113_substring_dedup,
    "q114_boilerplate_scrub": q114_boilerplate_scrub,
}

def _duck_shingles_over(rel: str) -> str:
    """The q50-family shingle stream over ANY (doc_id, text) relation —
    the parameterization that lets composed oracles (q135) replay the
    member machinery over snapshot-derived texts. ``_DUCK_SHINGLES_SQL``
    is exactly ``_duck_shingles_over("documents")``."""
    return f"""
    SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(toks) >= 3 THEN
            list_transform(generate_series(1, len(toks) - 2),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        ELSE [] END)) AS shingle
    FROM (SELECT doc_id, {_DUCK_TOKS} AS toks FROM {rel}) t
"""


def _duck_sig_over(rel: str) -> str:
    return f"""
    SELECT doc_id, seed,
           min(([{", ".join(map(str, MINHASH_A))}][seed + 1] * h0
                + [{", ".join(map(str, MINHASH_B))}][seed + 1]) % {MINHASH_M}) AS minhash
    FROM (SELECT doc_id, {_DUCK_H60.format(expr="shingle")} % {MINHASH_M} AS h0
          FROM ({_duck_shingles_over(rel)}) raw) s,
         generate_series(0, {N_MINHASH - 1}) AS g(seed)
    GROUP BY doc_id, seed
"""


def _duck_per_doc_sig_over(rel: str) -> str:
    return f"""
    SELECT doc_id, list(minhash ORDER BY seed) AS sig
    FROM ({_duck_sig_over(rel)}) q GROUP BY doc_id
"""


_DUCK_SIG_SQL = _duck_sig_over("documents")

_DUCK_PER_DOC_SIG = _duck_per_doc_sig_over("documents")

_rows_per_band = N_MINHASH // N_BANDS
_DUCK_BANDS = " , ".join(
    "md5(concat_ws(',', {b}, {vals}))".format(
        b=b, vals=", ".join(f"sig[{b * _rows_per_band + r + 1}]" for r in range(_rows_per_band))
    )
    for b in range(N_BANDS)
)

_DUCK_SIMHASH_BITSUMS = ", ".join(
    f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS s{j}" for j in range(SIMHASH_BITS)
)
_DUCK_SIMHASH_COMBINE = " + ".join(
    f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
)

_LANG_SCORE_STRUCTS = ", ".join(
    "{{'score': {score}, 'lang': '{lang}'}}".format(
        score=" + ".join(f"len(list_filter(toks, t -> t = '{m}'))" for m in markers),
        lang=lang,
    )
    for lang, markers in sorted(_LANG_MARKERS.items())
)

_DUCK_EDGES = f"""
    SELECT doc_a AS src, doc_b AS dst FROM (
        WITH per_doc AS ({_DUCK_PER_DOC_SIG}),
        bands AS (
            SELECT doc_id, sig, unnest([{_DUCK_BANDS}]) AS band_key FROM per_doc),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.sig AS sa, b.sig AS sb
            FROM bands a JOIN bands b
              ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               ({" + ".join(f"(sa[{i+1}] = sb[{i+1}])::int" for i in range(N_MINHASH))})::double
                 / {N_MINHASH} AS est_jaccard
        FROM pairs) e
    WHERE est_jaccard >= 0.5
"""

# doc_id → _trunc6 quality, verbatim from the proven q57 oracle (FP op
# order matters for the bit-exact compare — keep identical)
_DUCK_QUALITY = """
    SELECT doc_id,
           floor((0.4 * least(len(toks) / 100.0, 1.0)
                 + 0.3 * (len(list_distinct(toks))::double / len(toks))
                 + 0.3 * least((n_alpha::double / len(toks)) / 10.0, 1.0)) * 1e6) / 1e6
               AS quality
    FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks,
                 length(regexp_replace(trim(text), ' +', '', 'g')) AS n_alpha
          FROM documents) t
"""

ORACLE = {
    "q57b_repetition_signals": f"""
        WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
        base AS (SELECT doc_id, len(toks)::bigint AS n_tokens, toks FROM t),
        grams AS (
            SELECT doc_id, 2 AS n,
                   unnest(CASE WHEN len(toks) >= 2 THEN
                       list_transform(generate_series(1, len(toks) - 1),
                                      i -> toks[i] || ' ' || toks[i+1])
                       ELSE [] END) AS gram
            FROM base
            UNION ALL
            SELECT doc_id, 3,
                   unnest(CASE WHEN len(toks) >= 3 THEN
                       list_transform(generate_series(1, len(toks) - 2),
                                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                       ELSE [] END)
            FROM base),
        counts AS (SELECT doc_id, n, gram, count(*) AS c
                   FROM grams GROUP BY doc_id, n, gram),
        per_doc AS (
            SELECT doc_id,
                   sum(CASE WHEN n = 2 THEN c END) AS tot2,
                   count(CASE WHEN n = 2 THEN 1 END) AS dis2,
                   max(CASE WHEN n = 2 THEN c END) AS top2,
                   sum(CASE WHEN n = 3 THEN c END) AS tot3,
                   count(CASE WHEN n = 3 THEN 1 END) AS dis3,
                   max(CASE WHEN n = 3 THEN c END) AS top3
            FROM counts GROUP BY doc_id)
        SELECT b.doc_id, b.n_tokens,
               coalesce(floor((tot2 - dis2)::double / tot2 * 1e6) / 1e6, 0.0)
                   AS dup_2gram_frac,
               coalesce(floor(top2::double / tot2 * 1e6) / 1e6, 0.0)
                   AS top_2gram_frac,
               coalesce(floor((tot3 - dis3)::double / tot3 * 1e6) / 1e6, 0.0)
                   AS dup_3gram_frac,
               coalesce(floor(top3::double / tot3 * 1e6) / 1e6, 0.0)
                   AS top_3gram_frac,
               (coalesce(floor(top2::double / tot2 * 1e6) / 1e6, 0.0) > {REP_TOP2_MAX}
                OR coalesce(floor((tot3 - dis3)::double / tot3 * 1e6) / 1e6, 0.0)
                   > {REP_DUP3_MAX}) AS repetitive
        FROM base b LEFT JOIN per_doc p USING (doc_id)
    """,
    "q57c_unigram_logprob": f"""
        WITH toks AS (
            SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents),
        lm AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
        n AS (SELECT sum(c)::bigint AS n FROM lm)
        SELECT t.doc_id, count(*)::bigint AS n_tokens,
               floor(avg(-ln(lm.c / n.n)) * 1e6) / 1e6 AS avg_neg_logprob
        FROM toks t JOIN lm USING (tok) CROSS JOIN n
        GROUP BY t.doc_id
    """,
    "q67b_heavy_hitters": f"""
        WITH toks AS (
            SELECT unnest({_DUCK_TOKS}) AS tok FROM documents),
        cnt AS (SELECT tok, count(*) AS n_occurrences FROM toks GROUP BY tok)
        SELECT tok, n_occurrences::bigint AS n_occurrences,
               row_number() OVER (ORDER BY n_occurrences DESC, tok)::bigint AS rank
        FROM cnt ORDER BY n_occurrences DESC, tok LIMIT {HH_TOPK}
    """,
    "q67c_stream_heavy_hitters": f"""
        WITH toks AS (
            SELECT unnest({_DUCK_TOKS}) AS tok FROM documents),
        cnt AS (SELECT tok, count(*) AS n_occurrences FROM toks GROUP BY tok)
        SELECT tok, n_occurrences::bigint AS n_occurrences,
               row_number() OVER (ORDER BY n_occurrences DESC, tok)::bigint AS rank
        FROM cnt ORDER BY n_occurrences DESC, tok LIMIT {HH_TOPK}
    """,
    "q49c_rag_chunking": f"""
        WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
        b AS (SELECT doc_id, toks, len(toks) AS n FROM t),
        c AS (SELECT doc_id, toks, n,
                     unnest(generate_series(0,
                         ((greatest(0, n - {RAG_CHUNK_TOKENS}) + {RAG_CHUNK_STRIDE} - 1)
                          // {RAG_CHUNK_STRIDE})::int)) AS chunk_idx
              FROM b)
        SELECT doc_id, chunk_idx::bigint AS chunk_idx,
               (chunk_idx * {RAG_CHUNK_STRIDE})::bigint AS start_tok,
               least({RAG_CHUNK_TOKENS}, n - chunk_idx * {RAG_CHUNK_STRIDE})::bigint
                   AS n_chunk_tokens,
               md5(array_to_string(
                   toks[(chunk_idx * {RAG_CHUNK_STRIDE} + 1):
                        (chunk_idx * {RAG_CHUNK_STRIDE}
                         + least({RAG_CHUNK_TOKENS}, n - chunk_idx * {RAG_CHUNK_STRIDE}))],
                   ' ')) AS chunk_hash
        FROM c
    """,
    "q80b_component_representatives": f"""
        WITH RECURSIVE edges AS ({_DUCK_EDGES}),
        undirected AS (
            SELECT src AS a, dst AS b FROM edges
            UNION SELECT dst, src FROM edges),
        reach(doc, r) AS (
            SELECT a, a FROM undirected
            UNION
            SELECT u.a, reach.r FROM undirected u JOIN reach ON u.b = reach.doc),
        comp AS (
            SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc),
        q AS ({_DUCK_QUALITY}),
        j AS (SELECT c.component, c.doc_id, q.quality
              FROM comp c JOIN q USING (doc_id)),
        r AS (SELECT *,
                     row_number() OVER (PARTITION BY component
                                        ORDER BY quality DESC, doc_id) AS rn,
                     count(*) OVER (PARTITION BY component) AS cluster_size
              FROM j)
        SELECT component, cluster_size::bigint AS cluster_size,
               doc_id AS keeper_doc_id, quality AS keeper_quality
        FROM r WHERE rn = 1 ORDER BY component
    """,
    "q48_decontaminate": f"""
        WITH sh AS ({_DUCK_SHINGLES_SQL}),
        ev AS (SELECT DISTINCT shingle FROM sh
               WHERE doc_id % {DECON_HOLDOUT_MOD} = 0),
        corpus AS (SELECT * FROM sh WHERE doc_id % {DECON_HOLDOUT_MOD} <> 0),
        sizes AS (SELECT doc_id, count(*) AS n_shingles FROM corpus GROUP BY doc_id),
        hits AS (SELECT doc_id, count(*) AS n_hits FROM corpus
                 WHERE shingle IN (SELECT shingle FROM ev) GROUP BY doc_id)
        SELECT s.doc_id, s.n_shingles::bigint AS n_shingles,
               coalesce(h.n_hits, 0)::bigint AS n_hits,
               floor(coalesce(h.n_hits, 0)::double / s.n_shingles * 1e6) / 1e6
                   AS contam_rate,
               (coalesce(h.n_hits, 0) >= {DECON_MIN_HITS}) AS contaminated
        FROM sizes s LEFT JOIN hits h USING (doc_id)
    """,
    "q48b_span_decontaminate": f"""
        WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
                      WHERE doc_id % {DECON_HOLDOUT_MOD} <> 0),
        ev AS (SELECT DISTINCT shingle FROM ({_DUCK_SHINGLES_SQL}) sh
               WHERE doc_id % {DECON_HOLDOUT_MOD} = 0),
        chunks AS ({_DUCK_CHUNKS}),
        marked AS (
            SELECT doc_id, pos, array_to_string(ct, ' ') AS chunk,
                   EXISTS (
                       SELECT 1 FROM ev e WHERE list_contains(
                           CASE WHEN len(ct) >= 3 THEN
                               list_transform(generate_series(1, len(ct) - 2),
                                   i -> ct[i] || ' ' || ct[i+1] || ' ' || ct[i+2])
                           ELSE [] END, e.shingle)
                   ) AS contaminated
            FROM chunks)
        SELECT doc_id, count(*)::bigint AS n_chunks,
               count(*) FILTER (WHERE contaminated)::bigint AS n_removed,
               floor(count(*) FILTER (WHERE contaminated)::double
                     / count(*) * 1e6) / 1e6 AS removed_rate,
               {_duck_kept_md5("NOT contaminated")} AS clean_text_hash
        FROM marked GROUP BY doc_id
    """,
    "q49_sequence_packing": f"""
        WITH t AS (
            SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
                   len(string_split_regex(trim(text), ' +')) AS n_tokens
            FROM documents),
        c AS (
            SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) AS end_tok
            FROM t)
        SELECT doc_id, shard::bigint AS shard, n_tokens::bigint AS n_tokens,
               (end_tok - n_tokens)::bigint AS start_tok,
               end_tok::bigint AS end_tok,
               floor((end_tok - n_tokens)::double / {PACK_WINDOW})::bigint
                   AS first_window,
               floor((end_tok - 1)::double / {PACK_WINDOW})::bigint AS last_window,
               (floor((end_tok - 1)::double / {PACK_WINDOW})
                - floor((end_tok - n_tokens)::double / {PACK_WINDOW}) + 1)::bigint
                   AS n_windows
        FROM c
    """,
    "q80_dedup_components": f"""
        WITH RECURSIVE edges AS ({_DUCK_EDGES}),
        undirected AS (
            SELECT src AS a, dst AS b FROM edges
            UNION SELECT dst, src FROM edges),
        reach(doc, r) AS (
            SELECT a, a FROM undirected
            UNION
            SELECT u.a, reach.r FROM undirected u JOIN reach ON u.b = reach.doc),
        comp AS (
            SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc)
        SELECT component, count(*) AS cluster_size, min(doc_id) AS keeper
        FROM comp GROUP BY component ORDER BY component
    """,
    "q68_data_pipeline": """
        WITH kept AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY md5(text)
                                             ORDER BY doc_id) AS rn
                FROM documents) t WHERE rn = 1),
        scored AS (
            SELECT lang,
                   len(string_split_regex(trim(text), ' +')) AS n_tokens,
                   0.4 * least(len(string_split_regex(trim(text), ' +')) / 100.0, 1.0)
                 + 0.3 * (len(list_distinct(string_split_regex(trim(text), ' +')))::double
                          / len(string_split_regex(trim(text), ' +')))
                 + 0.3 * least(length(regexp_replace(trim(text), ' +', '', 'g'))::double
                               / len(string_split_regex(trim(text), ' +')) / 10.0, 1.0)
                   AS quality
            FROM kept)
        SELECT lang, count(*) AS n_docs,
               sum(n_tokens)::bigint AS token_budget,
               round(avg(quality), 6) AS avg_quality
        FROM scored WHERE quality >= 0.5
        GROUP BY lang ORDER BY lang
    """,
    "q67_token_counting": r"""
        WITH t AS (
            SELECT doc_id, text,
                   len(string_split_regex(trim(text), ' +')) AS ws_tokens,
                   len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS bpe_tokens
            FROM documents)
        SELECT doc_id, ws_tokens::int AS ws_tokens, bpe_tokens::int AS bpe_tokens,
               length(text)::int AS n_chars,
               round(length(text)::double / nullif(bpe_tokens, 0), 6) AS chars_per_token
        FROM t
    """,
    "q50_dedup_exact": """
        SELECT md5(text) AS text_hash, min(doc_id) AS keeper_doc_id, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "q97_paragraph_dedup": f"""
        WITH toks AS (
            SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
        chunks AS ({_DUCK_CHUNKS}),
        marked AS (
            SELECT doc_id, pos, array_to_string(ct, ' ') AS chunk,
                   row_number() OVER (PARTITION BY md5(array_to_string(ct, ' '))
                                      ORDER BY doc_id, pos) AS rn
            FROM chunks)
        SELECT doc_id, count(*) AS n_chunks,
               count(*) FILTER (WHERE rn = 1) AS n_kept,
               {_duck_kept_md5("rn = 1")} AS dedup_text_hash
        FROM marked GROUP BY doc_id ORDER BY doc_id
    """,
    "q114_boilerplate_scrub": f"""
        WITH toks AS (
            SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
        chunks AS ({_DUCK_CHUNKS}),
        marked AS (
            SELECT doc_id, pos, array_to_string(ct, ' ') AS chunk,
                   count(*) OVER (PARTITION BY md5(array_to_string(ct, ' '))) AS cnt
            FROM chunks)
        SELECT doc_id, count(*) AS n_chunks,
               count(*) FILTER (WHERE cnt >= {BOILER_MIN_COUNT}) AS n_boiler,
               {_duck_kept_md5(f"cnt < {BOILER_MIN_COUNT}")} AS clean_text_hash
        FROM marked GROUP BY doc_id ORDER BY doc_id
    """,
    # groups by window TEXT where Spark groups by its xxhash64 —
    # identical modulo 64-bit fingerprint collisions (documented)
    "q113_substring_dedup": f"""
        WITH toks AS (SELECT doc_id, {_DUCK_TOKS} AS t FROM documents),
        wins AS (
            SELECT doc_id, g.i::int AS pos,
                   array_to_string(t[(g.i + 1):(g.i + {SUBSTR_W})], ' ') AS w
            FROM toks, generate_series(0, 100000) AS g(i)
            WHERE g.i <= len(t) - {SUBSTR_W}),
        dup AS (
            SELECT doc_id, pos FROM (
                SELECT doc_id, pos,
                       row_number() OVER (PARTITION BY w
                                          ORDER BY doc_id, pos) AS rn
                FROM wins) WHERE rn > 1),
        dw AS (SELECT doc_id, count(*) AS n_dup_windows FROM dup GROUP BY doc_id),
        tokpos AS (
            SELECT doc_id, g.i::int AS p, t[g.i + 1] AS tok, len(t) AS n
            FROM toks, generate_series(0, 100000) AS g(i)
            WHERE g.i < len(t)),
        cov AS (
            SELECT tp.*, EXISTS (
                       SELECT 1 FROM dup
                       WHERE dup.doc_id = tp.doc_id
                         AND dup.pos BETWEEN tp.p - {SUBSTR_W - 1} AND tp.p
                   ) AS removed
            FROM tokpos tp)
        SELECT c.doc_id, max(c.n)::bigint AS n_tokens,
               coalesce(max(dw.n_dup_windows), 0)::bigint AS n_dup_windows,
               count(*) FILTER (WHERE c.removed)::bigint AS n_removed,
               md5(coalesce(string_agg(c.tok, ' ' ORDER BY c.p)
                              FILTER (WHERE NOT c.removed), '')) AS clean_text_hash
        FROM cov c LEFT JOIN dw ON c.doc_id = dw.doc_id
        GROUP BY c.doc_id ORDER BY c.doc_id
    """,
    "q51_fingerprint": """
        SELECT doc_id, md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fingerprint
        FROM documents
    """,
    "q78_pii_scrub": f"""
        SELECT doc_id,
               {", ".join(
                   f"len(regexp_extract_all(text, '{p}'))::int AS n_{name}"
                   for name, p in _PII_PATTERNS.items()
               )},
               md5({"".join(
                   "regexp_replace(" for _ in _PII_PATTERNS
               )}text{"".join(
                   f", '{p}', '[{name.upper()}]', 'g')"
                   for name, p in _PII_PATTERNS.items()
               )}) AS scrubbed_hash,
               length({"".join(
                   "regexp_replace(" for _ in _PII_PATTERNS
               )}text{"".join(
                   f", '{p}', '[{name.upper()}]', 'g')"
                   for name, p in _PII_PATTERNS.items()
               )})::int AS scrubbed_len
        FROM documents
    """,
    "q79_corpus_mix": f"""
        WITH sel AS (
            SELECT doc_id, lang,
                   count(*) OVER (PARTITION BY lang) AS n_l,
                   {" ".join(
                       f"WHEN '{k}' THEN {v}" for k, v in sorted(MIX_TARGET.items())
                   ).join(["CASE lang ", " ELSE 0 END"])} AS p_l
            FROM documents),
        rated AS (
            SELECT *, min(CASE WHEN p_l > 0 THEN n_l / p_l END) OVER () * p_l / n_l AS rate,
                   ('0x' || substr(md5('mix:' || doc_id), 1, 15))::bigint % 1000000 AS h
            FROM sel)
        SELECT lang, max(n_l)::bigint AS n_before,
               sum((h < floor(rate * 1e6))::int)::bigint AS n_selected,
               max(floor(rate * 1e6)::bigint) AS rate_ppm
        FROM rated GROUP BY lang ORDER BY lang
    """,
    "q52_ngram_jaccard": f"""
        WITH per_doc AS ({_DUCK_PER_DOC_SIG}),
        bands AS (
            SELECT doc_id, unnest([{_DUCK_BANDS}]) AS band_key FROM per_doc),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        sh AS (
            SELECT doc_id, {_DUCK_H60.format(expr="shingle")} AS sh_h
            FROM ({_DUCK_SHINGLES_SQL}) raw),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*) AS n_inter
            FROM cand c
            JOIN sh a ON a.doc_id = c.doc_a
            JOIN sh b ON b.doc_id = c.doc_b AND b.sh_h = a.sh_h
            GROUP BY c.doc_a, c.doc_b)
        SELECT doc_a, doc_b,
               round(n_inter::double / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE n_inter::double / (sa.n_sh + sb.n_sh - n_inter) >= 0.2
    """,
    # q52's candidate/intersection machinery with Broder containment
    # arithmetic — exact integer counts onto the 1e-6 rounding grid
    "q133_shingle_containment": f"""
        WITH per_doc AS ({_DUCK_PER_DOC_SIG}),
        bands AS (
            SELECT doc_id, unnest([{_DUCK_BANDS}]) AS band_key FROM per_doc),
        cand AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM bands a JOIN bands b
              ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
        sh AS (
            SELECT doc_id, {_DUCK_H60.format(expr="shingle")} AS sh_h
            FROM ({_DUCK_SHINGLES_SQL}) raw),
        sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        inter AS (
            SELECT c.doc_a, c.doc_b, count(*)::bigint AS n_inter
            FROM cand c
            JOIN sh a ON a.doc_id = c.doc_a
            JOIN sh b ON b.doc_id = c.doc_b AND b.sh_h = a.sh_h
            GROUP BY c.doc_a, c.doc_b)
        SELECT doc_a, doc_b, n_inter,
               round(n_inter::double / sa.n_sh, 6) AS contain_a,
               round(n_inter::double / sb.n_sh, 6) AS contain_b,
               greatest(round(n_inter::double / sa.n_sh, 6),
                        round(n_inter::double / sb.n_sh, 6)) AS max_containment
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE greatest(round(n_inter::double / sa.n_sh, 6),
                       round(n_inter::double / sb.n_sh, 6)) >= {CONTAIN_MIN}
        ORDER BY doc_a, doc_b
    """,
    "q53_minhash_signatures": f"SELECT doc_id, seed::int AS seed, minhash FROM ({_DUCK_SIG_SQL}) z ORDER BY doc_id, seed",
    "q54_minhash_candidates": f"""
        WITH per_doc AS ({_DUCK_PER_DOC_SIG}),
        bands AS (
            SELECT doc_id, sig, unnest([{_DUCK_BANDS}]) AS band_key FROM per_doc),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   a.sig AS sa, b.sig AS sb
            FROM bands a JOIN bands b
              ON a.band_key = b.band_key AND a.doc_id < b.doc_id)
        SELECT doc_a, doc_b,
               round(({" + ".join(f"(sa[{i+1}] = sb[{i+1}])::int" for i in range(N_MINHASH))})::double
                     / {N_MINHASH}, 6) AS est_jaccard
        FROM pairs
    """,
    "q55_simhash": f"""
        WITH toks AS (
            SELECT doc_id, unnest(list_distinct({_DUCK_TOKS})) AS tok FROM documents),
        hashed AS (
            SELECT doc_id, {_DUCK_H60.format(expr="tok")} AS h FROM toks),
        bitsums AS (
            SELECT doc_id, {_DUCK_SIMHASH_BITSUMS} FROM hashed GROUP BY doc_id)
        SELECT doc_id, ({_DUCK_SIMHASH_COMBINE})::bigint AS simhash FROM bitsums
    """,
    "q56_langid": f"""
        WITH t AS (
            SELECT doc_id, lang,
                   string_split_regex(trim(lower(text)), ' +') AS toks
            FROM documents),
        scored AS (
            SELECT doc_id, lang, list_max([{_LANG_SCORE_STRUCTS}]) AS best FROM t)
        SELECT doc_id, lang, best.lang AS predicted_lang,
               best.score::bigint AS marker_hits
        FROM scored
    """,
    "q57_quality_score": """
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(trim(text), ' +') AS toks,
                   length(regexp_replace(trim(text), ' +', '', 'g')) AS n_alpha
            FROM documents),
        m AS (
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   len(list_distinct(toks)) AS n_distinct,
                   n_alpha::double / len(toks) AS mean_tok_len
            FROM t),
        s AS (
            -- floor(x*1e6)/1e6 mirrors Spark's _trunc6: deterministic
            -- across engines where round(x, 6) flips on exact ties
            SELECT *,
                   floor((0.4 * least(n_tokens / 100.0, 1.0)
                         + 0.3 * (n_distinct::double / n_tokens)
                         + 0.3 * least(mean_tok_len / 10.0, 1.0)) * 1e6) / 1e6 AS quality
            FROM m)
        SELECT doc_id, n_tokens::int AS n_tokens, n_distinct::int AS n_distinct,
               floor((n_distinct::double / n_tokens) * 1e6) / 1e6 AS distinct_ratio,
               floor(mean_tok_len * 1e6) / 1e6 AS mean_tok_len,
               quality,
               CASE WHEN quality >= 0.7 THEN 'high'
                    WHEN quality >= 0.5 THEN 'mid' ELSE 'low' END AS bucket
        FROM s
    """,
    "q58_token_stats": f"""
        WITH toks AS (
            SELECT lang, doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents)
        SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_tokens,
               count(DISTINCT tok) AS vocab,
               round(count(*)::double / count(DISTINCT doc_id), 6) AS tokens_per_doc
        FROM toks GROUP BY lang ORDER BY lang
    """,
    "q59_char_fingerprint": f"""
        SELECT doc_id,
               min({_DUCK_H60.format(expr="substr(text, g.i::int, 8)")}) AS rolling_min_hash
        FROM documents, generate_series(1, 10000) AS g(i)
        WHERE g.i <= greatest(1, length(text) - 7)
        GROUP BY doc_id
    """,
}


# ------------------------------------ incremental ingest dedup (r5)

INCR_BATCH_MOD = 3  # fixture split: doc_id % 3 == 0 is the "new" batch


def q102_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup — the CONTINUOUS-crawl shape the other
    dedup legs don't cover: a newly ingested batch is deduped against
    the STANDING corpus's fingerprint store (q51 canonical-form md5)
    and against itself, labeling every batch doc
    ``dup_of_history`` / ``dup_in_batch`` / ``new``. q50 is the
    periodic global compaction (rescans everything); the streaming
    dedup is watermark-bounded (forgets beyond the window); this is
    the middle path a daily 100 TB ingest actually runs: probe a
    persisted fingerprint table, rescan nothing.

    Fixture split: ``doc_id % INCR_BATCH_MOD == 0`` is the new batch,
    the rest is history (the q48 holdout-mod pattern, so the oracle
    reproduces the split exactly).

    Scale shape: the history side is projected to DISTINCT 16-byte
    fingerprints only — the fingerprint STORE, not the corpus (at
    100 TB: a bucketed table on fingerprint, making this probe a
    co-located join with no history-side shuffle; q50's keeper pass
    is what maintains it). One left join + one within-batch window on
    the same fingerprint key — the exchange introduced for the join
    is reused by the window (same partitioning), so the batch shuffles
    once. No text moves for history; only the new batch carries
    payload."""
    batch, hist = _ingest_split(spark, sf_dir)
    joined = batch.join(
        hist.withColumn("in_hist", F.lit(True)), "fingerprint", "left"
    )
    return _ingest_status(joined)


def _ingest_split(spark: SparkSession, sf_dir: str):
    """The (batch, distinct-history-fingerprint) split shared by q102
    and q102b — ONE definition so the canonical form and the split rule
    cannot drift between the plain probe and its bloom-prefiltered
    twin (their oracle is literally the same SQL)."""
    d = table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), " +", " ")
    fp = d.select("doc_id", F.md5(norm).alias("fingerprint"))
    batch = fp.filter(F.col("doc_id") % INCR_BATCH_MOD == 0)
    hist = (
        fp.filter(F.col("doc_id") % INCR_BATCH_MOD != 0)
        .select("fingerprint")
        .distinct()
    )
    return batch, hist


def _ingest_status(frame: DataFrame) -> DataFrame:
    """Shared q102/q102b status labeling over (doc_id, fingerprint,
    in_hist): history dups, then within-batch first-occurrence keeper,
    else new."""
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        frame.withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "fingerprint",
            F.when(F.col("in_hist"), F.lit("dup_of_history"))
            .when(F.col("rn") > 1, F.lit("dup_in_batch"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


QUERIES["q102_incremental_dedup"] = q102_incremental_dedup

ORACLE["q102_incremental_dedup"] = f"""
    WITH fp AS (
        SELECT doc_id,
               md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fingerprint
        FROM documents),
    batch AS (SELECT * FROM fp WHERE doc_id % {INCR_BATCH_MOD} = 0),
    hist AS (SELECT DISTINCT fingerprint
             FROM fp WHERE doc_id % {INCR_BATCH_MOD} <> 0)
    SELECT b.doc_id, b.fingerprint,
           CASE WHEN h.fingerprint IS NOT NULL THEN 'dup_of_history'
                WHEN row_number() OVER (PARTITION BY b.fingerprint
                                        ORDER BY b.doc_id) > 1
                     THEN 'dup_in_batch'
                ELSE 'new' END AS status
    FROM batch b LEFT JOIN hist h USING (fingerprint)
"""


# ---------------------------------- Bloom-prefiltered ingest dedup (r5)

# bloom geometry: bits-per-key 16 with 8 hash functions gives
# fpp ≈ 0.057^... (1 - e^(-8/16))^8 ≈ 4.6e-4 — small enough that the
# exact-join side stays ≈ true-dup-sized. Bits derive from the
# history count (power of two so the mod is a mask), floored for
# fixture corpora.
BLOOM_BITS_PER_KEY = 16
BLOOM_HASHES = 8
BLOOM_MIN_BITS = 1 << 14
# broadcast-budget cap (2^33 bits = 1 GiB bitmap). CAP HONESTY (the
# MAX_LSH_BANDS pattern): above ~5·10^8 history keys the capped
# bitmap's fill ratio rises and fpp degrades toward 1 — the prefilter
# admits more rows but NEVER drops a true duplicate, so correctness
# holds and the cost gracefully reverts to q102's plain join. Past
# that point the right deployment is a PARTITIONED bloom (one bitmap
# per fingerprint bucket, probed after the batch is bucketed the same
# way) rather than a bigger broadcast.
BLOOM_MAX_BITS = 1 << 33


def _derive_bloom_bits(n_keys: int) -> int:
    bits = BLOOM_MIN_BITS
    while bits < min(n_keys * BLOOM_BITS_PER_KEY, BLOOM_MAX_BITS):
        bits <<= 1
    return bits


def q102b_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q102's ingest dedup with a BLOOM PREFILTER on the history
    probe — the shape that matters when the standing fingerprint
    store is 100 TB-corpus-sized but the daily batch is mostly NEW
    content (a crawl frontier): rows whose fingerprint is
    bloom-negative are *provably* absent from history (no false
    negatives by construction), so they skip the history join
    entirely and only the bloom-positive sliver (true dups + fpp ≈
    5e-4 of the new rows) pays the shuffle. Same answer as q102 —
    the bloom is an optimization, the oracle is identical.

    Scale shape, stage by stage:
    1. build: history fingerprints fold into ONE bitmap per partition
       via ``mapInPandas`` (the q67b per-partition-summary pattern —
       each task emits bits/8 bytes regardless of partition size),
       and the driver ORs the ≤ numPartitions summaries (at cluster
       scale: treeAggregate, same algebra). Bits derive from the
       history count (_derive_bloom_bits) so fpp holds at any N.
    2. probe: the 8 hash positions are computed JVM-side
       (xxhash64 & mask — no Python in the hash path); a vectorized
       pandas UDF only gathers bits from the broadcast bitmap.
    3. bloom-negative rows short-circuit to in_hist = false; ONLY
       bloom-positives join the history store. The within-batch
       dup_in_batch window runs over the whole batch either way
       (a bloom-negative row can still be a within-batch dup).

    History-side note: the bitmap build scans the store once; a real
    deployment maintains it incrementally (bloom bitmaps OR, so each
    day's additions fold in without a rebuild) — the merge property
    the test pins."""
    batch, hist = _ingest_split(spark, sf_dir)
    n_hist = hist.count()
    bits = _derive_bloom_bits(n_hist)
    mask = bits - 1

    def _positions(col):
        # positions stay BIGINT: bits may legitimately exceed 2^31
        # (the cap is BLOOM_MAX_BITS = 2^33), where an int cast would
        # throw under ANSI mode / wrap-alias under legacy mode
        return F.array(
            *[
                F.xxhash64(col, F.lit(i)).bitwiseAND(F.lit(mask))
                for i in range(BLOOM_HASHES)
            ]
        )

    def _fold(batches):
        bitmap = np.zeros(bits // 8, dtype=np.uint8)
        seen = False
        for pdf in batches:
            seen = True
            pos = np.concatenate(pdf["pos"].to_numpy()) if len(pdf) else np.array([], dtype=np.int64)
            pos = pos.astype(np.int64)
            np.bitwise_or.at(bitmap, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bitmap": [bitmap.tobytes()]})

    folded = hist.select(_positions(F.col("fingerprint")).alias("pos")).mapInPandas(
        _fold, "bitmap binary"
    )

    def _or_bytes(a: bytes, b: bytes) -> bytes:
        return (np.frombuffer(a, dtype=np.uint8) | np.frombuffer(b, dtype=np.uint8)).tobytes()

    # executor-side tree OR (bloom bitmaps are a commutative monoid):
    # the driver receives ONE bits/8-byte bitmap, not one per
    # partition — at the BLOOM_MAX_BITS cap a per-partition collect
    # would be numPartitions × 1 GiB on the driver
    if n_hist == 0:
        bitmap = np.zeros(bits // 8, dtype=np.uint8)
    else:
        bitmap = np.frombuffer(
            folded.rdd.map(lambda r: r.bitmap).treeReduce(_or_bytes, depth=2),
            dtype=np.uint8,
        ).copy()
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def _maybe_in_hist(pos: pd.Series) -> pd.Series:
        bm = bc.value
        p = np.vstack(pos.to_numpy()).astype(np.int64)        # (n, k)
        hit = (bm[p >> 3] & (1 << (p & 7)).astype(np.uint8)) != 0
        return pd.Series(hit.all(axis=1))

    # materialize the probed batch ONCE: negatives and positives both
    # read it, and without the checkpoint the un-materialized subtree
    # (documents scan + md5 + 8 hash positions + the bloom-probe UDF)
    # executes twice — paying back a chunk of the prefilter's savings
    probed = batch.withColumn(
        "maybe", _maybe_in_hist(_positions(F.col("fingerprint")))
    ).localCheckpoint(eager=True)
    negatives = probed.filter(~F.col("maybe")).withColumn("in_hist", F.lit(False))
    positives = probed.filter(F.col("maybe")).join(
        hist.withColumn("in_hist_j", F.lit(True)), "fingerprint", "left"
    ).withColumn("in_hist", F.coalesce(F.col("in_hist_j"), F.lit(False))).drop("in_hist_j")
    merged = negatives.select("doc_id", "fingerprint", "in_hist").unionByName(
        positives.select("doc_id", "fingerprint", "in_hist")
    )
    return _ingest_status(merged)


QUERIES["q102b_bloom_incremental_dedup"] = q102b_bloom_incremental_dedup

# the bloom is an optimization with zero false negatives; the answer —
# and therefore the oracle — is exactly q102's
ORACLE["q102b_bloom_incremental_dedup"] = ORACLE["q102_incremental_dedup"]


# ------------------------------------------------ BPE tokenizer training (r5)

# pair-census surface: top pairs emitted by q103 (deterministic under
# the (count DESC, left, right) tie-break)
BPE_TOP_PAIRS = 20
# merge rounds learned by the q103b trainer
BPE_MERGES = 8


def _word_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq) census of the whitespace-tokenized corpus — the
    frame ALL BPE work runs on.  This is the classic subword-nmt
    factoring (Sennrich et al. 2016): pair statistics over the word
    *census* weighted by frequency are identical to pair statistics
    over the corpus, but the census is vocabulary-sized — the corpus
    is scanned exactly once, and every training iteration afterwards
    touches only |vocab| rows (reference parity: the engine-level
    "aggregate once, iterate on the small frame" pattern of
    main.py:277-335's incremental fits)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim(F.col("text")), " +")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def q103_bpe_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE round-0 pair census: the weighted frequency of every
    adjacent character pair, the statistic a byte-pair-encoding
    tokenizer trainer maximizes at each merge step.  Top
    BPE_TOP_PAIRS pairs, ties broken (left, right) ascending so the
    cut is deterministic.

    Scale shape: one corpus scan → word census (vocab-sized shuffle
    keys); the pair explode + pair agg then run over the CENSUS, so
    their cost is O(|vocab| · word_len) and the pair-agg shuffle is
    |alphabet|²-sized — independent of corpus row count.  A naive
    per-document pair explode would shuffle O(corpus tokens) rows;
    this plan never does."""
    words = _word_census(spark, sf_dir).filter(F.length("w") >= 2)
    pairs = words.select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> struct(substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b))"
            )
        ).alias("p"),
    )
    return (
        pairs.groupBy(
            F.col("p.a").alias("left_sym"), F.col("p.b").alias("right_sym")
        )
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), "left_sym", "right_sym")
        .limit(BPE_TOP_PAIRS)
    )


def _merge_pair(syms, a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a+b over a
    symbol array — one JVM-side aggregate() fold, no Python UDF.  The
    fold appends each symbol unless the accumulator tail is exactly
    ``a`` and the incoming symbol is ``b``, in which case the tail is
    replaced by the merged symbol.  A freshly merged tail can never
    re-match as the LEFT of the same pair (a+b != a for non-empty b),
    which reproduces subword-nmt's scan-from-i+2 semantics, including
    the overlapping case ("aaa" + merge(a,a) → ["aa","a"])."""
    merged = a + b

    def step(acc, x):
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            hit,
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))),
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def q103b_bpe_train(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Distributed BPE tokenizer training: learn BPE_MERGES merge
    rules over the corpus, returning the merge table
    (rank, left_sym, right_sym, merged, pair_count) — the model a BPE
    tokenizer ships.  Algorithm = subword-nmt (Sennrich et al. 2016)
    learn_bpe re-expressed for Spark:

    1. word census (corpus scanned ONCE — see _word_census);
    2. per round: adjacent-pair census over the symbol arrays (JVM
       explode + hash agg, |alphabet ∪ merges|²-keyed), top-1 pair
       by (count DESC, pair ASC) — a 1-row collect;
    3. apply the merge to every word via a JVM aggregate() fold
       (_merge_pair — no Python workers anywhere in the loop), then
       localCheckpoint to truncate the growing lineage.

    Pair counts follow subword-nmt: overlapping occurrences all count
    ("aaa" contributes 2 to (a,a)), merging is greedy left-to-right —
    so learned rules match the de-facto standard.  Rows-only by
    nature (iterative; invariants pinned in tests/test_text.py:
    round-0 top pair == q103's, total symbol count strictly
    decreases, concat(syms) always reconstructs the word).

    Scale shape: every iteration is vocab-sized — the corpus never
    re-enters.  At 100 TB the census is the only corpus-scale job;
    1e5 merge rounds would schedule 1e5 tiny jobs (the real cost at
    production merge counts), which is why the census factoring, not
    the per-round plan, is the load-bearing design choice."""
    cur = (
        _word_census(spark, sf_dir)
        .select(F.split("w", "").alias("syms"), "freq")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple] = []
    for rank in range(n_merges):
        pairs = cur.filter(F.size("syms") >= 2).select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.desc("c"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], top[0]["c"]
        merges.append((rank, a, b, a + b, int(c)))
        cur = cur.withColumn("syms", _merge_pair(F.col("syms"), a, b)).localCheckpoint(
            eager=True
        )
    return spark.createDataFrame(
        merges, "rank int, left_sym string, right_sym string, merged string, pair_count bigint"
    )


# --------------------------------------- temperature-scaled mixture (r5)

# α = 0.5 (√-share flattening, the mC4/XLM-R "temperature sampling"
# family; UniMax caps per-language epochs the same way this caps
# rate ≤ 1).  0.5 specifically because sqrt is IEEE-754 CORRECTLY
# ROUNDED in both Spark and DuckDB — pow(x, 0.7) is not, and a 1-ulp
# divergence under the floor() threshold would break the bit-exact
# oracle compare.
TEMP_WEIGHT_SCALE = 1_000_000_000  # integer weight grid (see below)


def q104_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled multilingual mixture: re-weight languages to
    p_l ∝ share_l^0.5 (flattening head languages, boosting the tail —
    the mC4/XLM-R sampling scheme), then deterministically sample docs
    to realize that mix at the largest budget where no language is
    oversampled (q79's budget law with DERIVED targets instead of the
    fixed MIX_TARGET map).

    Bit-exact-oracle determinism: the normalizer Σ sqrt(share) is a
    float sum whose value depends on ADDITION ORDER — unacceptable
    under the driver's hash gate.  So weights are snapped to an
    integer grid first (w_l = floor(sqrt(share_l)·1e9)); the bigint
    sum is exact and order-free, and every downstream double op
    (divide, min, multiply, floor) is correctly rounded on identical
    inputs in both engines.  Selection is the engine-portable md5
    threshold (q79/q99 pattern) — reproducible across engines and
    stable under corpus growth.

    Scale shape: census → |langs| rows (one partial-agg shuffle); the
    normalizer/budget scalars are WINDOW functions over that tiny
    frame — windows-over-the-corpus move 100 TB to one partition
    (q79's warning), but windows over a |langs|-row census are free
    and keep the whole derivation in ONE census computation (the
    agg+crossJoin form re-computes the census per derived scalar:
    measured 9 document scans vs this plan's 2 — census + selection;
    the corpus itself never re-partitions)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), " +")).alias("toks"),
    )
    census = d.groupBy("lang").agg(
        F.sum("toks").alias("n_l"), F.count(F.lit(1)).alias("docs_l")
    )
    wfull = Window.partitionBy(F.lit(1))
    rated = (
        census.withColumn("n_tot", F.sum("n_l").over(wfull))
        .withColumn(
            "w_l",
            F.floor(F.sqrt(F.col("n_l") / F.col("n_tot")) * TEMP_WEIGHT_SCALE),
        )
        .withColumn("w_sum", F.sum("w_l").over(wfull))
        .withColumn("p_l", F.col("w_l") / F.col("w_sum"))
        .withColumn(
            "budget",
            F.min(F.when(F.col("w_l") > 0, F.col("n_l") / F.col("p_l"))).over(wfull),
        )
        .withColumn("rate", F.col("budget") * F.col("p_l") / F.col("n_l"))
        .select(
            "lang",
            "n_l",
            "p_l",
            F.floor(F.col("rate") * 1e6).alias("thresh"),
        )
    )
    h = F.expr(
        "cast(conv(substr(md5(concat('tmix:', doc_id)), 1, 15), 16, 10) as bigint) % 1000000"
    )
    sel = d.join(F.broadcast(rated), "lang").withColumn("keep", h < F.col("thresh"))
    return (
        sel.groupBy("lang")
        .agg(
            F.max("n_l").alias("n_tokens_before"),
            F.round(F.max("p_l"), 6).alias("p_target"),
            F.max("thresh").alias("rate_ppm"),
            F.sum(F.col("keep").cast("int")).alias("docs_selected"),
            F.sum(F.when(F.col("keep"), F.col("toks")).otherwise(F.lit(0))).alias(
                "tokens_selected"
            ),
        )
        .orderBy("lang")
    )


QUERIES["q103_bpe_pair_census"] = q103_bpe_pair_census
QUERIES["q103b_bpe_train"] = q103b_bpe_train
QUERIES["q104_temperature_mixture"] = q104_temperature_mixture

ORACLE["q103_bpe_pair_census"] = f"""
    WITH words AS (
        SELECT w, count(*)::BIGINT AS freq FROM (
            SELECT unnest({_DUCK_TOKS}) AS w FROM documents) t
        WHERE length(w) >= 2 GROUP BY w),
    pairs AS (
        SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                                     i -> substr(w, i, 1))) AS left_sym,
               unnest(list_transform(generate_series(1, length(w) - 1),
                                     i -> substr(w, i + 1, 1))) AS right_sym,
               freq
        FROM words)
    SELECT left_sym, right_sym, sum(freq)::BIGINT AS pair_count
    FROM pairs GROUP BY left_sym, right_sym
    ORDER BY pair_count DESC, left_sym, right_sym
    LIMIT {BPE_TOP_PAIRS}
"""

ORACLE["q104_temperature_mixture"] = f"""
    WITH per_doc AS (
        SELECT doc_id, lang,
               len({_DUCK_TOKS})::BIGINT AS toks
        FROM documents),
    census AS (
        SELECT lang, sum(toks)::BIGINT AS n_l, count(*)::BIGINT AS docs_l
        FROM per_doc GROUP BY lang),
    weighted AS (
        SELECT *, floor(sqrt(n_l / (SELECT sum(n_l)::BIGINT FROM census))
                        * {TEMP_WEIGHT_SCALE})::BIGINT AS w_l
        FROM census),
    rated AS (
        SELECT lang, n_l,
               w_l / (SELECT sum(w_l)::BIGINT FROM weighted) AS p_l,
               floor((SELECT min(CASE WHEN w_l > 0 THEN
                          n_l / (w_l / (SELECT sum(w_l)::BIGINT FROM weighted))
                      END) FROM weighted)
                     * (w_l / (SELECT sum(w_l)::BIGINT FROM weighted)) / n_l
                     * 1e6)::BIGINT AS thresh
        FROM weighted),
    sel AS (
        SELECT d.lang, d.toks, r.n_l, r.p_l, r.thresh,
               (('0x' || substr(md5('tmix:' || d.doc_id), 1, 15))::BIGINT % 1000000
                < r.thresh) AS keep
        FROM per_doc d JOIN rated r USING (lang))
    SELECT lang, max(n_l)::BIGINT AS n_tokens_before,
           round(max(p_l), 6) AS p_target,
           max(thresh)::BIGINT AS rate_ppm,
           sum(keep::int)::BIGINT AS docs_selected,
           sum(CASE WHEN keep THEN toks ELSE 0 END)::BIGINT AS tokens_selected
    FROM sel GROUP BY lang ORDER BY lang
"""


def q103c_bpe_tokenize(
    spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES
) -> DataFrame:
    """Apply the learned BPE merge table (q103b) to the corpus — the
    tokenize step every training pipeline runs after training the
    tokenizer: per-doc subword token counts next to the whitespace
    baseline, with the compression ratio.

    Plan: the merge table is MODEL-scale (n_merges rows — collected
    like the PQ codebooks), applied to the vocabulary-sized word
    census as ``n_merges`` chained JVM ``aggregate()`` folds in ONE
    projection (no Python workers, no per-round jobs — training
    needed per-round censuses, applying does not).  Per-doc counts
    then come from explode → broadcast-join(word → n_subtokens) →
    re-agg; the exploded rows stay co-located with their document, so
    partial aggregation collapses the shuffle to ~1 row per doc.
    The broadcast assumes a BOUNDED vocabulary (same precondition and
    same fallback as q57c's unigram-LM join: for unbounded key
    domains drop the hint so AQE shuffle-joins, or min-count-prune
    the census first — q67b's heavy-hitter machinery).
    Rows-only: the learned merges are data-derived, so no static SQL
    oracle exists (invariants: ws_tokens ≤ bpe_tokens ≤ non-space
    chars, monotone non-increasing in n_merges — tests/test_text.py).

    This contract query trains-then-applies for self-containment; a
    production pipeline persists the merge table once (model sink,
    engine/io.py) and runs only the apply side per corpus snapshot."""
    merges = q103b_bpe_train(spark, sf_dir, n_merges=n_merges).orderBy("rank").collect()
    syms = F.split("w", "")
    for m in merges:
        syms = _merge_pair(syms, m.left_sym, m.right_sym)
    word_tokens = _word_census(spark, sf_dir).select(
        "w", F.size(syms).alias("n_sub")
    )
    d = table(spark, sf_dir, "documents")
    exploded = d.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), " +")).alias("w")
    ).filter(F.col("w") != "")
    return (
        exploded.join(F.broadcast(word_tokens), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("ws_tokens"),
            F.sum("n_sub").alias("bpe_tokens"),
        )
        .withColumn(
            "compression",
            F.round(F.col("bpe_tokens") / F.col("ws_tokens"), 6),
        )
    )


QUERIES["q103c_bpe_tokenize"] = q103c_bpe_tokenize


def q106_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate documents
    MUST land in the same split, or the held-out sets silently leak
    training content (the eval-hygiene failure decontamination papers
    warn about from the other direction).  The split key is therefore
    the near-dup COMPONENT (q54 candidates at est_jaccard ≥ 0.5 →
    connected components, exactly q80's clustering), falling back to
    the doc's own id for singletons; assignment is q99's
    engine-portable md5-mod-100 80/10/10 rule on that key, so the
    entire cluster moves as one unit and assignments never reshuffle
    as the corpus grows.

    Scale shape: the component frame is CANDIDATE-graph-sized (pairs
    above threshold), orders of magnitude smaller than the corpus; it
    left-joins onto the corpus as a broadcast and the corpus itself
    never re-partitions.  Oracle: q80's recursive-CTE components +
    the same hash arithmetic."""
    pairs = q54_minhash_candidates(spark, sf_dir).filter(F.col("est_jaccard") >= 0.5)
    comps = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    d = table(spark, sf_dir, "documents").select("doc_id")
    labeled = d.join(F.broadcast(comps), "doc_id", "left").withColumn(
        "split_key", F.coalesce("component", "doc_id")
    )
    h = F.expr(
        "cast(conv(substr(md5(concat('split:', split_key)), 1, 15), 16, 10) as bigint) % 100"
    )
    split = (
        F.when(h < 80, F.lit("train")).when(h < 90, F.lit("val")).otherwise(F.lit("test"))
    )
    return labeled.select("doc_id", "split_key", split.alias("split"))


QUERIES["q106_leakage_safe_split"] = q106_leakage_safe_split

ORACLE["q106_leakage_safe_split"] = f"""
    WITH RECURSIVE edges AS ({_DUCK_EDGES}),
    undirected AS (
        SELECT src AS a, dst AS b FROM edges
        UNION SELECT dst, src FROM edges),
    reach(doc, r) AS (
        SELECT a, a FROM undirected
        UNION
        SELECT u.a, reach.r FROM undirected u JOIN reach ON u.b = reach.doc),
    comp AS (
        SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc),
    labeled AS (
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS split_key
        FROM documents d LEFT JOIN comp c USING (doc_id)),
    hashed AS (
        SELECT doc_id, split_key,
               ('0x' || substr(md5('split:' || split_key), 1, 15))::BIGINT % 100 AS h
        FROM labeled)
    SELECT doc_id, split_key,
           CASE WHEN h < 80 THEN 'train'
                WHEN h < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM hashed
"""


# ---------------------------------- collocation mining / PMI (r5)

PMI_MIN_PAIR = 5   # min bigram occurrences before a pair is scored
PMI_TOP = 30


def q109_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus collocation mining: score adjacent word pairs by
    pointwise mutual information, PMI = ln(p(a,b) / (p(a)·p(b))) —
    the classic corpus-linguistics statistic for multiword
    expressions, used in training-data work to pick phrase-level
    tokenizer units and to spot templated/boilerplate constructions
    (an implausibly high-PMI pair repeated across documents is a
    fill-in-the-blank template). Top-30 pairs with ≥ PMI_MIN_PAIR
    occurrences, deterministic (pmi desc, pair asc).

    Scale shape: one exploded pass feeds BOTH censuses (unigram via
    the pair's left token + a per-doc tail correction would distort;
    instead tokens and bigrams are two projections of the same scan —
    Spark schedules them as one shuffle each with map-side partial
    agg). The unigram census is vocab-bounded (q57c's precondition);
    the bigram census is bounded by the distinct-bigram vocabulary —
    large but min-count-prunable: at open-web scale run q67b's
    heavy-hitter pass first and score only surviving pairs (same
    prune CCNet applies before LM scoring). Totals ride as broadcast
    1-row aggregates inside the plan (q69's pattern). Every count is
    exact; the single float op chain (ln of a quotient of exact
    bigints, 6-decimal floor) is engine-portable — q57c/q69 precedent
    — so the DuckDB oracle hash-matches."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), " +")
    base = d.select("doc_id", toks.alias("toks"))
    uni = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    # both normalizers from ONE narrow scan (Σ|toks| and Σ(|toks|−1)₊)
    # — NOT from the censuses: deriving them there duplicates the
    # census subtree in the plan, and summing the FILTERED bigram
    # census would normalize p(a,b) over surviving pairs only, which
    # is not PMI
    totals = base.agg(
        F.sum(F.size("toks")).alias("n_uni"),
        F.sum(F.greatest(F.size("toks") - 1, F.lit(0))).alias("n_bi"),
    )
    bi_expr = """
        CASE WHEN size(toks) >= 2 THEN
            transform(sequence(0, size(toks) - 2),
                      i -> named_struct('w1', toks[i], 'w2', toks[i + 1]))
        ELSE array() END
    """
    bi = (
        base.select(F.explode(F.expr(bi_expr)).alias("b"))
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= PMI_MIN_PAIR)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2"))
    pmi = F.log(
        (F.col("cab") / F.col("n_bi"))
        / ((F.col("c1") / F.col("n_uni")) * (F.col("c2") / F.col("n_uni")))
    )
    return (
        bi.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .join(F.broadcast(totals))
        .select("w1", "w2", "cab", _trunc6(pmi).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(PMI_TOP)
    )


QUERIES["q109_pmi_collocations"] = q109_pmi_collocations

ORACLE["q109_pmi_collocations"] = f"""
    WITH base AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), ' +') AS toks
        FROM documents),
    uni AS (
        SELECT w, count(*)::bigint AS cw
        FROM (SELECT unnest(toks) AS w FROM base) GROUP BY w),
    totals AS (
        SELECT sum(len(toks))::bigint AS n_uni,
               sum(greatest(len(toks) - 1, 0))::bigint AS n_bi
        FROM base),
    bi AS (
        SELECT p.w1 AS w1, p.w2 AS w2, count(*)::bigint AS cab
        FROM (
            SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                         i -> struct_pack(w1 := toks[i],
                                                          w2 := toks[i + 1]))) AS p
            FROM base WHERE len(toks) >= 2)
        GROUP BY 1, 2
        HAVING count(*) >= {PMI_MIN_PAIR})
    SELECT b.w1, b.w2, b.cab,
           floor(ln((b.cab / totals.n_bi::double)
                    / ((u1.cw / totals.n_uni::double)
                       * (u2.cw / totals.n_uni::double))) * 1e6) / 1e6 AS pmi
    FROM bi b
    JOIN uni u1 ON b.w1 = u1.w
    JOIN uni u2 ON b.w2 = u2.w, totals
    ORDER BY pmi DESC, b.w1, b.w2
    LIMIT {PMI_TOP}
"""


# ----------------------------- DSIR importance-weighted selection (r5)

# hashed n-gram feature space — FIXED width, so the importance table is
# unconditionally model-scale (stronger than q57c's vocab-bounded
# precondition: the bound here is by construction, not by assumption)
DSIR_BUCKETS = 4096
DSIR_TOP = 50
# target split: the q57 heuristic composite at the ml_quality_classifier
# label threshold — the "trusted reference corpus" role Wikipedia plays
# in the paper, pinned to an in-repo deterministic signal
DSIR_TARGET_QUALITY = 0.5


def q111_dsir_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023) — the published target-distribution-matching selection
    method, the third quality axis next to q57's heuristics and
    ml_quality_classifier's model: score every candidate document by
    how much more likely its hashed-n-gram features are under the
    TARGET distribution than under the raw-pool distribution, and
    select the top scorers. Where the classifier learns a decision
    boundary, DSIR matches distributions — it up-weights docs that
    look like the target corpus even when no single feature is
    individually discriminative.

    Estimator, exactly the paper's: features are unigrams + adjacent
    bigrams hashed into DSIR_BUCKETS buckets; both distributions are
    bag-of-buckets multinomials with add-one smoothing; a doc's score
    is Σ_grams log(p_target(b)/p_raw(b)). The paper then samples with
    Gumbel noise; this takes the deterministic top-k (documented
    delta — seeded Gumbel keys are a one-line extension on the same
    scores and would break the oracle for no semantic gain at
    fixture scale).

    Bit-exactness: each bucket's log-likelihood ratio is computed
    ONCE, floor-truncated to a 1e-6 integer grid (llr6, a BIGINT),
    and the per-doc score is an exact integer sum of llr6 over gram
    occurrences — order-free, so the only cross-engine float surface
    is one ln per bucket on identical doubles (q109/q69 precedent),
    never a float accumulation.

    Scale shape — TWO corpus scans, plan-snapshot-pinned, which is
    exactly the train/apply structure (q57c's LM shape): scan 1
    (train) feeds ONE conditional hash agg producing both multinomials
    — census rows are (b, ct, cr), FIXED DSIR_BUCKETS width, so
    map-side partials collapse the shuffle to numPartitions × 4096
    rows regardless of N; the smoothing totals are window sums OVER
    the census (every gram lands in a bucket, so Σct/Σcr ARE the
    totals — the q104 window-over-census move; a separate totals agg
    re-scanned the corpus, and the first cut's join-per-census shape
    cost 8 scans). Scan 2 (apply) re-derives grams and joins the
    4096-row broadcast llr table, re-aggregating ~1 row per doc
    (exploded rows stay doc-co-located, the q103c pattern). The
    target split is the inline _quality_col expression, not a join
    against q57's output — same scan, zero extra shuffles. At 100 TB
    the llr table would be FIT on yesterday's censuses and APPLIED to
    today's ingest unchanged — the apply scan never touches the
    target corpus."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.trim(F.lower(F.col("text"))), " +")
    base = d.select(
        "doc_id",
        (_quality_col() >= DSIR_TARGET_QUALITY).alias("is_target"),
        toks.alias("toks"),
    )
    bi_expr = """
        CASE WHEN size(toks) >= 2 THEN
            transform(sequence(0, size(toks) - 2),
                      i -> concat(toks[i], ' ', toks[i + 1]))
        ELSE array() END
    """
    grams = base.select(
        "doc_id",
        "is_target",
        F.explode(F.concat(F.col("toks"), F.expr(bi_expr))).alias("g"),
    )
    bucketed = grams.select(
        "doc_id",
        "is_target",
        (F.expr(_SPARK_H60.format(expr="g")) % DSIR_BUCKETS).alias("b"),
    )
    census = bucketed.groupBy("b").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("cr"),
    )
    # smoothing totals as unpartitioned window sums over the census —
    # ≤ DSIR_BUCKETS rows in one partition by construction, never
    # corpus-sized, so the single-partition window is model-scale
    wall = Window.partitionBy()
    census = census.select(
        "b",
        "ct",
        "cr",
        F.sum("ct").over(wall).alias("nt"),
        F.sum("cr").over(wall).alias("nr"),
    )
    # one ln per bucket over exact-bigint-derived doubles, identical op
    # order in the oracle: (ct+1)*(nr+B) / ((cr+1)*(nt+B)) as doubles
    # (double PRODUCTS, not bigint — bigint products overflow at
    # web-scale gram counts; the IEEE double ops are engine-identical)
    llr6 = F.floor(
        F.log(
            (F.col("ct") + 1).cast("double")
            * (F.col("nr") + DSIR_BUCKETS).cast("double")
            / ((F.col("cr") + 1).cast("double") * (F.col("nt") + DSIR_BUCKETS).cast("double"))
        )
        * F.lit(1e6)
    ).cast("bigint")
    llr = census.filter(F.col("cr") > 0).select("b", llr6.alias("llr6"))
    scored = (
        bucketed.filter(~F.col("is_target"))
        .join(F.broadcast(llr), "b")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.sum("llr6").alias("dsir_score"))
    )
    top = scored.orderBy(F.col("dsir_score").desc(), "doc_id").limit(DSIR_TOP)
    w = Window.orderBy(F.col("dsir_score").desc(), "doc_id")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "n_grams", "dsir_score", "rank"
    )


QUERIES["q111_dsir_selection"] = q111_dsir_selection

ORACLE["q111_dsir_selection"] = f"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(text), ' +') AS qtoks,
               length(regexp_replace(trim(text), ' +', '', 'g')) AS n_alpha,
               string_split_regex(trim(lower(text)), ' +') AS toks
        FROM documents),
    q AS (
        SELECT doc_id, toks,
               floor((0.4 * least(len(qtoks) / 100.0, 1.0)
                     + 0.3 * (len(list_distinct(qtoks))::double / len(qtoks))
                     + 0.3 * least((n_alpha::double / len(qtoks)) / 10.0, 1.0))
                     * 1e6) / 1e6 >= {DSIR_TARGET_QUALITY} AS is_target
        FROM t),
    grams AS (
        SELECT doc_id, is_target, unnest(
            list_concat(toks,
                CASE WHEN len(toks) >= 2 THEN
                    list_transform(generate_series(1, len(toks) - 1),
                                   i -> toks[i] || ' ' || toks[i + 1])
                ELSE [] END)) AS g
        FROM q),
    b AS (
        SELECT doc_id, is_target,
               {_DUCK_H60.format(expr="g")} % {DSIR_BUCKETS} AS b
        FROM grams),
    tgt AS (SELECT b, count(*)::bigint AS ct FROM b WHERE is_target GROUP BY b),
    raw AS (SELECT b, count(*)::bigint AS cr FROM b WHERE NOT is_target GROUP BY b),
    totals AS (
        SELECT sum(CASE WHEN is_target THEN 1 ELSE 0 END)::bigint AS nt,
               sum(CASE WHEN NOT is_target THEN 1 ELSE 0 END)::bigint AS nr
        FROM b),
    llr AS (
        SELECT raw.b,
               floor(ln((coalesce(tgt.ct, 0) + 1)::double
                        * (totals.nr + {DSIR_BUCKETS})::double
                        / ((raw.cr + 1)::double
                           * (totals.nt + {DSIR_BUCKETS})::double)) * 1e6)::bigint AS llr6
        FROM raw LEFT JOIN tgt ON raw.b = tgt.b, totals),
    scored AS (
        SELECT p.doc_id, count(*)::bigint AS n_grams, sum(l.llr6)::bigint AS dsir_score
        FROM b p JOIN llr l ON p.b = l.b
        WHERE NOT p.is_target
        GROUP BY p.doc_id)
    SELECT doc_id, n_grams, dsir_score,
           row_number() OVER (ORDER BY dsir_score DESC, doc_id)::int AS rank
    FROM scored
    ORDER BY dsir_score DESC, doc_id
    LIMIT {DSIR_TOP}
"""


# --------------------------------- dedup candidate-recall report (r5)

# Jaccard tiers the report measures candidate recall at
DEDUP_RECALL_TIERS = [0.2, 0.5, 0.8]
# truth-leg doc budget: above this corpus size the exact shingle
# self-join runs on a seeded content-addressed doc sample instead of
# the full corpus (fraction = MAX/N), so the audit itself scales —
# recall over sampled pairs is an unbiased estimate of full recall
# (candidate status is independent of the sampling hash)
DEDUP_RECALL_SAMPLE_MAX_DOCS = 2000


def dedup_recall_report(
    spark: SparkSession,
    sf_dir: str,
    sample_max_docs: int = DEDUP_RECALL_SAMPLE_MAX_DOCS,
) -> DataFrame:
    """Measured MinHash-LSH candidate recall vs the EXACT near-dup
    truth — the ann_recall_report pattern applied to text dedup: the
    q53/q54 signature+banding pipeline promises that true near-dups
    collide in some band, and this report measures that promise
    in-plan instead of leaving it to the test suite. One row per
    Jaccard tier: exact pairs at/above the tier, how many the banding
    recalled, how many it missed, and the recall ratio, plus the total
    LSH candidate count (the cost side of the trade).

    Ground truth is complete by construction over the AUDITED DOC SET:
    a pair with Jaccard > 0 shares at least one shingle, so the
    shingle-index self-join enumerates every pair any tier can admit
    (no pair is silently out of scope). The audited set is the whole
    corpus up to DEDUP_RECALL_SAMPLE_MAX_DOCS docs; above that, a
    seeded content-addressed sample (H60(doc_id) mod 1e6 < frac_ppm —
    the q117 md5 pattern, engine-portable and layout-independent) caps
    the truth leg so the audit's exact self-join scales: pair volume
    shrinks by fraction², ~25× at 10·MAX docs (measured at sf0.1:
    truth-leg shuffle drops with the sample, see SHUFFLE_AUDIT.md).
    Recall over sampled pairs is an UNBIASED estimate of full recall —
    candidate status is decided by the full-corpus banding pipeline,
    independent of the sampling hash — and the report carries
    sample_docs so the consumer sees the audited population. The
    candidate count (lsh_candidates, the cost side) stays FULL-corpus.
    The production dedup path remains q54 → q52 → q80; this query is
    the audit.

    All tier counts are exact bigints off ONE pass over the
    truth⟕candidates join (tiers explode inside the agg input);
    jaccard is the q52 rounding, so the tier compare is
    engine-deterministic; recall is one _trunc6 quotient per tier."""
    # candidate-list-sized; checkpointed because BOTH the truth join
    # and the n_cand count read it — un-materialized, the full
    # signature+banding pipeline would run twice in one plan
    cand = (
        q54_minhash_candidates(spark, sf_dir)
        .select("doc_a", "doc_b")
        .withColumn("is_cand", F.lit(True))
        .localCheckpoint(eager=True)
    )
    docs = table(spark, sf_dir, "documents")
    n_docs = docs.count()
    frac_ppm = min(1_000_000, (sample_max_docs * 1_000_000) // max(n_docs, 1))
    sampled = docs.filter(
        F.expr(_SPARK_H60.format(expr="cast(doc_id as string)")) % 1_000_000
        < F.lit(frac_ppm)
    )
    n_sample = sampled.groupBy().agg(F.count(F.lit(1)).alias("sample_docs"))
    # pinned: sizes, the a-side and the b-side all read this frame —
    # un-materialized, the sample scan + shingle explode + hash would
    # run three times in one plan (the cand-frame argument above)
    sh = (
        _with_shingles(sampled)
        .select("doc_id", F.xxhash64("shingle").alias("sh_h"))
        .localCheckpoint(eager=True)
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "sh_h")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "sh_h")
    inter = (
        sa.join(sb, "sh_h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    truth = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6),
        )
        .join(cand, ["doc_a", "doc_b"], "left")
        .withColumn("is_cand", F.coalesce(F.col("is_cand"), F.lit(False)))
    )
    n_cand = cand.groupBy().agg(F.count(F.lit(1)).alias("lsh_candidates"))
    tiers = F.explode(
        F.array(*[F.lit(t) for t in DEDUP_RECALL_TIERS])
    ).alias("threshold")
    per_tier = (
        truth.select("jaccard", "is_cand", tiers)
        .filter(F.col("jaccard") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(
            F.count(F.lit(1)).alias("true_pairs"),
            F.sum(F.col("is_cand").cast("bigint")).alias("recalled"),
        )
    )
    return (
        per_tier.join(F.broadcast(n_cand)).join(F.broadcast(n_sample))
        .select(
            "threshold",
            "true_pairs",
            "recalled",
            (F.col("true_pairs") - F.col("recalled")).alias("missed"),
            _trunc6(F.col("recalled") / F.col("true_pairs")).alias("recall"),
            "lsh_candidates",
            "sample_docs",
        )
        .orderBy("threshold")
    )


QUERIES["dedup_recall_report"] = dedup_recall_report

ORACLE["dedup_recall_report"] = f"""
    WITH per_doc AS ({_DUCK_PER_DOC_SIG}),
    bands AS (
        SELECT doc_id, unnest([{_DUCK_BANDS}]) AS band_key FROM per_doc),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
    -- content-addressed truth-leg sample, mirroring the Spark side:
    -- frac_ppm = MAX*1e6 // n_docs (integer division in both engines)
    samp AS (
        SELECT least(1000000::bigint,
                     ({DEDUP_RECALL_SAMPLE_MAX_DOCS} * 1000000)::bigint
                       // (SELECT count(*) FROM documents)) AS frac_ppm),
    sdocs AS (
        SELECT d.* FROM documents d, samp
        WHERE {_DUCK_H60.format(expr="cast(doc_id as varchar)")} % 1000000
              < samp.frac_ppm),
    n_sample AS (SELECT count(*)::bigint AS sample_docs FROM sdocs),
    sh AS (
        SELECT doc_id, {_DUCK_H60.format(expr="shingle")} AS sh_h
        FROM ({_DUCK_SHINGLES_SQL.replace("FROM documents", "FROM sdocs")}) raw),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
        FROM sh a JOIN sh b ON a.sh_h = b.sh_h AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    truth AS (
        SELECT i.doc_a, i.doc_b,
               round(i.n_inter::double
                     / (sa.n_sh + sb.n_sh - i.n_inter), 6) AS jaccard,
               c.doc_a IS NOT NULL AS is_cand
        FROM inter i
        JOIN sizes sa ON sa.doc_id = i.doc_a
        JOIN sizes sb ON sb.doc_id = i.doc_b
        LEFT JOIN cand c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b),
    n_cand AS (SELECT count(*)::bigint AS lsh_candidates FROM cand),
    per_tier AS (
        SELECT t.threshold,
               count(*)::bigint AS true_pairs,
               sum(is_cand::int)::bigint AS recalled
        FROM truth, (SELECT unnest([{", ".join(map(str, DEDUP_RECALL_TIERS))}]) AS threshold) t
        WHERE truth.jaccard >= t.threshold
        GROUP BY t.threshold)
    SELECT threshold, true_pairs, recalled,
           (true_pairs - recalled)::bigint AS missed,
           floor((recalled::double / true_pairs) * 1e6) / 1e6 AS recall,
           lsh_candidates, sample_docs
    FROM per_tier, n_cand, n_sample
    ORDER BY threshold
"""


# ---------------------------------------------------------------------------
# Round-5 post-freeze additions (lead the r6 driver window; see the
# __spark_entry__ docstring).  Three corpus-curation operators every
# production pre-training pipeline runs that the surface lacked:
# per-source quota capping, BM25 retrieval, and weighted sampling
# without replacement.
# ---------------------------------------------------------------------------

SOURCE_CAP = 10        # max docs kept per source (binds at sf0.01: 25/source)
SOURCE_CAP_SALTS = 8   # phase-1 shard count for the two-phase grouped top-K


def q115_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping (the RefinedWeb/C4 anti-spam rule):
    keep at most SOURCE_CAP docs per source, preferring the highest
    q57 composite quality, deterministic tie-break on doc_id.  A
    per-domain cap is the standard defense against a single crawl
    domain flooding the training mix.

    Scale shape (100 TB): a single row_number window keyed on source
    is the textbook plan but a skewed source (one domain = billions of
    rows) funnels into ONE task.  This implements the two-phase
    grouped top-K instead: phase 1 ranks within (source, salt) shards
    — xxhash64(doc_id) mod SOURCE_CAP_SALTS, so every shard's window
    is 1/SALTS of the hot source — and keeps each shard's top
    SOURCE_CAP; phase 2 re-ranks the ≤ CAP·SALTS survivors per source.
    Semantics-preserving by construction (the global top-K of a group
    is contained in the union of its per-shard top-Ks), so the oracle
    is the plain one-window SQL.  Quality is _trunc6'd (engine-stable)
    and the (quality DESC, doc_id) order is total, so ranks are
    deterministic."""
    from .skew import grouped_topk

    d = table(spark, sf_dir, "documents")
    base = d.select("doc_id", "source", _quality_col().alias("quality"))
    return (
        grouped_topk(
            base,
            ["source"],
            [F.col("quality").desc(), F.col("doc_id")],
            F.xxhash64(F.col("doc_id")),
            SOURCE_CAP,
            SOURCE_CAP_SALTS,
        )
        .select("source", F.col("grp_rank").alias("src_rank"), "doc_id", "quality")
        .orderBy("source", "src_rank")
    )


QUERIES["q115_source_quota_cap"] = q115_source_quota_cap

ORACLE["q115_source_quota_cap"] = f"""
    WITH q AS ({_DUCK_QUALITY}),
    ranked AS (
        SELECT d.source, d.doc_id, q.quality,
               row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY q.quality DESC, d.doc_id)::int AS src_rank
        FROM documents d JOIN q USING (doc_id))
    SELECT source, src_rank, doc_id, quality
    FROM ranked WHERE src_rank <= {SOURCE_CAP}
    ORDER BY source, src_rank
"""


BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 10
# fixed retrieval workload: (query_id, [terms]); terms are corpus-vocab
# words so df > 0 — one query mixes the rare token 'dup' (df ≈ 5% of
# docs) with a common one to exercise the idf spread
BM25_QUERY_TERMS = {
    "hash-join": ["hash", "join"],
    "table-scan": ["table", "scan"],
    "rare-dup": ["dup", "merge"],
}


def _retrieval_frames(spark: SparkSession, sf_dir: str):
    """The shared candidate machinery of the retrieval operators
    (q116 BM25, q124 hybrid RRF): the fixed query workload as a tiny
    DataFrame, the corpus totals (1 row), and the matched (term,
    doc_id, tf, dl) frame — built exactly as q116 always built them
    (factored, not copied, when q124 joined; q116's plan and hash are
    unchanged). The broadcast term filter runs BEFORE any shuffle, so
    shuffle volume is O(matching tokens) regardless of corpus size."""
    d = table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), " +")
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts in sorted(BM25_QUERY_TERMS.items()) for t in ts],
        "query_id string, term string",
    )
    terms = qterms.select("term").distinct()
    tot = d.select(F.size(toks).cast("bigint").alias("dl")).groupBy().agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("total_toks")
    )
    tfd = (
        d.select(
            "doc_id",
            F.size(toks).cast("bigint").alias("dl"),
            F.explode(toks).alias("term"),
        )
        .join(F.broadcast(terms), "term")
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    return qterms, tot, tfd


def q116_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (Okapi k1=1.2, b=0.75) for a fixed query
    workload over the corpus — the retrieval leg a training-data
    pipeline uses for decontamination-by-search and hard-negative
    mining (q69's TF-IDF is featurization; this is scoring + ranking).

    Scale shape: TWO corpus scans, no corpus-sized join or shuffle.
    Scan 1 explodes tokens WITH the doc length attached to every
    token row (size() of the same split — free in the same projection),
    filters by a broadcast join against the (tiny) query-term list
    BEFORE any shuffle, and aggregates tf + first(dl) per (term, doc)
    — so shuffle volume is O(matching tokens) and no separate
    corpus-wide doc-length join is ever needed.  Scan 2 is the narrow
    corpus-total aggregate (n_docs, total tokens → 1 broadcast row).
    Per-term df and the query fan-out ride as broadcast frames into
    the scoring join; final per-query ranking windows over candidate
    docs only.

    Float determinism: each term's BM25 contribution is truncated to
    a 1e-6 grid (floor(x·1e6) bigint) BEFORE the per-(query, doc) sum,
    so the sum is exact integer arithmetic — summation order cannot
    flip the driver's bit-exact hash (ln of exact-count quotients is
    the q57c/q109-proven portable op).  Ranks are total-ordered by
    (score DESC, doc_id)."""
    qterms, tot, tfd = _retrieval_frames(spark, sf_dir)
    # df as a count window over the (term, doc) frame rather than a
    # separate aggregate: tfd feeding BOTH a groupBy and the scoring
    # join would plan the explode scan twice (Catalyst does not dedupe
    # shared subplans); the window costs one candidate-sized shuffle
    # on term and keeps the corpus at exactly two scans
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1
        * (
            1.0
            - BM25_B
            + BM25_B
            * (F.col("dl").cast("double") * F.col("n_docs") / F.col("total_toks"))
        )
    )
    contrib = (
        tfd.withColumn("df", dfreq)
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(tot))
        .select(
            "query_id",
            "doc_id",
            F.floor(idf * norm * F.lit(1e6)).alias("c"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("c").alias("score_1e6")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_1e6").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select(
            "query_id",
            "rank",
            "doc_id",
            (F.col("score_1e6") / F.lit(1e6)).alias("score"),
        )
        .orderBy("query_id", "rank")
    )


QUERIES["q116_bm25_topk"] = q116_bm25_topk

_DUCK_BM25_QTERMS = ", ".join(
    f"('{qid}', '{t}')" for qid, ts in sorted(BM25_QUERY_TERMS.items()) for t in ts
)

ORACLE["q116_bm25_topk"] = f"""
    WITH qterms(query_id, term) AS (VALUES {_DUCK_BM25_QTERMS}),
    toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), ' +')) AS term
        FROM documents),
    dl AS (
        SELECT doc_id,
               len(string_split_regex(trim(lower(text)), ' +'))::bigint AS dl
        FROM documents),
    tot AS (SELECT count(*)::bigint AS n_docs, sum(dl)::bigint AS total_toks FROM dl),
    tfd AS (
        SELECT t.term, t.doc_id, count(*)::bigint AS tf
        FROM toks t JOIN (SELECT DISTINCT term FROM qterms) q USING (term)
        GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*)::bigint AS df FROM tfd GROUP BY term),
    contrib AS (
        SELECT q.query_id, t.doc_id,
               -- association mirrors Spark exactly: idf * (num / den);
               -- the left-assoc (ln * num) / den form can differ in the
               -- last ulp and flip floor(x*1e6) on a grid-boundary value
               floor(
                   ln((tot.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                   * ((t.tf * ({BM25_K1} + 1.0))
                      / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                          + {BM25_B} * (d.dl::double * tot.n_docs / tot.total_toks))))
                   * 1e6)::bigint AS c
        FROM tfd t
        JOIN qterms q USING (term)
        JOIN dfreq f USING (term)
        JOIN dl d USING (doc_id)
        CROSS JOIN tot),
    scored AS (
        SELECT query_id, doc_id, sum(c)::bigint AS score_1e6
        FROM contrib GROUP BY 1, 2),
    ranked AS (
        SELECT query_id, doc_id, score_1e6,
               row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY score_1e6 DESC, doc_id)::int AS rank
        FROM scored)
    SELECT query_id, rank, doc_id, score_1e6 / 1e6 AS score
    FROM ranked WHERE rank <= {BM25_TOPK}
    ORDER BY query_id, rank
"""


WEIGHTED_SAMPLE_N = 100


def q117_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling WITHOUT replacement (Efraimidis–
    Spirakis A-ES): each doc gets key = ln(u)/w with weight w = q57
    quality and u a deterministic md5-derived uniform in (0, 1]; the
    global top-N keys are exactly an N-sample drawn without
    replacement with probability proportional to weight — the standard
    way to cut a quality-weighted subcorpus in one distributed pass
    (q104's temperature mixing reweights LANGUAGES; this reweights
    individual documents).

    Scale shape: one narrow projection (no shuffle) computes the key;
    the global top-N is orderBy+limit, which Spark executes as
    TakeOrdered — per-partition top-N then a driver merge of
    N·n_partitions candidate rows, never a global sort.  Adding data
    never changes surviving keys (u is content-addressed), so the
    sample is reproducible and incrementally extendable.

    Determinism: u = (md5-mod-1e6 + 1)/1000001 is the q99
    engine-portable pattern; the ORDER key is floor(ln(u)/w · 1e6) —
    an exact bigint in both engines — so selection and ranks cannot
    drift on a final-ulp float (ln-of-exact-quotient is the
    q57c-proven portable op; w > 0 always since the quality score's
    length term is ≥ 0.004)."""
    d = table(spark, sf_dir, "documents")
    u = (
        F.expr(
            "cast(conv(substr(md5(concat('wsample:', doc_id)), 1, 15), 16, 10) as bigint)"
        )
        % 1000000
        + 1
    ) / 1000001.0
    base = d.select("doc_id", "source", _quality_col().alias("quality")).withColumn(
        "key_1e6", F.floor(F.log(u) / F.col("quality") * F.lit(1e6))
    )
    top = base.orderBy(F.col("key_1e6").desc(), F.col("doc_id")).limit(
        WEIGHTED_SAMPLE_N
    )
    # the unpartitioned rank window runs AFTER the limit, on exactly
    # WEIGHTED_SAMPLE_N rows — the single-partition WindowExec warning
    # it triggers is bounded by N, not by the corpus
    w = Window.orderBy(F.col("key_1e6").desc(), F.col("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "doc_id", "source", "quality", "key_1e6")
        .orderBy("rank")
    )


QUERIES["q117_weighted_sample"] = q117_weighted_sample

ORACLE["q117_weighted_sample"] = f"""
    WITH q AS ({_DUCK_QUALITY}),
    keyed AS (
        SELECT d.doc_id, d.source, q.quality,
               floor(
                   ln((('0x' || substr(md5('wsample:' || d.doc_id), 1, 15))::bigint
                        % 1000000 + 1) / 1000001.0)
                   / q.quality * 1e6)::bigint AS key_1e6
        FROM documents d JOIN q USING (doc_id)),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY key_1e6 DESC, doc_id)::int AS rank
        FROM keyed)
    SELECT rank, doc_id, source, quality, key_1e6
    FROM ranked WHERE rank <= {WEIGHTED_SAMPLE_N}
    ORDER BY rank
"""


# ---------------------------------------------------------------------------
# Round-6 post-freeze additions (lead the r7 driver window; see the
# __spark_entry__ docstring).  Two corpus-ops the surface lacked: near-dup
# ingest dedup against a standing SIGNATURE store (q102 is the exact-hash
# twin), and the context-length budget report a trainer runs before a run.
# ---------------------------------------------------------------------------

# minimum matching signature positions (of N_MINHASH) for an LSH
# candidate to count as a near-dup: 4/8 = est. Jaccard 0.5 — an exact
# INTEGER threshold, so the verdict cannot drift on a float boundary
NEARDUP_MATCH_MIN = 4

# within-batch blow-up bound (r6 verdict watch item): a pathological
# batch (thousands of near-identical docs, e.g. un-scrubbed
# boilerplate) puts them all in one band key, making the within-batch
# self-join quadratic in that band. Each batch doc therefore compares
# only against the NEARDUP_BAND_CAP EARLIEST batch docs per band —
# pair count per band drops from O(B²) to O(B·cap). Keep-first
# semantics make the earliest docs exactly the candidates that matter:
# a doc's reported match is min(match_id), which lives among the
# band's earliest members whenever the cap doesn't bind. The cap is a
# documented recall bound when it DOES bind (a doc whose only
# signature-agreeing partners all rank past the cap reports 'new');
# at fixture scale no band comes near it (asserted in tests), so the
# oracle — whose md5 band keys group differently — needs no mirror.
NEARDUP_BAND_CAP = 64


def _batch_band_candidates(batch: DataFrame, cap: int = NEARDUP_BAND_CAP) -> DataFrame:
    """Within-batch near-dup candidate pairs ``(doc_id, match_id, sa,
    sb)`` for q118: batch docs paired inside each band key against the
    ``cap`` earliest docs of that band (see NEARDUP_BAND_CAP).

    Plan shape (snapshot-pinned): the rank filter compiles to Spark's
    WindowGroupLimit with a PARTIAL pass before the exchange, so the
    one band_key shuffle the window adds moves at most ``cap`` rows
    per band per input partition — the capped b-side is then small
    enough to BROADCAST into the self-join at fixture SF, and at scale
    the SMJ reuses the window's band_key partitioning."""
    wb = Window.partitionBy("band_key").orderBy("doc_id")
    b_side = (
        batch.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )
    return (
        batch.alias("a")
        .join(
            b_side.alias("b"),
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("match_id"),
            F.col("a.sig").alias("sa"),
            F.col("b.sig").alias("sb"),
        )
    )


def _banded_signatures(d: DataFrame) -> DataFrame:
    """(doc_id, sig, band_key) — q54's per-doc signature + banding,
    factored out so the incremental probe (q118) and the batch
    candidate join (q54) share one definition of the band key.
    Signatures via _per_doc_sig_frame (one agg, bit-identical)."""
    per_doc = _per_doc_sig_frame(d)
    rows_per_band = N_MINHASH // N_BANDS
    return per_doc.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(*[
                F.xxhash64(
                    F.lit(b),
                    *[F.expr(f"sig[{b * rows_per_band + r}]") for r in range(rows_per_band)],
                )
                for b in range(N_BANDS)
            ])
        ).alias("band_key"),
    )


def build_band_index(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "neardup_band_index",
    n_buckets: int = 32,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Persist the banded-signature store ONCE — the shared index every
    near-dup consumer probes instead of rebuilding it per query (r8
    verdict item 6).

    Rows are exactly ``_banded_signatures(documents)`` — (doc_id, sig,
    band_key), one row per (doc, band) — written bucketed AND sorted on
    ``band_key`` (io.write_bucketed), so a consumer's band-key probe
    join reads the store co-located: the ONLY exchange in the probe
    plan is the (small) probe side's, and the scan shows
    SelectedBucketsCount (plan-pinned in tests/test_plans.py).

    At 100 TB this is the nightly-pipeline shape: signatures are
    computed for the standing corpus exactly once (the expensive
    shingle→minhash pass over all text), and every downstream consumer
    — the daily ingest probe (q118 ``index_table=``), its streaming
    twin (run_neardup_stream_demo ``index_table=``), global
    compactions — probes the same bucketed parquet without touching
    corpus text again. Consumers are byte-identical to their in-plan
    derivations because ``_banded_signatures`` is deterministic
    (integer minhashes, exact parquet round-trip)."""
    from .io import write_bucketed

    bands = _banded_signatures(
        docs if docs is not None else table(spark, sf_dir, "documents")
    )
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    write_bucketed(bands, table_name, "band_key", n_buckets)
    return spark.table(table_name)


def append_band_index(spark: SparkSession, table_name: str, docs: DataFrame) -> DataFrame:
    """Nightly index MAINTENANCE: append the newly ingested docs' band
    rows to the persisted ``build_band_index`` store. ``insertInto``
    honors the table's bucketing spec (each append writes
    bucket-tagged files into the same 2^k bucket space), so consumers'
    co-located probes — SelectedBucketsCount and all — keep working
    across appends; equality with a from-scratch rebuild is tested.

    Append-only BY DESIGN: plain bucketed parquet has no row-level
    delete, so changed/removed docs are the lakehouse-format boundary
    (Delta/Iceberg MERGE at a real deployment) or the periodic full
    rebuild — the same honesty boundary q107/q112 document for
    snapshot storage. The nightly common case (new docs: q135's
    'added' class after its dedup gates) is exactly this append."""
    _banded_signatures(docs).write.insertInto(table_name)
    return spark.table(table_name)


def q118_incremental_neardup(
    spark: SparkSession,
    sf_dir: str,
    index_table: str | None = None,
    bands: DataFrame | None = None,
) -> DataFrame:
    """Incremental NEAR-dup ingest dedup — q102's continuous-crawl
    shape at MinHash granularity: the newly ingested batch
    (doc_id % INCR_BATCH_MOD == 0, q102's split) is checked against
    the STANDING corpus's banded-signature store and against itself,
    labeling every batch doc ``near_dup_of_history`` /
    ``near_dup_in_batch`` (keep-first: it matches an earlier batch
    doc) / ``new``, with the smallest matching doc id as evidence.
    This is the op a daily ingest actually needs — "is this document
    a near-duplicate of ANYTHING we already have?" — without
    rescanning or re-pairing the standing corpus (q54/q80 is the
    periodic global compaction).

    A candidate counts as a near-dup when ≥ NEARDUP_MATCH_MIN of the
    N_MINHASH signature positions agree (4/8 ≈ Jaccard 0.5) — an
    integer threshold on exact int64 minhashes, engine-portable by
    construction.  Pairwise only, by design: transitive closure is
    q80's global job, not the ingest probe's.

    Scale shape (100 TB standing corpus, TB-scale daily batch):
    signatures are computed for BATCH docs only at real scale — the
    history side is the persisted (band_key, doc_id, sig) store this
    fixture derives in-plan from the history split; bucketed on
    band_key it makes the probe a co-located equi-join with no
    history-side shuffle.  Work is O(batch × bands + collisions):
    nothing touches history rows outside the probed band keys, and
    the within-batch self-join is batch-sized AND hot-band-bounded
    (r7: ≤ NEARDUP_BAND_CAP comparisons per doc per band, see
    _batch_band_candidates) — the standing corpus is never re-paired
    and a boilerplate-heavy batch cannot go quadratic inside one
    band.  Band keys are q54's xxhash64 (need not be
    oracle-portable: the oracle's md5 band keys induce the same doc
    groupings; a cross-band collision could only ADD a candidate,
    which the signature-agreement verify filters).

    ``index_table=`` (opt-in) probes a persisted ``build_band_index``
    store instead of deriving the band rows in-plan: the history side
    reads the bucketed table co-located (zero history-side exchange,
    SelectedBucketsCount in the scan — plan-pinned), and the corpus
    text is never re-shingled. Output byte-identical to the default
    path (the index rows ARE ``_banded_signatures``). ``bands=`` lets
    a caller that already materialized exactly that frame (the
    stream-equivalence harness pins it for its stream leg) pass it in
    — same rows, so output is unchanged; the default path keeps
    deriving in-plan."""
    d = table(spark, sf_dir, "documents")
    if bands is None:
        bands = spark.table(index_table) if index_table else _banded_signatures(d)
    batch = bands.filter(F.col("doc_id") % INCR_BATCH_MOD == 0)
    hist = bands.filter(F.col("doc_id") % INCR_BATCH_MOD != 0)
    n_match = F.expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), t -> t))")

    def _best_match(cands: DataFrame, out: str) -> DataFrame:
        return (
            cands.distinct()
            .withColumn("m", n_match)
            .filter(F.col("m") >= NEARDUP_MATCH_MIN)
            .groupBy("doc_id")
            .agg(F.min("match_id").alias(out))
        )

    hmatch = _best_match(
        batch.alias("n")
        .join(hist.alias("h"), "band_key")
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("h.doc_id").alias("match_id"),
            F.col("n.sig").alias("sa"),
            F.col("h.sig").alias("sb"),
        ),
        "hist_match",
    )
    bmatch = _best_match(_batch_band_candidates(batch), "batch_match")
    # base = ALL batch docs from the corpus, not the signature frame:
    # a sub-shingle doc (< 3 tokens) has no signature and is trivially
    # 'new' — it must still get a status row
    base = d.filter(F.col("doc_id") % INCR_BATCH_MOD == 0).select("doc_id")
    return _neardup_assemble(base, hmatch, bmatch)


def _neardup_assemble(
    base: DataFrame, hmatch: DataFrame, bmatch: DataFrame
) -> DataFrame:
    """The shared status-labeling tail of the incremental near-dup
    ingest: history match wins over within-batch match, smallest
    matching doc id as evidence, every batch doc gets a row. Factored
    so the batch probe (q118) and its streaming twin
    (engine/streaming.py run_neardup_stream_demo) provably share one
    definition of the verdict."""
    return (
        base.join(hmatch, "doc_id", "left")
        .join(bmatch, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("hist_match").isNotNull(), F.lit("near_dup_of_history"))
            .when(F.col("batch_match").isNotNull(), F.lit("near_dup_in_batch"))
            .otherwise(F.lit("new"))
            .alias("status"),
            F.coalesce("hist_match", "batch_match").alias("match_id"),
        )
        .orderBy("doc_id")
    )


QUERIES["q118_incremental_neardup"] = q118_incremental_neardup

ORACLE["q118_incremental_neardup"] = f"""
    WITH per_doc AS ({_DUCK_PER_DOC_SIG}),
    bands AS (
        SELECT doc_id, sig, unnest([{_DUCK_BANDS}]) AS band_key FROM per_doc),
    nb AS (SELECT * FROM bands WHERE doc_id % {INCR_BATCH_MOD} = 0),
    hb AS (SELECT * FROM bands WHERE doc_id % {INCR_BATCH_MOD} <> 0),
    hcand AS (
        SELECT DISTINCT n.doc_id, h.doc_id AS match_id, n.sig AS sa, h.sig AS sb
        FROM nb n JOIN hb h USING (band_key)),
    hmatch AS (
        SELECT doc_id, min(match_id) AS hist_match FROM hcand
        WHERE len(list_filter(list_zip(sa, sb), t -> t[1] = t[2]))
              >= {NEARDUP_MATCH_MIN}
        GROUP BY doc_id),
    bcand AS (
        SELECT DISTINCT a.doc_id, b.doc_id AS match_id, a.sig AS sa, b.sig AS sb
        FROM nb a JOIN nb b
          ON a.band_key = b.band_key AND a.doc_id > b.doc_id),
    bmatch AS (
        SELECT doc_id, min(match_id) AS batch_match FROM bcand
        WHERE len(list_filter(list_zip(sa, sb), t -> t[1] = t[2]))
              >= {NEARDUP_MATCH_MIN}
        GROUP BY doc_id),
    base AS (SELECT doc_id FROM documents WHERE doc_id % {INCR_BATCH_MOD} = 0)
    SELECT base.doc_id,
           CASE WHEN hist_match IS NOT NULL THEN 'near_dup_of_history'
                WHEN batch_match IS NOT NULL THEN 'near_dup_in_batch'
                ELSE 'new' END AS status,
           coalesce(hist_match, batch_match) AS match_id
    FROM base
    LEFT JOIN hmatch USING (doc_id)
    LEFT JOIN bmatch USING (doc_id)
    ORDER BY base.doc_id
"""


# context windows the budget report prices (tokens; fixture docs span
# tens-to-hundreds of tokens so all three fit/split regimes occur)
CONTEXT_LENGTHS = [32, 128, 512]


def q119_context_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length budget report — the planning query a trainer
    runs BEFORE a run: for each candidate context window, how many
    docs fit whole, how many must split, how many training windows
    the q49 concat-and-chop layout yields per document, and the
    window utilization (token occupancy of the window grid if each
    doc's windows are padded to the boundary — the waste the q49
    packer exists to reclaim; utilization_ppm == 1e6 would mean
    zero padding).  All counts are exact bigints; utilization is
    integer-division ppm (total_tokens·1e6 div windows·L), so the
    row is bit-portable by construction.

    Scale shape: ONE corpus scan — the per-doc token count is
    projected once and the |CONTEXT_LENGTHS|-way explode happens on
    the (n, L) pairs, never the text; the aggregate is a 3-group
    hash agg with map-side combine, output 3 rows.  The whitespace
    tokenization is q49/q67's (the '' doc counts 1 token, the
    established engine-wide convention)."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), " +")).cast("bigint")
    per_l = d.select(
        n_tokens.alias("n"),
        F.explode(F.array(*[F.lit(L) for L in CONTEXT_LENGTHS])).alias("context_len"),
    )
    return (
        per_l.groupBy("context_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n") <= F.col("context_len")).cast("bigint")).alias("docs_fit"),
            F.sum((F.col("n") > F.col("context_len")).cast("bigint")).alias("docs_split"),
            F.sum(F.expr("(n + context_len - 1) div context_len")).alias("windows"),
            F.sum("n").alias("total_tokens"),
        )
        .select(
            "context_len",
            "n_docs",
            "docs_fit",
            "docs_split",
            "windows",
            "total_tokens",
            F.expr("(total_tokens * 1000000) div (windows * context_len)").alias(
                "utilization_ppm"
            ),
        )
        .orderBy("context_len")
    )


QUERIES["q119_context_budget_report"] = q119_context_budget_report

_DUCK_CTX_LENGTHS = ", ".join(str(L) for L in CONTEXT_LENGTHS)

ORACLE["q119_context_budget_report"] = f"""
    WITH toks AS (
        SELECT len(string_split_regex(trim(text), ' +'))::bigint AS n
        FROM documents),
    per_l AS (
        SELECT n, unnest([{_DUCK_CTX_LENGTHS}])::bigint AS context_len FROM toks),
    agg AS (
        SELECT context_len,
               count(*)::bigint AS n_docs,
               sum((n <= context_len)::int)::bigint AS docs_fit,
               sum((n > context_len)::int)::bigint AS docs_split,
               sum((n + context_len - 1) // context_len)::bigint AS windows,
               sum(n)::bigint AS total_tokens
        FROM per_l GROUP BY context_len)
    SELECT context_len, n_docs, docs_fit, docs_split, windows, total_tokens,
           ((total_tokens * 1000000) // (windows * context_len))::bigint
             AS utilization_ppm
    FROM agg ORDER BY context_len
"""


# ---------------------------------------------------------------------------
# Round-7 post-freeze additions (lead the r8 driver window; see the
# __spark_entry__ docstring).  Two curation ops the surface lacked:
# token-budget-constrained corpus selection (the "cut the best B tokens"
# step every pretraining run does after scoring), and a source-diversity
# report (the concentration signal mixing decisions are made against).
# ---------------------------------------------------------------------------

# token budget as a share of the corpus, in ppm (400000 = keep the
# best 40% of tokens) — integer so budget arithmetic is exact bigints
BUDGET_PPM = 400_000


def _quality_1e6_col():
    """q57's composite quality on the exact 1e-6 bigint grid —
    floor(raw·1e6) directly, NOT floor(trunc6(raw)·1e6): trunc6 already
    divides by 1e6, and re-multiplying a rounded double by 1e6 can land
    a hair under the integer and floor one grid cell low in one engine
    (the -0.0/rounding class the r7 fuzzers exist to catch). The raw
    expression is IEEE-identical across engines (q57 hash-green), so
    its floor is too."""
    toks = F.split(F.trim(F.col("text")), " +")
    n_tokens = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    mean_tok_len = (F.length(F.regexp_replace(F.trim(F.col("text")), " +", "")) / n_tokens)
    raw = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (n_distinct / n_tokens)
        + 0.3 * F.least(mean_tok_len / F.lit(10.0), F.lit(1.0))
    )
    return F.floor(raw * F.lit(1e6)).cast("bigint")


def q120_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-constrained corpus selection: keep the best-quality
    documents (q57 score, ties by doc_id) until BUDGET_PPM of the
    corpus's tokens is exhausted — the selection step that actually
    cuts a pretraining corpus after scoring (quality-ranked greedy fill
    is the standard shape; DSIR q111 ranks by target-likeness, this op
    ranks by quality and respects a TOKEN budget, not a doc count).
    A doc is kept iff its inclusive running token total fits the
    budget; the crossing doc is dropped (never split).

    Output: (sel_rank, doc_id, quality_1e6, n_tokens, cum_tokens) for
    the selected docs, sel_rank the global quality rank — exact
    bigints end to end (budget = sum·BUDGET_PPM div 1e6).

    Scale shape — the naive plan is a GLOBAL sort + single-partition
    running sum over the corpus (the 100 TB killer). This plan never
    globally sorts the data: quality lives on the 1e-6 bigint grid, so
    (1) a census by quality level (≤ ~1.1e6 rows whatever N is) gets
    per-level token/doc totals in one map-side-combining agg;
    (2) level prefix sums run in a window over the CENSUS — the one
    single-partition window is grid-bounded, never corpus-bounded;
    (3) levels whose prefix already exceeds the budget are pruned
    (broadcast), and each surviving doc's global cum/rank is its
    level's prefix + a running sum WITHIN its level — a window
    partitioned by quality_1e6, fully distributed. Selection at the
    boundary level falls out of the same filter.

    The plan reads the text column twice (census leg + join leg; the
    budget total derives from the CENSUS window pass, not a third
    scan — counters pinned in PLANS.json). At 100 TB the narrow
    (doc_id, n_tokens, quality_1e6) projection would be checkpointed
    first (io.checkpoint) so the text bytes are read exactly once;
    in-plan, that materialization isn't worth it at fixture sizes.

    Residual skew, stated honestly: the within-level window puts one
    quality LEVEL on one task, so a corpus where millions of docs
    share one exact 1e-6-grid score degrades that level to a single
    reducer. The score is three continuous ratio terms, so mass
    collisions mean structurally identical documents — a duplicate
    farm that the dedup stages (q50/q54/q102) remove before selection
    in any real pipeline; measured here: 5000 docs spread over 3106
    levels, largest 15. If an undeduped run ever needed it, the same
    prefix decomposition recurses — census by (level, contiguous
    doc_id range), range prefix per level, running sum within range —
    bounding every task at the range width."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " +")).cast("bigint").alias("n_tokens"),
        _quality_1e6_col().alias("quality_1e6"),
    )
    census = base.groupBy("quality_1e6").agg(
        F.sum("n_tokens").alias("lvl_tokens"), F.count(F.lit(1)).alias("lvl_docs")
    )
    # prefix over STRICTLY higher quality levels AND the corpus total
    # (for the budget) from the SAME grid-bounded census window pass —
    # deriving the total here instead of a separate base.agg() saves a
    # whole corpus scan (the text column is the expensive read)
    w_lvl = Window.orderBy(F.col("quality_1e6").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.orderBy(F.col("quality_1e6").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    levels = (
        census.select(
            "quality_1e6",
            F.coalesce(F.sum("lvl_tokens").over(w_lvl), F.lit(0)).alias("tok_prefix"),
            F.coalesce(F.sum("lvl_docs").over(w_lvl), F.lit(0)).alias("doc_prefix"),
            F.sum("lvl_tokens").over(w_all).alias("total_tokens"),
        )
        .withColumn("budget", F.expr(f"total_tokens * {BUDGET_PPM} div 1000000"))
        .drop("total_tokens")
        .filter(F.col("tok_prefix") < F.col("budget"))
    )
    w_doc = Window.partitionBy("quality_1e6").orderBy("doc_id")
    return (
        base.join(F.broadcast(levels), "quality_1e6")
        .withColumn("cum_tokens", F.col("tok_prefix") + F.sum("n_tokens").over(w_doc))
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .withColumn(
            "sel_rank", (F.col("doc_prefix") + F.row_number().over(w_doc)).cast("int")
        )
        .select("sel_rank", "doc_id", "quality_1e6", "n_tokens", "cum_tokens")
        .orderBy("sel_rank")
    )


QUERIES["q120_budget_selection"] = q120_budget_selection

ORACLE["q120_budget_selection"] = f"""
    WITH t AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), ' +'))::bigint AS n_tokens,
               floor((0.4 * least(len(string_split_regex(trim(text), ' +')) / 100.0, 1.0)
                     + 0.3 * (len(list_distinct(string_split_regex(trim(text), ' +')))::double
                              / len(string_split_regex(trim(text), ' +')))
                     + 0.3 * least((length(regexp_replace(trim(text), ' +', '', 'g'))::double
                                    / len(string_split_regex(trim(text), ' +'))) / 10.0, 1.0))
                     * 1e6)::bigint AS quality_1e6
        FROM documents),
    b AS (SELECT (sum(n_tokens) * {BUDGET_PPM}) // 1000000 AS budget FROM t),
    r AS (SELECT *,
                 (sum(n_tokens) OVER (ORDER BY quality_1e6 DESC, doc_id))::bigint AS cum_tokens,
                 row_number() OVER (ORDER BY quality_1e6 DESC, doc_id) AS rn
          FROM t)
    SELECT rn::int AS sel_rank, doc_id, quality_1e6, n_tokens, cum_tokens
    FROM r, b WHERE cum_tokens <= budget ORDER BY sel_rank
"""


N_SHARDS = 8


def q136_curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum sharding — the data-ORDERING step between selection
    (q120) and packing (q49): assign every document to one of N_SHARDS
    training shards by round-robin over the quality order (q57 grid
    score desc, doc_id tiebreak), so each shard is a quality-
    stratified, near-equal slice of the corpus — every shard sees the
    same curriculum mix, shard token budgets stay balanced without a
    bin-packing pass, and the assignment is deterministic and
    engine-portable (pure integer arithmetic on the 1e-6 grid).
    Output: one row per shard — exact doc/token sums and the
    min/mean/max quality — the manifest a training launcher reads.

    Scale shape: the global quality rank NEVER runs as a global
    window (the q120 decomposition) — a grid-bounded census (≤ 1e6+1
    rows) takes the only ordered window, per-doc rank = broadcast
    doc_prefix + a row_number partitioned BY quality level, and the
    shard report is one hash agg on an int key. At 100 TB: one corpus
    scan, one census shuffle, one 8-row agg."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), " +")).cast("bigint").alias("n_tokens"),
        _quality_1e6_col().alias("quality_1e6"),
    )
    census = base.groupBy("quality_1e6").agg(F.count(F.lit(1)).alias("lvl_docs"))
    w_lvl = Window.orderBy(F.col("quality_1e6").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    levels = census.select(
        "quality_1e6",
        F.coalesce(F.sum("lvl_docs").over(w_lvl), F.lit(0)).alias("doc_prefix"),
    )
    w_doc = Window.partitionBy("quality_1e6").orderBy("doc_id")
    return (
        base.join(F.broadcast(levels), "quality_1e6")
        .withColumn("rnk", F.col("doc_prefix") + F.row_number().over(w_doc))
        .withColumn("shard_id", ((F.col("rnk") - 1) % N_SHARDS).cast("int"))
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("quality_1e6").alias("min_quality_1e6"),
            F.expr("sum(quality_1e6) div count(1)").alias("mean_quality_1e6"),
            F.max("quality_1e6").alias("max_quality_1e6"),
        )
        .orderBy("shard_id")
    )


QUERIES["q136_curriculum_shards"] = q136_curriculum_shards

ORACLE["q136_curriculum_shards"] = f"""
    WITH t AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), ' +'))::bigint AS n_tokens,
               floor((0.4 * least(len(string_split_regex(trim(text), ' +')) / 100.0, 1.0)
                     + 0.3 * (len(list_distinct(string_split_regex(trim(text), ' +')))::double
                              / len(string_split_regex(trim(text), ' +')))
                     + 0.3 * least((length(regexp_replace(trim(text), ' +', '', 'g'))::double
                                    / len(string_split_regex(trim(text), ' +'))) / 10.0, 1.0))
                     * 1e6)::bigint AS quality_1e6
        FROM documents),
    r AS (SELECT *, row_number() OVER (ORDER BY quality_1e6 DESC, doc_id) AS rn FROM t)
    SELECT ((rn - 1) % {N_SHARDS})::int AS shard_id,
           count(*)::bigint AS n_docs,
           sum(n_tokens)::bigint AS sum_tokens,
           min(quality_1e6) AS min_quality_1e6,
           (sum(quality_1e6) // count(*))::bigint AS mean_quality_1e6,
           max(quality_1e6) AS max_quality_1e6
    FROM r GROUP BY 1 ORDER BY 1
"""


def q121_source_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-diversity report per language: doc counts, distinct
    sources, Simpson concentration index and the EFFECTIVE number of
    sources (inverse Simpson, the ecology-standard diversity number) —
    the concentration signal corpus-mixing decisions (q79/q104) and
    per-source caps (q115) are made against: a language whose
    effective source count is ~1 is a single-crawler monoculture no
    matter how many nominal sources it lists.

    All integer-exact: with per-(lang, source) counts c_s and total n,
    simpson_ppm = (Σ c_s² · 1e6) div n² and eff_sources_1e3 =
    (n² · 1e3) div Σ c_s² are pure bigint arithmetic — bit-portable by
    construction, no float anywhere.

    Scale shape: two hash aggregations with map-side combine —
    (lang, source) then lang — shuffling O(distinct pairs), and a
    final sort on ≤ |langs| rows. One corpus scan of two columns."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_src.groupBy("lang")
        .agg(
            F.sum("c").alias("n_docs"),
            F.count(F.lit(1)).alias("n_sources"),
            F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
        )
        .select(
            "lang",
            "n_docs",
            "n_sources",
            F.expr("sum_sq * 1000000 div (n_docs * n_docs)").alias("simpson_ppm"),
            F.expr("n_docs * n_docs * 1000 div sum_sq").alias("eff_sources_1e3"),
        )
        .orderBy("lang")
    )


QUERIES["q121_source_diversity_report"] = q121_source_diversity_report

ORACLE["q121_source_diversity_report"] = """
    WITH per_src AS (
        SELECT lang, source, count(*)::bigint AS c
        FROM documents GROUP BY lang, source),
    per_lang AS (
        SELECT lang, sum(c)::bigint AS n_docs, count(*)::bigint AS n_sources,
               sum(c * c)::bigint AS sum_sq
        FROM per_src GROUP BY lang)
    SELECT lang, n_docs, n_sources,
           (sum_sq * 1000000) // (n_docs * n_docs) AS simpson_ppm,
           (n_docs * n_docs * 1000) // sum_sq AS eff_sources_1e3
    FROM per_lang ORDER BY lang
"""


# docs whose token-distribution entropy falls below this are flagged —
# e^2 ≈ 7.4 effective distinct tokens, the gibberish/keyword-stuffing
# floor (binds on the fixture: 1/500 at sf0.001, 20/5000 at sf0.1)
ENTROPY_MIN_1E6 = 2_000_000

# run-length fold over the SORTED token array: per-token counts and the
# Σ floor(c·ln(c)·1e6) entropy numerator WITHOUT exploding the corpus —
# equal tokens are adjacent after array_sort, so one JVM aggregate()
# pass counts runs (prev/run) while accumulating the finished runs'
# grid terms (acc) and the distinct count (nd); the finish lambda folds
# the final run in. ln(run) on an exact bigint run length is the
# engine-portable float op (the q57c/q109 class), and each run's term
# is floor-gridded BEFORE the bigint sum, so accumulation order can't
# flip a bit.
_ENTROPY_FOLD = """
aggregate(
  array_sort(split(trim(text), ' +')),
  struct(cast(null as string) as prev, cast(0 as bigint) as run,
         cast(0 as bigint) as acc, cast(0 as bigint) as nd),
  (s, x) -> CASE WHEN s.prev IS NOT NULL AND x = s.prev
            THEN struct(x as prev, s.run + 1L as run, s.acc as acc, s.nd as nd)
            ELSE struct(x as prev, 1L as run,
                        s.acc + CASE WHEN s.run > 0
                                THEN floor(s.run * ln(s.run) * 1e6) ELSE 0L END as acc,
                        s.nd + 1L as nd) END,
  s -> struct(s.acc + CASE WHEN s.run > 0
                      THEN floor(s.run * ln(s.run) * 1e6) ELSE 0L END as acc,
              s.nd as nd))
"""


def q122_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy with a
    low-entropy flag — the gibberish / keyword-stuffing / template-spam
    filter that complements q57's ratio heuristics and q57b's n-gram
    repetition caps: a page repeating one token ("buy buy buy …") has
    entropy → 0 however long it is, while q57's length term still
    rewards it. Standard corpus-quality rule (C4/Gopher-family
    pipelines gate on exactly this signal).

    Entropy on the exact 1e-6 grid: H = ln(n) − (Σ_t c_t·ln c_t)/n
    becomes entropy_1e6 = floor(ln(n)·1e6) − (Σ_t floor(c_t·ln(c_t)·1e6))
    div n — ln of exact bigint counts is the proven engine-portable
    float op (q57c/q109), every term is floor-gridded BEFORE the bigint
    sum, and the division is integer, so the value is bit-portable by
    construction (grid bias < 1e-6 nats, irrelevant to a 2.0-nat
    threshold). A single-token doc gets exactly 0.

    Scale shape: ZERO shuffles — the run-length fold over the sorted
    token array (``_ENTROPY_FOLD``) computes per-token counts, the
    entropy numerator, and the distinct count in ONE JVM
    aggregate() pass per row (scan → project, whole-stage codegen;
    plan-pinned). The explode→groupBy(doc,tok)→groupBy(doc) form
    shuffles the corpus token stream twice; per-row sort+fold is
    O(L log L) CPU with NO data movement — at 100 TB the difference
    is the whole job. Output is corpus-rows sized, ordered by doc_id
    for the fixture gate only."""
    d = table(spark, sf_dir, "documents")
    ent = F.floor(F.log(F.col("n_tokens")) * F.lit(1e6)) - F.expr("st.acc div n_tokens")
    return (
        d.select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), " +")).cast("bigint").alias("n_tokens"),
            F.expr(_ENTROPY_FOLD).alias("st"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("st.nd").alias("n_distinct"),
            ent.alias("entropy_1e6"),
        )
        .withColumn("low_entropy", F.col("entropy_1e6") < ENTROPY_MIN_1E6)
        .orderBy("doc_id")
    )


QUERIES["q122_token_entropy"] = q122_token_entropy

ORACLE["q122_token_entropy"] = f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS tok
        FROM documents),
    cnt AS (SELECT doc_id, tok, count(*)::bigint AS c FROM tok GROUP BY 1, 2),
    per AS (
        SELECT doc_id,
               sum(floor(c * ln(c) * 1e6)::bigint)::bigint AS acc,
               count(*)::bigint AS n_distinct,
               sum(c)::bigint AS n_tokens
        FROM cnt GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct,
           floor(ln(n_tokens) * 1e6)::bigint - acc // n_tokens AS entropy_1e6,
           (floor(ln(n_tokens) * 1e6)::bigint - acc // n_tokens)
               < {ENTROPY_MIN_1E6} AS low_entropy
    FROM per ORDER BY doc_id
"""


# ---------------------------------- hybrid retrieval fusion (RRF)

QL_MU = 2000.0   # Dirichlet smoothing mass (Zhai & Lafferty's default range)
RRF_K = 60       # the canonical RRF constant (Cormack et al. 2009)
RRF_POOL = 20    # per-leg candidate pool fused per query


def q124_hybrid_rrf(
    spark: SparkSession, sf_dir: str, checkpointed: bool = True
) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion: two independent
    rankers over the same fixed query workload — q116's Okapi BM25 and
    a Dirichlet-smoothed query-likelihood LM (Zhai & Lafferty 2001) —
    each contribute 1/(RRF_K + rank) per document; the fused top-k is
    what production retrieval stacks actually serve (fusion beats
    either leg alone because the legs' failure modes differ). The
    decontamination-by-search and hard-negative-mining pipelines run
    exactly this shape with the dense leg swapped in where embeddings
    exist for the corpus.

    QL scoring uses the matched-terms decomposition so absent terms
    never need rows: ln P(q|d) = Σ_matched ln(1 + tf/(μ·cf_t/C)) +
    |q|·ln(μ/(dl+μ)) — only matched (term, doc) pairs, per-doc length,
    and per-term collection frequencies appear.

    Exactness: every float leaves through a floor(·1e6) grid BEFORE
    any summation (the q116/q111 discipline) — leg scores are bigint
    sums of gridded terms, leg ranks are ints, and the RRF sum is pure
    integer arithmetic (1e9 div (K + rank)), so the fused ranking is
    bit-portable by construction.

    Scale shape: both legs reuse ``_retrieval_frames`` — the broadcast
    term filter bounds every shuffle at O(matching tokens); cf and df
    are count/sum windows over the candidate frame (no corpus
    re-scan); the fusion union/agg is O(queries × 2·RRF_POOL) rows.
    Four corpus scans total (Catalyst plans shared subtrees per use:
    the matched frame twice — once per leg — and the 1-column totals
    frame twice, PLANS.json scan_cols [2,1,2,1]); ``checkpointed=True``
    is the 100 TB path: ``io.materialize`` pins the matched frame
    (O(matching tokens)) and the 1-row totals once, both legs read the
    pins, and the corpus is scanned exactly TWICE — q116's inherent
    floor — with ZERO corpus FileScans left in the returned plan
    (tests/test_plans.py::test_checkpoint_collapses_scans pins shape
    and byte-identical output). r10: the pin IS the default (wall-
    neutral at sf0.1 — ×1.00 warm — while halving corpus scans); the
    pure-Catalyst plan stays watched via the lazy variant in
    tools/plan_snapshot.py."""
    qterms, tot, tfd = _retrieval_frames(spark, sf_dir)
    if checkpointed:
        from . import io as _io

        tot, tfd = _io.materialize(tot), _io.materialize(tfd)

    # --- BM25 leg: q116's scoring expression verbatim
    dfreq = F.count(F.lit(1)).over(Window.partitionBy("term"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = (F.col("tf") * (BM25_K1 + 1.0)) / (
        F.col("tf")
        + BM25_K1
        * (1.0 - BM25_B + BM25_B * (F.col("dl").cast("double") * F.col("n_docs") / F.col("total_toks")))
    )
    bm25 = (
        tfd.withColumn("df", dfreq)
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(tot))
        .select("query_id", "doc_id", F.floor(idf * norm * F.lit(1e6)).alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("c").alias("score_1e6"))
    )

    # --- Dirichlet query-likelihood leg
    cf = F.sum("tf").over(Window.partitionBy("term"))
    g1 = F.floor(
        F.log(1.0 + F.col("tf") / (F.lit(QL_MU) * F.col("cf") / F.col("total_toks")))
        * F.lit(1e6)
    )
    nq = qterms.groupBy("query_id").agg(F.count(F.lit(1)).alias("nq"))
    ql = (
        tfd.withColumn("cf", cf)
        .join(F.broadcast(qterms), "term")
        .join(F.broadcast(tot))
        .select("query_id", "doc_id", g1.alias("g1"), "dl")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("g1").alias("sum_g1"), F.first("dl").alias("dl"))
        .join(F.broadcast(nq), "query_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("sum_g1")
                + F.col("nq")
                * F.floor(F.log(F.lit(QL_MU) / (F.col("dl") + F.lit(QL_MU))) * F.lit(1e6))
            ).alias("score_1e6"),
        )
    )

    def _pooled(leg: DataFrame, name: str) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            F.col("score_1e6").desc(), F.col("doc_id")
        )
        return (
            leg.withColumn("lrank", F.row_number().over(w))
            .filter(F.col("lrank") <= RRF_POOL)
            .select("query_id", "doc_id", "lrank", F.lit(name).alias("leg"))
        )

    fused = (
        _pooled(bm25, "bm25")
        .unionAll(_pooled(ql, "ql"))
        .withColumn("contrib", F.expr(f"1000000000 div ({RRF_K} + lrank)"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").alias("rrf_score"),
            F.count(F.lit(1)).alias("n_legs"),
            F.min(F.when(F.col("leg") == "bm25", F.col("lrank"))).alias("bm25_rank"),
            F.min(F.when(F.col("leg") == "ql", F.col("lrank"))).alias("ql_rank"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "rank", "doc_id", "rrf_score", "n_legs", "bm25_rank", "ql_rank")
        .orderBy("query_id", "rank")
    )


QUERIES["q124_hybrid_rrf"] = q124_hybrid_rrf

ORACLE["q124_hybrid_rrf"] = f"""
    WITH qterms(query_id, term) AS (VALUES {_DUCK_BM25_QTERMS}),
    toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(lower(text)), ' +')) AS term
        FROM documents),
    dl AS (
        SELECT doc_id, len(string_split_regex(trim(lower(text)), ' +'))::bigint AS dl
        FROM documents),
    tot AS (SELECT count(*)::bigint AS n_docs, sum(dl)::bigint AS total_toks FROM dl),
    tfd AS (
        SELECT t.term, t.doc_id, count(*)::bigint AS tf
        FROM toks t JOIN (SELECT DISTINCT term FROM qterms) q USING (term)
        GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*)::bigint AS df, sum(tf)::bigint AS cf FROM tfd GROUP BY term),
    bm25 AS (
        SELECT q.query_id, t.doc_id,
               sum(floor(
                   ln((tot.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
                   * ((t.tf * ({BM25_K1} + 1.0))
                      / (t.tf + {BM25_K1} * (1.0 - {BM25_B}
                          + {BM25_B} * (d.dl::double * tot.n_docs / tot.total_toks))))
                   * 1e6)::bigint)::bigint AS score_1e6
        FROM tfd t
        JOIN qterms q USING (term)
        JOIN dfreq f USING (term)
        JOIN dl d USING (doc_id)
        CROSS JOIN tot
        GROUP BY 1, 2),
    nq AS (SELECT query_id, count(*)::bigint AS nq FROM qterms GROUP BY query_id),
    ql AS (
        SELECT g.query_id, g.doc_id,
               g.sum_g1 + nq.nq * floor(ln({QL_MU} / (d.dl + {QL_MU})) * 1e6)::bigint AS score_1e6
        FROM (
            SELECT q.query_id, t.doc_id,
                   sum(floor(ln(1.0 + t.tf / ({QL_MU} * f.cf / tot.total_toks)) * 1e6)::bigint)::bigint AS sum_g1
            FROM tfd t
            JOIN qterms q USING (term)
            JOIN dfreq f USING (term)
            CROSS JOIN tot
            GROUP BY 1, 2) g
        JOIN dl d USING (doc_id)
        JOIN nq USING (query_id)),
    pooled AS (
        SELECT query_id, doc_id, lrank, leg FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY score_1e6 DESC, doc_id) AS lrank,
                   'bm25' AS leg
            FROM bm25) WHERE lrank <= {RRF_POOL}
        UNION ALL
        SELECT query_id, doc_id, lrank, leg FROM (
            SELECT query_id, doc_id,
                   row_number() OVER (PARTITION BY query_id ORDER BY score_1e6 DESC, doc_id) AS lrank,
                   'ql' AS leg
            FROM ql) WHERE lrank <= {RRF_POOL}),
    fused AS (
        SELECT query_id, doc_id,
               sum(1000000000 // ({RRF_K} + lrank))::bigint AS rrf_score,
               count(*)::bigint AS n_legs,
               min(CASE WHEN leg = 'bm25' THEN lrank END)::bigint AS bm25_rank,
               min(CASE WHEN leg = 'ql' THEN lrank END)::bigint AS ql_rank
        FROM pooled GROUP BY 1, 2),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id)::int AS rank
        FROM fused)
    SELECT query_id, rank, doc_id, rrf_score, n_legs, bm25_rank, ql_rank
    FROM ranked WHERE rank <= {BM25_TOPK}
    ORDER BY query_id, rank
"""


# ---------------------------------- robust length-outlier report (MAD)

MAD_K = 3  # flag |len - median| > MAD_K * MAD (the textbook robust gate)


def _med2_of(cen: DataFrame, val_col: str) -> DataFrame:
    """Exact per-lang DOUBLED median off a (lang, value, cnt) census:
    med2 = lower-middle + upper-middle order statistics (so an even
    count's half-integer median stays a bigint — all downstream
    arithmetic compares doubled units against doubled units and no
    float ever appears). cum/n ride one census-sized window pair;
    the middles fall out of two conditional mins in one agg."""
    w = Window.partitionBy("lang").orderBy(val_col)
    wall = Window.partitionBy("lang")
    c = cen.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    lo = F.expr("(n + 1) div 2")
    hi = F.expr("n div 2 + 1")
    return (
        c.groupBy("lang")
        .agg(
            F.min(F.when(F.col("cum") >= lo, F.col(val_col))).alias("m_lo"),
            F.min(F.when(F.col("cum") >= hi, F.col(val_col))).alias("m_hi"),
            F.first("n").alias("n_docs"),
        )
        .select("lang", (F.col("m_lo") + F.col("m_hi")).alias("med2"), "n_docs")
    )


def q125_length_outliers(
    spark: SparkSession, sf_dir: str, checkpointed: bool = True
) -> DataFrame:
    """Per-language robust length-outlier report — median / MAD
    (median absolute deviation) of the token count with a
    |len − median| > MAD_K·MAD outlier census: the robust twin of
    mean/std length gates (one 10⁶-token pathological doc moves a
    mean, it cannot move a median), the standard screen for truncated
    crawls and concatenation bugs before training. The fixture corpus
    is honestly outlier-free at K=3 (uniform 10–100-token docs);
    planted tests prove the flag fires.

    Integer-exact throughout: medians are computed in DOUBLED units
    (med2 = low + high middle order statistics, so even-count
    half-integer medians stay bigint), deviations d = |2·len − med2|
    live in the same doubled units, the MAD is the census median of d
    (mad2 = 2·MAD), and the outlier rule |len−med| > K·MAD is
    EXACTLY d > K·mad2 — pure bigint comparisons, no float anywhere
    (the q121 discipline applied to order statistics).

    Scale shape (the q120 grid-census trick applied to medians): the
    (lang, len) census — map-side combining, ≤ langs × max-doc-length
    rows at ANY corpus size — is the only corpus-derived frame; every
    subsequent step (cum windows, the deviation census, the outlier
    count) is census-sized. An exact percentile over raw rows would
    collect per-group value buffers (corpus-bounded memory); the
    census form is grid-bounded. The census subtree plans FOUR times
    at fixture scale (median leg, deviation leg, final leg — Catalyst
    does not dedupe shared subplans; PLANS.json pins all four narrow
    2-column scans); ``checkpointed=True`` is the 100 TB path: the
    census is pinned once via ``io.materialize`` (census-sized, tiny)
    and every leg reads the pin — the corpus is then scanned exactly
    ONCE, and the returned plan has ZERO corpus FileScans
    (tests/test_plans.py::test_checkpoint_collapses_scans proves the
    shape AND byte-identical output). r10: the pin IS the default —
    measured ×0.86 at sf0.1 on top of the 4×→1 scan win — and the
    pure-Catalyst plan stays watched via the lazy variant in
    tools/plan_snapshot.py. Output is
    ≤|langs| rows: (lang, n_docs, med2_tokens, mad2_tokens, max_dev2,
    n_outliers, outlier_ppm)."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        F.size(F.split(F.trim(F.col("text")), " +")).cast("bigint").alias("v"),
    )
    census = base.groupBy("lang", "v").agg(F.count(F.lit(1)).alias("cnt"))
    if checkpointed:
        from . import io as _io

        census = _io.materialize(census)
    med = _med2_of(census, "v")
    dev = (
        census.join(F.broadcast(med), "lang")
        .select("lang", F.abs(F.lit(2) * F.col("v") - F.col("med2")).alias("d"), "cnt")
        .groupBy("lang", "d")
        .agg(F.sum("cnt").alias("cnt"))
    )
    mad = _med2_of(dev, "d").select("lang", F.col("med2").alias("mad2"))
    return (
        census.join(F.broadcast(med), "lang")
        .join(F.broadcast(mad), "lang")
        .withColumn("d", F.abs(F.lit(2) * F.col("v") - F.col("med2")))
        .groupBy("lang")
        .agg(
            F.first("n_docs").alias("n_docs"),
            F.first("med2").alias("med2_tokens"),
            F.first("mad2").alias("mad2_tokens"),
            F.max("d").alias("max_dev2"),
            F.sum(
                F.when(F.col("d") > MAD_K * F.col("mad2"), F.col("cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("n_outliers"),
        )
        .withColumn("outlier_ppm", F.expr("n_outliers * 1000000 div n_docs"))
        .select(
            "lang",
            "n_docs",
            "med2_tokens",
            "mad2_tokens",
            "max_dev2",
            "n_outliers",
            "outlier_ppm",
        )
        .orderBy("lang")
    )


QUERIES["q125_length_outliers"] = q125_length_outliers

ORACLE["q125_length_outliers"] = f"""
    WITH base AS (
        SELECT lang, len(string_split_regex(trim(text), ' +'))::bigint AS v
        FROM documents),
    census AS (SELECT lang, v, count(*)::bigint AS cnt FROM base GROUP BY 1, 2),
    cum AS (
        SELECT lang, v, cnt,
               sum(cnt) OVER (PARTITION BY lang ORDER BY v)::bigint AS cum,
               sum(cnt) OVER (PARTITION BY lang)::bigint AS n
        FROM census),
    med AS (
        SELECT lang,
               (min(CASE WHEN cum >= (n + 1) // 2 THEN v END)
                + min(CASE WHEN cum >= n // 2 + 1 THEN v END))::bigint AS med2,
               min(n)::bigint AS n_docs
        FROM cum GROUP BY lang),
    dev AS (
        SELECT c.lang, abs(2 * c.v - m.med2)::bigint AS d, sum(c.cnt)::bigint AS cnt
        FROM census c JOIN med m USING (lang) GROUP BY 1, 2),
    dcum AS (
        SELECT lang, d, cnt,
               sum(cnt) OVER (PARTITION BY lang ORDER BY d)::bigint AS cum,
               sum(cnt) OVER (PARTITION BY lang)::bigint AS n
        FROM dev),
    mad AS (
        SELECT lang,
               (min(CASE WHEN cum >= (n + 1) // 2 THEN d END)
                + min(CASE WHEN cum >= n // 2 + 1 THEN d END))::bigint AS mad2
        FROM dcum GROUP BY lang)
    SELECT c.lang, m.n_docs, m.med2 AS med2_tokens, a.mad2 AS mad2_tokens,
           max(abs(2 * c.v - m.med2))::bigint AS max_dev2,
           sum(CASE WHEN abs(2 * c.v - m.med2) > {MAD_K} * a.mad2
               THEN c.cnt ELSE 0 END)::bigint AS n_outliers,
           ((sum(CASE WHEN abs(2 * c.v - m.med2) > {MAD_K} * a.mad2
                 THEN c.cnt ELSE 0 END) * 1000000) // m.n_docs)::bigint AS outlier_ppm
    FROM census c JOIN med m USING (lang) JOIN mad a USING (lang)
    GROUP BY 1, 2, 3, 4
    ORDER BY lang
"""


# ---------------------------------- vocabulary drift between snapshots

VOCAB_SNAP_MOD = 3   # doc_id % 3 == 0 → snapshot B (q110's split rule)
VOCAB_TOPK = 25


def q126_vocab_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical drift between two corpus snapshots — the vocabulary
    twin of q110's embedding drift and q107's content diff: per token
    type, relative frequency in each snapshot (ppm of snapshot
    tokens) and the shift between them, top-K by |shift|; plus the
    new-vocabulary summary (types in B never seen in A) every row
    carries. A crawler picking up a new spam campaign, a template
    change, or a genre shift shows up here before it shows up in any
    aggregate quality score. Novel tokens are the a_count = 0 rows
    (is_novel); the fixture's snapshots share their vocabulary, so
    fixture novelty is honestly zero while the shift ranking still
    produces a full frame — planted tests prove the novelty columns.

    Integer-exact: ppm values are count·1e6 div snapshot-total
    (bigint), the shift is their difference, and the ranking key
    (|shift| desc, token) is total — no float anywhere.

    Scale shape: one corpus scan explodes tokens with the snapshot
    tag; the census agg map-side combines to vocab-sized output
    (conditional sums, one shuffle keyed on the token); totals are a
    1-row aggregate broadcast back; top-K is orderBy+limit
    (TakeOrdered — per-partition heaps, never a global sort). The
    final rank window runs on ≤VOCAB_TOPK rows."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        (F.col("doc_id") % VOCAB_SNAP_MOD == 0).alias("is_b"),
        F.explode(F.split(F.trim(F.lower(F.col("text"))), " +")).alias("tok"),
    )
    census = toks.groupBy("tok").agg(
        F.sum(F.when(F.col("is_b"), 1).otherwise(0)).alias("b_count"),
        F.sum(F.when(F.col("is_b"), 0).otherwise(1)).alias("a_count"),
    )
    tot = census.agg(
        F.sum("a_count").alias("a_toks"),
        F.sum("b_count").alias("b_toks"),
        F.sum(F.when(F.col("b_count") > 0, 1).otherwise(0)).alias("n_types_b"),
        F.sum(
            F.when((F.col("b_count") > 0) & (F.col("a_count") == 0), 1).otherwise(0)
        ).alias("n_novel_types"),
    ).withColumn(
        # empty-side guards: a corpus wholly inside ONE snapshot (a
        # 1-doc corpus lands all in B under the mod rule) must define
        # ppm-vs-empty as 0, not divide by zero (ANSI throws, DuckDB
        # NULLs — both wrong for a report row)
        "novel_ppm",
        F.expr("coalesce(n_novel_types * 1000000 div nullif(n_types_b, 0), 0L)"),
    )
    shifted = (
        census.join(F.broadcast(tot))
        .withColumn("a_ppm", F.expr("coalesce(a_count * 1000000 div nullif(a_toks, 0), 0L)"))
        .withColumn("b_ppm", F.expr("coalesce(b_count * 1000000 div nullif(b_toks, 0), 0L)"))
        .withColumn("shift_ppm", F.col("b_ppm") - F.col("a_ppm"))
    )
    w = Window.orderBy(F.abs("shift_ppm").desc(), F.col("tok"))
    return (
        shifted.orderBy(F.abs("shift_ppm").desc(), F.col("tok"))
        .limit(VOCAB_TOPK)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "tok",
            "a_count",
            "b_count",
            "a_ppm",
            "b_ppm",
            "shift_ppm",
            (F.col("a_count") == 0).alias("is_novel"),
            "n_novel_types",
            "novel_ppm",
        )
        .orderBy("rank")
    )


QUERIES["q126_vocab_drift"] = q126_vocab_drift

ORACLE["q126_vocab_drift"] = f"""
    WITH toks AS (
        SELECT doc_id % {VOCAB_SNAP_MOD} = 0 AS is_b,
               unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
        FROM documents),
    census AS (
        SELECT tok,
               sum(CASE WHEN is_b THEN 1 ELSE 0 END)::bigint AS b_count,
               sum(CASE WHEN is_b THEN 0 ELSE 1 END)::bigint AS a_count
        FROM toks GROUP BY tok),
    tot AS (
        SELECT sum(a_count)::bigint AS a_toks, sum(b_count)::bigint AS b_toks,
               sum(CASE WHEN b_count > 0 THEN 1 ELSE 0 END)::bigint AS n_types_b,
               sum(CASE WHEN b_count > 0 AND a_count = 0
                   THEN 1 ELSE 0 END)::bigint AS n_novel_types
        FROM census),
    shifted AS (
        SELECT tok, a_count, b_count,
               coalesce(a_count * 1000000 // nullif(a_toks, 0), 0)::bigint AS a_ppm,
               coalesce(b_count * 1000000 // nullif(b_toks, 0), 0)::bigint AS b_ppm,
               (coalesce(b_count * 1000000 // nullif(b_toks, 0), 0)
                - coalesce(a_count * 1000000 // nullif(a_toks, 0), 0))::bigint AS shift_ppm,
               a_count = 0 AS is_novel,
               n_novel_types,
               coalesce(n_novel_types * 1000000 // nullif(n_types_b, 0), 0)::bigint AS novel_ppm
        FROM census, tot),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY abs(shift_ppm) DESC, tok)::int AS rank
        FROM shifted)
    SELECT rank, tok, a_count, b_count, a_ppm, b_ppm, shift_ppm, is_novel,
           n_novel_types, novel_ppm
    FROM ranked WHERE rank <= {VOCAB_TOPK}
    ORDER BY rank
"""


# ---------------------------------- stratified weighted sampling

STRAT_SAMPLE_K = 20  # docs kept per language


def q127_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-weighted sampling without replacement —
    q117's Efraimidis–Spirakis keys with a FIXED quota per language
    instead of one global cut, so low-resource languages cannot be
    squeezed out by a high-resource language's weight mass (the
    multilingual-corpus construction rule q79/q104 set shares for,
    applied at the document level).

    Same exact-bigint A-ES key as q117 (content-addressed md5
    uniform, floor(ln(u)/quality·1e6)); the per-language top-K runs
    through the skew-safe two-phase grouped top-K (engine.skew
    .grouped_topk, q115's machinery — semantics-preserving by the
    property-tested containment law, so the oracle is the plain
    one-window SQL): a billion-doc language never funnels one window
    task. Scale: one narrow corpus projection, the salted two-window
    pair, output |langs|·K rows."""
    d = table(spark, sf_dir, "documents")
    u = (
        F.expr(
            "cast(conv(substr(md5(concat('wsample:', doc_id)), 1, 15), 16, 10) as bigint)"
        )
        % 1000000
        + 1
    ) / 1000001.0
    keyed = d.select("doc_id", "lang", _quality_col().alias("quality")).withColumn(
        "key_1e6", F.floor(F.log(u) / F.col("quality") * F.lit(1e6))
    )
    from .skew import grouped_topk

    top = grouped_topk(
        keyed,
        ["lang"],
        [F.col("key_1e6").desc(), F.col("doc_id")],
        F.xxhash64("doc_id"),
        STRAT_SAMPLE_K,
    )
    return top.select(
        "lang", F.col("grp_rank").alias("rank"), "doc_id", "quality", "key_1e6"
    ).orderBy("lang", "rank")


QUERIES["q127_stratified_sample"] = q127_stratified_sample

ORACLE["q127_stratified_sample"] = f"""
    WITH q AS ({_DUCK_QUALITY}),
    keyed AS (
        SELECT d.doc_id, d.lang, q.quality,
               floor(
                   ln((('0x' || substr(md5('wsample:' || d.doc_id), 1, 15))::bigint
                        % 1000000 + 1) / 1000001.0)
                   / q.quality * 1e6)::bigint AS key_1e6
        FROM documents d JOIN q USING (doc_id)),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY lang
                                     ORDER BY key_1e6 DESC, doc_id)::int AS rank
        FROM keyed)
    SELECT lang, rank, doc_id, quality, key_1e6
    FROM ranked WHERE rank <= {STRAT_SAMPLE_K}
    ORDER BY lang, rank
"""


# ---------------------------------- interpolated bigram-LM scoring

LM_LAMBDA = 0.7  # bigram weight in the interpolation (1-λ on the unigram)


def q128_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring, one order up from q57c: each
    document's mean negative log-probability under an INTERPOLATED
    BIGRAM language model trained on the corpus itself —
    p(w2|w1) = λ·c(w1,w2)/c_ctx(w1) + (1−λ)·c(w2)/T. Context
    modeling separates scrambled-but-common-vocabulary spam from real
    prose, which no unigram LM can (the production pipelines run a
    5-gram KenLM here; the bigram keeps the model SQL-mirrorable
    while exercising the same apply shape). Sub-bigram docs
    (n_tokens < 2) are flagged too_short with score 0.

    The structural difference from q57c is the APPLY join: a unigram
    LM is vocab-sized and broadcasts, but a bigram table is
    vocab-pair-sized — model-scale, not broadcast-scale — so the
    apply pass is a hash EQUI-join of the document bigram stream
    against the LM on (w1, w2). That join is THE scale shape of
    n-gram LM scoring at 100 TB: shuffle keyed on the gram pair,
    volume O(corpus bigram positions), LM side O(bigram types) — and
    because the model is trained on the same corpus, every stream row
    inner-joins (no smoothing-miss branch needed; scoring a FOREIGN
    corpus would left-join with the (1−λ)-unigram fallback term).

    Exactness: each position's term is floor(−ln(λ·c_bi/c_ctx +
    (1−λ)·c_uni/T)·1e6) — ln of identically-associated exact-count
    quotients (the q57c/q109 portable op), floor-gridded BEFORE the
    bigint sum; the mean is integer division.

    Plan: bigram stream via zip_with(slice, slice) — JVM-side, no
    Python; censuses map-side combine (bigram census shuffles
    gram-pair-keyed once, vocab-sized after combine); c_ctx derives
    from the bigram census (vocab-sized), NOT a third corpus pass;
    T is a 1-row broadcast. Corpus scans: stream leg + unigram leg +
    doc-length leg (the bigram census reuses the stream subtree —
    Catalyst plans it per use; at 100 TB checkpoint the tokenized
    projection once)."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), " +").alias("toks")
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1),"
                " (a, b) -> struct(a as w1, b as w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    docs_tok = base.select("doc_id", F.size("toks").cast("bigint").alias("n_tokens"))
    uni = (
        base.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_uni"))
    )
    tot = uni.agg(F.sum("c_uni").alias("t_toks"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bi"))
    ctx = bi.groupBy("w1").agg(F.sum("c_bi").alias("c_ctx"))
    lm = (
        bi.join(ctx, "w1")
        .join(uni.withColumnRenamed("w", "w2"), "w2")
        .join(F.broadcast(tot))
        .withColumn(
            "term_1e6",
            F.floor(
                -F.log(
                    F.lit(LM_LAMBDA) * (F.col("c_bi") / F.col("c_ctx"))
                    + F.lit(1.0 - LM_LAMBDA) * (F.col("c_uni") / F.col("t_toks"))
                )
                * F.lit(1e6)
            ),
        )
        .select("w1", "w2", "term_1e6")
    )
    scored = (
        bigrams.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("term_1e6").alias("s"))
        .withColumn("nll_mean_1e6", F.expr("s div n_bigrams"))
    )
    return (
        docs_tok.join(scored, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("nll_mean_1e6", F.lit(0)).alias("nll_mean_1e6"),
            (F.col("n_tokens") < 2).alias("too_short"),
        )
        .orderBy("doc_id")
    )


QUERIES["q128_bigram_logprob"] = q128_bigram_logprob

ORACLE["q128_bigram_logprob"] = f"""
    WITH base AS (
        SELECT doc_id, string_split_regex(trim(lower(text)), ' +') AS toks
        FROM documents),
    docs_tok AS (SELECT doc_id, len(toks)::bigint AS n_tokens FROM base),
    bigrams AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM base, unnest(range(1, len(toks))) AS r(i)),
    uni AS (
        SELECT w, count(*)::bigint AS c_uni
        FROM (SELECT unnest(toks) AS w FROM base) GROUP BY 1),
    tot AS (SELECT sum(c_uni)::bigint AS t_toks FROM uni),
    bi AS (SELECT w1, w2, count(*)::bigint AS c_bi FROM bigrams GROUP BY 1, 2),
    ctx AS (SELECT w1, sum(c_bi)::bigint AS c_ctx FROM bi GROUP BY 1),
    lm AS (
        SELECT b.w1, b.w2,
               floor(-ln({LM_LAMBDA} * (b.c_bi / c.c_ctx)
                         + {1.0 - LM_LAMBDA} * (u.c_uni / t.t_toks)) * 1e6)::bigint AS term_1e6
        FROM bi b
        JOIN ctx c USING (w1)
        JOIN uni u ON u.w = b.w2
        CROSS JOIN tot t),
    scored AS (
        SELECT g.doc_id, count(*)::bigint AS n_bigrams,
               (sum(l.term_1e6) // count(*))::bigint AS nll_mean_1e6
        FROM bigrams g JOIN lm l USING (w1, w2)
        GROUP BY g.doc_id)
    SELECT d.doc_id, d.n_tokens,
           coalesce(s.n_bigrams, 0)::bigint AS n_bigrams,
           coalesce(s.nll_mean_1e6, 0)::bigint AS nll_mean_1e6,
           d.n_tokens < 2 AS too_short
    FROM docs_tok d LEFT JOIN scored s USING (doc_id)
    ORDER BY doc_id
"""


# ---------------------------------- per-source quality league table


def q130_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality league table: exact q57-quality quartiles
    per source plus a below-corpus-median flag — the frame a curation
    team reads before blocklisting or down-weighting a domain (q115
    caps a source's VOLUME; this ranks its QUALITY; q121 measures
    concentration — the three axes of source governance).

    Quartiles are type-1 order statistics (value at rank ⌈f·n⌉) on
    the quality score's 1e-6 bigint grid, so every emitted number is
    a bigint and the report cannot drift on a float — same convention
    on both engines by construction.

    Scale shape (q125's grid-census machinery on the quality axis):
    the (source, quality_1e6) census is grid-bounded (≤ sources ×
    ~1.1e6 rows at ANY corpus size), quartiles come from per-source
    cum windows over the census, the corpus-wide median reuses the
    same census re-aggregated (never a second corpus scan), and the
    1-row corpus median broadcasts into the ≤|sources| output. One
    2-column corpus scan per census planning (PLANS.json pins the
    counts); a billion-doc source costs a bigger census slice, never
    a bigger window task than its distinct quality levels."""
    d = table(spark, sf_dir, "documents")
    base = d.select("source", _quality_1e6_col().alias("q"))
    census = base.groupBy("source", "q").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("source").orderBy("q")
    wall = Window.partitionBy("source")
    c = census.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wall)
    )

    def at(num: int, den: int, name: str):
        # type-1 order statistic: smallest value whose cum reaches
        # ceil(num/den · n)
        rank = F.expr(f"(n * {num} + {den} - 1) div {den}")
        return F.min(F.when(F.col("cum") >= rank, F.col("q"))).alias(name)

    per_src = c.groupBy("source").agg(
        F.first("n").alias("n_docs"),
        at(1, 4, "q25_1e6"),
        at(1, 2, "median_1e6"),
        at(3, 4, "q75_1e6"),
    )
    gc = census.groupBy("q").agg(F.sum("cnt").alias("cnt"))
    g = gc.withColumn("cum", F.sum("cnt").over(Window.orderBy("q"))).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy())
    )
    corpus_med = g.groupBy().agg(
        F.min(F.when(F.col("cum") >= F.expr("(n + 1) div 2"), F.col("q"))).alias(
            "corpus_median_1e6"
        )
    )
    return (
        per_src.join(F.broadcast(corpus_med))
        .withColumn(
            "below_corpus_median", F.col("median_1e6") < F.col("corpus_median_1e6")
        )
        .select(
            "source",
            "n_docs",
            "q25_1e6",
            "median_1e6",
            "q75_1e6",
            "corpus_median_1e6",
            "below_corpus_median",
        )
        .orderBy("source")
    )


QUERIES["q130_source_quality_report"] = q130_source_quality_report

_DUCK_Q1E6 = """
    SELECT doc_id, source,
           floor((0.4 * least(len(string_split_regex(trim(text), ' +')) / 100.0, 1.0)
                 + 0.3 * (len(list_distinct(string_split_regex(trim(text), ' +')))::double
                          / len(string_split_regex(trim(text), ' +')))
                 + 0.3 * least((length(regexp_replace(trim(text), ' +', '', 'g'))::double
                                / len(string_split_regex(trim(text), ' +'))) / 10.0, 1.0))
                 * 1e6)::bigint AS q
    FROM documents
"""

ORACLE["q130_source_quality_report"] = f"""
    WITH base AS ({_DUCK_Q1E6}),
    census AS (SELECT source, q, count(*)::bigint AS cnt FROM base GROUP BY 1, 2),
    cum AS (
        SELECT source, q, cnt,
               sum(cnt) OVER (PARTITION BY source ORDER BY q)::bigint AS cum,
               sum(cnt) OVER (PARTITION BY source)::bigint AS n
        FROM census),
    per_src AS (
        SELECT source, min(n)::bigint AS n_docs,
               min(CASE WHEN cum >= (n * 1 + 3) // 4 THEN q END)::bigint AS q25_1e6,
               min(CASE WHEN cum >= (n * 1 + 1) // 2 THEN q END)::bigint AS median_1e6,
               min(CASE WHEN cum >= (n * 3 + 3) // 4 THEN q END)::bigint AS q75_1e6
        FROM cum GROUP BY source),
    gcensus AS (SELECT q, sum(cnt)::bigint AS cnt FROM census GROUP BY q),
    gcum AS (
        SELECT q, sum(cnt) OVER (ORDER BY q)::bigint AS cum,
               sum(cnt) OVER ()::bigint AS n
        FROM gcensus),
    gmed AS (
        SELECT min(CASE WHEN cum >= (n + 1) // 2 THEN q END)::bigint AS corpus_median_1e6
        FROM gcum)
    SELECT p.source, p.n_docs, p.q25_1e6, p.median_1e6, p.q75_1e6,
           g.corpus_median_1e6,
           p.median_1e6 < g.corpus_median_1e6 AS below_corpus_median
    FROM per_src p CROSS JOIN gmed g
    ORDER BY p.source
"""


# ---------------------------------- defense-in-depth decontamination


def q129_decontamination_defense(
    spark: SparkSession, sf_dir: str, checkpointed: bool = False
) -> DataFrame:
    """Defense-in-depth benchmark decontamination: ONE per-document
    verdict frame joining the two independent detectors a serious
    pipeline runs together — q48's n-gram shingle overlap (catches
    verbatim/near-verbatim leaks) and q105's embedding-space scan
    (catches paraphrased/translated leaks sharing no n-grams) — with
    ``contaminated_any`` as the union verdict the scrub acts on.
    Composition, not duplication: this query CALLS q48 and q105 and
    joins their outputs on doc_id = vec_id (the fixture's embedding
    table is keyed by document id); its oracle embeds both member
    oracles verbatim (the rotation-composite discipline).

    Edges defined, not dropped: docs with <3 tokens have no shingles
    (q48 omits them) → ngram side coalesces to clean; docs without an
    embedding — or whose vector is an eval vector or degenerate —
    aren't semantically scorable → ``semantic_scored`` false, clean;
    ``max_eval_sim`` stays NULL where unscored or eval-side-empty
    (q105's own semantics).

    Scale shape: both members keep their documented plans (broadcast
    eval shingles; one-row broadcast eval-vector array) — this adds
    two doc-keyed left joins, the second against an embeddings-sized
    frame. At 100 TB the embeddings table is bucketed by id (the
    q102/q118 store argument) so the verdict join co-locates, and
    ``checkpointed=True`` pins both members' per-doc verdict frames
    via ``io.materialize`` (each ≤ one row per doc, narrow) so the
    composition can never re-plan a member's corpus subtree — the
    returned plan keeps exactly ONE corpus FileScan (the doc_id
    spine; tests/test_plans.py::test_checkpoint_collapses_scans)."""
    from .similarity import q105_semantic_decontamination

    d = table(spark, sf_dir, "documents").select("doc_id")
    ng = q48_decontaminate(spark, sf_dir).select(
        "doc_id",
        F.col("n_hits").alias("ngram_hits"),
        F.col("contaminated").alias("ngram_contaminated"),
    )
    sem = q105_semantic_decontamination(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"),
        "max_eval_sim",
        F.col("n_hits").alias("semantic_hits"),
        F.col("contaminated").alias("semantic_contaminated"),
    )
    if checkpointed:
        from . import io as _io

        ng, sem = _io.materialize(ng), _io.materialize(sem)
    return (
        d.join(ng, "doc_id", "left")
        .join(sem, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("ngram_hits", F.lit(0)).alias("ngram_hits"),
            F.coalesce("ngram_contaminated", F.lit(False)).alias("ngram_contaminated"),
            F.col("semantic_contaminated").isNotNull().alias("semantic_scored"),
            "max_eval_sim",
            F.coalesce("semantic_hits", F.lit(0)).alias("semantic_hits"),
            F.coalesce("semantic_contaminated", F.lit(False)).alias(
                "semantic_contaminated"
            ),
            (
                F.coalesce("ngram_contaminated", F.lit(False))
                | F.coalesce("semantic_contaminated", F.lit(False))
            ).alias("contaminated_any"),
        )
        .orderBy("doc_id")
    )


QUERIES["q129_decontamination_defense"] = q129_decontamination_defense

from .similarity import ORACLE as _SIM_ORACLE  # noqa: E402 (composed oracle below)

# the composed oracle embeds both member oracles VERBATIM (the
# rotation-composite discipline) — plain concatenation, never .format,
# so member SQL containing braces can't break the template
ORACLE["q129_decontamination_defense"] = (
    "WITH ngram AS ("
    + ORACLE["q48_decontaminate"]
    + "), sem AS ("
    + _SIM_ORACLE["q105_semantic_decontamination"]
    + """)
    SELECT d.doc_id,
           coalesce(n.n_hits, 0)::bigint AS ngram_hits,
           coalesce(n.contaminated, false) AS ngram_contaminated,
           s.vec_id IS NOT NULL AS semantic_scored,
           s.max_eval_sim,
           coalesce(s.n_hits, 0)::int AS semantic_hits,
           coalesce(s.contaminated, false) AS semantic_contaminated,
           (coalesce(n.contaminated, false) OR coalesce(s.contaminated, false))
               AS contaminated_any
    FROM documents d
    LEFT JOIN ngram n USING (doc_id)
    LEFT JOIN sem s ON s.vec_id = d.doc_id
    ORDER BY d.doc_id
"""
)


# q134: registered post-dict — its oracle composes member oracles by
# concatenation (never .format: member SQL contains braces).
QUERIES["q134_curation_funnel"] = q134_curation_funnel

_Q134_QUALITY = """
    0.4 * least(len(string_split_regex(trim(text), ' +')) / 100.0, 1.0)
    + 0.3 * (len(list_distinct(string_split_regex(trim(text), ' +')))::double
             / len(string_split_regex(trim(text), ' +')))
    + 0.3 * least(length(regexp_replace(trim(text), ' +', '', 'g'))::double
                  / len(string_split_regex(trim(text), ' +')) / 10.0, 1.0)
"""

# the stage-CTE prefix is SHARED with q139's acceptance oracle (plain
# concatenation both places; the assembled q134 string is byte-
# identical to the pre-split r10 form — verified at refactor time and
# pinned by tests/test_text.py::test_q139_funnel_acceptance_*)
_Q134_STAGE_CTES = (
    "WITH RECURSIVE\n"
    f"s1 AS (SELECT doc_id, text FROM documents WHERE doc_id % {DECON_HOLDOUT_MOD} <> 0),\n"
    "s2 AS (SELECT min(doc_id) AS doc_id FROM s1 GROUP BY md5(text)),\n"
    "cand AS (SELECT doc_a, doc_b FROM ("
    + ORACLE["q54_minhash_candidates"]
    + ") c WHERE est_jaccard >= 0.5),\n"
    "pairs AS (SELECT doc_a, doc_b FROM cand\n"
    "          JOIN s2 a ON a.doc_id = cand.doc_a\n"
    "          JOIN s2 b ON b.doc_id = cand.doc_b),\n"
    "undirected AS (SELECT doc_a AS a, doc_b AS b FROM pairs\n"
    "               UNION SELECT doc_b, doc_a FROM pairs),\n"
    "reach(doc, r) AS (\n"
    "    SELECT a, a FROM undirected\n"
    "    UNION\n"
    "    SELECT u.a, reach.r FROM undirected u JOIN reach ON u.b = reach.doc),\n"
    "comp AS (SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc),\n"
    "s3 AS (SELECT doc_id FROM s2 WHERE doc_id NOT IN\n"
    "       (SELECT doc_id FROM comp WHERE doc_id <> component)),\n"
    "s4 AS (SELECT s3.doc_id FROM s3 JOIN documents USING (doc_id)\n"
    "       WHERE (" + _Q134_QUALITY + ") >= 0.5),\n"
    "contam AS (SELECT doc_id FROM ("
    + ORACLE["q48_decontaminate"]
    + ") q WHERE contaminated),\n"
    "s5 AS (SELECT doc_id FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM contam)),\n"
)

ORACLE["q134_curation_funnel"] = (
    _Q134_STAGE_CTES
    + "counts AS (\n"
    "    SELECT 0 AS stage, 'ingested' AS gate,\n"
    "           (SELECT count(*) FROM documents)::bigint AS n_docs\n"
    "    UNION ALL SELECT 1, 'holdout_carveout', (SELECT count(*) FROM s1)::bigint\n"
    "    UNION ALL SELECT 2, 'exact_dedup', (SELECT count(*) FROM s2)::bigint\n"
    "    UNION ALL SELECT 3, 'near_dup', (SELECT count(*) FROM s3)::bigint\n"
    "    UNION ALL SELECT 4, 'quality', (SELECT count(*) FROM s4)::bigint\n"
    "    UNION ALL SELECT 5, 'decontaminated', (SELECT count(*) FROM s5)::bigint)\n"
    "SELECT stage, gate, n_docs,\n"
    "       coalesce(prev - n_docs, 0)::bigint AS n_dropped,\n"
    "       coalesce((prev - n_docs) * 1000000 // nullif(prev, 0), 0)::bigint\n"
    "           AS drop_ppm\n"
    "FROM (SELECT stage, gate, n_docs,\n"
    "             lag(n_docs) OVER (ORDER BY stage) AS prev FROM counts) t\n"
    "ORDER BY stage"
)


# q135: the incremental funnel's oracle replays the snapshot split
# (q107's constants) and every gate's member SQL over the snapshot-B
# texts via the _over(rel) fragment builders — concatenation, never
# .format (member SQL contains braces).
from .relational import (  # noqa: E402
    SNAP_ABSENT_A_MOD as _SNAP_A,
    SNAP_ABSENT_B_MOD as _SNAP_B,
    SNAP_EDIT_B_MOD as _SNAP_E,
)

QUERIES["q135_incremental_curation"] = q135_incremental_curation

_Q135_MATCH = "len(list_filter(list_zip({a}, {b}), t -> t[1] = t[2]))"

ORACLE["q135_incremental_curation"] = (
    "WITH snap_b AS (\n"
    f"    SELECT doc_id, CASE WHEN doc_id % {_SNAP_E} = 0\n"
    "                        THEN text || ' rev2' ELSE text END AS text\n"
    f"    FROM documents WHERE doc_id % {_SNAP_B} <> 0),\n"
    f"delta AS (SELECT * FROM snap_b WHERE doc_id % {_SNAP_A} = 0 OR doc_id % {_SNAP_E} = 0),\n"
    f"standing AS (SELECT * FROM snap_b WHERE doc_id % {_SNAP_A} <> 0 AND doc_id % {_SNAP_E} <> 0),\n"
    f"s1 AS (SELECT * FROM delta WHERE doc_id % {DECON_HOLDOUT_MOD} <> 0),\n"
    "s2 AS (SELECT doc_id FROM\n"
    "       (SELECT md5(text) AS h, min(doc_id) AS doc_id FROM s1 GROUP BY 1) k\n"
    "       WHERE h NOT IN (SELECT md5(text) FROM standing)),\n"
    "s2docs AS (SELECT s2.doc_id, snap_b.text FROM s2 JOIN snap_b USING (doc_id)),\n"
    "dsig AS (" + _duck_per_doc_sig_over("s2docs") + "),\n"
    "ssig AS (" + _duck_per_doc_sig_over("standing") + "),\n"
    f"dband AS (SELECT doc_id, sig, unnest([{_DUCK_BANDS}]) AS band_key FROM dsig),\n"
    f"sband AS (SELECT doc_id, sig, unnest([{_DUCK_BANDS}]) AS band_key FROM ssig),\n"
    "hdup AS (SELECT DISTINCT d.doc_id FROM dband d JOIN sband s USING (band_key)\n"
    f"         WHERE {_Q135_MATCH.format(a='d.sig', b='s.sig')} >= {NEARDUP_MATCH_MIN}),\n"
    "bdup AS (SELECT DISTINCT a.doc_id FROM dband a JOIN dband b\n"
    "         ON a.band_key = b.band_key AND a.doc_id > b.doc_id\n"
    f"         WHERE {_Q135_MATCH.format(a='a.sig', b='b.sig')} >= {NEARDUP_MATCH_MIN}),\n"
    "s3 AS (SELECT doc_id FROM s2\n"
    "       WHERE doc_id NOT IN (SELECT doc_id FROM hdup)\n"
    "         AND doc_id NOT IN (SELECT doc_id FROM bdup)),\n"
    "s4 AS (SELECT s3.doc_id FROM s3 JOIN snap_b USING (doc_id)\n"
    "       WHERE (" + _Q134_QUALITY + ") >= 0.5),\n"
    "ev AS (SELECT DISTINCT shingle FROM ("
    + _duck_shingles_over("documents")
    + f") e WHERE doc_id % {DECON_HOLDOUT_MOD} = 0),\n"
    "s4docs AS (SELECT s4.doc_id, snap_b.text FROM s4 JOIN snap_b USING (doc_id)),\n"
    "contam AS (SELECT doc_id FROM ("
    + _duck_shingles_over("s4docs")
    + ") ds\n"
    "           WHERE shingle IN (SELECT shingle FROM ev)\n"
    f"           GROUP BY doc_id HAVING count(*) >= {DECON_MIN_HITS}),\n"
    "s5 AS (SELECT doc_id FROM s4 WHERE doc_id NOT IN (SELECT doc_id FROM contam)),\n"
    "counts AS (\n"
    "    SELECT 0 AS stage, 'delta_ingested' AS gate,\n"
    "           (SELECT count(*) FROM delta)::bigint AS n_docs\n"
    "    UNION ALL SELECT 1, 'holdout_carveout', (SELECT count(*) FROM s1)::bigint\n"
    "    UNION ALL SELECT 2, 'exact_dedup', (SELECT count(*) FROM s2)::bigint\n"
    "    UNION ALL SELECT 3, 'near_dup', (SELECT count(*) FROM s3)::bigint\n"
    "    UNION ALL SELECT 4, 'quality', (SELECT count(*) FROM s4)::bigint\n"
    "    UNION ALL SELECT 5, 'decontaminated', (SELECT count(*) FROM s5)::bigint)\n"
    "SELECT stage, gate, n_docs,\n"
    "       coalesce(prev - n_docs, 0)::bigint AS n_dropped,\n"
    "       coalesce((prev - n_docs) * 1000000 // nullif(prev, 0), 0)::bigint\n"
    "           AS drop_ppm\n"
    "FROM (SELECT stage, gate, n_docs,\n"
    "             lag(n_docs) OVER (ORDER BY stage) AS prev FROM counts) t\n"
    "ORDER BY stage"
)


# ------------------------------ duplicate-n-gram memorization report (r10)

# the literature window for training-data memorization risk: Lee et al.
# 2022 ("Deduplicating Training Data Makes Language Models Better")
# measure duplication at 50 BPE tokens ≈ whitespace 13-grams; Kandpal
# et al. 2022 tie memorization rate to exactly this duplicated-span
# count. 13 whitespace tokens is the portable stand-in at fixture scale.
MEM_NGRAM_N = 13


def _gram_hash_frame(d: DataFrame) -> DataFrame:
    """(doc_id, h): one row per POSITIONAL MEM_NGRAM_N-gram, hashed to
    the portable 60-bit grid inside the scan projection — the shared
    gram stream of q137 (corpus census) and q139 (per-funnel-stage
    census). The size() predicate runs on the TOKEN array (the q74b
    pushdown lesson: a filter on the derived gram array would inline
    the higher-order transform beneath the tokenize projection)."""
    n = MEM_NGRAM_N
    return (
        d.withColumn("toks", F.split(F.trim(F.col("text")), " +"))
        .filter(F.size("toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(toks) - {n}),"
                    f" i -> concat_ws(' ', slice(toks, i + 1, {n})))"
                )
            ).alias("gram"),
        )
        .select("doc_id", F.expr(_SPARK_H60.format(expr="gram")).alias("h"))
    )


def q137_dup_ngram_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus duplicate-n-gram (memorization-risk) report — for every
    document with ≥ MEM_NGRAM_N tokens: how many of its positional
    13-grams occur MORE THAN ONCE anywhere in the corpus (including
    its own other positions — self-repetition is memorization risk
    too), as an exact count and a ppm rate. This is the metric the
    dedup literature grades training sets on, and the direct
    acceptance test for the q50/q113/q118 dedup funnel: run the
    funnel, re-run this report, the mass in ``n_dup_grams`` is what
    the funnel failed to remove.

    Occurrences are POSITIONAL (not distinct): a doc repeating one
    13-gram five times carries five duplicated positions — distinct
    shingle sets (q52's jaccard) would hide exactly the repetition
    the metric exists to count.

    Scale shape (100 TB): grams never leave the scan as strings — the
    projection hashes each gram to the portable 60-bit grid
    immediately, so the ONLY wide thing shuffled is (doc_id, 8-byte
    hash) × positions ≈ O(corpus tokens). One scan, two shuffles: a
    window count partitioned BY hash (unordered frame — WindowExec
    still plans a LOCAL sort on the 8-byte partition key, spillable
    and rank-free), then the per-doc hash agg with map-side partials.
    The census-then-join alternative re-scans the corpus (Catalyst's
    no-subplan-dedup); the window form reads it once.
    Hash collisions are collision-CONSISTENT across engines
    (the q53 minhash argument: both sides hash the identical string
    with the identical md5-prefix arithmetic), so the oracle matches
    bit-for-bit."""
    grams = _gram_hash_frame(table(spark, sf_dir, "documents"))
    w = Window.partitionBy("h")
    return (
        grams.withColumn("c", F.count(F.lit(1)).over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("bigint").alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            F.expr("n_dup_grams * 1000000 div n_grams").alias("dup_ppm"),
        )
        .orderBy("doc_id")
    )


QUERIES["q137_dup_ngram_report"] = q137_dup_ngram_report

ORACLE["q137_dup_ngram_report"] = f"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
        FROM documents),
    grams AS (
        SELECT doc_id, {_DUCK_H60.format(expr="g")} AS h FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(toks) - {MEM_NGRAM_N - 1}),
                       i -> array_to_string(toks[i:i+{MEM_NGRAM_N - 1}], ' '))) AS g
            FROM toks WHERE len(toks) >= {MEM_NGRAM_N}) q),
    c AS (SELECT doc_id, count(*) OVER (PARTITION BY h) AS cnt FROM grams)
    SELECT doc_id,
           count(*)::bigint AS n_grams,
           sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)::bigint AS n_dup_grams,
           (sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) * 1000000
               // count(*))::bigint AS dup_ppm
    FROM c GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------- padded-batch manifest (dynamic batching, r10)

PAD_QUANTUM = 32       # pad lengths up to the next multiple (kernel-friendly)
BATCH_TOKENS = 4096    # padded-token budget per training batch
BATCH_SHARDS = 8       # deterministic shard fan-out per length bucket


def q138_padded_batch_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch manifest with padding-efficiency stats —
    the dynamic-batching step between sharding (q136) and the training
    loader: every document pads up to the next PAD_QUANTUM multiple,
    docs of one padded length fill fixed-capacity batches
    (``BATCH_TOKENS div padded_len`` docs each; an over-budget doc
    gets a batch of its own), and the manifest reports, per batch,
    the doc count, padded vs real token sums, and the padding waste
    in ppm — the number a loader tunes PAD_QUANTUM/BATCH_TOKENS
    against (naive max-length padding wastes 30-60%; length-bucketed
    batching is the standard fix).

    Determinism & scale: batch membership must be reproducible
    without a global sort, so docs spray into BATCH_SHARDS
    deterministic shards per length bucket (portable 60-bit hash of
    doc_id — content-addressed like q99/q117) and enumeration is
    row_number within (padded_len, shard) ordered by doc_id — the
    q115 salted-window shape: no single reducer ever sees more than
    its shard of one bucket, and shard count scales with the cluster.
    One 2-column scan, one window shuffle on the (bounded-cardinality
    bucket, shard) key, one hash agg. All arithmetic is exact
    integers, so the oracle matches bit-for-bit."""
    q, budget, shards = PAD_QUANTUM, BATCH_TOKENS, BATCH_SHARDS
    d = table(spark, sf_dir, "documents")
    base = (
        d.select(
            "doc_id",
            F.size(F.split(F.trim(F.col("text")), " +")).cast("bigint").alias("n_tokens"),
        )
        .withColumn("padded_len", F.expr(f"((n_tokens + {q - 1}) div {q}) * {q}"))
        .withColumn(
            "shard",
            (F.expr(_SPARK_H60.format(expr="cast(doc_id as string)")) % shards).cast("int"),
        )
        .withColumn("cap", F.expr(f"greatest(1L, {budget} div padded_len)"))
    )
    w = Window.partitionBy("padded_len", "shard").orderBy("doc_id")
    return (
        base.withColumn("batch_idx", F.expr(f"(row_number() OVER (PARTITION BY padded_len, shard ORDER BY doc_id) - 1) div cap").cast("bigint"))
        .groupBy("padded_len", "shard", "batch_idx")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("count(1) * first(padded_len)").alias("padded_tokens"),
            F.sum("n_tokens").alias("real_tokens"),
        )
        .select(
            "padded_len",
            "shard",
            "batch_idx",
            "n_docs",
            "padded_tokens",
            "real_tokens",
            F.expr(
                "(padded_tokens - real_tokens) * 1000000 div padded_tokens"
            ).alias("waste_ppm"),
        )
        .orderBy("padded_len", "shard", "batch_idx")
    )


QUERIES["q138_padded_batch_manifest"] = q138_padded_batch_manifest

ORACLE["q138_padded_batch_manifest"] = f"""
    WITH t AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), ' +'))::bigint AS n_tokens
        FROM documents),
    b AS (
        SELECT doc_id, n_tokens,
               ((n_tokens + {PAD_QUANTUM - 1}) // {PAD_QUANTUM}) * {PAD_QUANTUM}
                   AS padded_len,
               ({_DUCK_H60.format(expr="doc_id::varchar")} % {BATCH_SHARDS})::int
                   AS shard
        FROM t),
    r AS (
        SELECT *,
               greatest(1, {BATCH_TOKENS} // padded_len) AS cap,
               row_number() OVER (PARTITION BY padded_len, shard
                                  ORDER BY doc_id) AS rn
        FROM b)
    SELECT padded_len, shard, ((rn - 1) // cap)::bigint AS batch_idx,
           count(*)::bigint AS n_docs,
           (count(*) * padded_len)::bigint AS padded_tokens,
           sum(n_tokens)::bigint AS real_tokens,
           ((count(*) * padded_len - sum(n_tokens)) * 1000000
               // (count(*) * padded_len))::bigint AS waste_ppm
    FROM r GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------- funnel acceptance (dup-mass audit, r10)

def q139_funnel_acceptance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel ACCEPTANCE report — q137's duplicate-13-gram metric
    measured at every stage of q134's curation funnel: per gate, the
    surviving doc count plus the positional-gram census and duplicated
    mass WITHIN the surviving subcorpus. This is the number that
    grades the funnel: exact_dedup should erase whole-copy gram mass,
    near_dup the near-copy tail, and whatever ``n_dup_grams`` remains
    at stage 5 is the corpus's residual memorization risk — a
    driver-visible frame, not a paper claim.

    The stage spines restate q134's gates expression-for-expression
    (q134 itself is frozen this round, so it cannot be refactored to
    share code without forfeiting its window slot); the restatement
    cannot drift because the planted test pins this report's per-stage
    ``n_docs`` equal to q134's and its stage-0 census equal to q137's
    totals. The oracle DOES share q134's stage CTEs verbatim
    (_Q134_STAGE_CTES — the assembled q134 string stayed
    byte-identical through the split).

    Scale shape (r10 rewrite, output byte-identical — gated by the
    strict q139 oracle at all three SFs and the q134/q137 cross-pins
    in tests/test_text.py): the r9 form ran SIX window censuses, each
    semi-joining a re-derived gram stream against a re-derived stage
    spine — Catalyst plans shared subtrees once per use, so s5's
    census re-planned s4's whole chain, s4's re-planned s3's, …: 52
    corpus FileScans, 128 exchanges, and six window sorts over the
    gram stream in one returned plan (plans/r10/*_before.txt),
    measured 9.3 s at sf0.1. The rewrite computes the same numbers
    with ONE pass over the gram stream and NO window:

    * the stage spines (pinned narrow doc_id frames — io.materialize,
      the q124/q125/q135 shared-subtree fix; each stage chain runs
      once from the previous pin) fold into a per-doc ``stage_max``
      flag frame: the stages are nested by construction, so the
      highest surviving gate fully encodes membership in every gate;
    * the gram stream (_gram_hash_frame — only 8-byte hashes leave
      the scan) is derived ONCE, joins the flag frame on doc_id, and
      ONE hash aggregation per gram hash produces the six per-stage
      occurrence counts cnt_i = Σ(stage_max ≥ i) — map-side partials
      collapse the shuffle to distinct-hash rows (the window form
      shuffled and SORTED every gram row six times);
    * per stage, n_grams = Σ_h cnt_i and n_dup_grams = Σ_h cnt_i·
      [cnt_i > 1] (a gram row is duplicated within stage i iff its
      hash occurs more than once among stage-i survivors — exactly
      the window-count predicate), so one more one-row aggregation
      plus the six spine counts assembles the report."""
    from .io import materialize
    d = table(spark, sf_dir, "documents")
    # --- q134's stage spines, restated (see docstring). Pins are
    # placed where a subtree would otherwise re-run per use AND costs
    # a corpus pass: s2 (feeds the candidate restriction, s3 and the
    # flag frame), s4 (feeds s5 and the flag frame), and the final
    # flag frame (read by the census and the n_docs agg). s1 needs no
    # frame at all — holdout membership is a pure doc_id expression —
    # and s3/s5 are cheap derivations of pinned parents (an anti-join
    # against a driver-sized frame resp. the q48 verdict), left lazy
    # so construction stays a handful of jobs. ---
    s1 = d.filter(F.col("doc_id") % DECON_HOLDOUT_MOD != 0)
    # the q48 contamination verdict is independent of the dedup chain:
    # overlap its (pinned) evaluation with the s2 → candidates →
    # components jobs from a driver thread (guide-§2.6 back-fill —
    # actions are only sequential because the driver calls them
    # sequentially), instead of paying it serially inside the flag
    # frame's pin
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as pool:
        contaminated_fut = pool.submit(
            lambda: materialize(
                q48_decontaminate(spark, sf_dir)
                .filter(F.col("contaminated"))
                .select("doc_id")
            )
        )
        s2 = materialize(
            s1.groupBy(F.md5(F.col("text")).alias("h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        pairs = (
            q54_minhash_candidates(spark, sf_dir)
            .filter(F.col("est_jaccard") >= 0.5)
            .join(s2.withColumnRenamed("doc_id", "doc_a"), "doc_a")
            .join(s2.withColumnRenamed("doc_id", "doc_b"), "doc_b")
            .select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        )
        comps = connected_components(pairs)
        contaminated = contaminated_fut.result()
    s3 = s2.join(
        comps.filter(F.col("doc_id") != F.col("component")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    toks = F.split(F.trim(F.col("text")), " +")
    n_tokens = F.size(toks)
    quality = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.size(F.array_distinct(toks)) / n_tokens)
        + 0.3 * F.least(
            F.length(F.regexp_replace(F.trim(F.col("text")), " +", "")) / n_tokens / F.lit(10.0),
            F.lit(1.0),
        )
    )
    s4 = materialize(
        s3.join(d, "doc_id")
        .withColumn("quality", quality)
        .filter(F.col("quality") >= 0.5)
        .select("doc_id")
    )
    s5 = s4.join(contaminated, "doc_id", "left_anti")

    # per-doc stage_max: nested gates ⇒ the highest surviving stage
    # encodes membership in every stage (stage_max ≥ i ⇔ doc ∈ s_i);
    # stage 1 is the inline holdout predicate, no join needed
    spines = [(2, s2), (3, s3), (4, s4), (5, s5)]
    flags = d.select(
        "doc_id", (F.col("doc_id") % DECON_HOLDOUT_MOD != 0).alias("in1")
    )
    for i, sp in spines:
        flags = flags.join(
            sp.select("doc_id", F.lit(True).alias(f"in{i}")), "doc_id", "left"
        )
    stage_max = F.when(F.col("in1"), 1).otherwise(0)
    for i, _ in spines:
        stage_max = F.when(F.col(f"in{i}"), i).otherwise(stage_max)
    flags = materialize(flags.select("doc_id", stage_max.alias("stage_max")))

    # one gram pass, one hash agg per gram hash: cnt_i = occurrences
    # of this hash among stage-i survivors
    per_h = (
        _gram_hash_frame(d)
        .join(flags, "doc_id")
        .groupBy("h")
        .agg(
            *[
                F.sum(F.when(F.col("stage_max") >= i, 1).otherwise(0)).alias(f"c{i}")
                for i in range(6)
            ]
        )
    )
    census = per_h.agg(
        *[F.sum(F.col(f"c{i}")).alias(f"g{i}") for i in range(6)],
        *[
            F.sum(F.when(F.col(f"c{i}") > 1, F.col(f"c{i}")).otherwise(0)).alias(f"d{i}")
            for i in range(6)
        ],
    )
    n_docs = flags.agg(
        *[
            F.coalesce(F.sum(F.when(F.col("stage_max") >= i, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(f"n{i}")
            for i in range(6)
        ]
    )
    gates = [
        "ingested",
        "holdout_carveout",
        "exact_dedup",
        "near_dup",
        "quality",
        "decontaminated",
    ]
    stack = ", ".join(
        f"{i}, '{gate}', n{i}, coalesce(g{i}, 0L), coalesce(d{i}, 0L)"
        for i, gate in enumerate(gates)
    )
    return (
        census.crossJoin(n_docs)
        .select(
            F.expr(
                f"stack(6, {stack}) AS (stage, gate, n_docs, n_grams, n_dup_grams)"
            )
        )
        .select(
            "stage",
            "gate",
            "n_docs",
            "n_grams",
            "n_dup_grams",
            F.coalesce(
                F.expr("n_dup_grams * 1000000 div nullif(n_grams, 0)"), F.lit(0)
            ).alias("dup_ppm"),
        )
        .orderBy("stage")
    )


QUERIES["q139_funnel_acceptance"] = q139_funnel_acceptance

ORACLE["q139_funnel_acceptance"] = (
    _Q134_STAGE_CTES
    + f"""grams AS (
        SELECT doc_id, {_DUCK_H60.format(expr="g")} AS h FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, len(toks) - {MEM_NGRAM_N - 1}),
                       i -> array_to_string(toks[i:i+{MEM_NGRAM_N - 1}], ' '))) AS g
            FROM (SELECT doc_id, string_split_regex(trim(text), ' +') AS toks
                  FROM documents) t
            WHERE len(toks) >= {MEM_NGRAM_N}) q),
"""
    + "".join(
        f"""stat{i} AS (
        SELECT count(*)::bigint AS n_grams,
               coalesce(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END), 0)::bigint AS n_dup_grams
        FROM (SELECT count(*) OVER (PARTITION BY h) AS cnt
              FROM grams WHERE doc_id IN (SELECT doc_id FROM {src})) q),
"""
        for i, src in [(0, "documents"), (1, "s1"), (2, "s2"), (3, "s3"), (4, "s4"), (5, "s5")]
    )
    + """rows AS (
    SELECT 0 AS stage, 'ingested' AS gate,
           (SELECT count(*) FROM documents)::bigint AS n_docs,
           (SELECT n_grams FROM stat0) AS n_grams,
           (SELECT n_dup_grams FROM stat0) AS n_dup_grams
    UNION ALL SELECT 1, 'holdout_carveout', (SELECT count(*) FROM s1)::bigint,
           (SELECT n_grams FROM stat1), (SELECT n_dup_grams FROM stat1)
    UNION ALL SELECT 2, 'exact_dedup', (SELECT count(*) FROM s2)::bigint,
           (SELECT n_grams FROM stat2), (SELECT n_dup_grams FROM stat2)
    UNION ALL SELECT 3, 'near_dup', (SELECT count(*) FROM s3)::bigint,
           (SELECT n_grams FROM stat3), (SELECT n_dup_grams FROM stat3)
    UNION ALL SELECT 4, 'quality', (SELECT count(*) FROM s4)::bigint,
           (SELECT n_grams FROM stat4), (SELECT n_dup_grams FROM stat4)
    UNION ALL SELECT 5, 'decontaminated', (SELECT count(*) FROM s5)::bigint,
           (SELECT n_grams FROM stat5), (SELECT n_dup_grams FROM stat5))
SELECT stage, gate, n_docs, n_grams, n_dup_grams,
       coalesce(n_dup_grams * 1000000 // nullif(n_grams, 0), 0)::bigint AS dup_ppm
FROM rows ORDER BY stage"""
)
