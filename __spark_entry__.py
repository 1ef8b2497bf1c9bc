"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator inventory
(SURVEY.md §2) with DuckDB-oracle SQL for everything SQL-expressible.

Driver-window rotation policy
-----------------------------
The driver's correctness gate checks only the FIRST 50 ``queries()``
entries; the full inventory is 152 (147 at the r5 freeze + the 5 r6
additions).  Policy: stalest-first — every window is filled in order
of how long a query has gone without a driver row (never-checked
first, then oldest round), with two overrides: queries whose code OR
oracle changed this round and queries added this round always
re-enter immediately.

r6 additionally attacks the debt STRUCTURALLY (the r5 verdict's item
3): ``engine/rotation.py`` folds 25 frozen single-pass relational
shapes into 4 composite queries — each a UNION ALL of the member
plans with a ``shape`` discriminator, its oracle the UNION ALL of the
very same member oracles — so ONE driver slot re-proves every
member's machinery each round.  A singleton may therefore defer only
if its composite is in-window (asserted by the guard test); the
singletons keep their own unweakened oracles for their direct turns.

Window history: r1 relational+sampling head (q25/q29/q33 red, fixed
r2); r2 all 45 non-relational + 5 canary (50/50 green); r3 the 46
relational without an r2 row + 4 changed (50/50); r4 the 8
never-checked + 15 added + 3 changed + the non-relational block
(50/50; 18 deferred); r5 the 19 stalest + 25 added + 6 changed
(49/50: ml_fpgrowth_baskets' array column broke the driver
canonicalizer — fixed this round by emitting the canonical string).

* r6 window, 50 slots exactly:
  - ``_R6_STALEST`` (4): the last r2-green entries — q33/q95/q29
    (displaced from r5 by the late additions q112–q114) and q89
    (displaced by changed-code q97).
  - ``_R6_NEVER_CHECKED`` (3): the r5 post-freeze additions
    q115/q116/q117 — oracle-backed + parity-tested in-suite since r5,
    leading the window exactly as promised.  (q116's oracle also got
    an association fix this round: idf * (num/den) now parenthesized
    to mirror Spark's grouping bit-for-bit.)
  - ``_NEW_IN_R6`` (5): the four rotation composites
    (rot_scalar_shapes / rot_agg_shapes / rot_window_shapes /
    rot_order_setop_shapes, strict-green at sf0.001/0.01/0.1) and
    packing_invariants_report (q49b's greedy-packing invariants as a
    driver-visible rows-only surface — the r5 verdict's item 5).
  - ``_CHANGED_IN_R6`` (16): the r5 post-freeze fixes re-entering as
    changed code — q67 (ANSI divide-by-zero on empty docs), q47
    (timestamp-tie total order), q93 (total max_by key; this round
    also biased +2^63 so the encoding is total over pre-epoch
    timestamps and negative ids — the r5 ADVICE), q100 (empty funnel
    base), q60 (zero-norm exclusion in _corpus_normed), q72
    (oracle-only tie fix) — plus this round's changes:
    ml_fpgrowth_baskets (canonical-string items, the one red r5 row),
    q65/q75/q76/q76b (the r5 ADVICE: quantizer-backed ops now route
    their corpus through _corpus_finite, so a zero/NaN/Inf embedding
    can no longer out-rank real neighbors or merge dedup components),
    dedup_recall_report (truth leg now content-addressed-sampled
    above a doc budget + sample_docs column — verdict item 4), and
    q19/q20/q26 (oracle HAVING count(*) > 0 pinning the grouping
    family's empty-input semantics — found by the new relational
    fuzzer), and q23 (try_cast hardening: a malformed/non-numeric
    props value crashed the bare int cast under ANSI — same fuzzer;
    re-enters directly, displacing composite-covered q92).
    q21/q24's oracle-side fuzzer fixes are instead re-proven via
    their in-window composites (``_CHANGED_VIA_COMPOSITE_R6``).
  - ``_R6_ROTATION`` (22): every deferred entry NOT covered by an
    in-window composite — the join spine (q01/q02/q04/q06–q10,
    q28 asof, q81 range, q35 cross), the window spine (q11/q13/q31),
    sketches (q30/q83/q96), agg/misc (q18/q82/q39/q98/q99).
  - ``_DEFERRED_TO_R7`` (19): frozen r3-green single-pass singletons,
    EVERY one a member of an in-window composite this round
    (q03/q12/q14–q17/q21/q22/q24/q27/q32/q34/q36/q86–q88/q90–q92,
    minus q23 which re-entered directly with its try_cast change):
    their machinery is re-proven via the rot_* hash rows, and they
    lead r7 for their direct rows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from engine import multimodal, pipeline, relational, rotation, sampling, sqlapi, stats, similarity, streaming, text, text_ml, tuning, udfs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (revenue by nation) on /root/testdata/sf0.001."""
    return relational.q02_revenue_by_nation(spark, "/root/testdata/sf0.001")


def _modules():
    return [text, similarity, multimodal, streaming, stats, sampling, sqlapi, udfs, text_ml, tuning, pipeline, relational, rotation]


# The last r2-green entries — the stalest class, leads the window
# unconditionally (q33/q95/q29 were displaced from r5 by the late
# additions q112-q114; q89 by changed-code q97).
_R6_STALEST = [
    "q33_collect_sorted",
    "q95_variant_shred",
    "q29_map_array_funcs",
    "q89_fuzzy_match",
]

# Added after the r5 window froze — never driver-checked; they lead
# with the stalest class exactly as the r5 docstring promised.
_R6_NEVER_CHECKED = [
    "q115_source_quota_cap",   # per-source quota cap (two-phase salted top-K)
    "q116_bm25_topk",          # Okapi BM25 retrieval (integer-grid scores)
    "q117_weighted_sample",    # A-ES weighted sampling without replacement
]

# Queries ADDED in round 6 — enter immediately.
_NEW_IN_R6 = [
    "rot_scalar_shapes",       # composite: q21/q22/q23/q24/q29/q34/q95
    "rot_agg_shapes",          # composite: q19/q20/q27/q32/q90/q91
    "rot_window_shapes",       # composite: q12/q36/q88/q92
    "rot_order_setop_shapes",  # composite: q03/q14/q15/q16/q17/q33/q86/q87
    "packing_invariants_report",  # q49b greedy-packing invariants, driver-visible
]

# Queries whose implementation OR oracle changed since the r5 window
# froze — re-enter regardless of rotation parity (see the module
# docstring for what changed in each).
_CHANGED_IN_R6 = [
    "ml_fpgrowth_baskets",     # canonical-string items (the one red r5 row)
    "q67_token_counting",      # r5 post-freeze: ANSI div-by-zero on empty docs
    "q47_scd2_assembly",       # r5 post-freeze: timestamp-tie total order
    "q93_keep_latest",         # r5 post-freeze tie key; r6: +2^63 bias (full int64 domain)
    "q100_funnel",             # r5 post-freeze: empty funnel base
    "q60_knn_brute",           # r5 post-freeze: zero-norm exclusion (_corpus_normed)
    "q72_stream_sessions",     # r5 post-freeze: oracle-only tie fix
    "q65_knn_ivf",             # r6: _corpus_finite guard (r5 ADVICE)
    "q75_semantic_dedup",      # r6: _corpus_finite guard (r5 ADVICE)
    "q76_pq_ann",              # r6: _corpus_finite guard
    "q76b_ivfpq_ann",          # r6: _corpus_finite guard
    "dedup_recall_report",     # r6: sampled truth leg + sample_docs column
    "q19_rollup",              # r6: oracle HAVING (empty-input semantics pinned)
    "q20_cube",                # r6: oracle HAVING (empty-input semantics pinned)
    "q26_grouping_sets",       # r6: oracle HAVING (empty-input semantics pinned)
    "q23_json_funcs",          # r6: try_cast hardening (ANSI crash on malformed props)
]

# Changed this round but re-proven VIA an in-window composite instead
# of a direct slot (the one policy extension the composites enable):
# each is a member of an in-window rot_* query whose Spark side CALLS
# the singleton's function and whose oracle EMBEDS the singleton's
# oracle, so the changed code+oracle still earns a driver hash row
# this round; the direct row follows in r7 with the deferred block.
# All are fuzzer finds on hostile inputs (fixture outputs
# byte-identical, strict re-verified): q21's NULL-propagating concat
# (|| not concat()) + regexp_extract NULL-in/no-match split +
# split_part NULL, q24's sqrt(negative) = NaN CASE (both oracle-only),
# and q32's corr rewritten on BOTH sides as covar_pop/nullif(σx·σy,0)
# so a degenerate group yields NULL instead of killing the aggregate.
_CHANGED_VIA_COMPOSITE_R6 = [
    "q21_string_funcs",
    "q24_math_case",
    "q32_stat_aggregates",   # corr as guarded co-moment quotient: the
                             # built-in corr THROWS (ANSI div-by-zero)
                             # on a zero-variance group — fuzzer find
]

# The r5-deferred block, minus the entries already in-window above and
# minus the 19 composite-covered deferrals below: the join spine, the
# window spine, and the sketch family. (The last slot went to q23's
# DIRECT re-entry with its try_cast change — see _CHANGED_IN_R6 —
# which displaced q92 into _DEFERRED_TO_R7; q92 is composite-covered
# this round via the in-window rot_window_shapes.)
_R6_ROTATION = [
    "q28_asof_join",
    "q11_window_rank",
    "q13_window_running_sum",
    "q31_window_range_frame",
    "q04_outer_join_agg",
    "q07_broadcast_join",
    "q08_semi_join",
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q81_range_join",
    "q82_time_rollup",
    "q18_distinct_agg",
    "q10_theta_join",
    "q06_forecast_revenue",
    "q09_anti_join",
    "q30_approx_distinct",
    "q35_cross_join",
    "q39_unpivot",
    "q83_percentiles",
    "q96_hll_sketch_union",
    "q98_embedding_quantize",
    "q99_deterministic_split",
]

# Additions made after THIS round's window froze — the sanctioned
# exception class (r5's q115-q117 pattern): every head slot holds a
# strictly higher-priority entry, so these sit out one round,
# oracle-backed (strict-green at all three SFs) and planted-case /
# recount tested in-suite, and LEAD the r7 window with the deferred
# block.
_POST_FREEZE_ADDITIONS: list[str] = [
    "q118_incremental_neardup",   # near-dup ingest probe vs the standing
                                  # banded-signature store (q102's split,
                                  # q54's bands, integer match threshold)
    "q119_context_budget_report", # context-window fit/split/windows/
                                  # utilization planning report (exact
                                  # bigint arithmetic end to end)
]

# Frozen r3-green single-pass singletons deferred to r7 — every one a
# member of an in-window composite this round (guard-test-asserted),
# so its machinery still gets a driver hash row via rot_*; they lead
# the r7 window for their direct rows.
_DEFERRED_TO_R7 = {
    "q03_top_orders",
    "q12_window_lag",
    "q14_topk_orders",
    "q15_union_all",
    "q16_intersect",
    "q17_except",
    "q21_string_funcs",
    "q22_date_funcs",
    "q24_math_case",
    "q27_pivot",
    "q32_stat_aggregates",
    "q34_date_arithmetic",
    "q36_rank_functions",
    "q86_explode_lateral",
    "q87_null_semantics",
    "q88_value_window_funcs",
    "q90_histogram",
    "q91_filtered_agg",
    "q92_sessionization",
}


def _window_head() -> list[str]:
    """The r6 driver-window head: 4 stalest (r2-row) + 3 never-checked
    + 5 added + 16 changed + 22 rotation — exactly 50 entries."""
    head = _R6_STALEST + _R6_NEVER_CHECKED + _NEW_IN_R6 + _CHANGED_IN_R6 + _R6_ROTATION
    assert len(head) == len(set(head)) == 50
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
