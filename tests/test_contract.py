"""Driver-contract smoke tests (BASELINE.md t1)."""

from __future__ import annotations

import __spark_entry__ as contract


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"n_name", "revenue"}


def test_every_oracle_key_has_query():
    qs, oracles = contract.queries(), contract.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


def test_queries_run_and_have_stable_schema(spark, sf_dir):
    # structural check on a cheap subset: schema is non-empty & named
    qs = contract.queries()
    for name in ("q01_pricing_summary", "q42_census", "q50_dedup_exact"):
        df = qs[name](spark, sf_dir)
        assert df.columns, name


def test_q30_approx_distinct_within_error_bound(spark, sf_dir):
    # q30's HLL++ sketches are configured at 2% rsd; assert the
    # estimates land within 3 sigma of the exact twin counts
    from pyspark.sql import functions as F

    from engine import relational
    from engine.session import table

    approx = relational.q30_approx_distinct(spark, sf_dir).collect()[0]
    exact = (
        table(spark, sf_dir, "lineitem")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()[0]
    )
    assert abs(approx.approx_orders - exact.orders) / exact.orders < 0.06
    assert abs(approx.approx_parts - exact.parts) / exact.parts < 0.06


def test_q83_approx_percentile_twin_within_error(spark, sf_dir):
    # q83b (percentile_approx, accuracy 1000 => rank error <= 0.1%) is
    # the scale-safe contract twin of the exact q83; it must land
    # within 1% relative value error of the exact quartiles (5% at the
    # tail p95) on this data — the invariant backing its rows-only
    # driver entry.
    from engine import relational

    exact = {r.l_returnflag: r for r in relational.q83_percentiles(spark, sf_dir).collect()}
    approx = {
        r.l_returnflag: r
        for r in relational.q83b_percentiles_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        for col in ("p25_price", "median_price", "p75_price"):
            assert abs(a[col] - e[col]) / e[col] < 0.01, (flag, col)
        assert abs(a.p95_qty - e.p95_qty) / e.p95_qty < 0.05


def test_sketch_error_report_all_within_bound(spark, sf_dir):
    # The driver-visible sketch-error surface: one row per (sketch op,
    # item), each within its documented bound — q30 HLL++ (3 sigma at
    # rsd=0.02), q96 HLL sketch union (lgK=12 default), q83b approx
    # percentiles (accuracy=1000). The report IS the invariant the
    # three rows-only entries previously only carried in-suite.
    from engine.relational import SKETCH_BOUNDS, sketch_error_report

    rows = sketch_error_report(spark, sf_dir).collect()
    assert {r.op for r in rows} == set(SKETCH_BOUNDS)
    # every sketch family contributes, including the merged-union row
    assert any(r.op == "hll_union" and r.item == "ALL" for r in rows)
    assert sum(r.op == "approx_count_distinct" for r in rows) == 2
    assert sum(r.op == "percentile_approx" for r in rows) == 12
    for r in rows:
        assert r.within_bound, (r.op, r.item, r.rel_err, r.bound)
        assert r.bound == SKETCH_BOUNDS[r.op]


def _correctness_artifacts(repo: str, max_round: int) -> list[str]:
    """Paths of CORRECTNESS_r*.json with round number ≤ max_round.
    Parsed numerically (r9 ADVICE): the old r0[1-8] character-class
    glob silently stopped matching at r10+, so the frozen-round pin is
    stated once here as a comparison, not a pattern."""
    import glob
    import os
    import re

    out = []
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", os.path.basename(p))
        if m and int(m.group(1)) <= max_round:
            out.append(p)
    return sorted(out)


# The round whose board existed when THIS window froze. Bump when the
# window is rebuilt for a new round.
_FROZEN_ROUND = 9


def test_driver_window_covers_unproven_queries():
    # The driver's correctness gate checks only the FIRST 50 queries()
    # entries. Rotation policy (see __spark_entry__ docstring,
    # stalest-first with changed/new overrides): the r10 window leads
    # with the two promises (q136 first row, q100_funnel direct
    # graduate), then the 4 changed entries, the 27 r4-stale direct
    # rotations, the 6 r8-row composites, the 3 NEW composites, and
    # the 8 r8-row entries nothing can carry.
    #
    # BOOKKEEPING RULE (r8 verdict item 3): every assertion about
    # "proven" rows is pinned to the artifacts that existed when THIS
    # window froze (≤ _FROZEN_ROUND) — re-globbing every artifact
    # would self-expire the moment the driver writes this round's
    # board, which by design proves this window's own leads.
    import json

    import os

    names = list(contract.queries())[:50]
    head = contract._window_head()
    assert names == head, "driver window does not match the declared head"
    assert len(head) == 50
    # The promised leads occupy the head outright, in order.
    assert names[:2] == contract._LEADS_R10
    assert contract._LEADS_R10 == (
        contract._POST_FREEZE_ADDITIONS_R9 + contract._DEFERRED_GRADUATE_TO_R10
    )
    # New/changed queries are in-window.
    for q in contract._NEW_IN_R10 + contract._CHANGED_IN_R10:
        assert q in names, q
    from engine import rotation

    covered = {
        m
        for comp, members in rotation.ROTATIONS.items()
        if comp in names
        for m in members
    }
    # Rows-only machinery-carriers: an in-window report that CALLS a
    # rows-only entry covers it the way a composite covers a member.
    # Soundness of the registry itself is pinned by
    # test_report_calls_registry_is_live below.
    report_covered = {
        callee
        for report, callees in contract._REPORT_CALLS.items()
        if report in names
        for callee in callees
    }
    # Changed-via-caller soundness: the in-window caller runs them;
    # they hold no direct slot.
    assert set(contract._CHANGED_VIA_CALLER_R10) <= report_covered
    assert not (set(contract._CHANGED_VIA_CALLER_R10) & set(names))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proven_at_freeze = set()
    for p in _correctness_artifacts(repo, _FROZEN_ROUND):
        proven_at_freeze |= set(json.load(open(p)))
    # Generic never-checked guard: any inventory entry with NO row in
    # any at-freeze artifact must be in-window this round or be a
    # declared post-freeze addition of THIS round (the sanctioned
    # sit-out-one-round class — it leads the next window).
    never_checked = set(contract.queries()) - proven_at_freeze
    post_freeze = set(contract._POST_FREEZE_ADDITIONS_R10)
    assert not (post_freeze & set(head))
    assert never_checked <= set(head) | post_freeze, sorted(
        never_checked - set(head) - post_freeze
    )
    # THE claim: every contract query has a driver row at most ONE
    # round old, direct or carried — in-window, covered by an
    # in-window composite or calling report, or checked last round
    # (directly or as a member of a last-round composite).
    last_round = set(
        json.load(open(os.path.join(repo, f"CORRECTNESS_r{_FROZEN_ROUND:02d}.json")))
    )
    covered_last_round = last_round | {
        m
        for comp, members in rotation.ROTATIONS.items()
        if comp in last_round
        for m in members
    }
    uncovered = (
        set(contract.queries())
        - set(head)
        - covered
        - report_covered
        - covered_last_round
        - post_freeze
    )
    assert not uncovered, sorted(uncovered)
    # Displaced-direct honesty: every entry whose direct row keeps
    # aging this round is machinery-covered in-window or last round.
    assert set(contract._DISPLACED_DIRECT_TO_R11) <= covered | covered_last_round
    # Lead honesty: the post-freeze lead was added after the r9
    # freeze, so it has no row in the r01-r08 artifacts; its first row
    # is the r9 board's or this window's.
    pre_freeze = set()
    for p in _correctness_artifacts(repo, _FROZEN_ROUND - 1):
        pre_freeze |= set(json.load(open(p)))
    for q in contract._POST_FREEZE_ADDITIONS_R9:
        assert q not in pre_freeze, q


def test_report_calls_registry_is_live(spark, sf_dir, monkeypatch):
    """_REPORT_CALLS soundness: each registered report must actually
    INVOKE its callees when it runs (else 'covered via calling report'
    would be an empty claim). sketch/ann are checked dynamically with
    counting shims (the reports resolve callees from module globals —
    or the ANN_RECALL_TIERS registry — at call time; building the
    frame triggers the calls). stream_equivalence_report's callees run
    inside real readStream pipelines (minutes, already exercised by
    test_streaming), so its edge is pinned statically against the pair
    builder's source."""
    import inspect

    import __spark_entry__ as c
    from engine import relational, similarity, streaming

    qs = c.queries()

    src = inspect.getsource(streaming._stream_eq_pair)
    for cal in c._REPORT_CALLS["stream_equivalence_report"]:
        assert cal in src, f"_stream_eq_pair no longer calls {cal}"

    mod_of = {
        "q30_approx_distinct": relational,
        "q96_hll_sketch_union": relational,
        "q60_knn_brute": similarity,
        "q61_knn_lsh_bucketed": similarity,
        "q65_knn_ivf": similarity,
        "q76_pq_ann": similarity,
        "q76b_ivfpq_ann": similarity,
        "q62_brp_lsh_join": similarity,
    }
    for report in ("sketch_error_report", "ann_recall_report"):
        callees = c._REPORT_CALLS[report]
        seen: dict[str, int] = {}
        for callee in callees:
            mod = mod_of[callee]
            real = getattr(mod, callee)

            def shim(*a, _real=real, _name=callee, _seen=seen, **kw):
                _seen[_name] = _seen.get(_name, 0) + 1
                return _real(*a, **kw)

            monkeypatch.setattr(mod, callee, shim)
            for tier, fn in list(similarity.ANN_RECALL_TIERS.items()):
                if fn is real:  # the registry captured the original
                    monkeypatch.setitem(similarity.ANN_RECALL_TIERS, tier, shim)
        qs[report](spark, sf_dir)
        missing = [cal for cal in callees if not seen.get(cal)]
        assert not missing, f"{report} never called {missing}"


def test_q96_hll_sketch_estimates_within_error(spark, sf_dir):
    # mergeable-sketch estimates (per type + unioned global) must land
    # within 5% of exact distinct counts
    from pyspark.sql import functions as F

    from engine import relational
    from engine.session import load_events

    approx = {
        r.event_type: r.approx_users
        for r in relational.q96_hll_sketch_union(spark, sf_dir).collect()
    }
    e = load_events(spark, sf_dir)
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact["ALL"] = e.agg(F.countDistinct("user_id").alias("n")).collect()[0].n
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, k


def test_strict_oracle_smoke_on_flake_classes(spark, monkeypatch):
    """Bit-exact (driver hash-gate) comparison at sf0.001 for the three
    queries that exercise each historical cross-engine float-flake
    class: q25 (order-dependent avg -> decimal sum fix), q57
    (round-tie semantics -> trunc6 fix), q66 (normalized cosine
    chain). The full strict run lives in tools/oracle_check.py; this
    guards the classes on every pytest run."""
    import os

    import duckdb

    import tools.oracle_check as oc

    monkeypatch.setenv("SPARK_GRAFT_STRICT", "1")
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in oc.TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"create view {t} as select * from read_parquet('{p}')")
    qs, oracles = contract.queries(), contract.oracle_sql()
    for name in ("q25_correlated_subquery", "q57_quality_score", "q66_embedding_near_dup"):
        sdf = qs[name](spark, sf).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        err = oc._values_match(oc._normalize(sdf), oc._normalize(odf))
        assert err is None, f"{name}: {err}"


def test_every_oracle_sql_parses_in_duckdb():
    """Fast syntax gate: every oracle_sql() string must at least PLAN
    in DuckDB against the fixture views — catches SQL typos / dialect
    drift in seconds instead of at the 10-minute full-mirror run."""
    import os

    import duckdb

    import __spark_entry__ as contract

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = []
    for name, sql in contract.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 - collecting all parse errors
            failures.append(f"{name}: {e}")
    assert not failures, "\n".join(failures)


def test_funnel_requires_stage_order(spark, tmp_path):
    """q100 semantics on planted journeys: stages only count when
    reached IN ORDER — a user who clicks before ever viewing is not a
    click-stage user, and a purchase before the click doesn't reach
    stage 3."""
    import datetime as dt

    from pyspark.sql import Row

    from engine.relational import q100_funnel

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        # u1: full ordered journey
        Row(event_id=1, ts=t(1), user_id=1, event_type="view", value=1.0, props="{}"),
        Row(event_id=2, ts=t(2), user_id=1, event_type="click", value=1.0, props="{}"),
        Row(event_id=3, ts=t(3), user_id=1, event_type="purchase", value=1.0, props="{}"),
        # u2: click BEFORE view -> stalls at view stage
        Row(event_id=4, ts=t(1), user_id=2, event_type="click", value=1.0, props="{}"),
        Row(event_id=5, ts=t(2), user_id=2, event_type="view", value=1.0, props="{}"),
        # u3: view then purchase (no click) -> stalls at view stage
        Row(event_id=6, ts=t(1), user_id=3, event_type="view", value=1.0, props="{}"),
        Row(event_id=7, ts=t(2), user_id=3, event_type="purchase", value=1.0, props="{}"),
        # u4: view, click, but purchase BEFORE the click -> stalls at click
        Row(event_id=8, ts=t(1), user_id=4, event_type="view", value=1.0, props="{}"),
        Row(event_id=9, ts=t(2), user_id=4, event_type="purchase", value=1.0, props="{}"),
        Row(event_id=10, ts=t(3), user_id=4, event_type="click", value=1.0, props="{}"),
        # u5: never views -> in no stage
        Row(event_id=11, ts=t(1), user_id=5, event_type="purchase", value=1.0, props="{}"),
    ]
    sf_dir = str(tmp_path / "funnel")
    spark.createDataFrame(rows).write.parquet(sf_dir + "/events.parquet")
    out = {r.stage: r for r in q100_funnel(spark, sf_dir).collect()}
    assert out["view"].n_users == 4       # u1 u2 u3 u4
    assert out["click"].n_users == 2      # u1, u4 (click after view)
    assert out["purchase"].n_users == 1   # u1 only
    assert out["view"].conv_ppm == 1_000_000
    assert out["purchase"].conv_ppm == 250_000


def test_cdc_merge_planted_branches(spark, tmp_path):
    """q112 MERGE semantics on a planted base + changelog: every
    branch of the three-way MERGE plus latest-wins compaction —
    untouched key kept, matched U updates, matched D deletes,
    U-then-D deletes, D-then-U updates (the latest change decides),
    unmatched U inserts, unmatched D is a no-op."""
    from pyspark.sql import Row

    from engine.relational import CDC_BASE_ABSENT_MOD, CDC_DELETE_MOD, q112_cdc_merge

    assert CDC_BASE_ABSENT_MOD == 13 and CDC_DELETE_MOD == 10
    cust = [  # custkeys 13 and 26 are % 13 == 0 -> absent from base
        Row(c_custkey=k, c_name=f"cust-{k}", c_nationkey=0, c_acctbal=100.0 * k,
            c_mktsegment="B")
        for k in (1, 2, 3, 4, 5, 13, 26)
    ]
    ords = [
        # (orderkey=seq, custkey, totalprice); op = D iff seq % 10 == 0
        Row(o_orderkey=11, o_custkey=2, o_orderstatus="O", o_totalprice=222.0,
            o_orderdate=0, o_orderpriority="1"),          # U -> update
        Row(o_orderkey=20, o_custkey=3, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=0, o_orderpriority="1"),          # D -> delete
        Row(o_orderkey=12, o_custkey=4, o_orderstatus="O", o_totalprice=444.0,
            o_orderdate=0, o_orderpriority="1"),          # U then...
        Row(o_orderkey=30, o_custkey=4, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=0, o_orderpriority="1"),          # ...later D -> delete
        Row(o_orderkey=40, o_custkey=5, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=0, o_orderpriority="1"),          # D then...
        Row(o_orderkey=41, o_custkey=5, o_orderstatus="O", o_totalprice=555.0,
            o_orderdate=0, o_orderpriority="1"),          # ...later U -> update
        Row(o_orderkey=51, o_custkey=13, o_orderstatus="O", o_totalprice=131.0,
            o_orderdate=0, o_orderpriority="1"),          # unmatched U -> insert
        Row(o_orderkey=60, o_custkey=26, o_orderstatus="O", o_totalprice=0.0,
            o_orderdate=0, o_orderpriority="1"),          # unmatched D -> no-op
    ]
    sf_dir = str(tmp_path / "cdc")
    spark.createDataFrame(cust).write.parquet(sf_dir + "/customer.parquet")
    spark.createDataFrame(ords).write.parquet(sf_dir + "/orders.parquet")
    out = {r.custkey: r for r in q112_cdc_merge(spark, sf_dir).collect()}
    assert set(out) == {1, 2, 5, 13}  # 3 deleted, 4 U-then-D deleted, 26 no-op
    assert out[1].action == "kept" and out[1].acctbal == 100.0
    assert out[2].action == "updated" and out[2].acctbal == 222.0
    assert out[5].action == "updated" and out[5].acctbal == 555.0
    assert out[13].action == "inserted" and out[13].acctbal == 131.0
    assert out[13].name == "cdc-13"


def test_cdc_merge_random_parity(spark, tmp_path):
    """q112 against an independent plain-Python MERGE fold on a
    seeded random base + changelog (multiple changes per key in
    random seq order): the distributed latest-wins compaction must
    agree with the sequential apply-in-seq-order reference on every
    key, action, and balance."""
    import random

    from pyspark.sql import Row

    from engine.relational import CDC_BASE_ABSENT_MOD, CDC_DELETE_MOD, q112_cdc_merge

    rng = random.Random(112)
    keys = list(range(1, 120))
    base_keys = [k for k in keys if k % CDC_BASE_ABSENT_MOD != 0]
    cust = [
        Row(c_custkey=k, c_name=f"cust-{k}", c_nationkey=0,
            c_acctbal=float(rng.randint(0, 9999)), c_mktsegment="B")
        for k in base_keys
    ]
    seqs = rng.sample(range(1, 5000), 400)
    ords = [
        Row(o_orderkey=s, o_custkey=rng.choice(keys), o_orderstatus="O",
            o_totalprice=float(rng.randint(0, 9999)), o_orderdate=0,
            o_orderpriority="1")
        for s in seqs
    ]
    sf_dir = str(tmp_path / "cdcrand")
    spark.createDataFrame(cust).write.parquet(sf_dir + "/customer.parquet")
    spark.createDataFrame(ords).write.parquet(sf_dir + "/orders.parquet")

    # reference: apply changes key-by-key in ascending seq order
    snap = {r.c_custkey: (r.c_name, r.c_acctbal, "kept") for r in cust}
    for o in sorted(ords, key=lambda o: o.o_orderkey):
        k = o.o_custkey
        if o.o_orderkey % CDC_DELETE_MOD == 0:   # delete
            snap.pop(k, None)
        else:                                    # upsert
            in_base = k % CDC_BASE_ABSENT_MOD != 0
            name = f"cust-{k}" if in_base else f"cdc-{k}"
            snap[k] = (name, o.o_totalprice, "updated" if in_base else "inserted")
    # a key deleted then re-upserted re-enters as an upsert of the
    # LATEST change — same rule both sides; but the reference above
    # re-labels a re-inserted base key "updated", matching q112's
    # name-presence rule (base name survives the full-outer join)

    got = {r.custkey: (r.name, r.acctbal, r.action) for r in q112_cdc_merge(spark, sf_dir).collect()}
    assert got == snap


def test_retention_cohort_math(spark, tmp_path):
    """q101 semantics: cohort = week of first event; every cohort has
    a k=0 row equal to its size; a user active 2 weeks later lands in
    k=2 of their own cohort only."""
    import datetime as dt

    from pyspark.sql import Row

    from engine.relational import q101_retention_cohorts

    # weeks of 2024-01: Mon Jan 1, Mon Jan 8, Mon Jan 15
    rows = [
        Row(event_id=1, ts=dt.datetime(2024, 1, 2), user_id=1, event_type="view", value=1.0, props="{}"),
        Row(event_id=2, ts=dt.datetime(2024, 1, 16), user_id=1, event_type="view", value=1.0, props="{}"),
        Row(event_id=3, ts=dt.datetime(2024, 1, 3), user_id=2, event_type="view", value=1.0, props="{}"),
        Row(event_id=4, ts=dt.datetime(2024, 1, 9), user_id=3, event_type="view", value=1.0, props="{}"),
    ]
    sf_dir = str(tmp_path / "retention")
    spark.createDataFrame(rows).write.parquet(sf_dir + "/events.parquet")
    got = {
        (r.cohort_week.date().isoformat(), r.k): r.n_users
        for r in q101_retention_cohorts(spark, sf_dir).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # u1, u2 first seen week of Jan 1
        ("2024-01-01", 2): 1,  # u1 back two weeks later
        ("2024-01-08", 0): 1,  # u3's own cohort
    }


def test_pagerank_matches_numpy_and_conserves_mass(spark, sf_dir):
    """q108's distributed power iteration must agree with an
    independent dense numpy implementation of the SAME spec (damping
    0.85, 10 rounds, uniform dangling redistribution) to 1e-9 on the
    fixture graph, and total rank mass must be 1."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from engine.relational import (
        PR_DAMPING,
        PR_ITERS,
        PR_OUT_DEGREE,
        PR_TOP,
        q108_crawl_pagerank,
    )
    from engine.session import table

    d = table(spark, sf_dir, "documents").select("doc_id")
    w = Window.orderBy("doc_id")
    nodes = d.select("doc_id", (F.row_number().over(w) - 1).alias("node"))
    n = nodes.count()
    ks = F.explode(F.array(*[F.lit(k) for k in range(PR_OUT_DEGREE)])).alias("k")
    h = (
        "cast(conv(substr(md5(concat('pr:', doc_id, ':', k)), 1, 15), 16, 10) as bigint)"
        f" % {n}"
    )
    edges = [
        (r.src, r.dst)
        for r in nodes.select("doc_id", F.col("node").alias("src"))
        .select("doc_id", "src", ks)
        .withColumn("dst", F.expr(h))
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .collect()
    ]
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(PR_ITERS):
        dangling = r[out_deg == 0].sum()
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += r[s] / out_deg[s]
        r = (1 - PR_DAMPING) / n + PR_DAMPING * dangling / n + PR_DAMPING * contrib
    assert abs(r.sum() - 1.0) < 1e-9

    got = q108_crawl_pagerank(spark, sf_dir).collect()
    assert len(got) == PR_TOP
    order = np.argsort(-r, kind="stable")
    for row in got:
        assert abs(row.rank - round(float(r[row.node]), 6)) <= 1e-6, row
    # the distributed top-20 node set matches numpy's (rank-6 rounding
    # ties broken by node id in both)
    top_numpy = sorted(
        range(n), key=lambda i: (-round(float(r[i]), 6), i)
    )[:PR_TOP]
    assert sorted(row.node for row in got) == sorted(top_numpy)


def test_fpgrowth_supports_recount_exactly(spark, sf_dir):
    """Every itemset ml_fpgrowth_baskets emits must have its support
    equal an exact recount over the basket table (baskets whose item
    set contains the whole itemset), be at or above the absolute
    FPG_MIN_COUNT floor, and the per-size top-k output must be
    canonically ordered."""
    from pyspark.sql import functions as F

    from engine.relational import FPG_MIN_COUNT, FPG_TOP_PER_SIZE, ml_fpgrowth_baskets
    from engine.session import table

    rows = ml_fpgrowth_baskets(spark, sf_dir).collect()
    assert rows
    sizes = {r.set_size for r in rows}
    assert 1 in sizes and 2 in sizes  # co-occurrence actually surfaced

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = [set(r.items) for r in li.groupBy("l_orderkey").agg(
        F.collect_set("l_partkey").alias("items")).collect()]
    per_size_counts: dict[int, int] = {}
    for r in rows:
        # items is the canonical comma-joined string (r6 contract fix:
        # the driver canonicalizer cannot sort array columns)
        assert isinstance(r.items, str)
        itemset = [int(x) for x in r.items.split(",")]
        assert len(itemset) == r.set_size
        got = sum(1 for b in baskets if set(itemset) <= b)
        assert got == r.freq, (r.items, r.freq, got)
        assert r.freq >= FPG_MIN_COUNT
        assert itemset == sorted(itemset)
        per_size_counts[r.set_size] = per_size_counts.get(r.set_size, 0) + 1
    for n in per_size_counts.values():
        assert n <= FPG_TOP_PER_SIZE


def test_fpgrowth_min_support_floor_never_rounds_up():
    """Regression for the r5 review finding: minSupport passed as
    exactly FPG_MIN_COUNT/n float-round-trips through MLlib's
    ceil(minSupport * n) to FPG_MIN_COUNT + 1 for ~5% of basket
    counts (n=187 is the smallest). The shipped (floor - 0.5)/n form
    must ceil to exactly FPG_MIN_COUNT for every n."""
    import math

    from engine.relational import FPG_MIN_COUNT

    bad = [
        n
        for n in range(1, 20001)
        if math.ceil((FPG_MIN_COUNT / n) * n) != FPG_MIN_COUNT
    ]
    assert len(bad) > 900  # the naive form really is broken this often
    for n in range(1, 20001):
        assert math.ceil(((FPG_MIN_COUNT - 0.5) / n) * n) == FPG_MIN_COUNT


def test_q47_scd2_deterministic_under_ts_ties(spark, tmp_path):
    """Same-microsecond events are routine at scale; q47's version
    order must be TOTAL (ts, event_id) so tied change events get
    identical versions on every run, partitioning, and engine. The
    planted user has two events at the same instant plus one later —
    versions must follow event_id within the tie and the validity
    chain must stay well-formed."""
    import datetime as dt

    from engine.relational import q47_scd2_assembly

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (101, t0, 5, "click", 1.0, None),            # tie A (event_id 101)
        (100, t0, 5, "click", 2.0, None),            # tie B (event_id 100)
        (102, t0 + dt.timedelta(hours=1), 5, "click", 3.0, None),
    ]
    d = str(tmp_path / "ties")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props map<string,string>",
    ).write.parquet(d + "/events.parquet")
    out = sorted(q47_scd2_assembly(spark, d).collect(), key=lambda r: r.version)
    assert [r.version for r in out] == [1, 2, 3]
    # within the tie, event_id 100 (value 2.0) versions before 101
    assert [r.value for r in out] == [2.0, 1.0, 3.0]
    # validity chain: each valid_to equals the next valid_from; only
    # the last row is current/open
    assert out[0].valid_to == out[1].valid_from
    assert out[1].valid_to == out[2].valid_from
    assert [r.is_current for r in out] == [False, False, True]


def test_q93_keep_latest_deterministic_under_ts_ties(spark, tmp_path):
    """q93's max_by/min_by keys must be total: among same-microsecond
    events the larger event_id is 'latest', the smaller is 'first' —
    on every run and engine (the q47 tie class, in aggregate form)."""
    import datetime as dt

    from engine.relational import q93_keep_latest

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (7, t0 - dt.timedelta(hours=1), 9, "open", 0.5, None),
        (3, t0, 9, "click", 1.0, None),   # tie, smaller id
        (4, t0, 9, "buy", 2.0, None),     # tie, larger id -> latest
    ]
    d = str(tmp_path / "q93ties")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props map<string,string>",
    ).write.parquet(d + "/events.parquet")
    out = {r.user_id: r for r in q93_keep_latest(spark, d).collect()}
    r = out[9]
    assert r.latest_event_id == 4 and r.latest_event_type == "buy"
    assert r.latest_value == 2.0
    assert r.first_event_id == 7
    assert r.latest_ts == t0


def test_q93_key_total_over_pre_epoch_and_negative_ids(spark, tmp_path):
    """The encoded (ts, event_id) key must be total over the WHOLE
    int64 domain, not just post-1970 non-negative data: an unbiased
    zero-pad of a negative unix_micros / event_id left-pads a '-'
    (ASCII 45 < '0') and silently misorders against positives,
    picking the wrong max_by/min_by winner (r5 ADVICE). The +2^63
    decimal bias makes pre-epoch timestamps and negative ids order
    numerically."""
    import datetime as dt

    from engine.relational import q93_keep_latest

    pre = dt.datetime(1955, 6, 1, 0, 0, 0)     # negative unix_micros
    post = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: pre-epoch event must be FIRST, post-epoch LATEST
        (-5, pre, 1, "ancient", 0.1, None),
        (2, post, 1, "modern", 0.2, None),
        # user 2: both pre-epoch; later pre-epoch ts wins
        (10, pre, 2, "older", 0.3, None),
        (11, pre + dt.timedelta(days=1), 2, "newer", 0.4, None),
        # user 3: tied ts, negative vs positive id — positive is latest
        (-9, post, 3, "neg", 0.5, None),
        (1, post, 3, "pos", 0.6, None),
    ]
    d = str(tmp_path / "q93preepoch")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string,"
        " value double, props map<string,string>",
    ).write.parquet(d + "/events.parquet")
    out = {r.user_id: r for r in q93_keep_latest(spark, d).collect()}
    assert out[1].first_event_id == -5 and out[1].latest_event_id == 2
    assert out[2].first_event_id == 10 and out[2].latest_event_id == 11
    assert out[3].first_event_id == -9 and out[3].latest_event_id == 1
    assert out[3].latest_event_type == "pos"


def test_recursive_cte_depth_cap_and_tie_order(spark, tmp_path):
    """q94 edge semantics (r7 verdict item 6): the walk is depth-capped
    at 12 hops (a 15-order customer stops at hop 12), a single-order
    customer terminates at hop 1, and same-date order ties chain in
    o_orderkey order on every engine."""
    import datetime as dt
    import glob
    import os

    from pyspark.sql import Row

    from engine.sqlapi import q94_recursive_cte

    day = dt.date(2024, 1, 1)
    rows = [
        # customer 1: 15 orders, same date — tie-broken by orderkey
        *[
            Row(o_orderkey=100 + k, o_custkey=1, o_orderstatus="O",
                o_totalprice=float(10 ** 0 * (k + 1)), o_orderdate=day,
                o_orderpriority="1")
            for k in range(15)
        ],
        # customer 2: one order
        Row(o_orderkey=500, o_custkey=2, o_orderstatus="O",
            o_totalprice=7.0, o_orderdate=day, o_orderpriority="1"),
    ]
    # q94 registers EVERY contract view: symlink the fixture tables in
    # and plant only orders
    d = str(tmp_path / "rec")
    os.makedirs(d)
    for p in glob.glob("/root/testdata/sf0.001/*.parquet"):
        if not p.endswith("/orders.parquet"):
            os.symlink(p, os.path.join(d, os.path.basename(p)))
    spark.createDataFrame(rows).write.parquet(d + "/orders.parquet")
    out = {(r.o_custkey, r.hop): r.cum_spend for r in q94_recursive_cte(spark, d).collect()}
    # depth cap: hops 1..12 only, never 13..15
    assert max(h for c, h in out if c == 1) == 12
    # tie order: orderkey ascending => cum at hop k = 1+2+...+k
    for k in range(1, 13):
        assert out[(1, k)] == sum(range(1, k + 1))
    assert out[(2, 1)] == 7.0 and (2, 2) not in out


def test_recursive_cte_cycle_guard_matches_duckdb(spark, tmp_path):
    """WITH RECURSIVE over a CYCLIC graph — the shape q94's rn-chain
    can never produce — must terminate via the explicit hop guard
    (the standard cycle discipline: recursion bounded by a depth
    column, because Spark's UNION ALL recursion has no cycle
    detection) and agree with DuckDB running the IDENTICAL SQL on the
    identical edges: a 3-cycle a->b->c->a plus a tail c->d, walked
    from 'a' for at most 7 hops."""
    import duckdb

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    sql = """
        WITH RECURSIVE walk AS (
            SELECT 'a' AS node, 0 AS hop
            UNION ALL
            SELECT e.dst, w.hop + 1
            FROM walk w JOIN edges e ON e.src = w.node
            WHERE w.hop < 7
        )
        SELECT node, hop, count(*) AS n FROM walk GROUP BY node, hop
        ORDER BY hop, node
    """
    spark.createDataFrame(edges, "src string, dst string").createOrReplaceTempView("edges")
    got = [(r.node, r.hop, r.n) for r in spark.sql(sql).collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE edges AS SELECT * FROM (VALUES "
                + ", ".join(f"('{s}', '{t}')" for s, t in edges)
                + ") t(src, dst)")
    want = [tuple(r) for r in con.execute(sql).fetchall()]
    assert got == want
    # the cycle really was walked around twice (hop 0 and hop 3 and
    # hop 6 all visit 'a') and the guard stopped it
    assert [(n, h) for n, h, _ in got if n == "a"] == [("a", 0), ("a", 3), ("a", 6)]
    assert max(h for _, h, _ in got) == 7


def test_strict_mirror_fails_planted_int_float_dtype_mismatch(monkeypatch):
    """r8 verdict item 2's done-criterion: the strict mirror must fail
    a planted int64-vs-float64 frame even when every value is
    numerically equal (the driver's bit-exact hash semantics — the
    DuckDB HUGEINT→float64 leak class that made q120 the r8 board's
    only red), while the tolerant default still passes it. monkeypatch
    (r9 ADVICE) restores any pre-existing SPARK_GRAFT_STRICT, and the
    tolerant leg runs under an explicitly UNSET variable instead of
    relying on the cleanup having removed it."""
    import pandas as pd

    import tools.oracle_check as oc

    a = pd.DataFrame({"x": pd.Series([1, 2, 3], dtype="int64")})
    b = pd.DataFrame({"x": pd.Series([1.0, 2.0, 3.0], dtype="float64")})
    monkeypatch.setenv("SPARK_GRAFT_STRICT", "1")
    err = oc._values_match(oc._normalize(a), oc._normalize(b))
    assert err is not None and "dtype" in err
    monkeypatch.delenv("SPARK_GRAFT_STRICT")
    assert oc._values_match(oc._normalize(a), oc._normalize(b)) is None
