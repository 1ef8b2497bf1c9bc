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


def test_driver_window_covers_unproven_queries():
    # The driver's correctness gate checks only the FIRST 50 queries()
    # entries. Rotation policy (see __spark_entry__ docstring): the r4
    # window must lead with the 8 queries that have no driver row in
    # any round, then the queries added/changed this round, then the
    # non-relational rotation block.
    names = list(contract.queries())[:50]
    required = set(contract._window_head())
    missing = required - set(names)
    assert not missing, f"queries pushed out of the 50-entry driver window: {sorted(missing)}"
    # Zero-slack guard: the head must itself fit in the window.
    assert len(required) <= 50, f"window head overflows: {len(required)} > 50"
    # The never-driver-checked queries must occupy the head outright.
    assert names[: len(contract._UNPROVEN)] == contract._UNPROVEN
    # Deferrals may only hold r2-green, this-round-unchanged entries.
    assert not (contract._DEFERRED_TO_R5 & set(contract._UNPROVEN))
    assert not (contract._DEFERRED_TO_R5 & set(contract._NEW_IN_R4))
    assert not (contract._DEFERRED_TO_R5 & set(contract._CHANGED_THIS_ROUND))


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


def test_strict_oracle_smoke_on_flake_classes(spark):
    """Bit-exact (driver hash-gate) comparison at sf0.001 for the three
    queries that exercise each historical cross-engine float-flake
    class: q25 (order-dependent avg -> decimal sum fix), q57
    (round-tie semantics -> trunc6 fix), q66 (normalized cosine
    chain). The full strict run lives in tools/oracle_check.py; this
    guards the classes on every pytest run."""
    import os

    import duckdb

    os.environ["SPARK_GRAFT_STRICT"] = "1"
    try:
        import tools.oracle_check as oc

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
    finally:
        os.environ.pop("SPARK_GRAFT_STRICT", None)


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
