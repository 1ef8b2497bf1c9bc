"""Composite rotation queries (engine/rotation.py): one driver slot
re-proves several frozen single-pass operators. These tests pin the
mechanics the oracle mirror can't see by itself: the leg specs track
the member schemas, every member appears in exactly one composite, and
each composite's per-shape row population equals the member's own."""

from __future__ import annotations

import pytest

from engine import rotation


def test_every_member_spec_matches_member_schema(spark, sf_dir):
    """_LEGS must list EVERY output column of each member, in order —
    a member schema change (column added/renamed/reordered) must fail
    here rather than silently serialize a stale column set."""
    kind_of_dtype = {
        "string": "s",
        "bigint": "i",
        "int": "i",
        "smallint": "i",
        "boolean": "b",
        "double": "f",
        "float": "f",
        "date": "d",
        "timestamp": "t",
        "timestamp_ntz": "t",
    }
    for name, spec in rotation._LEGS.items():
        df = rotation.MEMBER_QUERIES[name](spark, sf_dir)
        got = [(c, kind_of_dtype[t]) for c, t in df.dtypes]
        assert got == spec, f"{name}: schema drifted from _LEGS spec"


def test_members_partition_cleanly():
    members = [m for ms in rotation.ROTATIONS.values() for m in ms]
    assert len(members) == len(set(members)), "member in two composites"
    assert set(members) == set(rotation._LEGS), "spec/membership mismatch"


@pytest.mark.parametrize("comp", sorted(rotation.ROTATIONS))
def test_composite_population_equals_members(spark, sf_dir, comp):
    """Per-shape row counts must equal each member's own row count —
    the composite must add or drop nothing."""
    got = {
        r.shape: r.n
        for r in rotation.QUERIES[comp](spark, sf_dir)
        .groupBy("shape")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for m in rotation.ROTATIONS[comp]:
        # .get default 0: an honestly-empty member (q09 anti-join at
        # sf0.001 — every customer has orders) contributes no shape row
        assert got.get(m, 0) == rotation.MEMBER_QUERIES[m](spark, sf_dir).count(), m


def test_serialized_rows_never_null_or_empty(spark, sf_dir):
    """Every serializer leg coalesces to a sentinel, so k is never NULL
    (concat_ws silently skipping a NULL would alias distinct rows)."""
    df = rotation.QUERIES["rot_order_setop_shapes"](spark, sf_dir)
    from pyspark.sql import functions as F

    assert df.filter(F.col("k").isNull() | (F.col("k") == "")).count() == 0
