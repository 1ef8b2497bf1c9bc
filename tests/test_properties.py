"""Property-based tests (hypothesis) for driver-side kernels — no
SparkSession needed, so these run in milliseconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.multimodal import fake_decode
from engine.pipeline import find_n


@st.composite
def variance_ratios(draw):
    n = draw(st.integers(min_value=1, max_value=128))
    raw = draw(
        st.lists(st.floats(min_value=1e-6, max_value=1.0), min_size=n, max_size=n)
    )
    r = np.sort(np.array(raw))[::-1]
    return r / r.sum()


@given(variance_ratios(), st.floats(min_value=0.01, max_value=0.999))
@settings(max_examples=200, deadline=None)
def test_find_n_is_minimal_k(ratios, tol):
    k = find_n(ratios, tol)
    assert 1 <= k <= len(ratios)
    if ratios[:k].sum() <= tol:
        # only allowed when even the full sum can't exceed tol (clamp)
        assert k == len(ratios)
    if k > 1:
        assert ratios[: k - 1].sum() <= tol  # minimality


@given(variance_ratios())
@settings(max_examples=50, deadline=None)
def test_find_n_monotone_in_tol(ratios):
    ks = [find_n(ratios, t) for t in (0.5, 0.8, 0.95, 0.99)]
    assert ks == sorted(ks)


@given(st.binary(min_size=1, max_size=4096), st.sampled_from([8, 16, 32]))
@settings(max_examples=100, deadline=None)
def test_fake_decode_total(payload, side):
    img = fake_decode(payload, side)
    assert img.shape == (side, side)
    assert img.dtype == np.uint8
    # every output byte comes from the payload
    assert set(img.ravel().tolist()) <= set(payload)


@st.composite
def token_streams(draw):
    """A stream with a few heavy tokens over a long-tail vocabulary,
    pre-split into 'partitions' of 'batches' (arbitrary boundaries)."""
    vocab = draw(st.integers(min_value=2, max_value=60))
    length = draw(st.integers(min_value=1, max_value=600))
    zipf_skew = draw(st.booleans())
    idx = draw(
        st.lists(st.integers(min_value=0, max_value=vocab - 1), min_size=length, max_size=length)
    )
    if zipf_skew:  # square the draw toward 0 to manufacture heavy hitters
        idx = [i * i // vocab for i in idx]
    toks = [f"t{i}" for i in idx]
    n_parts = draw(st.integers(min_value=1, max_value=5))
    cuts = sorted(
        draw(st.lists(st.integers(min_value=0, max_value=length), min_size=n_parts - 1, max_size=n_parts - 1))
    )
    parts = [toks[a:b] for a, b in zip([0] + cuts, cuts + [length])]
    return toks, parts


@given(token_streams(), st.integers(min_value=1, max_value=16))
@settings(max_examples=200, deadline=None)
def test_misra_gries_merge_capture_bound(stream, capacity):
    """The q67b phase-1 guarantee, adversarially: for ANY partitioning
    and ANY batch boundaries, the union of per-partition summaries
    contains every token with global frequency > N/(capacity+1), each
    summary stays within capacity, and kept counts are lower bounds."""
    import pandas as pd

    from engine.text import mg_merge

    toks, parts = stream
    true = pd.Series(toks).value_counts() if toks else pd.Series(dtype="int64")
    candidates: set = set()
    for part in parts:
        counters = pd.Series(dtype="int64")
        # arbitrary batch split inside the partition: pairs of tokens
        for i in range(0, len(part), 2):
            batch = pd.Series(part[i : i + 2]).value_counts()
            counters = mg_merge(counters, batch, capacity)
        assert len(counters) <= capacity
        for tok, lb in counters.items():
            assert 0 < lb <= true[tok]  # lower bound, never inflated
        candidates |= set(counters.index)
    n = len(toks)
    for tok, freq in true.items():
        if freq > n / (capacity + 1):
            assert tok in candidates, (tok, freq, n, capacity)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # group
            st.integers(min_value=0, max_value=50),     # score (ties likely)
            st.integers(min_value=0, max_value=10_000), # id
        ),
        min_size=0,
        max_size=120,
    ),
    st.integers(min_value=1, max_value=8),  # K
    st.integers(min_value=1, max_value=8),  # shards
)
@settings(max_examples=300, deadline=None)
def test_two_phase_grouped_topk_containment(rows, k, shards):
    """The algebraic law q115's two-phase salted top-K rests on: for
    ANY sharding of a group, the group's global top-K under a total
    order is contained in the union of per-shard top-Ks — so phase 2
    over phase-1 survivors reproduces the single-window answer
    exactly, ties and all."""
    rows = list({(g, s, i) for (g, s, i) in rows})  # unique ids per group
    order = lambda r: (-r[1], r[2])  # score DESC, id ASC (total)
    groups: dict[int, list] = {}
    for r in rows:
        groups.setdefault(r[0], []).append(r)
    for g, members in groups.items():
        expected = sorted(members, key=order)[:k]
        survivors = []
        for s in range(shards):
            shard = [r for r in members if hash((r[2], 1337)) % shards == s]
            survivors.extend(sorted(shard, key=order)[:k])
        got = sorted(survivors, key=order)[:k]
        assert got == expected
