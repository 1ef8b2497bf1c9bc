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
