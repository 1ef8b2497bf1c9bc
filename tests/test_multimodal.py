"""Multimodal plumbing: schema, batch shape, stubbed codec behavior."""

from __future__ import annotations

import numpy as np
import pytest

from engine.multimodal import decode_image, extract_features, fake_decode, with_payload
from engine.session import table


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG\r\n")


def test_fake_decode_shape_and_determinism():
    a = fake_decode(b"hello world", side=32)
    assert a.shape == (32, 32) and a.dtype == np.uint8
    assert (a == fake_decode(b"hello world", side=32)).all()
    assert not (a == fake_decode(b"other bytes", side=32)).all()


def test_extract_features_dataflow(spark, sf_dir):
    d = with_payload(table(spark, sf_dir, "documents")).limit(50)
    feats = extract_features(d)
    assert feats.columns == [
        "doc_id", "n_bytes", "byte_mean", "byte_std",
        "q1_mean", "q2_mean", "q3_mean", "q4_mean",
    ]
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_bytes > 0
        assert 0 <= r.byte_mean <= 255
