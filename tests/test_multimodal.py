"""Multimodal plumbing: schema, batch shape, stubbed codec behavior."""

from __future__ import annotations

import numpy as np
import pytest

from engine.multimodal import decode_image, extract_features, fake_decode, with_payload
from engine.session import table


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


def test_resize_block_mean_and_nearest():
    from engine.multimodal import resize_image

    img = fake_decode(b"0123456789abcdef" * 64, side=32)
    down = resize_image(img, 16)            # integral ratio -> block mean
    assert down.shape == (16, 16) and down.dtype == np.uint8
    odd = resize_image(img, 10)             # non-integral -> nearest
    assert odd.shape == (10, 10)
    # resize of a constant image is constant
    const = np.full((32, 32), 7, dtype=np.uint8)
    assert (resize_image(const, 8) == 7).all()


def test_frame_sampling_deterministic_and_spaced():
    from engine.multimodal import sample_frames

    payload = bytes(range(256)) * 40        # 40 "frames" of 256 bytes
    frames = sample_frames(payload, 5)
    assert 1 <= len(frames) <= 5
    assert all(f.shape == (16, 16) for f in frames)
    again = sample_frames(payload, 5)
    assert all((a == b).all() for a, b in zip(frames, again))
    # short payload: single padded frame
    tiny = sample_frames(b"xy", 3)
    assert len(tiny) == 1 and tiny[0].shape == (16, 16)


def test_decode_image_real_codec_pads_and_flattens():
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from engine.multimodal import decode_image

    img = Image.new("L", (20, 28), 9)       # (w, h) -> 28x20 array
    buf = io.BytesIO()
    img.save(buf, "PNG")
    arr = decode_image(buf.getvalue())
    assert arr.shape == (1024,) and arr.dtype == np.uint8
    # padded region is zero, original pixels survive centered
    assert (arr.reshape(32, 32)[2:30, 6:26] == 9).all()
    assert arr.reshape(32, 32)[0, 0] == 0
    assert int((arr > 0).sum()) == 28 * 20


def test_decode_image_raises_cleanly_without_codecs():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present: the real path is tested above")
    except ImportError:
        pass
    from engine.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"not-an-image")
