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
        "doc_id", "n_bytes", "n_pixels", "pixel_sum", "pixel_min", "pixel_max",
        "byte_mean", "byte_std", "q1_mean", "q2_mean", "q3_mean", "q4_mean",
    ]
    rows = feats.collect()
    assert len(rows) == 50
    for r in rows:
        assert r.n_bytes > 0
        assert r.n_pixels == 1024
        assert 0 <= r.pixel_min <= r.pixel_max <= 255
        # integer features consistent with the float mean
        assert abs(r.pixel_sum / 1024 - r.byte_mean) < 1e-9


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


# ------------------------- vendored PPM codec: the always-real path


def test_ppm_roundtrip_grayscale_pads_and_flattens():
    """decode_image executes its REAL kernel (header parse + raster
    decode + center-pad to 32×32 + flatten) with zero native deps."""
    from engine.multimodal import encode_ppm

    img = np.full((28, 20), 9, dtype=np.uint8)  # h=28, w=20
    arr = decode_image(encode_ppm(img))
    assert arr.shape == (1024,) and arr.dtype == np.uint8
    assert (arr.reshape(32, 32)[2:30, 6:26] == 9).all()
    assert arr.reshape(32, 32)[0, 0] == 0
    assert int((arr > 0).sum()) == 28 * 20


def test_ppm_rgb_luminance_and_comments():
    from engine.multimodal import _decode_ppm, encode_ppm

    rgb = np.zeros((4, 4, 3), dtype=np.uint8)
    rgb[:, :, 0] = 255  # pure red -> luminance 299*255//1000 = 76
    gray = _decode_ppm(encode_ppm(rgb))
    assert gray.shape == (4, 4) and (gray == 76).all()
    # header comments are skipped per the netpbm spec
    with_comment = b"P5\n# a comment\n2 2\n255\n" + bytes([1, 2, 3, 4])
    assert (_decode_ppm(with_comment) == np.array([[1, 2], [3, 4]])).all()


def test_ppm_crop_larger_than_side():
    from engine.multimodal import encode_ppm

    img = np.arange(40 * 40, dtype=np.uint8).reshape(40, 40) % 251
    arr = decode_image(encode_ppm(img))
    assert arr.shape == (1024,)
    assert (arr.reshape(32, 32) == img[:32, :32]).all()


def test_extract_features_with_real_codec_in_spark(spark):
    """The real decoder running inside mapInPandas — the Spark-side
    plumbing and the genuine codec kernel in one pass."""
    from engine.multimodal import encode_ppm

    rows = [
        (i, bytearray(encode_ppm(np.full((28, 28), i * 10, dtype=np.uint8))))
        for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    feats = {r.doc_id: r for r in extract_features(df, decoder=decode_image).collect()}
    assert len(feats) == 5
    for i in range(1, 6):
        r = feats[i]
        # 28x28 of value 10i centered in 32x32 zeros
        assert r.pixel_sum == 28 * 28 * 10 * i
        assert r.pixel_min == 0 and r.pixel_max == 10 * i
        assert r.n_pixels == 1024


def test_frame_sample_query_matches_driver_sampler(spark, sf_dir):
    """q64b (distributed mapInPandas frame sampling) must agree
    row-for-row with the driver-side sample_frames helper on the same
    payloads: same source indices, same per-frame byte sums (padding
    never changes a sum), ordinals dense from 0."""
    import numpy as np

    from engine.multimodal import (
        FRAME_SIZE,
        N_SAMPLED_FRAMES,
        q64b_frame_sample,
        sample_frame_indices,
        sample_frames,
    )
    from engine.session import table

    got = {}
    for r in q64b_frame_sample(spark, sf_dir).collect():
        got.setdefault(r.doc_id, []).append(r)
    docs = {r.doc_id: r.text for r in table(spark, sf_dir, "documents").collect()}
    assert set(got) == set(docs)
    for doc_id, rows in got.items():
        payload = docs[doc_id].encode("utf-8")
        idx = sample_frame_indices(len(payload), N_SAMPLED_FRAMES, FRAME_SIZE)
        frames = sample_frames(payload, N_SAMPLED_FRAMES, FRAME_SIZE)
        rows = sorted(rows, key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in rows] == list(range(len(idx)))
        assert [r.src_frame for r in rows] == [int(i) for i in idx]
        for r, frame in zip(rows, frames):
            assert r.byte_sum == int(frame.astype(np.int64).sum())
            assert 0 <= r.frame_bytes <= FRAME_SIZE


def test_q131_planted_phash_semantics(spark, tmp_path):
    """q131 near-dup semantics on planted payloads: exact media dups
    are hamming-0 pairs, a lightly-edited payload (few changed bytes
    in a >=1024-byte text, so each byte owns one raster pixel) is a
    small-hamming near-dup, and an unrelated payload pairs with
    nothing. Also pins the pair orientation (doc_a < doc_b)."""
    import random

    from engine.multimodal import (
        PHASH_MAX_HAMMING,
        average_hash_bands,
        fake_decode,
        q131_phash_neardup,
    )

    rng = random.Random(131)
    base = "".join(rng.choice("abcdefgh ") for _ in range(1200))

    def _ham(x: str, y: str) -> int:
        hx = average_hash_bands(fake_decode(x.encode(), 32))
        hy = average_hash_bands(fake_decode(y.encode(), 32))
        return sum(bin(a ^ b).count("1") for a, b in zip(hx, hy))

    # grow a contiguous 'z'-run edit until the reference aHash moves
    # but stays within the near-dup bound — aHash is DESIGNED to absorb
    # tiny edits, so the planted edit must be found, not guessed
    for k in range(16, 1024, 16):
        near = "z" * k + base[k:]
        if 0 < _ham(base, near) <= PHASH_MAX_HAMMING:
            break
    else:
        raise AssertionError("no edit size landed in the near-dup band")
    expected_ham = _ham(base, near)
    far = "".join(rng.choice("QRSTUVWX9!") for _ in range(700))
    rows = [
        (1, base, "en", "web", 1200),
        (2, base, "en", "web", 1200),   # exact dup of 1
        (3, near, "en", "web", 1200),   # near dup of 1/2
        (4, far, "en", "web", 700),     # unrelated
    ]
    d = str(tmp_path / "phash")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    got = {(r.doc_a, r.doc_b): r.hamming for r in q131_phash_neardup(spark, d).collect()}
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == expected_ham
    assert got[(1, 3)] == got[(2, 3)]
    assert all(4 not in pair for pair in got)
    assert all(a < b for a, b in got)


def test_q131_recount_matches_python_bruteforce(spark, sf_dir):
    """Every q131 decision re-derived independently in plain Python
    (fake_decode -> average_hash_bands -> band buckets -> cap ->
    Hamming verify) over the whole fixture: the distributed plan must
    agree exactly — pairs, orientation, and distances."""
    from collections import defaultdict

    from engine.multimodal import (
        PHASH_BAND_CAP,
        PHASH_MAX_HAMMING,
        PHASH_N_BANDS,
        average_hash_bands,
        fake_decode,
        q131_phash_neardup,
    )
    from engine.session import table

    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    sig = {
        i: average_hash_bands(fake_decode(t.encode("utf-8"), 32))
        for i, t in docs.items()
    }
    buckets: dict = defaultdict(list)
    for i in sorted(sig):
        for b in range(PHASH_N_BANDS):
            buckets[(b, sig[i][b])].append(i)
    want = {}
    for ids in buckets.values():
        b_side = ids[:PHASH_BAND_CAP]
        for a in ids:
            for b in b_side:
                if a > b:
                    h = sum(
                        bin(x ^ y).count("1") for x, y in zip(sig[a], sig[b])
                    )
                    if h <= PHASH_MAX_HAMMING:
                        want[(b, a)] = h
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in q131_phash_neardup(spark, sf_dir).collect()
    }
    assert got == want


def test_q132_phash_clusters_planted(spark, tmp_path):
    """q132 on planted media: two exact dups + one near dup form ONE
    cluster of 3 with the min doc id as keeper; the unrelated payload
    forms no cluster (components exist only where pairs do)."""
    import random

    from engine.multimodal import q132_phash_clusters

    rng = random.Random(132)
    base = "".join(rng.choice("abcdefgh ") for _ in range(1200))
    near = "z" * 64 + base[64:]
    far = "".join(rng.choice("QRSTUVWX9!") for _ in range(700))
    rows = [
        (1, base, "en", "web", 1200),
        (2, base, "en", "web", 1200),
        (3, near, "en", "web", 1200),
        (4, far, "en", "web", 700),
    ]
    d = str(tmp_path / "phashc")
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.parquet(d + "/documents.parquet")
    out = q132_phash_clusters(spark, d).collect()
    # the near doc may or may not clear the hamming bound depending on
    # the planted edit; the EXACT dups always cluster
    comp = {r.component: r for r in out}
    assert 1 in comp
    r = comp[1]
    assert r.keeper == 1 and r.cluster_size in (2, 3)
    assert all(c.component != 4 and c.keeper != 4 for c in out)
