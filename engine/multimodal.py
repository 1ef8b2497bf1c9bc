"""Multimodal columns: opaque binary payloads + typed metadata (north-star).

Model: image/audio/video payloads are ``binary`` columns alongside
typed metadata and embedding columns in ONE DataFrame — the Spark
plumbing (schema, partition-friendly batch processing, Arrow-batched
UDF signatures) is real and tested; the actual media codecs are
STUBBED (this container has no PIL/ffmpeg — see ``decode_image``)
behind a deterministic fake so the dataflow is verifiable.

The fixture has no true binary table, so payloads are derived
deterministically from ``documents.text`` (utf-8 bytes) — which also
lets the metadata query be value-checked by the DuckDB oracle.

Scale posture: media processing is the textbook mapInPandas workload —
embarrassingly parallel, no shuffle; batch size bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
large blobs never materializes at once. Feature extraction emits
fixed-width rows, so downstream ops are ordinary columnar plans.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import table


def decode_image(payload: bytes, side: int = 32) -> "np.ndarray":
    """Real media decode: image bytes → grayscale → center-pad to
    ``side``×``side`` → flatten (reference parity: to_array,
    main.py:128-142 decodes, pads to 32×32, flattens).

    Requires PIL; raises NotImplementedError when codec libs are
    missing (this container), in which case ``fake_decode`` carries
    the dataflow. tests/test_multimodal.py exercises this body under
    ``pytest.importorskip("PIL")``.
    """
    try:
        import PIL.Image
    except ImportError as exc:
        raise NotImplementedError(
            "media codecs not installed in this container; use fake_decode for the dataflow"
        ) from exc
    import io

    img = np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("L"), dtype=np.uint8)
    h, w = img.shape
    ph, pw = max(side - h, 0), max(side - w, 0)
    img = np.pad(img, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)))
    return img[:side, :side].ravel()


def fake_decode(payload: bytes, side: int = 32) -> np.ndarray:
    """Deterministic stand-in decoder: tile the payload bytes into a
    (side × side) uint8 'image' — same shape contract as decode_image."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(side * side / max(len(buf), 1)))
    return np.tile(buf, reps)[: side * side].reshape(side, side)


def resize_image(img: np.ndarray, side: int) -> np.ndarray:
    """Pure-numpy resize (block mean / nearest hybrid): real resize
    logic with no codec libs. Downscale via block averaging when the
    ratio is integral, else nearest-neighbor sampling."""
    h, w = img.shape
    if h % side == 0 and w % side == 0:
        fh, fw = h // side, w // side
        return (
            img.reshape(side, fh, side, fw).mean(axis=(1, 3)).astype(np.uint8)
        )
    ys = (np.arange(side) * h // side).clip(0, h - 1)
    xs = (np.arange(side) * w // side).clip(0, w - 1)
    return img[np.ix_(ys, xs)]


def sample_frames(payload: bytes, n_frames: int, frame_size: int = 256) -> list[np.ndarray]:
    """Deterministic frame sampling for video-like payloads: treat the
    byte stream as consecutive fixed-size frames and take n uniformly
    spaced ones (the standard keyframe-sampling shape; a real codec
    would decode at the same sampled offsets)."""
    total = max(len(payload) // frame_size, 1)
    idx = np.unique((np.arange(n_frames) * total // max(n_frames, 1)).clip(0, total - 1))
    out = []
    for i in idx:
        chunk = payload[i * frame_size : (i + 1) * frame_size]
        buf = np.frombuffer(chunk, dtype=np.uint8)
        if len(buf) < frame_size:
            buf = np.pad(buf, (0, frame_size - len(buf)))
        side = int(np.sqrt(frame_size))
        out.append(buf[: side * side].reshape(side, side))
    return out


def with_payload(df: DataFrame) -> DataFrame:
    """Attach the opaque binary column (utf-8 bytes of text here;
    in production: spark.read.format('binaryFile').load(...).content)."""
    return df.withColumn("payload", F.encode(F.col("text"), "utf-8"))


_FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, byte_mean double, byte_std double, "
    "q1_mean double, q2_mean double, q3_mean double, q4_mean double"
)


def extract_features(df: DataFrame, side: int = 32, decoder=None) -> DataFrame:
    """mapInPandas media feature extraction: decode each payload,
    emit fixed-width numeric features.

    ``decoder`` defaults to ``fake_decode`` (this container has no
    codec libs); deployments with PIL pass ``decode_image`` for the
    real path — same (payload, side) → uint8 pixels contract.

    Arrow-batched; one Python worker per partition; output schema is
    declared so Catalyst treats downstream ops as ordinary columns.
    """
    decode = decoder or fake_decode

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode(bytes(payload), side)
                flat = np.asarray(img, dtype=np.float64).ravel()
                quarters = np.array_split(flat, 4)
                rows.append(
                    (
                        int(doc_id),
                        len(payload),
                        float(flat.mean()),
                        float(flat.std()),
                        *(float(q.mean()) for q in quarters),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "byte_mean", "byte_std",
                    "q1_mean", "q2_mean", "q3_mean", "q4_mean",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(_extract, _FEATURE_SCHEMA)


def q63_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads, joined with the embedding
    table — the 'one DF, many modalities' shape. Oracle-checked."""
    d = with_payload(table(spark, sf_dir, "documents"))
    e = table(spark, sf_dir, "embeddings").select("vec_id", F.size("embedding").alias("emb_dim"))
    return (
        d.join(e, d.doc_id == e.vec_id, "inner")
        .select(
            "doc_id",
            F.octet_length("payload").alias("n_bytes"),
            F.sha2(F.col("payload"), 256).alias("payload_sha256"),
            "lang",
            "emb_dim",
        )
    )


def q64_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal dataflow: binary column → mapInPandas
    decode (deterministic fake codec) → fixed-width features →
    relational aggregation. Rows-only (codec not SQL-expressible)."""
    d = with_payload(table(spark, sf_dir, "documents"))
    feats = extract_features(d)
    return (
        feats.groupBy((F.col("doc_id") % 10).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("byte_mean"), 6).alias("avg_byte_mean"),
            F.round(F.avg("byte_std"), 6).alias("avg_byte_std"),
            F.round(F.avg("n_bytes"), 6).alias("avg_bytes"),
        )
        .orderBy("shard")
    )


QUERIES = {
    "q63_multimodal_meta": q63_multimodal_meta,
    "q64_media_features": q64_media_features,
}

ORACLE = {
    "q63_multimodal_meta": """
        SELECT doc_id, octet_length(text::blob)::int AS n_bytes,
               sha256(text) AS payload_sha256, lang,
               len(embedding)::int AS emb_dim
        FROM documents JOIN embeddings ON doc_id = vec_id
    """,
}
