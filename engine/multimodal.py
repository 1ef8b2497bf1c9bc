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
from pyspark.sql.window import Window

from .session import table


def decode_image(payload: bytes, side: int = 32) -> "np.ndarray":
    """Real media decode: image bytes → grayscale → center-pad to
    ``side``×``side`` → flatten. Reference-INSPIRED, fixed-width
    variant of to_array (main.py:128-142): the reference adds a fixed
    2 px border (so only 28×28 inputs land on 32×32) and keeps color
    channels; this decoder instead guarantees the ``side``×``side``
    contract for any input (center-pad small, crop large) and
    luminance-grayscales color — the invariant the downstream
    fixed-width pipeline actually needs.

    Codec resolution order: binary PPM/PGM (P5/P6) via the vendored
    pure-stdlib decoder below — always available, exercised in-suite —
    then PIL for every other format; raises NotImplementedError only
    when the bytes are not PPM and PIL is missing (this container),
    in which case ``fake_decode`` carries the dataflow.
    """
    if payload[:2] in (b"P5", b"P6"):
        img = _decode_ppm(payload)
    else:
        try:
            import PIL.Image
        except ImportError as exc:
            raise NotImplementedError(
                "non-PPM media codecs not installed in this container; "
                "use fake_decode for the dataflow"
            ) from exc
        import io

        img = np.asarray(PIL.Image.open(io.BytesIO(payload)).convert("L"), dtype=np.uint8)
    h, w = img.shape
    ph, pw = max(side - h, 0), max(side - w, 0)
    img = np.pad(img, ((ph // 2, ph - ph // 2), (pw // 2, pw - pw // 2)))
    return img[:side, :side].ravel()


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Vendored pure-stdlib decoder for binary netpbm (P5 grayscale /
    P6 RGB, maxval ≤ 255): header tokens (with ``#`` comment support)
    then a raw raster. Gives the suite a REAL codec path — header
    parse + raster decode + channel handling — with zero native deps.
    RGB collapses to luminance via integer BT.601 weights
    ((299·R + 587·G + 114·B) / 1000, truncating like PIL's ``L``)."""
    toks: list[bytes] = []
    i = 2  # past magic
    magic = payload[:2]
    while len(toks) < 3:
        # skip whitespace / comments
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = (int(t) for t in toks)
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    raster = np.frombuffer(payload, dtype=np.uint8, offset=i)
    if magic == b"P5":
        return raster[: h * w].reshape(h, w)
    rgb = raster[: h * w * 3].reshape(h, w, 3).astype(np.uint32)
    return ((299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2]) // 1000).astype(
        np.uint8
    )


def encode_ppm(img: np.ndarray) -> bytes:
    """Inverse of _decode_ppm for test fixtures: (h, w) uint8 → P5,
    (h, w, 3) uint8 → P6."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        head = b"P5"
        h, w = img.shape
    else:
        head = b"P6"
        h, w = img.shape[:2]
    return head + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def fake_decode(payload: bytes, side: int = 32) -> np.ndarray:
    """Deterministic stand-in decoder: tile the payload bytes into a
    (side × side) uint8 'image' — same shape contract as decode_image.
    TOTAL on bytes: a zero-byte payload (empty document, truncated
    blob — real at crawl scale) decodes to the all-zero image instead
    of blowing up the whole mapInPandas task on a numpy reshape
    (r7 multimodal fuzzer find)."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    if len(buf) == 0:
        return np.zeros((side, side), dtype=np.uint8)
    reps = int(np.ceil(side * side / len(buf)))
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


def sample_frame_indices(n_bytes: int, n_frames: int, frame_size: int = 256) -> np.ndarray:
    """Sorted distinct source-frame indices the sampler reads: n
    uniformly spaced positions over the stream's total frame count
    (shared by sample_frames and the q64b contract query so the
    oracle's index arithmetic and the engine's can never drift)."""
    total = max(n_bytes // frame_size, 1)
    return np.unique((np.arange(n_frames) * total // max(n_frames, 1)).clip(0, total - 1))


def sample_frames(payload: bytes, n_frames: int, frame_size: int = 256) -> list[np.ndarray]:
    """Deterministic frame sampling for video-like payloads: treat the
    byte stream as consecutive fixed-size frames and take n uniformly
    spaced ones (the standard keyframe-sampling shape; a real codec
    would decode at the same sampled offsets)."""
    idx = sample_frame_indices(len(payload), n_frames, frame_size)
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
    "doc_id bigint, n_bytes int, n_pixels int, pixel_sum bigint, "
    "pixel_min int, pixel_max int, byte_mean double, byte_std double, "
    "q1_mean double, q2_mean double, q3_mean double, q4_mean double"
)


def extract_features(df: DataFrame, side: int = 32, decoder=None) -> DataFrame:
    """mapInPandas media feature extraction: decode each payload,
    emit fixed-width numeric features.

    ``decoder`` defaults to ``fake_decode`` (deterministic, so the
    sum/min/max/shape features are value-checkable by the DuckDB
    oracle — see q64); pass ``decode_image`` for the real codec path —
    same (payload, side) → uint8 pixels contract. The integer
    features (pixel_sum/min/max, counts) are EXACT, which is what
    lets downstream aggregates hash-match across engines; the float
    moments are convenience columns for feature consumers.

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
                        int(flat.size),
                        int(np.asarray(img, dtype=np.int64).sum()),
                        int(flat.min()),
                        int(flat.max()),
                        float(flat.mean()),
                        float(flat.std()),
                        *(float(q.mean()) for q in quarters),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "n_pixels", "pixel_sum",
                    "pixel_min", "pixel_max", "byte_mean", "byte_std",
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
    relational aggregation.

    VALUE-CHECKED against DuckDB: fake_decode tiles the utf-8 payload
    bytes into a 32×32 raster, so pixel_sum/min/max are pure integer
    functions of the text bytes the oracle reproduces in SQL
    (ASCII fixture ⇒ byte i = ascii of char i+1). The aggregation
    keeps everything integer-exact except avg_byte_mean, which both
    engines derive by the SAME IEEE ops (bigint-sum ÷ bigint, then
    floor-truncate to 6 decimals) — no float-accumulation drift."""
    d = with_payload(table(spark, sf_dir, "documents"))
    feats = extract_features(d)
    n_px = 32 * 32
    return (
        feats.groupBy((F.col("doc_id") % 10).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pixel_sum").alias("total_pixel_sum"),
            F.min("pixel_min").alias("min_byte"),
            F.max("pixel_max").alias("max_byte"),
            F.sum("n_bytes").alias("total_bytes"),
            (
                F.floor(F.sum("pixel_sum") / (F.count(F.lit(1)) * F.lit(n_px)) * F.lit(1e6))
                / F.lit(1e6)
            ).alias("avg_byte_mean"),
        )
        .orderBy("shard")
    )


FRAME_SIZE = 256
N_SAMPLED_FRAMES = 4


def q64b_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed temporal media sampling — the video/audio leg of
    the multimodal surface as a first-class contract query (the shared
    shape: video keyframe sampling ≡ audio window sampling — both are
    'read n uniformly spaced fixed-size spans of an opaque byte
    stream'). One ``mapInPandas`` pass emits a row per sampled frame:
    (doc_id, frame_idx ordinal, src_frame stream index, frame_bytes
    actually read, byte_sum) — the generate-shaped output a real
    frame-decode stage has, with the decode itself the deterministic
    byte-span reader (a real codec slots into the same offsets; the
    Spark-side plumbing — schema, batching, fan-out — is what this
    query pins, per the stub-the-codec rule).

    VALUE-CHECKED: the sampler's index arithmetic
    (``sample_frame_indices``) and byte sums are pure integer
    functions of the payload bytes, reproduced by the DuckDB oracle
    over the same ASCII fixture bytes (q64's tiling pattern).
    Narrow plan: no shuffle at all — scan → Python worker → rows."""
    d = with_payload(table(spark, sf_dir, "documents")).select("doc_id", "payload")

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                for ordinal, i in enumerate(
                    sample_frame_indices(len(payload), N_SAMPLED_FRAMES, FRAME_SIZE)
                ):
                    chunk = payload[i * FRAME_SIZE : (i + 1) * FRAME_SIZE]
                    buf = np.frombuffer(chunk, dtype=np.uint8)
                    rows.append(
                        (
                            int(doc_id),
                            ordinal,
                            int(i),
                            len(chunk),
                            int(buf.astype(np.int64).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "src_frame", "frame_bytes", "byte_sum"]
            )

    return d.mapInPandas(
        _frames,
        "doc_id bigint, frame_idx int, src_frame int, frame_bytes int, byte_sum bigint",
    )


# -------------------------------- perceptual-hash media near-dup (q131)

PHASH_SIDE = 8           # aHash grid: 8x8 = 64 bits
PHASH_N_BANDS = 4        # 4 bands x 16 bits (q55's SimHash banding shape)
PHASH_MAX_HAMMING = 8    # verified near-dup: <= 8 of 64 bits differ
PHASH_BAND_CAP = 64      # hot-band cap (q118's NEARDUP_BAND_CAP pattern)


def average_hash_bands(img: np.ndarray, n_bands: int = PHASH_N_BANDS) -> list[int]:
    """Classic average-hash (aHash) of a decoded tile, emitted as
    ``n_bands`` 16-bit ints — the per-band words double as the LSH
    band keys, so no 64-bit value (and no signed shiftleft(1,63)
    overflow) ever exists. Integer-exact end to end: the 32→8 block
    mean is an exact ``sum // 16`` (a /16 is a binary-exact float op,
    truncated by the uint8 cast), and bit i is the strict comparison
    ``64·block_i > Σ blocks`` — no float mean, so the DuckDB oracle
    reproduces every bit from the raw payload bytes."""
    small = resize_image(np.asarray(img, dtype=np.uint8), PHASH_SIDE)
    vals = small.ravel().astype(np.int64)
    total = int(vals.sum())
    per = vals.size // n_bands
    out = []
    for b in range(n_bands):
        h = 0
        for i in range(per):
            if 64 * int(vals[b * per + i]) > total:
                h |= 1 << i
        out.append(h)
    return out


def phash_signatures(df: DataFrame) -> DataFrame:
    """(doc_id, h0..h3) — payload → decode → aHash, one Arrow-batched
    mapInPandas pass (the q64 decode plumbing feeding q55's banding
    shape)."""

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (int(doc_id), *average_hash_bands(fake_decode(bytes(payload), 32)))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=["doc_id", "h0", "h1", "h2", "h3"])

    return df.select("doc_id", "payload").mapInPandas(
        _hash, "doc_id bigint, h0 int, h1 int, h2 int, h3 int"
    )


def q131_phash_neardup(
    spark: SparkSession, sf_dir: str, checkpointed: bool = False
) -> DataFrame:
    """Perceptual-hash near-dup detection for MEDIA payloads — the
    dedup leg that exact hashing (q50: one byte flipped ⇒ different
    md5) and embedding near-dup (q66: needs an embedding; media
    mostly has none) both miss. Classic aHash over the decoded tile
    (the q64 mapInPandas decode path; a real codec slots into the
    same contract) → q55's Hamming-banding shape: the 64-bit hash
    splits into 4×16-bit band words, docs sharing any band word are
    candidates, and a candidate pair is a near-dup iff its verified
    Hamming distance ≤ PHASH_MAX_HAMMING. Reference anchor: the
    reference deduplicates nothing (main.py:79-458 loads EMNIST
    as-is); this is the §2.6 scope extension's media-dedup row.

    Banding recall is the standard LSH trade: any pair within ≤3
    differing bits shares a band by pigeonhole; beyond that recall is
    probabilistic (the q54/q66 geometry). Both engines run the SAME
    candidate rule, so the oracle is exact, not a recall bound.

    Scale shape: one corpus scan → Python hash workers (Arrow
    batches) → the self-join shuffles 5-int signature rows, never
    payloads; the b-side of each band bucket is capped at the
    PHASH_BAND_CAP earliest doc ids (q118's hot-band bound, mirrored
    in the oracle's QUALIFY) so an all-black-thumbnail band cannot go
    quadratic; verification is 4 xor/bit_count ops per candidate.
    The signature frame feeds BOTH join sides, so Catalyst plans the
    decode+hash subtree twice (PLANS.json scans=2); ``checkpointed=
    True`` is the 100 TB path — ``io.materialize`` pins the 5-int
    signature rows once, so payloads are decoded exactly ONCE (the
    q124/q125 discipline, pinned by the same plan test).
    Output: (doc_a, doc_b, hamming), doc_a < doc_b."""
    d = with_payload(table(spark, sf_dir, "documents"))
    sigs = phash_signatures(d)
    if checkpointed:
        from . import io as _io

        sigs = _io.materialize(sigs)
    bands = sigs.select(
        "doc_id",
        "h0",
        "h1",
        "h2",
        "h3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"h{b}").alias("h")
                    )
                    for b in range(PHASH_N_BANDS)
                ]
            )
        ).alias("bh"),
    ).select("doc_id", "h0", "h1", "h2", "h3", "bh.band", "bh.h")
    wb = Window.partitionBy("band", "h").orderBy("doc_id")
    b_side = (
        bands.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= PHASH_BAND_CAP)
        .drop("rn")
    )
    pairs = (
        bands.alias("a")
        .join(
            b_side.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(
            F.col("b.doc_id").alias("doc_a"),
            F.col("a.doc_id").alias("doc_b"),
            *[F.col(f"b.h{i}").alias(f"a{i}") for i in range(PHASH_N_BANDS)],
            *[F.col(f"a.h{i}").alias(f"b{i}") for i in range(PHASH_N_BANDS)],
        )
        .distinct()
    )
    ham = sum(
        F.bit_count(F.col(f"a{i}").bitwiseXOR(F.col(f"b{i}")))
        for i in range(PHASH_N_BANDS)
    ).cast("int")
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def q132_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media dup CLUSTERS — the compaction stage over q131's verified
    pair graph (the q54→q80 pattern applied to the media leg): pairs →
    connected components (``text.connected_components``: driver
    union-find at output scale, checkpointed distributed label
    propagation beyond the threshold) → one canonical keeper per
    cluster. This is the frame a curation job actually acts on: drop
    every member but the keeper. Composition, not duplication — the
    Spark side CALLS q131 and the shared component machinery; the
    oracle embeds q131's oracle verbatim as its edge CTE and q80's
    recursive reachability on top.

    Scale shape: the component input is the VERIFIED pair list —
    output-scale, orders of magnitude below the corpus (q80's
    argument); everything upstream keeps q131's documented plan.
    Output: (component, cluster_size, keeper), component = min doc id."""
    from .text import connected_components

    pairs = q131_phash_neardup(spark, sf_dir)
    comps = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    return (
        comps.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"), F.min("doc_id").alias("keeper"))
        .orderBy("component")
    )


QUERIES = {
    "q63_multimodal_meta": q63_multimodal_meta,
    "q64_media_features": q64_media_features,
    "q64b_frame_sample": q64b_frame_sample,
    "q131_phash_neardup": q131_phash_neardup,
    "q132_phash_clusters": q132_phash_clusters,
}

ORACLE = {
    "q63_multimodal_meta": """
        SELECT doc_id, octet_length(encode(text))::int AS n_bytes,
               sha256(text) AS payload_sha256, lang,
               len(embedding)::int AS emb_dim
        FROM documents JOIN embeddings ON doc_id = vec_id
    """,
    # fake_decode in SQL: 1024 tiled byte values per doc — byte i of
    # the raster = payload byte (i mod n_bytes); ASCII fixture ⇒
    # ascii(substr(text, pos, 1)) == payload byte
    "q64_media_features": """
        WITH px AS (
            -- zero-byte payloads decode to the all-zero image
            -- (fake_decode's total-on-bytes contract, r7): the modulo
            -- tiling is guarded so i % 0 can't NULL the pixel list
            SELECT doc_id,
                   octet_length(encode(text)) AS n_bytes,
                   list_transform(
                       generate_series(0, 1023),
                       i -> CASE WHEN octet_length(encode(text)) = 0 THEN 0
                            ELSE ascii(substr(text, (i % octet_length(encode(text)))::int + 1, 1))
                            END
                   ) AS vals
            FROM documents),
        per_doc AS (
            SELECT doc_id, n_bytes,
                   list_sum(vals)::bigint AS pixel_sum,
                   list_min(vals) AS pixel_min,
                   list_max(vals) AS pixel_max
            FROM px)
        SELECT (doc_id % 10)::bigint AS shard,
               count(*) AS n,
               sum(pixel_sum)::bigint AS total_pixel_sum,
               min(pixel_min)::int AS min_byte,
               max(pixel_max)::int AS max_byte,
               sum(n_bytes)::bigint AS total_bytes,
               floor(sum(pixel_sum)::double / (count(*) * 1024) * 1e6) / 1e6
                 AS avg_byte_mean
        FROM per_doc GROUP BY 1 ORDER BY 1
    """,
    # sample_frame_indices in SQL: total = max(n_bytes // 256, 1);
    # src frames = distinct (j * total) // 4 for j in 0..3 (the clip
    # is a no-op at n_frames=4 since (3*total)//4 <= total-1 for all
    # total >= 1); frame ordinal = rank of src index. byte_sum sums
    # ascii codes over the frame's span (ASCII fixture, q64 pattern);
    # the engine's zero-padding never changes the sum.
    "q64b_frame_sample": """
        WITH f AS (
            SELECT doc_id, text,
                   octet_length(encode(text))::int AS n_bytes,
                   greatest(octet_length(encode(text)) // 256, 1)::int AS total
            FROM documents),
        srcs AS (
            SELECT DISTINCT doc_id, text, n_bytes,
                   ((j * total) // 4)::int AS src_frame
            FROM f, (SELECT unnest([0, 1, 2, 3]) AS j) js),
        ordered AS (
            SELECT doc_id, text, n_bytes, src_frame,
                   (row_number() OVER (PARTITION BY doc_id
                                       ORDER BY src_frame) - 1)::int AS frame_idx
            FROM srcs)
        SELECT doc_id, frame_idx, src_frame,
               least(256, n_bytes - src_frame * 256)::int AS frame_bytes,
               coalesce(list_sum(list_transform(
                   generate_series(1, least(256, n_bytes - src_frame * 256)),
                   k -> ascii(substr(text, src_frame * 256 + k, 1))
               )), 0)::bigint AS byte_sum
        FROM ordered
    """,
    # aHash in SQL, bit for bit: fake_decode's tiled raster pixel
    # (r, c) = payload byte ((r*32 + c) mod n)  (q64's ASCII-fixture
    # byte identity, zero-payload guard included); the 32→8 block mean
    # is the exact sum//16; bit i of band b is 64·block > Σ blocks.
    # Candidates/cap/verify mirror the Spark plan exactly (same LSH
    # rule both sides ⇒ exact oracle, not a recall bound).
    "q131_phash_neardup": f"""
        WITH raw AS (
            SELECT doc_id, text, octet_length(encode(text))::int AS n
            FROM documents),
        sigs AS (
            SELECT doc_id,
                   list_transform(generate_series(0, 63), blk ->
                       (list_sum(list_transform(generate_series(0, 15), p ->
                           CASE WHEN n = 0 THEN 0 ELSE
                             ascii(substr(text,
                                 ((((blk // 8) * 4 + p // 4) * 32
                                   + (blk % 8) * 4 + p % 4) % n) + 1, 1))
                           END)) // 16)::bigint
                   ) AS bvals
            FROM raw),
        words AS (
            SELECT doc_id, bvals, list_sum(bvals)::bigint AS total FROM sigs),
        hw AS (
            SELECT doc_id,
                   list_sum(list_transform(generate_series(0, 15), i ->
                       CASE WHEN 64 * bvals[i + 1] > total
                            THEN (1 << i) ELSE 0 END))::int AS h0,
                   list_sum(list_transform(generate_series(0, 15), i ->
                       CASE WHEN 64 * bvals[i + 17] > total
                            THEN (1 << i) ELSE 0 END))::int AS h1,
                   list_sum(list_transform(generate_series(0, 15), i ->
                       CASE WHEN 64 * bvals[i + 33] > total
                            THEN (1 << i) ELSE 0 END))::int AS h2,
                   list_sum(list_transform(generate_series(0, 15), i ->
                       CASE WHEN 64 * bvals[i + 49] > total
                            THEN (1 << i) ELSE 0 END))::int AS h3
            FROM words),
        bands AS (
            SELECT doc_id, h0, h1, h2, h3, band,
                   CASE band WHEN 0 THEN h0 WHEN 1 THEN h1
                             WHEN 2 THEN h2 ELSE h3 END AS h
            FROM hw, (SELECT unnest([0, 1, 2, 3]) AS band) bs),
        b_side AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (PARTITION BY band, h
                                             ORDER BY doc_id) AS rn
                FROM bands)
            WHERE rn <= {PHASH_BAND_CAP}),
        pairs AS (
            SELECT DISTINCT b.doc_id AS doc_a, a.doc_id AS doc_b,
                   b.h0 AS a0, b.h1 AS a1, b.h2 AS a2, b.h3 AS a3,
                   a.h0 AS b0, a.h1 AS b1, a.h2 AS b2, a.h3 AS b3
            FROM bands a JOIN b_side b
              ON a.band = b.band AND a.h = b.h AND a.doc_id > b.doc_id)
        SELECT doc_a, doc_b, hamming FROM (
            SELECT doc_a, doc_b,
                   (bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
                    + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)))::int
                       AS hamming
            FROM pairs)
        WHERE hamming <= {PHASH_MAX_HAMMING}
        ORDER BY doc_a, doc_b
    """,
}

# q132's oracle embeds q131's verbatim as the edge CTE (plain
# concatenation, never .format — member SQL may contain braces) and
# runs q80's recursive min-reachability on top.
ORACLE["q132_phash_clusters"] = (
    "WITH RECURSIVE edges AS ("
    + ORACLE["q131_phash_neardup"]
    + """),
    undirected AS (
        SELECT doc_a AS a, doc_b AS b FROM edges
        UNION SELECT doc_b, doc_a FROM edges),
    reach(doc, r) AS (
        SELECT a, a FROM undirected
        UNION
        SELECT u.a, reach.r FROM undirected u JOIN reach ON u.b = reach.doc),
    comp AS (SELECT doc AS doc_id, min(r) AS component FROM reach GROUP BY doc)
    SELECT component, count(*)::bigint AS cluster_size, min(doc_id)::bigint AS keeper
    FROM comp GROUP BY component ORDER BY component"""
)
