"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed in Arrow-batched Python (mapInPandas).

The container has no image/audio codec libraries, so the GENERIC
decode step is a clearly-marked stub (NotImplementedError) — but
everything Spark-side is real and tested: the binary column, the
metadata struct schema, the mapInPandas batch iteration, and the
feature extraction over raw bytes (verifiable against a SQL oracle
because the synthetic payload is the utf-8 encoding of the document
text). Since round 5 one decode path is REAL end to end:
``mm_ppm_decode_stats`` encodes/decodes binary PPM (P6) in pure numpy
— header parse, (h, w, 3) reshape, nearest-neighbor resize — with a
closed-form SQL oracle over the emitted image statistics.

At 100 TB: payloads live in parquet binary columns (or object-store
pointers for >2 GB blobs); mapInPandas processes Arrow batches per
partition with no driver involvement; metadata-only queries never touch
payload bytes thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ebike_spark.functions.textfns import MD5_HEX_DIGITS, md5_long_sql
from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("media_type", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_hash", LongType(), True),
    ]
)


def ingest_media(spark: SparkSession, sf: str) -> DataFrame:
    """Build the multimodal table: binary payload + typed metadata.

    Payload is the utf-8 text (deterministic fake for the codec-less
    container); metadata is derived deterministically from doc_id.
    """
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
        (F.col("doc_id") % 640 + 32).cast("long").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("long").alias("height"),
    )


def decode_image(payload: bytes) -> "object":
    """STUB — image decoding needs a codec library not present in this
    container. The Spark-side plumbing (binary column in, mapInPandas
    batches, schema out) is real; swap this function for PIL/ffmpeg in a
    full deployment."""
    raise NotImplementedError("no image codec in this environment; see module docstring")


def make_feature_extractor(n_hex: int = MD5_HEX_DIGITS):
    """Build the Arrow-batched feature extractor.

    Returned as a *closure* (not a module-level function) so cloudpickle
    serializes it by value — executors never need ``ebike_spark`` on
    their PYTHONPATH. Constants are captured by value for the same
    reason.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_hash": payloads.map(
                        lambda b: int(hashlib.md5(bytes(b)).hexdigest()[:n_hex], 16)
                    ).astype("int64"),
                }
            )

    return extract


@register(
    "mm_feature_extract",
    oracle=f"""
    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
           {md5_long_sql("text")} AS content_hash
    FROM documents
    """,
    tags=("multimodal", "binary", "pandas-udf"),
)
def mm_features(spark: SparkSession, sf: str) -> DataFrame:
    """Binary feature extraction via mapInPandas: payload bytes → size +
    56-bit digest per document. The Python stage receives whole Arrow
    batches (no per-row serde); the oracle recomputes both features from
    the text the payload encodes."""
    media = ingest_media(spark, sf).select("doc_id", "payload")
    return media.mapInPandas(make_feature_extractor(), FEATURE_SCHEMA)


@register(
    "mm_metadata_only",
    oracle="""
    SELECT CAST(doc_id % 640 + 32 AS BIGINT) AS width, COUNT(*) AS n
    FROM documents GROUP BY 1
    """,
    tags=("multimodal", "metadata"),
)
def mm_metadata(spark: SparkSession, sf: str) -> DataFrame:
    """Metadata-only aggregation over the media table — the plan must
    never materialize payload bytes (column pruning drops the binary
    column at the scan; verified in tests via the optimized plan)."""
    media = ingest_media(spark, sf)
    return media.groupBy("width").agg(F.count("*").alias("n"))


FRAME_BYTES = 64  # fixed-size byte window = one "frame" of the fake codec
FRAME_STRIDE = 4  # sample every 4th frame

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_hash", LongType(), True),
    ]
)


def make_frame_sampler(frame_bytes: int = FRAME_BYTES, stride: int = FRAME_STRIDE,
                       n_hex: int = MD5_HEX_DIGITS):
    """Arrow-batched frame sampler (closure — executors never import this
    package): split each payload into fixed-size byte frames, keep every
    ``stride``-th frame, emit (doc_id, frame_idx, frame_hash) rows. The
    decode step is the deterministic fake (byte windows) — swapping in a
    real codec changes only the inner slicing, not the Spark plumbing,
    batch shape, or fan-out schema."""

    def sample(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import hashlib

        import pandas as _pd

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, stride):
                    chunk = b[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(int(doc_id))
                    idxs.append(i)
                    hashes.append(int(hashlib.md5(chunk).hexdigest()[:n_hex], 16))
            yield _pd.DataFrame(
                {
                    "doc_id": _pd.Series(ids, dtype="int64"),
                    "frame_idx": _pd.Series(idxs, dtype="int64"),
                    "frame_hash": _pd.Series(hashes, dtype="int64"),
                }
            )

    return sample


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH f AS (SELECT doc_id, text, strlen(text) AS L FROM documents),
    idx AS (SELECT doc_id, text,
                   unnest(generate_series(0, CAST(ceil(L * 1.0 / {FRAME_BYTES}) AS BIGINT) - 1,
                                          {FRAME_STRIDE})) AS frame_idx
            FROM f WHERE L > 0)
    SELECT doc_id, frame_idx,
           {md5_long_sql(f"substr(text, CAST(frame_idx * {FRAME_BYTES} + 1 AS BIGINT), {FRAME_BYTES})")} AS frame_hash
    FROM idx
    """,
    tags=("multimodal", "video", "frame-sample", "pandas-udf"),
)
def mm_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Frame sampling over binary media payloads: every {FRAME_STRIDE}th
    {FRAME_BYTES}-byte frame of each payload is hashed — the
    video-keyframe-extraction plumbing (decode is the deterministic fake;
    the container has no codec). Fan-out mapInPandas: one input row yields
    many frame rows inside the same Arrow batch, no shuffle until the
    caller aggregates. The oracle re-slices the text the payload encodes
    (ASCII corpus → byte and char windows coincide)."""
    media = ingest_media(spark, sf).select("doc_id", "payload")
    return media.mapInPandas(make_frame_sampler(), FRAME_SCHEMA)


# ------------------------------------------------- real PPM codec path
#
# The generic decode_image above stays a stub (arbitrary formats need
# codec libraries this container lacks), but binary PPM (P6) is a
# header + raw RGB bytes — decodable in pure numpy. This section makes
# the decode step REAL end to end: a mapInPandas stage ENCODES P6
# payloads, a second stage parses the header, reshapes the pixel
# buffer to (h, w, 3), nearest-neighbor-resizes it, and emits integer
# image statistics that a SQL oracle reproduces in closed form (pixel
# bytes follow k % 256 over the flattened buffer, so sums telescope).

PPM_DS = 16  # nearest-neighbor downsample target (PPM_DS × PPM_DS)

# The encoder/decoder live ONLY inside the closures below (executors
# can't import this package, so the logic must ship by value with the
# UDF — a module-level copy would duplicate and drift).

PPM_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("byte_sum", LongType(), True),
        StructField("ds_sum", LongType(), True),
    ]
)


def make_ppm_encoder():
    """mapInPandas stage 1: (doc_id) -> (doc_id, payload) PPM bytes.
    Closure-built; executors never import this package."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def enc(doc_id: int) -> bytes:
            w, h = 16 + doc_id % 48, 16 + (doc_id // 7) % 48
            header = f"P6\n{w} {h}\n255\n".encode()
            px = (np.arange(w * h * 3, dtype=np.int64) % 256).astype(np.uint8)
            return header + px.tobytes()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pdf["doc_id"].map(lambda d: enc(int(d))),
                }
            )

    return encode


def make_ppm_stats(ds: int = PPM_DS):
    """mapInPandas stage 2: decode each PPM payload, nearest-neighbor
    resize to ds×ds (numpy index slicing — a real resize), emit integer
    stats. Closure-built for executor pickling."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def decode(payload: bytes):
            if not payload.startswith(b"P6"):
                raise ValueError("not a binary PPM (P6) payload")
            # header = magic, width, height, maxval — whitespace-separated
            parts, i = [], 2
            while len(parts) < 3:
                while i < len(payload) and payload[i : i + 1].isspace():
                    i += 1
                j = i
                while j < len(payload) and not payload[j : j + 1].isspace():
                    j += 1
                parts.append(int(payload[i:j]))
                i = j
            i += 1  # single whitespace after maxval, then raw pixels
            w, h, maxval = parts
            if maxval != 255:
                raise ValueError("only 8-bit PPM supported")
            return np.frombuffer(payload, np.uint8, w * h * 3, i).reshape(h, w, 3)

        for pdf in batches:
            ids, ws, hs, bsums, dsums = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode(bytes(payload))
                h, w, _ = img.shape
                ys = (np.arange(ds) * h) // ds
                xs = (np.arange(ds) * w) // ds
                small = img[np.ix_(ys, xs)][:, :, 0]  # channel-0 ds×ds
                ids.append(int(doc_id))
                ws.append(w)
                hs.append(h)
                bsums.append(int(img.astype(np.int64).sum()))
                dsums.append(int(small.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int64"),
                    "height": pd.Series(hs, dtype="int64"),
                    "byte_sum": pd.Series(bsums, dtype="int64"),
                    "ds_sum": pd.Series(dsums, dtype="int64"),
                }
            )

    return stats


@register(
    "mm_ppm_decode_stats",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(16 + doc_id % 48 AS BIGINT) AS w,
             CAST(16 + (doc_id // 7) % 48 AS BIGINT) AS h
      FROM documents WHERE doc_id % 10 = 0),
    -- flattened pixel bytes are k % 256 for k in 0..3wh-1: the sum is
    -- full-cycle count * 32640 plus a triangular remainder
    sums AS (
      SELECT doc_id, w, h,
             (3 * w * h // 256) * 32640
               + ((3 * w * h % 256) * (3 * w * h % 256 - 1)) // 2 AS byte_sum
      FROM d),
    -- nearest-neighbor ds×ds sample of channel 0: byte index of
    -- (y, x, 0) is 3*(y*w + x); grid indices floor(i*h/{PPM_DS}),
    -- floor(j*w/{PPM_DS})
    grid AS (SELECT a.i, b.j
             FROM (SELECT unnest(range({PPM_DS})) AS i) a
             CROSS JOIN (SELECT unnest(range({PPM_DS})) AS j) b),
    ds AS (
      SELECT d.doc_id,
             CAST(SUM((3 * ((g.i * d.h // {PPM_DS}) * d.w + (g.j * d.w // {PPM_DS}))) % 256) AS BIGINT) AS ds_sum
      FROM d CROSS JOIN grid g GROUP BY 1)
    SELECT s.doc_id, s.w AS width, s.h AS height,
           CAST(s.byte_sum AS BIGINT) AS byte_sum, ds.ds_sum
    FROM sums s JOIN ds USING (doc_id)
    """,
    tags=("multimodal", "image", "decode", "resize", "pandas-udf"),
)
def mm_ppm_decode_stats(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode + resize in the multimodal path: stage 1
    encodes a binary PPM (P6) per sampled document (pure numpy — the
    one raster format that needs no codec library), stage 2 parses the
    header, reshapes the raw RGB buffer to (h, w, 3), nearest-neighbor
    downsamples to {PPM_DS}×{PPM_DS} via index slicing, and emits
    integer statistics. The SQL oracle reproduces every number in
    closed form (pixel bytes are the flattened index mod 256), so the
    decoder, the reshape, and the resize geometry are all value-checked
    — this closes the gap the generic decode_image stub documents.

    Scale shape: both stages are Arrow-batched mapInPandas with no
    shuffle at all between them (encode→decode chains in one task);
    the doc_id % 10 sample bounds payload volume; at 100 TB the encode
    stage is replaced by reading real payload bytes from the parquet
    binary column — the decode stage is unchanged."""
    docs = load_table(spark, sf, "documents").where(F.col("doc_id") % 10 == 0)
    media = docs.select("doc_id").mapInPandas(
        make_ppm_encoder(),
        StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("payload", BinaryType(), True),
            ]
        ),
    )
    return media.mapInPandas(make_ppm_stats(), PPM_STATS_SCHEMA)


# ------------------------------------------------- real WAV codec path
#
# Same discipline as the PPM section: RIFF/WAVE PCM is a chunked header
# + raw little-endian int16 samples — decodable in pure numpy/struct.
# Stage 1 ENCODES a mono 16 kHz WAV per sampled document, stage 2 walks
# the RIFF chunk list (fmt validation + data extraction — a real
# parser, not an offset guess), then computes the audio features a
# speech-corpus curation pipeline actually gates on: peak amplitude,
# energy (sum |s| and sum s²), and zero-crossing count. Every number is
# integer-exact with a closed-form SQL oracle (samples follow a
# documented modular formula of the index).

WAV_RATE = 16_000  # Hz, mono, 16-bit PCM
WAV_FRAME = 160  # 10 ms at 16 kHz; payload length = WAV_FRAME * (4 + doc_id % 8)

WAV_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_samples", LongType(), True),
        StructField("peak", LongType(), True),
        StructField("sum_abs", LongType(), True),
        StructField("sum_sq", LongType(), True),
        StructField("zero_crossings", LongType(), True),
    ]
)


def make_wav_encoder(rate: int = WAV_RATE, frame: int = WAV_FRAME):
    """mapInPandas stage 1: (doc_id) -> (doc_id, payload) RIFF/WAVE
    bytes. Sample k is ((doc_id % 97) * (k+1) * 2654435761) % 65536 -
    32768 — a full-range int16 signal the SQL oracle reproduces.
    Closure-built; executors never import this package."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def enc(doc_id: int) -> bytes:
            n = frame * (4 + doc_id % 8)
            k = np.arange(n, dtype=np.int64)
            v = ((doc_id % 97) * (k + 1) * 2654435761) % 65536 - 32768
            pcm = v.astype("<i2").tobytes()
            hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
            fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            return hdr + fmt + b"data" + struct.pack("<I", len(pcm)) + pcm

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": pdf["doc_id"].map(lambda d: enc(int(d))),
                }
            )

    return encode


def make_wav_stats():
    """mapInPandas stage 2: RIFF chunk walk (fmt must be PCM mono
    16-bit; data chunk located by id, never by fixed offset — WAVs in
    the wild carry LIST/fact chunks), then vectorized int64 feature
    math. Zero-crossing uses the sign convention sign(s) = (s >= 0), so
    a 0-sample counts as positive (matches the oracle's (val >= 0)
    flip test). Closure-built for executor pickling."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def decode(payload: bytes) -> np.ndarray:
            if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                raise ValueError("not a RIFF/WAVE payload")
            i, samples = 12, None
            while i + 8 <= len(payload):
                cid = payload[i : i + 4]
                sz = struct.unpack("<I", payload[i + 4 : i + 8])[0]
                if cid == b"fmt ":
                    fmt_tag, ch, _, _, _, bits = struct.unpack(
                        "<HHIIHH", payload[i + 8 : i + 24]
                    )
                    if (fmt_tag, ch, bits) != (1, 1, 16):
                        raise ValueError("only PCM mono 16-bit supported")
                elif cid == b"data":
                    samples = np.frombuffer(payload, np.int16, sz // 2, i + 8)
                i += 8 + sz + (sz & 1)  # chunks are word-aligned
            if samples is None:
                raise ValueError("no data chunk")
            return samples.astype(np.int64)

        for pdf in batches:
            ids, ns, pk, sa, sq, zc = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                s = decode(bytes(payload))
                pos = s >= 0
                ids.append(int(doc_id))
                ns.append(len(s))
                pk.append(int(np.abs(s).max()))
                sa.append(int(np.abs(s).sum()))
                sq.append(int((s * s).sum()))
                zc.append(int(np.count_nonzero(pos[1:] != pos[:-1])))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int64"),
                    "sum_abs": pd.Series(sa, dtype="int64"),
                    "sum_sq": pd.Series(sq, dtype="int64"),
                    "zero_crossings": pd.Series(zc, dtype="int64"),
                }
            )

    return stats


@register(
    "mm_wav_decode_stats",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, {WAV_FRAME} * (4 + doc_id % 8) AS n
      FROM documents WHERE doc_id % 10 = 0),
    s AS (SELECT doc_id, unnest(range(n)) AS k FROM docs),
    v AS (
      SELECT doc_id, k,
             ((doc_id % 97) * (k + 1) * 2654435761) % 65536 - 32768 AS val
      FROM s),
    lagged AS (
      SELECT doc_id, val,
             LAG(val) OVER (PARTITION BY doc_id ORDER BY k) AS pv
      FROM v)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(MAX(ABS(val)) AS BIGINT) AS peak,
           CAST(SUM(ABS(val)) AS BIGINT) AS sum_abs,
           CAST(SUM(val * val) AS BIGINT) AS sum_sq,
           CAST(COUNT(*) FILTER (WHERE pv IS NOT NULL AND (val >= 0) != (pv >= 0)) AS BIGINT)
             AS zero_crossings
    FROM lagged GROUP BY 1
    """,
    tags=("multimodal", "audio", "decode", "pandas-udf"),
)
def mm_wav_decode_stats(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio decode in the multimodal path: stage 1 encodes a
    mono 16 kHz RIFF/WAVE PCM payload per sampled document (struct +
    numpy — WAV needs no codec library), stage 2 walks the RIFF chunk
    list, validates the fmt chunk, extracts the int16 PCM buffer, and
    emits the integer audio features speech-corpus curation gates on
    (peak, |s| and s² energy sums, zero-crossing count — the classic
    silence/clipping/noisiness triage). The SQL oracle reproduces every
    sample value in closed form, so the chunk parser, the int16
    interpretation, and the feature math are all value-checked. This is
    the audio sibling of mm_ppm_decode_stats — together they replace
    the generic decode stub with two real codec paths.

    Scale shape: encode→decode chain in ONE task (no shuffle anywhere
    in the plan — the oracle's per-sample LAG window exists only on the
    DuckDB side); the doc_id % 10 sample bounds payload volume; at
    100 TB stage 1 is replaced by reading real payload bytes from the
    parquet binary column and the decode stage is unchanged. Feature
    math is vectorized int64 numpy inside Arrow batches, never per-row
    Python."""
    docs = load_table(spark, sf, "documents").where(F.col("doc_id") % 10 == 0)
    media = docs.select("doc_id").mapInPandas(
        make_wav_encoder(),
        StructType(
            [
                StructField("doc_id", LongType(), False),
                StructField("payload", BinaryType(), True),
            ]
        ),
    )
    return media.mapInPandas(make_wav_stats(), WAV_STATS_SCHEMA)
