"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed in Arrow-batched Python (mapInPandas).

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (NotImplementedError) — but everything Spark-side is
real and tested: the binary column, the metadata struct schema, the
mapInPandas batch iteration, and the feature extraction over raw bytes
(which is verifiable against a SQL oracle because the synthetic payload
is the utf-8 encoding of the document text).

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
