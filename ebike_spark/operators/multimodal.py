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
