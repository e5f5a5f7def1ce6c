"""Output-layout round-trip: hive-partitioned, sorted, size-capped
parquet — the layout story for a 100 TB corpus sink.

The io_* round-trips cover FORMATS; this covers LAYOUT, which at scale
matters more: a corpus written as ``.../lang=XX/part-*.parquet`` with
rows sorted on the residual key and files capped to a target row count
gives (1) partition pruning — a per-language read touches only that
directory, proven here by filtering the read-back and in
tests/test_scale_plans.py by the PartitionFilters assertion on the
same pattern; (2) row-group skipping — min/max stats on the sorted
key; (3) bounded file sizes for downstream parallelism.

Registered after the streaming family (same reason as semdedup): the
externally-checked registry prefix is reserved for families without
driver correctness rows.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table

LAYOUT_LANGS = ("en", "fr")  # the read-back probe prunes to these


@register(
    "io_partitioned_layout",
    oracle=f"""
    SELECT lang, source, COUNT(*) AS n,
           CAST(SUM(doc_id % 1000003) AS BIGINT) AS id_check,
           CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents
    WHERE lang IN {LAYOUT_LANGS!r}
    GROUP BY lang, source
    """,
    tags=("io", "layout", "partitioning"),
)
def io_partitioned_layout(spark: SparkSession, sf: str) -> DataFrame:
    """documents → partitionBy(lang) + sortWithinPartitions(doc_id) +
    maxRecordsPerFile → read back ONLY two languages → per-source audit.
    The write repartitions on lang first so each partition directory is
    produced by the executors that own it (no tiny-file explosion); the
    read-back filter becomes a PartitionFilter (directory pruning), so
    the scan never opens the other languages' files."""
    path = os.path.join(tempfile.gettempdir(), f"ebike_layout_{uuid.uuid4().hex[:10]}")
    docs = load_table(spark, sf, "documents")
    (
        docs.repartition("lang")
        .sortWithinPartitions("lang", "doc_id")
        .write.option("maxRecordsPerFile", 100_000)
        .partitionBy("lang")
        .parquet(path)
    )
    back = spark.read.parquet(path).where(F.col("lang").isin(*LAYOUT_LANGS))
    return back.groupBy("lang", "source").agg(
        F.count("*").alias("n"),
        F.sum(F.col("doc_id") % 1_000_003).cast("long").alias("id_check"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
