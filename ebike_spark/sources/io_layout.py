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


def _scratch_dir(tag: str) -> str:
    return os.path.join(
        tempfile.gettempdir(), f"ebike_layout_{tag}_{uuid.uuid4().hex[:10]}"
    )


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
    path = _scratch_dir("hive")
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


COMPACT_BEFORE = 64  # small-file explosion to simulate
COMPACT_AFTER = 4  # range-compacted target file count


@register(
    "io_compact_small_files",
    oracle=f"""
    SELECT CAST({COMPACT_BEFORE} AS BIGINT) AS files_before,
           CAST({COMPACT_AFTER} AS BIGINT) AS files_after,
           COUNT(*) AS n_rows,
           CAST(SUM(epoch_us(ts) % 1000000007) AS BIGINT) AS ts_check
    FROM events
    """,
    tags=("io", "layout", "compaction"),
)
def io_compact_small_files(spark: SparkSession, sf: str) -> DataFrame:
    """Small-file compaction — the other half of the layout story: an
    ingestion that lands {COMPACT_BEFORE} tiny parquet files (the
    micro-batch/many-writer explosion every lake hits) is rewritten by
    repartitionByRange(ts) into {COMPACT_AFTER} range-clustered files.
    The emitted audit carries both file counts (read from the directory
    listings — bounded driver metadata, never data) plus the row count
    and modular ts digest of the COMPACTED copy, so a compaction that
    drops/duplicates rows fails the value hash, and one that doesn't
    actually reduce file count fails the count columns. Both counts are
    deterministic: round-robin repartition(n) fills every partition at
    n ≤ rows, and repartitionByRange(n) yields exactly n non-empty
    ranges.

    Scale shape: compaction is one scan + one range exchange sized by
    the TARGET layout; range clustering on ts additionally buys
    min/max row-group skipping for time-predicate reads (the zone-map
    story io_partitioned_layout proves for hive partitioning). At
    100 TB this runs per-partition-directory as a maintenance job, not
    corpus-wide."""
    small = _scratch_dir("compact_small")
    packed = _scratch_dir("compact_packed")
    ev = load_table(spark, sf, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    )
    ev.repartition(COMPACT_BEFORE).write.parquet(small)
    spark.read.parquet(small).repartitionByRange(
        COMPACT_AFTER, "ts_us"
    ).write.parquet(packed)

    def _nfiles(d: str) -> int:
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    back = spark.read.parquet(packed)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("ts_us") % 1_000_000_007).cast("long").alias("ts_check"),
    ).select(
        F.lit(_nfiles(small)).cast("long").alias("files_before"),
        F.lit(_nfiles(packed)).cast("long").alias("files_after"),
        "n_rows",
        "ts_check",
    )
