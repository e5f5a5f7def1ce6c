"""Batch range (interval) join, expressed scale-first.

The reference has no interval join at all (SURVEY §2.B "no as-of/
range/interval joins"); Spark's built-in answer to a pure range
predicate — `points JOIN intervals ON t BETWEEN lo AND hi` with no
equi-key — is BroadcastNestedLoopJoin: every point row is checked
against every interval, O(points × intervals), which is exactly the
plan that dies at 100 TB.

The scale-safe formulation used here is bin discretization (the same
trick Databricks' range-join optimization and KDB's window joins use,
all public): pick a bin width W no smaller than the longest interval,
explode each interval into the ≤ 2 bins it can overlap, map each point
to the single bin floor(t/W), and equi-join on the bin id before
applying the exact range predicate as a residual filter. The join is
then a plain hash join that shuffles on bin id — partition-parallel,
AQE-skew-splittable — and the residual filter runs codegen'd on the
co-located pairs. Cost drops from |P|·|I| comparisons to
|P| + Σ_bin |P_bin|·|I_bin|, and the explode factor is bounded by
ceil(len/W) + 1 ≤ 2 by construction.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table

# 15 minutes in microseconds — all timestamp math stays in epoch_us
# (int64) on both engines: DuckDB's epoch() rounds where Spark floors,
# but unix_micros/epoch_us agree exactly.
WINDOW_US = 900_000_000
ANCHOR_EVERY = 499


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    t_col: str,
    lo_col: str,
    hi_col: str,
    bin_us: int,
) -> DataFrame:
    """Join point rows to every interval containing them:
    lo <= t < hi. ``bin_us`` must be >= the longest interval length so
    each interval spans at most two bins.

    Returns points ⋈ intervals with all columns from both sides.
    Implementation: equi-join on exploded bin ids + residual range
    filter — never a nested-loop product.
    """
    lo, hi, t = F.col(lo_col), F.col(hi_col), F.col(t_col)
    # bins an interval can touch: floor(lo/W) .. floor((hi-1)/W); with
    # bin_us >= interval length that is at most {b, b+1}. array_distinct
    # keeps single-bin intervals from matching twice.
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(lo / bin_us),
                    F.floor((hi - 1) / bin_us),
                )
            )
        ),
    )
    pt = points.withColumn("_bin", F.floor(t / bin_us))
    return (
        pt.join(iv, "_bin")
        .where((t >= lo) & (t < hi))
        .drop("_bin")
    )


@register(
    "range_join_event_windows",
    oracle=f"""
    WITH anchors AS (
      SELECT event_id AS window_id, epoch_us(ts) AS start_us,
             epoch_us(ts) + {WINDOW_US} AS end_us
      FROM events WHERE event_id % {ANCHOR_EVERY} = 0)
    SELECT a.window_id, COUNT(*) AS n_events,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM anchors a JOIN events e
      ON epoch_us(e.ts) >= a.start_us AND epoch_us(e.ts) < a.end_us
    GROUP BY a.window_id
    """,
    tags=("join", "range-join", "events"),
)
def range_join_event_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Count and sum the events falling inside each 15-minute window
    anchored at every {ANCHOR_EVERY}th event — a keyless interval join
    (windows are global, not per-user, so there is no equi-key to hide
    behind).

    100 TB shape: the binned equi-join shuffles events once on bin id;
    intervals explode ≤ 2×; the residual range filter and the final
    per-window aggregate reuse the join's partitioning. The naive
    BroadcastNestedLoopJoin this replaces is asserted absent in
    tests/test_scale_plans.py.
    """
    ev = load_table(spark, sf, "events").select(
        "event_id", F.unix_micros("ts").alias("t_us"), "value"
    )
    anchors = (
        ev.where(F.col("event_id") % ANCHOR_EVERY == 0)
        .select(
            F.col("event_id").alias("window_id"),
            F.col("t_us").alias("start_us"),
            (F.col("t_us") + WINDOW_US).alias("end_us"),
        )
    )
    joined = range_join(
        ev.select("t_us", "value"),
        anchors,
        t_col="t_us",
        lo_col="start_us",
        hi_col="end_us",
        bin_us=WINDOW_US,
    )
    return joined.groupBy("window_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
