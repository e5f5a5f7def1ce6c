"""Join operators Spark lacks natively: generic as-of join, and a
salted join for skewed keys.

The reference inherits only hash/cross joins from DataFusion 6.0 —
"No sort-merge, no as-of/range/interval joins" (SURVEY §2.B). These are
the Spark-first constructions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the nearest right row at-or-before
    (backward) / at-or-after (forward) on ``on``, per ``by`` group.

    Implemented as union + running last_value instead of an inequality
    join: tag rows by side, sort within each ``by`` group by the as-of
    key, and carry the most recent right-side values across left rows.
    One shuffle on ``by``, O(n log n) per group — where the naive range
    join is O(n·m) per group. Equal keys: the right row sorts before
    (backward) / after (forward) the left row, so exact ties match,
    same as ``pd.merge_asof`` / DuckDB ASOF JOIN semantics.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    lcols = left.columns
    tagged_l = left.withColumn("_side", F.lit(1)).select(
        *lcols, "_side", *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols]
    )
    tagged_r = right.select(
        F.col(by).alias(by) if by in right.columns else F.col(by),
        F.col(on).alias(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # align schemas: left columns missing on the right become NULL
    for c in lcols:
        if c not in tagged_r.columns:
            tagged_r = tagged_r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    tagged_r = tagged_r.select(*lcols, "_side", *[f"_r_{c}" for c in right_cols])
    unioned = tagged_l.unionByName(tagged_r)

    if direction == "backward":
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = unioned.select(
        *lcols,
        "_side",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in right_cols],
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def salted_join(
    left: DataFrame, right: DataFrame, left_key: str, right_key: str, salt: int = 8
) -> DataFrame:
    """Skew-resistant inner equi-join: explode the (small-ish) right side
    ``salt`` ways and scatter left rows across salt buckets by a hash of
    the whole row, so one hot key spreads over ``salt`` reducers instead
    of melting one. Use when AQE skew-join can't help (e.g. the skew is
    in a groupBy after the join). Cost: right side replicated ×salt.
    """
    salted_l = left.withColumn("_salt_l", F.pmod(F.xxhash64(*left.columns), F.lit(salt)))
    salted_r = right.withColumn("_salt_r", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = salted_l.join(
        salted_r,
        (F.col(left_key) == F.col(right_key)) & (F.col("_salt_l") == F.col("_salt_r")),
        "inner",
    )
    return out.drop("_salt_l", "_salt_r")


@register(
    "asof_generic_events_orders",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    signups AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'signup')
    SELECT p.event_id, epoch_us(p.ts) AS ts_us,
           epoch_us(s.ts) AS signup_ts_us,
           s.value AS signup_value
    FROM purchases p ASOF LEFT JOIN signups s
      ON p.user_id = s.user_id AND s.ts <= p.ts
    """,
    tags=("asof-join", "operator"),
)
def asof_generic(spark: SparkSession, sf: str) -> DataFrame:
    """The generic asof_join operator vs DuckDB's *native* ASOF JOIN —
    each purchase picks up the latest signup at-or-before it, per user,
    including the signup's payload column."""
    ev = load_table(spark, sf, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = ev.where(F.col("event_type") == "signup").select("user_id", "ts", "value")
    joined = asof_join(purchases, signups, on="ts", by="user_id", right_cols=["ts", "value"])
    return joined.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        F.unix_micros("asof_ts").alias("signup_ts_us"),
        F.col("asof_value").alias("signup_value"),
    )


@register(
    "salted_join_parity",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "skew", "operator"),
)
def salted_parity(spark: SparkSession, sf: str) -> DataFrame:
    """salted_join must be result-identical to the plain join (q03's
    oracle) — the salt only changes the physical distribution."""
    o = load_table(spark, sf, "orders")
    c = load_table(spark, sf, "customer")
    return (
        salted_join(o, c, "o_custkey", "c_custkey", salt=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
