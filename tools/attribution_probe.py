"""Attribution pair-join probe (VERDICT-r6 task 7): two extra data
points beyond the round-6 10x/100x uniform curve —

1. a 10x UNIFORM replica sweep (reproduces the r6 measurement shape),
2. a SKEWED-touch variant: the same 10x corpus with the top-1% most
   active users' events replicated a further 40x (event_id reshifted,
   user_id KEPT) — hot users now carry ~40x the touch mass, so the
   conversion x touch pair volume concentrates exactly where a
   pair-join plan would skew.

Confirms the narrowing Spark/DuckDB ratio (4.75 -> 1.74 at 100x in r6)
is data-volume-driven, not an artifact of the fixture's uniform touch
distribution. Run on a QUIET host; results go to BENCH_NOTES.md.

Usage: python tools/attribution_probe.py [replicas=10]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import duckdb
import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ebike_spark import get_spark  # noqa: E402
from ebike_spark.plans.registry import REGISTRY, _load_all  # noqa: E402
from ebike_spark.sources.registry import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"
KEY_SHIFT = 10_000_000


def build(spark, out: str, replicas: int, skew_hot_x: int = 0) -> None:
    if os.path.exists(out):
        shutil.rmtree(out)
    ev = load_table(spark, SF, "events")
    reps = spark.range(replicas).select(F.col("id").alias("r"))
    base = (
        ev.crossJoin(reps)
        .withColumn("user_id", F.col("user_id") + F.col("r") * KEY_SHIFT)
        .withColumn("event_id", F.col("event_id") + F.col("r") * KEY_SHIFT)
        .drop("r")
    )
    if skew_hot_x > 0:
        # top-1% users by event count, across the replicated corpus
        counts = base.groupBy("user_id").count()
        n_users = counts.count()
        hot = counts.orderBy(F.desc("count"), "user_id").limit(
            max(1, n_users // 100)
        ).select("user_id")
        hot_events = base.join(F.broadcast(hot), "user_id", "inner")
        extra_reps = spark.range(1, skew_hot_x + 1).select(F.col("id").alias("x"))
        extra = (
            hot_events.crossJoin(extra_reps)
            .withColumn(
                "event_id",
                F.col("event_id") + F.col("x") * KEY_SHIFT * 1000,
            )
            .drop("x")
            .select(*base.columns)
        )
        base = base.unionByName(extra)
    base.write.parquet(f"{out}/events.parquet")


def time_pair(spark, con, name: str, sf_dir: str) -> tuple[float, float]:
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    df.count()
    t0 = time.perf_counter()
    spec.fn(spark, sf_dir).count()
    ts = time.perf_counter() - t0
    con.execute(spec.oracle).fetchall()
    t0 = time.perf_counter()
    con.execute(spec.oracle).fetchall()
    td = time.perf_counter() - t0
    return ts, td


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("attr_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    _load_all()

    results = []
    for label, skew in (("uniform", 0), ("skew40x-top1pct", 40)):
        out = f"/tmp/ebike_attr_{label}_x{replicas}"
        build(spark, out, replicas, skew_hot_x=skew)
        n = spark.read.parquet(f"{out}/events.parquet").count()
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{out}/events.parquet/*.parquet'"
        )
        for q in ("ev_attribution_linear", "ev_attribution_position"):
            ts, td = time_pair(spark, con, q, out)
            ratio = ts / td if td > 0 else float("inf")
            results.append((label, q, n, round(ts, 2), round(td, 2), round(ratio, 2)))
        con.close()
    with open("/tmp/attr_probe_results.txt", "w") as f:
        f.write("variant query n_events spark_s duck_s ratio\n")
        for r in results:
            f.write(" ".join(str(x) for x in r) + "\n")
    for r in results:
        print(*r)
    spark.stop()


if __name__ == "__main__":
    main()
