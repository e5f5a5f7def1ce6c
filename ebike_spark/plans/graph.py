"""Iterative graph analytics over the event-transition graph.

Not present in the reference (no iterative algorithms at all; its only
graph-adjacent surface is what DataFusion 6 can express in one SELECT).
Spark-native extension in the q31/q32 recursive spirit: power-iteration
PageRank over the (event_type → event_type) transition graph, in EXACT
integer arithmetic so a DuckDB oracle replays the identical trajectory
— the same discipline as embed_kmeans_lloyd (floats never bit-repeat
across engines; integers do).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table

PR_UNITS = 1_000_000_000  # total rank mass, in integer units
PR_DAMP_NUM = 85  # damping 0.85 as an exact rational
PR_DEN = 100
PR_ITERS = 4

# One iteration, as SQL over the previous iteration's CTE: rank(v) =
# teleport base + sum over in-edges of floor(85 * r(u) * c(u,v) /
# (100 * out(u))). Integer floor-division on positive values is
# identical in Spark (DIV) and DuckDB (//); integer sums are exact in
# any order, so the trajectory is engine- and partitioning-independent.
_ORACLE_STEP = """
    r{k} AS (
      SELECT n.state,
             CAST(b.b + COALESCE(SUM(({damp} * p.r * e.c)
                                     // ({den} * o.outc)), 0) AS BIGINT) AS r
      FROM nodes n CROSS JOIN base b
      LEFT JOIN edges e ON e.v = n.state
      LEFT JOIN r{prev} p ON p.state = e.u
      LEFT JOIN outs o ON o.u = e.u
      GROUP BY n.state, b.b)
"""


def _pagerank_oracle() -> str:
    steps = ",".join(
        _ORACLE_STEP.format(k=k, prev=k - 1, damp=PR_DAMP_NUM, den=PR_DEN)
        for k in range(1, PR_ITERS + 1)
    )
    return f"""
    WITH seq AS (
      SELECT event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events),
    edges AS (
      SELECT prev AS u, event_type AS v, COUNT(*) AS c
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
    nodes AS (SELECT DISTINCT event_type AS state FROM events),
    consts AS (SELECT COUNT(*) AS n FROM nodes),
    outs AS (SELECT u, SUM(c) AS outc FROM edges GROUP BY u),
    base AS (
      SELECT CAST((CAST({PR_UNITS} AS BIGINT) * {PR_DEN - PR_DAMP_NUM}
                   // {PR_DEN}) // n AS BIGINT) AS b
      FROM consts),
    r0 AS (SELECT state, CAST(CAST({PR_UNITS} AS BIGINT) // n AS BIGINT) AS r
           FROM nodes, consts),
    {steps}
    SELECT state, r AS rank_units FROM r{PR_ITERS}
    """


@register(
    "ev_pagerank_states",
    oracle=_pagerank_oracle(),
    tags=("events", "graph", "pagerank", "iterative", "beyond-reference"),
)
def ev_pagerank_states(spark: SparkSession, sf: str) -> DataFrame:
    """{PR_ITERS} power iterations of PageRank (damping 0.85) over the
    event-transition graph, in EXACT integer units: rank starts at
    {PR_UNITS}/N per state and each step moves floor(85·r(u)·c(u,v) /
    (100·out(u))) units along every weighted edge plus a floor'd
    teleport base. Every operation is integer, so the DuckDB oracle
    (the same {PR_ITERS} steps unrolled as chained CTEs) hash-matches
    the full trajectory — the iterative-algorithm discipline
    embed_kmeans_lloyd established. Dangling mass evaporates
    (documented; ordering-equivalent to renormalizing here).

    Scale shape: ONE events scan builds the weighted edge list (a
    user-keyed window pass collapsing to ≤types² rows, persisted
    session-scoped with the node set); each iteration is a broadcast
    join of the constant-sized rank vector against the cached edges +
    one ≤types-row aggregate — iteration cost is frontier-sized,
    never corpus-sized, exactly like q32's recursion. At web scale
    the same loop runs over a bucketed edge table with the rank
    vector co-partitioned instead of broadcast. Unit caveat, also in
    SCALE.md: 85·r·c must fit a BIGINT — at extreme edge weights
    production pre-normalizes c/out(u) into per-edge integer
    probabilities once, keeping the loop arithmetic bounded."""
    from ebike_spark.operators.dedup import _persist_scoped

    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")

    def _edges():
        seq = ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev")
        ).where(F.col("prev").isNotNull())
        e = seq.groupBy(
            F.col("prev").alias("u"), F.col("event_type").alias("v")
        ).agg(F.count("*").alias("c"))
        outs = e.groupBy("u").agg(F.sum("c").alias("outc"))
        # outs is ≤types rows — broadcast, never shuffle-join
        return e.join(F.broadcast(outs), "u")

    edges = _persist_scoped(spark, "pagerank_edges", _edges, key=sf)
    nodes = _persist_scoped(
        spark,
        "pagerank_nodes",
        lambda: ev.select(F.col("event_type").alias("state")).distinct(),
        key=sf,
    )
    n = nodes.count()  # bounded by event-type cardinality
    base = (PR_UNITS * (PR_DEN - PR_DAMP_NUM) // PR_DEN) // n
    r = nodes.select("state", F.lit(PR_UNITS // n).cast("long").alias("r"))
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(F.broadcast(r), edges["u"] == r["state"])
            .select(
                "v",
                F.expr(
                    f"({PR_DAMP_NUM} * r * c) DIV ({PR_DEN} * outc)"
                ).alias("inc"),
            )
            .groupBy("v")
            .agg(F.sum("inc").alias("s"))
        )
        r = nodes.join(
            F.broadcast(contrib), nodes["state"] == contrib["v"], "left"
        ).select(
            "state",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0))).cast("long").alias("r"),
        )
    return r.select("state", F.col("r").alias("rank_units"))
