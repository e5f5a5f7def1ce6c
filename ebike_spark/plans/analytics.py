"""Event-stream analytics (batch side) + grouping extensions.

The reference has no time-series/streaming surface at all (SURVEY §1.5,
§2.B "streaming: none anywhere"); these are the Spark-native extension
operators over the driver's ``events`` table. Each batch query here has
a Structured Streaming twin in ``ebike_spark/streaming/`` — same logical
plan run over ``readStream``.

Timestamps are compared as epoch seconds (BIGINT) on both sides so the
value hash is representation-independent. All window orderings include a
unique tiebreaker (event_id) for determinism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table

SESSION_GAP_SEC = 1800

# Queries in the deferred block below register via _register_late()
# (imported as plans.analytics_late). Historical mechanism: the checked
# prefix used to follow registration order; since round 4 the emission
# order is governed explicitly by plans/registry.WINDOW_PREFIX, so the
# deferral no longer affects windowing — kept only to avoid churning
# module structure. Every query is fully oracled either way (the local
# suite parametrizes over the WHOLE registry).
_LATE: list[tuple[str, str, tuple[str, ...], object]] = []


def _register_deferred(name: str, oracle: str, tags: tuple[str, ...] = ()):
    def deco(fn):
        _LATE.append((name, oracle, tags, fn))
        return fn

    return deco


def _register_late() -> None:
    for name, oracle, tags, fn in _LATE:
        register(name, oracle=oracle, tags=tags)(fn)


@register(
    "ev_tumbling_window",
    oracle="""
    SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS win_start,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM events GROUP BY 1, 2
    """,
    tags=("events", "window-agg", "time"),
)
def ev_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — the batch twin of the streaming
    watermarked window agg. F.window() assigns buckets without a shuffle;
    the groupBy shuffles only (bucket, type) pairs."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


@register(
    "ev_sliding_window",
    oracle="""
    WITH assigned AS (
      SELECT epoch_us(time_bucket(INTERVAL '30 minutes', ts)) - k.k * 1800000000 AS win_start_us,
             event_type, value
      FROM events, (VALUES (0), (1)) k(k))
    SELECT CAST(win_start_us / 1000000 AS BIGINT) AS win_start,
           event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS total
    FROM assigned GROUP BY 1, 2
    """,
    tags=("events", "window-agg", "sliding", "time"),
)
def ev_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding 1-hour window, 30-minute slide: each event lands in
    window/slide = 2 buckets. F.window emits the assignments map-side;
    the oracle reproduces them with an explicit 2-offset expansion."""
    ev = load_table(spark, sf, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type",
            "n",
            "total",
        )
    )


@register(
    "ev_sessionize",
    oracle=f"""
    WITH g AS (
      SELECT user_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_SEC} * 1000000
                       OR LAG(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions
    FROM g GROUP BY user_id
    """,
    tags=("events", "sessionize", "window"),
)
def ev_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Sessionization via lag-gap-cumsum: one shuffle on user_id, linear
    work per partition — the scalable batch equivalent of
    session_window() in streaming."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_micros(F.col("ts"))
    new_s = F.when(
        (epoch - F.lag(epoch).over(w) > SESSION_GAP_SEC * 1_000_000) | F.lag(epoch).over(w).isNull(), 1
    ).otherwise(0)
    return (
        ev.select("user_id", new_s.alias("new_s"))
        .groupBy("user_id")
        .agg(F.sum("new_s").cast("long").alias("n_sessions"))
    )


@register(
    "ev_topk_per_group",
    oracle="""
    SELECT event_type, event_id, value FROM (
      SELECT event_type, event_id, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rn
      FROM events) t
    WHERE rn <= 3
    """,
    tags=("events", "window", "topk"),
)
def ev_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Top-K per group via ranking window; deterministic tiebreak on
    event_id. At scale, a partial per-partition top-K before the shuffle
    (AQE/window group limit pushdown in Spark ≥3.5) bounds data movement."""
    ev = load_table(spark, sf, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    return (
        ev.select("event_type", "event_id", "value", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


@register(
    "ev_asof_join",
    oracle="""
    WITH ordered AS (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
               OVER (PARTITION BY user_id
                     ORDER BY ts, (event_type = 'view') DESC, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_view_us
      FROM events)
    SELECT event_id, epoch_us(ts) AS ts_us, last_view_us
    FROM ordered WHERE event_type = 'purchase'
    """,
    tags=("events", "asof-join", "window"),
)
def ev_asof(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY §2.B notes the
    reference lacks it too): each purchase matched to the latest view at
    or before it, per user. Expressed as union+running-max instead of an
    inequality join: one shuffle on user_id, linear scan — O(n) where the
    naive range join is O(n²) per user. Equal timestamps order views
    before purchases so ties count as 'at or before'."""
    ev = load_table(spark, sf, "events")
    is_view = (F.col("event_type") == "view").cast("int")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), is_view.desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    view_ts = F.when(F.col("event_type") == "view", F.unix_micros(F.col("ts")))
    return (
        ev.select(
            "event_id",
            "event_type",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            F.max(view_ts).over(w).alias("last_view_us"),
        )
        .where(F.col("event_type") == "purchase")
        .select("event_id", "ts_us", "last_view_us")
    )


@_register_deferred(
    "ev_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (event_type = 'click')    AS click,
           COUNT(*) FILTER (event_type = 'error')    AS error,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup')   AS signup,
           COUNT(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
    tags=("events", "pivot"),
)
def ev_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot with an explicit value list (never let pivot scan for
    distinct values at scale — that's an extra job over 100 TB)."""
    ev = load_table(spark, sf, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", types).agg(F.count(F.lit(1)))
    # pivot leaves NULL for absent combos; oracle's FILTER yields 0
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


@_register_deferred(
    "ev_rollup",
    oracle="""
    SELECT event_type, CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day_s,
           COUNT(*) AS n
    FROM events GROUP BY ROLLUP (event_type, day_s)
    """,
    tags=("events", "rollup"),
)
def ev_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """ROLLUP hierarchy (type → day → grand total). Beyond the reference:
    DataFusion 6.0 had no GROUPING SETS (SURVEY §2.B); Spark's rollup is
    a single pass with grouping-id expansion."""
    ev = load_table(spark, sf, "events")
    day_s = F.date_trunc("day", F.col("ts")).cast("long").alias("day_s")
    return ev.select("event_type", day_s).rollup("event_type", "day_s").agg(F.count("*").alias("n"))


@_register_deferred(
    "json_map_explode",
    oracle="""
    WITH ks AS (
      SELECT event_id, user_id, unnest(json_keys(props)) AS k,
             CAST(json_extract(props, '$.k') AS BIGINT) AS v
      FROM events)
    SELECT k, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS total,
           COUNT(DISTINCT user_id) AS users
    FROM ks GROUP BY k
    """,
    tags=("events", "json", "map", "semi-structured"),
)
def ev_json_map(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured → MapType: from_json into map<string,bigint>,
    explode entries, aggregate per key. The parse + explode are
    JVM-side (Jackson); MapType is another Spark type family the
    reference's 3-type system cannot represent."""
    ev = load_table(spark, sf, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select("event_id", "user_id", F.explode(m).alias("k", "v"))
        .groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").cast("long").alias("total"),
            F.count_distinct("user_id").alias("users"),
        )
    )


@_register_deferred(
    "json_extract_props",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events WHERE event_type = 'click'
    """,
    tags=("events", "json", "semi-structured"),
)
def ev_json(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured extraction: get_json_object stays JVM-side
    (Jackson) — no Python UDF for JSON at scale."""
    ev = load_table(spark, sf, "events")
    return ev.where(F.col("event_type") == "click").select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )


FUNNEL_STAGES = ("view", "click", "purchase")


@register(
    "ev_funnel",
    oracle="""
    WITH f1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY 1),
    f2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
           JOIN f1 ON e.user_id = f1.user_id
           WHERE e.event_type = 'click' AND e.ts > f1.t1 GROUP BY 1),
    f3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
           JOIN f2 ON e.user_id = f2.user_id
           WHERE e.event_type = 'purchase' AND e.ts > f2.t2 GROUP BY 1)
    SELECT * FROM (
      SELECT CAST(1 AS INTEGER) AS stage_idx, 'view' AS stage,
             (SELECT COUNT(*) FROM f1) AS n_users
      UNION ALL
      SELECT CAST(2 AS INTEGER), 'click', (SELECT COUNT(*) FROM f2)
      UNION ALL
      SELECT CAST(3 AS INTEGER), 'purchase', (SELECT COUNT(*) FROM f3))
    WHERE n_users > 0
    """,
    tags=("events", "funnel", "sequence"),
)
def ev_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered funnel (view → click → purchase): how many users reached
    each stage, where stage k+1 must occur STRICTLY after the user's
    first qualifying stage-k event.

    Spark-first shape is the single-shuffle sorted scan (the
    windowFunnel pattern from event-analytics engines): one groupBy
    user_id collects the user's (t, type) events sorted, then a
    Catalyst `aggregate` HOF advances a (stage, t) accumulator in one
    linear pass — entirely JVM-side, no Python. The oracle's
    equivalent nested-min formulation needs one self-join per stage
    (three user_id shuffles where this plan pays one); both agree
    because a sorted greedy scan with strict-> advancement computes
    exactly first-view, first-click-after, first-purchase-after.

    Scale note: per-user state is that user's filtered event list —
    the same per-key bound sessionization's window sort pays; heavy
    users are bounded by the stage-type filter pushed to the scan."""
    return funnel_counts(load_table(spark, sf, "events"))


def funnel_counts(ev: DataFrame) -> DataFrame:
    """The funnel plan over any events-shaped DataFrame (used by the
    registered query and the 10× scale probe)."""
    stage_arr = F.array(*[F.lit(s) for s in FUNNEL_STAGES])
    n_stages = len(FUNNEL_STAGES)
    evs = ev.where(F.col("event_type").isin(*FUNNEL_STAGES)).select(
        "user_id",
        F.struct(F.unix_micros("ts").alias("t"), F.col("event_type").alias("et")).alias("e"),
    )
    init = F.struct(F.lit(0).alias("s"), F.lit(0).cast("long").alias("t"))

    def step(acc, x):
        # least() keeps element_at's index in range when the funnel is
        # already complete (ANSI mode errors on out-of-bound indices).
        want = F.element_at(stage_arr, F.least(acc["s"] + 1, F.lit(n_stages)))
        can = (
            (acc["s"] < n_stages)
            & (x["et"] == want)
            & ((acc["s"] == 0) | (x["t"] > acc["t"]))
        )
        return F.when(
            can, F.struct((acc["s"] + 1).alias("s"), x["t"].alias("t"))
        ).otherwise(acc)

    reached = (
        evs.groupBy("user_id")
        .agg(F.array_sort(F.collect_list("e")).alias("seq"))
        .select(F.aggregate("seq", init, step)["s"].alias("s"))
        .where(F.col("s") >= 1)
    )
    return (
        reached.select(F.explode(F.sequence(F.lit(1), F.col("s"))).alias("stage_idx"))
        .groupBy("stage_idx")
        .agg(F.count("*").alias("n_users"))
        .select(
            "stage_idx",
            F.element_at(stage_arr, F.col("stage_idx")).alias("stage"),
            "n_users",
        )
    )


RETENTION_OFFSETS = (0, 1, 7, 14)


@register(
    "ev_retention",
    oracle=f"""
    WITH fa AS (SELECT user_id,
                       CAST(epoch(date_trunc('day', MIN(ts))) AS BIGINT) AS d0
                FROM events GROUP BY 1),
    act AS (SELECT DISTINCT user_id,
                   CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS d
            FROM events)
    SELECT d0 AS cohort_day_s,
           CAST((d - d0) // 86400 AS INTEGER) AS day_offset,
           COUNT(*) AS n_users
    FROM act JOIN fa USING (user_id)
    WHERE (d - d0) // 86400 IN {RETENTION_OFFSETS}
    GROUP BY 1, 2
    """,
    tags=("events", "retention", "cohort"),
)
def ev_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity day,
    counted again on day 0/+1/+7/+14. No join at all: the first
    activity day is a min-over-user window on the distinct (user, day)
    activity set — one partial-aggregated distinct shuffle, one
    user_id window exchange, then a tiny cohort×offset aggregate (the
    oracle spells the same thing as an aggregate + join). Days are
    epoch-second BIGINTs on both sides so the value hash is
    representation-independent."""
    return retention_matrix(load_table(spark, sf, "events"))


def retention_matrix(ev: DataFrame) -> DataFrame:
    """The retention plan over any events-shaped DataFrame (used by the
    registered query and the 10× scale probe)."""
    act = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("long").alias("d")
    ).distinct()
    d0 = F.min("d").over(Window.partitionBy("user_id"))
    off = ((F.col("d") - F.col("d0")) / F.lit(86400)).cast("int")
    return (
        act.withColumn("d0", d0)
        .select(F.col("d0").alias("cohort_day_s"), off.alias("day_offset"))
        .where(F.col("day_offset").isin(*RETENTION_OFFSETS))
        .groupBy("cohort_day_s", "day_offset")
        .agg(F.count("*").alias("n_users"))
    )


ANOMALY_Z = 3.0


@register(
    "ev_anomaly_zscore",
    oracle=f"""
    WITH s AS (SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
               FROM events GROUP BY 1)
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.m) / s.sd, 4) AS z
    FROM events e JOIN s USING (event_type)
    WHERE ABS((e.value - s.m) / s.sd) >= {ANOMALY_Z}
    """,
    tags=("events", "anomaly", "stats"),
)
def ev_anomaly(spark: SparkSession, sf: str) -> DataFrame:
    """Per-type z-score outlier detection: events whose value deviates
    ≥ {ANOMALY_Z}σ from their event_type's mean — the standard telemetry
    anomaly sweep.

    Two-pass shape, both passes linear: (1) groupBy event_type computes
    a stats table with one row per type (map-side partial agg → tiny
    shuffle); (2) the stats table is broadcast back onto the scan, so
    the flagging pass is shuffle-free — no window over event_type,
    which would shuffle the whole fact table to compute 5 numbers.
    At 100 TB only pass 1's partial aggregates move (bytes per
    partition × types), and pass 2 is embarrassingly parallel."""
    return anomaly_zscore(load_table(spark, sf, "events"))


def anomaly_zscore(ev: DataFrame, z_threshold: float = ANOMALY_Z) -> DataFrame:
    """The anomaly plan over any events-shaped DataFrame (used by the
    registered query and the 10× scale probe)."""
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) >= z_threshold)
        .select("event_id", "event_type", "value", F.round(z, 4).alias("z"))
    )


MAD_K = 3  # flag days whose deviation from the median exceeds K × MAD


@register(
    "ev_anomaly_mad",
    oracle=f"""
    WITH d AS (
      SELECT event_type, date_trunc('day', ts) AS d, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    m AS (SELECT event_type, median(n) AS med FROM d GROUP BY 1),
    dev AS (
      SELECT d.event_type, d.d, d.n, m.med, ABS(d.n - m.med) AS ad
      FROM d JOIN m USING (event_type)),
    md AS (SELECT event_type, median(ad) AS mad FROM dev GROUP BY 1)
    SELECT dev.event_type,
           CAST(epoch_us(dev.d) // 1000000 AS BIGINT) AS day_start,
           CAST(dev.n AS BIGINT) AS n, dev.med, md.mad
    FROM dev JOIN md USING (event_type)
    WHERE ABS(dev.n - dev.med) > {MAD_K} * md.mad
    """,
    tags=("events", "anomaly", "robust-stats"),
)
def ev_anomaly_mad(spark: SparkSession, sf: str) -> DataFrame:
    """Robust daily-volume anomaly sweep: per event_type, days whose
    event COUNT deviates from the type's median by more than
    {MAD_K} × MAD (median absolute deviation). The z-score twin's
    robust cousin — median/MAD shrug off the very outliers they hunt,
    so a single burst day can't inflate the threshold and mask itself
    (the classic failure of mean/σ on bursty telemetry). Both engines
    interpolate the median identically (R-7) over INTEGER day counts,
    so med/mad are exact binary fractions (k or k.5 / quarter steps)
    and the strict comparison can't diverge on a ulp.

    Scale shape: the raw scan reduces ONCE to types × days counts
    (map-side partials — the only event-volume pass); both medians are
    PERCENTILE WINDOW functions over that calendar-bounded frame,
    chained on ONE event_type exchange (the r12 aggregate-then-window
    recipe — the former agg + broadcast-join-back pair cost two
    percentile agg stages plus two broadcast-build jobs per run, 8
    jobs total vs 4 after; r13 job-count audit). No window over raw
    events, no data-sized sort: the windows run over types × days
    rows, which stays tiny at any event volume."""
    ev = load_table(spark, sf, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type")
    dev = daily.withColumn(
        "med", F.percentile("n", F.lit(0.5)).over(w)
    ).withColumn("ad", F.abs(F.col("n") - F.col("med")))
    return (
        dev.withColumn("mad", F.percentile("ad", F.lit(0.5)).over(w))
        .where(F.abs(F.col("n") - F.col("med")) > MAD_K * F.col("mad"))
        .select(
            "event_type",
            F.col("d").cast("long").alias("day_start"),
            "n",
            "med",
            "mad",
        )
    )


@register(
    "ev_survival_hazard",
    oracle="""
    WITH u AS (
      SELECT user_id, MIN(epoch_us(ts)) AS ft, MAX(epoch_us(ts)) AS lt
      FROM events GROUP BY 1),
    g AS (SELECT MAX(epoch_us(ts)) AS gmax FROM events),
    lab AS (
      SELECT (lt - ft) // 86400000000 AS d,
             CASE WHEN lt > g.gmax - 7 * 86400000000 THEN 1 ELSE 0 END AS cens
      FROM u, g),
    byday AS (
      SELECT d,
             CAST(COUNT(*) FILTER (WHERE cens = 0) AS BIGINT) AS deaths,
             CAST(COUNT(*) FILTER (WHERE cens = 1) AS BIGINT) AS censored,
             COUNT(*) AS ending
      FROM lab GROUP BY 1),
    r AS (
      SELECT d, deaths, censored,
             CAST(SUM(ending) OVER (ORDER BY d DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS at_risk
      FROM byday)
    SELECT CAST(d AS BIGINT) AS day, at_risk, deaths, censored,
           deaths / at_risk AS hazard
    FROM r
    """,
    tags=("events", "survival", "churn"),
)
def ev_survival_hazard(spark: SparkSession, sf: str) -> DataFrame:
    """Discrete-time survival/churn table (Kaplan-Meier style): each
    user's observed lifetime is last-event - first-event in whole days;
    users whose last event falls within 7 days of the corpus horizon
    are right-CENSORED (still alive), everyone else "dies" on their
    lifetime day. Emits the life table per day: at-risk count (users
    whose lifetime reaches the day), deaths, censored exits, and the
    discrete hazard deaths/at_risk. The KM survival curve is the
    running product of (1 - hazard) downstream; the hazard itself is
    ONE IEEE division of two exact BIGINTs per row — bit-identical
    across engines (the repo's integer-exact house rule), which a
    cumulative float product would not be.

    Scale shape: the event scan partial-aggregates to one row per user
    (min/max — map-side combine, users << events); the horizon is a
    1-row broadcast; the life table collapses to the lifetime-day axis
    (bounded by corpus span, ~constant), so the reverse-cumulative
    at-risk window runs over a constant-sized frame — the same
    bounded-axis discipline as ev_pareto_share's decile window."""
    ev = load_table(spark, sf, "events")
    t = F.unix_micros(F.col("ts"))
    u = ev.groupBy("user_id").agg(
        F.min(t).alias("ft"), F.max(t).alias("lt")
    )
    g = ev.agg(F.max(t).alias("gmax"))
    day_us = 86_400_000_000
    lab = u.crossJoin(F.broadcast(g)).select(
        F.expr(f"(lt - ft) DIV {day_us}").alias("d"),
        F.when(F.col("lt") > F.col("gmax") - 7 * day_us, 1).otherwise(0).alias("cens"),
    )
    byday = lab.groupBy("d").agg(
        F.count(F.when(F.col("cens") == 0, 1)).alias("deaths"),
        F.count(F.when(F.col("cens") == 1, 1)).alias("censored"),
        F.count("*").alias("ending"),
    )
    w = Window.orderBy(F.col("d").desc()).rowsBetween(Window.unboundedPreceding, 0)
    return byday.select(
        F.col("d").alias("day"),
        F.sum("ending").over(w).alias("at_risk"),
        "deaths",
        "censored",
        (F.col("deaths") / F.sum("ending").over(w)).alias("hazard"),
    )


@register(
    "ev_ab_test_ztest",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY 1),
    lab AS (
      SELECT CASE WHEN (user_id * 2654435761) % 4294967296 >= 2147483648
                  THEN 1 ELSE 0 END AS v,
             conv
      FROM u),
    agg AS (
      SELECT CAST(COUNT(*) FILTER (WHERE v = 0) AS BIGINT) AS n_a,
             CAST(SUM(conv) FILTER (WHERE v = 0) AS BIGINT) AS conv_a,
             CAST(COUNT(*) FILTER (WHERE v = 1) AS BIGINT) AS n_b,
             CAST(SUM(conv) FILTER (WHERE v = 1) AS BIGINT) AS conv_b
      FROM lab)
    SELECT n_a, conv_a, n_b, conv_b,
           conv_a / n_a AS rate_a, conv_b / n_b AS rate_b,
           (conv_a / n_a - conv_b / n_b)
             / sqrt(((conv_a + conv_b) / (n_a + n_b))
                    * (1.0 - (conv_a + conv_b) / (n_a + n_b))
                    * (1.0 / n_a + 1.0 / n_b)) AS z_score
    FROM agg
    """,
    tags=("events", "experiment", "ab-test"),
)
def ev_ab_test_ztest(spark: SparkSession, sf: str) -> DataFrame:
    """Two-proportion z-test for a hash-split A/B experiment: each user
    is assigned a variant by the TOP bit of a 32-bit Knuth
    multiplicative hash (the low bit of user_id * odd would just be
    user_id's own parity — the classic bucketing mistake), conversion
    is any 'purchase' event, and the emitted z-score is the pooled
    two-proportion statistic. Every input to the float expression is
    an exact BIGINT and the expression tree is written identically on
    both engines (divisions, one sqrt) — deterministic IEEE, so the
    z-score itself hash-matches, not just the counts.

    Scale shape: one user-keyed partial aggregate (MAX of a predicate
    — map-side combine), the variant label is a pure projection, and
    the final aggregate collapses to a single row via conditional
    counts. No window, no join; at 10⁹ users this is the cheapest
    possible two-pass shape."""
    ev = load_table(spark, sf, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv")
    )
    lab = u.select(
        F.when(
            (F.col("user_id") * F.lit(2654435761)) % F.lit(4294967296)
            >= F.lit(2147483648),
            1,
        )
        .otherwise(0)
        .alias("v"),
        "conv",
    )
    agg = lab.agg(
        F.count(F.when(F.col("v") == 0, 1)).alias("n_a"),
        F.sum(F.when(F.col("v") == 0, F.col("conv"))).alias("conv_a"),
        F.count(F.when(F.col("v") == 1, 1)).alias("n_b"),
        F.sum(F.when(F.col("v") == 1, F.col("conv"))).alias("conv_b"),
    )
    rate_a = F.col("conv_a") / F.col("n_a")
    rate_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return agg.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        rate_a.alias("rate_a"),
        rate_b.alias("rate_b"),
        ((rate_a - rate_b) / se).alias("z_score"),
    )


@register(
    "ev_trend_theil_sen",
    oracle="""
    WITH d AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    p AS (
      SELECT a.event_type, (b.n - a.n) / (b.day - a.day) AS slope
      FROM d a JOIN d b ON a.event_type = b.event_type AND b.day > a.day),
    s AS (
      SELECT event_type, median(slope) AS slope_med,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM p GROUP BY 1),
    i AS (
      SELECT d.event_type, median(d.n - s.slope_med * d.day) AS intercept_med
      FROM d JOIN s USING (event_type) GROUP BY 1)
    SELECT s.event_type, s.n_pairs, s.slope_med, i.intercept_med
    FROM s JOIN i USING (event_type)
    """,
    tags=("events", "trend", "robust"),
)
def ev_trend_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-Sen robust trend per event type: the median of all
    pairwise day-over-day slopes of the daily count series (and the
    median intercept given that slope) — the estimator that shrugs off
    the outlier days OLS would chase, the standard robust-trend readout
    for volume monitoring. Each pairwise slope is ONE IEEE division of
    two exact BIGINTs; the median is Spark's exact R-7 percentile over
    those deterministic doubles (the ev_anomaly_mad parity pattern), so
    the result hash-matches DuckDB's median exactly.

    Scale shape: events collapse to the types × days frame FIRST
    (map-side partials — the only event-volume pass, shared via
    persist); the quadratic pair join runs on the bounded DAY axis
    (span² pairs per type, ~constant), never on events. Same
    bounded-axis discipline as the survival life table."""
    from ebike_spark.operators.dedup import _persist_scoped

    ev = load_table(spark, sf, "events")
    daily = _persist_scoped(
        spark,
        "theil_sen_daily",
        lambda: ev.groupBy(
            "event_type",
            # integer DIV, never float-divide-then-cast (house rule)
            F.expr("unix_micros(ts) DIV 86400000000").alias("day"),
        ).agg(F.count("*").alias("n")),
        key=sf,
    )
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("b.day") > F.col("a.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        ((F.col("b.n") - F.col("a.n")) / (F.col("b.day") - F.col("a.day"))).alias(
            "slope"
        ),
    )
    s = pairs.groupBy("event_type").agg(
        F.percentile("slope", F.lit(0.5)).alias("slope_med"),
        F.count("*").alias("n_pairs"),
    )
    # n_pairs/slope_med are constant per type after the join, so
    # FIRST carries them through the intercept aggregate — the former
    # final `s JOIN i` re-executed the whole pairs-median subtree for
    # the second reference (8 jobs vs 5 after; r13 job-count audit)
    return (
        daily.join(s, "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n_pairs").alias("n_pairs"),
            F.first("slope_med").alias("slope_med"),
            F.percentile(
                F.col("n") - F.col("slope_med") * F.col("day"), F.lit(0.5)
            ).alias("intercept_med"),
        )
        .select("event_type", "n_pairs", "slope_med", "intercept_med")
    )


@register(
    "ev_lifecycle_stages",
    oracle="""
    WITH g AS (SELECT MAX(epoch_us(ts)) AS gmax FROM events),
    u AS (
      SELECT user_id,
             (g.gmax - MAX(epoch_us(ts))) // 86400000000 AS rec_d,
             (g.gmax - MIN(epoch_us(ts))) // 86400000000 AS age_d,
             COUNT(*) AS n
      FROM events, g GROUP BY user_id, g.gmax),
    lab AS (
      SELECT CASE WHEN age_d < 7 THEN 'new'
                  WHEN rec_d < 7 THEN 'active'
                  WHEN rec_d < 14 THEN 'at_risk'
                  ELSE 'churned' END AS stage,
             n
      FROM u)
    SELECT stage, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n) AS BIGINT) AS n_events
    FROM lab GROUP BY stage
    """,
    tags=("events", "lifecycle", "retention"),
)
def ev_lifecycle_stages(spark: SparkSession, sf: str) -> DataFrame:
    """User lifecycle classification — the stage split every retention
    dashboard opens with: 'new' (first seen within 7 days of the
    horizon), 'active' (seen within 7 days), 'at_risk' (7-14 days
    silent), 'churned' (older). Recency and age are integer day DIVs
    from the corpus horizon (one broadcast scalar), so the
    classification is exact; stage counts and event mass are plain
    BIGINTs.

    Scale shape: one user-keyed partial aggregate (MIN/MAX/COUNT
    map-side combine — the only event-volume pass), a 1-row horizon
    broadcast, then a constant-4-row groupBy. Same two-aggregate shape
    as ev_ab_test_ztest."""
    ev = load_table(spark, sf, "events")
    t = F.unix_micros(F.col("ts"))
    day_us = 86_400_000_000
    u = ev.groupBy("user_id").agg(
        F.min(t).alias("ft"), F.max(t).alias("lt"), F.count("*").alias("n")
    )
    g = ev.agg(F.max(t).alias("gmax"))
    lab = u.crossJoin(F.broadcast(g)).select(
        F.when(F.expr(f"(gmax - ft) DIV {day_us}") < 7, "new")
        .when(F.expr(f"(gmax - lt) DIV {day_us}") < 7, "active")
        .when(F.expr(f"(gmax - lt) DIV {day_us}") < 14, "at_risk")
        .otherwise("churned")
        .alias("stage"),
        "n",
    )
    return lab.groupBy("stage").agg(
        F.count("*").alias("n_users"), F.sum("n").alias("n_events")
    )
