"""SURVEY §2.C declared query set — the relational surface the reference
reaches through DataFusion 6.0 (/root/reference/src/execute_impl/select.rs:41-81),
re-expressed as Catalyst logical plans via the DataFrame API.

Per-query scale notes are in each docstring: these plans are written so
that at 100 TB the scan prunes columns + pushes filters, small dims are
broadcast, and aggregates run partial/final (map-side combine) — all of
which Catalyst does when the plan is declared this way.

FP determinism: double aggregates are ROUNDed identically on the Spark
and oracle sides (sum→2dp, avg/stat→4dp) so the value-hash compare is
insensitive to summation order across partitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


@register(
    "q01_scan_filter_topk",
    oracle="""
    SELECT l_orderkey, l_quantity, l_extendedprice FROM lineitem
    WHERE l_quantity > 30 ORDER BY l_orderkey, l_linenumber LIMIT 100
    """,
    tags=("scan", "filter", "sort", "limit"),
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    """Scan+project+filter+top-k. Filter and 4-column projection reach the
    parquet scan (PushedFilters / ReadSchema); ORDER BY+LIMIT compiles to
    TakeOrderedAndProject — per-partition top-k, no global sort, which is
    the plan that survives 100 TB."""
    li = _t(spark, sf, "lineitem")
    return (
        li.where(F.col("l_quantity") > 30)
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
    )


@register(
    "q02_group_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           MIN(l_discount) AS min_disc, MAX(l_tax) AS max_tax
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    tags=("aggregate",),
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q1-style hash aggregate. Low-cardinality grouping keys →
    two-phase partial/final aggregation; the shuffle moves only ~6 groups
    per partition regardless of input size."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_tax").alias("max_tax"),
    )


@register(
    "q03_join_agg",
    oracle="""
    SELECT c.c_mktsegment, COUNT(*) AS n FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("join", "aggregate"),
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    """Inner equi-join + agg. customer is the smaller side; at bench
    scale AQE broadcasts it (no shuffle of orders). Deliberately NOT an
    explicit broadcast() hint: hints are unconditional and AQE cannot
    override them — measured at 10× data, force-broadcasting the grown
    customer side was 1.6× SLOWER than the sort-merge join AQE picks
    (BENCH_NOTES '10× probe'). Hint only constant-size tables (nation,
    region); let runtime stats govern everything that grows."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q04_left_join_agg",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS n FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey ORDER BY n DESC, c.c_custkey LIMIT 50
    """,
    tags=("join", "outer", "aggregate", "limit"),
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    """Left outer join with a null-producing side; COUNT(col) ignores
    nulls. Equivalent scale plan: pre-aggregate orders by custkey before
    the join so the outer join moves one row per customer, not one per
    order — done here explicitly (partial-agg-below-join), which is the
    100 TB-safe shape."""
    c = _t(spark, sf, "customer")
    per_cust = _t(spark, sf, "orders").groupBy("o_custkey").agg(F.count("o_orderkey").alias("_n"))
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select("c_custkey", F.coalesce("_n", F.lit(0)).alias("n"))
        .orderBy(F.desc("n"), "c_custkey")
        .limit(50)
    )


@register(
    "q05_join_chain",
    oracle="""
    SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("join", "aggregate"),
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    """3-way join chain + agg (TPC-H Q5 skeleton). The fact-fact join
    (orders⋈lineitem on the orderkey) runs first, over the BUCKETED
    managed copies — both sides pre-hashed and pre-sorted on the key, so
    that join needs no Exchange at any scale (plan-asserted in
    tests/test_scale_plans.py). customer joins the result on custkey
    (AQE broadcast at bench SF, shuffle when it outgrows the threshold);
    nation is constant-size → always broadcast; revenue aggregates
    partial-side before the final shuffle."""
    c = _t(spark, sf, "customer")
    o = load_table(spark, sf, "orders", bucketed=True)
    li = load_table(spark, sf, "lineitem", bucketed=True)
    n = _t(spark, sf, "nation")
    return (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q06_selective_sum",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS rev FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
      AND l_linestatus IN ('F', 'O')
    """,
    tags=("filter", "aggregate"),
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H-Q6-style selective scan: every predicate is parquet-pushable
    (min/max row-group skipping at scale); grand total = partial sums, one
    row shuffled per partition."""
    li = _t(spark, sf, "lineitem")
    return (
        li.where(
            F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
            & F.col("l_linestatus").isin("F", "O")
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("rev"))
    )


@register(
    "q07_count_distinct",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS u FROM orders",
    tags=("aggregate", "distinct"),
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    """Exact COUNT(DISTINCT): Catalyst expands to a two-stage partial
    dedup (the DataFusion single-distinct rewrite the reference inherits,
    SURVEY §4.2, is the same idea)."""
    return _t(spark, sf, "orders").agg(F.count_distinct("o_custkey").alias("u"))


@register(
    "q08a_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def q08a(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT → Catalyst rewrites to distinct + left-semi hash join."""
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s)


@register(
    "q08b_except",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT SELECT s_nationkey FROM supplier
    """,
    tags=("setop",),
)
def q08b(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT → distinct + left-anti hash join."""
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.subtract(s)


@register(
    "q08c_union_all",
    oracle="""
    SELECT c_custkey AS k FROM customer WHERE c_custkey < 10
    UNION ALL SELECT o_custkey FROM orders WHERE o_custkey < 10
    """,
    tags=("setop",),
)
def q08c(spark: SparkSession, sf: str) -> DataFrame:
    """UNION ALL is a no-shuffle concatenation of partition lists."""
    c = _t(spark, sf, "customer").where(F.col("c_custkey") < 10).select(F.col("c_custkey").alias("k"))
    o = _t(spark, sf, "orders").where(F.col("o_custkey") < 10).select(F.col("o_custkey").alias("k"))
    return c.unionAll(o)


@register(
    "q08d_intersect_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45
    INTERSECT ALL SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08
    """,
    tags=("setop", "multiset"),
)
def q08d(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics ([DF6] set-op row): kept
    multiplicity = min(count_left, count_right) per value."""
    li = _t(spark, sf, "lineitem")
    a = li.where(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("k"))
    b = li.where(F.col("l_discount") > 0.08).select(F.col("l_suppkey").alias("k"))
    return a.intersectAll(b)


@register(
    "q08e_except_all",
    oracle="""
    SELECT l_suppkey AS k FROM lineitem WHERE l_quantity > 45
    EXCEPT ALL SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08
    """,
    tags=("setop", "multiset"),
)
def q08e(spark: SparkSession, sf: str) -> DataFrame:
    """EXCEPT ALL — kept multiplicity = count_left - count_right."""
    li = _t(spark, sf, "lineitem")
    a = li.where(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("k"))
    b = li.where(F.col("l_discount") > 0.08).select(F.col("l_suppkey").alias("k"))
    return a.exceptAll(b)


@register(
    "q09_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           RANK()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk,
           LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev
    FROM orders WHERE o_custkey < 100
    """,
    tags=("window",),
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking + analytic window functions. One shuffle on the PARTITION
    BY key serves all three functions (Catalyst collapses same-spec
    windows); at scale the filter prunes before the shuffle."""
    o = _t(spark, sf, "orders").where(F.col("o_custkey") < 100)
    w_rank = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    w_rk = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"))
    w_lag = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.row_number().over(w_rank).alias("rn"),
        F.rank().over(w_rk).alias("rk"),
        F.lag("o_totalprice").over(w_lag).alias("prev"),
    )


@register(
    "q10_case_scalar_funcs",
    oracle="""
    SELECT upper(n_name) AS nm, length(n_name) AS ln,
           CASE WHEN n_regionkey < 2 THEN 'west' ELSE 'east' END AS side,
           round(sqrt(abs(n_nationkey)), 3) AS r
    FROM nation
    """,
    tags=("scalar", "case"),
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    """CASE + string/math scalar functions — all JVM-side builtins inside
    whole-stage codegen; no Python in the hot path."""
    n = _t(spark, sf, "nation")
    return n.select(
        F.upper("n_name").alias("nm"),
        F.length("n_name").cast("int").alias("ln"),
        F.when(F.col("n_regionkey") < 2, "west").otherwise("east").alias("side"),
        F.round(F.sqrt(F.abs("n_nationkey")), 3).alias("r"),
    )


@register(
    "q11_cte_having",
    oracle="""
    WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS q FROM lineitem
                 GROUP BY l_orderkey)
    SELECT q, COUNT(*) AS n FROM big WHERE q > 250 GROUP BY q
    ORDER BY q LIMIT 20
    """,
    tags=("cte", "aggregate"),
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    """Derived-table/CTE + re-aggregation (TPC-H Q18 skeleton).
    l_quantity is integer-valued so SUM is exact in double → grouping by
    the computed q is deterministic. Reads the lineitem copy bucketed on
    l_orderkey: the per-order rollup's required distribution is already
    satisfied by the scan, so the heavy first aggregate (one group per
    order) runs with NO shuffle — only the tiny q-histogram exchanges."""
    li = load_table(spark, sf, "lineitem", bucketed=True)
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    return (
        big.where(F.col("q") > 250)
        .groupBy("q")
        .agg(F.count("*").alias("n"))
        .orderBy("q")
        .limit(20)
    )


@register(
    "q12_cross_theta",
    oracle="""
    SELECT r1.r_regionkey AS k1, r2.r_regionkey AS k2 FROM region r1, region r2
    WHERE r1.r_regionkey < r2.r_regionkey
    """,
    tags=("join", "cross"),
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    """Theta join as broadcast-nested-loop over a constant-size table.
    (Cross joins are only ever sane when one side is tiny — as here.)"""
    r1 = _t(spark, sf, "region").select(F.col("r_regionkey").alias("k1"))
    r2 = _t(spark, sf, "region").select(F.col("r_regionkey").alias("k2"))
    return r1.join(F.broadcast(r2), r1.k1 < r2.k2, "inner")


@register(
    "q13_stat_aggs",
    oracle="""
    SELECT ROUND(stddev_pop(l_quantity), 4) AS sd,
           ROUND(var_pop(l_quantity), 4) AS vp,
           ROUND(corr(l_quantity, l_extendedprice), 4) AS co
    FROM lineitem
    """,
    tags=("aggregate", "stats"),
)
def q13_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Statistical aggregates (DF6 parity: VAR/STDDEV/CORR). Spark's
    implementations are single-pass, partial-mergeable (Welford) —
    distribution-safe."""
    li = _t(spark, sf, "lineitem")
    return li.agg(
        F.round(F.stddev_pop("l_quantity"), 4).alias("sd"),
        F.round(F.var_pop("l_quantity"), 4).alias("vp"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("co"),
    )


@register(
    "q13_approx_distinct",
    # Verdict shape (the ev_active_users_hll / ANN discipline, round 7
    # — was rows-only; TIGHTENED r10 from ±5% to ±3%, VERDICT-r9 task
    # 4): the HLL++ ESTIMATE is engine-specific, so the externally
    # checked output is the exact distinct count plus a boolean
    # asserting the estimate landed within ±3% (default rsd=0.05;
    # measured deviation 2.4-2.7% at all three fixture SFs —
    # deterministic, the sketch has no randomness at fixed data, so
    # the bound sits just above the measured band and an estimator
    # regression flips it). The oracle is trivially exact. In the
    # 100 TB production shape the exact branch is dropped and the
    # estimate stands alone.
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS est_within_3pct
    FROM lineitem
    """,
    tags=("aggregate", "approx", "verdict"),
)
def q13_approx(spark: SparkSession, sf: str) -> DataFrame:
    """approx_count_distinct (HLL++) with a bounds-checked verdict.
    Sketches merge associatively → constant memory per partition at any
    scale; the exact audit twin exists for external checkability and is
    what a pipeline drops first at scale."""
    li = _t(spark, sf, "lineitem")
    r = li.agg(
        F.approx_count_distinct("l_partkey").alias("a"),
        F.count_distinct("l_partkey").alias("e"),
    )
    return r.select(
        F.col("e").cast("long").alias("exact_parts"),
        (F.abs(F.col("a") - F.col("e")) <= 0.03 * F.col("e")).alias(
            "est_within_3pct"
        ),
    )


Q13B_QUANTILES = (0.5, 0.9, 0.99)
Q13B_ACCURACY = 10000  # GK sketch: rank error <= n/accuracy per group


def _q13b_rank_audit(li: DataFrame, est: DataFrame):
    """(ranks frame, ok column) for the GK rank-guarantee audit: one
    more scan of ``li`` joined to the ≤flags-row ``est`` frame
    (broadcast WHOLE — every non-key est column is carried through the
    audit aggregate via FIRST, so the caller reads the estimates out
    of ``ranks`` and never references ``est`` twice), counting
    strictly-below / at-or-below each picked value per group —
    map-side partial aggs, one shuffle on the group key, no sort. The
    ok column asserts each value's true rank interval
    [lt+1, le] reaches within ceil(n·eps)+1 of the target rank q·n.
    Factored out so the unit suite can negative-control it with a
    corrupted estimate (the constant-TRUE trap the verdict recipe
    warns about)."""
    aud = li.join(F.broadcast(est), "l_returnflag")
    # carry the estimate frame's columns THROUGH the audit aggregate
    # (constant per group key) so the caller never re-joins est — a
    # second reference would re-run the whole percentile aggregate
    # (no exchange reuse across join branches; measured r14)
    cnt_aggs = [F.count("*").alias("n")] + [
        F.first(c).alias(c) for c in est.columns if c != "l_returnflag"
    ]
    for i in range(len(Q13B_QUANTILES)):
        v = F.col("ap")[i]
        cnt_aggs.append(
            F.sum((F.col("l_extendedprice") < v).cast("long")).alias(f"lt{i}")
        )
        cnt_aggs.append(
            F.sum((F.col("l_extendedprice") <= v).cast("long")).alias(f"le{i}")
        )
    ranks = aud.groupBy("l_returnflag").agg(*cnt_aggs)
    ok = F.lit(True)
    for i, q in enumerate(Q13B_QUANTILES):
        tgt = F.lit(q) * F.col("n")
        slack = F.ceil(F.col("n") / Q13B_ACCURACY) + F.lit(1)
        ok = (
            ok
            & (F.col(f"lt{i}") + 1 <= tgt + slack)
            & (F.col(f"le{i}") >= tgt - slack)
        )
    return ranks, ok


@register(
    "q13b_approx_percentile",
    # Verdict shape (round 7 — rows-only; r10 ±0.2% relative band;
    # PROMOTED r11, VERDICT-r10 task 5): exact value-pinning was probed
    # and REJECTED — percentile_approx's picked value is NOT
    # partitioning-stable (measured: repartition(4/16/32/64/97) each
    # select different elements at every SF), so a pinned literal
    # would be a flake under the driver's parallelism. What IS
    # invariant is the Greenwald-Khanna contract itself: the returned
    # value's rank interval must sit within ceil(n/accuracy)+1 ranks
    # of the target rank q·n (the +1 absorbs the fractional-target
    # convention; measured worst case across 5 partitionings × 3 SFs:
    # 2.0 ranks at sf0.01 where the bound allows 3, 20 at sf0.1 where
    # it allows 21 — the bound BITES). The checked boolean is now a
    # per-run PROOF of the sketch's theorem rather than a measured
    # fuzz band: any estimator regression beyond the documented
    # guarantee flips it at every SF, known fixture or not.
    # percentiles emit UNROUNDED (float-parity house rule: both
    # engines interpolate a + (b-a)*frac over bit-identical doubles, so
    # the results are identical doubles — a trailing ROUND would
    # reintroduce the near-half divergence the rule exists to avoid)
    oracle="""
    SELECT l_returnflag,
           CAST(quantile_cont(l_extendedprice, 0.5)  AS DOUBLE) AS p50_exact,
           CAST(quantile_cont(l_extendedprice, 0.9)  AS DOUBLE) AS p90_exact,
           CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE) AS p99_exact,
           TRUE AS approx_rank_within_eps
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "approx", "verdict"),
)
def q13b_approx_pct(spark: SparkSession, sf: str) -> DataFrame:
    """approx_percentile (DF6 parity: approx_percentile_cont) with a
    rank-guarantee verdict — the mergeable-sketch quantile for
    high-cardinality groups where the exact per-group sort
    (fn_agg_extras) stops being affordable. The sketch value is an
    actual element of the group, so its true rank interval
    [count(<v)+1, count(<=v)] is computable with one re-aggregation
    against the broadcast 3-row estimate frame; the verdict asserts
    that interval reaches within ceil(n·eps)+1 of the target rank q·n
    — the GK guarantee itself, partitioning- and scale-independent.
    The exact branch is the test-scale audit twin."""
    li = _t(spark, sf, "lineitem").select("l_returnflag", "l_extendedprice")
    qarr = ", ".join(f"{q}D" for q in Q13B_QUANTILES)
    est = li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", list(Q13B_QUANTILES), Q13B_ACCURACY
        ).alias("ap"),
        F.expr(f"percentile(l_extendedprice, array({qarr}))").alias("ex"),
    )
    ranks, ok = _q13b_rank_audit(li, est)
    return ranks.select(
        "l_returnflag",
        F.col("ex")[0].alias("p50_exact"),
        F.col("ex")[1].alias("p90_exact"),
        F.col("ex")[2].alias("p99_exact"),
        ok.alias("approx_rank_within_eps"),
    )


Q23_BRAND = "Brand#4"


@register(
    "q23_scalar_corr_avg",
    oracle=f"""
    WITH pa AS (
      SELECT l_partkey, 0.5 * AVG(l_quantity) AS qty_lim
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = '{Q23_BRAND}')
      GROUP BY l_partkey)
    SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < pa.qty_lim
    """,
    tags=("tpch", "subquery", "decorrelated"),
)
def q23_scalar_corr_avg(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q17 shape: small-order revenue for one brand, where "small"
    is a correlated scalar subquery (half the part's average quantity).

    Expressed pre-decorrelated — the plan you want at 100 TB instead of
    a per-row rerun of the subquery: (1) the brand filter reduces part
    to a broadcastable key set, so only that brand's lineitems survive
    the first join; (2) the per-part averages aggregate that reduced
    set (partial/final, one shuffle on l_partkey); (3) the threshold
    join reuses the same l_partkey partitioning, so AQE plans it
    without an extra exchange. The exact-match trick: l_quantity is
    integer-valued and doubles sum exactly below 2^53, so AVG and the
    0.5× threshold are bit-identical across engines.

    r14 measured NEGATIVE kept out: the Q17 window form (threshold as
    AVG OVER (PARTITION BY l_partkey)) removes the duplicate
    scan+join but shuffles RAW branded rows through a sorted window —
    forfeiting map-side partial aggregation — and reads 0.96→1.18 s
    at the 50× fixture (wins only at the sf0.1 scheduling floor).
    Window-over-aggregate (q26) wins; window-over-raw-rows loses.
    """
    li = _t(spark, sf, "lineitem")
    brand_keys = (
        _t(spark, sf, "part").where(F.col("p_brand") == Q23_BRAND).select("p_partkey")
    )
    branded = li.join(
        F.broadcast(brand_keys), li["l_partkey"] == brand_keys["p_partkey"]
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    pa = branded.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("qty_lim")
    )
    joined = branded.join(pa, "l_partkey").where(F.col("l_quantity") < F.col("qty_lim"))
    return joined.agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))


Q24_TOP_N = 10


@register(
    "q24_multi_exists",
    oracle=f"""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT {Q24_TOP_N}
    """,
    tags=("tpch", "subquery", "exists", "anti-join"),
)
def q24_multi_exists(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers-who-kept-orders-waiting): lineitems in
    finished multi-supplier orders where THIS supplier is the only one
    whose item came back flagged 'R' — an EXISTS plus a NOT EXISTS over
    the same fact table.

    Spark-first: both subqueries become one-pass join operators instead
    of per-row probes — EXISTS → left-semi, NOT EXISTS → left-anti,
    each on (equi l_orderkey, non-equi l_suppkey <>) conditions. All
    three lineitem-vs-lineitem legs hash-partition on l_orderkey, so
    AQE stacks them on one exchange of the fact table; supplier is a
    broadcast dim; the final ORDER BY+LIMIT is TakeOrderedAndProject.
    With load_table(bucketed=True) fact copies the orderkey exchanges
    drop out entirely (see q05/q11).
    """
    li = _t(spark, sf, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_returnflag").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.select("l_orderkey", "l_suppkey", "l_returnflag").alias("l3")
    orders_f = (
        _t(spark, sf, "orders").where(F.col("o_orderstatus") == "F").select("o_orderkey")
    )
    sup = _t(spark, sf, "supplier").select("s_suppkey", "s_name")

    base = (
        l1.where(F.col("l1.l_returnflag") == "R")
        .join(orders_f, F.col("l1.l_orderkey") == F.col("o_orderkey"))
        .select("l1.l_orderkey", "l1.l_suppkey")
    )
    has_other = base.alias("b").join(
        l2,
        (F.col("b.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("b.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole_r = has_other.alias("b").join(
        l3,
        (F.col("b.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("b.l_suppkey") != F.col("l3.l_suppkey"))
        & (F.col("l3.l_returnflag") == "R"),
        "left_anti",
    )
    return (
        sole_r.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(Q24_TOP_N)
    )
