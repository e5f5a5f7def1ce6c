"""Scalar-function / window-frame / subquery battery.

SURVEY §2.B enumerates the function surface the reference inherits from
DataFusion 6.0 (math, string, date/time, conditional) plus the window
and set surfaces. Each query here exercises a family end-to-end with an
oracle, so §2's inventory rows are checkable line by line. Everything is
a built-in Catalyst expression (whole-stage codegen, no Python).

Beyond-reference rows are marked: custom window frames, scalar/IN/
correlated-EXISTS subqueries, CUBE — DataFusion 6.0 had none of these
(SURVEY §2.B), Spark gives them natively.

FP note: libm transcendentals (sin/exp/ln…) are not guaranteed
bit-identical across engines — every such output is ROUNDed to 6dp on
both sides.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table


@register(
    "fn_math",
    oracle="""
    SELECT n_nationkey AS k,
           abs(n_nationkey - 12)                    AS v_abs,
           CAST(ceil(CAST(n_nationkey AS DOUBLE) / 4) AS BIGINT)  AS v_ceil,
           CAST(floor(CAST(n_nationkey AS DOUBLE) / 4) AS BIGINT) AS v_floor,
           ROUND(exp(n_nationkey / 25.0), 6)        AS v_exp,
           ROUND(ln(n_nationkey + 1.0), 6)          AS v_ln,
           ROUND(log10(n_nationkey + 1.0), 6)       AS v_log10,
           ROUND(log2(n_nationkey + 1.0), 6)        AS v_log2,
           ROUND(power(n_nationkey, 2.0), 6)        AS v_pow,
           ROUND(sqrt(n_nationkey * 1.0), 6)        AS v_sqrt,
           CAST(sign(n_nationkey - 12) AS BIGINT)   AS v_sign,
           CAST(trunc(CAST(n_nationkey AS DOUBLE) / 7) AS BIGINT) AS v_trunc,
           ROUND(sin(n_nationkey / 10.0), 6)        AS v_sin,
           ROUND(cos(n_nationkey / 10.0), 6)        AS v_cos,
           ROUND(atan(n_nationkey / 10.0), 6)       AS v_atan
    FROM nation
    """,
    tags=("functions", "math"),
)
def fn_math(spark: SparkSession, sf: str) -> DataFrame:
    """Math scalar family ([DF6] abs..trunc, SURVEY §2.B) — one codegen
    pass over a constant-size table."""
    n = load_table(spark, sf, "nation")
    k = F.col("n_nationkey")
    return n.select(
        k.alias("k"),
        F.abs(k - 12).alias("v_abs"),
        F.ceil(k.cast("double") / 4).cast("long").alias("v_ceil"),
        F.floor(k.cast("double") / 4).cast("long").alias("v_floor"),
        F.round(F.exp(k / 25.0), 6).alias("v_exp"),
        F.round(F.log(k + 1.0), 6).alias("v_ln"),
        F.round(F.log10(k + 1.0), 6).alias("v_log10"),
        F.round(F.log2(k + 1.0), 6).alias("v_log2"),
        F.round(F.pow(k, 2.0), 6).alias("v_pow"),
        F.round(F.sqrt(k * 1.0), 6).alias("v_sqrt"),
        F.signum(k - 12).cast("long").alias("v_sign"),
        # numeric trunc-toward-zero = cast double→long (Spark's trunc()
        # builtin is the DATE one; values here are non-negative)
        (k.cast("double") / 7).cast("long").alias("v_trunc"),
        F.round(F.sin(k / 10.0), 6).alias("v_sin"),
        F.round(F.cos(k / 10.0), 6).alias("v_cos"),
        F.round(F.atan(k / 10.0), 6).alias("v_atan"),
    )


@register(
    "fn_string",
    oracle="""
    SELECT n_nationkey AS k,
           ascii(n_name)                                   AS v_ascii,
           length(n_name)                                  AS v_len,
           bit_length(n_name)                              AS v_bitlen,
           chr(65 + (n_nationkey % 26))                    AS v_chr,
           n_name || '-' || CAST(n_regionkey AS VARCHAR)   AS v_concat,
           concat_ws('/', n_name, 'x', 'y')                AS v_concat_ws,
           lower(n_name)                                   AS v_lower,
           upper(lower(n_name))                            AS v_upper,
           lpad(n_name, 12, '*')                           AS v_lpad,
           rpad(n_name, 12, '*')                           AS v_rpad,
           trim('  ' || n_name || '  ')                    AS v_trim,
           ltrim('  ' || n_name)                           AS v_ltrim,
           rtrim(n_name || '  ')                           AS v_rtrim,
           md5(n_name)                                     AS v_md5,
           sha256(n_name)                                  AS v_sha256,
           repeat(substr(n_name, 1, 2), 3)                 AS v_repeat,
           replace(n_name, '_', '-')                       AS v_replace,
           reverse(n_name)                                 AS v_reverse,
           left(n_name, 3)                                 AS v_left,
           right(n_name, 3)                                AS v_right,
           split_part(n_name, '_', 1)                      AS v_split1,
           split_part(n_name, '_', 2)                      AS v_split2,
           CAST(starts_with(n_name, 'NATION') AS VARCHAR)  AS v_starts,
           strpos(n_name, '_')                             AS v_strpos,
           translate(n_name, 'NAT', 'nat')                 AS v_translate,
           substr(n_name, 2, 4)                            AS v_substr,
           array_to_string(list_transform(string_split(lower(n_name), '_'),
                           w -> upper(w[1]) || w[2:]), ' ') AS v_initcap
    FROM nation
    """,
    tags=("functions", "string"),
)
def fn_string(spark: SparkSession, sf: str) -> DataFrame:
    """String scalar family ([DF6] ascii..translate, SURVEY §2.B).
    split_part / startswith are Spark ≥3.5 builtins; initcap is native
    in Spark and emulated in the DuckDB oracle."""
    n = load_table(spark, sf, "nation")
    k, nm = F.col("n_nationkey"), F.col("n_name")
    return n.select(
        k.alias("k"),
        F.ascii(nm).alias("v_ascii"),
        F.length(nm).cast("long").alias("v_len"),
        F.bit_length(nm).cast("long").alias("v_bitlen"),
        F.chr(65 + (k % 26)).alias("v_chr"),
        F.concat(nm, F.lit("-"), F.col("n_regionkey").cast("string")).alias("v_concat"),
        F.concat_ws("/", nm, F.lit("x"), F.lit("y")).alias("v_concat_ws"),
        F.lower(nm).alias("v_lower"),
        F.upper(F.lower(nm)).alias("v_upper"),
        F.lpad(nm, 12, "*").alias("v_lpad"),
        F.rpad(nm, 12, "*").alias("v_rpad"),
        F.trim(F.concat(F.lit("  "), nm, F.lit("  "))).alias("v_trim"),
        F.ltrim(F.concat(F.lit("  "), nm)).alias("v_ltrim"),
        F.rtrim(F.concat(nm, F.lit("  "))).alias("v_rtrim"),
        F.md5(nm).alias("v_md5"),
        F.lower(F.sha2(nm, 256)).alias("v_sha256"),
        F.repeat(F.substring(nm, 1, 2), 3).alias("v_repeat"),
        F.replace(nm, F.lit("_"), F.lit("-")).alias("v_replace"),
        F.reverse(nm).alias("v_reverse"),
        F.expr("left(n_name, 3)").alias("v_left"),
        F.expr("right(n_name, 3)").alias("v_right"),
        F.split_part(nm, F.lit("_"), F.lit(1)).alias("v_split1"),
        F.split_part(nm, F.lit("_"), F.lit(2)).alias("v_split2"),
        F.startswith(nm, F.lit("NATION")).cast("string").alias("v_starts"),
        F.instr(nm, "_").cast("long").alias("v_strpos"),
        F.translate(nm, "NAT", "nat").alias("v_translate"),
        F.substring(nm, 2, 4).alias("v_substr"),
        F.initcap(F.regexp_replace(F.lower(nm), "_", " ")).alias("v_initcap"),
    )


@register(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey AS k,
           CAST(date_part('year', o_orderdate) AS BIGINT)    AS v_year,
           CAST(date_part('month', o_orderdate) AS BIGINT)   AS v_month,
           CAST(date_part('day', o_orderdate) AS BIGINT)     AS v_day,
           CAST(date_part('dow', o_orderdate) AS BIGINT)     AS v_dow,
           epoch_us(date_trunc('month', o_orderdate))        AS v_month_start,
           epoch_us(date_trunc('day', o_orderdate))          AS v_day_start,
           CAST(date_part('quarter', o_orderdate) AS BIGINT) AS v_quarter
    FROM orders WHERE o_orderkey < 500
    """,
    tags=("functions", "datetime"),
)
def fn_datetime(spark: SparkSession, sf: str) -> DataFrame:
    """Date/time family ([DF6] date_part/date_trunc, SURVEY §2.B) — the
    reference can *compute* these but not store them (no date types,
    §1.3); we both compute and store them. DOW convention: Sunday=0
    (DuckDB 'dow') ↔ Spark dayofweek()-1."""
    o = load_table(spark, sf, "orders").where(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("k"),
        F.year(d).cast("long").alias("v_year"),
        F.month(d).cast("long").alias("v_month"),
        F.dayofmonth(d).cast("long").alias("v_day"),
        (F.dayofweek(d) - 1).cast("long").alias("v_dow"),
        F.unix_micros(F.date_trunc("month", d)).alias("v_month_start"),
        F.unix_micros(F.date_trunc("day", d)).alias("v_day_start"),
        F.quarter(d).cast("long").alias("v_quarter"),
    )


@register(
    "fn_conditional",
    oracle="""
    SELECT c_custkey AS k,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'IS_BUILDING') AS v_nullif,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END     AS v_case,
           CASE c_nationkey % 3 WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END AS v_case_simple,
           CAST(c_nationkey IN (1, 3, 5, 7) AS VARCHAR)              AS v_in,
           CAST(c_acctbal BETWEEN 0 AND 1000 AS VARCHAR)             AS v_between,
           coalesce(NULL, NULL, c_mktsegment)                        AS v_coalesce
    FROM customer
    """,
    tags=("functions", "conditional"),
)
def fn_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """Conditional family ([DF6] coalesce/nullif/case/in_list) — both
    CASE forms, the shapes ebike's fix pass special-cases
    (/root/reference/src/core/execution.rs:597-653)."""
    c = load_table(spark, sf, "customer")
    seg, bal, nk = F.col("c_mktsegment"), F.col("c_acctbal"), F.col("c_nationkey")
    return c.select(
        F.col("c_custkey").alias("k"),
        F.coalesce(F.nullif(seg, F.lit("BUILDING")), F.lit("IS_BUILDING")).alias("v_nullif"),
        F.when(bal < 0, "neg").when(bal < 5000, "low").otherwise("high").alias("v_case"),
        F.when(nk % 3 == 0, "a").when(nk % 3 == 1, "b").otherwise("c").alias("v_case_simple"),
        nk.isin(1, 3, 5, 7).cast("string").alias("v_in"),
        bal.between(0, 1000).cast("string").alias("v_between"),
        F.coalesce(F.lit(None), F.lit(None), seg).alias("v_coalesce"),
    )


@register(
    "fn_regexp_like",
    oracle="""
    SELECT p_partkey AS k,
           CAST(p_name LIKE 'part_1%' AS VARCHAR)                AS v_like,
           CAST(regexp_matches(p_type, '^t[0-9]+$') AS VARCHAR)  AS v_rx_match,
           regexp_replace(p_name, '[0-9]+', '#', 'g')            AS v_rx_replace,
           regexp_extract(p_name, '([0-9]+)', 1)                 AS v_rx_extract
    FROM part
    """,
    tags=("functions", "regexp"),
)
def fn_regexp(spark: SparkSession, sf: str) -> DataFrame:
    """LIKE + regexp family ([DF6] regexp_match/regexp_replace)."""
    p = load_table(spark, sf, "part")
    return p.select(
        F.col("p_partkey").alias("k"),
        F.col("p_name").like("part_1%").cast("string").alias("v_like"),
        F.col("p_type").rlike("^t[0-9]+$").cast("string").alias("v_rx_match"),
        F.regexp_replace("p_name", "[0-9]+", "#").alias("v_rx_replace"),
        F.regexp_extract("p_name", "([0-9]+)", 1).alias("v_rx_extract"),
    )


@register(
    "q18_semi_anti_join",
    oracle="""
    SELECT 'with_orders' AS grp, COUNT(*) AS n FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT 'without_orders' AS grp, COUNT(*) AS n FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join", "semi", "anti"),
)
def q18_semi_anti(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi / left-anti hash joins — the join types DF6 reaches only
    via set-op rewrites (SURVEY §2.B); first-class in Spark. Only the
    join key shuffles; payload columns are pruned before the exchange."""
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").select("o_custkey")
    semi = c.join(o, c.c_custkey == o.o_custkey, "leftsemi").agg(F.count("*").alias("n"))
    anti = c.join(o, c.c_custkey == o.o_custkey, "leftanti").agg(F.count("*").alias("n"))
    return semi.select(F.lit("with_orders").alias("grp"), "n").unionAll(
        anti.select(F.lit("without_orders").alias("grp"), "n")
    )


@register(
    "q19_subqueries",
    oracle="""
    SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
    FROM orders
    WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
      AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
    tags=("subquery", "beyond-reference"),
)
def q19_subqueries(spark: SparkSession, sf: str) -> DataFrame:
    """Scalar + IN subqueries — DataFusion 6.0 supported NEITHER
    (SURVEY §2.B 'subqueries'); Spark decorrelates both into joins.
    Expressed via spark.sql to exercise the SQL path end-to-end."""
    from ebike_spark.sources.registry import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS price
        FROM orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
          AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """
    )


@register(
    "q19b_correlated_exists",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 40000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
    """,
    tags=("subquery", "correlated", "beyond-reference"),
)
def q19b_correlated(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS — unsupported in DF6 (SURVEY §2.B);
    Catalyst decorrelates to left-semi + left-anti joins (visible in the
    optimized plan), so the 'per-row subquery' costs two hash joins."""
    from ebike_spark.sources.registry import register_views

    register_views(spark, sf)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 40000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        """
    )


@register(
    "q20_window_frames",
    oracle="""
    SELECT o_orderkey AS k,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)   AS running_sum,
           ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)           AS moving_avg,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                 RANGE BETWEEN 10 PRECEDING AND CURRENT ROW), 2)         AS range_sum,
           NTILE(4) OVER w                                               AS v_ntile,
           ROUND(PERCENT_RANK() OVER w, 6)                               AS v_pctrank,
           ROUND(CUME_DIST() OVER w, 6)                                  AS v_cumedist,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS v_dense,
           FIRST_VALUE(o_orderkey) OVER w                                AS v_first,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS v_last,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS v_nth,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS v_lead
    FROM orders WHERE o_custkey < 60
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    tags=("window", "frames", "beyond-reference"),
)
def q20_window_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Full window surface incl. custom ROWS/RANGE frames — DF6 supported
    default frames only (SURVEY §2.B); frames are a Spark superset. All
    same-partition specs share one shuffle+sort."""
    o = load_table(spark, sf, "orders").where(F.col("o_custkey") < 60)
    by_key = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        F.col("o_orderkey").alias("k"),
        F.round(F.sum("o_totalprice").over(by_key.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_sum"),
        F.round(F.avg("o_totalprice").over(by_key.rowsBetween(-2, 0)), 4).alias("moving_avg"),
        F.round(
            F.sum("o_totalprice").over(
                Window.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-10, 0)
            ),
            2,
        ).alias("range_sum"),
        F.ntile(4).over(w).alias("v_ntile"),
        F.round(F.percent_rank().over(w), 6).alias("v_pctrank"),
        F.round(F.cume_dist().over(w), 6).alias("v_cumedist"),
        F.dense_rank().over(Window.partitionBy("o_custkey").orderBy("o_orderpriority")).alias("v_dense"),
        F.first("o_orderkey").over(w).alias("v_first"),
        F.last("o_orderkey").over(w_full).alias("v_last"),
        F.nth_value("o_orderkey", 2).over(w_full).alias("v_nth"),
        F.lead("o_orderkey").over(by_key).alias("v_lead"),
    )


@register(
    "q21_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           ROUND(SUM(l_quantity), 2) AS sq
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "cube", "beyond-reference"),
)
def q21_cube(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE grouping sets — absent from DF6 (SURVEY §2.B 'No GROUPING
    SETS/CUBE/ROLLUP'); single-pass grouping-id expansion in Spark."""
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("sq")
    )


@register(
    "fn_agg_extras",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           ROUND(covar_pop(l_quantity, l_extendedprice), 4)  AS v_covar_pop,
           ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS v_covar_samp,
           ROUND(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 4) AS v_median,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 4) AS v_p90,
           CAST(COUNT(*) FILTER (l_discount > 0.05) AS BIGINT) AS v_count_if
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "extras"),
)
def fn_agg_extras(spark: SparkSession, sf: str) -> DataFrame:
    """Remaining [DF6] aggregate rows (SURVEY §2.B): array_agg (as a
    sorted string for hash-stable compare), COVAR, exact percentile
    (interpolated — DF6's approx_percentile_cont upgraded to exact),
    count-if. Exact percentiles require a per-group sort — fine for
    low-cardinality groups; use approx_percentile at high cardinality."""
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias("statuses"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("v_covar_pop"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("v_covar_samp"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("v_median"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("v_p90"),
        F.count_if(F.col("l_discount") > 0.05).alias("v_count_if"),
    )


@register(
    "fn_agg_moments",
    oracle="""
    -- Spark reports POPULATION moments (g1, excess g2); DuckDB reports
    -- sample-corrected (G1, G2). Convert DuckDB's to Spark's using n:
    --   g1 = G1 * (n-2) / sqrt(n*(n-1))
    --   g2 = (G2 * (n-2)*(n-3) / (n-1) - 6) / (n+1)
    SELECT l_returnflag,
           ROUND(skewness(l_extendedprice)
                 * (COUNT(*) - 2) / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 4) AS skew,
           ROUND((kurtosis(l_extendedprice)
                  * (COUNT(*) - 2.0) * (COUNT(*) - 3) / (COUNT(*) - 1) - 6)
                 / (COUNT(*) + 1), 4) AS kurt
    FROM lineitem GROUP BY l_returnflag
    """,
    tags=("aggregate", "moments"),
)
def fn_agg_moments(spark: SparkSession, sf: str) -> DataFrame:
    """Skewness/kurtosis ([DF6] stat-agg family): single-pass
    partial-mergeable moment sketches; population convention (the
    oracle converts DuckDB's sample-corrected values)."""
    li = load_table(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.skewness("l_extendedprice"), 4).alias("skew"),
        F.round(F.kurtosis("l_extendedprice"), 4).alias("kurt"),
    )


@register(
    "q21b_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
           COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    tags=("aggregate", "cube", "grouping"),
)
def q21b_grouping(spark: SparkSession, sf: str) -> DataFrame:
    """GROUPING() indicator columns — disambiguate real NULL keys from
    roll-up rows in grouping-set output."""
    li = load_table(spark, sf, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("long").alias("g_flag"),
        F.grouping("l_linestatus").cast("long").alias("g_status"),
        F.count("*").alias("n"),
    )


@register(
    "q22_values_inline",
    oracle="""
    SELECT CAST(t.a AS BIGINT) AS a, t.b AS b, upper(t.b) AS ub
    FROM (VALUES (1, 'x'), (2, 'y'), (3, 'z')) AS t(a, b)
    """,
    tags=("values", "source"),
)
def q22_values(spark: SparkSession, sf: str) -> DataFrame:
    """Inline VALUES relation ([DF6] sources row, SURVEY §2.B) — the
    third source type next to tables and dual."""
    return spark.sql(
        "SELECT CAST(a AS BIGINT) AS a, b, upper(b) AS ub "
        "FROM VALUES (1, 'x'), (2, 'y'), (3, 'z') AS t(a, b)"
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT)        AS b_and,
           CAST(o_orderkey | 4096 AS BIGINT)       AS b_or,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS b_xor,
           CAST(~o_orderkey AS BIGINT)             AS b_not,
           CAST(o_orderkey << 3 AS BIGINT)         AS b_shl,
           CAST(o_orderkey >> 2 AS BIGINT)         AS b_shr,
           CAST(bit_count(o_orderkey) AS BIGINT)   AS b_pop
    FROM orders WHERE o_orderkey < 200
    """,
    tags=("functions", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise expression battery: AND/OR/XOR/NOT, shifts, popcount —
    the integer-manipulation surface (hash mixing, flag packing,
    hamming distances — simhash and sign-LSH build on exactly these).
    All JVM-side codegen'd expressions over a pushed-down key filter."""
    o = load_table(spark, sf, "orders").where(F.col("o_orderkey") < 200)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("long").alias("b_and"),
        k.bitwiseOR(F.lit(4096)).cast("long").alias("b_or"),
        k.bitwiseXOR(F.col("o_custkey")).cast("long").alias("b_xor"),
        F.bitwise_not(k).cast("long").alias("b_not"),
        F.shiftleft(k, 3).cast("long").alias("b_shl"),
        F.shiftright(k, 2).cast("long").alias("b_shr"),
        F.bit_count(k).cast("long").alias("b_pop"),
    )


@register(
    "fn_window",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           ntile(4) OVER w AS nt4,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           dense_rank() OVER w AS dr,
           nth_value(o_orderkey, 2) OVER (
             PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nth2,
           first_value(o_orderkey) OVER (
             PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS fv_roll,
           last_value(o_orderkey) OVER (
             PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN CURRENT ROW AND 2 FOLLOWING) AS lv_roll,
           lag(o_orderkey, 2, -1) OVER w AS lag2,
           lead(o_orderkey, 3, -1) OVER w AS lead3
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    """,
    tags=("functions", "window"),
)
def fn_window(spark: SparkSession, sf: str) -> DataFrame:
    """Window-function battery beyond the frames/rank queries: NTILE,
    PERCENT_RANK, CUME_DIST, DENSE_RANK, NTH_VALUE, FIRST/LAST_VALUE
    over rolling ROWS frames, and LAG/LEAD with offsets and defaults —
    the remaining window surface SURVEY §2.B row 28 claims (DataFusion
    6.0 had none of it; Spark runs it all in one WindowExec). The
    ordering key (o_orderkey) is unique per partition, so every rank
    and tile is deterministic; percent_rank/cume_dist are ratios of
    exact integers computed identically by both engines.

    Scale shape: ONE o_orderpriority shuffle serves every function —
    identical partitioning + ordering lets Spark stack all ten window
    expressions in a single exchange/sort, which `.explain` confirms
    (one Window node). Low-cardinality partition keys would skew at
    extreme scale; the realistic fix (pre-bucketing on a composite
    key) is q09's documented pattern and orthogonal here."""
    o = load_table(spark, sf, "orders")
    wp = Window.partitionBy("o_orderpriority")
    w = wp.orderBy("o_orderkey")
    roll_back = w.rowsBetween(-2, Window.currentRow)
    roll_fwd = w.rowsBetween(Window.currentRow, 2)
    upto = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("nt4"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.dense_rank().over(w).alias("dr"),
        F.nth_value("o_orderkey", 2).over(upto).alias("nth2"),
        F.first("o_orderkey").over(roll_back).alias("fv_roll"),
        F.last("o_orderkey").over(roll_fwd).alias("lv_roll"),
        F.lag("o_orderkey", 2, -1).over(w).alias("lag2"),
        F.lead("o_orderkey", 3, -1).over(w).alias("lead3"),
    )


@register(
    "fn_maps",
    oracle="""
    WITH pn AS (
      SELECT n.n_regionkey, n.n_name, COUNT(*) AS cnt
      FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1, 2)
    SELECT r.r_name AS region,
           COUNT(*) AS n_nations,
           STRING_AGG(pn.n_name, ',' ORDER BY pn.n_name) AS nations,
           CAST(SUM(pn.cnt) AS BIGINT) AS n_suppliers,
           COUNT(*) FILTER (WHERE pn.cnt >= 4) AS n_big,
           CAST(2 * SUM(pn.cnt) AS BIGINT) AS doubled,
           CAST(SUM(pn.cnt * LENGTH(pn.n_name)) AS BIGINT) AS zip_checksum,
           CAST(-1 AS BIGINT) AS sentinel
    FROM pn JOIN region r ON pn.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("functions", "maps"),
)
def fn_maps(spark: SparkSession, sf: str) -> DataFrame:
    """Map-typed function family (beyond-reference — DataFusion 6.0 had
    no map type, SURVEY §2.B): map_from_entries, map_keys, map_values,
    map_filter, transform_values, map_zip_with, map_concat,
    element_at, cardinality — all Catalyst HOFs over maps built from
    per-region nation→count entries. The ORACLE computes the same
    scalars relationally (DuckDB's MAP semantics differ; only the
    emitted values must agree).

    Scale shape: the maps are bounded by nations-per-region (constant
    ≤25 entries) — never data-proportional; the supplier→nation join
    broadcasts the 25-row dim, and the final region join broadcasts
    the 5-row dim."""
    n = load_table(spark, sf, "nation")
    s = load_table(spark, sf, "supplier")
    r = load_table(spark, sf, "region")
    per_nation = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_regionkey", "n_name")
        .agg(F.count("*").alias("cnt"))
    )
    entry = F.struct(F.col("n_name").alias("k"), F.col("cnt").alias("v"))
    len_entry = F.struct(
        F.col("n_name").alias("k"), F.length("n_name").cast("long").alias("v")
    )
    m = per_nation.groupBy("n_regionkey").agg(
        F.map_from_entries(F.array_sort(F.collect_list(entry))).alias("cnt_map"),
        F.map_from_entries(F.array_sort(F.collect_list(len_entry))).alias("len_map"),
    )
    zero = F.lit(0).cast("long")
    total = F.aggregate(F.map_values("cnt_map"), zero, lambda a, x: a + x)
    doubled = F.aggregate(
        F.map_values(F.transform_values("cnt_map", lambda k, v: v * 2)),
        zero,
        lambda a, x: a + x,
    )
    zip_ck = F.aggregate(
        F.map_values(F.map_zip_with("cnt_map", "len_map", lambda k, c, ln: c * ln)),
        zero,
        lambda a, x: a + x,
    )
    sentinel = F.element_at(
        F.map_concat(
            "cnt_map", F.create_map(F.lit("__sentinel__"), F.lit(-1).cast("long"))
        ),
        F.lit("__sentinel__"),
    )
    return m.join(F.broadcast(r), m.n_regionkey == r.r_regionkey).select(
        F.col("r_name").alias("region"),
        F.cardinality("cnt_map").cast("long").alias("n_nations"),
        F.array_join(F.array_sort(F.map_keys("cnt_map")), ",").alias("nations"),
        total.alias("n_suppliers"),
        F.cardinality(F.map_filter("cnt_map", lambda k, v: v >= 4)).cast("long").alias("n_big"),
        doubled.alias("doubled"),
        zip_ck.alias("zip_checksum"),
        sentinel.alias("sentinel"),
    )


@register(
    "fn_structs",
    oracle="""
    WITH s AS (
      SELECT n.n_nationkey, n.n_name, r.r_name,
             (SELECT COUNT(*) FROM supplier sp WHERE sp.s_nationkey = n.n_nationkey)
               AS n_sup
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey)
    SELECT r_name AS region,
           CAST(COUNT(*) AS BIGINT) AS n_nations,
           MIN(n_name) AS first_nation,
           MAX(n_name) AS last_nation,
           CAST(MAX(n_sup) AS BIGINT) AS max_sup,
           STRING_AGG(n_name || ':' || CAST(n_sup AS VARCHAR), ',' ORDER BY n_sup DESC, n_name)
             AS ranked
    FROM s GROUP BY r_name
    """,
    tags=("functions", "structs"),
)
def fn_structs(spark: SparkSession, sf: str) -> DataFrame:
    """Struct-typed function family (completing the nested-type trio
    with fn_arrays and fn_maps — DataFusion 6.0 had none of the three,
    SURVEY §2.B): named_struct construction, dotted field access,
    struct ORDERING (array_sort over structs sorts lexicographically by
    field position — the repo's standard argmin/argmax trick, here
    exercised as the ranked string), and min/max over struct-extracted
    fields. The ORACLE computes the same scalars relationally.

    Scale shape: structs are per-row values (no fan-out); the only
    aggregation axis is nations-per-region (≤25, constant); both
    dimension joins broadcast."""
    n = load_table(spark, sf, "nation")
    r = load_table(spark, sf, "region")
    s = load_table(spark, sf, "supplier")
    per_nation = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            s.groupBy("s_nationkey").agg(F.count("*").alias("n_sup")),
            n.n_nationkey == F.col("s_nationkey"),
            "left",
        )
        .select(
            "r_name",
            "n_name",
            F.coalesce(F.col("n_sup"), F.lit(0)).cast("long").alias("n_sup"),
        )
    )
    # struct sort key: (-n_sup, n_name) descends by count, then name —
    # array_sort over structs orders by field position
    entry = F.struct((-F.col("n_sup")).alias("neg"), F.col("n_name").alias("nm"),
                     F.col("n_sup").alias("cnt"))
    return per_nation.groupBy(F.col("r_name").alias("region")).agg(
        F.count("*").alias("n_nations"),
        F.min(F.struct(F.col("n_name").alias("nm")))["nm"].alias("first_nation"),
        F.max(F.struct(F.col("n_name").alias("nm")))["nm"].alias("last_nation"),
        F.max("n_sup").alias("max_sup"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(entry)),
                lambda e: F.concat(e.nm, F.lit(":"), e.cnt.cast("string")),
            ),
            ",",
        ).alias("ranked"),
    )


@register(
    "fn_datetime_arith",
    oracle="""
    WITH d AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od
      FROM orders WHERE o_orderkey % 37 = 0)
    SELECT o_orderkey,
           CAST(epoch_us(CAST(od + INTERVAL 1 MONTH AS TIMESTAMP)) // 86400000000
                AS BIGINT) AS add1m_day,
           CAST(epoch_us(CAST(last_day(od) AS TIMESTAMP)) // 86400000000
                AS BIGINT) AS lastday_day,
           CAST(date_diff('day', DATE '1995-01-01', od) AS BIGINT) AS days_since,
           CAST(quarter(od) AS BIGINT) AS qtr,
           CAST(weekofyear(od) AS BIGINT) AS iso_week,
           CAST(dayofweek(od) + 1 AS BIGINT) AS dow_sun1,
           CAST(epoch_us(CAST(od + CASE WHEN (8 - isodow(od)) % 7 = 0 THEN 7
                                        ELSE (8 - isodow(od)) % 7 END
                              * INTERVAL 1 DAY AS TIMESTAMP)) // 86400000000
                AS BIGINT) AS next_monday_day
    FROM d
    """,
    tags=("functions", "datetime", "arithmetic"),
)
def fn_datetime_arith(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar-arithmetic battery extending fn_datetime: add_months
    (END-OF-MONTH CLAMP — Jan 31 + 1 month = Feb 29, matched exactly by
    DuckDB's month interval), last_day, datediff against an anchor,
    quarter, ISO weekofyear, dayofweek (Spark is 1=Sunday, DuckDB is
    0=Sunday — pinned by the +1), and next_day('Mon') (strictly-after
    semantics, reproduced in the oracle via isodow modular arithmetic).
    All emitted values are BIGINT epoch-days or small ints — no date
    string formatting in the hash.

    Scale shape: pure per-row projection over a pushed-down key filter
    — scan-bound, no shuffle."""
    o = load_table(spark, sf, "orders").where(F.col("o_orderkey") % 37 == 0)
    od = F.to_date("o_orderdate")
    day = lambda c: F.unix_date(c).cast("long")  # noqa: E731 — epoch-day
    return o.select(
        "o_orderkey",
        day(F.add_months(od, 1)).alias("add1m_day"),
        day(F.last_day(od)).alias("lastday_day"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).cast("long").alias("days_since"),
        F.quarter(od).cast("long").alias("qtr"),
        F.weekofyear(od).cast("long").alias("iso_week"),
        F.dayofweek(od).cast("long").alias("dow_sun1"),
        day(F.next_day(od, "Mon")).alias("next_monday_day"),
    )


@register(
    "fn_nullsafe",
    oracle="""
    WITH p AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_custkey END AS a,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_custkey END AS b
      FROM orders WHERE o_orderkey % 11 = 0)
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE a IS NOT DISTINCT FROM b) AS BIGINT) AS eq_ns,
           CAST(COUNT(*) FILTER (WHERE a IS DISTINCT FROM b) AS BIGINT) AS ne_ns,
           CAST(COUNT(*) FILTER (WHERE a = b) AS BIGINT) AS eq_plain,
           CAST(COUNT(*) FILTER (WHERE a IS NULL AND b IS NULL) AS BIGINT) AS both_null
    FROM p
    """,
    tags=("functions", "null-semantics"),
)
def fn_nullsafe(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe comparison semantics: ``<=>`` (NULL <=> NULL is TRUE,
    NULL <=> x is FALSE) against plain ``=`` (NULL-propagating) and the
    IS [NOT] DISTINCT FROM spellings — the three-valued-logic corner
    every MySQL migration trips on. The counts pin all four truth
    tables; eq_ns - eq_plain - both_null == 0 by construction, so a
    drift in either engine's NULL handling breaks the hash.

    Scale shape: one scan, one conditional aggregate — no shuffle past
    the map-side partials."""
    o = load_table(spark, sf, "orders").where(F.col("o_orderkey") % 11 == 0)
    p = o.select(
        F.when(F.col("o_orderkey") % 3 == 0, None).otherwise(F.col("o_custkey")).alias("a"),
        F.when(F.col("o_orderkey") % 5 == 0, None).otherwise(F.col("o_custkey")).alias("b"),
    )
    ns_eq = F.col("a").eqNullSafe(F.col("b"))
    return p.agg(
        F.count("*").alias("n"),
        F.count(F.when(ns_eq, 1)).alias("eq_ns"),
        F.count(F.when(~ns_eq, 1)).alias("ne_ns"),
        F.count(F.when(F.col("a") == F.col("b"), 1)).alias("eq_plain"),
        F.count(F.when(F.col("a").isNull() & F.col("b").isNull(), 1)).alias("both_null"),
    )


@register(
    "fn_regex_extended",
    oracle="""
    WITH subj AS (
      SELECT doc_id,
             'Doc ' || CAST(doc_id AS VARCHAR) || ' v' || CAST(doc_id % 13 AS VARCHAR)
               || ' ' || upper(substr(text, 1, 1)) || substr(text, 2, 60) AS s,
             text
      FROM documents WHERE doc_id % 17 = 0)
    SELECT doc_id,
           CAST(len(regexp_extract_all(s, '[0-9]+')) AS BIGINT) AS n_numbers,
           regexp_extract(s, '[0-9]+') AS first_number,
           -- DuckDB's array_to_string maps the empty list to NULL; Spark's
           -- array_join gives '' — pin the '' convention
           COALESCE(array_to_string(regexp_extract_all(s, '[A-Z][a-z]+'), '|'), '')
             AS capwords,
           CAST(len(regexp_extract_all(text, '\\b[a-z]{4}\\b')) AS BIGINT) AS n_four,
           regexp_replace(text, '[aeiou]', '*', 'g') LIKE '%**%' AS has_double_vowel
    FROM subj
    """,
    tags=("functions", "regex"),
)
def fn_regex_extended(spark: SparkSession, sf: str) -> DataFrame:
    """Extended regex battery beyond fn_regexp_like: regexp_extract_all
    (all matches, deterministically joined), regexp_count, first-match
    extract, word-boundary classes, and global regexp_replace. The
    subject line is constructed ('Doc <id> v<rev> <Capitalized text>')
    because the synthetic corpus is all-lowercase digit-free — every
    pattern must match a VARYING value or the battery tests nothing.
    Patterns stay in the Java∩RE2 common dialect (character classes,
    quantifiers, \\b) so Spark's java.util.regex and DuckDB's RE2 agree
    on every match; the empty-match-list join is pinned to ''.

    Scale shape: per-row projection over a pushed-down key filter —
    regex runs inside codegen'd expressions, scan-bound."""
    d = load_table(spark, sf, "documents").where(F.col("doc_id") % 17 == 0)
    subj = F.concat(
        F.lit("Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" v"),
        (F.col("doc_id") % 13).cast("string"),
        F.lit(" "),
        F.upper(F.substring("text", 1, 1)),
        F.substring("text", 2, 60),
    )
    d = d.select("doc_id", subj.alias("s"), "text")
    return d.select(
        "doc_id",
        F.regexp_count("s", F.lit("[0-9]+")).cast("long").alias("n_numbers"),
        F.regexp_extract("s", "[0-9]+", 0).alias("first_number"),
        F.array_join(
            F.regexp_extract_all("s", F.lit("[A-Z][a-z]+"), 0), "|"
        ).alias("capwords"),
        F.regexp_count("text", F.lit(r"\b[a-z]{4}\b")).cast("long").alias("n_four"),
        F.regexp_replace("text", "[aeiou]", "*").like("%**%").alias("has_double_vowel"),
    )


@register(
    "fn_null_ordering",
    oracle="""
    WITH p AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 4 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders WHERE o_orderkey % 9 = 0)
    SELECT o_orderkey,
           ROW_NUMBER() OVER (ORDER BY k ASC NULLS FIRST, o_orderkey) AS rn_asc_nf,
           ROW_NUMBER() OVER (ORDER BY k ASC NULLS LAST, o_orderkey) AS rn_asc_nl,
           ROW_NUMBER() OVER (ORDER BY k DESC NULLS FIRST, o_orderkey) AS rn_desc_nf,
           ROW_NUMBER() OVER (ORDER BY k DESC NULLS LAST, o_orderkey) AS rn_desc_nl
    FROM p
    """,
    tags=("functions", "null-ordering", "window"),
)
def fn_null_ordering(spark: SparkSession, sf: str) -> DataFrame:
    """NULL placement in ORDER BY — the silent cross-engine divergence:
    Spark defaults to NULLS FIRST on ASC, DuckDB to NULLS LAST, so any
    ranking over a nullable key that omits the modifier gives different
    answers. All four explicit (direction × placement) combinations are
    pinned via row numbers over a NULL-bearing key; relying on either
    engine's default would hash-mismatch by construction.

    Scale shape: single-partition windows over a key-filtered subset —
    a battery, not a scale pattern (the scalable per-group form is
    every other ranking query in the registry)."""
    o = load_table(spark, sf, "orders").where(F.col("o_orderkey") % 9 == 0)
    p = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 4 == 0, None)
        .otherwise(F.col("o_custkey"))
        .alias("k"),
    )
    w = lambda key: Window.orderBy(key, "o_orderkey")  # noqa: E731
    return p.select(
        "o_orderkey",
        F.row_number().over(w(F.col("k").asc_nulls_first())).alias("rn_asc_nf"),
        F.row_number().over(w(F.col("k").asc_nulls_last())).alias("rn_asc_nl"),
        F.row_number().over(w(F.col("k").desc_nulls_first())).alias("rn_desc_nf"),
        F.row_number().over(w(F.col("k").desc_nulls_last())).alias("rn_desc_nl"),
    )


@register(
    "fn_string_mysql",
    oracle="""
    SELECT n_name,
           array_to_string(string_split(n_name, 'A')[1:2], 'A') AS v_subidx_pos,
           array_to_string(string_split(n_name, 'A')[-2:], 'A') AS v_subidx_neg,
           ['red', 'green', 'blue'][CAST(n_nationkey % 3 AS INT) + 1] AS v_elt,
           CAST(levenshtein(n_name, 'CANADA') AS BIGINT) AS v_lev
    FROM nation
    """,
    tags=("functions", "string", "mysql-dialect"),
)
def fn_string_mysql(spark: SparkSession, sf: str) -> DataFrame:
    """MySQL-flavored string functions Spark carries natively:
    SUBSTRING_INDEX with POSITIVE and NEGATIVE counts (the
    URL/domain-parsing staple — the negative form takes the LAST n
    delimiter-separated parts, and a count exceeding the part count
    returns the whole string), ELT (1-based list pick), LEVENSHTEIN
    (edit distance — the fuzzy-match primitive). DuckDB has no
    substring_index/elt, so the oracle reconstructs both from
    string_split list slices — slice-beyond-length and negative-slice
    semantics line up with MySQL's whole-string fallback exactly.

    Scale shape: per-row scalar expressions over a constant 25-row
    dim — whole-stage codegen, no Python, no shuffle beyond the scan."""
    n = load_table(spark, sf, "nation")
    nm = F.col("n_name")
    return n.select(
        "n_name",
        F.substring_index(nm, "A", 2).alias("v_subidx_pos"),
        F.substring_index(nm, "A", -2).alias("v_subidx_neg"),
        F.elt(
            (F.col("n_nationkey") % 3 + 1).cast("int"),
            F.lit("red"),
            F.lit("green"),
            F.lit("blue"),
        ).alias("v_elt"),
        F.levenshtein(nm, F.lit("CANADA")).cast("long").alias("v_lev"),
    )
