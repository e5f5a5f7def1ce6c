"""Dataset profiling and data-quality gates: the audit operators a
training-data pipeline runs before (and after) every transform stage.

The reference's only profiling surface is `ANALYZE`-less scan stats
(SURVEY §4.1, `Statistics::default()`); these operators are the
Spark-native replacement AND the Great-Expectations-style rule gate,
each designed as ONE pass over the data:

- every rule / every column metric is a conditional aggregate in a
  single `agg()` — one scan, one partial-aggregated reduce, however
  many rules; the long (rule, value) output shape is produced by
  `stack()` AFTER aggregation, over a 1-row frame.
- the DuckDB oracles spell the same results as UNION ALL of per-rule
  scans (N scans) — the semantic twin, not the plan twin; the plan
  tests assert the Spark side reads the parquet exactly once.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table

# (rule name, violation predicate in both dialects). The predicates are
# ANSI — each string parses identically in Spark SQL and DuckDB, so one
# definition feeds both sides and they cannot drift apart.
DQ_RULES: tuple[tuple[str, str], ...] = (
    ("l_quantity_range", "l_quantity < 1 OR l_quantity > 50"),
    ("l_discount_range", "l_discount < 0 OR l_discount > 0.1"),
    ("l_returnflag_domain", "l_returnflag NOT IN ('A','N','R')"),
    ("l_charge_nonnegative", "l_extendedprice < 0 OR l_tax < 0"),
    ("l_heavy_order_lines", "l_quantity > 45"),  # a rule that FIRES
)


def _dq_oracle() -> str:
    legs = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS rule, "
        f"CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_violations, "
        f"COUNT(*) AS n_checked FROM lineitem"
        for name, pred in DQ_RULES
    )
    return f"SELECT r.rule, r.n_violations, r.n_checked, (r.n_violations = 0) AS passed FROM ({legs}) r"


@register(
    "dq_expectations",
    oracle=_dq_oracle(),
    tags=("quality", "audit"),
)
def dq_expectations(spark: SparkSession, sf: str) -> DataFrame:
    """Expectation-suite gate over lineitem: every rule is one
    SUM(CASE WHEN violated) in a SINGLE aggregate — adding a rule adds
    an expression, never a scan. The tiny 1-row result unpivots to the
    (rule, n_violations, n_checked, passed) report via stack().

    Scale shape: one parquet scan, map-side partial sums, one scalar
    reduce. The oracle's UNION ALL of N scans is the shape to AVOID at
    100 TB — N×scan cost; this plan's cost is independent of rule
    count."""
    return dq_report(load_table(spark, sf, "lineitem"))


def dq_report(li: DataFrame) -> DataFrame:
    """DataFrame-level core of dq_expectations (shared with the 10×
    scale probe)."""
    aggs = [F.count("*").alias("__n")] + [
        F.sum(F.when(F.expr(pred), 1).otherwise(0)).alias(f"__v{i}")
        for i, (_, pred) in enumerate(DQ_RULES)
    ]
    one = li.agg(*aggs)
    stack_args = ", ".join(f"'{name}', __v{i}" for i, (name, _) in enumerate(DQ_RULES))
    return one.select(
        F.expr(f"stack({len(DQ_RULES)}, {stack_args}) AS (rule, n_violations)"),
        F.col("__n").alias("n_checked"),
    ).select(
        "rule",
        "n_violations",
        "n_checked",
        (F.col("n_violations") == 0).alias("passed"),
    )


# Profiled metrics per column: (output name, spark/duckdb-shared agg
# exprs are built per column below).
_PROFILE_COLS = ("doc_id", "n_chars")


def _profile_oracle() -> str:
    legs = [
        f"SELECT '{c}' AS col, COUNT(*) AS n, COUNT({c}) AS n_nonnull, "
        f"COUNT(DISTINCT {c}) AS n_distinct, "
        f"ROUND(MIN({c}), 4) AS min_v, ROUND(MAX({c}), 4) AS max_v, "
        f"ROUND(AVG({c}), 4) AS avg_v FROM documents"
        for c in _PROFILE_COLS
    ]
    legs.append(
        "SELECT 'text_len', COUNT(*), COUNT(text), COUNT(DISTINCT length(text)), "
        "ROUND(MIN(length(text)), 4), ROUND(MAX(length(text)), 4), "
        "ROUND(AVG(length(text)), 4) FROM documents"
    )
    return "\nUNION ALL\n".join(legs)


@register(
    "profile_columns",
    oracle=_profile_oracle(),
    tags=("quality", "profiling"),
)
def profile_columns(spark: SparkSession, sf: str) -> DataFrame:
    """Column profiler (null rate, exact distinct, min/max/mean) for
    the documents table, long format — the stats surface the reference
    never provides for its scans.

    Scale shape: ONE scan; the multi-column COUNT(DISTINCT)s share it
    through Spark's Expand (one extra shuffle of (col, value) pairs —
    the standard multi-distinct plan), everything else partial-
    aggregates. Exact distinct is the audit requirement here; the
    approx_distinct variant for dashboards is `q13_approx_distinct`."""
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "n_chars", F.length("text").alias("__tlen")
    )
    cols = [("doc_id", F.col("doc_id")), ("n_chars", F.col("n_chars")), ("text_len", F.col("__tlen"))]
    aggs = [F.count("*").alias("__n")]
    for name, c in cols:
        # count(length(text)) ≡ count(text): length propagates NULL
        aggs += [
            F.count(c).alias(f"__nn_{name}"),
            F.count_distinct(c).alias(f"__nd_{name}"),
            F.round(F.min(c).cast("double"), 4).alias(f"__mn_{name}"),
            F.round(F.max(c).cast("double"), 4).alias(f"__mx_{name}"),
            F.round(F.avg(c), 4).alias(f"__av_{name}"),
        ]
    one = docs.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', __nn_{name}, __nd_{name}, __mn_{name}, __mx_{name}, __av_{name}"
        for name, _ in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col, n_nonnull, n_distinct, min_v, max_v, avg_v)"
        ),
        F.col("__n").alias("n"),
    ).select("col", "n", "n_nonnull", "n_distinct", "min_v", "max_v", "avg_v")


@register(
    "text_length_histogram",
    oracle="""
    WITH t AS (SELECT len(string_split(text, ' ')) AS n_tok, n_chars FROM documents)
    SELECT (1 << (length(bin(n_tok)) - 1)) AS bucket_lo,
           COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           ROUND(AVG(n_chars), 2) AS avg_chars
    FROM t WHERE n_tok > 0 GROUP BY 1
    """,
    tags=("quality", "histogram", "text"),
)
def text_length_histogram(spark: SparkSession, sf: str) -> DataFrame:
    """Token-length distribution in power-of-2 buckets — the seq-len
    histogram that sizes packing/padding budgets. The bucket floor is
    computed as 1 << (bit_length(n)-1) via bin(): pure integer
    arithmetic, bit-identical in both engines (floor(log2(n)) through
    doubles can round the wrong way at exact powers of two).

    Scale shape: split+size is a scan-speed expression; the groupBy
    carries ~30 distinct buckets — partial aggregation collapses each
    task's output to bucket-count rows before the one tiny shuffle."""
    docs = load_table(spark, sf, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    return (
        docs.select(n_tok.alias("n_tok"), "n_chars")
        .where(F.col("n_tok") > 0)
        .groupBy(
            F.expr("CAST(shiftleft(1L, length(bin(n_tok)) - 1) AS LONG)").alias("bucket_lo")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )
