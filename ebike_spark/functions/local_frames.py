"""Driver-sized result/dimension frames without the Python-RDD tax.

``spark.createDataFrame(list, schema)`` parallelizes the rows into
``defaultParallelism`` (32 here) Python-pickled partitions, so EVERY
downstream action pays ~32 Python-worker round-trips — measured r12:
counting a ONE-ROW audit frame costs ~0.40 s that way, ~0.27 s via a
single-partition parallelize, and ~0.10 s (the bare single-job
scheduling floor) as a JVM-only literal projection. The verdict/audit
rows this repo returns (bounded booleans + scalars) and the small
dimension tables it joins (centroids, query vectors, merge tables) are
exactly that shape, and in the driver bench each one was paying the
Python-RDD tax on every timed run (`ann_ivf_topk`'s "unexplained"
0.3–0.6 s row was 90% this — VERDICT-r11 task 3).

``local_df`` keeps rows ≤ ``_INLINE_MAX`` fully JVM-side: one
``Range(0,1) → Project → Inline(array<struct>)`` of literals, cast
per-field to the declared DDL type — same column NAMES and TYPES as
``createDataFrame`` (what the oracle compare and every join here
keys on), though NULLABILITY may differ: a non-null literal column
comes out non-nullable on the inline path, nullable on the fallback/
createDataFrame path (review r12 — don't assert strict schema
equality against a createDataFrame twin). Bigger (but still bounded)
row lists fall back to a SINGLE-partition parallelize — one Python
task instead of 32. Unbounded data must never come through here;
that is what real scans and shuffles are for.
"""

from __future__ import annotations

import numbers

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegralType,
    StringType,
    StructType,
)

# Above this, one literal-struct per row stops being a reasonable plan
# (expression-tree size grows linearly and analysis cost with it).
_INLINE_MAX = 64


def _check_scalar(v, dt, where: str) -> None:
    """Driver-side type check so BOTH paths fail like createDataFrame.

    The inline path builds ``F.lit(v).cast(dt)``, and a non-ANSI cast
    silently coerces a wrong-typed value to NULL (e.g. a stray string
    in a long field) where ``createDataFrame`` raises — so without
    this, the same caller bug surfaces as silent nulls on small row
    lists and a TypeError above ``_INLINE_MAX`` (ADVICE-r12). None is
    legal everywhere, matching createDataFrame's nullable rows."""
    if v is None:
        return
    if isinstance(dt, BooleanType):
        ok = isinstance(v, bool) or type(v).__name__ == "bool_"
    elif isinstance(dt, IntegralType):
        # bool is an Integral subclass in Python; reject it like the
        # createDataFrame verifier does
        ok = isinstance(v, numbers.Integral) and not isinstance(v, bool)
    elif isinstance(dt, (DoubleType, FloatType)):
        # strictly float, matching createDataFrame's verifier — an int
        # here silently casts on the inline path but crashes executor-
        # side on the parallelize fallback (review r13)
        ok = isinstance(v, float) or type(v).__name__ in (
            "float64",
            "float32",
            "float16",
        )
    elif isinstance(dt, DecimalType):
        # createDataFrame accepts decimal.Decimal; mirror by passing
        # through — lit()/createDataFrame raise their own error on a
        # wrong type (review r13: DecimalType is FractionalType but
        # Decimal is not numbers.Real, so a Real check rejected it)
        ok = True
    elif isinstance(dt, StringType):
        ok = isinstance(v, str)
    elif isinstance(dt, ArrayType):
        ok = isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
        if ok:
            for x in v:
                _check_scalar(x, dt.elementType, where)
    else:
        # dates/timestamps/decimals/structs never come through here
        # today; let lit()/createDataFrame raise their own error
        ok = True
    if not ok:
        raise TypeError(
            f"local_df field {where} expects {dt.simpleString()}, got"
            f" {type(v).__name__}: {v!r}"
        )


def local_df(spark: SparkSession, rows, schema: str | StructType) -> DataFrame:
    """Build a DataFrame from a small driver-side row list.

    Drop-in for ``spark.createDataFrame(rows, schema)`` for bounded
    result/dimension frames; rows may be tuples/lists matching the
    schema's field order. Field values must be plain scalars or
    lists (array columns) — the literal path covers everything this
    repo returns driver-side.
    """
    st = (
        StructType.fromDDL(schema)
        if isinstance(schema, str)
        else schema
    )
    rows = list(rows)
    for row in rows:
        # fail as loudly as createDataFrame would — zip() below would
        # silently truncate a short row (review r12)
        if len(row) != len(st.fields):
            raise TypeError(
                f"local_df row has {len(row)} values for"
                f" {len(st.fields)} schema fields: {row!r}"
            )
        for v, f_ in zip(row, st.fields):
            _check_scalar(v, f_.dataType, f_.name)
    if not rows or len(rows) > _INLINE_MAX:
        if not rows:
            return spark.createDataFrame(rows, st)
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1), st
        )
    structs = [
        F.struct(
            *[
                F.lit(v).cast(f.dataType).alias(f.name)
                for v, f in zip(row, st.fields)
            ]
        )
        for row in rows
    ]
    return spark.range(0, 1, 1, 1).select(
        F.inline(F.array(*structs))
    )
