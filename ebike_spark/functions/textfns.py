"""Reusable Column-expression helpers.

Everything here compiles to JVM-side Catalyst expressions (no Python
UDFs) so the hot path stays inside whole-stage codegen. Hash parity
with external oracles is achieved via md5 (identical in every engine)
truncated to 56 bits, never via engine-native hash functions
(Spark xxhash64 and DuckDB hash() do NOT agree).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# 56-bit md5 prefix: fits BIGINT in both Spark and DuckDB, always >= 0.
MD5_HEX_DIGITS = 14


def md5_long(col: Column | str) -> Column:
    """Deterministic 56-bit integer hash of a string.

    DuckDB equivalent: CAST('0x' || substr(md5(x), 1, 14) AS BIGINT).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, MD5_HEX_DIGITS), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """The DuckDB-side twin of :func:`md5_long` (for oracle strings)."""
    return f"CAST('0x' || substr(md5({expr}), 1, {MD5_HEX_DIGITS}) AS BIGINT)"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization. DuckDB twin: string_split(x, ' ')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles(tok: Column, n: int) -> Column:
    """Word n-gram shingles of a token array (duplicates preserved; call
    array_distinct for set semantics).

    NOTE: higher-order functions evaluate interpreted (outside
    whole-stage codegen); for bulk shingle extraction the
    posexplode+lead construction in operators/dedup.shingle_set
    measured 3× faster — prefer it on hot paths. This helper remains
    for array-shaped outputs (one row per document)."""
    size = F.size(tok)
    grams = F.transform(
        F.sequence(F.lit(1), size - n + 1),
        lambda i: F.concat_ws(" ", F.slice(tok, i, n)),
    )
    return F.when(size >= n, grams).otherwise(F.array().cast("array<string>"))


def dot(a: Column, b: Column) -> Column:
    """Sequential (left-to-right) dot product of two array<double> —
    same summation order as a scalar loop, for oracle-stable floats."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns.

    Matches DuckDB's list_cosine_similarity on DOUBLE[] inputs to within
    ~1e-15 (both are double dot/norm computations); compare with a ROUND
    or a threshold, never exact equality.
    """
    return dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))
