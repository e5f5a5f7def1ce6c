"""Array/collection expression battery + UNPIVOT.

The reference cannot store or process arrays at all (SURVEY §1.3: no
array/map/struct types); Spark's collection expressions are a major
beyond-reference surface, and the LLM-pipeline operators are built on
them (shingles, embeddings, chunking). This battery pins their
semantics against DuckDB's list functions.

Arrays are compared as strings (array_to_string) — the value-hash
compare treats rows as flat scalars.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table


@register(
    "fn_arrays",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    a AS (SELECT doc_id, list_slice(w, 1, 8) AS w8, len(w) AS n FROM t)
    SELECT doc_id,
           CAST(n AS BIGINT)                                    AS n_tokens,
           array_to_string(w8, ',')                             AS first8,
           array_to_string(list_sort(list_distinct(w8)), ',')   AS sorted_distinct,
           array_to_string(list_reverse(w8), ',')               AS reversed,
           CAST(list_contains(w8, 'data') AS VARCHAR)           AS has_data,
           CAST(list_position(w8, 'data') AS BIGINT)            AS data_pos,
           w8[1]                                                AS head,
           array_to_string(list_concat(w8[1:2], w8[-2:]), ',')  AS ends,
           list_max(w8)                                         AS lex_max,
           list_min(w8)                                         AS lex_min
    FROM a
    """,
    tags=("arrays", "beyond-reference"),
)
def fn_arrays(spark: SparkSession, sf: str) -> DataFrame:
    """Collection expressions over tokenized documents: slice, sort,
    distinct, reverse, contains, position, indexing, concat, min/max.
    All Catalyst array expressions — single scan pass. DuckDB's
    list_position returns 0-when-absent ↔ Spark array_position
    likewise; both use 1-based indexing."""
    docs = load_table(spark, sf, "documents")
    w = F.split(F.col("text"), " ")
    w8 = F.slice(w, 1, 8)
    return docs.select(
        "doc_id",
        F.size(w).cast("long").alias("n_tokens"),
        F.array_join(w8, ",").alias("first8"),
        F.array_join(F.array_sort(F.array_distinct(w8)), ",").alias("sorted_distinct"),
        F.array_join(F.reverse(w8), ",").alias("reversed"),
        F.array_contains(w8, "data").cast("string").alias("has_data"),
        F.array_position(w8, "data").cast("long").alias("data_pos"),
        F.element_at(w8, 1).alias("head"),
        F.array_join(F.concat(F.slice(w8, 1, 2), F.slice(w8, -2, 2)), ",").alias("ends"),
        F.array_max(w8).alias("lex_max"),
        F.array_min(w8).alias("lex_min"),
    )


@register(
    "fn_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
                 l_discount, l_tax
          FROM lineitem WHERE l_orderkey < 100)
    UNPIVOT (val FOR metric IN (l_quantity, l_extendedprice, l_discount, l_tax))
    """,
    tags=("unpivot", "beyond-reference"),
)
def fn_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT (wide → long): the inverse of ev_pivot, a map-side
    row-expansion with no shuffle."""
    li = load_table(spark, sf, "lineitem").where(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "val",
    )
