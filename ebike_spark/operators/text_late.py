"""Late-registered text operators (imported at the END of
plans.registry._load_all so the externally-checked registry prefix is
unchanged).

BPE-ish token counting: pre-training cost accounting is usually quoted
in subword tokens, not whitespace words. A real BPE encode needs the
merges table (see text_vocab_encode for the bounded-vocab variant);
the standard cheap proxy is the GPT-2 *pre-tokenizer* regex, which
splits text into the word/number/punctuation chunks BPE would then
merge within. The upstream pattern uses a negative lookahead, which
RE2 (the oracle engine's regex dialect) does not support, so this uses
the lookahead-free core — identical semantics on Java regex and RE2
for this corpus' character set.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ebike_spark.plans.registry import register
from ebike_spark.sources.registry import load_table

# GPT-2-style pre-tokenizer chunks: optional leading space + letter
# run | digit run | punctuation run. Lookahead-free: valid in both
# Java regex (Spark) and RE2 (DuckDB).
BPE_SPLIT = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


@register(
    "text_bpe_token_count",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             len(regexp_extract_all(text, '{BPE_SPLIT}')) AS n_bpe,
             len(string_split(text, ' ')) AS n_ws
      FROM documents)
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
           ROUND(AVG(n_bpe), 4) AS avg_bpe_tokens,
           ROUND(SUM(n_bpe) * 1.0 / SUM(n_ws), 4) AS bpe_per_word
    FROM t GROUP BY lang
    """,
    tags=("text", "tokens", "bpe"),
)
def text_bpe_token_count(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language BPE-proxy token accounting: subword-chunk counts via
    the GPT-2 pre-tokenizer regex, plus the tokens-per-word fertility
    ratio used to budget training runs.

    100 TB shape: regexp_extract_all evaluates JVM-side inside the one
    scan pass (no Python, no explode — the array is sized and discarded
    per row); the groupBy shuffles one 5-aggregate row per language per
    partition.
    """
    docs = load_table(spark, sf, "documents")
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_SPLIT), F.lit(0)))
    n_ws = F.size(F.split("text", " "))
    t = docs.select("lang", n_bpe.alias("n_bpe"), n_ws.alias("n_ws"))
    return t.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_bpe").cast("long").alias("total_bpe_tokens"),
        F.round(F.avg("n_bpe"), 4).alias("avg_bpe_tokens"),
        F.round(F.sum("n_bpe") * 1.0 / F.sum("n_ws"), 4).alias("bpe_per_word"),
    )
