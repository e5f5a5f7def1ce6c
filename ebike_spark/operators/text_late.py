"""Late-registered text operators (imported at the END of
plans.registry._load_all so the externally-checked registry prefix is
unchanged).

BPE-ish token counting: pre-training cost accounting is usually quoted
in subword tokens, not whitespace words. The full trainer→encoder
story lives below since r11 (text_bpe_learn_merges learns the merge
table exactly; text_bpe_encode accounts tokens under it;
text_vocab_encode is the bounded-vocab variant); the cheap proxy
retained here is the GPT-2 *pre-tokenizer* regex, which
splits text into the word/number/punctuation chunks BPE would then
merge within. The upstream pattern uses a negative lookahead, which
RE2 (the oracle engine's regex dialect) does not support, so this uses
the lookahead-free core — identical semantics on Java regex and RE2
for this corpus' character set.
"""

from __future__ import annotations

import weakref

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ebike_spark.functions.local_frames import local_df
from ebike_spark.functions.textfns import tokens
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


# Global quality-percentile filter: "keep the top decile by quality
# score" — corpus curation's standard selection step once scores exist.
QUALITY_PERCENTILE = 0.9


def _qp_oracle() -> str:
    from ebike_spark.operators.text import STOPWORDS

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS nt,
             len(list_filter(string_split(text, ' '), w -> w IN ({sw}))) AS ns
      FROM documents),
    s AS (SELECT doc_id, least(1.0, nt / 100.0) * (1 - ns * 1.0 / nt) AS score FROM t),
    q AS (SELECT quantile_cont(score, {QUALITY_PERCENTILE}) AS thr FROM s)
    SELECT s.doc_id, ROUND(s.score, 4) AS score FROM s, q WHERE s.score >= q.thr
    """


def _text_quality_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Docs at or above the corpus-wide p{int(QUALITY_PERCENTILE*100)}
    quality score (same composite score as text_quality).

    Plan: one scoring scan → a 1-row exact-percentile aggregate →
    broadcast that row back onto the scored scan (a 1-row broadcast
    nested-loop join, no driver round-trip) → filter. The exact
    `percentile` aggregate buffers the group's values, which is the
    correct oracle-parity choice at test SF; at 100 TB the one-line
    swap is `approx_percentile(score, p)` — a t-digest sketch with
    mergeable partial aggregates, leaving the rest of the plan (the
    broadcast scalar + filter) unchanged. Spark's linear interpolation
    matches DuckDB's quantile_cont bit-for-bit on this corpus (checked
    at all three SFs), so `>=` selects identical row sets."""
    from ebike_spark.operators.text import STOPWORDS

    docs = load_table(spark, sf, "documents")
    tok = tokens(F.col("text"))
    n_tokens = F.size(tok)
    n_stop = F.size(F.filter(tok, lambda w: w.isin(*STOPWORDS)))
    stop_ratio = n_stop * 1.0 / n_tokens
    score = F.least(F.lit(1.0), n_tokens / 100.0) * (1 - stop_ratio)
    scored = docs.select("doc_id", score.alias("score"))
    thr = scored.agg(F.expr(f"percentile(score, {QUALITY_PERCENTILE})").alias("thr"))
    return (
        scored.crossJoin(F.broadcast(thr))
        .where(F.col("score") >= F.col("thr"))
        .select("doc_id", F.round("score", 4).alias("score"))
    )


def _register_qp() -> None:
    register(
        "text_quality_percentile",
        oracle=_qp_oracle(),
        tags=("text", "quality", "percentile"),
    )(_text_quality_percentile)


_register_qp()


@register(
    "text_ttr_profile",
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w
      FROM documents),
    tk AS (SELECT source, w FROM tok WHERE w <> ''),
    wc AS (SELECT source, w, COUNT(*) AS c FROM tk GROUP BY 1, 2)
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(MAX(c) AS BIGINT) AS max_word_freq
    FROM wc GROUP BY 1
    """,
    tags=("text", "vocabulary", "corpus-stats"),
)
def text_ttr_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source lexical-diversity profile: token count, distinct
    types, hapax legomena (words seen exactly once) and the modal
    word's frequency — the type-token-ratio / hapax-rate inputs that
    corpus-quality dashboards plot per data source (a source whose TTR
    collapses is usually template spam; a hapax explosion is usually
    encoding noise). Complements text_novelty_score (cross-corpus
    first-occurrence) with the classic within-source summary.

    Scale shape: explode → two cascaded aggregates, each with map-side
    partials: (source, word) counts shuffle on the word-bearing key
    (vocabulary-sized, the dedup-family gram discipline — never a
    vocab broadcast), then collapse to one row per source. No window,
    no join, no Python."""
    d = load_table(spark, sf, "documents")
    w = d.select(
        "source", F.explode(tokens("text")).alias("w")
    ).where(F.col("w") != "")
    wc = w.groupBy("source", "w").agg(F.count("*").alias("c"))
    return wc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.max("c").alias("max_word_freq"),
    )


DOC_KEYWORDS_K = 3


@register(
    "text_doc_keywords",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
           WHERE term <> '' GROUP BY 1, 2),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    r AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, df.df ASC, tf.term) AS rnk
      FROM tf JOIN df USING (term))
    SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
    FROM r WHERE rnk <= {DOC_KEYWORDS_K}
    """,
    tags=("text", "keywords", "tfidf"),
)
def text_doc_keywords(spark: SparkSession, sf: str) -> DataFrame:
    """Per-document keyword extraction, integer-rank variant: the top
    {DOC_KEYWORDS_K} terms per doc ordered by term frequency DESC then
    document frequency ASC (rarer wins ties) then term — the tf-idf
    ranking with idf's monotone role played by the raw df ORDER
    instead of ln(N/df), which keeps the ranking EXACT across engines
    (libm log ulps can swap near-tied keywords; an integer sort key
    cannot). The per-doc tagging complement of text_tfidf_top_terms'
    corpus-level list.

    Scale shape: (doc, term) tf aggregate with map-side partials; df
    is COUNT(*) OVER the term partition of THAT frame (tf's rows are
    the distinct (doc, term) pairs, so the partition row count IS the
    document frequency — one term-keyed shuffle instead of the former
    agg-on-term + join-back pair, which re-executed the tf subtree
    for both branches; r12 rewrite); the rank window partitions per
    doc (distinct-term-sized partitions). All shuffles
    corpus-token-proportional or smaller. r14 re-examined and KEPT
    this shape (the text_tfidf_top_terms twin): a raw
    repartition(term) of the token stream fuses one exchange locally
    but un-bounds the hottest term's partition (corpus-token-
    proportional, unsplittable by AQE outside joins) and forfeits
    map-side partial aggregation — the committed exchanges each carry
    ≤ 1 row per (doc, term) (review r14)."""
    d = load_table(spark, sf, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    wdf = Window.partitionBy("term")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), "term"
    )
    return (
        tf.withColumn("df", F.count("*").over(wdf))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= DOC_KEYWORDS_K)
        .select("doc_id", "rnk", "term", "tf", "df")
    )


CMS_D = 3  # hash rows (seeds)
CMS_W = 64  # buckets per row
CMS_TOPK = 10


def _cms_oracle() -> str:
    from ebike_spark.functions.textfns import md5_long_sql

    pos = md5_long_sql("CAST(s AS VARCHAR) || '#' || t")
    seeds = ", ".join(str(s) for s in range(1, CMS_D + 1))
    # portable form: every position is computed in a plain comma-join
    # CTE's SELECT and joined via USING — no implicit-lateral ON-clause
    # references (ANSI/Postgres reject those; DuckDB merely tolerates)
    return f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t FROM documents),
    tc AS (SELECT t, COUNT(*) AS c FROM tok WHERE t <> '' GROUP BY 1),
    seeds AS (SELECT UNNEST([{seeds}]) AS s),
    cells AS (
      SELECT s, {pos} % {CMS_W} AS b, CAST(SUM(c) AS BIGINT) AS cell
      FROM tc, seeds GROUP BY 1, 2),
    topk AS (SELECT t, c FROM tc ORDER BY c DESC, t LIMIT {CMS_TOPK}),
    kp AS (SELECT t, c, s, {pos} % {CMS_W} AS b FROM topk, seeds),
    est AS (
      SELECT kp.t, kp.c, MIN(cl.cell) AS cms_est
      FROM kp JOIN cells cl USING (s, b)
      GROUP BY 1, 2)
    SELECT t AS term, CAST(c AS BIGINT) AS exact_count,
           CAST(cms_est AS BIGINT) AS cms_estimate,
           CAST(cms_est - c AS BIGINT) AS overestimate
    FROM est
    """


@register(
    "text_heavy_hitters_cms",
    oracle=_cms_oracle(),
    tags=("text", "sketch", "count-min", "heavy-hitters"),
)
def text_heavy_hitters_cms(spark: SparkSession, sf: str) -> DataFrame:
    """Count-Min-sketch heavy hitters with a cross-engine-EXACT
    sketch: the corpus token stream folds into a {CMS_D}x{CMS_W}
    integer cell grid (md5-seeded bucket per row — the same
    determinism trick as corpus_bloom_decontaminate), and the true
    top-{CMS_TOPK} terms are read back through the sketch
    (estimate = min over rows of their cell). CMS's guarantee —
    estimate >= exact, overestimate bounded by collisions — is emitted
    as integer columns and hash-matches DuckDB because both engines
    build the IDENTICAL sketch. The audit shape a pipeline uses to
    size W before trusting the sketch for unbounded-vocabulary
    streams.

    Scale shape: term counts aggregate with map-side partials
    (vocabulary-keyed shuffle, the gram discipline); the sketch is a
    SECOND aggregate of that frame down to {CMS_D}x{CMS_W} cells —
    constant-size regardless of vocabulary, which is the whole point
    of CMS (the cells, not the vocab, are what a streaming/merging
    pipeline ships). Top-k is a TakeOrdered over the count frame;
    the estimate join touches k x {CMS_D} rows against the broadcast
    cell grid."""
    from ebike_spark.functions.textfns import md5_long

    d = load_table(spark, sf, "documents")
    tc = (
        d.select(F.explode(tokens("text")).alias("t"))
        .where(F.col("t") != "")
        .groupBy("t")
        .agg(F.count("*").alias("c"))
    )
    seeds = F.array(*[F.lit(s) for s in range(1, CMS_D + 1)])
    exploded = tc.select("t", "c", F.explode(seeds).alias("s"))
    bucket = md5_long(
        F.concat(F.col("s").cast("string"), F.lit("#"), F.col("t"))
    ) % CMS_W
    cells = (
        exploded.select("s", bucket.alias("b"), "c")
        .groupBy("s", "b")
        .agg(F.sum("c").alias("cell"))
    )
    topk = tc.orderBy(F.col("c").desc(), "t").limit(CMS_TOPK)
    est = (
        topk.select("t", "c", F.explode(seeds).alias("s"))
        .withColumn("b", bucket)
        .join(F.broadcast(cells), ["s", "b"])
        .groupBy("t", "c")
        .agg(F.min("cell").alias("cms_est"))
    )
    return est.select(
        F.col("t").alias("term"),
        F.col("c").alias("exact_count"),
        F.col("cms_est").alias("cms_estimate"),
        (F.col("cms_est") - F.col("c")).alias("overestimate"),
    )


ZIPF_TOPK = 100
ZIPF_Q = 10_000  # ln-value fixed-point quantum (integer OLS below)


@register(
    "text_zipf_fit",
    oracle=f"""
    WITH tf AS (
      SELECT term, COUNT(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      WHERE term != '' GROUP BY term),
    ranked AS (
      SELECT CAST(FLOOR(ln(ROW_NUMBER() OVER (ORDER BY c DESC, term)) * {ZIPF_Q} + 0.500000001) AS BIGINT) AS x,
             CAST(FLOOR(ln(c) * {ZIPF_Q} + 0.500000001) AS BIGINT) AS y
      FROM tf ORDER BY c DESC, term LIMIT {ZIPF_TOPK}),
    s AS (
      SELECT COUNT(*) AS k, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM ranked)
    SELECT CAST(k AS BIGINT) AS k,
           CAST(k * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(k * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST(k * sxy - sx * sy AS DOUBLE) / (k * sxx - sx * sx) AS zipf_slope
    FROM s
    """,
    tags=("text", "zipf", "corpus-health"),
)
def text_zipf_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Zipf rank-frequency fit — the corpus-health scalar every corpus
    audit quotes: OLS slope of ln(frequency) on ln(rank) over the top
    {ZIPF_TOPK} terms (natural language sits near −1; a synthetic or
    heavily-duplicated corpus drifts). The regression runs in exact
    INTEGER arithmetic: ln values quantize to {ZIPF_Q}ths (fixed
    point), then slope = (kΣxy − ΣxΣy)/(kΣxx − (Σx)²) over BIGINTs —
    order-insensitive and bit-identical across engines, so the emitted
    double is the same division on both sides (the repo's float-parity
    house rule; a float OLS would drift by summation order).

    Scale shape: term frequencies are one gram-keyed shuffle with
    map-side partials (vocabulary-sized result, no vocab broadcast);
    the top-k is TakeOrderedAndProject; the regression input is a
    constant {ZIPF_TOPK} rows."""
    d = load_table(spark, sf, "documents")
    tf = (
        d.select(F.explode(tokens("text")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    topk = tf.orderBy(F.col("c").desc(), "term").limit(ZIPF_TOPK)
    w = Window.orderBy(F.col("c").desc(), "term")
    # FLOOR(v*Q + 0.5 + 1e-9), not ROUND(v*Q): JVM Math.log and DuckDB's
    # libm log differ by up to 1 ulp, and ROUND flips the fixed-point
    # integer when v*Q lands within that ulp of a .5 boundary. The 1e-9
    # nudge (same decimal literal both engines — parses to the same
    # double) moves the boundary off the hazard; all inputs are >= 1 so
    # ln >= 0 and floor(v+0.5) == round(v) elsewhere.
    ranked = topk.select(
        F.floor(F.log(F.row_number().over(w).cast("double")) * ZIPF_Q + F.lit(0.500000001))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("c").cast("double")) * ZIPF_Q + F.lit(0.500000001))
        .cast("long")
        .alias("y"),
    )
    s = ranked.agg(
        F.count("*").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        F.col("k").cast("long").alias("k"),
        num.cast("long").alias("slope_num"),
        den.cast("long").alias("slope_den"),
        (num.cast("double") / den).alias("zipf_slope"),
    )


# ----------------------------------------------------- char diversity

# Character-diversity quality gate: per-document character histogram
# statistics (total / distinct / modal-character count), rolled up per
# language. The modal-character fraction is the cheapest "garbage run"
# detector (a doc whose single most frequent character exceeds 20% of
# the body is usually padding, ASCII art, or extraction failure), and
# alphabet size separates natural prose from numeric/log dumps — both
# standard corpus-quality heuristics (Gopher-rule family). All outputs
# are exact integers: the 20% gate is the integer comparison
# 5*max_count > n_chars, so the oracle reproduces every value
# bit-for-bit with no float quantization.

CHAR_DIVERSITY_SCHEMA = (
    "lang string, n_chars long, n_distinct long, max_c long"
)


def make_char_histogram():
    """Factory (executors don't have ebike_spark on PYTHONPATH — the
    returned closure must only reference stdlib/pandas names)."""
    from collections import Counter

    import pandas as pd

    def histo(batches):
        for pdf in batches:
            rows = []
            for lang, text in zip(pdf["lang"], pdf["text"]):
                c = Counter(text)
                rows.append(
                    (lang, len(text), len(c), max(c.values()) if c else 0)
                )
            yield pd.DataFrame(
                rows, columns=["lang", "n_chars", "n_distinct", "max_c"]
            )

    return histo


@register(
    "text_char_diversity",
    oracle="""
    WITH ch AS (
      SELECT doc_id, lang, unnest(string_split(text, '')) AS ch
      FROM documents WHERE text != ''),
    freq AS (
      SELECT doc_id, lang, ch, COUNT(*) AS c FROM ch GROUP BY 1, 2, 3),
    per AS (
      SELECT doc_id, lang, SUM(c) AS n_chars, COUNT(*) AS n_distinct,
             MAX(c) AS max_c
      FROM freq GROUP BY 1, 2)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_distinct) AS BIGINT) AS total_distinct,
           CAST(SUM(CASE WHEN 5 * max_c > n_chars THEN 1 ELSE 0 END)
                AS BIGINT) AS n_low_diversity,
           CAST(SUM(CASE WHEN n_distinct >= 30 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_rich_alphabet
    FROM per GROUP BY lang
    """,
    tags=("text", "quality", "pandas-udf"),
)
def text_char_diversity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language character-diversity profile: doc counts, total and
    distinct character sums, low-diversity docs (modal character above
    20% of the body — integer gate 5*max > n), and rich-alphabet docs
    (≥30 distinct characters). Scale shape: the histogram is a
    MAP-ONLY Arrow stage (one C-speed Counter per document inside
    mapInPandas — no per-character explode, which would shuffle
    body-sized data); the rollup shuffles only 4 integers per document
    on language keys. The oracle recomputes the same integers via
    char explode, affordable at oracle SF only."""
    docs = (
        load_table(spark, sf, "documents")
        .where(F.col("text") != "")
        .select("lang", "text")
    )
    per = docs.mapInPandas(make_char_histogram(), CHAR_DIVERSITY_SCHEMA)
    low = F.when(5 * F.col("max_c") > F.col("n_chars"), 1).otherwise(0)
    rich = F.when(F.col("n_distinct") >= 30, 1).otherwise(0)
    return per.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum("n_distinct").cast("long").alias("total_distinct"),
        F.sum(low).cast("long").alias("n_low_diversity"),
        F.sum(rich).cast("long").alias("n_rich_alphabet"),
    )


# ------------------------------------------------ fuzzy vocabulary

# SymSpell-style fuzzy matching over the corpus VOCABULARY: find every
# distinct-token pair within Levenshtein distance ≤ FUZZY_K — the
# typo/variant-normalization primitive of text-cleaning pipelines.
# Scale shape: the Spark side never forms the quadratic pair space.
# Each token explodes its ≤-FUZZY_K-DELETION neighborhood (0, 1 and 2
# character deletions — C(L,2)+L+1 short strings, vocabulary-sized
# total, corpus size only affects the distinct-token scan), candidate
# pairs come from an EQUI-join on the shared variant, and a final
# levenshtein verify keeps true pairs. Losslessness is a theorem, not
# a hope: an edit script of cost d ≤ k aligns a and b on a common
# subsequence reachable by deleting ≤ d chars from EACH side (a
# substitution deletes one char from both, an insert/delete deletes
# one char from one side), so the deletion neighborhoods of any pair
# within distance k intersect. The DuckDB oracle runs the QUADRATIC
# ground-truth join — the hash compare proves the blocking recalls
# every pair exactly (the same scale-path-vs-ground-truth discipline
# as dedup_minhash_lsh vs dedup_ngram_jaccard, for a family the
# inventory lacked: approximate STRING matching).
FUZZY_K = 2
FUZZY_MIN_LEN = 3
# deletion neighborhoods are O(L^2) per token — bound the DP width
# and the variant fan-out; real pipelines route longer strings
# through the same construction with k scaled down, documented
FUZZY_MAX_LEN = 24


def _deletion_neighborhood(tok):
    """Array of all strings obtained from ``tok`` by deleting 0, 1 or
    2 characters — pure built-in HOFs (sequence/transform/flatten),
    whole-stage codegen, no Python on the hot path."""
    length = F.length(tok)
    suffix_cap = F.lit(1 << 20)
    one = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.concat(
            F.substring(tok, F.lit(1), i - 1),
            F.substring(tok, i + 1, suffix_cap),
        ),
    )
    two = F.flatten(
        F.transform(
            F.sequence(F.lit(1), length - 1),
            lambda i: F.transform(
                F.sequence(i + 1, length),
                lambda j: F.concat(
                    F.substring(tok, F.lit(1), i - 1),
                    F.substring(tok, i + 1, j - i - 1),
                    F.substring(tok, j + 1, suffix_cap),
                ),
            ),
        )
    )
    return F.array_distinct(
        F.concat(F.array(tok), one, F.when(length >= 2, two).otherwise(F.array()))
    )


@register(
    "text_fuzzy_variants",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
      FROM documents),
    t AS (SELECT tok FROM toks
          WHERE length(tok) BETWEEN {FUZZY_MIN_LEN} AND {FUZZY_MAX_LEN})
    SELECT a.tok AS tok_a, b.tok AS tok_b,
           CAST(levenshtein(a.tok, b.tok) AS BIGINT) AS dist
    FROM t a JOIN t b ON a.tok < b.tok
    WHERE levenshtein(a.tok, b.tok) <= {FUZZY_K}
    """,
    tags=("text", "fuzzy", "edit-distance", "vocabulary"),
)
def text_fuzzy_variants(spark: SparkSession, sf: str) -> DataFrame:
    """Every distinct-token pair within Levenshtein ≤ {FUZZY_K}
    (module comment has the full scale/losslessness story). The
    benched plan: distinct-token scan → deletion-neighborhood explode
    → variant equi-join → distinct pairs → levenshtein verify. No
    cartesian/BNLJ anywhere (plan-asserted in the unit suite); the
    oracle IS the quadratic ground truth, so the hash compare is a
    per-run recall proof of the deletion blocking."""
    docs = load_table(spark, sf, "documents")
    toks = (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .where(F.length("tok").between(FUZZY_MIN_LEN, FUZZY_MAX_LEN))
        .distinct()
    )
    variants = toks.select(
        "tok", F.explode(_deletion_neighborhood(F.col("tok"))).alias("var")
    )
    a = variants.alias("a")
    b = variants.alias("b")
    pairs = (
        a.join(b, (F.col("a.var") == F.col("b.var")) & (F.col("a.tok") < F.col("b.tok")))
        .select(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .distinct()
    )
    dist = F.levenshtein("tok_a", "tok_b")
    return pairs.where(dist <= FUZZY_K).select(
        "tok_a", "tok_b", dist.cast("long").alias("dist")
    )


# ------------------------------------------------ BPE merge learning (r11)
#
# The trainer half of the BPE story (text_bpe_token_count is the cost
# proxy, text_vocab_encode the bounded-vocab encoder): learn the first
# BPE_MERGES merge rules from the corpus, exactly — the iterative
# algorithm at the heart of every subword tokenizer (GPT-2's trainer
# is this loop). Classic trainer decomposition: ONE corpus scan builds
# the word-frequency table, then every iteration runs over the
# VOCABULARY (distinct words), never the corpus. TODO_r11 scoped this
# "oracle hard — likely rows-only"; it gets a FULL exact oracle: pair
# counts are integer sums, the argmax tie-breaks deterministically
# (count DESC, pair ASC — byte order on ASCII is identical in both
# engines), and the merge application is a plain substring replace
# with identical left-to-right non-overlapping semantics in Spark and
# DuckDB (probed: both equal Python str.replace byte-for-byte).
#
# One documented convention: merges apply via space-padded replace
# (' e r ' -> ' er '), whose consumed separator skips every OTHER
# occurrence inside a same-pair run ('b b b b' -> 'bb b b' in one
# pass, not 'bb bb'). Deterministic and engine-identical; classic BPE
# implementations themselves disagree on run handling. The unit suite
# replays an independent pure-Python trainer with the same convention.

BPE_MERGES = 4


def _bpe_pair_count_step(vocab: DataFrame, seq):
    """ONE merge iteration's pair-count frame over the cached vocab:
    explode the current adjacent symbol pairs of ``seq`` (a Column) and
    sum word frequencies per pair — built-in HOFs only, joinless,
    vocabulary-sized. Shared by the operator loop and the plan-shape
    test so the asserted plan can't drift from the one that runs."""
    parts = F.split(seq, " ")
    pairs = F.transform(
        F.slice(parts, 1, F.size(parts) - 1),
        lambda x, i: F.concat_ws(" ", x, F.get(parts, i + 1)),
    )
    return (
        vocab.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def _bpe_oracle(k_merges: int = BPE_MERGES) -> str:
    steps = []
    selects = []
    prev = "v0"
    for k in range(1, k_merges + 1):
        steps.append(f"""
    p{k} AS (SELECT parts[i] || ' ' || parts[i+1] AS pair,
                    SUM(freq)::BIGINT AS cnt
             FROM (SELECT freq, string_split(seq, ' ') AS parts FROM {prev}) t,
                  UNNEST(generate_series(1, len(parts) - 1)) AS u(i)
             GROUP BY 1),
    b{k} AS (SELECT pair, cnt FROM p{k} ORDER BY cnt DESC, pair LIMIT 1),
    v{k} AS (SELECT word, freq,
                    trim(replace(' ' || seq || ' ',
                                 ' ' || (SELECT pair FROM b{k}) || ' ',
                                 ' ' || replace((SELECT pair FROM b{k}), ' ', '') || ' ')) AS seq
             FROM {prev})""")
        selects.append(
            f"SELECT {k} AS step, pair, replace(pair, ' ', '') AS merged,"
            f" cnt FROM b{k}"
        )
        prev = f"v{k}"
    return f"""
    WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
    v0 AS (SELECT word, COUNT(*)::BIGINT AS freq,
                  trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq
           FROM w WHERE word <> '' GROUP BY word),
    {','.join(steps)}
    {' UNION ALL '.join(selects)}
    """


@register(
    "text_bpe_learn_merges",
    oracle=_bpe_oracle(),
    tags=("text", "bpe", "iterative", "beyond-reference", "verdictless-exact"),
)
def text_bpe_learn_merges(spark: SparkSession, sf: str) -> DataFrame:
    """Learn the first {BPE_MERGES} BPE merges from the documents
    corpus: (step, pair, merged, cnt), exactly — see the module
    comment for the engine-parity argument. The DuckDB oracle unrolls
    the same iterations as chained CTEs.

    Scale shape: the corpus is scanned ONCE into the word-frequency
    table (one shuffle on word — the classic BPE-trainer reduction:
    100 TB of text collapses to a vocabulary-sized table at ingest);
    each merge iteration is then a vocabulary-sized job — explode the
    current symbol pairs (built-in HOFs, codegen), one partial-agg
    shuffle, TakeOrdered(1) for the argmax — plus a driver append of
    one bounded row. Merge application stacks as nested replace
    EXPRESSIONS over the cached vocab frame (no intermediate
    materialization; iteration k re-evaluates k-1 replaces map-side,
    the standard lazy-lineage trade at tiny k). The merges table is
    driver-sized by construction (one row per learned rule) — the
    bounded-collect regime."""
    merges, _, _ = _bpe_learn(spark, sf)
    return local_df(
        spark, merges, "step int, pair string, merged string, cnt long"
    )


def _bpe_learn(spark: SparkSession, sf: str):
    """(merges, cached vocab frame, final seq Column) — the shared
    trainer loop behind text_bpe_learn_merges (returns the merge
    table) and text_bpe_encode (applies the final seq expression).

    This function always runs the trainer loop live — it is the
    workload text_bpe_learn_merges exists to measure, so THAT row
    never reads a memo (review r11's rejection, unchanged). The
    ENCODER row is different: since r14, text_bpe_encode reads the
    (session, sf, conf)-scoped memo _bpe_learned_scoped — applying an
    already-trained tokenizer is the encoder's declared contract, and
    its timed work (wl aggregate + vocab join + rollup) re-executes
    per invocation. The corpus scan is amortized for both via the
    session-scoped vocab cache; re-running the loop costs BPE_MERGES
    vocabulary-sized jobs per invocation."""
    docs = load_table(spark, sf, "documents")
    from ebike_spark.operators.dedup import _persist_scoped

    def _vocab():
        return (
            docs.select(F.explode(F.split("text", " ")).alias("word"))
            .where(F.col("word") != "")
            .groupBy("word")
            .agg(F.count("*").cast("long").alias("freq"))
            # seq = space-separated characters ("key" -> "k e y")
            .withColumn("seq", F.trim(F.regexp_replace("word", "(.)", "$1 ")))
            # vocabulary-sized by construction — same bounded-rollup
            # coalesce as the graph family's edge frames
            .coalesce(1)
        )

    vocab = _persist_scoped(spark, "bpe_vocab", _vocab, key=sf)
    seq = F.col("seq")
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, BPE_MERGES + 1):
        top = (
            _bpe_pair_count_step(vocab, seq)
            .orderBy(F.desc("cnt"), "pair")
            .limit(1)
            .collect()
        )
        if not top:
            # degenerate corpus: every word collapsed to one symbol
            # before BPE_MERGES iterations — fail loudly (the oracle's
            # scalar subqueries would cascade NULL seqs here, so a
            # clear error beats a silent cross-engine divergence)
            raise ValueError(
                f"corpus exhausted adjacent pairs at merge step {k};"
                f" lower BPE_MERGES (oracle unrolls the same constant)"
            )
        best = top[0]
        pair, merged = best["pair"], best["pair"].replace(" ", "")
        merges.append((k, pair, merged, best["cnt"]))
        seq = F.trim(
            F.replace(
                F.concat(F.lit(" "), seq, F.lit(" ")),
                F.lit(f" {pair} "),
                F.lit(f" {merged} "),
            )
        )
    return merges, vocab, seq


# (session → {(sf, conf_key) → (merges, vocab frame, seq Column)}) —
# the trained-tokenizer memo behind text_bpe_encode (r14, VERDICT-r13
# task 6). The ENCODER's declared contract is applying an
# already-learned merge table — production tokenizer accounting never
# retrains per query — so the trainer loop runs ONCE per (session,
# fixture) in the bench's untimed warm pass and the timed probe is the
# encode plan alone (wl aggregate + vocab join), exactly the
# index-off-the-timed-path lifecycle of ann_ivf and the incremental
# dedup operators. text_bpe_learn_merges deliberately does NOT read
# this memo: the trainer loop IS that row's measured workload (the r11
# rejection of memoizing it stands unchanged). Keyed on the same
# result-relevant session confs as the plan cache so a mid-session
# ANSI/timezone flip relearns instead of serving stale merges.
_BPE_LEARNED: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _bpe_learned_scoped(spark: SparkSession, sf: str):
    from ebike_spark.plans.registry import _session_conf_key

    key = (sf, _session_conf_key(spark))
    pool = _BPE_LEARNED.setdefault(spark, {})
    hit = pool.get(key)
    if hit is None:
        hit = _bpe_learn(spark, sf)
        pool[key] = hit
    return hit


def _bpe_encode_oracle(k_merges: int = BPE_MERGES) -> str:
    """The trainer CTE chain through v{K}, then re-scan the corpus for
    per-language word frequencies and join the encoded token widths."""
    learn = _bpe_oracle(k_merges)
    # reuse everything up to the final merge-table SELECT block
    with_block = learn[: learn.rindex("SELECT 1 AS step")].rstrip()
    assert with_block.endswith(")"), with_block[-40:]
    return f"""{with_block},
    wl AS (SELECT lang, word, COUNT(*)::BIGINT AS freq
           FROM (SELECT lang, unnest(string_split(text, ' ')) AS word
                 FROM documents) t
           WHERE word <> '' GROUP BY 1, 2),
    enc AS (SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_tok
            FROM v{k_merges})
    SELECT lang,
           CAST(SUM(freq) AS BIGINT) AS total_words,
           CAST(SUM(freq * n_tok) AS BIGINT) AS total_subword_tokens,
           ROUND(SUM(freq * n_tok) * 1.0 / SUM(freq), 4) AS avg_tokens_per_word
    FROM wl JOIN enc USING (word)
    GROUP BY lang
    """


@register(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle(),
    tags=("text", "bpe", "iterative", "beyond-reference"),
)
def text_bpe_encode(spark: SparkSession, sf: str) -> DataFrame:
    """The trainer→encoder handoff: apply the learned BPE_MERGES merge
    rules to the corpus and account subword tokens per language
    EXACTLY — (lang, total_words, total_subword_tokens,
    avg_tokens_per_word). Where text_bpe_token_count approximates
    fertility with the GPT-2 pre-tokenizer regex, this measures it
    under the corpus' own learned merges; the DuckDB oracle replays
    the whole trainer chain and the encode join.

    Scale shape: encoding never touches documents row-by-row — token
    widths are computed once per VOCABULARY word (size of the merged
    symbol seq, a stacked built-in expression over the cached vocab)
    and broadcast-joined against the per-(lang, word) frequency table
    (one corpus scan, one shuffle). That is how production tokenizer
    accounting works at 100 TB: the corpus contributes only word
    counts; all merge logic runs at vocabulary cardinality — and the
    merge table itself is LEARNED ONCE per (session, fixture)
    (_bpe_learned_scoped): the encoder applies a trained tokenizer,
    it does not retrain it per invocation (r14 — the timed row
    previously re-ran the whole trainer loop, ~6 scheduling rounds of
    non-encode work per rep; the trainer remains fully timed in
    text_bpe_learn_merges)."""
    _, vocab, seq = _bpe_learned_scoped(spark, sf)
    encoded = vocab.select(
        "word", F.size(F.split(seq, " ")).cast("long").alias("n_tok")
    )
    docs = load_table(spark, sf, "documents")
    wl = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("lang", "word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return (
        wl.join(F.broadcast(encoded), "word")
        .groupBy("lang")
        .agg(
            F.sum("freq").cast("long").alias("total_words"),
            F.sum(F.col("freq") * F.col("n_tok"))
            .cast("long")
            .alias("total_subword_tokens"),
            F.round(
                F.sum(F.col("freq") * F.col("n_tok")) / F.sum("freq"), 4
            ).alias("avg_tokens_per_word"),
        )
    )
