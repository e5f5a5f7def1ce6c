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
# none. Round 8 spends the budget exactly as VERDICT-r7 task 1
# mandates: the 4 late-r7 queries that have NEVER had a driver
# correctness row, then the 3 queries whose verdict shapes were
# re-built in r7 (their only historical rows predate their oracles),
# then ALL 25 remaining r3-stale rows, then 18 r4-stale fills (the
# non-event r4 block first, then the oldest ev_* rows). The cut falls
# exactly at position 50 (ev_path_transitions); the 11 remaining
# r4-stale rows (the ev_funnel / ev_retention / windowing family) are
# listed immediately after and lead the round-9 rotation (TODO_r9.md).
WINDOW_PREFIX: tuple[str, ...] = (
    # --- never externally checked (late-r7 additions, positions 1-4) ---
    "stream_lifecycle_stages",
    "text_zipf_fit",
    "io_zstd_roundtrip",
    "fn_string_mysql",
    # --- verdict shapes rebuilt in r7; only historical rows predate
    # the new oracles (positions 5-7) ---
    "q13_approx_distinct",
    "q13b_approx_percentile",
    "embed_kmeans_converged",
    # --- the 25 remaining r3-stale rows (positions 8-32) ---
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
    # --- r4-stale fills (positions 33-50): non-event r4 block first,
    # then the oldest ev_* rows ---
    "ann_knn_join",
    "ann_pq_adc_topk",
    "asof_generic_events_orders",
    "corpus_temperature_mix",
    "dedup_containment",
    "dedup_incremental",
    "embed_pq_encode",
    "json_extract_props",
    "json_map_explode",
    "profile_columns",
    "text_quality_percentile",
    "ev_active_users",
    "ev_anomaly_zscore",
    "ev_asof_join",
    "ev_gapfill_interp",
    "ev_gapfill_locf",
    "ev_hierarchical_rollup",
    "ev_path_transitions",
    # --- external budget exhausted: the 11 remaining r4-stale rows
    # (the ev_funnel / ev_retention / windowing family) lead the
    # round-9 rotation, then the r5-stale block ---
    "ev_funnel",
    "ev_funnel_windowed",
    "ev_pivot",
    "ev_retention",
    "ev_rollup",
    "ev_scd2_intervals",
    "ev_sessionize",
    "ev_sliding_window",
    "ev_topk_per_group",
    "ev_tumbling_window",
    "ev_value_histogram",
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
