"""Parquet table registry for the driver's test tables.

The reference's leaf scan is a single-partition KV prefix scan
(/root/reference/src/datafusion_impl/physical_plan/sled.rs:39-146).
Here the leaf is Spark's vectorized parquet reader: splittable into
many partitions, with predicate pushdown, column pruning, and row-group
min/max skipping — the scale-path equivalent of the reference's
index-range seek (/root/reference/src/store/reader/reader_util.rs:102-415),
obtained declaratively instead of hand-built.
"""

from __future__ import annotations

import os
import tempfile
import uuid
import weakref

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (TPC-H region/nation are constant-size; supplier/part/customer
# grow but stay broadcastable in the driver's generator up to sf0.1).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

# Fixture-schema contract: column name → allowed Spark simpleStrings as
# seen AFTER load_table's normalization (so events.ts is always
# "timestamp"). The driver's fixtures drifted under the repo once
# (events.ts int64-nanos → timestamp[us], round 3: 14 red rows from one
# cryptic AnalysisException deep in a query plan); this check turns the
# next drift into one clear error naming the table and column. Allowed
# sets are singletons except where generator history/pyarrow defaults
# make a widening plausible (int keys, tz-naive vs tz'd timestamps).
EXPECTED_SCHEMAS: dict[str, dict[str, frozenset[str]]] = {
    "region": {"r_regionkey": frozenset({"int", "bigint"}), "r_name": frozenset({"string"})},
    "nation": {
        "n_nationkey": frozenset({"int", "bigint"}),
        "n_name": frozenset({"string"}),
        "n_regionkey": frozenset({"int", "bigint"}),
    },
    "customer": {
        "c_custkey": frozenset({"int", "bigint"}),
        "c_name": frozenset({"string"}),
        "c_nationkey": frozenset({"int", "bigint"}),
        "c_acctbal": frozenset({"double"}),
        "c_mktsegment": frozenset({"string"}),
    },
    "supplier": {
        "s_suppkey": frozenset({"int", "bigint"}),
        "s_name": frozenset({"string"}),
        "s_nationkey": frozenset({"int", "bigint"}),
        "s_acctbal": frozenset({"double"}),
    },
    "part": {
        "p_partkey": frozenset({"int", "bigint"}),
        "p_name": frozenset({"string"}),
        "p_brand": frozenset({"string"}),
        "p_type": frozenset({"string"}),
        "p_size": frozenset({"int", "bigint"}),
        "p_retailprice": frozenset({"double"}),
    },
    "orders": {
        "o_orderkey": frozenset({"int", "bigint"}),
        "o_custkey": frozenset({"int", "bigint"}),
        "o_orderstatus": frozenset({"string"}),
        "o_totalprice": frozenset({"double"}),
        "o_orderdate": frozenset({"timestamp_ntz", "timestamp", "date"}),
        "o_orderpriority": frozenset({"string"}),
    },
    "lineitem": {
        "l_orderkey": frozenset({"int", "bigint"}),
        "l_partkey": frozenset({"int", "bigint"}),
        "l_suppkey": frozenset({"int", "bigint"}),
        "l_linenumber": frozenset({"int", "bigint"}),
        "l_quantity": frozenset({"double"}),
        "l_extendedprice": frozenset({"double"}),
        "l_discount": frozenset({"double"}),
        "l_tax": frozenset({"double"}),
        "l_returnflag": frozenset({"string"}),
        "l_linestatus": frozenset({"string"}),
        "l_shipdate": frozenset({"timestamp_ntz", "timestamp", "date"}),
    },
    "events": {
        "event_id": frozenset({"int", "bigint"}),
        "ts": frozenset({"timestamp"}),  # post-normalization invariant
        "user_id": frozenset({"int", "bigint"}),
        "event_type": frozenset({"string"}),
        "value": frozenset({"double"}),
        "props": frozenset({"string"}),
    },
    "documents": {
        "doc_id": frozenset({"int", "bigint"}),
        "text": frozenset({"string"}),
        "lang": frozenset({"string"}),
        "source": frozenset({"string"}),
        "n_chars": frozenset({"int", "bigint"}),
    },
    "embeddings": {
        "vec_id": frozenset({"int", "bigint"}),
        "embedding": frozenset({"array<float>", "array<double>"}),
        "label": frozenset({"int", "bigint"}),
    },
}


def _check_contract(name: str, df: DataFrame) -> None:
    """One clear error on fixture drift, instead of N cryptic plan
    failures downstream. Plan-only (reads the parquet footer schema
    already loaded into df) — no Spark job."""
    expected = EXPECTED_SCHEMAS[name]
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = sorted(set(expected) - set(actual))
    extra = sorted(set(actual) - set(expected))
    drifted = sorted(
        f"{c}: got {actual[c]}, expected one of {sorted(expected[c])}"
        for c in set(expected) & set(actual)
        if actual[c] not in expected[c]
    )
    if missing or extra or drifted:
        parts = []
        if missing:
            parts.append(f"missing columns {missing}")
        if extra:
            parts.append(f"unexpected columns {extra}")
        if drifted:
            parts.append(f"type drift [{'; '.join(drifted)}]")
        raise TypeError(
            f"fixture schema drift in table {name!r}: " + "; ".join(parts) + ". "
            "The driver's parquet fixtures changed shape — update "
            "EXPECTED_SCHEMAS and any loader normalization in "
            "ebike_spark/sources/registry.py."
        )


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# session → {(sf_dir, table) → DataFrame}. A DataFrame is just a plan —
# caching it skips the per-call file listing + footer schema read
# (~50-100ms each) without pinning any data in memory. Keyed WEAKLY by
# the session object (not id(spark): a GC'd session's id can be reused
# by a new session, which would then be served a stale plan bound to
# the dead session).
_df_cache: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


# Fact tables worth storing bucketed, and the key that co-locates their
# heavyweight join/aggregation: orders⋈lineitem on the orderkey is the
# one fact-fact join in the workload, and lineitem's per-order rollups
# group by the same key. Bucket count is a layout constant — at 100 TB
# you size it so bucket × sf fits an executor (thousands); here 32
# matches the test parallelism.
BUCKET_SPECS = {
    "orders": ("o_orderkey", 32),
    "lineitem": ("l_orderkey", 32),
}

# session → {sf_dir → database name}. Bucketing metadata lives in the
# session catalog (in-memory catalog: per-session lifetime), so managed
# copies are materialized once per (session, sf_dir) on first bucketed
# load and reused by every later query in that session — modelling a
# warehouse whose fact tables are STORED bucketed. The database gets an
# explicit scratch LOCATION so no spark-warehouse dir appears in the
# caller's cwd.
_bucket_dbs: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    weakref.WeakKeyDictionary()
)


def _bucketed_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key, n_buckets = BUCKET_SPECS[name]
    try:
        dbs = _bucket_dbs.setdefault(spark, {})
    except TypeError:  # pragma: no cover - session not weakref-able
        dbs = {}
    db = dbs.get(sf_dir)
    if db is None:
        db = f"ebike_bkt_{uuid.uuid4().hex[:8]}"
        loc = tempfile.mkdtemp(prefix=db + "_")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
        dbs[sf_dir] = db
    tbl = f"{db}.{name}_b"
    if not spark.catalog.tableExists(tbl):
        (
            load_table(spark, sf_dir, name)
            .write.bucketBy(n_buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(tbl)
        )
    return spark.table(tbl)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, bucketed: bool = False
) -> DataFrame:
    """Read one test table. Plain columnar scan; Catalyst prunes/pushes.

    ``bucketed=True`` (supported for the tables in BUCKET_SPECS) reads a
    managed copy bucketed+sorted on its join key instead: joins and
    aggregations on that key then need no Exchange — the bucketed scan
    already satisfies the required hash distribution and sort order.
    Measured 3× faster than the AQE sort-merge plan on the 10×-scale
    join-chain probe (BENCH_NOTES "Join-strategy"); at toy SF the same
    layout still wins ~15% from the sorted, compacted files even while
    AQE chooses broadcast joins.

    ``events.ts`` has shipped in two physical shapes across driver
    fixture generations: TIMESTAMP(NANOS) (older) and TIMESTAMP(MICROS)
    (current). We branch on the *loaded* dtype instead of assuming:

    - already a timestamp (MICROS parquet; Spark may surface it as
      TIMESTAMP_NTZ when the field is not UTC-adjusted) → cast to
      TimestampType. Session tz is pinned UTC (session.py), so wall
      values are unchanged and downstream ``cast(ts AS BIGINT)``
      epoch arithmetic (e.g. plans/analytics.py) stays legal — NTZ
      forbids that cast, TimestampType allows it.
    - int64 (nanos read as long via the runtime legacy conf) →
      truncate to microseconds, the same truncation DuckDB applies to
      TIMESTAMP_NS, so both engines see identical values. ``ts div
      1000`` is integer division (no double round-trip: nanos exceed
      2^53).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    from ebike_spark.session import tune_runtime

    tune_runtime(spark)  # idempotent; the driver's session isn't ours
    if bucketed:
        if name not in BUCKET_SPECS:
            raise KeyError(f"no bucket layout for {name!r}; known: {sorted(BUCKET_SPECS)}")
        return _bucketed_table(spark, sf_dir, name)
    try:
        session_cache = _df_cache.setdefault(spark, {})
    except TypeError:  # session object not weakref-able (never in practice)
        session_cache = {}
    key = (sf_dir, name)
    cached = session_cache.get(key)
    if cached is not None:
        return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
            # Current fixtures: timestamp[us]. Normalize to TimestampType
            # (session tz is UTC, so values are unchanged; NTZ would
            # forbid the epoch BIGINT casts used downstream).
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        elif isinstance(ts_type, T.LongType):
            # Legacy fixtures: int64 nanos (read as long via the conf
            # above); truncate to micros, matching DuckDB's TIMESTAMP_NS
            # truncation.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            raise TypeError(
                f"events.ts has unsupported type {ts_type.simpleString()}; "
                "expected timestamp, timestamp_ntz, or int64 nanos"
            )
    else:
        df = spark.read.parquet(path)
    _check_contract(name, df)
    session_cache[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` sees the same
    names DuckDB's oracle uses."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
