"""Fixture-schema contract tests: the loader must fail with ONE clear
message naming the drifted table/column when the driver's parquet
fixtures change shape (they did once — events.ts int64-nanos →
timestamp[us] — costing 14 red driver rows to a cryptic plan error),
and must normalize events.ts to TimestampType in both known shapes."""

from __future__ import annotations

import os

import pytest

from ebike_spark.sources.registry import TABLES, load_table
from tests.conftest import SF_DIR


def test_all_fixture_tables_pass_contract(spark):
    for t in TABLES:
        load_table(spark, SF_DIR, t)  # raises TypeError on drift


def test_events_ts_normalized_to_timestamp(spark):
    ev = load_table(spark, SF_DIR, "events")
    assert ev.schema["ts"].dataType.simpleString() == "timestamp"
    # epoch arithmetic downstream requires the BIGINT cast to be legal
    # (TimestampType allows it; TIMESTAMP_NTZ does not)
    ev.selectExpr("cast(ts as bigint) as e").limit(1).collect()


def _write_parquet(spark, rows, schema, path):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(path)


def test_contract_rejects_type_drift(spark, tmp_path):
    d = str(tmp_path / "sfdrift")
    os.makedirs(d, exist_ok=True)
    # documents with n_chars as string — a type drift
    _write_parquet(
        spark,
        [(1, "hello", "en", "web", "5")],
        "doc_id long, text string, lang string, source string, n_chars string",
        os.path.join(d, "documents.parquet"),
    )
    with pytest.raises(TypeError, match=r"documents.*n_chars.*got string"):
        load_table(spark, d, "documents")


def test_contract_rejects_missing_and_extra_columns(spark, tmp_path):
    d = str(tmp_path / "sfcols")
    os.makedirs(d, exist_ok=True)
    # region missing r_name, carrying a surprise column
    _write_parquet(
        spark,
        [(1, 9.0)],
        "r_regionkey int, r_surprise double",
        os.path.join(d, "region.parquet"),
    )
    with pytest.raises(TypeError) as ei:
        load_table(spark, d, "region")
    msg = str(ei.value)
    assert "r_name" in msg and "r_surprise" in msg and "region" in msg


def test_events_legacy_int64_nanos_still_loads(spark, tmp_path):
    """The pre-drift fixture shape (ts as int64 nanoseconds) must keep
    working through the legacy branch."""
    d = str(tmp_path / "sfnanos")
    os.makedirs(d, exist_ok=True)
    _write_parquet(
        spark,
        [(1, 1_700_000_000_123_456_789, 7, "click", 1.5, "{}")],
        "event_id long, ts long, user_id long, event_type string, value double, props string",
        os.path.join(d, "events.parquet"),
    )
    ev = load_table(spark, d, "events")
    assert ev.schema["ts"].dataType.simpleString() == "timestamp"
    micros = ev.selectExpr("unix_micros(ts) as m").first()["m"]
    assert micros == 1_700_000_000_123_456  # nanos truncated, not rounded


def test_hostile_session_is_normalized(spark, oracle):
    """A driver-provided session may arrive with ANSI on and a non-UTC
    timezone (Spark 4 defaults + host locale). Every query path goes
    through load_table, which must normalize both — otherwise date
    bucketing drifts an hour and permissive casts become errors. Run a
    timestamp-sensitive query under a hostile session and hash-compare
    it against the oracle."""
    import math

    from ebike_spark.plans.registry import REGISTRY, _load_all
    from tests.conftest import SF_DIR

    _load_all()
    saved = {
        "spark.sql.ansi.enabled": spark.conf.get("spark.sql.ansi.enabled"),
        "spark.sql.session.timeZone": spark.conf.get("spark.sql.session.timeZone"),
    }
    spark.conf.set("spark.sql.ansi.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
    def _norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return ("null",)
        if isinstance(v, float):
            return ("f", round(v, 9))
        if isinstance(v, int):
            return ("i", v)
        return ("s", str(v))

    try:
        for name in (
            "ev_tumbling_window",
            "ev_scd2_intervals",
            "fn_conditional",
            # hour() + weekday() — the most tz-sensitive surface
            "ev_seasonality_profile",
            # r10 additions with novel expression shapes: nested-HOF
            # deletion neighborhoods + over-length substring (ANSI
            # substring semantics), and integer DIV arithmetic (ANSI
            # overflow-checked operators)
            "text_fuzzy_variants",
            "ev_pagerank_states",
            # r11 additions: literal-map lookup + GREATEST/DIV under
            # ANSI (sssp), stacked replace expressions + HOF pair
            # explode (bpe trainer), long-multiply sums + division +
            # broadcast join (bpe encoder) — driver-eager iterative
            # shapes under ANSI/timezone flips
            "ev_sssp_bellman_ford",
            "text_bpe_learn_merges",
            "text_bpe_encode",
            # r12 additions: iterative star rounds over a
            # lineage-truncated frame (greatest/least + xxhash64
            # signature under ANSI), and the production-regime LSH
            # audit (counts + float threshold division) — both eager
            # driver-coordinated shapes under ANSI/timezone flips
            "dedup_cluster_distributed",
            "dedup_embedding_cosine_prod",
        ):
            spec = REGISTRY[name]
            sdf = spec.fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = sorted(
                tuple(_norm(row[c]) for c in scols) for row in sdf.collect()
            )
            res = oracle.execute(spec.oracle)
            ocols_all = [d[0] for d in res.description]
            idx = [ocols_all.index(c) for c in sorted(ocols_all)]
            orows = sorted(
                tuple(_norm(r[i]) for i in idx) for r in res.fetchall()
            )
            assert srows == orows, name
        # load_table really did reset the session (not just survive it)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert spark.conf.get("spark.sql.ansi.enabled") == "false"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_io_zstd_codec_lands_in_footers(spark):
    """io_zstd_roundtrip's content check can't see the codec — assert
    via the parquet footers that zstd actually landed (a silent
    fallback to snappy would still round-trip)."""
    import glob
    import os
    import tempfile
    import uuid

    import pyarrow.parquet as pq

    from ebike_spark.sources.io import _events_flat
    from tests.conftest import SF_DIR

    path = os.path.join(tempfile.gettempdir(), f"zstdchk_{uuid.uuid4().hex[:8]}")
    _events_flat(spark, SF_DIR).write.option("compression", "zstd").parquet(path)
    files = glob.glob(os.path.join(path, "*.parquet"))
    assert files
    md = pq.ParquetFile(files[0]).metadata
    codecs = {
        md.row_group(g).column(c).compression
        for g in range(md.num_row_groups)
        for c in range(md.row_group(g).num_columns)
    }
    assert codecs == {"ZSTD"}, codecs
