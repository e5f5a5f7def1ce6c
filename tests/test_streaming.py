"""Structured Streaming semantics tests (the registered stream_* queries
are oracle-checked by test_correctness; here we test streaming-only
behaviors: watermark+append, custom state, foreachBatch sinks)."""

from __future__ import annotations

import glob
import os
import tempfile
import uuid

import pyspark.sql.functions as F
import pytest

# every test here drives a real multi-micro-batch streaming query
# (~2-12 s each); excluded from quick loops via `-m "not slow"`, but
# ALWAYS part of the full pre-commit run
pytestmark = pytest.mark.slow

from ebike_spark.sources.registry import load_table
from ebike_spark.streaming.events import (
    read_event_stream,
    run_to_table,
    running_counts_stream,
    stage_stream_dir,
    tumbling_agg,
)
from tests.conftest import SF_DIR


def test_watermark_append_emits_closed_windows(spark):
    staged = stage_stream_dir(spark, SF_DIR, n_files=4)
    appended = run_to_table(tumbling_agg(read_event_stream(spark, staged)), "append")
    complete = run_to_table(
        tumbling_agg(read_event_stream(spark, staged), with_watermark=False), "complete"
    )
    app = {tuple(r) for r in appended.collect()}
    comp = {tuple(r) for r in complete.collect()}
    # append emits only watermark-closed windows → a subset of the full
    # answer, and every emitted row is final (exactly matches complete)
    assert app <= comp
    assert len(app) > 0


def test_stateful_running_counts(spark):
    staged = stage_stream_dir(spark, SF_DIR, n_files=3)
    sink = run_to_table(running_counts_stream(read_event_stream(spark, staged)), "update")
    # update mode appends one row per (user, batch); the max n per user
    # is the final state and must equal the batch per-user count + the
    # integer-cents sum
    final = sink.groupBy("user_id").agg(
        F.max("n").alias("n"), F.max("total_cents").alias("total_cents")
    )
    batch = (
        load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("total_cents"),
        )
    )
    got = {r["user_id"]: (r["n"], r["total_cents"]) for r in final.collect()}
    want = {r["user_id"]: (r["n"], r["total_cents"]) for r in batch.collect()}
    assert got == want


def test_stream_stream_interval_join_matches_batch(spark):
    from ebike_spark.streaming.events import stream_stream_interval_join

    staged = stage_stream_dir(spark, SF_DIR, n_files=3)
    streamed = run_to_table(
        stream_stream_interval_join(read_event_stream(spark, staged)), "append"
    )
    ev = load_table(spark, SF_DIR, "events")
    p = ev.where("event_type = 'purchase'").selectExpr(
        "event_id AS p_event", "user_id AS u", "ts AS p_ts"
    )
    v = ev.where("event_type = 'view'").selectExpr("user_id AS vu", "ts AS v_ts")
    batch = (
        p.join(
            v,
            (F.col("u") == F.col("vu"))
            & (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        )
        .selectExpr("p_event", "unix_micros(p_ts) AS p_ts_us", "unix_micros(v_ts) AS v_ts_us")
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in batch.collect()}
    # append-mode emits matches once their watermark window closes; with
    # finite input everything closes → exact equality with batch
    assert got == want and len(want) > 0


def test_streaming_dedup_with_watermark(spark):
    """dropDuplicatesWithinWatermark: replay the same files TWICE into
    one stream — every event arrives twice; the streaming dedup must
    emit each exactly once (state bounded by the watermark)."""
    import shutil

    staged = stage_stream_dir(spark, SF_DIR, n_files=2, shared=False)
    # duplicate every file (same rows, later mtimes → replayed again)
    for f in sorted(os.listdir(staged)):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(staged, f), os.path.join(staged, "dup_" + f))
    ev = read_event_stream(spark, staged)
    deduped = ev.withWatermark("ts", "30 days").dropDuplicatesWithinWatermark(["event_id"])
    out = run_to_table(deduped.select("event_id"), "append")
    n_in = load_table(spark, SF_DIR, "events").count()
    assert out.distinct().count() == out.count()  # no event emitted twice
    assert out.count() == n_in


def test_checkpoint_restart_exactly_once(spark):
    """Exactly-once via checkpointing: process part of the input, stop,
    add more files, restart from the SAME checkpoint — the sink must
    hold every input row exactly once (no loss, no replay)."""
    import shutil
    import tempfile
    import uuid as _uuid

    # shared=False: this test MUTATES the staged dir (moves files out and
    # back) — a mid-test failure must never half-empty the process-wide
    # cached copy every other streaming drive reads
    staged = stage_stream_dir(spark, SF_DIR, n_files=4, shared=False)
    parts = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
    held_back = os.path.join(tempfile.gettempdir(), f"held_{_uuid.uuid4().hex[:8]}")
    os.makedirs(held_back)
    for f in parts[2:]:  # hold back the last two files
        shutil.move(os.path.join(staged, f), os.path.join(held_back, f))

    sink = os.path.join(tempfile.gettempdir(), f"ckpt_sink_{_uuid.uuid4().hex[:8]}")
    ckpt = os.path.join(tempfile.gettempdir(), f"ckpt_{_uuid.uuid4().hex[:8]}")

    def start():
        return (
            read_event_stream(spark, staged)
            .select("event_id")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_first = spark.read.parquet(sink).count()
    assert n_first > 0

    for f in parts[2:]:  # deliver the held-back files, restart same ckpt
        shutil.move(os.path.join(held_back, f), os.path.join(staged, f))
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    out = spark.read.parquet(sink)
    n_in = load_table(spark, SF_DIR, "events").count()
    assert out.count() == n_in  # nothing lost
    assert out.distinct().count() == n_in  # nothing replayed


def test_foreach_batch_sink(spark):
    staged = stage_stream_dir(spark, SF_DIR, n_files=3)
    out_dir = os.path.join(tempfile.gettempdir(), f"ebike_fb_{uuid.uuid4().hex[:8]}")

    def write_batch(df, epoch_id):
        df.write.mode("append").parquet(out_dir)

    q = (
        read_event_stream(spark, staged)
        .writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_out = spark.read.parquet(out_dir).count()
    n_in = load_table(spark, SF_DIR, "events").count()
    assert n_out == n_in
    # and it really arrived over multiple micro-batches
    assert len(glob.glob(os.path.join(staged, "*.parquet"))) >= 3


def test_stream_funnel_matches_batch(spark):
    """The stateful streaming funnel's final stage counts must equal
    the batch ev_funnel exactly — per-user state resumed across
    micro-batches reproduces the one-pass sorted scan."""
    from ebike_spark.plans.registry import REGISTRY, _load_all

    _load_all()
    batch = {
        (r["stage_idx"], r["stage"]): r["n_users"]
        for r in REGISTRY["ev_funnel"].fn(spark, SF_DIR).collect()
    }
    streamed = {
        (r["stage_idx"], r["stage"]): r["n_users"]
        for r in REGISTRY["stream_funnel"].fn(spark, SF_DIR).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_rollup_merge_replay_is_idempotent(spark):
    """foreachBatch may replay the last in-flight batch after a crash;
    the merge sink must dedupe by batchId or it double-counts. Apply
    the same batch twice — the second application must be a no-op."""
    import tempfile
    import uuid as _uuid

    import pyspark.sql.functions as F

    from ebike_spark.sources.registry import load_table
    from ebike_spark.streaming.events import _merge_rollup_batch

    target = os.path.join(tempfile.gettempdir(), f"rollup_idem_{_uuid.uuid4().hex[:8]}")
    ev = load_table(spark, SF_DIR, "events")
    merge = _merge_rollup_batch(target)
    merge(ev, 0)
    once = {
        (r["b"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in spark.read.parquet(target).collect()
    }
    merge(ev, 0)  # crash-replay of the same batch
    twice = {
        (r["b"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in spark.read.parquet(target).collect()
    }
    assert twice == once and len(once) > 0
    merge(ev, 1)  # a genuinely new batch still merges
    n_after = spark.read.parquet(target).agg(F.sum("n")).collect()[0][0]
    assert n_after == 2 * sum(v[0] for v in once.values())


def test_rollup_maintain_resumes_from_checkpoint(spark):
    """Stop-and-resume: drain half the topic, stop, add the rest,
    restart with the SAME checkpoint — the maintained rollup must equal
    the from-scratch batch rollup (no gaps, no double-merges)."""
    import shutil
    import tempfile
    import uuid as _uuid

    import pyspark.sql.functions as F

    from ebike_spark.streaming.events import (
        _merge_rollup_batch,
        read_event_stream,
        stage_stream_dir,
    )

    staged_full = stage_stream_dir(spark, SF_DIR)
    files = sorted(f for f in os.listdir(staged_full) if f.endswith(".parquet"))
    half_dir = os.path.join(tempfile.gettempdir(), f"rollup_half_{_uuid.uuid4().hex[:8]}")
    os.makedirs(half_dir)
    for f in files[:2]:
        shutil.copy2(os.path.join(staged_full, f), os.path.join(half_dir, f))
    target = os.path.join(tempfile.gettempdir(), f"rollup_ckpt_{_uuid.uuid4().hex[:8]}")
    ckpt = target + ".ckpt"

    def drain():
        q = (
            read_event_stream(spark, half_dir)
            .writeStream.outputMode("append")
            .foreachBatch(_merge_rollup_batch(target))
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    drain()  # first half
    for f in files[2:]:
        shutil.copy2(os.path.join(staged_full, f), os.path.join(half_dir, f))
    drain()  # restart, same checkpoint: only the new files replay
    got = {
        (r["b"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in spark.read.parquet(target).collect()
    }
    from ebike_spark.sources.registry import load_table

    want = {
        (r["b"], r["event_type"]): (r["n"], round(r["total"], 6))
        for r in load_table(spark, SF_DIR, "events")
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("b"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert got == want and len(want) > 0


def test_last_touch_attributor_handles_null_cents():
    """A purchase with NULL value must count toward n but contribute no
    cents (Arrow hands NULL as NaN — int(NaN) would kill the stream);
    an all-NULL group emits NULL cents so the sink SUM matches the
    batch oracle's NULL-skipping SUM."""
    import pandas as pd

    from ebike_spark.streaming.events import make_last_touch_attributor

    class _State:
        exists = False

        def update(self, v):
            self.exists, self.get = True, v

    fn = make_last_touch_attributor(7 * 24 * 3600 * 1_000_000)
    batch = pd.DataFrame(
        {
            "t": [1_000, 2_000, 3_000, 4_000],
            "event_id": [1, 2, 3, 4],
            "event_type": ["click", "purchase", "purchase", "purchase"],
            "cents": [None, float("nan"), 500.0, None],
        }
    )
    out = pd.concat(list(fn((7,), iter([batch]), _State())))
    row = out.set_index("touch_type").loc["click"]
    assert int(row["n"]) == 3 and int(row["cents"]) == 500
    # all-NULL group -> NULL cents, not 0
    batch2 = batch.assign(cents=[None, None, None, None])
    out2 = pd.concat(list(fn((8,), iter([batch2]), _State())))
    row2 = out2.set_index("touch_type").loc["click"]
    assert int(row2["n"]) == 3 and pd.isna(row2["cents"])
