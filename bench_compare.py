"""Comparative context bench: run every oracled query's DuckDB SQL twin
single-node and the Spark plan side by side at the same scale factor.

Not part of the driver protocol (bench.py is); this exists because the
reference publishes no numbers (BASELINE.md) — DuckDB on the same
queries/data is the strongest available single-node anchor. Output:
markdown table to stdout; redirect into BENCH_NOTES.md.

Usage: python bench_compare.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import duckdb  # noqa: E402

from ebike_spark.plans.registry import REGISTRY, _load_all  # noqa: E402
from ebike_spark.session import get_spark  # noqa: E402
from ebike_spark.sources.registry import TABLES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    _load_all()
    spark = get_spark("bench_compare")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # host-speed canary (same job as bench.py's): totals from different
    # runs/rounds are only comparable after dividing by the canary ratio
    canary = None
    for _ in range(2):
        t0 = time.perf_counter()
        spark.range(200_000_000).selectExpr("sum(id % 97)").collect()
        dt = time.perf_counter() - t0
        canary = dt if canary is None else min(canary, dt)
    print(f"canary_seconds: {canary:.3f}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # streaming/io queries time their harness, not the plan — exclude.
    # VERDICT-shaped queries (tag "verdict") are excluded from the
    # RATIO and listed separately: their Spark side runs the full
    # pipeline PLUS an exact audit twin while their oracle is only the
    # audit (sometimes a constant row), so a Spark/DuckDB ratio there
    # compares different computations and would silently inflate the
    # headline the moment a sketch gains a verdict shape.
    # ORACLE-REGIME queries are also listed outside the ratio
    # (VERDICT-r11 task 4): their fixture parameters deliberately sit
    # in an adversarial regime to PROVE recall (dedup_embedding_cosine
    # at threshold 0.5 drives LSH candidates to ~46% of all-pairs, so
    # its timed cost is near-quadratic BY DESIGN); the production
    # twin (dedup_embedding_cosine_prod) carries the benched claim.
    oracle_regime = {"dedup_embedding_cosine"}
    skip = {n for n in REGISTRY if n.startswith(("stream_", "io_"))}
    rows = []
    verdict_rows = []
    oracle_regime_rows = []
    for name, spec in sorted(REGISTRY.items()):
        if spec.oracle is None or name in skip:
            continue
        t0 = time.perf_counter()
        con.execute(spec.oracle).fetchall()
        t_duck_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        con.execute(spec.oracle).fetchall()
        t_duck = min(t_duck_cold, time.perf_counter() - t0)

        # same plan-cached surface the driver/bench run (registry
        # _plan_cached): the warm pass builds + caches the plan, the
        # timed pass measures resident-engine execution — mirroring
        # DuckDB's warm second run above
        from ebike_spark.plans.registry import _plan_cached

        fn = _plan_cached(name, spec.fn)
        fn(spark, sf_dir).count()  # warm
        # Count Spark JOBS submitted by the timed pass (VERDICT-r12
        # task 3): under AQE every materialized query stage (shuffle or
        # broadcast exchange) plus the final collect is its own job,
        # so this column decomposes each row's fixed floor into
        # scheduling rounds. >1 job for one logical result = either an
        # exchange AQE had to stage or an unfused driver-side action.
        group = f"bc_{name}"
        spark.sparkContext.setJobGroup(group, name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        t_spark = time.perf_counter() - t0
        spark.sparkContext._jsc.clearJobGroup()
        n_jobs = len(
            spark.sparkContext.statusTracker().getJobIdsForGroup(group)
        )
        if "verdict" in spec.tags:
            bucket, tag = verdict_rows, " (verdict — not in ratio)"
        elif name in oracle_regime:
            bucket, tag = oracle_regime_rows, " (oracle-regime — not in ratio)"
        else:
            bucket, tag = rows, ""
        bucket.append((name, t_spark, t_duck))
        print(
            f"| {name} | {t_spark:.3f} | {t_duck:.3f} |"
            f" {t_spark / max(t_duck, 1e-9):.1f}×{tag} | {n_jobs} |",
            flush=True,
        )

    ts = sum(r[1] for r in rows)
    td = sum(r[2] for r in rows)
    print(
        f"| **total ({len(rows)} equivalent-computation queries)** |"
        f" **{ts:.2f}** | **{td:.2f}** | **{ts / td:.1f}×** | — |"
    )
    if verdict_rows:
        vs = sum(r[1] for r in verdict_rows)
        print(
            f"| verdict-shaped ({len(verdict_rows)} queries, Spark pipeline+audit vs audit-only oracle) "
            f"| {vs:.2f} | — | — | — |"
        )
    if oracle_regime_rows:
        os_ = sum(r[1] for r in oracle_regime_rows)
        print(
            f"| oracle-regime ({len(oracle_regime_rows)} queries, adversarial recall-proof fixtures; production twins benched as verdict rows) "
            f"| {os_:.2f} | — | — | — |"
        )
    # repeat the canary LAST: a ratio is meaningless without it, and
    # tail-captured output (the r9 run lost the header line to a
    # `| tail -15`) must still carry it
    print(f"canary_seconds: {canary:.3f} (ratio {ts / td:.1f}x over {len(rows)} queries)")


if __name__ == "__main__":
    main()
