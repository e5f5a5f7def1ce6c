"""Per-row bench probe with interleaved host canary (r13 optimization
round instrument).

The host this repo benches on swings up to 6x WITHIN a run
(BENCH_NOTES "io_zorder_layout pinned"), so a single bench.py number
cannot distinguish a code regression from a hot host window. This
probe reproduces bench.py's exact methodology for a NAMED subset of
queries — plan-cached surface, one untimed warm invocation, then N
timed `.count()` reps — but interleaves the bench canary around every
query so each row's numbers carry their own host-speed evidence.

Usage:
    python tools/row_probe.py QUERY [QUERY...] [--reps N] [--plans DIR]

--plans DIR additionally writes DIR/<query>.txt with the
`.explain("formatted")` output of the query's DataFrame (the artifact
committed under plans/r13/ as <query>_before.txt / _after.txt).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# The canary is IMPORTED from bench.py (not copied) so this probe's
# host-speed qualification can never drift from the bench's.
from bench import host_canary as canary  # noqa: E402
from ebike_spark.plans.registry import all_queries  # noqa: E402
from ebike_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None)
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1")

    registry = all_queries()
    unknown = [n for n in args.queries if n not in registry]
    if unknown:
        ap.error(f"unknown queries {unknown}; valid names are the keys of "
                 "ebike_spark.plans.registry.all_queries()")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ebike_row_probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in args.queries:
        fn = registry[name]
        c0 = canary(spark)
        spark.sparkContext.setJobDescription(f"warm:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.count()  # untimed warm pass (bench.py contract)
        warm = time.perf_counter() - t0
        reps, jobs = [], []
        tracker = spark.sparkContext.statusTracker()
        for i in range(args.reps):
            group = f"probe_{name}_{i}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            reps.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext._jsc.clearJobGroup()
            jobs.append(len(tracker.getJobIdsForGroup(group)))
        c1 = canary(spark)
        print(
            f"{name}: warm={warm:.3f} reps={reps} min={min(reps):.3f} "
            f"jobs={jobs} canary=[{c0:.3f},{c1:.3f}]",
            flush=True,
        )
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                fh.write(buf.getvalue())


if __name__ == "__main__":
    main()
