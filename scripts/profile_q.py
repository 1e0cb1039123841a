#!/usr/bin/env python3
"""Per-query profiling harness for optimization rounds.

Usage: python scripts/profile_q.py [--explain DIR] [--runs N] q1 q2 ...

Mirrors bench.py's protocol (same session confs, noop sink, warmup pass,
min of N timed passes with clearCache between) so numbers are comparable
to full-map rows up to the documented fresh-process/in-map offset. Writes
.explain("formatted") to DIR/<query>.txt when --explain is given.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--explain", default=None)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from realtimedatawarehouse_self_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="rtdw-profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in args.queries:
        if name not in qs:
            print(f"{name}: NOT FOUND", flush=True)
            continue
        df = qs[name](spark, SF_DIR)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        spark.sparkContext.setJobDescription(f"profile:{name}:warmup")
        df.write.mode("overwrite").format("noop").save()
        # r10 protocol (mirrors bench.py): fresh build per timed run so
        # interior persists stay registered; cache empty at t0.
        best = float("inf")
        times = []
        for i in range(args.runs):
            spark.catalog.clearCache()
            run_df = qs[name](spark, SF_DIR)
            spark.sparkContext.setJobDescription(f"profile:{name}:timed{i}")
            t0 = time.perf_counter()
            run_df.write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            times.append(round(dt, 3))
            best = min(best, dt)
        spark.catalog.clearCache()
        print(f"{name}: best={best:.3f} runs={times}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
