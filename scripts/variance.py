#!/usr/bin/env python3
"""Fresh-process variance bracket for drift-watch queries.

Protocol (identical to the kcore/item_cf treatment recorded as
BENCH_VARIANCE["focused_r9"], VERDICT r8 #4 / r9 #2): N fresh processes,
each running bench.py's exact timing discipline on the given queries —
one untimed warmup execution to a noop sink, then min of two timed runs
with spark.catalog.clearCache() before each. sf0.1, local[32], no
concurrent workloads. One process per PASS (not per query) so each pass
pays JVM startup exactly once, matching the focused_r9 protocol.

Usage:
  python scripts/variance.py ENTRY_NAME "note text" q1 q2 ...
writes/updates BENCH_VARIANCE.json[ENTRY_NAME] with per-query pass lists
and min/median/max bands.

Internal single-pass mode (invoked via subprocess):
  python scripts/variance.py --one-pass q1 q2 ...   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
PASSES = int(os.environ.get("SPARK_GRAFT_VARIANCE_PASSES", "5"))


def one_pass(names: list[str]) -> None:
    sys.path.insert(0, REPO)
    from realtimedatawarehouse_self_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="rtdw-variance",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    timings: dict[str, float] = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        # r10 protocol (mirrors bench.py): fresh build per timed run so
        # interior persists stay registered; cache empty at t0.
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            run_df = qs[name](spark, SF_DIR)
            t0 = time.perf_counter()
            run_df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        timings[name] = round(best, 3)
    print(json.dumps(timings), flush=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) < 2:
        print(
            "usage: variance.py ENTRY_NAME NOTE q1 [q2 ...]\n"
            "       variance.py --one-pass q1 [q2 ...]",
            file=sys.stderr,
        )
        sys.exit(2)
    if sys.argv[1] == "--one-pass":
        one_pass(sys.argv[2:])
        return
    entry_name, note = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    per_query: dict[str, list[float]] = {n: [] for n in names}
    for i in range(PASSES):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one-pass", *names],
            capture_output=True,
            text=True,
            check=True,
            cwd=REPO,
        )
        line = out.stdout.strip().splitlines()[-1]
        timings = json.loads(line)
        for n in names:
            per_query[n].append(timings[n])
        print(f"pass {i + 1}/{PASSES}: {timings}", file=sys.stderr, flush=True)
    bands = {
        n: {
            "min": min(v),
            "median": round(statistics.median(v), 3),
            "max": max(v),
        }
        for n, v in per_query.items()
    }
    path = os.path.join(REPO, "BENCH_VARIANCE.json")
    # never lose a multi-minute measurement to a missing file
    data = json.load(open(path)) if os.path.exists(path) else {}
    data[entry_name] = {"note": note, "per_query": per_query, "bands": bands}
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps({entry_name: bands}))


if __name__ == "__main__":
    main()
