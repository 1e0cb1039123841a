#!/usr/bin/env python3
"""Capture the POST-EXECUTION AQE final plan for queries.

Usage: python scripts/capture_aqe_final.py OUTDIR suffix q1 q2 ...

`explain("formatted")` before execution prints the static plan
(isFinalPlan=false) — exchange reuse that AQE performs at runtime
(ReusedExchange across same-canonical broadcast builds, AQEShuffleRead
coalescing) is invisible there. This runs the query's noop action first,
then dumps the same formatted explain, which now renders the final
adaptive plan (ADVICE r10 #1 asked for exactly this evidence for the
k-core survivor-broadcast sharing).
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from realtimedatawarehouse_self_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="rtdw-aqe-plans",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"{name}: NOT FOUND", flush=True)
            continue
        spark.catalog.clearCache()
        df = qs[name](spark, SF_DIR)
        df.write.mode("overwrite").format("noop").save()
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
            f.write(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        print(f"{name}: ok", flush=True)


if __name__ == "__main__":
    main()
