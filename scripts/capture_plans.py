#!/usr/bin/env python3
"""Capture .explain("formatted") for queries, no execution.

Usage: python scripts/capture_plans.py OUTDIR [suffix] q1 q2 ...
Writes OUTDIR/<query><suffix>.txt. Driver-only work (plan build +
optimization), so it is safe to run alongside other jobs.
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
        app_name="rtdw-plans",
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
        df = qs[name](spark, SF_DIR)
        with open(os.path.join(outdir, f"{name}{suffix}.txt"), "w") as f:
            f.write(
                df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        print(f"{name}: ok", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
