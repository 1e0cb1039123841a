#!/usr/bin/env python3
"""Per-site persist() A/B harness (r10 optimization round).

Spark's exchange reuse (spark.sql.exchangeReuseEnabled, default on)
already shares identical shuffle/broadcast subtrees WITHIN one plan, so
an interior persist() only pays when the reuse point is not an exchange
boundary (or fan-out is extreme); otherwise the cache materialization is
pure added cost. This harness measures, per query, every subset of its
persist sites of the form {all, none, keep-one-i}: it monkeypatches
DataFrame.persist with a call-order counter, rebuilds the query per
variant, and times the bench-protocol action (min of 2, clearCache +
rebuild per run, build untimed).

Usage: python scripts/persist_ab.py q1 q2 ... > out.jsonl
Each line: {"query": ..., "n_sites": N, "timings": {"all": s, "none": s,
"keep0": s, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    # Spark 4: the CLASSIC DataFrame subclass overrides persist(), so the
    # patch must target it (patching only the pyspark.sql.dataframe base
    # class is a silent no-op — found the hard way).
    import pyspark.sql.classic.dataframe as D

    from realtimedatawarehouse_self_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="rtdw-persist-ab",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    orig_persist = D.DataFrame.persist
    counter = {"n": 0}

    def patched(keep):
        def p(self, *a, **k):
            i = counter["n"]
            counter["n"] += 1
            return orig_persist(self) if (keep is None or i in keep) else self

        return p

    def one_run(name, keep):
        spark.catalog.clearCache()
        counter["n"] = 0
        D.DataFrame.persist = patched(keep)
        try:
            df = qs[name](spark, SF_DIR)
        finally:
            D.DataFrame.persist = orig_persist
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt, counter["n"]

    for name in sys.argv[1:]:
        if name not in qs:
            print(json.dumps({"query": name, "error": "not found"}), flush=True)
            continue
        qs[name](spark, SF_DIR).write.mode("overwrite").format(
            "noop"
        ).save()  # warmup
        _, n_sites = one_run(name, None)
        variants = [("all", None)]
        if n_sites:
            variants.append(("none", set()))
            if n_sites > 1:
                variants += [(f"keep{i}", {i}) for i in range(n_sites)]
        # two full INTERLEAVED cycles over the variants (min per variant):
        # warm-up drift within the process would otherwise masquerade as a
        # difference between variants run early vs late.
        out = {}
        for _cycle in range(2):
            for label, keep in variants:
                dt, _ = one_run(name, keep)
                out[label] = min(out.get(label, float("inf")), dt)
        out = {k: round(v, 3) for k, v in out.items()}
        print(
            json.dumps(
                {"query": name, "n_sites": n_sites, "timings": out}
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
