"""Guard for the untimed-construction hole (VERDICT r10 "What's wrong" #2).

bench.py times the noop action on a freshly rebuilt frame; query
CONSTRUCTION runs outside the stopwatch. Any Spark job launched during
construction is therefore real work the bench never sees — the r10 round
found kmeans_ivf_train running its whole training that way (fixed in r11:
lazy persist, training now runs inside the timed action).

This test builds EVERY declared query once and asserts no Spark job ran,
except for a small documented allowlist. The allowlist is checked exactly
(no new offender can slip in, and an entry that stops running jobs must be
removed):

- convergence loops: their loop control (`isEmpty` per round) IS a driver
  action by nature — the iteration count is data-dependent and cannot be
  deferred into the action without changing the declared algorithm. Their
  bench rows time only the final pass; documented in OPTIMIZATION_r11.md.
- plan_range_partitions: range boundaries are a two-pass algorithm by
  declaration (sample quantiles, then assign); the ≤15-row boundary fetch
  is the first pass. It runs pre-persist (r10 audit), so it cannot
  pre-fill anything the timed run would reuse.
- similarity_topk_ivf* / kmeans_ivf_train share `_ivf_k`, whose count on
  an unpersisted scan sizes the codebook. Same class: a tiny sizing probe
  that fills no cache.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

# Queries whose CONSTRUCTION may run Spark jobs, with the reason class.
BUILD_JOB_ALLOWLIST = {
    # min-label propagation until no label improves (isEmpty per round);
    # dedup_survivorship / dedup_token_yield consume the same loop
    "dedup_clusters",
    "dedup_cluster_quality",
    "dedup_survivorship",
    "dedup_token_yield",
    # alternating large/small-star contraction until the edge fixpoint
    "dedup_clusters_star",
    # two-pass range partitioning: quantile boundary fetch is pass one
    "plan_range_partitions",
    # `_ivf_k` sizing count on an unpersisted scan (kmeans_ivf_train and
    # similarity_topk_pq_adc are NOT listed: r11 moved their training
    # inside the timed action and the guard verified zero build jobs)
    "similarity_topk_ivf",
    "similarity_topk_ivf_adc_rerank",
    "similarity_topk_ivf_multiprobe",
    "ivf_recall_audit",
    "semdedup_eps_sweep",
    "dedup_embedding_cosine",
    "bitext_margin_mining",
    # writes its bucketed layout at build — the one-time ETL step that IS
    # the operator's declared subject (the read-side join is what is timed)
    "bucketed_join_colocation",
}

# Structured-streaming twins execute their micro-batches at construction
# by DECLARED design (memory-sink twin of a benched batch query); their
# batch counterparts carry the timed measurement. Class exemption, not
# per-name, so a new twin follows the same contract automatically.
STREAMING_PREFIX = "streaming_"


def _jobs_total(spark) -> int:
    return spark._jsparkSession.sparkContext().statusStore().jobsList(None).size()


def test_no_jobs_at_query_construction(spark):
    import __spark_entry__ as e
    from realtimedatawarehouse_self_spark.sources.tables import (
        TABLES,
        load_table,
    )

    # Warm the per-path schema cache: the FIRST read of a table in a
    # process legitimately pays one footer-inference job (tables.py).
    for t in TABLES:
        load_table(spark, SF_SMOKE, t)

    qs = e.queries()
    offenders: dict[str, int] = {}
    clean_allowlisted: list[str] = []
    for name in sorted(qs):
        if name.startswith(STREAMING_PREFIX):
            continue
        before = _jobs_total(spark)
        qs[name](spark, SF_SMOKE)
        ran = _jobs_total(spark) - before
        if ran > 0 and name not in BUILD_JOB_ALLOWLIST:
            offenders[name] = ran
        if ran == 0 and name in BUILD_JOB_ALLOWLIST:
            clean_allowlisted.append(name)
    assert not offenders, (
        f"queries ran Spark jobs during CONSTRUCTION (untimed work — move "
        f"it inside the action or allowlist with justification): {offenders}"
    )
    assert not clean_allowlisted, (
        f"allowlisted queries no longer run build-time jobs — remove them "
        f"from BUILD_JOB_ALLOWLIST: {clean_allowlisted}"
    )
