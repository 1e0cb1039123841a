"""Mechanism tests for plans/mining.py beyond engine-vs-oracle agreement:
the Misra-Gries stage must genuinely BOUND the candidate set under skew
(the whole point of the sketch — the testdata's uniform user distribution
exercises the exact path but not the pruning), and the batched decrement
must never evict a true heavy hitter regardless of row order.
"""

from __future__ import annotations

import pandas as pd

from realtimedatawarehouse_self_spark.plans.mining import (
    HH_DEN,
    _mg_candidates,
)


def _run_mg(user_ids, batch_size=1000):
    batches = (
        pd.DataFrame({"user_id": pd.Series(user_ids[i : i + batch_size], dtype="int64")})
        for i in range(0, len(user_ids), batch_size)
    )
    out = list(_mg_candidates(batches))
    assert len(out) == 1
    return set(out[0]["user_id"].tolist())


def test_mg_bounds_candidates_and_keeps_heavy_under_skew():
    # 100k rows: user 1 owns 10% (heavy), the rest spread over 50k
    # distinct one-shot users (a cardinality MG must NOT retain).
    rows = [1] * 10_000 + list(range(100, 50_100)) + [1] * 0
    # interleave worst-case: heavy hits first, singletons after (the order
    # that maximally decays the heavy counter via decrements).
    cands = _run_mg(rows)
    assert 1 in cands, "true heavy hitter evicted"
    assert len(cands) <= HH_DEN, f"candidate set unbounded: {len(cands)}"


def test_mg_heavy_survives_any_order():
    # Heavy user's rows scattered between flushes of distinct junk:
    # 60 batches, each 50 junk singletons + 2 heavy rows -> heavy has
    # 120/3120 ~ 3.8% > 1/HH_DEN; junk cardinality 3000 > HH_DEN.
    rows = []
    uid = 1000
    for _ in range(60):
        rows.extend(range(uid, uid + 50))
        uid += 50
        rows.extend([7, 7])
    cands = _run_mg(rows, batch_size=52)
    assert 7 in cands
    assert len(cands) <= HH_DEN


def test_pagerank_invariants(spark):
    """Exact-integer PageRank: every co-engaged user gets a rank, ranks are
    differentiated (not a fixed point of the uniform vector), and total
    mass is bounded by n * (damping-sum upper bound)."""
    import os

    from tests.conftest import TESTDATA

    from realtimedatawarehouse_self_spark.plans.mining import (
        PR_SCALE,
        pagerank_co_engagement,
    )

    rows = pagerank_co_engagement(
        spark, os.path.join(TESTDATA, "sf0.001")
    ).collect()
    assert len(rows) > 0
    ranks = [r.rank_micro for r in rows]
    assert all(r > 0 for r in ranks)
    assert len(set(ranks)) > 1, "ranks degenerate to uniform"
    # mass can only shrink from the initial n * PR_SCALE (floor divisions),
    # modulo the teleport term's +15% headroom on the first iteration
    assert sum(ranks) <= len(ranks) * PR_SCALE * 1.15


def test_mg_exact_when_under_capacity():
    # Fewer distinct users than capacity: no decrement ever fires, the
    # candidate set is exactly the observed users.
    rows = [5] * 3 + [6] * 2 + [9]
    assert _run_mg(rows) == {5, 6, 9}


def test_star_components_chain_and_forest(spark):
    """Star contraction must label a 60-node CHAIN (the worst diameter
    case min-label propagation pays O(diameter) rounds for) and a forest
    of separate components with each node's component minimum."""
    from realtimedatawarehouse_self_spark.plans.llm_ops import star_components

    chain = [(i, i + 1) for i in range(60)]          # component min = 0
    tri = [(100, 101), (101, 102), (100, 102)]        # min = 100
    pair = [(200, 201)]                               # min = 200
    df = spark.createDataFrame(chain + tri + pair, "u long, v long")
    got = {r.node: r.label for r in star_components(df).collect()}
    assert got == (
        {i: 0 for i in range(61)}
        | {100: 100, 101: 100, 102: 100}
        | {200: 200, 201: 200}
    )
