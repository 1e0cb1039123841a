"""Property-based equivalence for the reusable relational operators.

Each Spark operator is compared against a few-line pure-Python reference
on hypothesis-generated inputs — the randomized companion to the
fixed-case tests in test_operators.py. Examples are kept small and few
(each example runs real Spark jobs); hypothesis still explores the edge
geometry fixed cases miss: empty groups, all-ties, single-row frames,
duplicate timestamps, keys present on only one join side.
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.operators.relational import (
    asof_join,
    salted_join,
    sessionize,
    topk_per_group,
    two_phase_sum,
)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_keys = st.sampled_from(["a", "b", "c"])


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(_keys, st.integers(-50, 50)), min_size=1, max_size=30
    ),
    k=st.integers(1, 4),
)
def test_topk_per_group_matches_python(spark, rows, k):
    # unique row id makes the requested total order unambiguous
    data = [(g, v, i) for i, (g, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, v int, rid int")
    got = sorted(
        map(tuple, topk_per_group(df, ["g"], [F.col("v").desc(), F.col("rid")], k).collect())
    )
    by_g = defaultdict(list)
    for g, v, rid in data:
        by_g[g].append((v, rid))
    want = sorted(
        (g, v, rid)
        for g, items in by_g.items()
        for v, rid in sorted(items, key=lambda t: (-t[0], t[1]))[:k]
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    left=st.lists(
        st.tuples(_keys, st.integers(0, 100)), min_size=1, max_size=20
    ),
    right=st.lists(
        st.tuples(_keys, st.integers(0, 100)), min_size=0, max_size=20
    ),
)
def test_asof_join_matches_python(spark, left, right):
    t0 = dt.datetime(2024, 1, 1)

    def t(s):
        return t0 + dt.timedelta(seconds=s)

    ldata = [(i, g, t(s)) for i, (g, s) in enumerate(left)]
    rdata = [(g, t(s)) for g, s in right]
    ldf = spark.createDataFrame(ldata, "row_id int, uid string, ts timestamp")
    rdf = spark.createDataFrame(rdata, "uid string, r_ts timestamp")
    got = {
        r.row_id: r.r_ts
        for r in asof_join(
            ldf, rdf, on="uid", left_ts="ts", right_ts="r_ts", row_key="row_id"
        ).collect()
    }
    for i, g, ts in ldata:
        cands = [rt for rg, rt in rdata if rg == g and rt <= ts]
        assert got[i] == (max(cands) if cands else None), (i, g, ts)


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(_keys, st.integers(0, 200)), min_size=1, max_size=25
    ),
    gap_s=st.integers(1, 60),
)
def test_sessionize_matches_python(spark, rows, gap_s):
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (g, t0 + dt.timedelta(seconds=s), i) for i, (g, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "uid string, ts timestamp, eid int")
    got = {
        r.eid: r.session_idx
        for r in sessionize(
            df, key="uid", ts="ts", gap_ms=gap_s * 1000, tiebreak="eid"
        ).collect()
    }
    by_g = defaultdict(list)
    for g, ts, eid in data:
        by_g[g].append((ts, eid))
    for g, items in by_g.items():
        items.sort()
        idx = 0
        prev = None
        for ts, eid in items:
            if prev is None or (ts - prev).total_seconds() * 1000 > gap_s * 1000:
                idx += 1
            assert got[eid] == idx, (g, eid)
            prev = ts


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(_keys, st.integers(-(10**6), 10**6)),
        min_size=1,
        max_size=40,
    ),
    n_salts=st.integers(2, 8),
)
def test_two_phase_sum_matches_plain(spark, rows, n_salts):
    df = spark.createDataFrame(rows, "k string, v long")
    salted = sorted(
        map(tuple, two_phase_sum(df, ["k"], ["v"], n_salts=n_salts).collect())
    )
    plain = sorted(
        map(
            tuple,
            df.groupBy("k")
            .agg(F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("row_ct"))
            .collect(),
        )
    )
    assert salted == plain


@settings(**_SETTINGS)
@given(
    left=st.lists(
        st.tuples(_keys, st.integers(0, 9)), min_size=0, max_size=25
    ),
    right=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(0, 9)),
        min_size=0,
        max_size=10,
    ),
    n_salts=st.integers(2, 6),
)
def test_salted_join_matches_plain(spark, left, right, n_salts):
    ldf = spark.createDataFrame(left, "k string, lv int")
    rdf = spark.createDataFrame(right, "k string, rv int")
    salted = sorted(
        map(tuple, salted_join(ldf, rdf, on="k", n_salts=n_salts).collect())
    )
    plain = sorted(map(tuple, ldf.join(rdf, "k").collect()))
    assert salted == plain


@settings(**_SETTINGS)
@given(
    deltas=st.lists(st.integers(-100, 100), min_size=1, max_size=40),
)
def test_lindley_reflection_identity_matches_loop(spark, deltas):
    """running_balance_floor's window algebra rests on the reflection
    identity B_t = S_t - min(0, min_{k<=t} S_k) == max(0, B_{t-1} + D_t);
    prove it against the literal loop on random delta sequences."""
    data = [(1, i, d) for i, d in enumerate(deltas)]
    df = spark.createDataFrame(data, "u int, t int, d long")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("u")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    got = [
        r.b
        for r in df.withColumn("s", F.sum("d").over(w))
        .withColumn("b", F.col("s") - F.least(F.lit(0), F.min("s").over(w)))
        .orderBy("t")
        .collect()
    ]
    ref, bal = [], 0
    for d in deltas:
        bal = max(0, bal + d)
        ref.append(bal)
    assert got == ref


@settings(**_SETTINGS)
@given(
    cts=st.lists(st.integers(1, 10_000), min_size=1, max_size=30),
)
def test_ewma_fold_matches_loop(spark, cts):
    """The unrolled `aggregate` fold in ewma_anomaly_daily must equal the
    literal sequential loop (alpha=1/4 floor arithmetic) on any series."""
    from realtimedatawarehouse_self_spark.plans.timeseries import _EWMA_FOLD

    days = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(days=i), c)
        for i, c in enumerate(cts)
    ]
    df = spark.createDataFrame([(days,)], "xs array<struct<d:timestamp,ct:bigint>>")
    rows = (
        df.selectExpr(f"inline({_EWMA_FOLD})")
        .orderBy("d")
        .collect()
    )
    prev = -1
    for r, c in zip(rows, cts):
        x = c * 1_000_000
        ewma = x if prev < 0 else (3 * prev + x) // 4
        assert r.ct == c
        assert r.ewma == ewma
        assert r.prev == (0 if prev < 0 else prev)
        prev = ewma


@settings(**_SETTINGS)
@given(
    cents=st.lists(st.integers(-500, 500), min_size=1, max_size=40),
)
def test_quantile_normalize_matches_python(spark, cents):
    """pct_micro must equal the pure-Python ANSI-rank percentile (ties
    share the rank of their first member) for any value multiset."""
    data = [(i, c) for i, c in enumerate(cents)]
    df = spark.createDataFrame(data, "event_id long, cents long")
    got = {
        r.event_id: r.p
        for r in df.select(
            "event_id",
            F.expr(
                f"CASE WHEN {len(cents)} > 1 THEN "
                f"(rank() OVER (ORDER BY cents) - 1) * 1000000 "
                f"div ({len(cents)} - 1) ELSE cast(0 as bigint) END"
            ).alias("p"),
        ).collect()
    }
    n = len(cents)
    s = sorted(cents)
    for i, c in enumerate(cents):
        rank = s.index(c) + 1  # ANSI rank: 1 + count of strictly smaller
        ref = 0 if n == 1 else (rank - 1) * 1_000_000 // (n - 1)
        assert got[i] == ref, (i, c)


@settings(**_SETTINGS)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1,
        max_size=40,
    ),
)
def test_star_components_matches_union_find(spark, edges):
    """Star contraction must agree with a literal union-find on random
    graphs (self-loops dropped, parallel edges collapsed — exactly the
    operator's own normalization)."""
    from realtimedatawarehouse_self_spark.plans.llm_ops import star_components

    clean = sorted({(u, v) for u, v in edges if u != v})
    if not clean:
        return
    df = spark.createDataFrame(clean, "u long, v long")
    got = {r.node: r.label for r in star_components(df).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in clean:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    ref = {n: find(n) for n in parent}
    assert got == ref


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(1, 4),                      # user
            st.integers(0, 200),                    # minutes offset
            st.sampled_from(["a", "b", "c", "x"]),  # type (x = noise)
        ),
        min_size=1,
        max_size=25,
    ),
    window_min=st.sampled_from([10, 60, 1000]),
)
def test_window_funnel_matches_python_reference(spark, rows, window_min):
    """window_funnel vs a brute-force reference that tries EVERY admissible
    (a, b, c) chain — validates the maximal-anchor construction on random
    interleavings, duplicate timestamps, and noise events."""
    from realtimedatawarehouse_self_spark.operators.relational import (
        window_funnel,
    )

    base = dt.datetime(2024, 1, 1)
    data = [
        (i, base + dt.timedelta(minutes=m), u, t)
        for i, (u, m, t) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r.user_id: r.depth
        for r in window_funnel(
            df, ["a", "b", "c"], f"INTERVAL {window_min} MINUTES"
        ).collect()
    }

    # reference: exhaustive chain search per user over the SAME total
    # order (ts, event_id); step k must be strictly after step k-1 in row
    # order and within window of the step-1 anchor
    per_user = defaultdict(list)
    for i, ts, u, t in data:
        if t in ("a", "b", "c"):
            per_user[u].append((ts, i, t))
    want = {}
    for u, evs in per_user.items():
        evs.sort()
        depth = 0
        n = len(evs)
        for ai in range(n):
            if evs[ai][2] != "a":
                continue
            depth = max(depth, 1)
            limit = evs[ai][0] + dt.timedelta(minutes=window_min)
            for bi in range(ai + 1, n):
                if evs[bi][2] != "b" or evs[bi][0] > limit:
                    continue
                depth = max(depth, 2)
                for ci in range(bi + 1, n):
                    if evs[ci][2] != "c" or evs[ci][0] > limit:
                        continue
                    depth = max(depth, 3)
        want[u] = depth
    assert got == want, (got, want)
