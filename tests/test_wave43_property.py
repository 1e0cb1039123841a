"""Property-based third opinions for the round-10 wave-43 operators.

- `vocab_growth_curve`: pure-Python Heaps-curve recount (band formula,
  first-appearance = min band, cumulative sums), plus the invariants
  sum(new_types) == |vocab| and cum_vocab nondecreasing;
- `streaming_vocab_growth_twin`: the multi-batch keyed-state election
  must equal the batch curve EXACTLY on the same fixture (the twin
  contract, proven here on hypothesis corpora in addition to the driver
  oracle at sf0.01).
"""

from __future__ import annotations

import os
import tempfile
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.corpus_ops import VOCAB_BANDS

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_WORDS = [f"w{i}" for i in range(30)]


def _write_docs(d: str, rows) -> None:
    # rows: (doc_id, text_or_None)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["srcA"] * len(rows)),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in rows], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),
        st.one_of(
            st.none(),
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(
                " ".join
            ),
        ),
    ),
    min_size=2,
    max_size=20,
    unique_by=lambda r: r[0],
)


def _recount(rows):
    docs = [
        (i, t.split(" "))
        for i, t in rows
        if t is not None and [w for w in t.split(" ") if w != ""]
    ]
    if not docs:
        return {}
    lo = min(i for i, _ in docs)
    hi = max(i for i, _ in docs)
    band_docs = defaultdict(lambda: [0, 0])
    first = {}
    for i, toks in docs:
        b = (i - lo) * VOCAB_BANDS // (hi - lo + 1)
        band_docs[b][0] += 1
        band_docs[b][1] += len(toks)
        for t in toks:
            first[t] = min(first.get(t, b), b)
    new_types = defaultdict(int)
    for _t, b in first.items():
        new_types[b] += 1
    out, cum_t, cum_v = {}, 0, 0
    for b in sorted(band_docs):
        cum_t += band_docs[b][1]
        cum_v += new_types[b]
        out[b] = (
            band_docs[b][0],
            band_docs[b][1],
            cum_t,
            new_types[b],
            cum_v,
            cum_v * 1000000 // cum_t,
        )
    return out


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_vocab_growth_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        vocab_growth_curve,
    )

    d = tempfile.mkdtemp(prefix="vgprop")
    _write_docs(d, rows)
    got = {
        r["band"]: (
            r["n_docs"],
            r["band_tokens"],
            r["cum_tokens"],
            r["new_types"],
            r["cum_vocab"],
            r["type_token_micro"],
        )
        for r in vocab_growth_curve(spark, d).collect()
    }
    want = _recount(rows)
    assert got == want
    if got:
        vocab = len(
            {
                w
                for _i, t in rows
                if t is not None
                for w in t.split(" ")
                if w != ""
            }
        )
        assert sum(v[3] for v in got.values()) == vocab
        cums = [got[b][4] for b in sorted(got)]
        assert cums == sorted(cums)


@settings(max_examples=3, deadline=None, suppress_health_check=[
    HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
])
@given(rows=_rows_strategy)
def test_streaming_twin_equals_batch_curve(spark, rows):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        vocab_growth_curve,
    )
    from realtimedatawarehouse_self_spark.plans.streaming_twins import (
        streaming_vocab_growth_twin,
    )

    d = tempfile.mkdtemp(prefix="vgtwinprop")
    _write_docs(d, rows)
    batch = sorted(
        tuple(r) for r in vocab_growth_curve(spark, d).collect()
    )
    stream = sorted(
        tuple(r) for r in streaming_vocab_growth_twin(spark, d).collect()
    )
    assert batch == stream


@settings(max_examples=3, deadline=None, suppress_health_check=[
    HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
])
@given(rows=_rows_strategy)
def test_streaming_frontier_twin_equals_batch_plan(spark, rows):
    """r10 wave 46b: the per-host politeness counter carried across four
    real micro-batches must reproduce the batch rank formula exactly."""
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        crawl_frontier_plan,
    )
    from realtimedatawarehouse_self_spark.plans.streaming_twins import (
        streaming_frontier_twin,
    )

    d = tempfile.mkdtemp(prefix="frtwinprop")
    _write_docs(d, rows)
    batch = sorted(
        tuple(r) for r in crawl_frontier_plan(spark, d).collect()
    )
    stream = sorted(
        tuple(r) for r in streaming_frontier_twin(spark, d).collect()
    )
    assert batch == stream
