"""Property-based third opinions for the round-10 wave-56 operators.

- `quantization_outlier_audit`: pure-Python recount of the per-dimension
  micro magnitude stats on generated embeddings (float32-faithful
  quantization as in the wave-49 recount), plus a constructed pin: a
  dimension with one planted 6.5x-magnitude spike flags 'outlier' while
  a uniform dimension stays 'normal'.
- `prompt_prefix_cache_plan`: pure-Python recount of the K-sweep prefix
  groups and cacheable-token accounting; invariants: hit_rate is
  nonincreasing in K (longer prefixes can only split groups) and
  cacheable_tokens = (shared_requests - shared_groups)·K summed over
  shared groups.
"""

from __future__ import annotations

import math
import os
import tempfile
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.corpus_ops import (
    PREFIX_CACHE_KS,
)
from realtimedatawarehouse_self_spark.plans.drift import (
    OUTLIER_ABS_FLOOR,
    OUTLIER_RATIO_MICRO,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_DIM = 8  # small embedding dim for the property tables
_WORDS = [f"w{i}" for i in range(6)]


def _write_embeddings(d, vecs):
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in vecs], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )


def _q(x: float) -> int:
    return abs(math.floor(float(np.float32(x)) * 1_000_000))


@settings(**_SETTINGS)
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(0, 9999),
            st.lists(
                st.floats(
                    -1.0,
                    1.0,
                    allow_nan=False,
                    allow_infinity=False,
                    width=32,
                ),
                min_size=_DIM,
                max_size=_DIM,
            ),
        ),
        min_size=1,
        max_size=10,
        unique_by=lambda r: r[0],
    )
)
def test_quant_outlier_matches_python_recount(spark, vecs):
    from realtimedatawarehouse_self_spark.plans.drift import (
        quantization_outlier_audit,
    )

    d = tempfile.mkdtemp(prefix="qout")
    _write_embeddings(d, vecs)
    got = {
        r["dim"]: (
            r["n_vals"],
            r["mean_abs_micro"],
            r["max_abs_micro"],
            r["ratio_micro"],
            r["verdict"],
        )
        for r in quantization_outlier_audit(spark, d).collect()
    }
    want = {}
    for dim in range(_DIM):
        qs = [_q(v[1][dim]) for v in vecs]
        n, s, mx = len(qs), sum(qs), max(qs)
        mean = s // n
        ratio = mx * 1_000_000 // mean if mean else 0
        verdict = (
            "outlier"
            if ratio >= OUTLIER_RATIO_MICRO and mx >= OUTLIER_ABS_FLOOR
            else "normal"
        )
        want[dim] = (n, mean, mx, ratio, verdict)
    assert got == want


def test_quant_outlier_planted_spike_pin(spark):
    """Dimension 0 gets a planted 0.9 spike over fifty 0.1-background
    vectors (the mean includes the spike: (50*1e5 + 899999)/51 ~ 115686
    micro, ratio ~7.8x > 6x, above the abs floor) -> 'outlier';
    dimension 1 is uniform 0.1 -> ratio 1x -> 'normal'."""
    from realtimedatawarehouse_self_spark.plans.drift import (
        quantization_outlier_audit,
    )

    base = [0.1] * _DIM
    vecs = [(i, list(base)) for i in range(50)]
    spike = list(base)
    spike[0] = 0.9
    vecs.append((99, spike))
    d = tempfile.mkdtemp(prefix="qoutpin")
    _write_embeddings(d, vecs)
    got = {
        r["dim"]: r["verdict"]
        for r in quantization_outlier_audit(spark, d).collect()
    }
    assert got[0] == "outlier"
    assert got[1] == "normal"


def _write_docs(d, docs):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in docs], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 9999),
            st.lists(st.sampled_from(_WORDS), max_size=10).map(
                " ".join
            ),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
def test_prefix_cache_plan_matches_python_recount(spark, docs):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        prompt_prefix_cache_plan,
    )

    d = tempfile.mkdtemp(prefix="pfx")
    _write_docs(d, docs)
    got = {
        r["k"]: (
            r["n_requests"],
            r["n_groups"],
            r["shared_requests"],
            r["cacheable_tokens"],
            r["hit_rate_micro"],
        )
        for r in prompt_prefix_cache_plan(spark, d).collect()
    }
    want = {}
    for k in PREFIX_CACHE_KS:
        groups = defaultdict(int)
        for _did, text in docs:
            toks = [t for t in text.split(" ") if t]
            if len(toks) >= k:
                groups[" ".join(toks[:k])] += 1
        if not groups:
            continue
        n_req = sum(groups.values())
        n_grp = len(groups)
        shared = sum(v for v in groups.values() if v >= 2)
        cacheable = sum((v - 1) * k for v in groups.values())
        want[k] = (
            n_req,
            n_grp,
            shared,
            cacheable,
            (n_req - n_grp) * 1_000_000 // n_req,
        )
    assert got == want
    # longer prefixes can only split groups: hit rate nonincreasing in K
    # among Ks with identical request sets (all docs >= max K)
    ks = [k for k in PREFIX_CACHE_KS if k in got]
    full = [
        k
        for k in ks
        if got[k][0] == got[ks[0]][0]
    ]
    rates = [got[k][4] for k in full]
    assert rates == sorted(rates, reverse=True)
