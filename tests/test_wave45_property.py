"""Property-based third opinion for the round-10 wave-45 operator.

`bitext_margin_mining`: a full pure-Python re-execution — IVF cell
assignment (argmax cosine, tie -> lowest cid, the wave-31 recount), the
md5 side split, within-cell candidate cosines floored to micro, both
sides' top-K sums, the best-pair pick, and the integer ratio margin —
independent of both engines. Plus the discrimination pin that motivates
the margin criterion: an exact-duplicate pair embedded among unrelated
vectors must be accepted, and its margin must exceed every other
source's margin (the standout property).
"""

from __future__ import annotations

import hashlib
import math
import os
import tempfile
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.curation import (
    _BITEXT_SRC_HEX,
    BITEXT_K,
    BITEXT_MARGIN_MICRO,
)
from realtimedatawarehouse_self_spark.plans.llm_ops import (
    IVF_TARGET_CELL,
    MIN_CENTROIDS,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def _write_embeddings(d: str, vecs) -> None:
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [[float(x) for x in v] for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )


def _cos(a, b):
    dot = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    na = 0.0
    for x in a:
        na = na + x * x
    nb = 0.0
    for y in b:
        nb = nb + y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _is_src(vec_id: int) -> bool:
    return hashlib.md5(str(vec_id).encode()).hexdigest()[0] in _BITEXT_SRC_HEX


def _recount(vecs):
    n = len(vecs)
    k = max(MIN_CENTROIDS, n // IVF_TARGET_CELL)
    cents = [(cid, vecs[cid]) for cid in range(min(k, n))]
    cell = {
        i: max(cents, key=lambda c: (_cos(vecs[i], c[1]), -c[0]))[0]
        for i in range(n)
    }
    cands = [
        (i, j, math.floor(_cos(vecs[i], vecs[j]) * 1000000.0))
        for i in range(n)
        for j in range(n)
        if _is_src(i) and not _is_src(j) and cell[i] == cell[j]
    ]
    cands = [(i, j, s) for i, j, s in cands if s > 0]
    by_src = defaultdict(list)
    by_tgt = defaultdict(list)
    for i, j, s in cands:
        by_src[i].append((s, j))
        by_tgt[j].append((s, i))
    x_stats = {}
    for i, lst in by_src.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        top = lst[:BITEXT_K]
        x_stats[i] = (
            sum(s for s, _ in top),
            len(top),
            top[0][1],
            top[0][0],
        )
    y_stats = {}
    for j, lst in by_tgt.items():
        lst.sort(key=lambda t: (-t[0], t[1]))
        top = lst[:BITEXT_K]
        y_stats[j] = (sum(s for s, _ in top), len(top))
    out = {}
    for i, (sumk_x, kx, best_tgt, best_micro) in x_stats.items():
        sumk_y, ky = y_stats[best_tgt]
        denom = (sumk_x // kx + sumk_y // ky) // 2
        margin = best_micro * 1000000 // denom
        out[i] = (
            best_tgt,
            best_micro,
            denom,
            margin,
            margin > BITEXT_MARGIN_MICRO,
        )
    return out


@settings(**_SETTINGS)
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(-4, 4), st.integers(-4, 4), st.integers(1, 4)
        ),
        min_size=2,
        max_size=18,
    )
)
def test_bitext_mining_matches_python_recount(spark, vecs):
    from realtimedatawarehouse_self_spark.plans.curation import (
        bitext_margin_mining,
    )

    d = tempfile.mkdtemp(prefix="btprop")
    _write_embeddings(d, vecs)
    got = {
        r["src_id"]: (
            r["tgt_id"],
            r["pair_score_micro"],
            r["denom_micro"],
            r["margin_micro"],
            r["accepted"],
        )
        for r in bitext_margin_mining(spark, d).collect()
    }
    assert got == _recount(vecs)


def test_bitext_duplicate_pair_stands_out(spark):
    """An exact duplicate across the side split must be that source's
    best pair with margin above every unrelated source's margin — the
    discrimination property the margin criterion exists for."""
    from realtimedatawarehouse_self_spark.plans.curation import (
        bitext_margin_mining,
    )

    # find a (src, tgt) id pair under the md5 split within [0, 12)
    src_ids = [i for i in range(12) if _is_src(i)]
    tgt_ids = [i for i in range(12) if not _is_src(i)]
    assert src_ids and tgt_ids
    dup_src, dup_tgt = src_ids[0], tgt_ids[0]
    vecs = []
    for i in range(12):
        if i == dup_src or i == dup_tgt:
            vecs.append((4, 4, 1))  # the duplicated direction
        else:
            # unrelated directions, spread out
            vecs.append(((i % 5) - 2, ((i * 3) % 7) - 3, 1 + (i % 3)))
    d = tempfile.mkdtemp(prefix="btpin")
    _write_embeddings(d, vecs)
    got = {
        r["src_id"]: r for r in bitext_margin_mining(spark, d).collect()
    }
    if dup_src in got:  # same IVF cell required for candidacy
        row = got[dup_src]
        assert row["tgt_id"] == dup_tgt
        others = [
            r["margin_micro"] for s, r in got.items() if s != dup_src
        ]
        if others:
            assert row["margin_micro"] >= max(others)
