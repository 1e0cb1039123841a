"""Property-based third opinions for the round-10 wave-51 operators.

- `retrieval_ndcg_eval`: full pure-Python recount of the graded-ranking
  metrics (md5 run scores + qrels, integer gain x discount DCG/IDCG,
  integer-div NDCG/MRR) on generated document tables, plus boundary
  pins: a query whose top-K ordering IS the ideal ordering must score
  ndcg_micro = 1_000_000 exactly, and NDCG is order-invariant in the
  ideal ordering by construction (idcg >= dcg always).
- `fim_transform_plan`: per-doc recount of selection, cut points, mode,
  and the token-mass conservation law prefix+middle+suffix = tok_in of
  transformed docs.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.corpus_ops import (
    FIM_MIN_TOKENS,
)
from realtimedatawarehouse_self_spark.plans.retrieval import (
    NDCG_DISC_MICRO,
    NDCG_K,
    NDCG_QUERIES,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_WORDS = [f"w{i}" for i in range(12)]


def _write_docs(d, docs):
    # docs: (doc_id, text, lang)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array([r[2] for r in docs], pa.string()),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in docs], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def _gain(rel: int) -> int:
    return (1 << rel) - 1


def _rel_of(digit: str) -> int:
    if digit < "8":
        return 0
    if digit < "c":
        return 1
    if digit < "e":
        return 2
    return 3


def _ndcg_want(doc_ids):
    want = {}
    for q in range(NDCG_QUERIES):
        rows = []
        for did in doc_ids:
            h = hashlib.md5(f"{q}:{did}".encode()).hexdigest()
            rows.append((did, int(h[:8], 16), _rel_of(h[8])))
        run = sorted(rows, key=lambda r: (-r[1], r[0]))[:NDCG_K]
        ideal = sorted(rows, key=lambda r: (-r[2], r[0]))[:NDCG_K]
        dcg = sum(
            _gain(rel) * NDCG_DISC_MICRO[i]
            for i, (_d, _s, rel) in enumerate(run)
        )
        idcg = sum(
            _gain(rel) * NDCG_DISC_MICRO[i]
            for i, (_d, _s, rel) in enumerate(ideal)
        )
        n_rel = sum(1 for _d, _s, rel in run if rel > 0)
        first_good = next(
            (i + 1 for i, (_d, _s, rel) in enumerate(run) if rel >= 2),
            None,
        )
        want[q] = (
            dcg,
            idcg,
            dcg * 1_000_000 // idcg if idcg else 0,
            n_rel,
            1_000_000 // first_good if first_good else 0,
        )
    return want


@settings(**_SETTINGS)
@given(
    ids=st.lists(
        st.integers(0, 99999), min_size=1, max_size=40, unique=True
    )
)
def test_ndcg_eval_matches_python_recount(spark, ids):
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        retrieval_ndcg_eval,
    )

    d = tempfile.mkdtemp(prefix="ndcgprop")
    _write_docs(d, [(i, "x", "en") for i in ids])
    got = {
        r["query_id"]: (
            r["dcg_micro"],
            r["idcg_micro"],
            r["ndcg_micro"],
            r["n_rel_at_k"],
            r["rr_micro"],
        )
        for r in retrieval_ndcg_eval(spark, d).collect()
    }
    want = _ndcg_want(ids)
    assert got == want
    for dcg, idcg, ndcg, _n, _rr in got.values():
        assert idcg >= dcg  # ideal dominates any run
        assert ndcg <= 1_000_000


def test_ndcg_perfect_run_pins_one_million(spark):
    """Construct a doc set where the score ordering equals the ideal
    (relevance) ordering for query 0 — its ndcg_micro must be exactly
    1_000_000 (the integer div leaves no remainder when dcg == idcg)."""
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        retrieval_ndcg_eval,
    )

    # pick ids whose query-0 score order coincides with rel order:
    # greedily take ids in decreasing (rel, score) agreement
    cands = []
    for did in range(3000):
        h = hashlib.md5(f"0:{did}".encode()).hexdigest()
        cands.append((did, int(h[:8], 16), _rel_of(h[8])))
    # choose docs where sorting by score desc == sorting by rel desc:
    # walk grades descending, at each grade keep up to 2 of the
    # highest-scored docs strictly below the previous grade's minimum
    seq, last = [], None
    for rel_target in (3, 2, 1, 0):
        grade = [
            c
            for c in cands
            if c[2] == rel_target and (last is None or c[1] < last)
        ]
        grade.sort(key=lambda c: -c[1])
        take = grade[:2]
        if take:
            seq.extend(take)
            last = min(c[1] for c in take)
    assert len(seq) >= 4
    d = tempfile.mkdtemp(prefix="ndcgpin")
    _write_docs(d, [(c[0], "x", "en") for c in seq])
    got = {
        r["query_id"]: r["ndcg_micro"]
        for r in retrieval_ndcg_eval(spark, d).collect()
    }
    assert got[0] == 1_000_000


def _fim_want(docs):
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for did, text, lang in docs:
        if text is None or lang is None:
            continue
        n = len([t for t in text.split(" ") if t])
        h = hashlib.md5(f"fim|{did}".encode()).hexdigest()
        fim = h[0] < "8" and n >= FIM_MIN_TOKENS
        if fim:
            r1, r2 = int(h[1:3], 16), int(h[3:5], 16)
            a, b = r1 % (n - 1) + 1, r2 % (n - 1) + 1
            c1, c2 = min(a, b), max(a, b)
            mode = "psm" if h[6] < "8" else "spm"
        else:
            c1 = c2 = 0
            mode = "skip"
        row = agg[(lang, mode)]
        row[0] += 1
        row[1] += n
        if mode != "skip":
            row[2] += 3
            row[3] += c1
            row[4] += c2 - c1
            row[5] += n - c2
    return {
        k: tuple(v) + ((v[4] * 1_000_000 // v[1]) if v[1] else 0,)
        for k, v in agg.items()
    }


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 9999),
            st.lists(st.sampled_from(_WORDS), max_size=15).map(
                " ".join
            ),
            st.sampled_from(["en", "de", "fr"]),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
def test_fim_plan_matches_python_recount(spark, docs):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        fim_transform_plan,
    )

    d = tempfile.mkdtemp(prefix="fimprop")
    _write_docs(d, docs)
    got = {
        (r["lang"], r["mode"]): (
            r["n_docs"],
            r["tok_in"],
            r["sentinel_tok"],
            r["prefix_tok"],
            r["middle_tok"],
            r["suffix_tok"],
            r["middle_share_micro"],
        )
        for r in fim_transform_plan(spark, d).collect()
    }
    assert got == _fim_want(docs)
    # conservation: transformed token masses re-assemble the originals
    for (_lang, mode), (
        _n,
        tok_in,
        _s,
        pre,
        mid,
        suf,
        _r,
    ) in got.items():
        if mode != "skip":
            assert pre + mid + suf == tok_in
            assert pre >= 1 and suf >= 0 and mid >= 0
