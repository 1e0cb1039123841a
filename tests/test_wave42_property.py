"""Property-based third opinions for the round-10 wave-42 operators.

Same discipline as test_wave22..41_property.py: hypothesis fixtures vs
pure-Python recounts independent of BOTH the Spark plans and the DuckDB
oracles.

- `chrf_char_eval`: clipped char-1..4-gram counts via collections.Counter
  against the per-(source, lang) lowest-doc_id eligible reference, the
  β=2 F per n and the 4-way mean in the identical float operation order;
- `quality_threshold_sweep`: per-(lang, tau) survivor doc/token recount,
  plus the monotonicity pin — raising tau can never ADD survivors;
- `distinct_ngram_diversity`: per-(source, n) Counter recount, plus the
  bound distinct <= total and the repetition pin — a corpus of one
  repeated token must crater distinct-1 while a all-distinct corpus sits
  at exactly 1.0.
"""

from __future__ import annotations

import hashlib
import math
import os
import tempfile
from collections import Counter, defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.curation import (
    CHRF_MAX_N,
    DISTINCT_NS,
    FT_WEIGHT_MOD,
    SWEEP_TAUS,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_WORDS = [f"w{i}" for i in range(10)]
_SRCS = ["srcA", "srcB"]
_LANGS = ["en", "de"]


def _write_docs(d: str, rows) -> None:
    # rows: (text_or_None, source, lang)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array([r[0] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[1] for r in rows]),
                "n_chars": pa.array(
                    [len(r[0] or "") for r in rows], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def _toks(text):
    return [w for w in (text or "").split(" ") if w != ""]


_rows_strategy = st.lists(
    st.tuples(
        st.one_of(
            st.none(),
            st.lists(st.sampled_from(_WORDS), min_size=0, max_size=16).map(
                " ".join
            ),
        ),
        st.sampled_from(_SRCS),
        st.sampled_from(_LANGS),
    ),
    min_size=2,
    max_size=12,
)


def _chrf_recount(rows):
    streams = {
        i: "".join(_toks(t)) for i, (t, _s, _l) in enumerate(rows)
    }
    groups = defaultdict(list)
    for i, (t, s, l) in enumerate(rows):
        if t is not None and len(streams[i]) >= CHRF_MAX_N:
            groups[(s, l)].append(i)
    out = {}
    for (_s, _l), ids in groups.items():
        ref = min(ids)
        rs = streams[ref]
        rc = {
            n: Counter(rs[i : i + n] for i in range(len(rs) - n + 1))
            for n in range(1, CHRF_MAX_N + 1)
        }
        rtot = {n: sum(rc[n].values()) for n in rc}
        for d in ids:
            if d == ref:
                continue
            cs = streams[d]
            clips, fs = [], []
            for n in range(1, CHRF_MAX_N + 1):
                cc = Counter(
                    cs[i : i + n] for i in range(len(cs) - n + 1)
                )
                clip = sum(min(ct, rc[n][g]) for g, ct in cc.items())
                tot = sum(cc.values())
                clips.append(clip)
                if clip == 0:
                    fs.append(0.0)
                else:
                    p = clip / tot
                    r = clip / rtot[n]
                    fs.append((5.0 * p * r) / (4.0 * p + r))
            score = ((fs[0] + fs[1]) + (fs[2] + fs[3])) / 4.0 * 1000000.0
            out[d] = (ref, len(cs), len(rs), *clips, math.floor(score))
    return out


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_chrf_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.curation import (
        chrf_char_eval,
    )

    d = tempfile.mkdtemp(prefix="chrfprop")
    _write_docs(d, rows)
    got = {
        r["doc_id"]: (
            r["ref_doc_id"],
            r["cand_chars"],
            r["ref_chars"],
            r["clip1"],
            r["clip2"],
            r["clip3"],
            r["clip4"],
            r["chrf_micro"],
        )
        for r in chrf_char_eval(spark, d).collect()
    }
    assert got == _chrf_recount(rows)


def test_chrf_identical_text_scores_million(spark):
    """Pin: a candidate identical to the reference clips everything —
    P = R = 1 for every n, so chrF = 1.0 exactly (1000000 micro)."""
    from realtimedatawarehouse_self_spark.plans.curation import (
        chrf_char_eval,
    )

    d = tempfile.mkdtemp(prefix="chrfpin")
    _write_docs(
        d,
        [("alpha beta gamma", "srcA", "en"), ("alpha beta gamma", "srcA", "en")],
    )
    rows = chrf_char_eval(spark, d).collect()
    assert len(rows) == 1 and rows[0]["chrf_micro"] == 1000000


def _score_milli(text: str):
    toks = _toks(text)
    if not toks:
        return None
    s = sum(
        int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % FT_WEIGHT_MOD
        for t in toks
    )
    return s // len(toks)


def _sweep_recount(rows):
    scored = [
        (l, len(_toks(t)), _score_milli(t))
        for (t, _s, l) in rows
        if t is not None and _toks(t)
    ]
    out = {}
    for lang in {l for l, _, _ in scored}:
        mine = [(n, sc) for l, n, sc in scored if l == lang]
        td, tt = len(mine), sum(n for n, _ in mine)
        for tau in SWEEP_TAUS:
            sd = sum(1 for _, sc in mine if sc >= tau)
            st_ = sum(n for n, sc in mine if sc >= tau)
            out[(lang, tau)] = (sd, st_, td, tt, st_ * 1000000 // tt)
    return out


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_threshold_sweep_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.curation import (
        quality_threshold_sweep,
    )

    d = tempfile.mkdtemp(prefix="sweepprop")
    _write_docs(d, rows)
    got = {
        (r["lang"], r["tau_milli"]): (
            r["surviving_docs"],
            r["surviving_tokens"],
            r["total_docs"],
            r["total_tokens"],
            r["token_share_micro"],
        )
        for r in quality_threshold_sweep(spark, d).collect()
    }
    assert got == _sweep_recount(rows)
    # monotonicity: survivors never increase as tau rises
    langs = {l for l, _ in got}
    for lang in langs:
        docs = [got[(lang, t)][0] for t in SWEEP_TAUS]
        toks = [got[(lang, t)][1] for t in SWEEP_TAUS]
        assert docs == sorted(docs, reverse=True)
        assert toks == sorted(toks, reverse=True)


def _distinct_recount(rows):
    out = {}
    by_src = defaultdict(list)
    for t, s, _l in rows:
        if t is not None and _toks(t):
            by_src[s].append(_toks(t))
    for s, docs in by_src.items():
        for n in DISTINCT_NS:
            c = Counter(
                " ".join(toks[i : i + n])
                for toks in docs
                for i in range(len(toks) - n + 1)
            )
            tot = sum(c.values())
            if tot == 0:
                continue
            out[(s, n)] = (tot, len(c), len(c) * 1000000 // tot)
    return out


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_distinct_n_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.curation import (
        distinct_ngram_diversity,
    )

    d = tempfile.mkdtemp(prefix="dnprop")
    _write_docs(d, rows)
    got = {
        (r["source"], r["n"]): (
            r["total_ngrams"],
            r["distinct_ngrams"],
            r["distinct_micro"],
        )
        for r in distinct_ngram_diversity(spark, d).collect()
    }
    assert got == _distinct_recount(rows)
    assert all(dn <= tot for tot, dn, _m in got.values())


def test_distinct_n_collapse_vs_all_distinct(spark):
    """Pin the metric's point: a mode-collapsed source (one token
    repeated) craters distinct-1 to 1/N while an all-distinct source
    sits at exactly 1.0."""
    from realtimedatawarehouse_self_spark.plans.curation import (
        distinct_ngram_diversity,
    )

    d = tempfile.mkdtemp(prefix="dnpin")
    _write_docs(
        d,
        [
            (" ".join(["same"] * 8), "collapsed", "en"),
            ("a b c d e f g h", "diverse", "en"),
        ],
    )
    got = {
        (r["source"], r["n"]): r["distinct_micro"]
        for r in distinct_ngram_diversity(spark, d).collect()
    }
    assert got[("collapsed", 1)] == 1000000 // 8
    assert got[("diverse", 1)] == 1000000
