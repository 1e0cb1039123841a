"""Property-based third opinions for the round-10 wave-44 operators.

- `code_switch_profile`: pure-Python recount of the windowed lang-id
  (marker counts, the >=-chain argmax in LANG_ORDER, switch points via a
  linear scan, dominant pick with count-then-order tie-break), plus the
  pin that a doc alternating marker blocks is flagged mixed with the
  exact switch count while a single-lang doc is not;
- `mixture_shard_conformance`: per-(shard, source) share recount and the
  invariant that shard shares sum to ~1e6 per shard (integer floor);
- `badword_ratio_filter`: membership recount via hashlib and the
  threshold boundary pin (ratio exactly at NUM/DEN keeps; one token
  over drops).
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
    BAD_MAX_DEN,
    BAD_MAX_NUM,
    BADWORD_HEX,
    EPOCH_SHARDS,
)
from realtimedatawarehouse_self_spark.plans.llm_ops import (
    CS_WINDOW,
    LANG_MARKERS,
    LANG_ORDER,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# words: every language's markers plus neutral fillers
_WORDS = [m for ms in LANG_MARKERS.values() for m in ms] + ["x1", "x2"]
_SRCS = ["srcA", "srcB"]


def _write_docs(d: str, rows) -> None:
    # rows: (doc_id, text_or_None, source, lang)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[3] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows]),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in rows], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def _toks(t):
    return [w for w in (t or "").split(" ") if w != ""]


_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9999),
        st.one_of(
            st.none(),
            st.lists(st.sampled_from(_WORDS), min_size=1, max_size=40).map(
                " ".join
            ),
        ),
        st.sampled_from(_SRCS),
        st.sampled_from(list(LANG_ORDER)),
    ),
    min_size=2,
    max_size=12,
    unique_by=lambda r: r[0],
)


def _pred(win_toks):
    scores = {
        lang: sum(1 for t in win_toks if t in LANG_MARKERS[lang])
        for lang in LANG_ORDER
    }
    for lang in LANG_ORDER:
        if all(scores[lang] >= scores[o] for o in LANG_ORDER if o != lang):
            return lang
    raise AssertionError("argmax must exist")


def _cs_recount(rows):
    out = {}
    for doc_id, text, _s, lang in rows:
        toks = _toks(text)
        if text is None or not toks:
            continue
        preds = [
            _pred(toks[i : i + CS_WINDOW])
            for i in range(0, len(toks), CS_WINDOW)
        ]
        switches = sum(
            1 for a, b in zip(preds, preds[1:]) if a != b
        )
        counts = defaultdict(int)
        for p in preds:
            counts[p] += 1
        best = max(
            counts.items(),
            key=lambda kv: (kv[1], -LANG_ORDER.index(kv[0])),
        )
        out[doc_id] = (
            lang,
            len(preds),
            len(counts),
            switches,
            best[0],
            best[1] * 1000000 // len(preds),
            len(counts) >= 2,
        )
    return out


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_code_switch_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        code_switch_profile,
    )

    d = tempfile.mkdtemp(prefix="csprop")
    _write_docs(d, rows)
    got = {
        r["doc_id"]: (
            r["true_lang"],
            r["n_windows"],
            r["n_pred_langs"],
            r["n_switches"],
            r["dominant_pred"],
            r["dominant_share_micro"],
            r["is_mixed"],
        )
        for r in code_switch_profile(spark, d).collect()
    }
    assert got == _cs_recount(rows)


def test_code_switch_alternating_blocks_pinned(spark):
    """A doc of CS_WINDOW en-markers then CS_WINDOW de-markers then
    CS_WINDOW en-markers must show 3 windows, 2 predicted langs, exactly
    2 switches, dominant en; a pure-en doc must be unmixed."""
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        code_switch_profile,
    )

    en = LANG_MARKERS["en"][0]
    de = LANG_MARKERS["de"][0]
    mixed = " ".join([en] * CS_WINDOW + [de] * CS_WINDOW + [en] * CS_WINDOW)
    pure = " ".join([en] * (2 * CS_WINDOW))
    d = tempfile.mkdtemp(prefix="cspin")
    _write_docs(d, [(1, mixed, "srcA", "en"), (2, pure, "srcA", "en")])
    got = {
        r["doc_id"]: r for r in code_switch_profile(spark, d).collect()
    }
    m = got[1]
    assert (
        m["n_windows"],
        m["n_pred_langs"],
        m["n_switches"],
        m["dominant_pred"],
        m["is_mixed"],
    ) == (3, 2, 2, "en", True)
    p = got[2]
    assert (p["n_pred_langs"], p["n_switches"], p["is_mixed"]) == (
        1,
        0,
        False,
    )


def _shard(doc_id) -> int:
    h = hashlib.md5(str(doc_id).encode()).hexdigest()
    return int(h[:4], 16) % EPOCH_SHARDS


def _conformance_recount(rows):
    cells = defaultdict(int)
    for doc_id, text, src, _l in rows:
        toks = _toks(text)
        if text is None:
            continue
        cells[(_shard(doc_id), src)] += len(toks)
    shard_tot = defaultdict(int)
    src_tot = defaultdict(int)
    corpus = 0
    for (sh, src), n in cells.items():
        shard_tot[sh] += n
        src_tot[src] += n
        corpus += n
    out = {}
    for (sh, src), n in cells.items():
        ss = n * 1000000 // shard_tot[sh]
        cs = src_tot[src] * 1000000 // corpus
        out[(sh, src)] = (n, shard_tot[sh], ss, cs, abs(ss - cs))
    return out


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_shard_conformance_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        mixture_shard_conformance,
    )

    d = tempfile.mkdtemp(prefix="confprop")
    _write_docs(d, rows)
    res = mixture_shard_conformance(spark, d).collect()
    got = {
        (r["shard_id"], r["source"]): (
            r["tokens"],
            r["shard_tokens"],
            r["shard_share_micro"],
            r["corpus_share_micro"],
            r["abs_dev_micro"],
        )
        for r in res
    }
    assert got == _conformance_recount(rows)
    # per-shard max deviation is the max over the shard's rows
    by_shard = defaultdict(list)
    for r in res:
        by_shard[r["shard_id"]].append(r)
    for rs in by_shard.values():
        mx = max(r["abs_dev_micro"] for r in rs)
        assert all(r["shard_max_dev_micro"] == mx for r in rs)


def _is_bad(tok: str) -> bool:
    return hashlib.md5(tok.encode()).hexdigest()[0] in BADWORD_HEX


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_badword_filter_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        badword_ratio_filter,
    )

    d = tempfile.mkdtemp(prefix="badprop")
    _write_docs(d, rows)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["bad_ct"],
            r["bad_micro"],
            r["decision"],
        )
        for r in badword_ratio_filter(spark, d).collect()
    }
    want = {}
    for doc_id, text, _s, _l in rows:
        toks = _toks(text)
        if text is None or not toks:
            continue
        bad = sum(1 for t in toks if _is_bad(t))
        want[doc_id] = (
            len(toks),
            bad,
            bad * 1000000 // len(toks),
            "drop"
            if bad * BAD_MAX_DEN > len(toks) * BAD_MAX_NUM
            else "keep",
        )
    assert got == want


def test_badword_threshold_boundary_pinned(spark):
    """Exactly NUM/DEN bad keeps (strict >); the same bad count over a
    shorter doc drops."""
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        badword_ratio_filter,
    )

    bad = next(w for w in (f"b{i}" for i in range(500)) if _is_bad(w))
    good = next(
        w for w in (f"g{i}" for i in range(500)) if not _is_bad(w)
    )
    # 1 bad of 6 tokens = exactly 1/6 -> keep; 1 bad of 5 -> over -> drop
    at = " ".join([bad] + [good] * 5)
    over = " ".join([bad] + [good] * 4)
    d = tempfile.mkdtemp(prefix="badpin")
    _write_docs(d, [(1, at, "srcA", "en"), (2, over, "srcA", "en")])
    got = {
        r["doc_id"]: r["decision"]
        for r in badword_ratio_filter(spark, d).collect()
    }
    assert got == {1: "keep", 2: "drop"}


# ---------------------------------------------------------------------------
# Wave 46 recount (kept here with the other events-free fixtures would be
# wrong — rtg needs an events fixture, built inline below).
# ---------------------------------------------------------------------------
def _write_events(d, rows):
    # rows: (event_id, user_id, ts_micros, value)
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os as _os

    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[2] for r in rows], pa.timestamp("us")
                ),
                "event_type": pa.array(["click"] * len(rows)),
                "page_id": pa.array([0] * len(rows), pa.int64()),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
        _os.path.join(d, "events.parquet"),
    )


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10**6),
            st.integers(1, 3),
            st.integers(0, 10**8),
            st.floats(0, 50, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
def test_return_to_go_matches_python_recount(spark, rows):
    import math
    from collections import defaultdict

    from realtimedatawarehouse_self_spark.plans.curation import (
        episode_return_to_go,
    )

    d = tempfile.mkdtemp(prefix="rtgprop")
    _write_events(d, rows)
    got = {
        (r["user_id"], r["day"]): (
            r["n_steps"],
            r["total_reward_cents"],
            r["max_rtg_cents"],
            r["mid_rtg_cents"],
            r["rtg_checksum_cents"],
        )
        for r in episode_return_to_go(spark, d).collect()
    }
    import datetime as dt

    eps = defaultdict(list)
    for eid, uid, tsu, val in rows:
        day = dt.datetime.utcfromtimestamp(tsu / 1e6).strftime("%Y-%m-%d")
        r = math.floor(val * 100 + 0.5)
        eps[(uid, day)].append((tsu, eid, r))
    want = {}
    for key, steps in eps.items():
        steps.sort(key=lambda s: (s[0], s[1], s[2]))
        rs = [r for _t, _e, r in steps]
        n = len(rs)
        rtg = [sum(rs[t:]) for t in range(n)]
        want[key] = (n, rtg[0], max(rtg), rtg[n // 2], sum(rtg))
        # the algebraic identity sum_t rtg_t == sum_t (t+1) * r_t
        assert sum(rtg) == sum((t + 1) * r for t, r in enumerate(rs))
    assert got == want
