"""Property-based third opinions for the round-9 wave-31-33 operators.

Same discipline as test_wave22/24/25/28_property.py: hypothesis fixtures
vs pure-Python recounts — a reference independent of BOTH the Spark plans
and the DuckDB oracles. Focus:

- `bradley_terry_strength` (+ the preference matrix it supersets): the
  per-(user, day) implicit comparisons, tie exclusion, and the unrolled
  integer MM updates, recounted with a dict-based Python loop;
- `episode_discounted_returns`: the (ts, event_id, reward) step ordering
  and the per-term shift decay vs a Python loop with `>>`;
- `rouge_bigram_eval`: clipped multiset overlap vs collections.Counter;
- `dawid_skene_vote`: majority init -> accuracy estimate -> weighted
  re-vote -> flip audit, all in plain Python;
- `fasttext_hash_quality`: md5 hashing-trick weights via hashlib;
- `perplexity_bucket_assign`: the bigram LM score AND the 30/40/30
  per-lang rank cut, recounted from raw text;
- `semdedup_eps_sweep`: cell assignment (argmax cosine, tie -> lowest
  cid), within-cell pair sweep and keep-first drop counts on tiny
  exactly-representable vectors.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import os
import tempfile
from collections import Counter, defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

MICRO = 1_000_000
KK = 1_000_000_000_000
_BASE = dt.datetime(2024, 1, 1)

_WORDS = ["spark", "join", "merge", "row", "the", "a", "data", "value"]
_LANGS = ["en", "de"]
_SRCS = ["srcA", "srcB"]
_TYPES = ["view", "click", "purchase", "error"]


def _write_events(d: str, rows) -> None:
    # rows: (event_id, minute_offset, user, etype, value)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [
                        None
                        if r[1] is None
                        else _BASE + dt.timedelta(minutes=r[1])
                        for r in rows
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array([None] * len(rows), pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )


def _write_docs(d: str, rows) -> None:
    # rows: (doc_id, text_or_None, lang, source, n_chars)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


_events_strategy = st.lists(
    st.tuples(
        # None -> NULL ts: the engine contract drops NULL-ts rows from
        # every sequence/comparison operator (the r9 code-review class:
        # Spark groupBy keeps a NULL-day group, SQL equi-joins drop it)
        st.one_of(st.none(), st.integers(0, 3000)),
        st.integers(1, 4),  # user
        st.sampled_from(_TYPES),
        st.one_of(st.none(), st.floats(0, 50, allow_nan=False)),
    ),
    min_size=1,
    max_size=40,
)

_docs_strategy = st.lists(
    st.tuples(
        st.one_of(
            st.none(),
            st.lists(st.sampled_from(_WORDS), min_size=0, max_size=20).map(
                " ".join
            ),
        ),
        st.sampled_from(_LANGS),
        st.sampled_from(_SRCS),
        st.integers(0, 400),
    ),
    min_size=1,
    max_size=20,
)


def _day(minute: int) -> str:
    return (_BASE + dt.timedelta(minutes=minute)).strftime("%Y-%m-%d")


def _pref_structures(rows):
    """rows: (event_id, minute, user, etype, value) -> (matrix, edges)."""
    counts = Counter()
    for _eid, minute, user, etype, _v in rows:
        if minute is None:
            continue
        counts[(user, _day(minute), etype)] += 1
    per_ud = defaultdict(dict)
    for (user, day, etype), ct in counts.items():
        per_ud[(user, day)][etype] = ct
    matrix = defaultdict(lambda: [0, 0, 0, 0])  # n_comp, a_wins, b_wins, ties
    for tc in per_ud.values():
        types = sorted(tc)
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                a, b = types[i], types[j]
                m = matrix[(a, b)]
                m[0] += 1
                if tc[a] > tc[b]:
                    m[1] += 1
                elif tc[b] > tc[a]:
                    m[2] += 1
                else:
                    m[3] += 1
    return matrix


@settings(**_SETTINGS)
@given(rows=_events_strategy)
def test_preference_matrix_matches_python(spark, rows):
    from realtimedatawarehouse_self_spark.plans.curation import (
        pairwise_preference_matrix,
    )

    d = tempfile.mkdtemp(prefix="prefprop")
    ev = [(i, m, u, t, v) for i, (m, u, t, v) in enumerate(rows)]
    _write_events(d, ev)
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_comparisons"],
            r["a_wins"],
            r["b_wins"],
            r["ties"],
        )
        for r in pairwise_preference_matrix(spark, d).collect()
    }
    want = {k: tuple(v) for k, v in _pref_structures(ev).items()}
    assert got == want


@settings(**_SETTINGS)
@given(rows=_events_strategy)
def test_bradley_terry_matches_python_mm(spark, rows):
    from realtimedatawarehouse_self_spark.plans import curation as cu

    d = tempfile.mkdtemp(prefix="btprop")
    ev = [(i, m, u, t, v) for i, (m, u, t, v) in enumerate(rows)]
    _write_events(d, ev)
    got = {
        r["event_type"]: (
            r["n_wins"],
            r["n_comparisons"],
            r["strength_micro"],
            r["rnk"],
        )
        for r in cu.bradley_terry_strength(spark, d).collect()
    }

    matrix = _pref_structures(ev)
    edges = defaultdict(dict)  # i -> j -> (n_ij, wins of i over j)
    for (a, b), (_nc, aw, bw, _t) in matrix.items():
        n_ij = aw + bw
        if n_ij > 0:
            edges[a][b] = (n_ij, aw)
            edges[b][a] = (n_ij, bw)
    wins = {
        i: (
            sum(w for _n, w in edges[i].values()),
            sum(n for n, _w in edges[i].values()),
        )
        for i in edges
    }
    s = {i: MICRO for i in edges}
    for _ in range(cu.BT_ITERS):
        ns = {}
        for i in edges:
            den = sum(
                n * KK // (s[i] + s[j]) for j, (n, _w) in edges[i].items()
            )
            ns[i] = (
                max(wins[i][0] * KK // den, 1) if den > 0 else MICRO
            )
        s = ns
    order = sorted(edges, key=lambda i: (-s[i], i))
    want = {
        i: (wins[i][0], wins[i][1], s[i], order.index(i) + 1)
        for i in edges
    }
    assert got == want


@settings(**_SETTINGS)
@given(rows=_events_strategy)
def test_episode_returns_match_python_loop(spark, rows):
    from realtimedatawarehouse_self_spark.plans.curation import (
        _GAMMA_MAX_T,
        episode_discounted_returns,
    )

    d = tempfile.mkdtemp(prefix="episprop")
    ev = [(i, m, u, t, v) for i, (m, u, t, v) in enumerate(rows)]
    _write_events(d, ev)
    got = {
        (r["user_id"], r["day"]): (
            r["n_steps"],
            r["total_reward_cents"],
            r["discounted_return_cents"],
        )
        for r in episode_discounted_returns(spark, d).collect()
    }

    episodes = defaultdict(list)
    for eid, minute, user, _t, v in ev:
        if minute is None:
            continue
        r = math.floor((v if v is not None else 0.0) * 100 + 0.5)
        episodes[(user, _day(minute))].append((minute, eid, r))
    want = {}
    for key, steps in episodes.items():
        steps.sort()  # (ts, event_id, r) — the documented total order
        disc = sum(
            r >> t for t, (_m, _e, r) in enumerate(steps) if t < _GAMMA_MAX_T
        )
        want[key] = (len(steps), sum(r for _m, _e, r in steps), disc)
    assert got == want


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t != ""]


@settings(**_SETTINGS)
@given(docs=_docs_strategy)
def test_rouge_matches_counter_recount(spark, docs):
    from realtimedatawarehouse_self_spark.plans.curation import (
        rouge_bigram_eval,
    )

    d = tempfile.mkdtemp(prefix="rougeprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)
    got = {
        r["doc_id"]: (
            r["ref_doc_id"],
            r["n_cand_bigrams"],
            r["n_ref_bigrams"],
            r["overlap_ct"],
            r["precision_micro"],
            r["recall_micro"],
            r["f1_micro"],
        )
        for r in rouge_bigram_eval(spark, d).collect()
    }

    bigrams = {}
    groups = defaultdict(list)
    for doc_id, text, lg, src, _nc in rows:
        if text is None or lg is None or src is None:
            continue
        toks = _toks(text)
        if len(toks) < 2:
            continue
        bigrams[doc_id] = Counter(
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        )
        groups[(src, lg)].append(doc_id)
    want = {}
    for (_src, _lg), ids in groups.items():
        ref = min(ids)
        rc = bigrams[ref]
        n_ref = sum(rc.values())
        for doc_id in ids:
            if doc_id == ref:
                continue
            cc = bigrams[doc_id]
            n_cand = sum(cc.values())
            ovc = sum(min(ct, rc[bg]) for bg, ct in cc.items())
            p = ovc * MICRO // n_cand
            r = ovc * MICRO // n_ref
            f1 = 0 if p + r == 0 else 2 * p * r // (p + r)
            want[doc_id] = (ref, n_cand, n_ref, ovc, p, r, f1)
    assert got == want


@settings(**_SETTINGS)
@given(docs=_docs_strategy)
def test_dawid_skene_matches_python(spark, docs):
    from realtimedatawarehouse_self_spark.plans import curation as cu

    d = tempfile.mkdtemp(prefix="dsprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)
    got = {
        r["source"]: (
            r["n_docs"],
            r["majority_pos"],
            r["weighted_pos"],
            r["n_flips"],
            r["acc_a_micro"],
            r["acc_b_micro"],
            r["acc_c_micro"],
        )
        for r in cu.dawid_skene_vote(spark, d).collect()
    }

    labeled = []
    for _doc_id, text, _lg, src, nc in rows:
        if text is None:
            continue
        toks = _toks(text)
        a = 1 if nc >= cu.DS_LEN_THRESH else 0
        b = (
            1
            if len(set(toks)) * cu.DS_DIV_DEN >= len(toks) * cu.DS_DIV_NUM
            else 0
        )
        c = 1 if len(toks) >= cu.DS_TOK_THRESH else 0
        m = 1 if a + b + c >= 2 else 0
        labeled.append((src, a, b, c, m))
    if not labeled:
        assert got == {}
        return
    n = len(labeled)
    acc_a = sum(1 for _s, a, _b, _c, m in labeled if a == m) * MICRO // n
    acc_b = sum(1 for _s, _a, b, _c, m in labeled if b == m) * MICRO // n
    acc_c = sum(1 for _s, _a, _b, c, m in labeled if c == m) * MICRO // n
    want = defaultdict(lambda: [0, 0, 0, 0])
    for src, a, b, c, m in labeled:
        v1 = a * acc_a + b * acc_b + c * acc_c
        v0 = (1 - a) * acc_a + (1 - b) * acc_b + (1 - c) * acc_c
        f = 1 if v1 > v0 else (0 if v1 < v0 else m)
        w = want[src]
        w[0] += 1
        w[1] += m
        w[2] += f
        w[3] += 1 if f != m else 0
    assert got == {
        src: (w[0], w[1], w[2], w[3], acc_a, acc_b, acc_c)
        for src, w in want.items()
    }


@settings(**_SETTINGS)
@given(docs=_docs_strategy)
def test_fasttext_weights_match_hashlib(spark, docs):
    from realtimedatawarehouse_self_spark.plans import curation as cu

    d = tempfile.mkdtemp(prefix="ftprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["sum_w_milli"],
            r["score_milli"],
            r["decision"],
        )
        for r in cu.fasttext_hash_quality(spark, d).collect()
    }

    def weight(tok: str) -> int:
        h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
        return h % cu.FT_WEIGHT_MOD

    want = {}
    for doc_id, text, _lg, _src, _nc in rows:
        if text is None:
            continue
        toks = _toks(text)
        if not toks:
            continue
        sw = sum(weight(t) for t in toks)
        score = sw // len(toks)
        want[doc_id] = (
            len(toks),
            sw,
            score,
            "keep" if score >= cu.FT_KEEP_MILLI else "drop",
        )
    assert got == want


@settings(**_SETTINGS)
@given(docs=_docs_strategy)
def test_perplexity_buckets_match_python(spark, docs):
    from realtimedatawarehouse_self_spark.plans.curation import (
        perplexity_bucket_assign,
    )
    from realtimedatawarehouse_self_spark.plans.mining import LM_MIN_CT

    d = tempfile.mkdtemp(prefix="pplprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)
    got = {
        r["doc_id"]: (
            r["lang"],
            r["mean_prob_micro"],
            r["lang_rank"],
            r["bucket"],
        )
        for r in perplexity_bucket_assign(spark, d).collect()
    }

    pairs = []
    for doc_id, text, _lg, _src, _nc in rows:
        if text is None:
            continue
        toks = _toks(text)
        for i in range(len(toks) - 1):
            pairs.append((doc_id, toks[i], toks[i + 1]))
    uni = Counter(lhs for _d, lhs, _r in pairs)
    big = Counter((lhs, rhs) for _d, lhs, rhs in pairs)
    lm = {
        k: ct * MICRO // uni[k[0]]
        for k, ct in big.items()
        if ct >= LM_MIN_CT
    }
    per_doc = defaultdict(lambda: [0, 0])
    for doc_id, lhs, rhs in pairs:
        pd = per_doc[doc_id]
        pd[0] += 1
        pd[1] += lm.get((lhs, rhs), 0)
    lang = {doc_id: lg for doc_id, _t, lg, _s, _n in rows}
    scored = {
        doc_id: sp // nb for doc_id, (nb, sp) in per_doc.items()
    }
    by_lang = defaultdict(list)
    for doc_id, mean in scored.items():
        by_lang[lang[doc_id]].append((doc_id, mean))
    want = {}
    for lg, items in by_lang.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        n = len(items)
        for rank0, (doc_id, mean) in enumerate(items):
            rank = rank0 + 1
            bucket = (
                "head"
                if rank * 10 <= n * 3
                else ("middle" if rank * 10 <= n * 7 else "tail")
            )
            want[doc_id] = (lg, mean, rank, bucket)
    assert got == want


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


@settings(**_SETTINGS)
@given(
    vecs=st.lists(
        st.tuples(
            st.integers(-4, 4), st.integers(-4, 4), st.integers(1, 4)
        ),
        min_size=1,
        max_size=18,
    )
)
def test_semdedup_sweep_matches_python(spark, vecs):
    # third component >= 1 keeps every vector non-zero (cosine defined);
    # integer components are exactly representable in float32/float64
    from realtimedatawarehouse_self_spark.plans import curation as cu
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        IVF_TARGET_CELL,
        MIN_CENTROIDS,
    )

    d = tempfile.mkdtemp(prefix="semprop")
    _write_embeddings(d, vecs)
    got = {
        r["eps_milli"]: (
            r["n_vecs"],
            r["n_pairs_over"],
            r["n_dropped"],
            r["retention_micro"],
        )
        for r in cu.semdedup_eps_sweep(spark, d).collect()
    }

    def cos(a, b):
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

    n = len(vecs)
    k = max(MIN_CENTROIDS, n // IVF_TARGET_CELL)
    cents = [(cid, vecs[cid]) for cid in range(min(k, n))]
    cell = {
        i: max(cents, key=lambda c: (cos(vecs[i], c[1]), -c[0]))[0]
        for i in range(n)
    }
    pair_scores = [
        (j, cos(vecs[i], vecs[j]))
        for i in range(n)
        for j in range(i + 1, n)
        if cell[i] == cell[j]
    ]
    want = {}
    for eps in cu.SEMDEDUP_EPS:
        over = [s for _j, s in pair_scores if s > eps]
        dropped = len({j for j, s in pair_scores if s > eps})
        retention = (
            MICRO if n == 0 else (n - dropped) * MICRO // n
        )
        want[int(eps * 1000)] = (n, len(over), dropped, retention)
    assert got == want


# ---------------------------------------------------------------------------
# Wave 34 recounts
# ---------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(docs=_docs_strategy)
def test_confident_learning_matches_python(spark, docs):
    from realtimedatawarehouse_self_spark.plans.curation import (
        confident_learning_audit,
    )
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        LANG_MARKERS,
        LANG_ORDER,
    )

    d = tempfile.mkdtemp(prefix="clprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)
    got = {
        (r["given_lang"], r["confident_cls"]): (
            r["n_docs"],
            r["is_label_issue"],
        )
        for r in confident_learning_audit(spark, d).collect()
    }

    probs = {}  # doc_id -> (given, {cls: prob_micro})
    for doc_id, text, lg, _src, _nc in rows:
        if text is None:
            continue
        toks = _toks(text)
        scores = {
            c: sum(1 for t in toks if t in LANG_MARKERS[c])
            for c in LANG_ORDER
        }
        total = sum(scores.values())
        if total == 0:
            continue
        probs[doc_id] = (
            lg,
            {c: scores[c] * MICRO // total for c in LANG_ORDER},
        )
    thr = {}
    for c in LANG_ORDER:
        vals = [p[c] for given, p in probs.values() if given == c]
        if vals:
            thr[c] = sum(vals) // len(vals)
    want = defaultdict(lambda: [0, 0])
    for given, p in probs.values():
        qual = [
            (p[c], -i, c)
            for i, c in enumerate(LANG_ORDER)
            if c in thr and p[c] >= thr[c]
        ]
        if not qual:
            continue
        cls = max(qual)[2]
        w = want[(given, cls)]
        w[0] += 1
        w[1] = max(w[1], 1 if given != cls else 0)
    assert got == {k: tuple(v) for k, v in want.items()}


@settings(**_SETTINGS)
@given(docs=_docs_strategy)
def test_importance_ess_matches_python(spark, docs):
    from realtimedatawarehouse_self_spark.plans.curation import (
        importance_weight_ess,
    )
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        DSIR_TARGET_LANG,
    )

    d = tempfile.mkdtemp(prefix="essprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)
    got = {
        r["source"]: (r["n_docs"], r["ess_milli"], r["ess_ratio_micro"])
        for r in importance_weight_ess(spark, d).collect()
    }

    occ = []  # (doc_id, source, word, is_target)
    for doc_id, text, lg, src, _nc in rows:
        if text is None:
            continue
        for w in _toks(text):
            occ.append((doc_id, src, w, lg == DSIR_TARGET_LANG))
    raw = Counter(w for _d, _s, w, _t in occ)
    tgt = Counter(w for _d, _s, w, is_t in occ if is_t)
    r_tot, t_tot, v = sum(raw.values()), sum(tgt.values()), len(raw)
    odds = {
        w: (tgt[w] + 1) * (r_tot + v) * MICRO // ((raw[w] + 1) * (t_tot + v))
        for w in raw
    }
    per_doc = defaultdict(lambda: [0, 0, None])
    for doc_id, src, w, _t in occ:
        pd = per_doc[doc_id]
        pd[0] += 1
        pd[1] += odds[w]
        pd[2] = src
    weights = defaultdict(list)
    for _doc, (n, s, src) in per_doc.items():
        wv = s // n
        weights[src].append(wv)
        weights["__all__"].append(wv)
    want = {}
    for src, ws in weights.items():
        sw, sw2 = sum(ws), sum(x * x for x in ws)
        ess = sw * sw * 1000 // sw2 if sw2 > 0 else 0
        want[src] = (len(ws), ess, ess * 1000 // len(ws))
    assert got == want


@settings(**_SETTINGS)
@given(rows=_events_strategy)
def test_episode_advantage_matches_python(spark, rows):
    from realtimedatawarehouse_self_spark.plans.curation import (
        _GAMMA_MAX_T,
        episode_advantage_baseline,
    )

    d = tempfile.mkdtemp(prefix="advprop")
    ev = [(i, m, u, t, v) for i, (m, u, t, v) in enumerate(rows)]
    _write_events(d, ev)
    got = {
        (r["user_id"], r["day"]): (
            r["n_episodes"],
            r["baseline_cents"],
            r["advantage_cents"],
        )
        for r in episode_advantage_baseline(spark, d).collect()
    }

    episodes = defaultdict(list)
    for eid, minute, user, _t, v in ev:
        if minute is None:
            continue
        r = math.floor((v if v is not None else 0.0) * 100 + 0.5)
        episodes[(user, _day(minute))].append((minute, eid, r))
    G = {}
    for key, steps in episodes.items():
        steps.sort()
        G[key] = sum(
            r >> t for t, (_m, _e, r) in enumerate(steps) if t < _GAMMA_MAX_T
        )
    by_day = defaultdict(list)
    for (user, day), g in G.items():
        by_day[day].append(g)
    want = {}
    for (user, day), g in G.items():
        gs = by_day[day]
        baseline = sum(gs) // len(gs)
        want[(user, day)] = (len(gs), baseline, g - baseline)
    assert got == want


@settings(**_SETTINGS)
@given(docs=_docs_strategy)
def test_pack_waste_matches_python(spark, docs):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import PACK_BUDGET
    from realtimedatawarehouse_self_spark.plans.curation import (
        pack_attention_waste,
    )

    d = tempfile.mkdtemp(prefix="packprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)
    got = {
        r["lang"]: (
            r["n_docs"],
            r["n_packs"],
            r["overflow_packs"],
            r["closed_pad_tokens"],
            r["closed_fill_micro"],
            r["attention_boundaries"],
        )
        for r in pack_attention_waste(spark, d).collect()
    }

    # NULL-text docs ride the parent doc_pack_greedy semantics: ANSI
    # size(NULL)=NULL -> pack_id NULL -> they form a lang's NULL pack
    # (both engines agree; the NULL-fixture parity row pins it)
    by_lang = defaultdict(list)
    for doc_id, text, lg, _src, _nc in rows:
        by_lang[lg].append(
            (doc_id, len(_toks(text)) if text is not None else None)
        )
    want = {}
    for lg, ds in by_lang.items():
        ds.sort()
        packs = defaultdict(lambda: [0, 0, False])  # [n_docs, sum, has_ct]
        prefix = 0
        for _doc_id, ct in ds:
            if ct is None:
                packs[None][0] += 1
                continue
            pid = prefix // PACK_BUDGET
            packs[pid][0] += 1
            packs[pid][1] += ct
            packs[pid][2] = True
            prefix += ct
        real = [p for p in packs if p is not None]
        max_pack = max(real) if real else None
        n_docs = sum(n for n, _s, _h in packs.values())
        closed = {
            p: v
            for p, v in packs.items()
            if p is not None and max_pack is not None and p < max_pack
        }
        pad = sum(
            PACK_BUDGET - s
            for _n, s, _h in closed.values()
            if s < PACK_BUDGET
        )
        fill = (
            sum(s for _n, s, _h in closed.values()) * MICRO
            // (len(closed) * PACK_BUDGET)
            if closed
            else None
        )
        want[lg] = (
            n_docs,
            len(packs),
            sum(1 for _n, s, h in packs.values() if h and s > PACK_BUDGET),
            pad,
            fill,
            n_docs - len(packs),
        )
    assert got == want


# ---------------------------------------------------------------------------
# Wave 35 recounts
# ---------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(rows=_events_strategy)
def test_preference_holdout_matches_python(spark, rows):
    from realtimedatawarehouse_self_spark.plans import curation as cu

    d = tempfile.mkdtemp(prefix="pholdprop")
    ev = [(i, m, u, t, v) for i, (m, u, t, v) in enumerate(rows)]
    _write_events(d, ev)
    got = {
        r["day"]: (
            r["n_eval"],
            r["bt_correct"],
            r["maj_correct"],
            r["bt_acc_micro"],
            r["maj_acc_micro"],
        )
        for r in cu.preference_holdout_accuracy(spark, d).collect()
    }

    # day-carrying pair recount (the _pref_structures shape + day)
    counts = Counter()
    for _eid, minute, user, etype, _v in ev:
        if minute is None:
            continue
        counts[(user, _day(minute), etype)] += 1
    per_ud = defaultdict(dict)
    for (user, day, etype), ct in counts.items():
        per_ud[(user, day)][etype] = ct
    pairs = []  # (day, a, b, ca, cb)
    for (user, day), tc in per_ud.items():
        types = sorted(tc)
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                a, b = types[i], types[j]
                pairs.append((day, a, b, tc[a], tc[b]))
    days = sorted({p[0] for p in pairs})
    n = len(days)
    train_days = {d_ for r, d_ in enumerate(days, 1) if r * 5 <= n * 4}
    train = [p for p in pairs if p[0] in train_days]
    test = [p for p in pairs if p[0] not in train_days]

    matrix = defaultdict(lambda: [0, 0])  # (a,b) -> [n_ij, wins_a]
    for _d, a, b, ca, cb in train:
        if ca != cb:
            m = matrix[(a, b)]
            m[0] += 1
            m[1] += 1 if ca > cb else 0
    edges = defaultdict(dict)
    for (a, b), (n_ij, aw) in matrix.items():
        if n_ij > 0:
            edges[a][b] = (n_ij, aw)
            edges[b][a] = (n_ij, n_ij - aw)
    wins = {
        i: sum(w for _n, w in edges[i].values()) for i in edges
    }
    s = {i: MICRO for i in edges}
    for _ in range(cu.BT_ITERS):
        ns = {}
        for i in edges:
            den = sum(
                nn * KK // (s[i] + s[j])
                for j, (nn, _w) in edges[i].items()
            )
            ns[i] = max(wins[i] * KK // den, 1) if den > 0 else MICRO
        s = ns
    want = defaultdict(lambda: [0, 0, 0])
    for day, a, b, ca, cb in test:
        if ca == cb or (a, b) not in matrix or matrix[(a, b)][0] == 0:
            continue
        actual = a if ca > cb else b
        bt_pred = a if s[a] >= s[b] else b
        n_ij, aw = matrix[(a, b)]
        maj_pred = a if aw * 2 >= n_ij else b
        w = want[day]
        w[0] += 1
        w[1] += 1 if bt_pred == actual else 0
        w[2] += 1 if maj_pred == actual else 0
    assert got == {
        day: (
            w[0],
            w[1],
            w[2],
            w[1] * MICRO // w[0],
            w[2] * MICRO // w[0],
        )
        for day, w in want.items()
    }


@settings(max_examples=4, deadline=None, suppress_health_check=[
    HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=_events_strategy)
def test_streaming_episode_twin_equals_batch(spark, rows):
    """The multi-micro-batch state fold must equal the batch operator
    bit-for-bit on arbitrary event layouts (episodes spanning hour
    bands, NULL values, duplicate timestamps)."""
    from realtimedatawarehouse_self_spark.plans.curation import (
        episode_discounted_returns,
    )
    from realtimedatawarehouse_self_spark.plans.streaming_twins import (
        streaming_episode_return_twin,
    )

    d = tempfile.mkdtemp(prefix="sepiprop")
    ev = [(i, m, u, t, v) for i, (m, u, t, v) in enumerate(rows)]
    _write_events(d, ev)
    batch = sorted(
        map(tuple, episode_discounted_returns(spark, d).collect())
    )
    twin = sorted(
        map(tuple, streaming_episode_return_twin(spark, d).collect())
    )
    assert twin == batch


# ---------------------------------------------------------------------------
# Wave 36 recounts
# ---------------------------------------------------------------------------
@settings(**_SETTINGS)
@given(docs=_docs_strategy)
def test_mixture_sweep_matches_python(spark, docs):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        SWEEP_BUDGET,
        mixture_temperature_sweep,
    )

    d = tempfile.mkdtemp(prefix="sweepprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)
    got = {
        (r["tau_milli"], r["source"]): (
            r["tokens_available"],
            r["w_micro"],
            r["quota_tokens"],
        )
        for r in mixture_temperature_sweep(spark, d).collect()
    }

    toks = defaultdict(int)
    for _doc_id, text, _lg, src, _nc in rows:
        if text is None:
            continue
        toks[src] += len(_toks(text))
    funcs = {
        250: lambda c: math.sqrt(math.sqrt(float(c))),
        500: lambda c: math.sqrt(float(c)),
        750: lambda c: math.sqrt(float(c)) * math.sqrt(math.sqrt(float(c))),
        1000: lambda c: float(c),
    }
    want = {}
    for tau, f in funcs.items():
        ws = {src: math.floor(f(c) * 1000000.0) for src, c in toks.items()}
        tot = sum(ws.values())
        for src, c in toks.items():
            want[(tau, src)] = (
                c,
                ws[src],
                0 if tot == 0 else SWEEP_BUDGET * ws[src] // tot,
            )
    assert got == want


@settings(**_SETTINGS)
@given(docs=_docs_strategy)
def test_negative_sampling_matches_python(spark, docs):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        NEG_TABLE_V,
        negative_sampling_table,
    )

    d = tempfile.mkdtemp(prefix="negprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)
    got = {
        r["token"]: (r["ct"], r["rnk"], r["w_micro"], r["prob_micro"])
        for r in negative_sampling_table(spark, d).collect()
    }

    counts = Counter()
    for _doc_id, text, _lg, _src, _nc in rows:
        if text is None:
            continue
        counts.update(_toks(text))
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :NEG_TABLE_V
    ]
    ws = {
        tok: math.floor(
            math.sqrt(float(c)) * math.sqrt(math.sqrt(float(c))) * 1000000.0
        )
        for tok, c in top
    }
    tot = sum(ws.values())
    want = {
        tok: (c, rnk + 1, ws[tok], ws[tok] * 1000000 // tot)
        for rnk, (tok, c) in enumerate(top)
    }
    assert got == want


@settings(**_SETTINGS)
@given(docs=_docs_strategy)
def test_rake_matches_python(spark, docs):
    from realtimedatawarehouse_self_spark.plans.llm_ops import STOPWORDS
    from realtimedatawarehouse_self_spark.plans.mining import (
        RAKE_TOP_K,
        keyphrase_rake,
    )

    d = tempfile.mkdtemp(prefix="rakeprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)
    got = {
        (r["doc_id"], r["rnk"]): (r["phrase"], r["n_words"], r["score_micro"])
        for r in keyphrase_rake(spark, d).collect()
    }

    want = {}
    for doc_id, text, _lg, _src, _nc in rows:
        if text is None:
            continue
        toks = _toks(text)
        # islands of consecutive non-stopword tokens
        islands, cur = [], []
        for t in toks:
            if t in STOPWORDS:
                if cur:
                    islands.append(cur)
                cur = []
            else:
                cur.append(t)
        if cur:
            islands.append(cur)
        if not islands:
            continue
        freq, deg = Counter(), Counter()
        for isl in islands:
            for t in isl:
                freq[t] += 1
                deg[t] += len(isl)
        wscore = {t: deg[t] * MICRO // freq[t] for t in freq}
        phrases = {}
        for isl in islands:
            phrases[" ".join(isl)] = (
                len(isl),
                sum(wscore[t] for t in isl),
            )
        ranked = sorted(
            phrases.items(), key=lambda kv: (-kv[1][1], kv[0])
        )[:RAKE_TOP_K]
        for rnk, (phrase, (L, sc)) in enumerate(ranked, 1):
            want[(doc_id, rnk)] = (phrase, L, sc)
    assert got == want
