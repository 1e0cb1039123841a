"""Property-based third opinions for the round-8 wave-24 operators.

Same discipline as test_wave22_property.py: hypothesis-generated
fixtures compared against few-line pure-Python recounts — a reference
independent of both Spark and the DuckDB oracle. Focus:

- `pass_at_k_estimator`: the binomial identity itself — the engine
  evaluates falling-factorial products, the recount uses math.comb, so
  an algebra slip in either derivation diverges;
- `annotator_agreement_kappa`: the chance-correction rational including
  NEGATIVE kappas (truncation toward zero, not floor) and the pe=1
  degenerate NULL;
- `conformal_calibration_audit`: the order-statistic threshold under the
  (score, event_id) total order and the md5 user split;
- `incremental_join_maintenance`: the four-term delta decomposition must
  equal a direct Python join for ANY table contents;
- `multimodal_phash_dedup`: the banding pigeonhole (Hamming <= 3 pairs
  MUST share a band) plus exact-duplicate payloads surfacing as
  hamming-0 dup pairs through the real Arrow path.
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

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

MICRO = 1_000_000


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark `div` / DuckDB `//`."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def _write_events(d: str, rows) -> None:
    # rows: (event_id, user, etype, value)
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [base + dt.timedelta(minutes=r[0]) for r in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([r[3] for r in rows], pa.float64()),
                "props": pa.array([None] * len(rows), pa.string()),
            }
        ),
        os.path.join(d, "events.parquet"),
    )


def _write_documents(d: str, rows) -> None:
    # rows: (doc_id, text, lang, source)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "source": pa.array([r[3] for r in rows]),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def _cents(v: float) -> int:
    return int(math.floor(v * 100 + 0.5))


@settings(**_SETTINGS)
@given(
    ev=st.lists(
        st.tuples(
            st.integers(1, 4),  # user
            st.sampled_from(["view", "purchase"]),
            st.floats(1.0, 99.0, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_pass_at_k_matches_math_comb(spark, ev):
    from realtimedatawarehouse_self_spark.plans.experiment import (
        PASS_K,
        PASS_THRESH_CENTS,
        pass_at_k_estimator,
    )

    d = tempfile.mkdtemp(prefix="passkprop")
    rows = [(i, u, t, float(v)) for i, (u, t, v) in enumerate(ev)]
    _write_events(d, rows)

    got = {
        r["event_type"]: (
            r["n_users"],
            r["n_eligible_k"],
            r["pass_at_1_micro"],
            r[f"pass_at_{PASS_K}_micro"],
        )
        for r in pass_at_k_estimator(spark, d).collect()
    }

    per = defaultdict(lambda: [0, 0])  # (etype, user) -> [n, c]
    for _i, u, t, v in rows:
        per[(t, u)][0] += 1
        per[(t, u)][1] += int(_cents(v) >= PASS_THRESH_CENTS)
    want = {}
    by_type = defaultdict(list)
    for (t, _u), (n, c) in per.items():
        by_type[t].append((n, c))
    for t, groups in by_type.items():
        p1s = [c * MICRO // n for n, c in groups]
        pks = []
        for n, c in groups:
            if n < PASS_K:
                continue
            # independent derivation: math.comb, not falling factorials
            num = math.comb(n - c, PASS_K) if n - c >= PASS_K else 0
            den = math.comb(n, PASS_K)
            pks.append((den - num) * MICRO // den)
        want[t] = (
            len(groups),
            len(pks),
            sum(p1s) // len(p1s),
            (sum(pks) // len(pks)) if pks else None,
        )
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(1, 12),  # word count -> length label
            st.integers(1, 3),  # distinct word pool size
            st.sampled_from(["s0", "s1"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_kappa_matches_exact_rational(spark, docs, monkeypatch):
    from realtimedatawarehouse_self_spark.plans import experiment as X

    # tiny texts: lower the length rule so label A actually varies
    monkeypatch.setattr(X, "KAPPA_LEN_THRESH", 12)

    d = tempfile.mkdtemp(prefix="kappaprop")
    rows = []
    for i, (n_words, pool, src) in enumerate(docs):
        words = [f"w{j % pool}" for j in range(n_words)]
        rows.append((i, " ".join(words), "en", src))
    _write_documents(d, rows)

    got = {
        r["source"]: (r["n_docs"], r["n11"], r["n00"], r["kappa_micro"])
        for r in X.annotator_agreement_kappa(spark, d).collect()
    }

    cells = defaultdict(lambda: [0, 0, 0, 0, 0])  # src -> N,n11,n00,n10,n01
    for _i, text, _lang, src in rows:
        toks = [t for t in text.split(" ") if t]
        a = int(len(text) >= 12)
        b = int(len(set(toks)) * X.KAPPA_DIV_DEN >= len(toks) * X.KAPPA_DIV_NUM)
        c = cells[src]
        c[0] += 1
        c[1] += a and b
        c[2] += (not a) and (not b)
        c[3] += a and (not b)
        c[4] += (not a) and b
    want = {}
    for src, (n, n11, n00, n10, n01) in cells.items():
        pe_num = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
        den = n * n - pe_num
        kappa = (
            _trunc_div((n * (n11 + n00) - pe_num) * MICRO, den)
            if den != 0
            else None
        )
        want[src] = (n, n11, n00, kappa)
    assert got == want


@settings(**_SETTINGS)
@given(
    ev=st.lists(
        st.tuples(
            st.integers(1, 6),  # user
            st.sampled_from(["view", "purchase"]),
            st.floats(0.5, 200.0, allow_nan=False, width=32),
        ),
        min_size=4,
        max_size=40,
    )
)
def test_conformal_threshold_and_coverage_match_python(spark, ev):
    from realtimedatawarehouse_self_spark.plans.experiment import (
        CONFORMAL_ALPHA_DEN,
        CONFORMAL_ALPHA_NUM,
        conformal_calibration_audit,
    )

    d = tempfile.mkdtemp(prefix="confprop")
    rows = [(i, u, t, float(v)) for i, (u, t, v) in enumerate(ev)]
    _write_events(d, rows)

    got = {
        r["event_type"]: (
            r["n_cal"],
            r["n_test"],
            r["q_rank"],
            r["threshold_cents"],
            r["coverage_micro"],
        )
        for r in conformal_calibration_audit(spark, d).collect()
    }

    def is_cal(user: int) -> bool:
        h = hashlib.md5(str(user).encode()).hexdigest()
        return int(h[:15], 16) % 5 < 2

    by_type = defaultdict(lambda: {"cal": [], "test": []})
    for i, u, t, v in rows:
        by_type[t]["cal" if is_cal(u) else "test"].append((i, _cents(v)))
    want = {}
    for t, s in by_type.items():
        if not s["cal"] or not s["test"]:
            continue  # inner joins drop the type on both engines
        n_cal = len(s["cal"])
        mean = sum(c for _i, c in s["cal"]) // n_cal
        cal_scores = sorted(
            (abs(c - mean), i) for i, c in s["cal"]
        )
        keep = CONFORMAL_ALPHA_DEN - CONFORMAL_ALPHA_NUM
        q_rank = ((n_cal + 1) * keep + CONFORMAL_ALPHA_DEN - 1) // (
            CONFORMAL_ALPHA_DEN
        )
        thr = cal_scores[min(q_rank, n_cal) - 1][0]
        test_scores = [abs(c - mean) for _i, c in s["test"]]
        cov = sum(x <= thr for x in test_scores) * MICRO // len(test_scores)
        want[t] = (n_cal, len(s["test"]), q_rank, thr, cov)
    assert got == want


@settings(**_SETTINGS)
@given(
    orders=st.lists(
        st.tuples(
            st.integers(1, 40),  # orderkey
            st.integers(1, 8),  # custkey
            st.floats(1.0, 900.0, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda o: o[0],
    ),
    custs=st.lists(
        st.tuples(st.integers(1, 8), st.integers(0, 3)),  # custkey, nation
        min_size=1,
        max_size=8,
        unique_by=lambda c: c[0],
    ),
)
def test_ivm_delta_merge_equals_direct_join(spark, orders, custs):
    import datetime as dt

    from realtimedatawarehouse_self_spark.plans.state_ops import (
        IVM_CUST_MOD,
        IVM_ORDER_MOD,
        incremental_join_maintenance,
    )

    d = tempfile.mkdtemp(prefix="ivmprop")
    base = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([o[0] for o in orders], pa.int64()),
                "o_custkey": pa.array([o[1] for o in orders], pa.int64()),
                "o_orderstatus": pa.array(["F"] * len(orders)),
                "o_totalprice": pa.array(
                    [float(o[2]) for o in orders], pa.float64()
                ),
                "o_orderdate": pa.array(
                    [base] * len(orders), pa.timestamp("us")
                ),
                "o_orderpriority": pa.array(["1-URGENT"] * len(orders)),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([c[0] for c in custs], pa.int64()),
                "c_name": pa.array([f"c{c[0]}" for c in custs]),
                "c_nationkey": pa.array([c[1] for c in custs], pa.int32()),
                "c_acctbal": pa.array([0.0] * len(custs), pa.float64()),
                "c_mktsegment": pa.array(["BUILDING"] * len(custs)),
            }
        ),
        os.path.join(d, "customer.parquet"),
    )

    got = {
        r["c_nationkey"]: (r["n_orders"], r["total_cents"], r["n_partials"])
        for r in incremental_join_maintenance(spark, d).collect()
    }

    nation = dict(custs)
    agg = defaultdict(lambda: [0, 0, set()])
    for ok, ck, price in orders:
        if ck not in nation:
            continue
        a = agg[nation[ck]]
        a[0] += 1
        a[1] += _cents(float(price))
        a[2].add((ok % IVM_ORDER_MOD == 0, ck % IVM_CUST_MOD == 0))
    want = {n: (a[0], a[1], len(a[2])) for n, a in agg.items()}
    assert got == want


def test_phash_band_pigeonhole_and_exact_dups(spark):
    """Two guarantees of the dHash design: (a) pure-math pigeonhole — any
    pair within Hamming distance PHASH_BANDS - 1 shares at least one of
    the PHASH_BANDS bands, so the candidate join cannot miss them; (b)
    end-to-end — exact duplicate payloads produce hamming-0 dup pairs
    through the real Arrow hash path."""
    import itertools
    import random

    from realtimedatawarehouse_self_spark.plans.python_path import (
        PHASH_BAND_BITS,
        PHASH_BANDS,
        multimodal_phash_dedup,
    )

    # (a) randomized pigeonhole check over the actual band arithmetic
    rng = random.Random(24)
    mask = (1 << PHASH_BAND_BITS) - 1
    nbits = PHASH_BANDS * PHASH_BAND_BITS
    for _ in range(200):
        h1 = rng.getrandbits(nbits)
        flips = rng.sample(range(nbits), rng.randint(0, PHASH_BANDS - 1))
        h2 = h1
        for b in flips:
            h2 ^= 1 << b
        shared = any(
            (h1 >> (b * PHASH_BAND_BITS)) & mask
            == (h2 >> (b * PHASH_BAND_BITS)) & mask
            for b in range(PHASH_BANDS)
        )
        assert shared, (h1, h2, flips)

    # (b) duplicates through the real pipeline
    d = tempfile.mkdtemp(prefix="phashprop")
    texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed",
    ]
    rows = []
    i = 0
    for t in texts:
        for _copy in range(2):  # two exact copies of each payload
            rows.append((i, t, "en", "s0"))
            i += 1
    _write_documents(d, rows)
    out = {
        r["band_idx"]: r for r in multimodal_phash_dedup(spark, d).collect()
    }
    total_dups = sum(r["n_dup_pairs"] for r in out.values())
    # each duplicated text contributes exactly one hamming-0 pair unless
    # two different texts also collide; at minimum the 3 exact pairs land
    assert total_dups >= len(texts)
    assert any(
        r["min_hamming"] == 0 for r in out.values()
    ), "exact duplicates must surface as hamming-0 somewhere"


def test_passk_numerator_guard_full_success_and_failure(spark):
    """Degenerate endpoints: all attempts succeed (pass@k = 1.0) and all
    fail (pass@k = 0) — the CASE guard for n-c < k must fire exactly."""
    from realtimedatawarehouse_self_spark.plans.experiment import (
        PASS_K,
        pass_at_k_estimator,
    )

    d = tempfile.mkdtemp(prefix="passkedge")
    rows = []
    # user 1: six successes (value 99 -> cents 9900 >= 5000)
    rows += [(i, 1, "click", 99.0) for i in range(6)]
    # user 2: six failures
    rows += [(10 + i, 2, "click", 1.0) for i in range(6)]
    _write_events(d, rows)
    out = {r["event_type"]: r for r in pass_at_k_estimator(spark, d).collect()}
    r = out["click"]
    assert r["n_users"] == 2 and r["n_eligible_k"] == 2
    # mean of [1.0, 0.0] in micro
    assert r["pass_at_1_micro"] == MICRO // 2
    assert r[f"pass_at_{PASS_K}_micro"] == MICRO // 2


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(1, 6),  # words per doc
            st.integers(1, 4),  # word pool size
            st.sampled_from(["en", "de"]),
            st.sampled_from(["s0", "s1"]),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_dsir_selection_matches_python_replay(spark, docs):
    """Recount the smoothed-odds scoring, the lower-median threshold
    under the (score, doc_id) total order, and the per-source yield."""
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        DSIR_TARGET_LANG,
        importance_weight_selection,
    )

    d = tempfile.mkdtemp(prefix="dsirprop")
    rows = []
    for i, (n_words, pool, lang, src) in enumerate(docs):
        words = [f"w{(i + j) % pool}" for j in range(n_words)]
        rows.append((i, " ".join(words), lang, src))
    _write_documents(d, rows)

    got = {
        r["source"]: (
            r["n_docs"],
            r["n_selected"],
            r["avg_score_micro"],
            r["sel_ppm"],
        )
        for r in importance_weight_selection(spark, d).collect()
    }

    occ = []  # (doc_id, source, word, is_target)
    for i, text, lang, src in rows:
        for w in text.split(" "):
            if w:
                occ.append((i, src, w, lang == DSIR_TARGET_LANG))
    raw_ct, tgt_ct = defaultdict(int), defaultdict(int)
    for _i, _s, w, t in occ:
        raw_ct[w] += 1
        tgt_ct[w] += int(t)
    r_tot, t_tot, v = sum(raw_ct.values()), sum(tgt_ct.values()), len(raw_ct)
    odds = {
        w: (tgt_ct[w] + 1) * (r_tot + v) * MICRO
        // ((raw_ct[w] + 1) * (t_tot + v))
        for w in raw_ct
    }
    per_doc = defaultdict(lambda: [0, 0, None])  # doc -> [sum, n, src]
    for i, s, w, _t in occ:
        per_doc[i][0] += odds[w]
        per_doc[i][1] += 1
        per_doc[i][2] = s
    scores = {i: (a // n, s) for i, (a, n, s) in per_doc.items()}
    ordered = sorted((sc, i) for i, (sc, _s) in scores.items())
    thr = ordered[(len(ordered) + 1) // 2 - 1][0]
    want = {}
    by_src = defaultdict(list)
    for i, (sc, s) in scores.items():
        by_src[s].append(sc)
    for s, scs in by_src.items():
        n = len(scs)
        nsel = sum(1 for x in scs if x >= thr)
        want[s] = (n, nsel, sum(scs) // n, nsel * MICRO // n)
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.lists(
                st.sampled_from(["ab", "abc", "aab", "bba", "cab"]),
                min_size=1,
                max_size=5,
            ),
            st.sampled_from(["en", "de"]),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_bpe_apply_fertility_matches_python_replay(spark, docs):
    """Recount the merge-table training (argmax under (ct DESC, lhs,
    rhs)) and its application to the distinct-word frame, including the
    leftmost non-overlapping replace's even-run under-merge."""
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        BPE_MERGE_ROUNDS,
        bpe_apply_fertility,
    )

    d = tempfile.mkdtemp(prefix="bpeprop")
    rows = [
        (i, " ".join(words), lang, "s0")
        for i, (words, lang) in enumerate(docs)
    ]
    _write_documents(d, rows)

    got = {
        r["lang"]: (
            r["n_vocab"],
            r["n_tokens"],
            r["sum_symbols"],
            r["fertility_micro"],
            r["compression_micro"],
        )
        for r in bpe_apply_fertility(spark, d).collect()
    }

    wl = defaultdict(int)  # (lang, word) -> freq
    for _i, text, lang, _s in rows:
        for w in text.split(" "):
            if w:
                wl[(lang, w)] += 1
    wf = defaultdict(int)
    for (_l, w), f in wl.items():
        wf[w] += f

    def sym0(w):
        return " " + " ".join(w) + " "

    vocab = {sym0(w): f for w, f in wf.items()}

    def top_pair(vb):
        cts = defaultdict(int)
        for sym, f in vb.items():
            parts = sym.split()
            for a, b in zip(parts, parts[1:]):
                cts[(a, b)] += f
        if not cts:
            return None
        return min((-n, a, b) for (a, b), n in cts.items())[1:]

    merges = []
    cur = dict(vocab)
    for _ in range(BPE_MERGE_ROUNDS):
        tp = top_pair(cur)
        if tp is None:
            break
        merges.append(tp)
        a, b = tp
        cur = {
            s.replace(f" {a} {b} ", f" {a}{b} "): f for s, f in cur.items()
        }

    def n_sym(w):
        s = sym0(w)
        for a, b in merges:
            s = s.replace(f" {a} {b} ", f" {a}{b} ")
        return len(s.split())

    want = {}
    per_lang = defaultdict(lambda: [0, 0, 0, 0])  # vocab,tok,sym,chars
    for (lang, w), f in wl.items():
        a = per_lang[lang]
        a[0] += 1
        a[1] += f
        a[2] += f * n_sym(w)
        a[3] += f * len(w)
    for lang, (nv, nt, ns, nc) in per_lang.items():
        want[lang] = (nv, nt, ns, ns * MICRO // nt, ns * MICRO // nc)
    assert got == want
