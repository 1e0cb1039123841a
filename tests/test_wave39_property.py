"""Property-based third opinions for the round-10 wave-39 operators.

Same discipline as test_wave22..37_property.py: hypothesis fixtures vs
pure-Python recounts independent of BOTH the Spark plans and the DuckDB
oracles.

- `bleu_ngram_eval`: clipped 1..4-gram precisions via collections.Counter
  against the per-(source, lang) lowest-doc_id reference, GM via
  math.sqrt(math.sqrt(...)) in the identical multiply order;
- `cdc_chunk_dedup`: boundary selection (md5 first hex), chunk slicing,
  and dup-mass accounting with plain Python loops; plus the SHIFT
  INVARIANCE pin that motivates CDC over fixed windows — prepending a
  prefix to a copy must leave the copied content's chunk hashes intact
  (all chunks after the first boundary are shared).
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

from realtimedatawarehouse_self_spark.plans.retrieval import (
    CDC_CUT_HEX,
    CDC_K,
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
_SRCS = ["srcA", "srcB"]


def _write_docs(d: str, rows) -> None:
    # rows: (text_or_None, source)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array([r[0] for r in rows], pa.string()),
                "lang": pa.array(["en"] * len(rows)),
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


_docs_strategy = st.lists(
    st.tuples(
        st.one_of(
            st.none(),
            st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(
                " ".join
            ),
        ),
        st.sampled_from(_SRCS),
    ),
    min_size=2,
    max_size=12,
)


def _bleu_recount(rows):
    toks = {i: _toks(t) for i, (t, _s) in enumerate(rows)}
    groups = defaultdict(list)
    for i, (t, s) in enumerate(rows):
        if len(toks[i]) >= 4:
            groups[(s, "en")].append(i)
    out = {}
    for (_s, _l), ids in groups.items():
        ref = min(ids)
        rc = {
            n: Counter(
                tuple(toks[ref][i : i + n])
                for i in range(len(toks[ref]) - n + 1)
            )
            for n in range(1, 5)
        }
        for d in ids:
            if d == ref:
                continue
            clips, tots, ps = [], [], []
            for n in range(1, 5):
                cc = Counter(
                    tuple(toks[d][i : i + n])
                    for i in range(len(toks[d]) - n + 1)
                )
                clip = sum(min(ct, rc[n][g]) for g, ct in cc.items())
                tot = sum(cc.values())
                clips.append(clip)
                tots.append(tot)
                ps.append(clip / tot)
            gm = math.sqrt(math.sqrt((ps[0] * ps[1]) * (ps[2] * ps[3])))
            out[d] = (
                ref,
                len(toks[d]),
                len(toks[ref]),
                *clips,
                math.floor(gm * 1000000.0),
                len(toks[d]) < len(toks[ref]),
                len(toks[ref]) * 1000000 // len(toks[d]),
            )
    return out


@settings(**_SETTINGS)
@given(rows=_docs_strategy)
def test_bleu_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.curation import (
        bleu_ngram_eval,
    )

    d = tempfile.mkdtemp(prefix="bleuprop")
    _write_docs(d, rows)
    got = {
        r["doc_id"]: (
            r["ref_doc_id"],
            r["cand_len"],
            r["ref_len"],
            r["clip1"],
            r["clip2"],
            r["clip3"],
            r["clip4"],
            r["bleu_micro"],
            r["bp_applies"],
            r["len_ratio_micro"],
        )
        for r in bleu_ngram_eval(spark, d).collect()
    }
    assert got == _bleu_recount(rows)


def _cdc_chunks(toks):
    """Pure-Python CDC chunker: list of (chunk_len, chunk_md5)."""
    K = CDC_K
    if len(toks) < K:
        return []
    cuts = [
        b + K - 1
        for b in range(1, len(toks) - K + 2)
        if hashlib.md5(
            " ".join(toks[b - 1 : b - 1 + K]).encode()
        ).hexdigest()[0]
        in CDC_CUT_HEX
    ]
    cuts = [c for c in cuts if c < len(toks)]
    bounds = [0] + cuts + [len(toks)]
    return [
        (
            bounds[i + 1] - bounds[i],
            hashlib.md5(
                " ".join(toks[bounds[i] : bounds[i + 1]]).encode()
            ).hexdigest(),
        )
        for i in range(len(bounds) - 1)
    ]


def _cdc_recount(rows):
    toks = {i: _toks(t) for i, (t, _s) in enumerate(rows)}
    per_doc = {i: _cdc_chunks(t) for i, t in toks.items() if len(t) >= CDC_K}
    docs_per_hash = defaultdict(set)
    for d, chunks in per_doc.items():
        for _ln, h in chunks:
            docs_per_hash[h].add(d)
    out = {}
    for d, chunks in per_doc.items():
        n = len(chunks)
        tot = sum(ln for ln, _h in chunks)
        dup = sum(1 for _ln, h in chunks if len(docs_per_hash[h]) >= 2)
        dup_tok = sum(
            ln for ln, h in chunks if len(docs_per_hash[h]) >= 2
        )
        out[d] = (n, tot, dup, dup_tok, dup_tok * 1000000 // tot)
    return out


@settings(**_SETTINGS)
@given(rows=_docs_strategy)
def test_cdc_chunks_match_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        cdc_chunk_dedup,
    )

    d = tempfile.mkdtemp(prefix="cdcprop")
    _write_docs(d, rows)
    got = {
        r["doc_id"]: (
            r["n_chunks"],
            r["total_tokens"],
            r["dup_chunks"],
            r["dup_tokens"],
            r["dup_mass_micro"],
        )
        for r in cdc_chunk_dedup(spark, d).collect()
    }
    assert got == _cdc_recount(rows)


def test_cdc_is_shift_invariant(spark):
    """The property fixed-window span hashing lacks and CDC exists for:
    duplicate a document with an arbitrary-length prefix prepended, and
    every chunk of the copy AFTER the first content-defined boundary has
    an identical hash to the original's — so the dup accounting sees the
    shifted duplicate."""
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        cdc_chunk_dedup,
    )

    base = [_WORDS[(i * 5) % 12] for i in range(60)]
    shifted = ["zzz1", "zzz2", "zzz3"] + base
    d = tempfile.mkdtemp(prefix="cdcshift")
    _write_docs(d, [(" ".join(base), "srcA"), (" ".join(shifted), "srcA")])
    rows = {r["doc_id"]: r for r in cdc_chunk_dedup(spark, d).collect()}
    # python-side: chunks of both docs after their first boundary align
    c0 = _cdc_chunks(base)
    c1 = _cdc_chunks(shifted)
    shared = {h for _ln, h in c0[1:]} & {h for _ln, h in c1[1:]}
    assert shared, "fixture must produce at least one aligned chunk"
    assert rows[0]["dup_chunks"] >= len(shared)
    assert rows[1]["dup_chunks"] >= len(shared)


@settings(max_examples=3, deadline=None, suppress_health_check=[
    HealthCheck.too_slow, HealthCheck.function_scoped_fixture])
@given(rows=_docs_strategy)
def test_streaming_chunk_owner_equals_batch(spark, rows):
    """The 24th twin's multi-batch election must equal the pure-Python
    chunk recount: owner = lowest doc_id per duplicated chunk hash,
    distinct-doc and occurrence counts exact — whatever the doc_id
    banding splits into micro-batches."""
    from realtimedatawarehouse_self_spark.plans.streaming_twins import (
        streaming_chunk_owner_twin,
    )

    d = tempfile.mkdtemp(prefix="chunkown")
    _write_docs(d, rows)
    toks = {i: _toks(t) for i, (t, _s) in enumerate(rows)}
    occ = defaultdict(list)
    for doc, t in toks.items():
        for _ln, h in _cdc_chunks(t):
            occ[h].append(doc)
    want = {
        h: (min(ds), len(set(ds)), len(ds))
        for h, ds in occ.items()
        if len(set(ds)) >= 2
    }
    got = {
        r["chunk_md5"]: (r["owner_doc"], r["n_docs"], r["n_occurrences"])
        for r in streaming_chunk_owner_twin(spark, d).collect()
    }
    assert got == want
