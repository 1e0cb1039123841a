"""Property-based third opinions for the round-9 web-corpus operators.

Same discipline as test_wave22/24/25_property.py: hypothesis fixtures vs
pure-Python recounts, a reference independent of BOTH the Spark plans and
the DuckDB oracles. Focus:

- `html_text_extraction`: block re-flow (12-word paragraphs), the
  jusText-style >=5-word density filter, and the page-length accounting,
  recounted by rebuilding the synthetic page in Python;
- `domain_frequency_cap`: canonical-URL string building and the
  (n_chars DESC, doc_id) per-host keep-set under a small cap;
- `tokenizer_vocab_coverage`: per-lang OOV math vs collections.Counter
  with the (count DESC, token ASC) top-V tie order;
- `epoch_shard_plan`: md5 shard assignment vs hashlib;
- `warc_record_parse`: the Content-Length truncation check, including
  the empty-body edge (truncating an empty body is still valid);
- `streaming_domain_cap_twin`: the stateful first-K admission across
  REAL micro-batches vs the batch row_number recount.
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

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_WORDS = ["spark", "join", "merge", "row", "batch", "the", "a", ""]
_LANGS = ["en", "de", "zh"]
_SRCS = ["srcA", "srcB"]


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


def _docs_strategy(allow_null_text=True):
    text = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(
        " ".join
    )
    if allow_null_text:
        text = st.one_of(st.none(), text)
    return st.lists(
        st.tuples(
            text,
            st.sampled_from(_LANGS),
            st.sampled_from(_SRCS),
            st.integers(0, 500),
        ),
        min_size=1,
        max_size=25,
    )


@settings(**_SETTINGS)
@given(docs=_docs_strategy())
def test_html_extraction_matches_python_rebuild(spark, docs):
    from realtimedatawarehouse_self_spark.functions import webtext as wt
    from realtimedatawarehouse_self_spark.plans.python_path import (
        html_text_extraction,
    )

    d = tempfile.mkdtemp(prefix="htmlprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)

    got = {
        r["doc_id"]: (
            r["n_blocks"],
            r["kept_blocks"],
            r["html_chars"],
            r["content_chars"],
            r["extracted_text"],
        )
        for r in html_text_extraction(spark, d).collect()
    }

    import re

    want = {}
    for doc_id, text, _lg, src, _nc in rows:
        if text is None:
            continue
        words = text.split(" ")  # preserves empties, like F.split
        n_blocks = math.ceil(len(words) / wt.PARA_WORDS)
        paras = []
        for i in range(n_blocks):
            raw = " ".join(words[i * wt.PARA_WORDS : (i + 1) * wt.PARA_WORDS])
            if i % 2 == 0:
                raw = re.sub(
                    r"^(\S+)", f'<a href="#p{i}">\\1</a>', raw, count=1
                )
            paras.append(raw)
        html = (
            wt.HEAD_PRE
            + (src or "")
            + wt.HEAD_POST
            + wt.NAV
            + "<p>"
            + "</p><p>".join(paras)
            + "</p>"
            + wt.AD
            + wt.FOOT
        )
        kept = []
        for p in paras:
            plain = re.sub(r"<[^>]+>", "", p)
            if len(plain.split()) >= wt.MIN_BLOCK_WORDS:
                kept.append(plain)
        ext = " ".join(kept)
        want[doc_id] = (n_blocks, len(kept), len(html), len(ext), ext)
    assert got == want


@settings(**_SETTINGS)
@given(docs=_docs_strategy())
def test_domain_cap_matches_python_keepset(spark, docs):
    from realtimedatawarehouse_self_spark.plans import corpus_ops as co

    d = tempfile.mkdtemp(prefix="capprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)

    old = co.DOMAIN_CAP
    co.DOMAIN_CAP = 3  # small cap so it binds on tiny fixtures
    try:
        got = {
            r["doc_id"]: (r["host"], r["canonical_url"], r["host_rank"])
            for r in co.domain_frequency_cap(spark, d).collect()
        }
    finally:
        co.DOMAIN_CAP = old

    per_host = defaultdict(list)
    for doc_id, text, lg, src, nc in rows:
        if text is None:
            continue
        host = (src or "").lower() + ".example.com"
        per_host[host].append((doc_id, lg, nc))
    want = {}
    for host, lst in per_host.items():
        lst.sort(key=lambda r: (-r[2], r[0]))
        for rank, (doc_id, lg, _nc) in enumerate(lst[:3], start=1):
            canon = f"https://{host}/Articles/{doc_id}?ref={lg or ''}"
            want[doc_id] = (host, canon, rank)
    assert got == want


@settings(**_SETTINGS)
@given(docs=_docs_strategy())
def test_vocab_coverage_matches_counter(spark, docs):
    from realtimedatawarehouse_self_spark.plans import corpus_ops as co

    d = tempfile.mkdtemp(prefix="vocabprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)

    got = {
        r["lang"]: (
            r["total_tokens"],
            r["invocab_tokens"],
            r["oov_tokens"],
            r["coverage_micro"],
            r["vocab_hits"],
        )
        for r in co.tokenizer_vocab_coverage(spark, d).collect()
    }

    per_lang = defaultdict(Counter)
    for _i, text, lg, _s, _nc in rows:
        if text is None or lg is None:
            continue
        per_lang[lg].update(w for w in text.split(" ") if w != "")
    glob = Counter()
    for c in per_lang.values():
        glob.update(c)
    vocab = {
        t
        for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[
            : co.VOCAB_TOP_V
        ]
    }
    want = {}
    for lg, c in per_lang.items():
        total = sum(c.values())
        if total == 0:
            continue  # a lang whose docs are all empty emits no tokens
        inv = sum(n for t, n in c.items() if t in vocab)
        hits = sum(1 for t in c if t in vocab)
        want[lg] = (total, inv, total - inv, inv * 1_000_000 // total, hits)
    assert got == want


@settings(**_SETTINGS)
@given(docs=_docs_strategy())
def test_epoch_shards_match_hashlib(spark, docs):
    from realtimedatawarehouse_self_spark.plans import corpus_ops as co

    d = tempfile.mkdtemp(prefix="shardprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)

    got = {
        r["shard_id"]: (
            r["n_docs"],
            r["n_chars_total"],
            r["min_doc_id"],
            r["max_doc_id"],
            r["share_micro"],
        )
        for r in co.epoch_shard_plan(spark, d).collect()
    }

    shards = defaultdict(list)
    for doc_id, text, _lg, _s, nc in rows:
        if text is None:
            continue
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
        shards[h % co.EPOCH_SHARDS].append((doc_id, nc))
    total = sum(len(v) for v in shards.values())
    want = {
        sid: (
            len(v),
            sum(nc for _d, nc in v),
            min(d_ for d_, _nc in v),
            max(d_ for d_, _nc in v),
            len(v) * 1_000_000 // total,
        )
        for sid, v in shards.items()
    }
    assert got == want


@settings(**_SETTINGS)
@given(docs=_docs_strategy())
def test_warc_validity_matches_python(spark, docs):
    from realtimedatawarehouse_self_spark.plans import corpus_ops as co

    d = tempfile.mkdtemp(prefix="warcprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)

    got = {
        r["doc_id"]: (
            r["warc_type"],
            r["target_uri"],
            r["content_length"],
            r["body_len"],
            r["is_valid"],
        )
        for r in co.warc_record_parse(spark, d).collect()
    }

    want = {}
    for doc_id, text, _lg, src, _nc in rows:
        if text is None:
            continue
        uri = f"https://{(src or '').lower()}.example.com/articles/{doc_id}"
        if doc_id % co.WARC_CORRUPT_MOD == 0:
            body_len = max(len(text) - 1, 0)
        else:
            body_len = len(text)
        want[doc_id] = (
            "response",
            uri,
            len(text),
            body_len,
            body_len == len(text),
        )
    assert got == want


@settings(max_examples=3, deadline=None, suppress_health_check=[
    HealthCheck.too_slow, HealthCheck.function_scoped_fixture,
])
@given(docs=_docs_strategy(allow_null_text=False))
def test_streaming_cap_twin_matches_batch_keepset(spark, docs):
    """The REAL multi-micro-batch stateful admission must equal the batch
    'first K per host by doc_id' statement regardless of how the ascending
    doc_id ranges slice into batches."""
    from realtimedatawarehouse_self_spark.plans import corpus_ops as co
    from realtimedatawarehouse_self_spark.plans.streaming_twins import (
        streaming_domain_cap_twin,
    )

    d = tempfile.mkdtemp(prefix="domcaptwinprop")
    rows = [(i, t, lg, s, nc) for i, (t, lg, s, nc) in enumerate(docs)]
    _write_docs(d, rows)

    old = co.DOMAIN_CAP
    co.DOMAIN_CAP = 3
    try:
        got = {
            (r["host"], r["doc_id"]): r["admit_seq"]
            for r in streaming_domain_cap_twin(spark, d).collect()
        }
    finally:
        co.DOMAIN_CAP = old

    per_host = defaultdict(list)
    for doc_id, _t, _lg, src, _nc in rows:
        host = (src or "").lower() + ".example.com"
        per_host[host].append(doc_id)
    want = {}
    for host, ids in per_host.items():
        for seq, doc_id in enumerate(sorted(ids)[:3], start=1):
            want[(host, doc_id)] = seq
    assert got == want
