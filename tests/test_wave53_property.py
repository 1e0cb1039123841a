"""Property-based third opinions for the round-10 wave-53 operators.

- `memorization_risk_audit`: constructed corpora pin the scoring rule —
  exact copies earn 4 points each (capped at 4), a fully-duplicated doc
  earns the >=50% span points, a unique doc scores 'minimal'; and on
  generated corpora the exact-dup leg is recounted in pure Python (the
  span leg is pinned by the wave-37 span properties — this suite checks
  the composition arithmetic on top of it).
- `tokenizer_parity_audit`: full pure-Python recount (per-lang char /
  token masses, pivot pick by max token mass with lang tie-break, the
  two chained integer micro-divisions), plus the invariant that the
  pivot language's premium is exactly 1_000_000.
"""

from __future__ import annotations

import os
import tempfile
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_WORDS = [f"w{i}" for i in range(15)]


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


def test_memorization_risk_scoring_pins(spark):
    """Three exact copies of a long unique-ish text -> each copy has
    exact_dups = 2 (8 points) AND is fully span-duplicated against its
    copies (8 points) -> 16 points, 'critical'. A doc sharing no
    content scores 0 points, 'minimal'."""
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        SPAN_MIN_LEN,
        memorization_risk_audit,
    )

    copy_text = " ".join(f"c{i}" for i in range(SPAN_MIN_LEN + 10))
    unique_text = " ".join(f"u{i}" for i in range(SPAN_MIN_LEN + 10))
    d = tempfile.mkdtemp(prefix="memrisk")
    _write_docs(
        d,
        [
            (1, copy_text, "en"),
            (2, copy_text, "en"),
            (3, copy_text, "en"),
            (4, unique_text, "en"),
        ],
    )
    got = {
        r["doc_id"]: (
            r["exact_dups"],
            r["span_dup_micro"],
            r["risk_points"],
            r["risk_bucket"],
        )
        for r in memorization_risk_audit(spark, d).collect()
    }
    for did in (1, 2, 3):
        xd, sdm, pts, bucket = got[did]
        assert xd == 2
        assert sdm == 1_000_000  # whole doc inside a verified span
        assert pts == 16 and bucket == "critical"
    assert got[4] == (0, 0, 0, "minimal")


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 9999),
            st.integers(0, 3),  # text template id -> forced dup groups
        ),
        min_size=2,
        max_size=12,
        unique_by=lambda r: r[0],
    )
)
def test_memorization_exact_leg_matches_python(spark, docs):
    """Short texts (below SPAN_MIN_LEN tokens) produce NO span evidence,
    so risk_points must be exactly 4 * min(exact_dups, 4) — recounted in
    Python from the template multiplicities."""
    from realtimedatawarehouse_self_spark.plans.retrieval import (
        SPAN_MIN_LEN,
        memorization_risk_audit,
    )

    n_tok = max(2, SPAN_MIN_LEN // 4)
    texts = {
        t: " ".join(f"t{t}x{i}" for i in range(n_tok)) for t in range(4)
    }
    d = tempfile.mkdtemp(prefix="memexact")
    _write_docs(d, [(did, texts[t], "en") for did, t in docs])
    got = {
        r["doc_id"]: (
            r["exact_dups"],
            r["dup_tokens"],
            r["risk_points"],
        )
        for r in memorization_risk_audit(spark, d).collect()
    }
    counts = defaultdict(int)
    for _did, t in docs:
        counts[t] += 1
    want = {
        did: (counts[t] - 1, 0, 4 * min(counts[t] - 1, 4))
        for did, t in docs
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 9999),
            st.lists(st.sampled_from(_WORDS), max_size=10).map(
                " ".join
            ),
            st.sampled_from(["en", "de", "fr"]),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda r: r[0],
    )
)
def test_tokenizer_parity_matches_python_recount(spark, docs):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        tokenizer_parity_audit,
    )

    d = tempfile.mkdtemp(prefix="tokpar")
    _write_docs(d, docs)
    rows = tokenizer_parity_audit(spark, d).collect()
    got = {
        r["lang"]: (
            r["n_docs"],
            r["chars_total"],
            r["tokens_total"],
            r["chars_per_tok_micro"],
            r["pivot_lang"],
            r["premium_micro"],
        )
        for r in rows
    }
    agg = defaultdict(lambda: [0, 0, 0])
    for _did, text, lang in docs:
        a = agg[lang]
        a[0] += 1
        a[1] += len(text)
        a[2] += len([t for t in text.split(" ") if t])
    agg = {k: v for k, v in agg.items() if v[2] > 0}
    want = {}
    if agg:
        pivot = min(agg, key=lambda k: (-agg[k][2], k))
        p_cpt = agg[pivot][1] * 1_000_000 // agg[pivot][2]
        for lang, (n, ch, tk) in agg.items():
            cpt = ch * 1_000_000 // tk
            want[lang] = (
                n,
                ch,
                tk,
                cpt,
                pivot,
                p_cpt * 1_000_000 // cpt,
            )
    assert got == want
    if want:
        assert got[min(agg, key=lambda k: (-agg[k][2], k))][5] == 1_000_000
