"""Property-based third opinions for the round-10 wave-50 operators.

- `synthetic_watermark_detect`: full pure-Python recount of the
  Kirchenbauer greenlist statistic (hashlib md5 transition hashes,
  integer 4g-T numerator, the single double division floored to micro)
  on generated documents, plus constructed all-green / all-red token
  chains pinning the watermarked/clean decision boundary;
- `dpo_pair_extraction`: per-prompt recount of the max-margin pair
  selection, the deterministic tie-break, and the margin floor.
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

from realtimedatawarehouse_self_spark.plans.corpus_ops import (
    WM_Z_KEEP_MICRO,
)
from realtimedatawarehouse_self_spark.plans.curation import DPO_MARGIN_MIN

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_WORDS = [f"w{i}" for i in range(25)]


def _green(prev: str, cur: str) -> bool:
    return hashlib.md5(f"{prev}|{cur}".encode()).hexdigest()[0] < "4"


def _write_docs(d, docs):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array(["en"] * len(docs)),
                "source": pa.array(["s"] * len(docs)),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in docs], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )


def _wm_want(text: str):
    toks = [t for t in text.split(" ") if t]
    scored = max(len(toks) - 1, 0)
    green = sum(
        _green(toks[i - 1], toks[i]) for i in range(1, len(toks))
    )
    if scored == 0:
        zm = 0
    else:
        zm = math.floor(
            (4 * green - scored) / math.sqrt(3.0 * scored) * 1_000_000
        )
    verdict = "watermarked" if zm >= WM_Z_KEEP_MICRO else "clean"
    return scored, green, zm, verdict


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 9999),
            st.lists(st.sampled_from(_WORDS), max_size=30).map(
                " ".join
            ),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda r: r[0],
    )
)
def test_watermark_detect_matches_python_recount(spark, docs):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        synthetic_watermark_detect,
    )

    d = tempfile.mkdtemp(prefix="wmprop")
    _write_docs(d, docs)
    got = {
        r["doc_id"]: (
            r["scored"],
            r["green"],
            r["z_micro"],
            r["verdict"],
        )
        for r in synthetic_watermark_detect(spark, d).collect()
    }
    want = {doc_id: _wm_want(text) for doc_id, text in docs}
    assert got == want


def _chain(start: str, n: int, want_green: bool) -> str:
    """Greedy token chain whose every transition is (non-)green."""
    toks = [start]
    while len(toks) < n:
        nxt = next(
            w
            for w in _WORDS
            if _green(toks[-1], w) is want_green
        )
        toks.append(nxt)
    return " ".join(toks)


def test_watermark_decision_boundary_pin(spark):
    """A 60-token all-green chain has z = (4T - T)/sqrt(3T) = sqrt(3T)
    = sqrt(177) ~ 13.3 >> 4 -> watermarked; an all-red chain of the same
    length scores z = -sqrt(T/3) < 0 -> clean; and a single-token /
    empty / whitespace-only doc hits the scored=0 guard."""
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        synthetic_watermark_detect,
    )

    d = tempfile.mkdtemp(prefix="wmpin")
    _write_docs(
        d,
        [
            (1, _chain("w0", 60, True)),
            (2, _chain("w0", 60, False)),
            (3, "solo"),
            (4, ""),
            (5, "   "),
        ],
    )
    got = {
        r["doc_id"]: (
            r["scored"],
            r["green"],
            r["z_micro"],
            r["verdict"],
        )
        for r in synthetic_watermark_detect(spark, d).collect()
    }
    assert got[1][1] == 59 and got[1][3] == "watermarked"
    assert got[1][2] == math.floor(math.sqrt(3.0 * 59) * 1_000_000)
    assert got[2][1] == 0 and got[2][3] == "clean" and got[2][2] < 0
    for i in (3, 4, 5):
        assert got[i] == (0, 0, 0, "clean")


def _write_events(d, rows):
    # rows: (event_id, user_id, ts_micros, event_type, k_or_None)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array(
                    [r[2] for r in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(
                    [
                        None if r[4] is None else '{"k": %d}' % r[4]
                        for r in rows
                    ],
                    pa.string(),
                ),
            }
        ),
        os.path.join(d, "events.parquet"),
    )


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 10**6),
            st.integers(1, 3),
            st.integers(0, 2 * 86400 * 10**6),
            st.sampled_from(
                ["click", "view", "purchase", "signup", "error"]
            ),
            st.one_of(st.none(), st.integers(0, 99)),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: r[0],
    )
)
def test_dpo_pair_matches_python_recount(spark, rows):
    import datetime as dt

    from realtimedatawarehouse_self_spark.plans.curation import (
        dpo_pair_extraction,
    )

    d = tempfile.mkdtemp(prefix="dpoprop")
    _write_events(d, rows)
    got = {
        r["prompt_id"]: (
            r["day"],
            r["chosen_type"],
            r["rejected_type"],
            r["margin"],
            r["chosen_tok"],
            r["rejected_tok"],
        )
        for r in dpo_pair_extraction(spark, d).collect()
    }
    cell = defaultdict(lambda: [0, 0])  # (uid, day, type) -> [ct, tok]
    for _eid, uid, tsu, etype, k in rows:
        day = dt.datetime.utcfromtimestamp(tsu / 1e6).strftime(
            "%Y-%m-%d"
        )
        c = cell[(uid, day, etype)]
        c[0] += 1
        c[1] += 2 + (0 if k is None else k) % 5
    bykey = defaultdict(dict)
    for (uid, day, etype), (ct, tok) in cell.items():
        bykey[(uid, day)][etype] = (ct, tok)
    want = {}
    for (uid, day), types in bykey.items():
        names = sorted(types)
        cands = []
        for i, a in enumerate(names):
            for b in names[i + 1 :]:
                (ca, ta), (cb, tb) = types[a], types[b]
                if ca == cb:
                    continue
                if ca > cb:
                    cands.append((abs(ca - cb), a, b, ta, tb))
                else:
                    cands.append((abs(ca - cb), b, a, tb, ta))
        if not cands:
            continue
        # max margin first, tie-break (chosen_type, rejected_type) asc
        cands.sort(key=lambda c: (-c[0], c[1], c[2]))
        m, ch, rj, ct_, rt_ = cands[0]
        if m < DPO_MARGIN_MIN:
            continue
        pid = hashlib.md5(f"{uid}|{day}".encode()).hexdigest()
        want[pid] = (day, ch, rj, m, ct_, rt_)
    assert got == want
