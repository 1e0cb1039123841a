"""Property-based third opinions for the round-10 wave-49 operators.

- `caption_image_alignment`: full pure-Python recount (hashlib md5
  buckets/signs, integer dot/norms, the single double division floored
  to micro) on generated documents + embeddings, plus the threshold pin
  that an embedding built FROM a caption's own hashed projection scores
  cos_micro ~ 1e6 and keeps while its negation drops;
- `preference_length_bias_probe`: per-pair recount of the decided set,
  longer/shorter win counts, and token sums.
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

from realtimedatawarehouse_self_spark.plans.curation import (
    CLIP_DIM,
    CLIP_TAU_MICRO,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_WORDS = [f"w{i}" for i in range(40)]


def _bucket(w: str) -> int:
    return int(hashlib.md5(w.encode()).hexdigest()[:2], 16) % CLIP_DIM


def _sign(w: str) -> int:
    return 1 if hashlib.md5(w.encode()).hexdigest()[2] < "8" else -1


def _tvec(text: str) -> list[int]:
    t = [0] * CLIP_DIM
    for w in text.split(" "):
        if w:
            t[_bucket(w)] += _sign(w)
    return t


def _write_pair_tables(d, docs, vecs):
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
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in vecs], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 9999),
            st.lists(
                st.sampled_from(_WORDS), min_size=1, max_size=20
            ).map(" ".join),
            st.lists(
                st.floats(
                    -1.0,
                    1.0,
                    allow_nan=False,
                    allow_infinity=False,
                    width=32,
                ),
                min_size=CLIP_DIM,
                max_size=CLIP_DIM,
            ),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda r: r[0],
    )
)
def test_caption_alignment_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.curation import (
        caption_image_alignment,
    )

    d = tempfile.mkdtemp(prefix="clipprop")
    _write_pair_tables(
        d, [(i, t) for i, t, _v in rows], [(i, v) for i, _t, v in rows]
    )
    got = {
        r["doc_id"]: (
            r["dot"],
            r["t2"],
            r["q2"],
            r["cos_micro"],
            r["decision"],
        )
        for r in caption_image_alignment(spark, d).collect()
    }
    import numpy as np

    want = {}
    for doc_id, text, vec in rows:
        t = _tvec(text)
        # parquet stores float32; quantization sees the float32 value
        q = [
            math.floor(float(np.float32(x)) * 1_000_000) for x in vec
        ]
        dot = sum(a * b for a, b in zip(t, q))
        t2 = sum(a * a for a in t)
        q2 = sum(b * b for b in q)
        if t2 == 0 or q2 == 0:
            cm = 0
        else:
            cm = math.floor(
                dot / math.sqrt(float(t2 * q2)) * 1_000_000
            )
        want[doc_id] = (
            dot,
            t2,
            q2,
            cm,
            "keep" if cm >= CLIP_TAU_MICRO else "drop",
        )
    assert got == want


def test_caption_alignment_threshold_pin(spark):
    """An image embedding proportional to the caption's own hashed
    projection must score cos_micro ~ 1e6 (floor rounding) and keep;
    its negation scores ~ -1e6 and drops."""
    from realtimedatawarehouse_self_spark.plans.curation import (
        caption_image_alignment,
    )

    text = " ".join(_WORDS[:10])
    t = _tvec(text)
    norm = math.sqrt(sum(x * x for x in t)) or 1.0
    unit = [x / norm for x in t]
    d = tempfile.mkdtemp(prefix="clippin")
    _write_pair_tables(
        d,
        [(1, text), (2, text)],
        [(1, unit), (2, [-x for x in unit])],
    )
    got = {
        r["doc_id"]: (r["cos_micro"], r["decision"])
        for r in caption_image_alignment(spark, d).collect()
    }
    assert got[1][0] >= 990_000 and got[1][1] == "keep"
    assert got[2][0] <= -990_000 and got[2][1] == "drop"


def _write_events(d, rows):
    # rows: (event_id, user_id, ts_micros, event_type, k_or_None)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
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
def test_length_bias_probe_matches_python_recount(spark, rows):
    import datetime as dt

    from realtimedatawarehouse_self_spark.plans.curation import (
        preference_length_bias_probe,
    )

    d = tempfile.mkdtemp(prefix="lenbias")
    _write_events(d, rows)
    got = {
        (r["type_a"], r["type_b"]): (
            r["n_comparisons"],
            r["n_decided"],
            r["longer_wins"],
            r["shorter_wins"],
            r["chosen_tok_sum"],
            r["rejected_tok_sum"],
            r["longer_win_micro"],
        )
        for r in preference_length_bias_probe(spark, d).collect()
    }
    cell = defaultdict(lambda: [0, 0])  # (uid, day, type) -> [ct, tok]
    for _eid, uid, tsu, etype, k in rows:
        day = dt.datetime.utcfromtimestamp(tsu / 1e6).strftime(
            "%Y-%m-%d"
        )
        c = cell[(uid, day, etype)]
        c[0] += 1
        c[1] += 2 + (0 if k is None else k) % 5
    pairs = defaultdict(
        lambda: [0, 0, 0, 0, 0, 0]
    )  # (ta, tb) -> [n, dec, lw, sw, ch, rj]
    bykey = defaultdict(dict)
    for (uid, day, etype), (ct, tok) in cell.items():
        bykey[(uid, day)][etype] = (ct, tok)
    for types in bykey.values():
        names = sorted(types)
        for i, a in enumerate(names):
            for b in names[i + 1 :]:
                (ca, ta), (cb, tb) = types[a], types[b]
                p = pairs[(a, b)]
                p[0] += 1
                if ca != cb:
                    p[1] += 1
                    ch, rj = (ta, tb) if ca > cb else (tb, ta)
                    p[2] += ch > rj
                    p[3] += ch < rj
                    p[4] += ch
                    p[5] += rj
    want = {
        k: (
            p[0],
            p[1],
            p[2],
            p[3],
            p[4],
            p[5],
            (p[2] * 1_000_000 // p[1]) if p[1] else 0,
        )
        for k, p in pairs.items()
    }
    assert got == want
