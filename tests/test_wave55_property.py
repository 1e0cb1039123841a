"""Property-based third opinions for the round-10 wave-55 operators.

- `repeated_epoch_value_plan`: the decay-chain constants are recomputed
  independently (floored micro chain) and the per-lang unique/total
  token supply + effective-token rows are recounted in pure Python;
  invariants: effective_tokens is nondecreasing in k and bounded by
  unique_tokens * cum_micro_max / 1e6 < 4 * unique_tokens (geometric
  sum bound at delta = 3/4).
- `sft_complexity_score`: per-conversation recount of the three proxies
  and the points/bucket rule on generated event tables.
"""

from __future__ import annotations

import os
import tempfile
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.corpus_ops import (
    EPOCH_DECAY_MICRO,
    EPOCH_MAX_K,
    EPOCH_VALUE_TABLE,
)

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)


def test_epoch_decay_chain_constants():
    v, cum = 1_000_000, 0
    for k, mv, cv in EPOCH_VALUE_TABLE:
        cum += v
        assert (mv, cv) == (v, cum), k
        v = v * EPOCH_DECAY_MICRO // 1_000_000
    assert len(EPOCH_VALUE_TABLE) == EPOCH_MAX_K
    # geometric bound: cum < 1e6 / (1 - delta) = 4e6 at delta = 3/4
    assert EPOCH_VALUE_TABLE[-1][2] < 4_000_000


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


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 9999),
            st.integers(0, 4),  # template id -> dup groups
            st.sampled_from(["en", "de"]),
        ),
        min_size=1,
        max_size=16,
        unique_by=lambda r: r[0],
    )
)
def test_epoch_value_plan_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        repeated_epoch_value_plan,
    )

    templates = {
        t: " ".join(f"t{t}w{i}" for i in range(t + 2)) for t in range(5)
    }
    d = tempfile.mkdtemp(prefix="epochval")
    _write_docs(d, [(did, templates[t], lg) for did, t, lg in rows])
    got = {
        (r["lang"], r["k"]): (
            r["total_tokens"],
            r["unique_tokens"],
            r["marginal_value_micro"],
            r["effective_tokens"],
        )
        for r in repeated_epoch_value_plan(spark, d).collect()
    }
    supply = defaultdict(lambda: [0, 0])
    seen = defaultdict(set)
    for _did, t, lg in rows:
        n = t + 2
        supply[lg][0] += n
        if t not in seen[lg]:
            seen[lg].add(t)
            supply[lg][1] += n
    want = {}
    for lg, (tot, uni) in supply.items():
        for k, mv, cv in EPOCH_VALUE_TABLE:
            want[(lg, k)] = (tot, uni, mv, uni * cv // 1_000_000)
    assert got == want
    # effective tokens nondecreasing in k
    for lg in supply:
        effs = [got[(lg, k)][3] for k in range(1, EPOCH_MAX_K + 1)]
        assert effs == sorted(effs)


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


def _points(n_turns, n_intents, chars):
    p = 0
    p += 3 if n_turns >= 8 else 2 if n_turns >= 4 else 1 if n_turns >= 2 else 0
    p += 2 if n_intents >= 4 else 1 if n_intents >= 3 else 0
    p += 2 if chars >= 120 else 1 if chars >= 60 else 0
    return p


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
def test_sft_complexity_matches_python_recount(spark, rows):
    import datetime as dt

    from realtimedatawarehouse_self_spark.plans.sft_ops import (
        sft_complexity_score,
    )

    d = tempfile.mkdtemp(prefix="sftcplx")
    _write_events(d, rows)
    got = {
        (r["user_id"], r["day"]): (
            r["n_turns"],
            r["n_intents"],
            r["content_chars"],
            r["complexity_points"],
            r["complexity_bucket"],
        )
        for r in sft_complexity_score(spark, d).collect()
    }
    conv = defaultdict(list)
    for _eid, uid, tsu, etype, k in rows:
        day = dt.datetime.utcfromtimestamp(tsu / 1e6).strftime(
            "%Y-%m-%d"
        )
        content = f"{etype} {k if k is not None else '_'}"
        conv[(uid, day)].append(content)
    want = {}
    for key, contents in conv.items():
        n = len(contents)
        ni = len(set(contents))
        ch = sum(len(c) for c in contents)
        pts = _points(n, ni, ch)
        bucket = (
            "hard"
            if pts >= 6
            else "medium"
            if pts >= 4
            else "easy"
            if pts >= 2
            else "trivial"
        )
        want[key] = (n, ni, ch, pts, bucket)
    assert got == want
