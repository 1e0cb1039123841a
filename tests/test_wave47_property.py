"""Property-based third opinions for the round-10 wave-47 SFT operators.

- `sft_turn_structure_audit`: pure-Python recount of the per-conversation
  structure counters (role map, (ts, event_id) order, lag-based
  alternation violations, first/last role) and the keep/drop gate, plus
  a pinned fixture where the violation and the gate boundary are known
  by construction;
- `sft_template_render_overhead`: character-exact recount of the ChatML
  render against a Python string build of the same template;
- `sft_loss_masking_plan`: per-day token recount and the identity
  loss_tokens + masked == total.
"""

from __future__ import annotations

import datetime as dt
import os
import tempfile
from collections import defaultdict

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtimedatawarehouse_self_spark.plans.sft_ops import (
    _SYSTEM_PREAMBLE,
    _USER_TYPES,
    MIN_TURNS,
)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_TYPES = ["click", "view", "purchase", "signup", "error"]


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


_rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 10**6),
        st.integers(1, 3),
        st.integers(0, 3 * 86400 * 10**6),  # ~3 days of conversations
        st.sampled_from(_TYPES),
        st.one_of(st.none(), st.integers(0, 99)),
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: r[0],
)


def _day(tsu: int) -> str:
    return dt.datetime.utcfromtimestamp(tsu / 1e6).strftime("%Y-%m-%d")


def _role(etype: str) -> str:
    return "user" if etype in _USER_TYPES else "assistant"


def _content(etype: str, k) -> str:
    return f"{etype} {'_' if k is None else k}"


def _conversations(rows):
    conv = defaultdict(list)
    for eid, uid, tsu, etype, k in rows:
        conv[(uid, _day(tsu))].append((tsu, eid, etype, k))
    for steps in conv.values():
        steps.sort(key=lambda s: (s[0], s[1]))
    return conv


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_turn_structure_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.sft_ops import (
        sft_turn_structure_audit,
    )

    d = tempfile.mkdtemp(prefix="sftprop")
    _write_events(d, rows)
    got = {
        (r["user_id"], r["day"]): (
            r["n_turns"],
            r["n_user_turns"],
            r["n_assistant_turns"],
            r["alternation_violations"],
            r["starts_user"],
            r["ends_assistant"],
            r["decision"],
        )
        for r in sft_turn_structure_audit(spark, d).collect()
    }
    want = {}
    for key, steps in _conversations(rows).items():
        roles = [_role(e) for _t, _i, e, _k in steps]
        viol = sum(
            1 for a, b in zip(roles, roles[1:]) if a == b
        )
        su = 1 if roles[0] == "user" else 0
        ea = 1 if roles[-1] == "assistant" else 0
        keep = (
            su == 1
            and ea == 1
            and viol == 0
            and len(roles) >= MIN_TURNS
        )
        want[key] = (
            len(roles),
            sum(1 for r in roles if r == "user"),
            sum(1 for r in roles if r == "assistant"),
            viol,
            su,
            ea,
            "keep" if keep else "drop",
        )
    assert got == want


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_template_render_matches_python_string_build(spark, rows):
    from realtimedatawarehouse_self_spark.plans.sft_ops import (
        sft_template_render_overhead,
    )

    d = tempfile.mkdtemp(prefix="sftrender")
    _write_events(d, rows)
    got = {
        (r["user_id"], r["day"]): (
            r["n_turns"],
            r["content_chars"],
            r["rendered_chars"],
            r["overhead_chars"],
            r["overhead_micro"],
        )
        for r in sft_template_render_overhead(spark, d).collect()
    }
    want = {}
    for key, steps in _conversations(rows).items():
        contents = [_content(e, k) for _t, _i, e, k in steps]
        rendered = f"<|system|>\n{_SYSTEM_PREAMBLE}\n" + "\n".join(
            f"<|{_role(e)}|>\n{_content(e, k)}<|end|>"
            for _t, _i, e, k in steps
        )
        cc = sum(len(c) for c in contents)
        rc = len(rendered)
        want[key] = (
            len(steps),
            cc,
            rc,
            rc - cc,
            (rc - cc) * 1000000 // rc,
        )
    assert got == want


@settings(**_SETTINGS)
@given(rows=_rows_strategy)
def test_loss_masking_matches_python_recount(spark, rows):
    from realtimedatawarehouse_self_spark.plans.sft_ops import (
        sft_loss_masking_plan,
    )

    d = tempfile.mkdtemp(prefix="sftloss")
    _write_events(d, rows)
    got = {
        r["day"]: (
            r["n_turns"],
            r["total_tokens"],
            r["loss_tokens"],
            r["loss_yield_micro"],
        )
        for r in sft_loss_masking_plan(spark, d).collect()
    }
    days = defaultdict(list)
    for _eid, _uid, tsu, etype, k in rows:
        days[_day(tsu)].append(
            (_role(etype), 2 + (0 if k is None else k) % 5)
        )
    want = {}
    for day, turns in days.items():
        total = sum(t for _r, t in turns)
        loss = sum(t for r, t in turns if r == "assistant")
        want[day] = (len(turns), total, loss, loss * 1000000 // total)
        # identity: masked + loss == total
        masked = sum(t for r, t in turns if r == "user")
        assert masked + loss == total
    assert got == want


def test_turn_structure_gate_boundary_pinned(spark):
    """Known-by-construction conversations: a clean user->assistant pair
    keeps; the same pair with a doubled user turn carries exactly one
    violation and drops; an assistant-first pair drops on starts_user;
    a single turn drops on MIN_TURNS."""
    from realtimedatawarehouse_self_spark.plans.sft_ops import (
        sft_turn_structure_audit,
    )

    h = 3600 * 10**6
    rows = [
        # uid 1: user(click) -> assistant(error): keep
        (1, 1, 1 * h, "click", 5),
        (2, 1, 2 * h, "error", 5),
        # uid 2: user, user, assistant: one violation -> drop
        (3, 2, 1 * h, "click", None),
        (4, 2, 2 * h, "view", None),
        (5, 2, 3 * h, "signup", None),
        # uid 3: assistant first -> drop
        (6, 3, 1 * h, "error", 1),
        (7, 3, 2 * h, "purchase", 1),
        # uid 4 wait — keep fixture to 3 users + single-turn uid 5
        (8, 5, 1 * h, "click", 1),
    ]
    d = tempfile.mkdtemp(prefix="sftpin")
    _write_events(d, rows)
    got = {
        r["user_id"]: (r["alternation_violations"], r["decision"])
        for r in sft_turn_structure_audit(spark, d).collect()
    }
    assert got == {
        1: (0, "keep"),
        2: (1, "drop"),
        3: (1, "drop"),  # error->purchase is also a same-role pair
        5: (0, "drop"),
    }


# ---------------------------------------------------------------------------
# Wave 48 pins (kept with the SFT family: the twin shares this module's
# fixtures; the NFC audit pins are events-free but tiny).
# ---------------------------------------------------------------------------
def test_sft_gate_twin_counts_cross_batch_violation(spark):
    """A conversation whose same-role pair STRADDLES the hour-band
    boundary (hour 7 -> hour 9 with 8-hour bands) must still count
    exactly one violation — the state's last-role carry, the thing a
    per-batch recount would miss."""
    from realtimedatawarehouse_self_spark.plans.streaming_twins import (
        streaming_sft_gate_twin,
    )

    h = 3600 * 10**6
    rows = [
        # uid 1: user@h1 (batch 0), assistant@h7 (batch 0),
        # assistant@h9 (batch 1) -> violation crosses the band boundary
        (1, 1, 1 * h, "click", 5),
        (2, 1, 7 * h, "error", 5),
        (3, 1, 9 * h, "signup", 5),
        # uid 2: clean pair split across bands -> keep, zero violations
        (4, 2, 7 * h, "view", 1),
        (5, 2, 9 * h, "purchase", 1),
    ]
    d = tempfile.mkdtemp(prefix="sfttwin")
    _write_events(d, rows)
    got = {
        r["user_id"]: (
            r["n_turns"],
            r["alternation_violations"],
            r["decision"],
        )
        for r in streaming_sft_gate_twin(spark, d).collect()
    }
    assert got == {1: (3, 1, "drop"), 2: (2, 0, "keep")}


def test_nfc_audit_pins(spark):
    """Known sequences: decomposed e+U+0301 composes (one char shorter,
    changed, one combining mark); precomposed U+00E9 is non-ASCII but
    NFC-stable; pure ASCII is untouched; NFC is idempotent (running the
    audit on already-clean docs reports zero changes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from realtimedatawarehouse_self_spark.plans.python_path import (
        unicode_normalization_audit,
    )

    d = tempfile.mkdtemp(prefix="nfcpin")
    # doc_id residues select the suffix: 0 -> decomposed, 1 -> precomposed,
    # 2 -> decomposed tilde, 3 -> none
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["base"] * 4),
                "lang": pa.array(["en"] * 4),
                "source": pa.array(["s"] * 4),
                "n_chars": pa.array([4] * 4, pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    got = {
        r["doc_id"]: (
            r["n_chars_raw"],
            r["n_chars_nfc"],
            r["nfc_changed"],
            r["ascii_only"],
            r["combining_marks"],
        )
        for r in unicode_normalization_audit(spark, d).collect()
    }
    base = len("base")
    assert got == {
        0: (base + 6, base + 5, 1, 0, 1),  # " cafe" + combining acute
        1: (base + 5, base + 5, 0, 0, 0),  # " café" precomposed
        2: (base + 6, base + 5, 1, 0, 1),  # " pin~a" decomposed tilde
        3: (base, base, 0, 1, 0),          # untouched ASCII
    }
