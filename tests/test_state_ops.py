"""Semantic invariants for plans/state_ops.py beyond oracle agreement."""

from __future__ import annotations

import os

from tests.conftest import TESTDATA

import realtimedatawarehouse_self_spark.plans.state_ops as S

SF = os.path.join(TESTDATA, "sf0.001")


def test_quantile_sketch_error_bound(spark):
    """The histogram bin width IS the deterministic error bound: the exact
    order statistic always lands strictly below the sketch's bin upper
    edge, no further than one bin away."""
    rows = S.value_quantile_sketch(spark, SF).collect()
    assert len(rows) == 5 * len(S.PCTS)  # 5 event types x 3 percentiles
    for r in rows:
        assert 0 < r.err_cents <= S.BIN_CENTS, r

def test_snapshot_diff_op_shape(spark):
    rows = S.snapshot_diff_user_state(spark, SF).collect()
    ops = {r.op for r in rows}
    assert ops <= {"I", "U", "D"}
    for r in rows:
        if r.op == "I":
            assert r.old_cents is None and r.new_cents is not None
        elif r.op == "D":
            assert r.old_cents is not None and r.new_cents is None
        else:
            assert r.old_cents is not None and r.new_cents is not None
    # at sf0.001 all three op kinds occur (pinned so the query can never
    # silently go vacuous on regenerated testdata without failing here)
    assert ops == {"I", "U", "D"}


def test_incoming_dedup_sides_disjoint(spark):
    rows = S.dedup_incoming_batch(spark, SF).collect()
    for r in rows:
        assert r.new_doc % S.INCOMING_MOD == 0
        assert r.corpus_doc % S.INCOMING_MOD != 0
        assert r.union_ct >= r.inter_ct >= 0


def test_fifo_matching_conserves_mass(spark):
    """Conservation law of FIFO allocation: per user, total matched cents
    equals min(total credits, total debits) — nothing double-allocated,
    nothing unmatchable left matched."""
    import duckdb

    from realtimedatawarehouse_self_spark.plans.behavior import (
        fifo_credit_matching,
    )

    rows = fifo_credit_matching(spark, SF).collect()
    assert rows and all(r.matched_cents > 0 for r in rows)
    matched = {}
    for r in rows:
        matched[r.user_id] = matched.get(r.user_id, 0) + r.matched_cents
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    want = dict(
        con.execute(
            """
        SELECT user_id,
               least(
                 sum(CASE WHEN event_type NOT IN ('purchase','error')
                     THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END),
                 sum(CASE WHEN event_type = 'purchase'
                     THEN CAST(floor(value*100+0.5) AS BIGINT) ELSE 0 END))
        FROM events GROUP BY 1"""
        ).fetchall()
    )
    for u, m in matched.items():
        assert m == want[u], (u, m, want[u])


def test_linear_apportion_conserves_money_and_splits_remainders(
    spark, tmp_path
):
    """Largest-remainder apportionment fixed points: 100 cents across 3
    touches -> 34/33/33 with the extra cent to the EARLIEST touch; a
    purchase with no touches stays whole as 'direct'; and the conservation
    law (credited == purchased, cent-exact) holds."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from realtimedatawarehouse_self_spark.plans.state_ops import (
        attribution_linear_apportion,
    )

    base = dt.datetime(2024, 4, 10, 12, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: three views then a 1.00 purchase -> 34/33/33
        (0, base - 3 * h, 1, "view", None),
        (1, base - 2 * h, 1, "view", None),
        (2, base - 1 * h, 1, "view", None),
        (3, base, 1, "purchase", 1.00),
        # user 2: no touches -> direct, whole 2.50
        (4, base, 2, "purchase", 2.50),
    ]
    d = tmp_path / "apportion"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([r[4] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(str(d), "events.parquet"),
    )
    out = attribution_linear_apportion(spark, str(d)).collect()
    by_channel = {}
    for r in out:
        by_channel.setdefault(r["channel"], 0)
        by_channel[r["channel"]] += r["credited_cents"]
    assert by_channel == {"view": 100, "direct": 250}
    assert sum(by_channel.values()) == 350  # conservation, cent-exact

    # per-touch split: re-derive shares at touch grain via the day rows
    # (all three touches are the same day/channel) — 34+33+33 = 100 with
    # n_credits = 3
    view_rows = [r for r in out if r["channel"] == "view"]
    assert len(view_rows) == 1 and view_rows[0]["n_credits"] == 3
