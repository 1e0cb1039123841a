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
