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
