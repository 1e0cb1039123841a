"""Behavioral tests for the featurization operators — properties the
oracle-parity gate cannot see (parity proves Spark==DuckDB, not that the
math is the RIGHT math):

- target encoding must be leak-free: fold f's encoding may not depend on
  fold f's own target values (the entire point of out-of-fold encoding);
- the ACF must hit its analytic fixed points (perfect weekly period ->
  r²=1 at lag 7; alternating series -> negative sign at lag 1; constant
  series -> undefined, NULL not a crash);
- the hashing trick must conserve token mass across buckets.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _fold_of(user_id: int, folds: int = 5) -> int:
    h = int(hashlib.md5(str(user_id).encode()).hexdigest()[:15], 16)
    return h % folds


def _write_events(path, rows):
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(table, os.path.join(str(path), "events.parquet"))
    return str(path)


def test_target_encoding_is_leak_free(spark, tmp_path):
    """Perturb ONLY fold f's target values: every other fold's encoding for
    the same event_type may move (their 'other folds' include f), but fold
    f's own row must be bit-identical — it never sees its own labels."""
    from realtimedatawarehouse_self_spark.plans.featurize import (
        target_encoding_oof,
    )

    # users 0..39 spread across folds; find one user in fold 0
    f0_users = [u for u in range(40) if _fold_of(u) == 0]
    assert f0_users, "fixture needs at least one fold-0 user"
    base = dt.datetime(2024, 3, 1)
    mk = lambda vals: [
        (i, base + dt.timedelta(minutes=i), u, "purchase", v)
        for i, (u, v) in enumerate(vals)
    ]
    vals_a = [(u, 10.0 + (u % 7)) for u in range(40)]
    # perturbation: fold-0 users' targets shifted by +1000
    vals_b = [
        (u, v + (1000.0 if _fold_of(u) == 0 else 0.0)) for u, v in vals_a
    ]
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    d_a = _write_events(tmp_path / "a", mk(vals_a))
    d_b = _write_events(tmp_path / "b", mk(vals_b))

    enc_a = {
        (r["event_type"], r["fold"]): r["enc_micro_cents"]
        for r in target_encoding_oof(spark, d_a).collect()
    }
    enc_b = {
        (r["event_type"], r["fold"]): r["enc_micro_cents"]
        for r in target_encoding_oof(spark, d_b).collect()
    }
    assert enc_a[("purchase", 0)] == enc_b[("purchase", 0)]
    # sanity: the perturbation DID move the folds that can see fold 0
    moved = [
        f for f in range(5)
        if f != 0
        and ("purchase", f) in enc_a
        and enc_a[("purchase", f)] != enc_b.get(("purchase", f))
    ]
    assert moved, "perturbing fold 0 must shift the other folds' encodings"


def test_acf_analytic_fixed_points(spark, tmp_path):
    from realtimedatawarehouse_self_spark.plans.featurize import (
        autocorrelation_daily_lags,
    )

    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    # 'weekly': counts cycle 1..7 with period 7 -> lag-7 r² = 1e6 exactly
    for d in range(28):
        for _ in range(1 + (d % 7)):
            rows.append(
                (eid, base + dt.timedelta(days=d), 1, "weekly", 1.0)
            )
            eid += 1
    # 'alt': counts alternate 1,3,1,3 -> lag-1 cov negative, r² = 1e6
    for d in range(14):
        for _ in range(1 if d % 2 == 0 else 3):
            rows.append((eid, base + dt.timedelta(days=d), 2, "alt", 1.0))
            eid += 1
    # 'flat': constant 2/day -> zero variance -> r² NULL (not a crash)
    for d in range(10):
        for _ in range(2):
            rows.append((eid, base + dt.timedelta(days=d), 3, "flat", 1.0))
            eid += 1
    (tmp_path / "acf").mkdir()
    d_dir = _write_events(tmp_path / "acf", rows)

    out = {
        (r["event_type"], r["lag"]): (r["cov_sign"], r["r2_micro"])
        for r in autocorrelation_daily_lags(spark, d_dir).collect()
    }
    assert out[("weekly", 7)] == (1, 1_000_000)
    assert out[("weekly", 1)][1] < 1_000_000
    assert out[("alt", 1)] == (-1, 1_000_000)
    assert out[("flat", 3)][1] is None


def test_feature_hashing_conserves_token_mass(spark, tmp_path):
    from realtimedatawarehouse_self_spark.plans.featurize import (
        feature_hashing_counts,
    )

    d = tmp_path / "docs"
    d.mkdir()
    texts = [
        "the cat sat on the mat",
        "a dog and a cat",
        "numbers 42 and 7 appear 42 times",
    ]
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["t"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))

    rows = feature_hashing_counts(spark, str(d)).collect()
    total_tokens = sum(len(t.split()) for t in texts)
    assert sum(r["tok_ct"] for r in rows) == total_tokens
    assert all(abs(r["feat_sum"]) <= r["tok_ct"] for r in rows)
    assert all(0 <= r["bucket_id"] < 64 for r in rows)
