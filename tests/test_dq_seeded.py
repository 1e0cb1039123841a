"""Seeded-violation tests for the data-quality operators.

The oracle gate proves Spark and DuckDB AGREE; these tests prove the
audit actually DETECTS problems: a synthetic table set with known planted
violations (FK orphans, enum breaks, NULL keys, range breaks, one
anomalous traffic day) must be reported with exactly the planted counts.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def seeded_sf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dqdata"))

    # customer: keys 1..5
    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 2, 3, 4, 5], pa.int64())}),
        os.path.join(d, "customer.parquet"),
    )
    # orders: 9 rows; 3 orphans (custkey 98, 99, and a NULL key — an FK
    # that cannot match counts as a violation, matching left_anti/NOT
    # EXISTS semantics on both engines)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(list(range(10, 19)), pa.int64()),
                "o_custkey": pa.array(
                    [1, 2, 3, 98, 4, 5, 99, 1, None], pa.int64()
                ),
            }
        ),
        os.path.join(d, "orders.parquet"),
    )
    # lineitem: 10 rows; 3 orphan orderkeys (77, 88, 99); 1 bad quantity
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(
                    [10, 11, 12, 77, 13, 88, 14, 99, 15, 16], pa.int64()
                ),
                "l_quantity": pa.array(
                    [1.0, 2.0, 3.0, 4.0, 0.0, 6.0, 7.0, 8.0, 9.0, 1.0],
                    pa.float64(),
                ),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    # events: 'click' 5/day for 10 days + one 50-event spike day (day 11);
    # 1 bad enum row; 2 NULL user_ids (valid enum, counted separately)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(10):
        for k in range(5):
            rows.append((eid, base + dt.timedelta(days=day, minutes=k), 7, "click"))
            eid += 1
    for k in range(50):
        rows.append((eid, base + dt.timedelta(days=10, minutes=k), 7, "click"))
        eid += 1
    rows.append((eid, base, 8, "not_a_type")); eid += 1
    rows.append((eid, base, None, "view")); eid += 1
    rows.append((eid, base, None, "view")); eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows]),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    return d


def test_dq_audit_detects_planted_violations(spark, seeded_sf_dir):
    from realtimedatawarehouse_self_spark.plans.advanced import (
        dq_constraint_audit,
    )

    got = {
        r["constraint_name"]: (r["violation_ct"], r["checked_ct"], r["passed"])
        for r in dq_constraint_audit(spark, seeded_sf_dir).collect()
    }
    assert got["orders.o_custkey -> customer.c_custkey"] == (3, 9, 0)
    assert got["lineitem.l_orderkey -> orders.o_orderkey"] == (3, 10, 0)
    assert got["events.event_type in enum"] == (1, 103, 0)
    assert got["events.user_id not null"] == (2, 103, 0)
    assert got["lineitem.l_quantity > 0"] == (1, 10, 0)


def test_dq_audit_oracle_parity_with_null_keys(spark, seeded_sf_dir):
    """Engine-vs-oracle agreement ON the NULL-bearing seeded data — pins
    the left_anti <-> NOT EXISTS correspondence (NOT IN would collapse
    violation counts to 0 the moment a NULL key appears)."""
    import duckdb

    import __spark_entry__ as e
    from tests.oracle_harness import compare_query, register_duckdb_views

    con = duckdb.connect()
    register_duckdb_views(con, seeded_sf_dir)
    df = e.queries()["dq_constraint_audit"](spark, seeded_sf_dir)
    ok, detail = compare_query(df, con, e.oracle_sql()["dq_constraint_audit"])
    assert ok, detail


def test_retention_oracle_parity_with_null_users(spark, seeded_sf_dir):
    """The seeded events include NULL user_ids: Spark's window partitions
    and the oracle's window (vs a USING join, which would drop NULL keys)
    must agree on treating NULL as its own cohort member."""
    import duckdb

    import __spark_entry__ as e
    from tests.oracle_harness import compare_query, register_duckdb_views

    con = duckdb.connect()
    register_duckdb_views(con, seeded_sf_dir)
    df = e.queries()["user_retention_cohorts"](spark, seeded_sf_dir)
    ok, detail = compare_query(
        df, con, e.oracle_sql()["user_retention_cohorts"]
    )
    assert ok, detail


def test_anomaly_flags_spike_day_only(spark, seeded_sf_dir):
    from realtimedatawarehouse_self_spark.plans.advanced import (
        anomaly_zscore_daily,
    )

    rows = anomaly_zscore_daily(spark, seeded_sf_dir).collect()
    clicks = {r["day"]: r for r in rows if r["event_type"] == "click"}
    assert clicks["2024-01-11"]["is_anomaly"] == 1  # the planted spike
    assert clicks["2024-01-11"]["zscore"] > 2.0
    for day, r in clicks.items():
        if day != "2024-01-11":
            assert r["is_anomaly"] == 0, day


def test_active_users_reports_zero_activity_gap_days(spark, tmp_path):
    """A zero-activity day INSIDE the data range (an outage) must appear
    with dau=0 — and still hash-match the oracle on the same data."""
    import duckdb

    import __spark_entry__ as e
    from tests.oracle_harness import compare_query, register_duckdb_views

    d = str(tmp_path)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in (0, 1, 2, 4):  # Jan 4 (day index 3) is the outage day
        for u in range(3):
            rows.append((eid, base + dt.timedelta(days=day, minutes=u), u))
            eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows)),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        os.path.join(d, "events.parquet"),
    )
    got = {
        r["day"]: (r["dau"], r["wau_7"])
        for r in e.queries()["active_users_rolling"](spark, d).collect()
    }
    assert got["2024-01-04"] == (0, 3)  # outage day present, trailing WAU
    assert set(got) == {f"2024-01-0{i}" for i in range(1, 6)}  # dense spine
    con = duckdb.connect()
    register_duckdb_views(con, d)
    df = e.queries()["active_users_rolling"](spark, d)
    ok, detail = compare_query(df, con, e.oracle_sql()["active_users_rolling"])
    assert ok, detail
