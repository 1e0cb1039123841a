"""SQL front-end: users can query the engine's registered views with plain
Spark SQL (the reference's Flink-SQL entry style), validated against the
DuckDB oracle; plus exactly-once restart semantics for streaming sinks."""

from __future__ import annotations

import os

from tests.conftest import TESTDATA
from tests.oracle_harness import compare_query, register_duckdb_views

SF = os.path.join(TESTDATA, "sf0.001")

ADHOC_SQL = """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS order_ct,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           / 100.0 AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
GROUP BY n_name
"""


def test_spark_sql_over_registered_views(spark, duck):
    from realtimedatawarehouse_self_spark.sources.tables import register_views

    register_views(spark, SF)
    got = spark.sql(ADHOC_SQL)
    register_duckdb_views(duck, SF)
    ok, detail = compare_query(got, duck, ADHOC_SQL)
    assert ok, detail


def test_streaming_restart_is_idempotent(spark, tmp_path):
    """Re-running a completed availableNow query against the SAME checkpoint
    must process nothing new (W7: restart-safe exactly-once via source
    offsets + idempotent sink)."""
    import datetime as dt

    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), "view") for i in range(5)]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    ).coalesce(1).write.parquet(src)

    def run():
        stream = spark.readStream.schema(
            spark.read.parquet(src).schema
        ).parquet(src)
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), 'stream did not finish in 120s'

    run()
    assert spark.read.parquet(out).count() == 5
    run()  # restart with nothing new: must not duplicate
    assert spark.read.parquet(out).count() == 5


def test_hostile_session_timezone_overridden(spark, duck):
    """The driver hands the engine an arbitrary session; if that session
    carries a non-UTC time zone, every query must still match the oracle
    because apply_runtime_confs pins the zone at query build time."""
    import __spark_entry__ as e

    register_duckdb_views(duck, SF)
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
    try:
        for name in (
            "dws02_traffic_page_view_window",
            "gap_fill_locf",
            # late-r4 timestamp-sensitive additions: window-boundary diff
            # and hour-bucketed graph construction
            "snapshot_diff_user_state",
            "pagerank_co_engagement",
            # final-r4: day-string rollups and minute-bucketed graph
            "abandoned_view_rate",
            "triangle_count_co_engagement",
            "user_churn_labels",
            # r5: day-truncated EWMA series — a zone shift would move
            # events across day boundaries and change every count
            "ewma_anomaly_daily",
        ):
            got = e.queries()[name](spark, SF)
            assert (
                spark.conf.get("spark.sql.session.timeZone") == "UTC"
            ), "query builder must pin the session zone"
            ok, detail = compare_query(got, duck, e.oracle_sql()[name])
            assert ok, f"{name}: {detail}"
            # re-poison before the next query builds
            spark.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
