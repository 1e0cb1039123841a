"""J2 streaming left-outer join: matched rows emit immediately; unmatched
rows emit null-extended exactly once, after the watermark closes the join
window (no retractions — the engine's substitution for the reference's
upsert-Kafka tombstone leakage)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

OD_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("order_id", StringType()),
        StructField("create_time", TimestampType()),
    ]
)
ACT_SCHEMA = StructType(
    [
        StructField("order_detail_id", StringType()),
        StructField("activity_id", StringType()),
        StructField("act_time", TimestampType()),
    ]
)


def test_streaming_left_join_null_extends_after_watermark(spark, tmp_path):
    from realtimedatawarehouse_self_spark.streaming.pipelines import (
        order_detail_left_join_stream,
    )

    t0 = dt.datetime(2024, 1, 1)
    od_src, act_src = str(tmp_path / "od"), str(tmp_path / "act")
    out, cp = str(tmp_path / "out"), str(tmp_path / "cp")

    spark.createDataFrame(
        [
            ("d1", "o1", t0),                            # has activity
            ("d2", "o2", t0 + dt.timedelta(seconds=3)),  # no activity
        ],
        OD_SCHEMA,
    ).coalesce(1).write.parquet(od_src)
    spark.createDataFrame(
        [("d1", "act9", t0 + dt.timedelta(seconds=1))], ACT_SCHEMA
    ).coalesce(1).write.parquet(act_src)

    def run():
        od = spark.readStream.schema(OD_SCHEMA).parquet(od_src)
        act = spark.readStream.schema(ACT_SCHEMA).parquet(act_src)
        q = (
            order_detail_left_join_stream(od, act)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), 'stream did not finish in 120s'

    run()
    got = {r.id: r for r in spark.read.parquet(out).collect()}
    # matched row emits in the first pass
    assert got["d1"].activity_id == "act9"
    # unmatched row is still held in state (watermark hasn't passed)
    assert "d2" not in got

    # advance both watermarks far past d2's join window
    flush = t0 + dt.timedelta(hours=1)
    spark.createDataFrame(
        [("dF", "oF", flush)], OD_SCHEMA
    ).coalesce(1).write.mode("append").parquet(od_src)
    spark.createDataFrame(
        [("dF", "actF", flush)], ACT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(act_src)
    run()
    run()  # one more trigger so the advanced watermark evicts/emits

    got = {r.id: r for r in spark.read.parquet(out).collect()}
    assert got["d2"].activity_id is None  # null-extended, exactly once
    assert sum(1 for r in spark.read.parquet(out).collect() if r.id == "d2") == 1
