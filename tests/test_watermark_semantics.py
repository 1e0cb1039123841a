"""W4 parity: rows older than the watermark are silently dropped (the
reference sets no allowed-lateness anywhere — SURVEY.md §2.7 W4 — and
Spark's default matches)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
    ]
)


def test_late_rows_dropped_after_watermark(spark, tmp_path):
    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    t0 = dt.datetime(2024, 1, 1)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        agg = (
            stream.withWatermark("ts", "10 seconds")
            .groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("ct"))
            .select(F.col("w.start").alias("wstart"), "event_type", "ct")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), 'stream did not finish in 120s'

    # batch 1: two events in minute 0
    spark.createDataFrame(
        [(1, t0, "view"), (2, t0 + dt.timedelta(seconds=30), "view")], SCHEMA
    ).coalesce(1).write.parquet(src)
    run()

    # batch 2: advance watermark far ahead (event at +1 h)
    spark.createDataFrame(
        [(3, t0 + dt.timedelta(hours=1), "view")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run()

    # batch 3: a LATE event for minute 0 (behind the watermark) + a fresh
    # flush event so remaining windows close
    spark.createDataFrame(
        [
            (4, t0 + dt.timedelta(seconds=45), "view"),  # late -> dropped
            (5, t0 + dt.timedelta(hours=2), "view"),
        ],
        SCHEMA,
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    run()  # extra trigger: emit anything the advanced watermark released

    got = {
        (r.wstart, r.event_type): r.ct
        for r in spark.read.parquet(out).collect()
    }
    # minute-0 window closed with ONLY the two on-time rows; the late row 4
    # never resurrects or re-emits the window
    assert got[(t0, "view")] == 2
