"""Kafka source/sink adapters (S1/S2, K1/K2/K3-egress).

No broker exists in the test container, so these builders are exercised by
constructing unresolved plans in unit tests and by the envelope/pipeline
tests that feed the same downstream code from file/memory sources — the
`value`-string contract is identical either way.

Reference mapping:
- S1 `getFlinkKafkaConsumer(topic, groupId)` (MyKafkaUtil.java:25-54)
  -> `read_topic` / `stream_topic`
- K1 fixed-topic producer (MyKafkaUtil.java:57-63) -> `write_topic`
- K2 dynamic-topic producer (MyKafkaUtil.java:65-87: topic taken from the
  record's `sink_table` field, then removed) -> `write_routed`: Spark's
  kafka sink reads a per-row `topic` column natively — the hand-written
  KafkaRecordSerializationSchema disappears.
- K3 upsert-kafka egress: emit keyed records (`key` column = primary key)
  to a compacted topic; last-write-wins compaction replaces tombstone
  retraction (SURVEY.md §7 known-hard #4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_topic(
    spark: SparkSession,
    brokers: str,
    topic: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1: subscribe to a topic; value as string (null-safe like the
    reference's custom deserializer, which mapped nulls to "")."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.coalesce(F.col("value").cast("string"), F.lit("")).alias("value"),
        "topic",
        "partition",
        "offset",
        "timestamp",
    )


def read_topic(
    spark: SparkSession, brokers: str, topic: str
) -> DataFrame:
    """Batch read of a topic (bounded replay — the batch twin of S1)."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .load()
    )
    return raw.select(F.col("value").cast("string").alias("value"))


def write_topic(df: DataFrame, brokers: str, topic: str, checkpoint: str):
    """K1: fixed-topic producer (at-least-once; exactly-once end-to-end is
    achieved by idempotent keyed sinks downstream, not producer txns)."""
    return (
        df.selectExpr("CAST(value AS STRING) AS value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def write_routed(
    df: DataFrame,
    brokers: str,
    checkpoint: str,
    route_col: str = "sink_table",
):
    """K2: per-record dynamic topic — rename the route column to `topic`
    and let the built-in sink route; no custom serializer needed."""
    return (
        df.withColumn("topic", F.col(route_col))
        .drop(route_col)
        .selectExpr("topic", "CAST(value AS STRING) AS value")
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def write_keyed(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint: str,
    key_col: str = "id",
):
    """K3 egress: keyed records to a compacted topic (last-write-wins)."""
    return (
        df.select(
            F.col(key_col).cast("string").alias("key"),
            F.to_json(F.struct(*df.columns)).alias("value"),
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
