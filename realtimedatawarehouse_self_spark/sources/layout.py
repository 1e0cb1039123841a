"""Physical table layout: partitioned / bucketed writes and pruning.

At 100 TB the dominant cost is the scan, and the dominant scan win is
reading less: date-partitioned fact tables give partition pruning
(directories skipped before any I/O), and bucketing by join key gives
shuffle-free joins between co-bucketed tables.

The reference has no table layout at all (row streams into Kafka/Phoenix/
ClickHouse); this module is the engine's serving-layer layout policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Write a fact table partitioned by event date (`dt=YYYY-MM-DD/` dirs).

    Queries filtering on `dt` scan only matching directories — verify with
    `.explain`: the scan shows `PartitionFilters` and the non-matching
    partitions are never opened.
    """
    df.withColumn("dt", F.date_format(F.col(ts_col), "yyyy-MM-dd")).write.mode(
        mode
    ).partitionBy("dt").parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table: joins/aggregations on
    `bucket_col` between co-bucketed tables skip the shuffle entirely.

    (Bucketing requires `saveAsTable` — file-based `parquet(path)` writes
    cannot carry bucket metadata.)
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table_name)
    )
