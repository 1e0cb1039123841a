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


def zvalue(col_a: str, col_b: str, bits: int = 16) -> "F.Column":
    """Interleave the low `bits` of two non-negative integer columns (by
    name) into a Morton (Z-order) key — pure shift/mask SQL expressions,
    fully inside whole-stage codegen.

    Clustering a fact table by the z-key gives BOTH columns locality in
    every file/row group, so parquet min/max statistics prune scans for
    predicates on EITHER column — the layout answer when a 100 TB table
    has two independent access paths (e.g. user_id point lookups AND time
    ranges) and single-column sorting would sacrifice one of them.
    """
    # Shift in BIGINT: shiftleft returns its input's type, so an int32
    # column at bits=16 would set the int32 sign bit (2*15+1 = 31) and
    # produce negative keys that silently split the z-curve in two.
    a = f"CAST({col_a} AS BIGINT)"
    b = f"CAST({col_b} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"shiftleft(shiftright({a}, {i}) & 1, {2 * i})")
        terms.append(f"shiftleft(shiftright({b}, {i}) & 1, {2 * i + 1})")
    return F.expr(" | ".join(terms)).cast("bigint")


def export_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
    block_bytes: int | None = None,
) -> None:
    """Write `df` clustered by the Morton key of (col_a, col_b): range
    partitioning keeps each output file a contiguous z-range, and the
    within-file sort keeps row-group min/max tight on both dimensions.

    Inputs must already be scaled to non-negative ints that fit `bits` —
    and to EQUAL effective bit widths: if one dimension's domain uses far
    fewer high bits than the other, the interleaved key degenerates into
    single-column order and that dimension loses its pruning (scale the
    wider domain down, e.g. bucket timestamps, before calling).

    `block_bytes` shrinks parquet row groups below the 128 MiB default —
    pruning granularity IS row-group granularity, so smaller groups trade
    a little scan throughput for much finer min/max skipping."""
    out = df.withColumn("_z", zvalue(col_a, col_b, bits))
    w = (
        out.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
    )
    if block_bytes:
        w = w.option("parquet.block.size", block_bytes)
    w.parquet(path)


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
