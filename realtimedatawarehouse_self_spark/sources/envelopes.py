"""Changelog-envelope sources: Maxwell and Debezium parsing + compaction.

The reference ingests two changelog formats:

- **Maxwell** (`topic_db`): ``{database, table, type, ts, data:{...},
  old:{...}}`` — declared as an all-string DDL with MAP<STRING,STRING>
  payloads (MyKafkaUtil.java:139-148; sample documented at
  DwdTradeCartAdd.java:52-74).
- **Debezium** (FlinkCDC config stream): ``{before:{...}, after:{...},
  op, ts_ms, source:{db, table}}`` (FlinkCDC_MysqlSource.java:47-60;
  envelope documented at DIM_MyBroadcastFunction.java:26-59).

Both become plain `from_json` parses here — the same code path serves a
Kafka `readStream` value column, a file stream, or a batch DataFrame of
strings, which is how the tests drive it without a broker.

Scale notes:
- the envelope parse is one codegen'd `from_json` per row — no Python;
- `changelog_latest` compacts a changelog to current state with one
  shuffle on the primary key (max-ts row wins, delete ops drop the key) —
  the batch analogue of the reference's upsert-Kafka/Phoenix sinks;
- op filtering (P3) happens before any shuffle so deletes/bootstrap noise
  never travel the network.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

_S = StringType()
_MAP = MapType(StringType(), StringType())

# S3: Maxwell envelope (MyKafkaUtil.java:139-148 getTopicDbDDL).
MAXWELL_SCHEMA = StructType(
    [
        StructField("database", _S),
        StructField("table", _S),
        StructField("type", _S),
        StructField("ts", LongType()),
        StructField("data", _MAP),
        StructField("old", _MAP),
    ]
)

# S4: Debezium envelope (DIM_MyBroadcastFunction.java:26-59).
DEBEZIUM_SCHEMA = StructType(
    [
        StructField("before", _MAP),
        StructField("after", _MAP),
        StructField("op", _S),
        StructField("ts_ms", LongType()),
        StructField(
            "source",
            StructType([StructField("db", _S), StructField("table", _S)]),
        ),
    ]
)

# P3: CDC op-type whitelist (DimApp.java:50-68).
MAXWELL_UPSERT_TYPES = ("insert", "update", "bootstrap-insert")


def parse_maxwell(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """value-string stream -> typed Maxwell envelope columns (S3)."""
    return raw.select(
        F.from_json(F.col(value_col), MAXWELL_SCHEMA).alias("m")
    ).select("m.*")


def parse_debezium(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """value-string stream -> typed Debezium envelope columns (S4)."""
    return raw.select(
        F.from_json(F.col(value_col), DEBEZIUM_SCHEMA).alias("d")
    ).select("d.*")


def filter_upserts(maxwell: DataFrame) -> DataFrame:
    """P3: keep only insert/update/bootstrap-insert envelopes."""
    return maxwell.filter(F.col("type").isin(*MAXWELL_UPSERT_TYPES))


def table_rows(
    maxwell: DataFrame, database: str, table: str, columns: list[str]
) -> DataFrame:
    """P4+P5: one business table's rows projected out of the `data` map.

    Reference shape: ``data['id'] id, ... WHERE database='gmall' AND
    table='cart_info'`` (DwdTradeCartAdd.java:80-98).
    """
    return maxwell.filter(
        (F.col("database") == database) & (F.col("table") == table)
    ).select(
        "type",
        "ts",
        *[F.element_at("data", c).alias(c) for c in columns],
    )


def debezium_current_row(deb: DataFrame) -> DataFrame:
    """Normalize a Debezium envelope to (op, key-source row): `after` for
    create/read/update, `before` for delete (T7 CRUD source,
    DIM_MyBroadcastFunction.java:95-135)."""
    return deb.select(
        "op",
        "ts_ms",
        F.when(F.col("op") == "d", F.col("before"))
        .otherwise(F.col("after"))
        .alias("row"),
    )


def changelog_latest(
    changes: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    op_col: str = "type",
    delete_ops: tuple = ("delete", "d"),
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Compact a changelog to current state: last change per key wins;
    keys whose last change is a delete disappear.

    This is the engine's substitution for upsert-Kafka retraction streams
    (K3, MyKafkaUtil.java:129-137): instead of emitting tombstones for
    downstream consumers to null-check (BaseDBApp.java:53), state is
    resolved here with one shuffle on the key.
    """
    order = [F.col(ts_col).desc()] + [
        F.col(c).desc() for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .filter(~F.col(op_col).isin(*delete_ops))
    )
