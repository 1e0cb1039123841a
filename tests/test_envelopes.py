"""Changelog-envelope sources (S3 Maxwell / S4 Debezium / P3-P5 / K3
compaction) driven with in-memory JSON strings — the same value-string
contract a Kafka readStream would feed."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.sources import envelopes as env


def _df_of_values(spark, rows):
    return spark.createDataFrame([(json.dumps(r),) for r in rows], "value string")


MAXWELL_ROWS = [
    {
        "database": "gmall",
        "table": "cart_info",
        "type": "insert",
        "ts": 1000,
        "data": {"id": "1", "user_id": "u1", "sku_id": "s1", "sku_num": "2"},
        "old": None,
    },
    {
        "database": "gmall",
        "table": "cart_info",
        "type": "update",
        "ts": 2000,
        "data": {"id": "1", "user_id": "u1", "sku_id": "s1", "sku_num": "5"},
        "old": {"sku_num": "2"},
    },
    {
        "database": "gmall",
        "table": "cart_info",
        "type": "delete",
        "ts": 3000,
        "data": {"id": "2", "user_id": "u2", "sku_id": "s2", "sku_num": "1"},
        "old": None,
    },
    {
        "database": "gmall",
        "table": "order_info",
        "type": "bootstrap-insert",
        "ts": 500,
        "data": {"id": "9", "user_id": "u9"},
        "old": None,
    },
]


def test_parse_maxwell_schema(spark):
    parsed = env.parse_maxwell(_df_of_values(spark, MAXWELL_ROWS))
    assert set(parsed.columns) == {"database", "table", "type", "ts", "data", "old"}
    rows = parsed.orderBy("ts").collect()
    assert rows[1]["data"]["sku_num"] == "2"  # ts=1000 insert
    assert rows[2]["old"]["sku_num"] == "2"  # update carries old image


def test_filter_upserts_p3(spark):
    parsed = env.parse_maxwell(_df_of_values(spark, MAXWELL_ROWS))
    kept = env.filter_upserts(parsed)
    assert sorted(r["type"] for r in kept.collect()) == [
        "bootstrap-insert",
        "insert",
        "update",
    ]


def test_table_rows_projection_p4_p5(spark):
    parsed = env.parse_maxwell(_df_of_values(spark, MAXWELL_ROWS))
    cart = env.table_rows(
        parsed, "gmall", "cart_info", ["id", "user_id", "sku_num"]
    )
    got = {(r["id"], r["type"]): r["sku_num"] for r in cart.collect()}
    assert got[("1", "insert")] == "2"
    assert got[("1", "update")] == "5"
    assert ("9", "bootstrap-insert") not in got  # other table filtered out


def test_changelog_latest_compaction(spark):
    parsed = env.parse_maxwell(_df_of_values(spark, MAXWELL_ROWS))
    cart = env.table_rows(
        parsed, "gmall", "cart_info", ["id", "user_id", "sku_num"]
    )
    current = env.changelog_latest(cart, ["id"], ts_col="ts")
    rows = {r["id"]: r for r in current.collect()}
    assert rows["1"]["sku_num"] == "5"  # update won over insert
    assert "2" not in rows  # last op was delete => key gone


DEBEZIUM_ROWS = [
    {
        "before": None,
        "after": {"source_table": "cart_info", "sink_table": "dwd_cart"},
        "op": "r",
        "ts_ms": 1,
        "source": {"db": "gmall_config", "table": "table_process"},
    },
    {
        "before": {"source_table": "cart_info", "sink_table": "dwd_cart"},
        "after": None,
        "op": "d",
        "ts_ms": 2,
        "source": {"db": "gmall_config", "table": "table_process"},
    },
]


def test_parse_debezium_and_current_row(spark):
    deb = env.parse_debezium(_df_of_values(spark, DEBEZIUM_ROWS))
    cur = env.debezium_current_row(deb).orderBy("ts_ms").collect()
    assert cur[0]["op"] == "r"
    assert cur[0]["row"]["sink_table"] == "dwd_cart"  # after image
    assert cur[1]["op"] == "d"
    assert cur[1]["row"]["source_table"] == "cart_info"  # before image


def test_changelog_latest_on_debezium(spark):
    deb = env.parse_debezium(_df_of_values(spark, DEBEZIUM_ROWS))
    cur = env.debezium_current_row(deb).select(
        "op", "ts_ms", F.col("row")["source_table"].alias("source_table")
    )
    latest = env.changelog_latest(
        cur, ["source_table"], ts_col="ts_ms", op_col="op"
    )
    assert latest.count() == 0  # delete arrived last => rule removed (T7)
