"""Analytical headline queries (TPC-H-shaped) over the driver testdata.

The reference implements no sorts/limits/top-k/ranking (SURVEY.md §2.10);
Spark supplies them natively, and these queries expose that surface —
they also serve as the bench workload's scan/agg/join stress tests.

Scale notes: q1 is a pure scan+partial-agg (map-side combine, 6 groups);
q3 broadcast-joins customer and shuffles only the orders/lineitem equi-join;
rank queries use high-cardinality partitions (no single-reducer sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.exprs import cents_amount, money_cents
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table


def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(money_cents("l_quantity")).alias("qty_c"),
        cents_amount(F.sum(money_cents("l_extendedprice"))).alias("sum_base_price"),
        cents_amount(
            F.sum(
                money_cents(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                )
            )
        ).alias("sum_disc_price"),
        cents_amount(
            F.sum(
                money_cents(
                    F.col("l_extendedprice")
                    * (F.lit(1.0) - F.col("l_discount"))
                    * (F.lit(1.0) + F.col("l_tax"))
                )
            )
        ).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        cents_amount(F.col("qty_c")).alias("sum_qty"),
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "count_order",
        (F.col("qty_c").cast("double") / 100.0 / F.col("count_order")).alias(
            "avg_qty"
        ),
    )


_Q1_SQL = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
           AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           / 100.0 AS sum_base_price,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                           * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
           AS sum_charge,
       CAST(count(*) AS BIGINT) AS count_order,
       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
           / count(*) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    joined = li.join(
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
        li.l_orderkey == orders.o_orderkey,
    )
    agg = joined.groupBy(
        "l_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        "o_orderpriority",
    ).agg(
        cents_amount(
            F.sum(
                money_cents(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                )
            )
        ).alias("revenue")
    )
    return agg.orderBy(F.col("revenue").desc(), F.col("l_orderkey")).limit(10)


_Q3_SQL = """
SELECT l_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       o_orderpriority,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def top_users_by_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/analytic window surface (absent from the reference — §2.10)."""
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events")
    totals = ev.groupBy("event_type", "user_id").agg(
        cents_amount(F.sum(money_cents("value"))).alias("total_value"),
        F.count(F.lit(1)).alias("event_ct"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), F.col("user_id")
    )
    return totals.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 3
    )


_TOP_USERS_SQL = """
WITH totals AS (
    SELECT event_type, user_id,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS total_value,
           CAST(count(*) AS BIGINT) AS event_ct
    FROM events GROUP BY 1, 2
)
SELECT * FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY event_type
                   ORDER BY total_value DESC, user_id) AS INTEGER) AS rnk
    FROM totals
) WHERE rnk <= 3
"""


QUERIES = {
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "top_users_by_event_type": top_users_by_event_type,
}

ORACLE = {
    "tpch_q1_pricing_summary": _Q1_SQL,
    "tpch_q3_shipping_priority": _Q3_SQL,
    "top_users_by_event_type": _TOP_USERS_SQL,
}
