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


# ---------------------------------------------------------------------------
# q7 shape: bilateral trade volume between two nations by ship year.
# Scale: fact side shuffles once (orders join); every dim broadcasts.
# ---------------------------------------------------------------------------
_N1, _N2 = "NATION_1", "NATION_2"


def tpch_q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == _N1) & (F.col("cust_nation") == _N2))
            | ((F.col("supp_nation") == _N2) & (F.col("cust_nation") == _N1))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        cents_amount(
            F.sum(
                money_cents(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                )
            )
        ).alias("revenue")
    )


_Q7_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{_N1}' AND n2.n_name = '{_N2}')
   OR (n1.n_name = '{_N2}' AND n2.n_name = '{_N1}')
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q10 shape: top-20 customers by returned-item revenue (deterministic rank
# tiebreak on custkey). Scale: agg first, then rank over the small result.
# ---------------------------------------------------------------------------
def tpch_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
        )
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.sum(
                money_cents(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                )
            ).alias("rev_c")
        )
    )
    w = Window.orderBy(F.col("rev_c").desc(), F.col("c_custkey"))
    return (
        per_cust.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "c_acctbal",
            cents_amount("rev_c").alias("revenue"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


_Q10_SQL = """
WITH per_cust AS (
    SELECT c_custkey, c_name, n_name, c_acctbal,
           sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                    AS BIGINT)) AS rev_c
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY 1, 2, 3, 4
)
SELECT c_custkey, c_name, n_name,
       c_acctbal,
       CAST(rev_c AS DOUBLE) / 100.0 AS revenue,
       CAST(rnk AS INTEGER) AS rnk
FROM (
    SELECT *, row_number() OVER (ORDER BY rev_c DESC, c_custkey) AS rnk
    FROM per_cust
) WHERE rnk <= 20
"""


# ---------------------------------------------------------------------------
# q14 shape: promo revenue share over one ship-year (single-row percentage;
# identical double arithmetic on both engines).
# ---------------------------------------------------------------------------
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    rev = money_cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    )
    agg = joined.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))).alias(
            "promo_c"
        ),
        F.sum(rev).alias("total_c"),
    )
    return agg.select(
        (
            F.col("promo_c").cast("double") * 100.0
            / F.col("total_c").cast("double")
        ).alias("promo_revenue_pct"),
        cents_amount("total_c").alias("total_revenue"),
    )


_Q14_SQL = """
SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                     THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                     + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
           * 100.0
           / CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                 + 0.5) AS BIGINT)) AS DOUBLE)
           AS promo_revenue_pct,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# q19 shape: disjunctive multi-branch predicate (brand/size/quantity bands) —
# the OR-of-ANDs pushdown stress test.
# ---------------------------------------------------------------------------
def tpch_q19_branch_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    qty = F.col("l_quantity")
    size = F.col("p_size")
    branch = (
        ((F.col("p_type") == "PROMO") & size.between(1, 15) & qty.between(1, 20))
        | ((F.col("p_type") == "SMALL") & size.between(10, 30) & qty.between(10, 30))
        | ((F.col("p_type") == "LARGE") & size.between(20, 50) & qty.between(20, 40))
    )
    return joined.filter(branch).agg(
        F.count(F.lit(1)).alias("lineitem_ct"),
        cents_amount(
            F.sum(
                money_cents(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                )
            )
        ).alias("revenue"),
    )


_Q19_SQL = """
SELECT CAST(count(*) AS BIGINT) AS lineitem_ct,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_type = 'PROMO' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_type = 'SMALL' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_type = 'LARGE' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
"""


# ---------------------------------------------------------------------------
# q6 shape: forecast revenue change — pure scan + filter + agg (the minimal
# pushdown benchmark: every predicate must reach the parquet reader).
# ---------------------------------------------------------------------------
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        cents_amount(
            F.sum(money_cents(F.col("l_extendedprice") * F.col("l_discount")))
        ).alias("revenue"),
        F.count(F.lit(1)).alias("lineitem_ct"),
    )


_Q6_SQL = """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
       CAST(count(*) AS BIGINT) AS lineitem_ct
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# q15 shape: top supplier(s) by revenue — agg + max-subquery join (ties kept,
# so the result is deterministic without ORDER BY/LIMIT).
# ---------------------------------------------------------------------------
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            money_cents(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
            )
        ).alias("rev_c")
    )
    top = rev.agg(F.max("rev_c").alias("max_rev_c"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top), rev.rev_c == top.max_rev_c)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name", cents_amount("rev_c").alias("total_revenue")
        )
    )


_Q15_SQL = """
WITH rev AS (
    SELECT l_suppkey,
           sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                    AS BIGINT)) AS rev_c
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY 1
)
SELECT s_suppkey, s_name, CAST(rev_c AS DOUBLE) / 100.0 AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rev_c = (SELECT max(rev_c) FROM rev)
"""


# ---------------------------------------------------------------------------
# q8 shape: one nation's market share of a part type's revenue per year.
# ---------------------------------------------------------------------------
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = money_cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    )
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
    )
    per_year = joined.groupBy(F.year("l_shipdate").alias("o_year")).agg(
        F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(F.lit(0))).alias(
            "nation_c"
        ),
        F.sum(rev).alias("total_c"),
    )
    return per_year.select(
        "o_year",
        (
            F.col("nation_c").cast("double") / F.col("total_c").cast("double")
        ).alias("mkt_share"),
        cents_amount("total_c").alias("total_revenue"),
    )


_Q8_SQL = """
SELECT CAST(year(l_shipdate) AS INTEGER) AS o_year,
       CAST(sum(CASE WHEN n_name = 'NATION_3'
                     THEN CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                     + 0.5) AS BIGINT) ELSE 0 END) AS DOUBLE)
           / CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100
                                 + 0.5) AS BIGINT)) AS DOUBLE) AS mkt_share,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS total_revenue
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_type = 'PROMO'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q22 shape: wealthy customers with no urgent orders (anti join + scalar avg
# subquery, integer-exact comparison: bal_c > avg ⟺ bal_c * n > sum).
# ---------------------------------------------------------------------------
def tpch_q22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    cust = load_table(spark, sf_dir, "customer").withColumn(
        "bal_c", money_cents("c_acctbal")
    )
    pos = cust.filter(F.col("bal_c") > 0)
    stats = pos.agg(
        F.sum("bal_c").alias("sum_c"), F.count(F.lit(1)).alias("n")
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    rich = pos.join(F.broadcast(stats)).filter(
        F.col("bal_c") * F.col("n") > F.col("sum_c")
    )
    idle = rich.join(
        urgent, rich.c_custkey == urgent.o_custkey, "left_anti"
    )
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        cents_amount(F.sum("bal_c")).alias("totacctbal"),
    )


_Q22_SQL = """
WITH pos AS (
    SELECT c_custkey, c_nationkey,
           CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
    FROM customer
    WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > 0
),
stats AS (SELECT sum(bal_c) AS sum_c, count(*) AS n FROM pos)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(bal_c) AS DOUBLE) / 100.0 AS totacctbal
FROM pos, stats
WHERE bal_c * n > sum_c
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q4 shape: priority of orders with at least one late-shipped item — the
# EXISTS (correlated, inequality residual) pattern as a left-semi join.
# Testdata has no l_commitdate/l_receiptdate; "late" = shipped >60 days
# after the order date. Scale: semi-join keyed on l_orderkey (one shuffle);
# the date inequality rides along as a residual predicate, so no row
# explosion — at most one probe hit per order.
# ---------------------------------------------------------------------------
def tpch_q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q9 shape: profit by supplier nation and ship year for one part family.
# Testdata has no partsupp/ps_supplycost; cost proxy = 60% of retail price
# per unit. Scale: the only shuffle is the final tiny groupBy — part,
# supplier, and nation all broadcast; profit arithmetic is exact (cents).
# ---------------------------------------------------------------------------
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit_c = money_cents(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    ) - money_cents(F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.6))
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year")
    ).agg(cents_amount(F.sum(profit_c)).alias("sum_profit"))


_Q9_SQL = """
SELECT n_name AS nation,
       CAST(year(l_shipdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                     AS BIGINT)
                - CAST(floor(p_retailprice * l_quantity * 0.6 * 100 + 0.5)
                       AS BIGINT)) AS DOUBLE) / 100.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q16 shape: distinct-supplier variety per part attribute triple, excluding
# a supplier blacklist — distinct aggregation + NOT IN (anti join).
# Substitutions: lineitem stands in for partsupp as the part↔supplier
# relation; blacklist = suppliers with negative balance. Scale: blacklist
# broadcasts into an anti join (no shuffle added); countDistinct triggers
# the standard two-phase distinct-agg expand on (brand,type,size) keys.
# ---------------------------------------------------------------------------
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") != "PROMO") & F.col("p_size").isin(1, 2, 3, 4, 5)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    joined = li.join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
    return joined.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO' AND p_size IN (1, 2, 3, 4, 5)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q21 shape: suppliers who alone shipped late in multi-supplier finalized
# orders — the double-correlated EXISTS / NOT EXISTS pattern. Spark-first
# formulation: instead of two self-joins against lineitem (which would
# shuffle the fact table three times), ONE groupBy(l_orderkey) collects the
# supplier set and the late-supplier set per order (bounded: ≤ items per
# order, so skew-safe); EXISTS ⇔ size(supps) > 1, NOT EXISTS ⇔
# size(late_set) = 1, and the lone late supplier pops out of the
# singleton set — a single fact shuffle total.
# ---------------------------------------------------------------------------
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    orders_f = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    pairs = li.join(orders_f, li.l_orderkey == orders_f.o_orderkey)
    late_cond = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 30 DAYS"
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.collect_set("l_suppkey").alias("supps"),
        F.collect_set(F.when(late_cond, F.col("l_suppkey"))).alias("late_set"),
    )
    waiting = per_order.filter(
        (F.size("supps") > 1) & (F.size("late_set") == 1)
    ).select(F.explode("late_set").alias("l_suppkey"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q21_SQL = """
WITH late AS (
    SELECT DISTINCT l_orderkey AS okey, l_suppkey AS skey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1 JOIN supplier ON l1.skey = s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.okey AND l2.l_suppkey <> l1.skey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.okey = l1.okey AND l3.skey <> l1.skey)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q2 shape: cheapest supplier per part — the correlated-min-subquery pattern
# (ties kept, so deterministic without LIMIT). Substitutions: lineitem is
# the part↔supplier relation; "cost" = supplier account balance. Spark-first:
# the correlated `= (SELECT min ...)` becomes a window min over p_partkey on
# the already-shuffled distinct pairs — no join back, no second scan.
# ---------------------------------------------------------------------------
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 3)
    supp = load_table(spark, sf_dir, "supplier").withColumn(
        "bal_c", money_cents("s_acctbal")
    )
    ps = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_name", "l_suppkey")
        .distinct()
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.withColumn("min_bal_c", F.min("bal_c").over(w))
        .filter(F.col("bal_c") == F.col("min_bal_c"))
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            cents_amount("bal_c").alias("s_acctbal"),
        )
    )


_Q2_SQL = """
WITH ps AS (
    SELECT DISTINCT p_partkey, p_name, l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size <= 3
),
psb AS (
    SELECT p_partkey, p_name, s_suppkey, s_name,
           CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS bal_c
    FROM ps JOIN supplier ON l_suppkey = s_suppkey
)
SELECT p_partkey, p_name, s_suppkey, s_name,
       CAST(bal_c AS DOUBLE) / 100.0 AS s_acctbal
FROM psb p1
WHERE bal_c = (SELECT min(bal_c) FROM psb p2
               WHERE p2.p_partkey = p1.p_partkey)
"""


# ---------------------------------------------------------------------------
# q11 shape: important-stock value share — per-part value from one nation
# group's suppliers, kept when above a global-threshold scalar subquery.
# The driver schema has no partsupp table (TESTDATA.md), so "stock value"
# is adapted to shipped value sum(l_extendedprice*(1-l_discount)) per part
# (reference shape: TPC-H q11 HAVING sum(...) > fraction * SELECT sum(...)).
# Threshold test stays in integer cents (1000*val_c > total_c) so the oracle
# comparison is exact. Scale: one shuffle on l_partkey with map-side combine;
# the global total is a one-row broadcast cross join — never a
# single-partition window over the fact table.
# ---------------------------------------------------------------------------
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    nation_supp = supp.join(
        F.broadcast(nat), supp.s_nationkey == nat.n_nationkey
    ).select("s_suppkey")
    val = (
        li.join(F.broadcast(nation_supp), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                money_cents(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
                )
            ).alias("val_c")
        )
    )
    total = val.agg(F.sum("val_c").alias("total_c"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("val_c") * 1000 > F.col("total_c"))
        .select(
            F.col("l_partkey").alias("partkey"),
            cents_amount("val_c").alias("part_value"),
        )
        .orderBy(F.col("part_value").desc(), "partkey")
    )


_Q11_SQL = """
WITH val AS (
    SELECT l_partkey,
           sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                    AS BIGINT)) AS val_c
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_3', 'NATION_7')
    GROUP BY 1
)
SELECT l_partkey AS partkey, CAST(val_c AS DOUBLE) / 100.0 AS part_value
FROM val
WHERE val_c * 1000 > (SELECT sum(val_c) FROM val)
ORDER BY part_value DESC, partkey
"""


# ---------------------------------------------------------------------------
# q12 shape: shipping-priority classification — fact-fact join + boolean
# bucket aggregation (SUM of CASE WHEN). The driver schema has no
# l_shipmode / l_commitdate / l_receiptdate, so the mode dimension is
# adapted to l_linestatus and the lateness predicate to a ship-year slice;
# the aggregation shape is TPC-H q12's. Scale: the ship-year filter is
# pushed to the parquet scan; the join shuffles both facts on orderkey.
# ---------------------------------------------------------------------------
def tpch_q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q20 shape: dominant-supplier promotion — TPC-H q20's nested correlated
# aggregate (ps_availqty > 0.5 * sum(l_quantity)) re-expressed without
# partsupp as a per-part share test: suppliers shipping more than half of a
# 'large %' part's total ship-year quantity, semi-joined back to supplier.
# Quantity kept in integer cents so the half-share test (2*qty > tot) is
# exact. Scale: the window runs over the (part, supp) aggregate — fact
# cardinality already collapsed by the groupBy — partitioned on l_partkey,
# and the supplier probe is a broadcast semi-join.
# ---------------------------------------------------------------------------
def tpch_q20_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").startswith("large")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pq = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(money_cents("l_quantity")).alias("qty_c"))
    )
    w = Window.partitionBy("l_partkey")
    dom = pq.withColumn("tot_c", F.sum("qty_c").over(w)).filter(
        2 * F.col("qty_c") > F.col("tot_c")
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(dom, supp.s_suppkey == dom.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


_Q20_SQL = """
WITH pq AS (
    SELECT l_partkey, l_suppkey,
           sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_c
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'large%'
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey FROM pq p1
    WHERE 2 * qty_c > (SELECT sum(qty_c) FROM pq p2
                       WHERE p2.l_partkey = p1.l_partkey))
ORDER BY s_suppkey
"""


QUERIES = {
    "tpch_q1_pricing_summary": tpch_q1_pricing_summary,
    "tpch_q3_shipping_priority": tpch_q3_shipping_priority,
    "top_users_by_event_type": top_users_by_event_type,
    "tpch_q7_nation_trade": tpch_q7_nation_trade,
    "tpch_q10_returned_revenue": tpch_q10_returned_revenue,
    "tpch_q14_promo_share": tpch_q14_promo_share,
    "tpch_q19_branch_revenue": tpch_q19_branch_revenue,
    "tpch_q6_forecast_revenue": tpch_q6_forecast_revenue,
    "tpch_q8_market_share": tpch_q8_market_share,
    "tpch_q15_top_supplier": tpch_q15_top_supplier,
    "tpch_q22_idle_balances": tpch_q22_idle_balances,
    "tpch_q4_late_orders": tpch_q4_late_orders,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q16_supplier_variety": tpch_q16_supplier_variety,
    "tpch_q21_waiting_supplier": tpch_q21_waiting_supplier,
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q11_important_stock": tpch_q11_important_stock,
    "tpch_q12_priority_lines": tpch_q12_priority_lines,
    "tpch_q20_dominant_supplier": tpch_q20_dominant_supplier,
}

ORACLE = {
    "tpch_q1_pricing_summary": _Q1_SQL,
    "tpch_q3_shipping_priority": _Q3_SQL,
    "top_users_by_event_type": _TOP_USERS_SQL,
    "tpch_q7_nation_trade": _Q7_SQL,
    "tpch_q10_returned_revenue": _Q10_SQL,
    "tpch_q14_promo_share": _Q14_SQL,
    "tpch_q19_branch_revenue": _Q19_SQL,
    "tpch_q6_forecast_revenue": _Q6_SQL,
    "tpch_q8_market_share": _Q8_SQL,
    "tpch_q15_top_supplier": _Q15_SQL,
    "tpch_q22_idle_balances": _Q22_SQL,
    "tpch_q4_late_orders": _Q4_SQL,
    "tpch_q9_product_profit": _Q9_SQL,
    "tpch_q16_supplier_variety": _Q16_SQL,
    "tpch_q21_waiting_supplier": _Q21_SQL,
    "tpch_q2_min_cost_supplier": _Q2_SQL,
    "tpch_q11_important_stock": _Q11_SQL,
    "tpch_q12_priority_lines": _Q12_SQL,
    "tpch_q20_dominant_supplier": _Q20_SQL,
}
