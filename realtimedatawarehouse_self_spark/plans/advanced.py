"""Second wave of operator families: the T1 visitor-repair batch twin, the
classic decision-support join/aggregation shapes (TPC-H q13/q17/q18 forms),
pivot, exact discrete percentiles, sliding windows, and cube.

Scale notes (100 TB design):
- q13 pre-aggregates orders on o_custkey before the customer join, so the
  join carries one count row per customer instead of raw orders;
- q17 rewrites `qty < 0.2 * avg(qty) per part` into pure integer arithmetic
  (5 * qty * cnt < sum_qty) — exact across engines and no correlated
  re-scan: one aggregate + one re-join on l_partkey;
- q18's HAVING filter reduces lineitem to qualifying orderkeys before any
  join (semi-join shape), so orders/customer only see the tiny survivor set;
- percentiles are *discrete* (value at ceil(p*n), no interpolation) so the
  result is an actual data value and engine-exact; at 100 TB swap in
  approx_percentile — documented, not silently substituted;
- sliding windows assign each row to size/slide buckets map-side; state is
  bounded by (#windows x #keys), not row count;
- pivot uses an explicit value list (no discovery job) — required practice
  at scale.

Reference parity notes: T1 semantics from BaseLogApp.java:76-106 (new/old
visitor repair keyed on mid); everything else is SURVEY.md §2.10 families
the reference lacks but this engine exposes natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.exprs import (
    TS_FMT,
    cents_amount,
    money_cents,
    window_bounds,
)
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table


def _t(spark, sf_dir, name, **kw):
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, name, **kw)


# ---------------------------------------------------------------------------
# T1 batch twin — new/old visitor repair (BaseLogApp.java:76-106): an event
# is a "new visitor" event iff it falls on the user's first-ever active day.
# The streaming twin is streaming/stateful.py::visitor_repair.
# ---------------------------------------------------------------------------
def visitor_repair_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.to_date("ts").alias("dt")
    )
    w = Window.partitionBy("user_id")
    return ev.withColumn("first_dt", F.min("dt").over(w)).select(
        "event_id",
        "user_id",
        F.when(F.col("dt") == F.col("first_dt"), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_new"),
    )


_VISITOR_REPAIR_SQL = """
SELECT event_id, user_id,
       CAST(CASE WHEN CAST(ts AS DATE) =
                      min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
                 THEN 1 ELSE 0 END AS BIGINT) AS is_new
FROM events
"""


# ---------------------------------------------------------------------------
# q13 shape: customer order-count distribution (left outer join + two-level
# aggregation, counting the zero-order customers).
# ---------------------------------------------------------------------------
def tpch_q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    counts = cust.join(
        per_cust, cust.c_custkey == per_cust.o_custkey, "left"
    ).select(F.coalesce("c_count", F.lit(0)).alias("c_count"))
    return counts.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


_Q13_SQL = """
WITH per_cust AS (
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS c_count
    FROM orders WHERE o_orderpriority <> '1-URGENT'
    GROUP BY 1
)
SELECT COALESCE(c_count, 0) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q17 shape: revenue from small-quantity lineitems of one brand, where
# "small" = below 20% of the part's average quantity. Integer rewrite:
# qty < 0.2 * (sum/cnt)  <=>  5 * qty * cnt < sum   (all exact bigints).
# ---------------------------------------------------------------------------
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
    )
    small = li.join(per_part.withColumnRenamed("l_partkey", "agg_partkey"),
                    F.col("l_partkey") == F.col("agg_partkey")).filter(
        5 * F.col("l_quantity").cast("bigint") * F.col("cnt") < F.col("sum_qty")
    )
    return small.agg(
        F.count(F.lit(1)).alias("small_lineitem_ct"),
        (
            F.sum(money_cents("l_extendedprice")).cast("double") / 100.0 / 7.0
        ).alias("avg_yearly"),
    )


_Q17_SQL = """
WITH li AS (
    SELECT l_partkey, l_quantity, l_extendedprice
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#23'
),
per_part AS (
    SELECT l_partkey AS agg_partkey,
           CAST(count(*) AS BIGINT) AS cnt,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM li GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS small_lineitem_ct,
       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           / 100.0 / 7.0 AS avg_yearly
FROM li JOIN per_part ON l_partkey = agg_partkey
WHERE 5 * CAST(l_quantity AS BIGINT) * cnt < sum_qty
"""


# ---------------------------------------------------------------------------
# q18 shape: large-volume orders (HAVING sum(qty) > 250) joined back to
# orders + customer.
# ---------------------------------------------------------------------------
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    big = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", TS_FMT).alias("o_orderdate"),
            cents_amount(money_cents("o_totalprice")).alias("o_totalprice"),
            "total_qty",
        )
    )


_Q18_SQL = """
WITH big AS (
    SELECT l_orderkey,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY 1
    HAVING sum(CAST(l_quantity AS BIGINT)) > 250
)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       CAST(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS DOUBLE) / 100.0
           AS o_totalprice,
       total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------------
# Pivot: day x event_type count matrix with an explicit pivot value list
# (no distinct-discovery job — mandatory at scale).
# ---------------------------------------------------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_daily_event_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    pivoted = (
        ev.groupBy("dt")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return pivoted.select(
        "dt",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("bigint").alias(f"{t}_ct")
            for t in EVENT_TYPES
        ],
    )


_PIVOT_COLS = ",\n       ".join(
    f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}_ct"
    for t in EVENT_TYPES
)
_PIVOT_SQL = f"""
SELECT strftime(ts, '%Y-%m-%d') AS dt,
       {_PIVOT_COLS}
FROM events
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Exact discrete percentiles per group: the value at position ceil(p*n) in
# (value, event_id) order — an actual data value, bit-identical across
# engines. The 100 TB path swaps in approx_percentile.
# ---------------------------------------------------------------------------
PCTS = ((50, 0.5), (90, 0.9), (99, 0.99))


def event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value", "event_id")
    # NULL placement pinned on BOTH sides: Spark defaults to NULLS FIRST
    # ascending, DuckDB to NULLS LAST — data-dependent oracle drift if any
    # NULL values ever appear.
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc_nulls_last(), "event_id"
    )
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    )
    return ranked.groupBy("event_type").agg(
        *[
            F.max(
                F.when(
                    F.col("rn") == F.ceil(F.col("n") * F.lit(p)), F.col("value")
                )
            ).alias(f"p{label}")
            for label, p in PCTS
        ]
    )


_PCT_COLS = ",\n       ".join(
    f"max(CASE WHEN rn = CAST(ceil(n * {p}) AS BIGINT) THEN value END) AS p{label}"
    for label, p in PCTS
)
_PCT_SQL = f"""
WITH ranked AS (
    SELECT event_type, value,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY value NULLS LAST, event_id) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM events
)
SELECT event_type,
       {_PCT_COLS}
FROM ranked
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Funnel / sequence analytics: per-user ordered stage progression
# signup -> view -> purchase, each stage within a 1-day conversion window
# after the previous stage (strictly later, <= window). Chained
# aggregations on the same key — each groupBy reuses the prior shuffle's
# partitioning — then one tiny global rollup; no self-joins, no per-user
# sort beyond the hash aggregate.
# ---------------------------------------------------------------------------
FUNNEL_STAGES = ("signup", "view", "purchase")
FUNNEL_WINDOW = "1 day"


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == FUNNEL_STAGES[0], F.col("ts"))).alias(
            "t1"
        )
    )
    with_s1 = ev.join(s1, "user_id")
    s2 = with_s1.groupBy("user_id").agg(
        F.first("t1").alias("t1"),
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STAGES[1])
                & (F.col("ts") > F.col("t1"))
                & (F.col("ts") <= F.col("t1") + F.expr(f"interval {FUNNEL_WINDOW}")),
                F.col("ts"),
            )
        ).alias("t2"),
    )
    with_s2 = ev.join(s2, "user_id")
    s3 = with_s2.groupBy("user_id").agg(
        F.first("t1").alias("t1"),
        F.first("t2").alias("t2"),
        F.min(
            F.when(
                (F.col("event_type") == FUNNEL_STAGES[2])
                & (F.col("ts") > F.col("t2"))
                & (F.col("ts") <= F.col("t2") + F.expr(f"interval {FUNNEL_WINDOW}")),
                F.col("ts"),
            )
        ).alias("t3"),
    )
    return s3.agg(
        F.count(F.lit(1)).alias("users_total"),
        F.sum(F.when(F.col("t1").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("stage1_ct"),
        F.sum(F.when(F.col("t2").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("stage2_ct"),
        F.sum(F.when(F.col("t3").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("stage3_ct"),
    )


_FUNNEL_SQL = f"""
WITH s1 AS (
    SELECT user_id,
           min(CASE WHEN event_type = '{FUNNEL_STAGES[0]}' THEN ts END) AS t1
    FROM events GROUP BY 1
),
s2 AS (
    SELECT e.user_id, any_value(s1.t1) AS t1,
           min(CASE WHEN e.event_type = '{FUNNEL_STAGES[1]}'
                     AND e.ts > s1.t1
                     AND e.ts <= s1.t1 + INTERVAL {FUNNEL_WINDOW}
                THEN e.ts END) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    GROUP BY 1
),
s3 AS (
    SELECT e.user_id, any_value(s2.t1) AS t1, any_value(s2.t2) AS t2,
           min(CASE WHEN e.event_type = '{FUNNEL_STAGES[2]}'
                     AND e.ts > s2.t2
                     AND e.ts <= s2.t2 + INTERVAL {FUNNEL_WINDOW}
                THEN e.ts END) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    GROUP BY 1
)
SELECT CAST(count(*) AS BIGINT) AS users_total,
       CAST(sum(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS stage1_ct,
       CAST(sum(CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS stage2_ct,
       CAST(sum(CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS stage3_ct
FROM s3
"""


# ---------------------------------------------------------------------------
# Sliding windows: 1 h windows every 30 min (the reference only has tumbling
# — SURVEY.md §2.7 "not present"; Spark supplies slide natively).
# ---------------------------------------------------------------------------
def sliding_window_traffic(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("event_ct"),
        cents_amount(F.sum(money_cents("value"))).alias("total_value"),
    )
    return agg.select(*window_bounds("w"), "event_type", "event_ct", "total_value")


_SLIDING_SQL = """
WITH assigned AS (
    SELECT time_bucket(INTERVAL '30 minutes', ts) AS wstart, event_type, value
    FROM events
    UNION ALL
    SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes',
           event_type, value
    FROM events
)
SELECT strftime(wstart, '%Y-%m-%d %H:%M:%S') AS stt,
       strftime(wstart + INTERVAL '1 hour', '%Y-%m-%d %H:%M:%S') AS edt,
       event_type,
       CAST(count(*) AS BIGINT) AS event_ct,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
           AS total_value
FROM assigned
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# Cube: brand x type part stats with subtotal rows on both axes.
# ---------------------------------------------------------------------------
def cube_part_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return (
        part.cube("p_brand", "p_type")
        .agg(
            F.count(F.lit(1)).alias("part_ct"),
            cents_amount(F.sum(money_cents("p_retailprice"))).alias(
                "total_retail"
            ),
            F.sum(F.col("p_size").cast("bigint")).alias("total_size"),
        )
        .select(
            F.coalesce("p_brand", F.lit("<all>")).alias("p_brand"),
            F.coalesce("p_type", F.lit("<all>")).alias("p_type"),
            "part_ct",
            "total_retail",
            "total_size",
        )
    )


_CUBE_SQL = """
SELECT COALESCE(p_brand, '<all>') AS p_brand,
       COALESCE(p_type, '<all>') AS p_type,
       CAST(count(*) AS BIGINT) AS part_ct,
       CAST(sum(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)
           / 100.0 AS total_retail,
       CAST(sum(CAST(p_size AS BIGINT)) AS BIGINT) AS total_size
FROM part
GROUP BY CUBE(p_brand, p_type)
"""


# ---------------------------------------------------------------------------
# GROUPING SETS (distinct from rollup/cube): exactly the requested subtotal
# combinations, via the engine's SQL front-end.
# ---------------------------------------------------------------------------
def grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.createOrReplaceTempView("__gs_events")
    return spark.sql(
        """
        SELECT COALESCE(event_type, '<all>') AS event_type,
               COALESCE(dt, '<all>') AS dt,
               CAST(count(*) AS BIGINT) AS event_ct
        FROM __gs_events
        GROUP BY GROUPING SETS ((event_type, dt), (event_type), ())
        """
    )


_GROUPING_SETS_SQL = """
SELECT COALESCE(event_type, '<all>') AS event_type,
       COALESCE(dt, '<all>') AS dt,
       CAST(count(*) AS BIGINT) AS event_ct
FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt FROM events)
GROUP BY GROUPING SETS ((event_type, dt), (event_type), ())
"""


# ---------------------------------------------------------------------------
# Window frames: per-user running total + 4-row moving average (ROWS frames;
# exact integer cents inside the frame, one shuffle on user_id).
# ---------------------------------------------------------------------------
def window_frames_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", money_cents("value").alias("v_c")
    )
    # explicit NULLS LAST: a NULL-ts event still carries spend, so it
    # stays in the frame — but Spark's ASC default is NULLS FIRST while
    # DuckDB's is NULLS LAST, so the position must be pinned (r9 NULL-ts
    # fixture class); event_id breaks ties inside the NULL group
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc_nulls_last(), "event_id"
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-3, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        cents_amount(F.sum("v_c").over(run)).alias("running_total"),
        (
            F.sum("v_c").over(mov).cast("double")
            / 100.0
            / F.count(F.lit(1)).over(mov)
        ).alias("moving_avg_4"),
    )


_WINDOW_FRAMES_SQL = """
SELECT event_id, user_id,
       CAST(sum(v_c) OVER run AS DOUBLE) / 100.0 AS running_total,
       CAST(sum(v_c) OVER mov AS DOUBLE) / 100.0
           / count(*) OVER mov AS moving_avg_4
FROM (SELECT event_id, user_id, ts,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
      FROM events)
WINDOW run AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       mov AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id
               ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# Window RANKING surface — the ranking-family companion to
# `window_frames_running_spend` (frames) and core.py's
# scalar_function_surface (scalars): rank, dense_rank, percent_rank,
# cume_dist, ntile, lead/lag and nth/first/last_value in ONE query over
# the per-type daily-count frame, exercising the tie semantics that
# distinguish them (the value windows order by ct ALONE, so tied days
# genuinely share rank / split dense_rank; the navigation windows order by
# the total (ct, d) key, the only way lead/ntile are deterministic).
# Cross-engine exactness: percent_rank/cume_dist are emitted BOTH as the
# native doubles — a single correctly-rounded IEEE division of small
# integers, bit-identical across engines — and as integer micro twins
# ((rank−1)·1e6 div (n−1); cume·1e6 div n) per the doctrine; cume_dist's
# micro twin is an explicit RANGE-frame count so ties are included on
# both sides. Scale: one fact shuffle to (type, day); every window runs
# over the (types × days) calendar frame — thousands of rows at any
# corpus size.
# ---------------------------------------------------------------------------
def window_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # the calendar frame has no NULL day: a NULL-ts event would form a
    # NULL-day group whose position in the (ct, d) orderings diverges
    # between engines (Spark NULLS FIRST vs DuckDB NULLS LAST) — filter
    # identically on both sides (r9 NULL-ts fixture class)
    daily = ev.filter(F.col("ts").isNotNull()).groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    wv = Window.partitionBy("event_type").orderBy("ct")
    wrange = wv.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    wt = Window.partitionBy("event_type").orderBy("ct", "d")
    wfull = wt.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wp = Window.partitionBy("event_type")
    ranked = daily.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "ct",
        F.rank().over(wv).cast("bigint").alias("rnk"),
        F.dense_rank().over(wv).cast("bigint").alias("drnk"),
        F.percent_rank().over(wv).alias("pct_rank"),
        F.cume_dist().over(wv).alias("cume"),
        F.count(F.lit(1)).over(wrange).cast("bigint").alias("cume_ct"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n"),
        F.ntile(4).over(wt).cast("bigint").alias("quartile"),
        F.lag("ct", 1, -1).over(wt).cast("bigint").alias("prev_ct"),
        F.lead("ct", 1, -1).over(wt).cast("bigint").alias("next_ct"),
        F.nth_value("ct", 2).over(wfull).cast("bigint").alias("second_ct"),
        F.first("ct").over(wfull).cast("bigint").alias("min_ct"),
        F.last("ct").over(wfull).cast("bigint").alias("max_ct"),
    )
    return ranked.select(
        "event_type",
        "day",
        "ct",
        "rnk",
        "drnk",
        "pct_rank",
        "cume",
        F.expr("(rnk - 1) * 1000000 div nullif(n - 1, 0)").alias(
            "pct_rank_micro"
        ),
        F.expr("cume_ct * 1000000 div n").alias("cume_micro"),
        "quartile",
        "prev_ct",
        "next_ct",
        "second_ct",
        "min_ct",
        "max_ct",
    )


_RANK_SURFACE_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS ct
    FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
),
r AS (
    SELECT event_type, strftime(d, '%Y-%m-%d') AS day, ct,
           CAST(rank() OVER wv AS BIGINT) AS rnk,
           CAST(dense_rank() OVER wv AS BIGINT) AS drnk,
           percent_rank() OVER wv AS pct_rank,
           cume_dist() OVER wv AS cume,
           CAST(count(*) OVER wrange AS BIGINT) AS cume_ct,
           CAST(count(*) OVER wp AS BIGINT) AS n,
           CAST(ntile(4) OVER wt AS BIGINT) AS quartile,
           CAST(lag(ct, 1, -1) OVER wt AS BIGINT) AS prev_ct,
           CAST(lead(ct, 1, -1) OVER wt AS BIGINT) AS next_ct,
           CAST(nth_value(ct, 2) OVER wfull AS BIGINT) AS second_ct,
           CAST(first_value(ct) OVER wfull AS BIGINT) AS min_ct,
           CAST(last_value(ct) OVER wfull AS BIGINT) AS max_ct
    FROM daily
    WINDOW wv AS (PARTITION BY event_type ORDER BY ct),
           wrange AS (PARTITION BY event_type ORDER BY ct
                      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wp AS (PARTITION BY event_type),
           wt AS (PARTITION BY event_type ORDER BY ct, d),
           wfull AS (PARTITION BY event_type ORDER BY ct, d
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
)
SELECT event_type, day, ct, rnk, drnk, pct_rank, cume,
       (rnk - 1) * 1000000 // nullif(n - 1, 0) AS pct_rank_micro,
       cume_ct * 1000000 // n AS cume_micro,
       quartile, prev_ct, next_ct, second_ct, min_ct, max_ct
FROM r
"""


# ---------------------------------------------------------------------------
# Data-quality constraint audit: the expectation-suite job every warehouse
# runs before publishing a load — one row per declared constraint with its
# violation count. Constraint classes covered: referential integrity
# (FK orphans via left-anti joins — dimension side broadcasts; the
# lineitem->orders probe is the only fact-sized shuffle), domain membership
# (event_type enum), and range/null rules (conditional aggregation inside
# ONE scan per table — no per-rule jobs). Counts are exact bigints.
# ---------------------------------------------------------------------------
_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def dq_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    events = _t(spark, sf_dir, "events")

    def row(name: str, viol, checked) -> DataFrame:
        return viol.select(
            F.lit(name).alias("constraint_name"),
            F.col("v").cast("bigint").alias("violation_ct"),
        ).crossJoin(checked.select(F.col("n").alias("_n"))).select(
            "constraint_name",
            "violation_ct",
            F.col("_n").cast("bigint").alias("checked_ct"),
            (F.col("violation_ct") == 0).cast("int").alias("passed"),
        )

    fk_orders = row(
        "orders.o_custkey -> customer.c_custkey",
        orders.join(
            F.broadcast(customer.select(F.col("c_custkey").alias("o_custkey"))),
            "o_custkey",
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("v")),
        orders.agg(F.count(F.lit(1)).alias("n")),
    )
    fk_lineitem = row(
        "lineitem.l_orderkey -> orders.o_orderkey",
        lineitem.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("v")),
        lineitem.agg(F.count(F.lit(1)).alias("n")),
    )
    enum_lits = ", ".join(f"'{t}'" for t in _EVENT_TYPES)
    ev_agg = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (~F.expr(f"event_type IN ({enum_lits})")).cast("bigint")
        ).alias("bad_type"),
        F.sum(F.col("user_id").isNull().cast("bigint")).alias("null_user"),
    )
    ev_enum = ev_agg.select(
        F.lit("events.event_type in enum").alias("constraint_name"),
        F.col("bad_type").cast("bigint").alias("violation_ct"),
        F.col("n").cast("bigint").alias("checked_ct"),
        (F.col("bad_type") == 0).cast("int").alias("passed"),
    )
    ev_null = ev_agg.select(
        F.lit("events.user_id not null").alias("constraint_name"),
        F.col("null_user").cast("bigint").alias("violation_ct"),
        F.col("n").cast("bigint").alias("checked_ct"),
        (F.col("null_user") == 0).cast("int").alias("passed"),
    )
    li_agg = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("l_quantity") <= 0).cast("bigint")).alias("bad_qty"),
    )
    li_range = li_agg.select(
        F.lit("lineitem.l_quantity > 0").alias("constraint_name"),
        F.col("bad_qty").cast("bigint").alias("violation_ct"),
        F.col("n").cast("bigint").alias("checked_ct"),
        (F.col("bad_qty") == 0).cast("int").alias("passed"),
    )
    out = fk_orders
    for part in (fk_lineitem, ev_enum, ev_null, li_range):
        out = out.unionByName(part)
    return out


def _dq_sql() -> str:
    enum_lits = ", ".join(f"'{t}'" for t in _EVENT_TYPES)
    # NOT EXISTS (never NOT IN): NOT IN evaluates to NULL when either side
    # holds a NULL key, silently dropping violations — NOT EXISTS with an
    # equality predicate matches Spark's left_anti exactly (a NULL FK never
    # equals any key, so it counts as an orphan on both engines).
    return f"""
SELECT 'orders.o_custkey -> customer.c_custkey' AS constraint_name,
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
            AS BIGINT) AS violation_ct,
       CAST((SELECT count(*) FROM orders) AS BIGINT) AS checked_ct,
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) = 0
            AS INTEGER) AS passed
UNION ALL
SELECT 'lineitem.l_orderkey -> orders.o_orderkey',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey))
            AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) = 0
            AS INTEGER)
UNION ALL
SELECT 'events.event_type in enum',
       CAST((SELECT count(*) FROM events
             WHERE event_type NOT IN ({enum_lits})) AS BIGINT),
       CAST((SELECT count(*) FROM events) AS BIGINT),
       CAST((SELECT count(*) FROM events
             WHERE event_type NOT IN ({enum_lits})) = 0 AS INTEGER)
UNION ALL
SELECT 'events.user_id not null',
       CAST((SELECT count(*) FROM events WHERE user_id IS NULL) AS BIGINT),
       CAST((SELECT count(*) FROM events) AS BIGINT),
       CAST((SELECT count(*) FROM events WHERE user_id IS NULL) = 0
            AS INTEGER)
UNION ALL
SELECT 'lineitem.l_quantity > 0',
       CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem) AS BIGINT),
       CAST((SELECT count(*) FROM lineitem WHERE l_quantity <= 0) = 0
            AS INTEGER)
"""


# ---------------------------------------------------------------------------
# Daily-count anomaly detection: flag (event_type, day) cells whose count
# deviates from the type's mean by more than 2 sigma. The FLAG is pure
# integer arithmetic — |x - mean| > 2*sigma is squared into
# (n*x - sum)^2 > 4*(n*sumsq - sum^2) over exact wide integers
# (DECIMAL(38,0) / HUGEINT; int64 would wrap at ~1e9 daily counts) — so
# partial-agg order and float rounding cannot flip a verdict; the reported
# z-score is a fixed-order double chain over the same integers. One fact
# shuffle on (type, day); the per-type stats ride a window over the tiny
# daily aggregate (days x types rows).
# ---------------------------------------------------------------------------
def anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    wt = Window.partitionBy("event_type")
    # The squared-sigma intermediates (ct^2 sums and their products) exceed
    # int64 once daily counts reach ~1e9, so they are carried in
    # DECIMAL(38,0) (int128-class exact arithmetic; HUGEINT on the DuckDB
    # side) — int64 would silently wrap under Spark's non-ANSI mode and
    # flip verdicts. Outputs stay bigint/int/double.
    stats = (
        daily.withColumn("n", F.count(F.lit(1)).over(wt))
        .withColumn("s1", F.sum("ct").over(wt))
        .withColumn(
            "s2", F.sum(F.expr("CAST(ct AS DECIMAL(38,0)) * ct")).over(wt)
        )
    )
    # z = (x - s1/n) / sqrt((n*s2 - s1^2)/n^2)  -- written as one fixed-
    # order chain; flag squared into exact wide-integer comparison
    return stats.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "ct",
        # nullif: a type whose daily counts are constant (or seen on one
        # day) has sigma 0 — its z-score is undefined (NULL), not an error
        F.expr(
            "(CAST(ct AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
            " / nullif(sqrt(CAST(CAST(n AS DECIMAL(38,0)) * s2"
            " - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE))"
            " / CAST(n AS DOUBLE), 0.0)"
        ).alias("zscore"),
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * ct - s1)"
            " * (CAST(n AS DECIMAL(38,0)) * ct - s1)"
            " > 4 * (CAST(n AS DECIMAL(38,0)) * s2"
            " - CAST(s1 AS DECIMAL(38,0)) * s1) AS INT)"
        ).alias("is_anomaly"),
    )


_ANOMALY_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS ct
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, d, ct,
           CAST(count(*) OVER w AS BIGINT) AS n,
           CAST(sum(ct) OVER w AS BIGINT) AS s1,
           CAST(sum(CAST(ct AS HUGEINT) * ct) OVER w AS HUGEINT) AS s2
    FROM daily
    WINDOW w AS (PARTITION BY event_type)
)
SELECT event_type,
       strftime(d, '%Y-%m-%d') AS day,
       ct,
       (CAST(ct AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
           / nullif(sqrt(CAST(CAST(n AS HUGEINT) * s2
                              - CAST(s1 AS HUGEINT) * s1 AS DOUBLE))
                    / CAST(n AS DOUBLE), 0.0)
           AS zscore,
       CAST((CAST(n AS HUGEINT) * ct - s1) * (CAST(n AS HUGEINT) * ct - s1)
            > 4 * (CAST(n AS HUGEINT) * s2 - CAST(s1 AS HUGEINT) * s1)
            AS INTEGER) AS is_anomaly
FROM stats
"""


# ---------------------------------------------------------------------------
# Order↔lineitem financial reconciliation — the value-level audit
# completing dq_constraint_audit's referential checks: recompute each
# order's total from its lines (extendedprice·(1−disc)·(1+tax), exact
# cents) and profile the discrepancy against the STORED o_totalprice per
# order-priority bucket. The classic month-end warehouse control; on this
# driver testdata the stored totals genuinely do not reconcile (measured:
# zero orders within $1, max gap ~$715k, 257 orders with no lines at
# sf0.01) — which is exactly the distribution the audit exists to surface.
#
# Scale: one lineitem combine keyed o_orderkey (map-side partial over the
# fact table), FULL join to orders so both orphan directions appear
# (orders with no lines / lines with no order), then a priority-sized
# reduce. No window, no driver round trips.
# ---------------------------------------------------------------------------
RECON_TOL_CENTS = 100  # reconciled = |stored - recomputed| <= $1


def order_reconciliation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        money_cents(
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("line_c"),
    )
    recomputed = li.groupBy("l_orderkey").agg(
        F.sum("line_c").cast("bigint").alias("recomputed_c")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        money_cents("o_totalprice").alias("stored_c"),
    )
    j = orders.join(
        recomputed, orders.o_orderkey == recomputed.l_orderkey, "full"
    ).select(
        F.coalesce("o_orderpriority", F.lit("<no-order>")).alias("priority"),
        "stored_c",
        "recomputed_c",
        F.abs(
            F.coalesce("stored_c", F.lit(0))
            - F.coalesce("recomputed_c", F.lit(0))
        ).alias("gap_c"),
    )
    return j.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("recomputed_c").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_no_lines"),
        F.sum(F.when(F.col("stored_c").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_no_order"),
        F.sum(
            F.when(
                F.col("stored_c").isNotNull()
                & F.col("recomputed_c").isNotNull()
                & (F.col("gap_c") <= RECON_TOL_CENTS),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_reconciled"),
        F.sum("gap_c").cast("bigint").alias("total_gap_cents"),
        F.max("gap_c").cast("bigint").alias("max_gap_cents"),
    )


_RECON_SQL = f"""
WITH re AS (
    SELECT l_orderkey,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS recomputed_c
    FROM lineitem GROUP BY 1
),
j AS (
    SELECT coalesce(o.o_orderpriority, '<no-order>') AS priority,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS stored_c,
           re.recomputed_c,
           abs(coalesce(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT), 0)
               - coalesce(re.recomputed_c, 0)) AS gap_c
    FROM orders o FULL JOIN re ON o.o_orderkey = re.l_orderkey
)
SELECT priority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN recomputed_c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_no_lines,
       CAST(sum(CASE WHEN stored_c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_no_order,
       CAST(sum(CASE WHEN stored_c IS NOT NULL AND recomputed_c IS NOT NULL
                          AND gap_c <= {RECON_TOL_CENTS}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_reconciled,
       CAST(sum(gap_c) AS BIGINT) AS total_gap_cents,
       CAST(max(gap_c) AS BIGINT) AS max_gap_cents
FROM j
GROUP BY 1
"""


QUERIES = {
    "visitor_repair_batch": visitor_repair_batch,
    "dq_constraint_audit": dq_constraint_audit,
    "order_reconciliation_audit": order_reconciliation_audit,
    "anomaly_zscore_daily": anomaly_zscore_daily,
    "tpch_q13_order_distribution": tpch_q13_order_distribution,
    "tpch_q17_small_quantity_revenue": tpch_q17_small_quantity_revenue,
    "tpch_q18_large_orders": tpch_q18_large_orders,
    "pivot_daily_event_matrix": pivot_daily_event_matrix,
    "event_value_percentiles": event_value_percentiles,
    "sliding_window_traffic": sliding_window_traffic,
    "cube_part_stats": cube_part_stats,
    "grouping_sets_events": grouping_sets_events,
    "window_frames_running_spend": window_frames_running_spend,
    "window_rank_surface": window_rank_surface,
    "funnel_conversion": funnel_conversion,
}

ORACLE = {
    "visitor_repair_batch": _VISITOR_REPAIR_SQL,
    "dq_constraint_audit": _dq_sql(),
    "order_reconciliation_audit": _RECON_SQL,
    "anomaly_zscore_daily": _ANOMALY_SQL,
    "tpch_q13_order_distribution": _Q13_SQL,
    "tpch_q17_small_quantity_revenue": _Q17_SQL,
    "tpch_q18_large_orders": _Q18_SQL,
    "pivot_daily_event_matrix": _PIVOT_SQL,
    "event_value_percentiles": _PCT_SQL,
    "sliding_window_traffic": _SLIDING_SQL,
    "cube_part_stats": _CUBE_SQL,
    "grouping_sets_events": _GROUPING_SETS_SQL,
    "window_frames_running_spend": _WINDOW_FRAMES_SQL,
    "window_rank_surface": _RANK_SURFACE_SQL,
    "funnel_conversion": _FUNNEL_SQL,
}
