"""Time-series warehouse operators: hierarchical (continuous-aggregate-style)
rollups, SCD2 interval building, and column profiling.

Scale notes:
- `hierarchical_time_rollup` aggregates raw rows ONCE at the finest grain,
  then re-aggregates upward (hour -> day -> month) — the continuous-
  aggregate pattern: coarser grains read the previous grain's output, never
  the fact table. Cents stay integer until the final render so the
  re-aggregation is exactly associative.
- `scd2_user_value` is lead() over (key, ts): one shuffle; interval tables
  beat point-in-time lookups at scale because the as-of probe becomes a
  range join against a compacted dimension.
- `column_profile` computes all per-column stats in ONE scan (no
  per-column jobs) via conditional aggregation, then reshapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.exprs import (
    TS_FMT,
    cents_amount,
    money_cents,
)
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Hierarchical rollup: hour -> day -> month, each level fed by the previous.
# ---------------------------------------------------------------------------
def hierarchical_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One scan + one fine-grain (hourly) aggregate; each hourly row then
    # explodes into its (hour, day, month) buckets and a final combine sums
    # per grain. A naive per-level union would recompute the base aggregate
    # once per level (verified via .explain — 3 scans); this shape is the
    # continuous-aggregate pattern in a single job: coarser grains read the
    # fine aggregate, never the fact table.
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("event_ct"),
        F.sum(money_cents("value")).alias("v_c"),
    )
    grains = F.array(
        F.struct(F.lit("hour").alias("grain"), F.col("bucket").alias("b")),
        F.struct(
            F.lit("day").alias("grain"), F.date_trunc("day", "bucket").alias("b")
        ),
        F.struct(
            F.lit("month").alias("grain"),
            F.date_trunc("month", "bucket").alias("b"),
        ),
    )
    exploded = hourly.select(
        F.explode(grains).alias("g"), "event_type", "event_ct", "v_c"
    )
    return (
        exploded.groupBy("g.grain", "g.b", "event_type")
        .agg(F.sum("event_ct").alias("ct"), F.sum("v_c").alias("v"))
        .select(
            "grain",
            F.date_format("b", TS_FMT).alias("bucket"),
            "event_type",
            F.col("ct").cast("bigint").alias("event_ct"),
            cents_amount("v").alias("total_value"),
        )
    )


_HIER_SQL = """
WITH lvl AS (
    SELECT g.grain,
           strftime(date_trunc(g.grain, ts), '%Y-%m-%d %H:%M:%S') AS bucket,
           event_type,
           CAST(count(*) AS BIGINT) AS event_ct,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100.0 AS total_value
    FROM events
    CROSS JOIN (VALUES ('hour'), ('day'), ('month')) AS g(grain)
    GROUP BY 1, 2, 3
)
SELECT grain, bucket, event_type, event_ct, total_value FROM lvl
"""


# ---------------------------------------------------------------------------
# SCD2: purchase events as per-user value updates -> validity intervals.
# ---------------------------------------------------------------------------
def scd2_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    updates = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id", money_cents("value").alias("v_c"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return updates.withColumn("next_ts", F.lead("ts").over(w)).select(
        "user_id",
        F.date_format("ts", TS_FMT).alias("valid_from"),
        F.date_format("next_ts", TS_FMT).alias("valid_to"),
        cents_amount("v_c").alias("value"),
        F.when(F.col("next_ts").isNull(), 1).otherwise(0)
        .cast("bigint")
        .alias("is_current"),
    )


_SCD2_SQL = """
WITH updates AS (
    SELECT user_id, ts, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
    FROM events WHERE event_type = 'purchase'
),
iv AS (
    SELECT user_id, ts, v_c,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
    FROM updates
)
SELECT user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       strftime(next_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
       CAST(v_c AS DOUBLE) / 100.0 AS value,
       CAST(CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
FROM iv
"""


# ---------------------------------------------------------------------------
# Column profiling: one-scan null/distinct/min/max stats over orders.
# ---------------------------------------------------------------------------
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        # o_custkey (numeric)
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("ck_null"),
        F.countDistinct("o_custkey").alias("ck_distinct"),
        F.min("o_custkey").alias("ck_min"),
        F.max("o_custkey").alias("ck_max"),
        # o_totalprice (money -> exact integer cents)
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).alias(
            "tp_null"
        ),
        F.countDistinct("o_totalprice").alias("tp_distinct"),
        F.min(money_cents("o_totalprice")).alias("tp_min"),
        F.max(money_cents("o_totalprice")).alias("tp_max"),
        # o_orderstatus (string)
        F.sum(F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0)).alias(
            "st_null"
        ),
        F.countDistinct("o_orderstatus").alias("st_distinct"),
        F.min("o_orderstatus").alias("st_min"),
        F.max("o_orderstatus").alias("st_max"),
    )
    # min/max rendered as exact strings (ints as-is, money as integer cents)
    # so the profile row set is null-free and engine-exact regardless of how
    # the comparison layer represents typed NULLs.
    rows = [
        ("o_custkey", "ck_null", "ck_distinct", "ck_min", "ck_max"),
        ("o_totalprice", "tp_null", "tp_distinct", "tp_min", "tp_max"),
        ("o_orderstatus", "st_null", "st_distinct", "st_min", "st_max"),
    ]
    parts = []
    for col, null_c, dist_c, mn, mx in rows:
        parts.append(
            agg.select(
                F.lit(col).alias("col_name"),
                F.col("n").alias("row_ct"),
                F.col(null_c).cast("bigint").alias("null_ct"),
                F.col(dist_c).cast("bigint").alias("distinct_ct"),
                F.col(mn).cast("string").alias("min_val"),
                F.col(mx).cast("string").alias("max_val"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_PROFILE_SQL = """
WITH agg AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS ck_null,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS ck_distinct,
           min(o_custkey) AS ck_min,
           max(o_custkey) AS ck_max,
           CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS tp_null,
           CAST(count(DISTINCT o_totalprice) AS BIGINT) AS tp_distinct,
           min(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS tp_min,
           max(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS tp_max,
           CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS st_null,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS st_distinct,
           min(o_orderstatus) AS st_min,
           max(o_orderstatus) AS st_max
    FROM orders
)
SELECT 'o_custkey' AS col_name, n AS row_ct, ck_null AS null_ct,
       ck_distinct AS distinct_ct,
       CAST(ck_min AS VARCHAR) AS min_val, CAST(ck_max AS VARCHAR) AS max_val
FROM agg
UNION ALL
SELECT 'o_totalprice', n, tp_null, tp_distinct,
       CAST(tp_min AS VARCHAR), CAST(tp_max AS VARCHAR)
FROM agg
UNION ALL
SELECT 'o_orderstatus', n, st_null, st_distinct, st_min, st_max
FROM agg
"""


# ---------------------------------------------------------------------------
# Gap filling + LOCF: dense hourly series per event_type — missing hours
# appear with event_ct=0 and the last observed value carried forward.
# Scale shape: the fact aggregates ONCE to (type, hour) — tiny — and the
# dense hour spine is generated per type from that aggregate (sequence +
# explode), never from the fact table; the carry is the portable
# "grp = running count of observations, then max per (type, grp)" trick —
# identical SQL on both engines, no IGNORE NULLS dependence, exact because
# the carried measure is integer cents.
# ---------------------------------------------------------------------------
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count(F.lit(1)).alias("event_ct"),
        F.sum(money_cents("value")).alias("v_cents"),
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    dense = spine.join(hourly, ["event_type", "h"], "left")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grp = F.sum(
        F.when(F.col("v_cents").isNotNull(), 1).otherwise(0)
    ).over(w_run)
    filled = dense.withColumn("grp", grp).withColumn(
        "v_locf", F.max("v_cents").over(Window.partitionBy("event_type", "grp"))
    )
    return filled.select(
        "event_type",
        F.date_format("h", TS_FMT).alias("hour_ts"),
        F.coalesce("event_ct", F.lit(0)).cast("bigint").alias("event_ct"),
        cents_amount(F.col("v_locf")).alias("value_locf"),
    )


_GAP_FILL_SQL = """
WITH hourly AS (
    SELECT event_type, date_trunc('hour', ts) AS h,
           CAST(count(*) AS BIGINT) AS event_ct,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_cents
    FROM events GROUP BY 1, 2
),
spine AS (
    SELECT event_type, u.h
    FROM (
        SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
    ), UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS u(h)
),
dense AS (
    SELECT s.event_type, s.h, hr.event_ct, hr.v_cents
    FROM spine s LEFT JOIN hourly hr
      ON s.event_type = hr.event_type AND s.h = hr.h
),
filled AS (
    SELECT *,
           sum(CASE WHEN v_cents IS NOT NULL THEN 1 ELSE 0 END)
               OVER (PARTITION BY event_type ORDER BY h
                     ROWS UNBOUNDED PRECEDING) AS grp
    FROM dense
)
SELECT event_type,
       strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_ts,
       CAST(coalesce(event_ct, 0) AS BIGINT) AS event_ct,
       CAST(max(v_cents) OVER (PARTITION BY event_type, grp) AS DOUBLE)
           / 100.0 AS value_locf
FROM filled
"""


# ---------------------------------------------------------------------------
# Gap-fill by LINEAR INTERPOLATION — the LOCF sibling for metrics where a
# flat carry-forward misstates a trend (billing meters, counters sampled
# daily). Per event_type the daily count series is densified over the
# observed [min_day, max_day] spine; a missing day gets
#   prev + (next - prev) * (d - prev_d) / (next_d - prev_d)
# in floored micro-units, where prev/next are the nearest OBSERVED
# neighbors (IGNORE NULLS window scans, one each direction). Spine
# endpoints are observed by construction (min/max come from the data), so
# no extrapolation branch exists.
#
# Scale: the raw scan collapses to day grain FIRST (one combine-backed
# aggregate); every window after that runs over (types × days) rows —
# bounded by the calendar, not the fact table. The spine explode derives
# from a per-type min/max aggregate (tiny). Division is integer `div`
# (truncation identical in Spark and DuckDB, including negative deltas on
# a falling series).
# ---------------------------------------------------------------------------
def gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("d").alias("d0"), F.max("d").alias("d1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("d0", "d1", F.expr("interval 1 day"))
            ).alias("d"),
        )
    )
    dense = spine.join(daily, ["event_type", "d"], "left")
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("ct").isNotNull(), F.col("d"))
    neigh = (
        dense.withColumn("prev_v", F.last("ct", ignorenulls=True).over(w_back))
        .withColumn("prev_d", F.last(obs_d, ignorenulls=True).over(w_back))
        .withColumn("next_v", F.first("ct", ignorenulls=True).over(w_fwd))
        .withColumn("next_d", F.first(obs_d, ignorenulls=True).over(w_fwd))
    )
    interp = F.expr(
        "prev_v * 1000000 + ((next_v - prev_v) * 1000000"
        " * datediff(d, prev_d)) div datediff(next_d, prev_d)"
    )
    return neigh.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        F.when(F.col("ct").isNotNull(), 1).otherwise(0)
        .cast("bigint")
        .alias("observed"),
        F.when(F.col("ct").isNotNull(), F.col("ct") * 1_000_000)
        .otherwise(interp)
        .cast("bigint")
        .alias("ct_interp_micro"),
    )


_GAP_INTERP_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS ct
    FROM events GROUP BY 1, 2
),
spine AS (
    SELECT event_type, CAST(u.d AS DATE) AS d
    FROM (
        SELECT event_type, min(d) AS d0, max(d) AS d1 FROM daily GROUP BY 1
    ), UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(d)
),
dense AS (
    SELECT s.event_type, s.d, dl.ct
    FROM spine s LEFT JOIN daily dl
      ON s.event_type = dl.event_type AND s.d = dl.d
),
neigh AS (
    SELECT *,
           last_value(ct IGNORE NULLS) OVER wb AS prev_v,
           last_value(CASE WHEN ct IS NOT NULL THEN d END IGNORE NULLS)
               OVER wb AS prev_d,
           first_value(ct IGNORE NULLS) OVER wf AS next_v,
           first_value(CASE WHEN ct IS NOT NULL THEN d END IGNORE NULLS)
               OVER wf AS next_d
    FROM dense
    WINDOW wb AS (PARTITION BY event_type ORDER BY d
                  ROWS UNBOUNDED PRECEDING),
           wf AS (PARTITION BY event_type ORDER BY d
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       strftime(d, '%Y-%m-%d') AS day,
       CAST(CASE WHEN ct IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
           AS observed,
       CAST(CASE WHEN ct IS NOT NULL THEN ct * 1000000
                 ELSE prev_v * 1000000 + ((next_v - prev_v) * 1000000
                      * (d - prev_d)) // (next_d - prev_d)
            END AS BIGINT) AS ct_interp_micro
FROM neigh
"""


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity day; per (cohort, day
# offset 0..7) the count of users active again on that offset day. Shape:
# (user, day) distinct -> one shuffle on user_id; the cohort join reuses the
# same user partitioning (co-partitioned, no second fact shuffle); the final
# aggregate is tiny-key (days x 8 offsets). Since (user_id, d) rows are
# unique after the distinct, the per-(cohort, offset) count is a plain
# count(*) — no distinct aggregate in the hot path.
# ---------------------------------------------------------------------------
RETENTION_MAX_OFFSET = 7


def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    # Cohort day via window-min over the already-shuffled distinct days —
    # no groupBy+join back against the user set (that join is SMJ-sized at
    # cluster scale; the window reuses one user_id exchange).
    wu = Window.partitionBy("user_id")
    offs = (
        days.withColumn("cohort_day", F.min("d").over(wu))
        .withColumn(
            "day_offset", F.datediff("d", "cohort_day").cast("bigint")
        )
        .filter(F.col("day_offset") <= RETENTION_MAX_OFFSET)
    )
    ret = offs.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("retained_users")
    )
    # Every user is active on their own cohort day, so the offset-0 row IS
    # the cohort size — lifted across the cohort's rows with a window over
    # the TINY aggregate (days x 8 rows). A separate sizes branch would
    # re-run the whole fact subtree (verified via .explain: second scan +
    # two fact exchanges); this keeps the fact table read once.
    wc = Window.partitionBy("cohort_day")
    sized = ret.withColumn(
        "cohort_size",
        F.max(
            F.when(F.col("day_offset") == 0, F.col("retained_users"))
        ).over(wc),
    )
    return sized.select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "retained_users",
        "cohort_size",
        (
            F.col("retained_users").cast("double") / F.col("cohort_size")
        ).alias("retention_frac"),
    )


_RETENTION_SQL = f"""
WITH days AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
-- window (not a USING join) mirrors the Spark plan: a NULL user_id forms
-- its own partition on both engines, where an equality join would drop it
offs AS (
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, d) AS BIGINT) AS day_offset
    FROM (
        SELECT d, min(d) OVER (PARTITION BY user_id) AS cohort_day
        FROM days
    )
    WHERE date_diff('day', cohort_day, d) <= {RETENTION_MAX_OFFSET}
),
ret AS (
    SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS retained_users
    FROM offs GROUP BY 1, 2
),
sized AS (
    SELECT *,
           max(CASE WHEN day_offset = 0 THEN retained_users END)
               OVER (PARTITION BY cohort_day) AS cohort_size
    FROM ret
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       day_offset, retained_users, cohort_size,
       CAST(retained_users AS DOUBLE) / cohort_size AS retention_frac
FROM sized
"""


# ---------------------------------------------------------------------------
# Incremental rollup maintenance: the materialized-view refresh pattern.
# The hourly rollup is computed as BASE (events before the cutoff day — the
# standing aggregate) merged with INC (the newly-arrived partition), and the
# oracle is the direct full rollup — proving the merge is lossless. Works
# because the measures are exactly associative (counts + integer cents):
# at 100 TB the nightly refresh touches only the new partition, never the
# full fact table, and this query is the correctness contract for that.
# ---------------------------------------------------------------------------
ROLLUP_CUTOFF = "2024-01-25"


def incremental_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def _hourly(part: DataFrame) -> DataFrame:
        return part.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("event_ct"),
            F.sum(money_cents("value")).alias("v_c"),
        )

    base = _hourly(ev.filter(F.to_date("ts") < F.lit(ROLLUP_CUTOFF)))
    inc = _hourly(ev.filter(F.to_date("ts") >= F.lit(ROLLUP_CUTOFF)))
    merged = (
        base.unionByName(inc)
        .groupBy("h", "event_type")
        .agg(
            F.sum("event_ct").cast("bigint").alias("event_ct"),
            F.sum("v_c").alias("v_c"),
        )
    )
    return merged.select(
        F.date_format("h", TS_FMT).alias("hour_ts"),
        "event_type",
        "event_ct",
        cents_amount("v_c").alias("total_value"),
    )


# Oracle is deliberately NON-incremental: the direct rollup the merge must
# reproduce bit-for-bit.
_INCREMENTAL_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_ts,
       event_type,
       CAST(count(*) AS BIGINT) AS event_ct,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
           AS total_value
FROM events
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Rolling active users (DAU / trailing-7-day WAU / stickiness): the
# engagement metric family. Distinct-users-over-a-trailing-range is not a
# window sum, so WAU uses the explode trick: each distinct (user, day)
# activity row contributes the user to report days d..d+6, deduped, then a
# plain count per report day. Work is bounded by 7x|distinct user-days| —
# linear, no self-join on the day spine, no count-distinct over ranges.
# NULL user_ids count once (no key join anywhere, so both engines agree).
# ---------------------------------------------------------------------------
WAU_WINDOW_DAYS = 7


def active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    dau = ud.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d"), F.date_add("d", WAU_WINDOW_DAYS - 1)
            )
        ).alias("rd"),
    ).distinct()
    wau = contrib.groupBy("rd").agg(
        F.count(F.lit(1)).cast("bigint").alias("wau_7")
    )
    # Dense day spine over [min_day, max_day]: a zero-activity day INSIDE
    # the range (an outage) must appear with dau=0 — that drop is the
    # signal the metric exists for — while trailing windows of days past
    # the data's end stay excluded. The spine derives from the tiny dau
    # aggregate, never the fact table; dau=0 days report wau from the
    # trailing week and stickiness 0 (or NULL if the whole week is empty).
    spine = dau.agg(
        F.min("d").alias("d0"), F.max("d").alias("d1")
    ).select(F.explode(F.sequence("d0", "d1")).alias("rd"))
    return (
        spine.join(dau, spine.rd == dau.d, "left")
        .join(wau, "rd", "left")
        .select(
            F.date_format("rd", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("bigint").alias("dau"),
            F.coalesce("wau_7", F.lit(0)).cast("bigint").alias("wau_7"),
            F.expr(
                "CAST(coalesce(dau, 0) AS DOUBLE)"
                " / nullif(CAST(coalesce(wau_7, 0) AS DOUBLE), 0.0)"
            ).alias("stickiness"),
        )
    )


_ACTIVE_USERS_SQL = f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
dau AS (
    SELECT d, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY 1
),
contrib AS (
    SELECT DISTINCT user_id, CAST(u.rd AS DATE) AS rd
    FROM ud,
         UNNEST(generate_series(d, d + INTERVAL {WAU_WINDOW_DAYS - 1} DAY,
                                INTERVAL 1 DAY)) AS u(rd)
),
wau AS (
    SELECT rd, CAST(count(*) AS BIGINT) AS wau_7 FROM contrib GROUP BY 1
),
spine AS (
    SELECT CAST(u.rd AS DATE) AS rd
    FROM (SELECT min(d) AS d0, max(d) AS d1 FROM dau),
         UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS u(rd)
)
SELECT strftime(s.rd, '%Y-%m-%d') AS day,
       CAST(coalesce(dau.dau, 0) AS BIGINT) AS dau,
       CAST(coalesce(wau.wau_7, 0) AS BIGINT) AS wau_7,
       CAST(coalesce(dau.dau, 0) AS DOUBLE)
           / nullif(CAST(coalesce(wau.wau_7, 0) AS DOUBLE), 0.0)
           AS stickiness
FROM spine s
LEFT JOIN dau ON s.rd = dau.d
LEFT JOIN wau ON s.rd = wau.rd
"""


# ---------------------------------------------------------------------------
# EWMA-smoothed daily anomaly detection — the sequential-state complement
# of `anomaly_zscore_daily` (whose z-score is a GLOBAL per-type statistic):
# an exponentially weighted moving average tracks the LOCAL level, so a
# step change flags once and the baseline re-adapts, where a global
# z-score keeps flagging forever after a regime shift.
#
#   ewma_0 = x_0 * 1e6;  ewma_t = (3 * ewma_{t-1} + x_t * 1e6) div 4
#   anomaly_t (t>0): |x_t * 1e6 - ewma_{t-1}| * 2 > ewma_{t-1}
#   (i.e. the day's count deviates >50% from yesterday's smoothed level)
#
# alpha = 1/4 as exact integer arithmetic (floor division) so both engines
# produce bit-identical state at every step — the fold is written once in
# Spark (`aggregate` over the day-sorted array) and once in DuckDB (a
# recursive CTE over the day index), both evaluating the identical
# recurrence.
#
# Scale shape: the ONLY per-key sequential object is the per-event-type
# array of DAILY aggregates — bounded by the calendar (≤ ~36.5k elements
# per type even for a century of data), not by corpus size, so
# collect_list is safe at any SF. The corpus-sized work (the daily count)
# is one combine-backed hash-agg; the fold itself runs on #types rows.
# An EWMA is inherently a left fold (each state depends on the previous),
# so a window function cannot express it (no closed form under floor
# division) — the array fold IS the declarative form, and it unrolls
# inside codegen with zero Python. ct * 1e6 stays in int64 up to
# 9.2e12 events per (type, day) — beyond any real daily volume.
# ---------------------------------------------------------------------------
_EWMA_FOLD = """
aggregate(
  xs,
  struct(cast(-1 as bigint) as prev,
         cast(array() as array<struct<d:timestamp,ct:bigint,ewma:bigint,prev:bigint>>) as acc),
  (s, x) -> struct(
    CASE WHEN s.prev < 0 THEN x.ct * 1000000
         ELSE (3 * s.prev + x.ct * 1000000) div 4 END,
    array_append(s.acc, struct(
      x.d AS d,
      cast(x.ct as bigint) AS ct,
      CASE WHEN s.prev < 0 THEN x.ct * 1000000
           ELSE (3 * s.prev + x.ct * 1000000) div 4 END AS ewma,
      CASE WHEN s.prev < 0 THEN cast(0 as bigint) ELSE s.prev END
          AS prev))),
  s -> s.acc
)
"""


def ewma_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Non-NULL key/timestamp contract, explicit on BOTH engines (and in
    # the streaming twin): a daily series for an unknown day or type is
    # meaningless, and NULL keys would silently diverge — the oracle's
    # recursive self-join can never match NULL = NULL, truncating a
    # NULL-typed series to its first day while Spark's groupBy kept it.
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "ct"))).alias("xs")
    )
    rows = series.select(
        "event_type", F.posexplode(F.expr(_EWMA_FOLD)).alias("i", "r")
    )
    return rows.select(
        "event_type",
        F.date_format("r.d", "yyyy-MM-dd").alias("day"),
        F.col("r.ct").alias("ct"),
        F.col("r.ewma").alias("ewma_micro"),
        F.expr(
            "CASE WHEN i = 0 THEN cast(0 as bigint) "
            "ELSE r.ct * 1000000 - r.prev END"
        ).alias("deviation_micro"),
        F.expr(
            "cast(CASE WHEN i > 0 AND abs(r.ct * 1000000 - r.prev) * 2 "
            "> r.prev THEN 1 ELSE 0 END as bigint)"
        ).alias("is_anomaly"),
    )


_EWMA_SQL = """
WITH RECURSIVE daily AS (
    SELECT event_type, date_trunc('day', ts) AS dy,
           CAST(count(*) AS BIGINT) AS ct
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
),
rn AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY event_type ORDER BY dy) AS BIGINT) AS i
    FROM daily
),
e AS (
    SELECT event_type, dy, ct, i,
           ct * 1000000 AS ewma, CAST(0 AS BIGINT) AS prev
    FROM rn WHERE i = 1
    UNION ALL
    SELECT r.event_type, r.dy, r.ct, r.i,
           (3 * e.ewma + r.ct * 1000000) // 4, e.ewma
    FROM rn r JOIN e ON r.event_type = e.event_type AND r.i = e.i + 1
)
SELECT event_type,
       strftime(dy, '%Y-%m-%d') AS day,
       ct,
       ewma AS ewma_micro,
       CASE WHEN i = 1 THEN CAST(0 AS BIGINT)
            ELSE ct * 1000000 - prev END AS deviation_micro,
       CAST(CASE WHEN i > 1 AND abs(ct * 1000000 - prev) * 2 > prev
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM e
"""


# ---------------------------------------------------------------------------
# Holt's linear (double-exponential) smoothing — the trend-aware member
# completing the sequential-state forecasting family (EWMA tracks level
# only, so a steady ramp lags forever; CUSUM detects shifts; the seasonal
# naive backtest is the honest baseline; Holt tracks level AND trend and
# emits the one-step-ahead forecast each day was judged against):
#
#   level_0 = x_0·1e6;  trend_0 = 0
#   forecast_t = level_{t-1} + trend_{t-1}                 (made at t-1)
#   level_t = (x_t·1e6 + 3·(level_{t-1} + trend_{t-1})) div 4   (α = 1/4)
#   trend_t = ((level_t − level_{t-1}) + 3·trend_{t-1}) div 4   (β = 1/4)
#
# Exact integer floor arithmetic throughout — `div` truncates toward zero
# identically in both engines, including the NEGATIVE trend deltas a
# declining series produces (the property EWMA never exercises: its state
# is a convex combination of non-negative counts). Same fold-vs-recursion
# duality as EWMA: Spark evaluates the recurrence as an `aggregate` fold
# over the day-sorted array (a left fold has no closed form under floor
# division, so the array fold IS the declarative form — codegen, zero
# Python); DuckDB unrolls the identical recurrence as a recursive CTE.
# Scale: the per-key sequential object is the calendar-bounded daily
# array (≤ ~36.5k elements/century); the corpus-sized work is one
# combine-backed daily count. int64 headroom: |level|,|trend| ≤ ~max
# daily ct·1e6 — wraps only past 9.2e12 events/day.
# ---------------------------------------------------------------------------
_HOLT_NEW_LV = "(x.ct * 1000000 + 3 * (s.lv + s.tr)) div 4"
_HOLT_NEW_TR = f"((({_HOLT_NEW_LV}) - s.lv) + 3 * s.tr) div 4"
_HOLT_FOLD = f"""
aggregate(
  xs,
  struct(cast(false as boolean) as started,
         cast(0 as bigint) as lv,
         cast(0 as bigint) as tr,
         cast(array() as array<struct<
             d:timestamp,ct:bigint,level:bigint,trend:bigint,
             forecast:bigint>>) as acc),
  (s, x) -> struct(
    true,
    CASE WHEN NOT s.started THEN x.ct * 1000000
         ELSE {_HOLT_NEW_LV} END,
    CASE WHEN NOT s.started THEN cast(0 as bigint)
         ELSE {_HOLT_NEW_TR} END,
    array_append(s.acc, struct(
      x.d AS d,
      cast(x.ct as bigint) AS ct,
      CASE WHEN NOT s.started THEN x.ct * 1000000
           ELSE {_HOLT_NEW_LV} END AS level,
      CASE WHEN NOT s.started THEN cast(0 as bigint)
           ELSE {_HOLT_NEW_TR} END AS trend,
      CASE WHEN NOT s.started THEN cast(0 as bigint)
           ELSE s.lv + s.tr END AS forecast))),
  s -> s.acc
)
"""


def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    # same non-NULL key/timestamp contract as ewma_anomaly_daily (the
    # oracle's recursive self-join can never match NULL = NULL)
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    )
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("d", "ct"))).alias("xs")
    )
    rows = series.select(
        "event_type", F.posexplode(F.expr(_HOLT_FOLD)).alias("i", "r")
    )
    return rows.select(
        "event_type",
        F.date_format("r.d", "yyyy-MM-dd").alias("day"),
        F.col("r.ct").alias("ct"),
        F.col("r.level").alias("level_micro"),
        F.col("r.trend").alias("trend_micro"),
        F.col("r.forecast").alias("forecast_micro"),
        F.expr(
            "CASE WHEN i = 0 THEN cast(0 as bigint) "
            "ELSE r.ct * 1000000 - r.forecast END"
        ).alias("residual_micro"),
    )


_HOLT_SQL = """
WITH RECURSIVE daily AS (
    SELECT event_type, date_trunc('day', ts) AS dy,
           CAST(count(*) AS BIGINT) AS ct
    FROM events
    WHERE event_type IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
),
rn AS (
    SELECT *, CAST(row_number() OVER (
        PARTITION BY event_type ORDER BY dy) AS BIGINT) AS i
    FROM daily
),
h AS (
    SELECT event_type, dy, ct, i,
           ct * 1000000 AS lv, CAST(0 AS BIGINT) AS tr,
           CAST(0 AS BIGINT) AS forecast
    FROM rn WHERE i = 1
    UNION ALL
    SELECT r.event_type, r.dy, r.ct, r.i,
           (r.ct * 1000000 + 3 * (h.lv + h.tr)) // 4,
           ((((r.ct * 1000000 + 3 * (h.lv + h.tr)) // 4) - h.lv)
            + 3 * h.tr) // 4,
           h.lv + h.tr
    FROM rn r JOIN h ON r.event_type = h.event_type AND r.i = h.i + 1
)
SELECT event_type,
       strftime(dy, '%Y-%m-%d') AS day,
       ct,
       lv AS level_micro,
       tr AS trend_micro,
       forecast AS forecast_micro,
       CASE WHEN i = 1 THEN CAST(0 AS BIGINT)
            ELSE ct * 1000000 - forecast END AS residual_micro
FROM h
"""


# ---------------------------------------------------------------------------
# Seasonal baseline + residual — the hour-of-day seasonality decomposition
# the anomaly family was missing: `anomaly_zscore_daily` and
# `ewma_anomaly_daily` trend the DAILY series, so a traffic pattern that
# is merely "3am is always quiet" trips them; this op learns the per-
# (event_type, hour-of-day) baseline over all observed days and emits each
# (type, day, hour) cell's residual against it. A monitoring stack alerts
# on residual_micro, not raw counts.
#
# Exact integer form: baseline_micro = (total count for the (type, hod)
# slot) * 1e6 div n_days, where n_days is the GLOBAL distinct-day count —
# so days where a slot was silent correctly drag its baseline down
# (omitting them would bias the baseline up and mask dead-hour anomalies).
# residual_micro = ct * 1e6 - baseline_micro.
#
# Scale: one combine to (type, day, hod) cells; the baseline reduce runs
# over CELLS (types x 24 x days — dashboard-sized), never the fact table;
# the 1-row day count broadcasts. Everything map-side-partial, zero
# Python.
# ---------------------------------------------------------------------------
def seasonal_baseline_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.col("ts").cast("date").alias("d"),
        F.hour("ts").cast("int").alias("hod"),
    )
    cells = ev.groupBy("event_type", "d", "hod").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    n_days = ev.agg(F.countDistinct("d").alias("n_days"))
    baseline = (
        cells.groupBy("event_type", "hod")
        .agg(F.sum("ct").alias("slot_total"))
        .crossJoin(F.broadcast(n_days))
        .select(
            "event_type",
            "hod",
            F.expr("CAST(slot_total * 1000000 div n_days AS BIGINT)").alias(
                "baseline_micro"
            ),
        )
    )
    return cells.join(baseline, ["event_type", "hod"]).select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "hod",
        "ct",
        "baseline_micro",
        F.expr("CAST(ct * 1000000 - baseline_micro AS BIGINT)").alias(
            "residual_micro"
        ),
    )


_SEASONAL_SQL = """
WITH ev AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(extract(hour FROM ts) AS INTEGER) AS hod
    FROM events
),
cells AS (
    SELECT event_type, d, hod, CAST(count(*) AS BIGINT) AS ct
    FROM ev GROUP BY 1, 2, 3
),
nd AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n_days FROM ev),
baseline AS (
    SELECT event_type, hod,
           CAST(sum(ct) * 1000000 // max(nd.n_days) AS BIGINT)
               AS baseline_micro
    FROM cells CROSS JOIN nd
    GROUP BY 1, 2
)
SELECT c.event_type,
       strftime(c.d, '%Y-%m-%d') AS day,
       c.hod,
       c.ct,
       b.baseline_micro,
       CAST(c.ct * 1000000 - b.baseline_micro AS BIGINT) AS residual_micro
FROM cells c
JOIN baseline b ON c.event_type = b.event_type AND c.hod = b.hod
"""


# ---------------------------------------------------------------------------
# CUSUM change-point detection over the daily series — the PERSISTENT-
# level-shift detector completing the anomaly triad: zscore flags single
# outlier days, EWMA flags deviation from the smoothed level, CUSUM
# accumulates small sustained drifts that neither trips (the Page 1954
# scheme every metrics platform ships).
#
# The recursion C_t = max(0, C_{t-1} + delta_t) is the same non-associative
# fold as running_balance_floor, and the same reflection identity
# C_t = S_t - min(0, min_{j<=t} S_j) turns it into two stacked window
# functions over one per-type sort — no stateful loop, no Python. Both
# one-sided statistics (upward + downward) ride the SAME sort; all
# arithmetic is exact integer micro-units (delta = ct*1e6 − mean − slack,
# mean over the type's observed days).
#
# Scale: the fold input is (types × days) rows regardless of event volume
# — the daily combine absorbs everything; identical shape to
# ewma_anomaly_daily but with zero recursion even in the oracle.
# ---------------------------------------------------------------------------
CUSUM_SLACK_DEN = 4   # allowance k = mean/4 (in micro-units)
CUSUM_ALARM_NUM = 2   # alarm when either statistic exceeds 2x mean


def change_point_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    stats = daily.groupBy("event_type").agg(
        F.expr("CAST(sum(ct) * 1000000 div count(*) AS BIGINT)").alias(
            "mean_micro"
        )
    )
    base = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "d",
        "ct",
        "mean_micro",
        F.expr(
            f"ct * 1000000 - mean_micro - mean_micro div {CUSUM_SLACK_DEN}"
        ).alias("d_up"),
        F.expr(
            f"mean_micro - mean_micro div {CUSUM_SLACK_DEN} - ct * 1000000"
        ).alias("d_dn"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = base.withColumn("s_up", F.sum("d_up").over(w)).withColumn(
        "s_dn", F.sum("d_dn").over(w)
    )
    c = s.withColumn(
        "cusum_up_micro",
        F.col("s_up") - F.least(F.lit(0), F.min("s_up").over(w)),
    ).withColumn(
        "cusum_dn_micro",
        F.col("s_dn") - F.least(F.lit(0), F.min("s_dn").over(w)),
    )
    return c.select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "ct",
        F.col("cusum_up_micro").cast("bigint").alias("cusum_up_micro"),
        F.col("cusum_dn_micro").cast("bigint").alias("cusum_dn_micro"),
        F.expr(
            f"CAST(CASE WHEN cusum_up_micro > {CUSUM_ALARM_NUM} * mean_micro"
            f" OR cusum_dn_micro > {CUSUM_ALARM_NUM} * mean_micro"
            f" THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("alarm"),
    )


_CUSUM_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS ct
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type,
           CAST(sum(ct) * 1000000 // count(*) AS BIGINT) AS mean_micro
    FROM daily GROUP BY 1
),
base AS (
    SELECT d.event_type, d.d, d.ct, s.mean_micro,
           d.ct * 1000000 - s.mean_micro
               - s.mean_micro // {CUSUM_SLACK_DEN} AS d_up,
           s.mean_micro - s.mean_micro // {CUSUM_SLACK_DEN}
               - d.ct * 1000000 AS d_dn
    FROM daily d JOIN stats s ON d.event_type = s.event_type
),
sums AS (
    SELECT *,
           sum(d_up) OVER w AS s_up,
           sum(d_dn) OVER w AS s_dn
    FROM base
    WINDOW w AS (PARTITION BY event_type ORDER BY d
                 ROWS UNBOUNDED PRECEDING)
),
cus AS (
    SELECT *,
           s_up - least(0, min(s_up) OVER w) AS cusum_up_micro,
           s_dn - least(0, min(s_dn) OVER w) AS cusum_dn_micro
    FROM sums
    WINDOW w AS (PARTITION BY event_type ORDER BY d
                 ROWS UNBOUNDED PRECEDING)
)
SELECT event_type,
       strftime(d, '%Y-%m-%d') AS day,
       ct,
       CAST(cusum_up_micro AS BIGINT) AS cusum_up_micro,
       CAST(cusum_dn_micro AS BIGINT) AS cusum_dn_micro,
       CAST(CASE WHEN cusum_up_micro > {CUSUM_ALARM_NUM} * mean_micro
                  OR cusum_dn_micro > {CUSUM_ALARM_NUM} * mean_micro
            THEN 1 ELSE 0 END AS BIGINT) AS alarm
FROM cus
"""


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest — the forecasting family's honest
# baseline (every real forecasting pipeline — FlashP-style real-time
# forecasting included — reports its model AGAINST this): predict each
# (type, day) count with yesterday's count (lag-1) and with the same
# weekday last week (lag-7), score both by MAE/bias over the whole
# observed range, in exact integer micro-units. The lag-7-beats-lag-1
# comparison IS the "does this series have weekly seasonality" decision,
# made from data.
#
# Lags via exact date-key self-joins (not window lag, which would silently
# treat a GAP day as "yesterday"); a missing predictor day drops that cell
# from that predictor's score and is counted, so the two MAEs are honest
# about coverage. All frames are (types × days) cells.
# ---------------------------------------------------------------------------
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    ).persist()

    def scored(lag_days: int, tag: str) -> DataFrame:
        pred = daily.select(
            "event_type",
            F.date_add("d", lag_days).alias("d"),
            F.col("ct").alias("pred"),
        )
        j = daily.join(pred, ["event_type", "d"], "left")
        return j.groupBy("event_type").agg(
            F.count(F.lit(1)).cast("bigint").alias(f"n_days_{tag}"),
            F.sum(F.when(F.col("pred").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_scored_{tag}"),
            F.expr(
                "CAST(CASE WHEN count(pred) = 0 THEN 0 ELSE"
                " sum(CASE WHEN pred IS NOT NULL THEN abs(ct - pred) END)"
                " * 1000000 div count(pred) END AS BIGINT)"
            ).alias(f"mae_{tag}_micro"),
            F.expr(
                "CAST(CASE WHEN count(pred) = 0 THEN 0 ELSE"
                " sum(CASE WHEN pred IS NOT NULL THEN ct - pred END)"
                " * 1000000 div count(pred) END AS BIGINT)"
            ).alias(f"bias_{tag}_micro"),
        )

    lag1 = scored(1, "lag1")
    lag7 = scored(7, "lag7")
    return (
        lag1.join(lag7.drop("n_days_lag7"), "event_type")
        .withColumnRenamed("n_days_lag1", "n_days")
        .select(
            "event_type",
            "n_days",
            "n_scored_lag1",
            "mae_lag1_micro",
            "bias_lag1_micro",
            "n_scored_lag7",
            "mae_lag7_micro",
            "bias_lag7_micro",
            F.when(
                F.col("mae_lag7_micro") < F.col("mae_lag1_micro"), 1
            )
            .otherwise(0)
            .cast("bigint")
            .alias("weekly_seasonal"),
        )
    )


_SEASONAL_NAIVE_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS ct
    FROM events GROUP BY 1, 2
),
s1 AS (
    SELECT a.event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(count(p.ct) AS BIGINT) AS n_scored_lag1,
           CAST(CASE WHEN count(p.ct) = 0 THEN 0 ELSE
                sum(CASE WHEN p.ct IS NOT NULL THEN abs(a.ct - p.ct) END)
                * 1000000 // count(p.ct) END AS BIGINT) AS mae_lag1_micro,
           CAST(CASE WHEN count(p.ct) = 0 THEN 0 ELSE
                sum(CASE WHEN p.ct IS NOT NULL THEN a.ct - p.ct END)
                * 1000000 // count(p.ct) END AS BIGINT) AS bias_lag1_micro
    FROM daily a
    LEFT JOIN daily p
      ON a.event_type = p.event_type AND p.d + 1 = a.d
    GROUP BY 1
),
s7 AS (
    SELECT a.event_type,
           CAST(count(p.ct) AS BIGINT) AS n_scored_lag7,
           CAST(CASE WHEN count(p.ct) = 0 THEN 0 ELSE
                sum(CASE WHEN p.ct IS NOT NULL THEN abs(a.ct - p.ct) END)
                * 1000000 // count(p.ct) END AS BIGINT) AS mae_lag7_micro,
           CAST(CASE WHEN count(p.ct) = 0 THEN 0 ELSE
                sum(CASE WHEN p.ct IS NOT NULL THEN a.ct - p.ct END)
                * 1000000 // count(p.ct) END AS BIGINT) AS bias_lag7_micro
    FROM daily a
    LEFT JOIN daily p
      ON a.event_type = p.event_type AND p.d + 7 = a.d
    GROUP BY 1
)
SELECT s1.event_type, s1.n_days,
       s1.n_scored_lag1, s1.mae_lag1_micro, s1.bias_lag1_micro,
       s7.n_scored_lag7, s7.mae_lag7_micro, s7.bias_lag7_micro,
       CAST(CASE WHEN s7.mae_lag7_micro < s1.mae_lag1_micro
            THEN 1 ELSE 0 END AS BIGINT) AS weekly_seasonal
FROM s1 JOIN s7 ON s1.event_type = s7.event_type
"""


# ---------------------------------------------------------------------------
# Late-arriving-dimension reattribution — the SCD2 family's operational
# question: when a dimension upsert arrives LATE (facts were attributed
# against a stale dim), how many facts change label once the update
# lands? Dim = each user's value segment from purchases (SCD2-style
# point-in-time updates, deduped to the last update per (user, ts));
# facts = view events attributed as-of view time. The stale variant drops
# each user's FINAL update — exactly what a fact job sees when it runs
# before the day's dim sync — and the output is the (stale -> final)
# reattribution matrix, 'none' marking facts before any dim version.
#
# The as-of probe is the union+last(IGNORE NULLS) window (dim rows sort
# before same-ts facts, matching DuckDB's ASOF >= semantics in the
# oracle): ONE shuffle per variant on the user key, no range explosion —
# the interval table is never materialized per fact.
# ---------------------------------------------------------------------------
SEG_LOW_C = 2_000  # < $20.00 -> low
SEG_MID_C = 6_000  # < $60.00 -> mid, else high


def late_dim_reattribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seg_expr = (
        f"CASE WHEN v_c < {SEG_LOW_C} THEN 'low'"
        f" WHEN v_c < {SEG_MID_C} THEN 'mid' ELSE 'high' END"
    )
    upd = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", "ts", "event_id", money_cents("value").alias("v_c")
        )
        .withColumn("seg", F.expr(seg_expr))
    )
    # one effective update per (user, ts): the LAST by event_id wins
    wt = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    dim = (
        upd.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "seg")
    )
    wlast = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc()
    )
    stale = (
        dim.withColumn("rn", F.row_number().over(wlast))
        .filter(F.col("rn") > 1)
        .select("user_id", "ts", "seg")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )

    def _attribute(d: DataFrame, out: str) -> DataFrame:
        f = views.select(
            "user_id",
            "ts",
            "event_id",
            F.lit(None).cast("string").alias("seg"),
            F.lit(1).alias("kind"),
        )
        dm = d.select(
            "user_id",
            "ts",
            F.lit(None).cast("bigint").alias("event_id"),
            "seg",
            F.lit(0).alias("kind"),
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts", "kind")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return (
            f.unionByName(dm)
            .withColumn("seg_at", F.last("seg", ignorenulls=True).over(w))
            .filter(F.col("kind") == 1)
            .select(
                "event_id", F.coalesce("seg_at", F.lit("none")).alias(out)
            )
        )

    full = _attribute(dim, "seg_final")
    before = _attribute(stale, "seg_stale")
    return (
        full.join(before, "event_id")
        .groupBy("seg_stale", "seg_final")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .withColumn(
            "reattributed",
            F.expr(
                "CAST(CASE WHEN seg_stale <> seg_final THEN 1 ELSE 0 END"
                " AS BIGINT)"
            ),
        )
    )


_LATE_DIM_SQL = f"""
WITH upd AS (
    SELECT user_id, ts, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
    FROM events WHERE event_type = 'purchase'
),
dim AS (
    SELECT user_id, ts,
           CASE WHEN v_c < {SEG_LOW_C} THEN 'low'
                WHEN v_c < {SEG_MID_C} THEN 'mid' ELSE 'high' END AS seg
    FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id, ts
                                     ORDER BY event_id DESC) AS rn
        FROM upd
    ) WHERE rn = 1
),
stale AS (
    SELECT user_id, ts, seg FROM (
        SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC) AS rn
        FROM dim
    ) WHERE rn > 1
),
views AS (
    SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
),
full_attr AS (
    SELECT v.event_id, coalesce(d.seg, 'none') AS seg_final
    FROM views v ASOF LEFT JOIN dim d
      ON v.user_id = d.user_id AND v.ts >= d.ts
),
stale_attr AS (
    SELECT v.event_id, coalesce(d.seg, 'none') AS seg_stale
    FROM views v ASOF LEFT JOIN stale d
      ON v.user_id = d.user_id AND v.ts >= d.ts
)
SELECT s.seg_stale, f.seg_final,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(CASE WHEN s.seg_stale <> f.seg_final THEN 1 ELSE 0 END AS BIGINT)
           AS reattributed
FROM full_attr f JOIN stale_attr s USING (event_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Time-series similarity search (cf. "Time Series Similarity Search for
# Streaming Data in Distributed Systems", EDBT'19 — the problem statement;
# the plan here is the sparse decomposition a distributed engine should
# run): each user's 30-day activity CURVE (daily event counts) is compared
# to a handful of query users' curves by exact squared euclidean distance.
# Dense vectors are never materialized: with sparse per-(user, day) counts,
#     dist(q, u) = ||q||² + ||u||² − 2·(q·u)
# — norms are one combine per user, and the dot products touch only the
# DAYS WHERE BOTH ARE ACTIVE (query postings broadcast, join on day), so
# total work is linear in the corpus' (user, day) cells, never
# |users|×|days|. Missing days are implicit zeros by construction.
# All-integer arithmetic; top-K per query is WindowGroupLimit.
# ---------------------------------------------------------------------------
TS_SIM_QUERIES = 5
TS_SIM_K = 3


def ts_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    cells = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    # no persist (r10 A/B: 0.54 s without vs 0.94 s with — ReusedExchange)
    norms = cells.groupBy("user_id").agg(
        F.sum(F.expr("ct * ct")).cast("bigint").alias("norm2")
    )
    qcells = cells.filter(F.col("user_id") < TS_SIM_QUERIES).select(
        F.col("user_id").alias("q_user"), "d", F.col("ct").alias("q_ct")
    )
    qnorms = norms.filter(F.col("user_id") < TS_SIM_QUERIES).select(
        F.col("user_id").alias("q_user"), F.col("norm2").alias("q_norm2")
    )
    dots = (
        cells.join(F.broadcast(qcells), "d")
        .groupBy("q_user", "user_id")
        .agg(F.sum(F.expr("ct * q_ct")).cast("bigint").alias("dot"))
    )
    scored = (
        norms.crossJoin(F.broadcast(qnorms))
        .join(dots, ["q_user", "user_id"], "left")
        .filter(F.col("user_id") != F.col("q_user"))
        .select(
            "q_user",
            "user_id",
            F.expr(
                "q_norm2 + norm2 - 2 * coalesce(dot, CAST(0 AS BIGINT))"
            ).alias("dist2"),
        )
    )
    w = Window.partitionBy("q_user").orderBy(F.col("dist2"), F.col("user_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TS_SIM_K)
        .select(
            "q_user",
            F.col("rnk").cast("bigint").alias("rnk"),
            F.col("user_id").alias("neighbor_user"),
            "dist2",
        )
    )


_TS_SIM_SQL = f"""
WITH cells AS (
    SELECT user_id, CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS ct
    FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
),
norms AS (
    SELECT user_id, CAST(sum(ct * ct) AS BIGINT) AS norm2
    FROM cells GROUP BY 1
),
qcells AS (
    SELECT user_id AS q_user, d, ct AS q_ct FROM cells
    WHERE user_id < {TS_SIM_QUERIES}
),
qnorms AS (
    SELECT user_id AS q_user, norm2 AS q_norm2 FROM norms
    WHERE user_id < {TS_SIM_QUERIES}
),
dots AS (
    SELECT q.q_user, c.user_id, CAST(sum(c.ct * q.q_ct) AS BIGINT) AS dot
    FROM cells c JOIN qcells q USING (d)
    GROUP BY 1, 2
),
scored AS (
    SELECT qn.q_user, n.user_id,
           CAST(qn.q_norm2 + n.norm2 - 2 * coalesce(dt.dot, 0) AS BIGINT)
               AS dist2
    FROM norms n
    CROSS JOIN qnorms qn
    LEFT JOIN dots dt ON dt.q_user = qn.q_user AND dt.user_id = n.user_id
    WHERE n.user_id <> qn.q_user
)
SELECT q_user, CAST(rnk AS BIGINT) AS rnk, user_id AS neighbor_user, dist2
FROM (
    SELECT *, row_number() OVER (PARTITION BY q_user
                                 ORDER BY dist2, user_id) AS rnk
    FROM scored
) WHERE rnk <= {TS_SIM_K}
"""


QUERIES = {
    "hierarchical_time_rollup": hierarchical_time_rollup,
    "seasonal_baseline_residual": seasonal_baseline_residual,
    "change_point_cusum": change_point_cusum,
    "seasonal_naive_backtest": seasonal_naive_backtest,
    "scd2_user_value": scd2_user_value,
    "column_profile": column_profile,
    "gap_fill_locf": gap_fill_locf,
    "gap_fill_interpolate": gap_fill_interpolate,
    "user_retention_cohorts": user_retention_cohorts,
    "incremental_hourly_rollup": incremental_hourly_rollup,
    "active_users_rolling": active_users_rolling,
    "ewma_anomaly_daily": ewma_anomaly_daily,
    "holt_linear_forecast": holt_linear_forecast,
    "late_dim_reattribution": late_dim_reattribution,
    "ts_similarity_topk": ts_similarity_topk,
}

ORACLE = {
    "hierarchical_time_rollup": _HIER_SQL,
    "seasonal_baseline_residual": _SEASONAL_SQL,
    "change_point_cusum": _CUSUM_SQL,
    "seasonal_naive_backtest": _SEASONAL_NAIVE_SQL,
    "scd2_user_value": _SCD2_SQL,
    "column_profile": _PROFILE_SQL,
    "gap_fill_locf": _GAP_FILL_SQL,
    "gap_fill_interpolate": _GAP_INTERP_SQL,
    "user_retention_cohorts": _RETENTION_SQL,
    "incremental_hourly_rollup": _INCREMENTAL_SQL,
    "active_users_rolling": _ACTIVE_USERS_SQL,
    "ewma_anomaly_daily": _EWMA_SQL,
    "holt_linear_forecast": _HOLT_SQL,
    "late_dim_reattribution": _LATE_DIM_SQL,
    "ts_similarity_topk": _TS_SIM_SQL,
}
