"""Behavioral analytics: LTV decile segmentation, event-sequence Markov
transitions, and winsorized robust aggregates.

Reference lineage: the per-user aggregation shapes of the dws layer
(``Dws04UserUserLoginWindow.java:82-125`` et al.) extended with the three
analytics every warehouse team layers on top — value segmentation,
sequence mining, and outlier-robust reporting. All integer-exact (cents /
micro-units), all one- or two-shuffle plans.

- `user_ltv_segments`: users ranked into spend deciles with NTILE (total
  order pinned by (spend, user_id) so bucket edges are deterministic and
  engine-identical); per-decile stats ride a tiny re-aggregation of the
  user-level frame. Two shuffles: user combine, then the 10-row decile agg
  (the NTILE window over users is the unavoidable rank step — at 100 TB
  the user table is the SMALL side of this engine's tables).
- `event_type_markov_transitions`: per-user lag() chains events into
  (prev, next) transition counts; probabilities are integer micro-unit
  divisions against the per-prev row totals (broadcast — the matrix is
  |types|² ≤ 25 rows). One user-keyed window sort + one tiny combine.
- `winsorized_value_stats`: per-type mean/sum computed raw AND with cents
  clamped to the exact [p01, p99] order statistics — the outlier-robust
  reporting pair. The percentile bounds reuse the exact-rank pattern from
  `value_quantile_sketch` (window row_number against ceil(p·n/100)); the
  clamp is a pure column expression so the second aggregation adds no
  extra fact shuffle beyond the re-keyed combine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.exprs import money_cents
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# LTV decile segmentation.
# ---------------------------------------------------------------------------
N_SEGMENTS = 10


def user_ltv_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    spend = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(money_cents("value")).alias("spend_cents"))
    )
    w = Window.orderBy("spend_cents", "user_id")
    seg = spend.withColumn("segment", F.ntile(N_SEGMENTS).over(w))
    return seg.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.min("spend_cents").alias("min_spend_cents"),
        F.max("spend_cents").alias("max_spend_cents"),
        F.sum("spend_cents").alias("sum_spend_cents"),
    )


_LTV_SQL = f"""
WITH spend AS (
    SELECT user_id,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS spend_cents
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY 1
),
seg AS (
    SELECT *, CAST(ntile({N_SEGMENTS})
               OVER (ORDER BY spend_cents, user_id) AS INTEGER) AS segment
    FROM spend
)
SELECT segment,
       CAST(count(*) AS BIGINT) AS n_users,
       min(spend_cents) AS min_spend_cents,
       max(spend_cents) AS max_spend_cents,
       CAST(sum(spend_cents) AS BIGINT) AS sum_spend_cents
FROM seg GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Event-sequence Markov transitions.
# ---------------------------------------------------------------------------
def event_type_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chained = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    counts = chained.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("transitions")
    )
    totals = counts.groupBy("prev_type").agg(
        F.sum("transitions").alias("total_from")
    )
    return counts.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "transitions",
        F.expr("transitions * 1000000 div total_from").alias("prob_micro"),
    )


_MARKOV_SQL = """
WITH chained AS (
    SELECT user_id,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type,
           event_type AS next_type
    FROM events
),
counts AS (
    SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS transitions
    FROM chained WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
),
totals AS (
    SELECT prev_type, CAST(sum(transitions) AS BIGINT) AS total_from
    FROM counts GROUP BY 1
)
SELECT c.prev_type, c.next_type, c.transitions,
       c.transitions * 1000000 // t.total_from AS prob_micro
FROM counts c JOIN totals t USING (prev_type)
"""


# ---------------------------------------------------------------------------
# Winsorized robust aggregates.
# ---------------------------------------------------------------------------
WINSOR_LO = 1
WINSOR_HI = 99


def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "event_type", "event_id", money_cents("value").alias("cents")
    )
    # Per-type count rides the SAME exchange as the rank window (an
    # unordered whole-partition frame over the same key) — no separate
    # counting scan of the fact table.
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = (
        ev.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .withColumn("n", F.count(F.lit(1)).over(wn).cast("bigint"))
        .withColumn("k_lo", F.expr(f"({WINSOR_LO} * n + 99) div 100"))
        .withColumn("k_hi", F.expr(f"({WINSOR_HI} * n + 99) div 100"))
    )
    bounds = (
        ranked.filter(
            (F.col("rn") == F.col("k_lo")) | (F.col("rn") == F.col("k_hi"))
        )
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("rn") == F.col("k_lo"), F.col("cents"))).alias("p_lo"),
            F.min(F.when(F.col("rn") == F.col("k_hi"), F.col("cents"))).alias("p_hi"),
        )
    )
    clamped = ev.join(F.broadcast(bounds), "event_type").withColumn(
        "wins", F.greatest(F.col("p_lo"), F.least(F.col("p_hi"), F.col("cents")))
    )
    return clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").alias("sum_raw_cents"),
        F.sum("wins").alias("sum_wins_cents"),
        F.expr("sum(cents) * 1000000 div count(1)").alias("mean_raw_micro"),
        F.expr("sum(wins) * 1000000 div count(1)").alias("mean_wins_micro"),
        F.min("p_lo").alias("p_lo_cents"),
        F.min("p_hi").alias("p_hi_cents"),
    )


_WINSOR_SQL = f"""
WITH ev AS (
    SELECT event_type, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
),
n AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY 1),
targets AS (
    SELECT event_type AS t_type,
           ({WINSOR_LO} * n + 99) // 100 AS k_lo,
           ({WINSOR_HI} * n + 99) // 100 AS k_hi
    FROM n
),
ranked AS (
    SELECT event_type, cents,
           CAST(row_number() OVER (PARTITION BY event_type
                                   ORDER BY cents, event_id) AS BIGINT) AS rn
    FROM ev
),
bounds AS (
    SELECT r.event_type,
           min(CASE WHEN r.rn = t.k_lo THEN r.cents END) AS p_lo,
           min(CASE WHEN r.rn = t.k_hi THEN r.cents END) AS p_hi
    FROM ranked r JOIN targets t ON r.event_type = t.t_type
    WHERE r.rn = t.k_lo OR r.rn = t.k_hi
    GROUP BY 1
),
clamped AS (
    SELECT e.event_type, e.cents, b.p_lo, b.p_hi,
           greatest(b.p_lo, least(b.p_hi, e.cents)) AS wins
    FROM ev e JOIN bounds b USING (event_type)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_raw_cents,
       CAST(sum(wins) AS BIGINT) AS sum_wins_cents,
       CAST(sum(cents) AS BIGINT) * 1000000 // count(*) AS mean_raw_micro,
       CAST(sum(wins) AS BIGINT) * 1000000 // count(*) AS mean_wins_micro,
       min(p_lo) AS p_lo_cents,
       min(p_hi) AS p_hi_cents
FROM clamped GROUP BY 1
"""


# ---------------------------------------------------------------------------
# FIFO credit matching — the cost-basis / credit-consumption allocation:
# each purchase consumes the user's oldest unconsumed credits first, and
# the output says WHICH credit funded WHICH purchase and by how much.
#
# The classic formulation is an imperative per-user loop; the declarative
# form is cumulative-interval overlap: credits occupy [cum_prev, cum) on
# the user's credit number line, debits likewise on the debit line, and a
# (credit, debit) pair matches where the intervals overlap —
# min(hi) - max(lo) when positive. Total matched segments per user is
# LINEAR (≤ credits + debits - 1): each segment boundary consumes one
# interval end. The join itself is BANDED (intervals explode to fixed-size
# bands of their cumulative range; equi-join on (user, band); distinct) so
# the pair candidates stay near-linear too — a hot user with thousands of
# events never triggers a quadratic per-user cross join. All integer
# cents; fully deterministic.
# ---------------------------------------------------------------------------
FIFO_BAND_CENTS = 10_000


def fifo_credit_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "ts", "event_type",
        money_cents("value").alias("cents"),
    ).filter(F.col("event_type") != "error")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    def side(df, label):
        return (
            df.withColumn("hi", F.sum("cents").over(w))
            .withColumn("lo", F.col("hi") - F.col("cents"))
            .select(
                "user_id",
                F.col("event_id").alias(f"{label}_event"),
                F.col("lo").alias(f"{label}_lo"),
                F.col("hi").alias(f"{label}_hi"),
            )
        )
    credits = side(ev.filter(F.col("event_type") != "purchase"), "c")
    debits = side(ev.filter(F.col("event_type") == "purchase"), "d")
    B = FIFO_BAND_CENTS
    def banded(df, label):
        return df.select(
            "*",
            F.explode(
                F.expr(f"sequence({label}_lo div {B}, ({label}_hi - 1) div {B})")
            ).alias("band"),
        )
    pairs = (
        banded(credits.filter(F.col("c_hi") > F.col("c_lo")), "c")
        .join(
            banded(debits.filter(F.col("d_hi") > F.col("d_lo")), "d"),
            ["user_id", "band"],
        )
        .filter(
            (F.col("c_lo") < F.col("d_hi")) & (F.col("d_lo") < F.col("c_hi"))
        )
        .select("user_id", "c_event", "d_event", "c_lo", "c_hi", "d_lo", "d_hi")
        .distinct()
    )
    return pairs.select(
        "user_id",
        F.col("c_event").alias("credit_event"),
        F.col("d_event").alias("debit_event"),
        (
            F.least("c_hi", "d_hi") - F.greatest("c_lo", "d_lo")
        ).alias("matched_cents"),
    )


_FIFO_SQL = """
WITH ev AS (
    SELECT user_id, event_id, ts, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events WHERE event_type <> 'error'
),
credits AS (
    SELECT user_id, event_id AS c_event,
           sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) - cents AS c_lo,
           sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS c_hi
    FROM ev WHERE event_type <> 'purchase'
),
debits AS (
    SELECT user_id, event_id AS d_event,
           sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) - cents AS d_lo,
           sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS d_hi
    FROM ev WHERE event_type = 'purchase'
)
SELECT c.user_id, c.c_event AS credit_event, d.d_event AS debit_event,
       CAST(least(c.c_hi, d.d_hi) - greatest(c.c_lo, d.d_lo) AS BIGINT)
           AS matched_cents
FROM credits c JOIN debits d
  ON c.user_id = d.user_id
 AND c.c_lo < d.d_hi AND d.d_lo < c.c_hi
WHERE c.c_hi > c.c_lo AND d.d_hi > d.d_lo
"""


# ---------------------------------------------------------------------------
# Abandoned-view rate: views with NO purchase by the same user within the
# horizon. The time-bounded ANTI-join complement of
# `asof_join_purchase_signup` (which keeps the nearest match) and of the
# streaming view->purchase twin — the reference's order/cart funnel
# (`R/app/dwd/db/DwdTradeOrderDetail.java:161-163` joins the matched side;
# abandonment is the unmatched remainder a funnel report needs).
#
# Scale: the anti-join carries user_id as its equi-key, so it compiles to a
# sort-merge anti-join shuffled on user_id with the time bound evaluated
# in-join — never a broadcast-nested-loop. Per-user event counts are
# human-bounded (a user generates thousands of events, not billions), so
# per-key match work is flat at any corpus size; both sides are
# filter-pushed scans of the same table and the day rollup reuses the
# view side's partitioning.
# ---------------------------------------------------------------------------
ABANDON_HORIZON_MIN = 60


def abandoned_view_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("pts")
    )
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("pts") > F.col("vts"))
        & (
            F.col("pts")
            <= F.col("vts") + F.expr(f"INTERVAL {ABANDON_HORIZON_MIN} MINUTES")
        )
    )
    # Day keys as strings (repo convention): the driver's comparator
    # stringifies cells, and DATE round-trips differ between engines.
    abandoned = (
        views.join(purchases, cond, "left_anti")
        .groupBy(F.date_format("vts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("abandoned_ct"))
    )
    daily = views.groupBy(F.date_format("vts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("view_ct")
    )
    return (
        daily.join(abandoned, "day", "left")
        .withColumn(
            "abandoned_ct", F.coalesce("abandoned_ct", F.lit(0).cast("bigint"))
        )
        .select(
            "day",
            "view_ct",
            "abandoned_ct",
            F.expr("abandoned_ct * 1000000 div view_ct").alias(
                "abandoned_micro"
            ),
        )
    )


_ABANDON_SQL = f"""
WITH v AS (
    SELECT user_id, ts FROM events WHERE event_type = 'view'
),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
ab AS (
    SELECT strftime(v.ts, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT) AS abandoned_ct
    FROM v
    WHERE NOT EXISTS (
        SELECT 1 FROM p
        WHERE p.user_id = v.user_id
          AND p.ts > v.ts
          AND p.ts <= v.ts + INTERVAL {ABANDON_HORIZON_MIN} MINUTE
    )
    GROUP BY 1
),
daily AS (
    SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(count(*) AS BIGINT) AS view_ct
    FROM v GROUP BY 1
)
SELECT d.day, d.view_ct,
       COALESCE(a.abandoned_ct, CAST(0 AS BIGINT)) AS abandoned_ct,
       COALESCE(a.abandoned_ct, CAST(0 AS BIGINT)) * 1000000 // d.view_ct
           AS abandoned_micro
FROM daily d LEFT JOIN ab a ON a.day = d.day
"""


# ---------------------------------------------------------------------------
# Journey-path mining: top event-type 3-grams across user sessions — the
# sequence generalization of `event_type_markov_transitions` (1-step).
# Reference analogue: the page-path fields the reference carries per log
# event (`last_page_id` chains in R/app/dwd/BaseLogApp.java:137-139) —
# here the chain is materialized two steps deep and ranked corpus-wide.
#
# Scale: one user-keyed window sort produces both lead steps (the two
# lead() calls share ONE partitioning/sort); the path space is bounded by
# T³ for T event types, so the count combine and the rank run on a tiny
# frame. Determinism: ties rank by (count desc, path asc) under
# row_number, so top-K is a total order, independent of partitioning.
# ---------------------------------------------------------------------------
JOURNEY_TOPK = 20


def user_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ts IS NOT NULL: a NULL-ts event has no sequence position, and the
    # engines disagree on where it would sort (Spark window ASC = NULLS
    # FIRST, DuckDB = NULLS LAST) — caught by the r9 NULL-ts fixture rows
    ev = _events(spark, sf_dir).filter(F.col("ts").isNotNull()).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    grams = (
        ev.withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
    )
    counts = grams.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("path_ct")
    )
    ranked = counts.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("path_ct").desc(), F.col("path"))
        ),
    )
    return ranked.filter(F.col("rk") <= JOURNEY_TOPK).select(
        "path", "path_ct", F.col("rk").cast("bigint").alias("rk")
    )


_JOURNEY_SQL = f"""
WITH g AS (
    SELECT user_id, event_type,
           lead(event_type, 1) OVER w AS e2,
           lead(event_type, 2) OVER w AS e3
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
counts AS (
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(count(*) AS BIGINT) AS path_ct
    FROM g WHERE e3 IS NOT NULL
    GROUP BY 1
),
ranked AS (
    SELECT path, path_ct,
           CAST(row_number() OVER (ORDER BY path_ct DESC, path) AS BIGINT)
               AS rk
    FROM counts
)
SELECT path, path_ct, rk FROM ranked WHERE rk <= {JOURNEY_TOPK}
"""


# ---------------------------------------------------------------------------
# Churn labeling: the supervised-label generator for retention models —
# per signup-day cohort, the share of users with NO activity in the final
# CHURN_WINDOW_DAYS of the observed range. Complements
# `user_retention_cohorts` (which counts RETURNING activity day-by-day)
# with the binary label an ML pipeline actually trains on.
#
# One user-keyed combine produces first-day (cohort) and last-day
# (churn test) together; the cutoff derives from the data's own max ts so
# the label is reproducible from the table alone. Integer micro-unit rate.
# ---------------------------------------------------------------------------
CHURN_WINDOW_DAYS = 7


def user_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "ts")
    bounds = ev.agg(F.max("ts").alias("max_ts"))
    users = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    labeled = users.crossJoin(F.broadcast(bounds)).select(
        F.date_format("first_ts", "yyyy-MM-dd").alias("cohort_day"),
        F.when(
            F.col("last_ts")
            < F.col("max_ts")
            - F.expr(f"INTERVAL {CHURN_WINDOW_DAYS} DAYS"),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("churned"),
    )
    return (
        labeled.groupBy("cohort_day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("churned").alias("churned_ct"),
        )
        .select(
            "cohort_day",
            "n_users",
            "churned_ct",
            F.expr("churned_ct * 1000000 div n_users").alias("churn_micro"),
        )
    )


_CHURN_SQL = f"""
WITH bounds AS (SELECT max(ts) AS max_ts FROM events),
users AS (
    SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts
    FROM events GROUP BY 1
),
labeled AS (
    SELECT strftime(u.first_ts, '%Y-%m-%d') AS cohort_day,
           CAST(CASE WHEN u.last_ts <
                    b.max_ts - INTERVAL {CHURN_WINDOW_DAYS} DAY
                THEN 1 ELSE 0 END AS BIGINT) AS churned
    FROM users u, bounds b
)
SELECT cohort_day,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(churned) AS BIGINT) AS churned_ct,
       CAST(sum(churned) * 1000000 // count(*) AS BIGINT) AS churn_micro
FROM labeled
GROUP BY 1
"""
# NOTE (r6): every oracle's FINAL SELECT casts sums / integer-divisions to
# BIGINT explicitly. DuckDB types un-cast sum(BIGINT) (and // on it) as
# HUGEINT, which the driver's value-hash renders differently from BIGINT
# even when the values are identical — the root cause of all 9 r5
# hash-reds. tests/test_output_type_contract.py enforces this repo-wide.


# ---------------------------------------------------------------------------
# Behavioral diversity: Gini impurity of each user's event-type mix —
# the log-free diversity metric (entropy needs ln, which the engine's
# float-determinism doctrine bans from oracle-gated expressions; Gini
# 1 − Σp² carries the same "how one-dimensional is this user" signal in
# exact integer arithmetic: 1e6 − Σc_i²·1e6 div n²). Two combines: the
# (user, type) counts, then the per-user reduce; both map-side partial.
# ---------------------------------------------------------------------------
def user_event_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select("user_id", "event_type")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        counts.groupBy("user_id")
        .agg(
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
        )
        .select(
            "user_id",
            "n_events",
            "n_types",
            F.expr(
                "1000000 - (sum_sq * 1000000) div (n_events * n_events)"
            ).alias("gini_micro"),
        )
    )


_DIVERSITY_SQL = """
WITH counts AS (
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
)
SELECT user_id,
       CAST(sum(c) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(1000000 - (sum(c * c) * 1000000) // (sum(c) * sum(c))
            AS BIGINT) AS gini_micro
FROM counts
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# RFM (recency / frequency / monetary) feature generation — the classic
# per-user feature block a churn/LTV model trains on, completing the
# behavioral-feature family (`user_ltv_segments` buckets one dimension;
# this emits the full three-score profile per user).
#
# Recency is whole days from the user's last purchase to the corpus' last
# purchase (DATE subtraction, identical in both engines); frequency and
# monetary are exact counts/cents from one user-keyed combine. Scores are
# quintiles via ntile over a TOTAL order (metric, then user_id), so the
# assignment is deterministic; r_score orders recency DESC so 5 = most
# recent, matching the marketing convention for all three scores.
#
# Scale note: the three global ntile windows are single-reducer sorts —
# the exact-truth definition this engine oracle-checks. At 100 TB the
# quintile BOUNDARIES would come from `plan_range_partitions`-style
# equi-depth planning (or approx_percentile) and the scores from a
# broadcast range lookup; the per-user aggregate underneath is unchanged.
# ---------------------------------------------------------------------------
RFM_BUCKETS = 5


def rfm_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _events(spark, sf_dir).filter(F.col("event_type") == "purchase")
    ref = p.agg(F.max(F.col("ts").cast("date")).alias("ref_day"))
    per_user = p.groupBy("user_id").agg(
        F.max(F.col("ts").cast("date")).alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("f_ct"),
        F.sum(money_cents("value")).alias("m_cents"),
    )
    feats = per_user.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.datediff("ref_day", "last_day").cast("bigint").alias("r_days"),
        "f_ct",
        "m_cents",
    )
    # NULL positions pinned explicitly: Spark defaults NULLS FIRST on ASC
    # while DuckDB defaults NULLS LAST — a NULL user_id (or an all-NULL
    # m_cents) would land in different quintiles (caught by the NULL
    # fixture suite).
    r_w = Window.orderBy(
        F.col("r_days").desc_nulls_last(), F.col("user_id").asc_nulls_first()
    )
    f_w = Window.orderBy(
        F.col("f_ct").asc_nulls_first(), F.col("user_id").asc_nulls_first()
    )
    m_w = Window.orderBy(
        F.col("m_cents").asc_nulls_first(), F.col("user_id").asc_nulls_first()
    )
    return feats.select(
        "user_id",
        "r_days",
        "f_ct",
        "m_cents",
        F.ntile(RFM_BUCKETS).over(r_w).alias("r_score"),
        F.ntile(RFM_BUCKETS).over(f_w).alias("f_score"),
        F.ntile(RFM_BUCKETS).over(m_w).alias("m_score"),
    )


_RFM_SQL = f"""
WITH p AS (
    SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
ref AS (SELECT max(CAST(ts AS DATE)) AS ref_day FROM p),
per_user AS (
    SELECT user_id,
           max(CAST(ts AS DATE)) AS last_day,
           CAST(count(*) AS BIGINT) AS f_ct,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS m_cents
    FROM p GROUP BY 1
),
feats AS (
    SELECT user_id,
           CAST(ref.ref_day - last_day AS BIGINT) AS r_days,
           f_ct, m_cents
    FROM per_user CROSS JOIN ref
)
SELECT user_id, r_days, f_ct, m_cents,
       CAST(ntile({RFM_BUCKETS})
            OVER (ORDER BY r_days DESC NULLS LAST,
                  user_id NULLS FIRST) AS INTEGER) AS r_score,
       CAST(ntile({RFM_BUCKETS})
            OVER (ORDER BY f_ct NULLS FIRST,
                  user_id NULLS FIRST) AS INTEGER) AS f_score,
       CAST(ntile({RFM_BUCKETS})
            OVER (ORDER BY m_cents NULLS FIRST,
                  user_id NULLS FIRST) AS INTEGER) AS m_score
FROM feats
"""


# ---------------------------------------------------------------------------
# Per-type quantile normalization — the feature-preprocessing transform
# that maps each value to its within-type percentile position in integer
# micro-units: pct_micro = (rank - 1) * 1e6 div (n - 1), rank = ANSI
# rank() over cents (ties share a rank, so the output is a pure function
# of the VALUE, not of row order — deterministic under any partitioning).
#
# Scale doctrine: same as `winsorized_value_stats` — the per-type window
# sort is the exact-truth definition this engine oracle-checks; at 100 TB
# the swap is approx-percentile boundary tables + a broadcast range
# lookup, with the per-row transform unchanged.
# ---------------------------------------------------------------------------
def quantile_normalize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", money_cents("value").alias("cents"))
    )
    w = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    return ev.select(
        "event_type",
        "event_id",
        "cents",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("n"),
    ).select(
        "event_type",
        "event_id",
        "cents",
        F.expr(
            "CASE WHEN n > 1 THEN (rnk - 1) * 1000000 div (n - 1) "
            "ELSE cast(0 as bigint) END"
        ).alias("pct_micro"),
    )


_QNORM_SQL = """
WITH ev AS (
    SELECT event_type, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL
),
ranked AS (
    SELECT event_type, event_id, cents,
           CAST(rank() OVER (PARTITION BY event_type ORDER BY cents)
                AS BIGINT) AS rnk,
           CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
    FROM ev
)
SELECT event_type, event_id, cents,
       CASE WHEN n > 1 THEN (rnk - 1) * 1000000 // (n - 1)
            ELSE CAST(0 AS BIGINT) END AS pct_micro
FROM ranked
"""


# ---------------------------------------------------------------------------
# Market-basket association over event-type baskets — classic
# co-occurrence rules at warehouse scale: a basket is one (user, day),
# items are the distinct event types it contains, and each type pair gets
# support and LIFT = N·P(a,b) / (P(a)·P(b)) in exact integer micro-units.
#
# Scale shape (same bounded-pair doctrine as audience_overlap_jaccard):
# per-basket item sets come from ONE distinct + collect_set (bounded by
# the type domain T), pairs explode in-row to ≤ T(T−1)/2 rows per basket,
# and the only corpus-sized shuffles are the basket distinct and the pair
# combine. Per-item counts (T rows) and the basket total broadcast. The
# lift numerator N · pair_ct · 1e6 is computed in DECIMAL(38,0)/HUGEINT —
# at 100 TB, N ~ 1e12 would wrap int64 — then floored back to bigint.
# ---------------------------------------------------------------------------
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.functions.exprs import (
        ordered_pair_structs,
    )

    # NULL-keyed baskets are excluded EXPLICITLY on both engines: a
    # basket needs an identity and a day, and leaving NULL keys in would
    # diverge anyway (Spark's groupBy keeps a NULL group while the
    # oracle's equi-self-join can never match NULL = NULL).
    b = (
        _events(spark, sf_dir)
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isNotNull()
        )
        .select(
            "user_id",
            F.date_trunc("day", "ts").alias("d"),
            "event_type",
        )
        .distinct()
    )
    baskets = b.groupBy("user_id", "d").agg(
        F.array_sort(F.collect_set("event_type")).alias("items")
    )
    n_baskets = baskets.agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    item_ct = b.groupBy(F.col("event_type").alias("item")).agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    pairs = (
        baskets.select(
            F.explode(ordered_pair_structs("items", "item_a", "item_b")).alias("p")
        )
        .groupBy("p.item_a", "p.item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("pair_ct"))
    )
    ca = item_ct.select(F.col("item").alias("item_a"), F.col("ct").alias("ct_a"))
    cb = item_ct.select(F.col("item").alias("item_b"), F.col("ct").alias("ct_b"))
    return (
        pairs.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_ct",
            "ct_a",
            "ct_b",
            F.col("n").alias("n_baskets"),
            F.expr("pair_ct * 1000000 div n").alias("support_micro"),
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * pair_ct * 1000000)"
                " div (CAST(ct_a AS DECIMAL(38,0)) * ct_b) AS BIGINT)"
            ).alias("lift_micro"),
        )
    )


_BASKET_SQL = """
WITH b AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS d, event_type
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
      AND event_type IS NOT NULL
),
n AS (
    SELECT CAST(count(*) AS BIGINT) AS n
    FROM (SELECT DISTINCT user_id, d FROM b)
),
item_ct AS (
    SELECT event_type AS item, CAST(count(*) AS BIGINT) AS ct
    FROM b GROUP BY 1
),
pairs AS (
    SELECT a.event_type AS item_a, c.event_type AS item_b,
           CAST(count(*) AS BIGINT) AS pair_ct
    FROM b a JOIN b c
      ON a.user_id = c.user_id AND a.d = c.d
     AND a.event_type < c.event_type
    GROUP BY 1, 2
)
SELECT p.item_a, p.item_b, p.pair_ct, ca.ct AS ct_a, cb.ct AS ct_b,
       n.n AS n_baskets,
       p.pair_ct * 1000000 // n.n AS support_micro,
       CAST((CAST(n.n AS HUGEINT) * p.pair_ct * 1000000)
            // (CAST(ca.ct AS HUGEINT) * cb.ct) AS BIGINT) AS lift_micro
FROM pairs p
JOIN item_ct ca ON p.item_a = ca.item
JOIN item_ct cb ON p.item_b = cb.item
CROSS JOIN n
"""


# ---------------------------------------------------------------------------
# Item-item collaborative filtering, FULL serve path: neighborhood build
# (co-occurrence squared-cosine over the customer x part purchase matrix)
# AND the recommendation-generation step most "similarity" operators stop
# short of — per-user candidate expansion through the neighbor lists,
# owned-item anti-join, score combine, top-K. This is the batch
# recommender a warehouse actually ships (Linden et al., IEEE IC'03
# item-to-item CF), distinct from `market_basket_lift` (event-TYPE pairs,
# a 5x5 domain) — here items are the PART CATALOG, so every stage must
# survive a catalog-sized domain.
#
# Scale shape:
# - pair generation is bounded the repo's standard way: users with more
#   than CF_ITEM_CAP distinct items are excluded from the matrix (hub
#   guard, same doctrine as BUCKET_CAP in mining.py) => pairs per user
#   <= C(CAP,2), total pair volume linear in users at any corpus size;
#   CF_MIN_COOC prunes the singleton-pair tail before scoring.
# - degrees and neighbor lists are item-domain-sized; they flow through
#   SHUFFLE joins (not broadcast) because a real catalog (1e8 items x
#   CF_NEIGHBORS) exceeds broadcast limits — AQE demotes to broadcast
#   when the domain is actually small.
# - the serve join expands each user-item row to <= CF_NEIGHBORS
#   candidates (linear), the anti-join removes owned items, and the
#   per-user top-K is a WindowGroupLimit.
# - squared cosine keeps the log-free/sqrt-free doctrine: cos^2 in micro
#   = 1e6*cooc^2 div (deg_a*deg_b), exact on DECIMAL(38,0)/HUGEINT
#   (cooc<=1e12 at extreme scale -> cooc^2*1e6 <= 1e30 < 10^38), then
#   floored to BIGINT at the output boundary. Squaring is monotone on
#   nonnegative cosines, so rankings are unchanged.
# Ties are totally ordered everywhere ((cos2 DESC, nb ASC) and
# (score DESC, item ASC)), so neighborhood cuts and served top-Ks are
# pure functions of the purchase matrix.
# ---------------------------------------------------------------------------
CF_ITEM_CAP = 128
CF_MIN_COOC = 2
CF_NEIGHBORS = 10
CF_RECS = 5


def item_cf_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.functions.exprs import (
        ordered_pair_structs,
    )

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    # r10 optimization (guide §2.4 "remove shuffles outright"): the matrix
    # build used to be distinct (one (user,item)-keyed exchange) -> window
    # count over user_id (a second, user-keyed exchange) -> a THIRD
    # user-keyed exchange for the collect_set basket aggregate. One
    # user-keyed collect_set (which dedups, so no separate distinct) now
    # produces the baskets directly; size(items) IS the distinct-item
    # count, so the hub cap is unchanged, and the flat (user, item) view
    # is an in-row explode of the persisted baskets — 3 corpus-sized
    # exchanges -> 1. Values everywhere downstream are identical.
    baskets = (
        orders.join(
            lineitem,
            orders["o_orderkey"] == lineitem["l_orderkey"],
        )
        .filter(
            F.col("o_custkey").isNotNull() & F.col("l_partkey").isNotNull()
        )
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item"),
        )
        .groupBy("user_id")
        .agg(F.array_sort(F.collect_set("item")).alias("items"))
        .filter(F.size("items") <= CF_ITEM_CAP)
        .persist()  # consumed 4x: degrees, pair explode, serve probe, anti
    )
    uc = baskets.select("user_id", F.explode("items").alias("item"))
    deg = uc.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    pairs = (
        baskets.select(
            F.explode(ordered_pair_structs("items", "ia", "ib")).alias("p")
        )
        .groupBy("p.ia", "p.ib")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cooc"))
        .filter(F.col("cooc") >= CF_MIN_COOC)
        .persist()  # sym reads pairs twice (both union legs)
    )
    sym = pairs.select(
        F.col("ia").alias("item"), F.col("ib").alias("nb"), "cooc"
    ).unionAll(
        pairs.select(
            F.col("ib").alias("item"), F.col("ia").alias("nb"), "cooc"
        )
    )
    scored = (
        sym.join(deg.select(F.col("item"), F.col("d").alias("da")), "item")
        .join(
            deg.select(F.col("item").alias("nb"), F.col("d").alias("db")),
            "nb",
        )
        .select(
            "item",
            "nb",
            F.expr(
                "CAST((CAST(cooc AS DECIMAL(38,0)) * cooc * 1000000)"
                " div (CAST(da AS DECIMAL(38,0)) * db) AS BIGINT)"
            ).alias("cos2_micro"),
        )
    )
    wn = Window.partitionBy("item").orderBy(
        F.col("cos2_micro").desc(), F.col("nb")
    )
    nbrs = (
        scored.withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") <= CF_NEIGHBORS)
        .select("item", "nb", "cos2_micro")
    )
    serve = (
        uc.join(nbrs, "item")
        .select("user_id", F.col("nb").alias("rec_item"), "cos2_micro")
        .join(
            uc.select("user_id", F.col("item").alias("rec_item")),
            ["user_id", "rec_item"],
            "left_anti",
        )
    )
    scores = serve.groupBy("user_id", "rec_item").agg(
        F.sum("cos2_micro").cast("bigint").alias("score_micro"),
        F.count(F.lit(1)).cast("bigint").alias("n_paths"),
    )
    wu = Window.partitionBy("user_id").orderBy(
        F.col("score_micro").desc(), F.col("rec_item")
    )
    return (
        scores.withColumn("rec_rank", F.row_number().over(wu))
        .filter(F.col("rec_rank") <= CF_RECS)
        .select("user_id", "rec_rank", "rec_item", "score_micro", "n_paths")
    )


_ITEM_CF_SQL = f"""
WITH ui AS (
    SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_custkey IS NOT NULL AND l.l_partkey IS NOT NULL
),
uc AS (
    SELECT user_id, item FROM (
        SELECT user_id, item,
               count(*) OVER (PARTITION BY user_id) AS n_items
        FROM ui
    ) WHERE n_items <= {CF_ITEM_CAP}
),
deg AS (
    SELECT item, CAST(count(*) AS BIGINT) AS d FROM uc GROUP BY 1
),
pairs AS (
    SELECT a.item AS ia, c.item AS ib, CAST(count(*) AS BIGINT) AS cooc
    FROM uc a JOIN uc c
      ON a.user_id = c.user_id AND a.item < c.item
    GROUP BY 1, 2
    HAVING count(*) >= {CF_MIN_COOC}
),
sym AS (
    SELECT ia AS item, ib AS nb, cooc FROM pairs
    UNION ALL
    SELECT ib AS item, ia AS nb, cooc FROM pairs
),
scored AS (
    SELECT s.item, s.nb,
           CAST((CAST(s.cooc AS HUGEINT) * s.cooc * 1000000)
                // (CAST(da.d AS HUGEINT) * db.d) AS BIGINT) AS cos2_micro
    FROM sym s
    JOIN deg da ON s.item = da.item
    JOIN deg db ON s.nb = db.item
),
nbrs AS (
    SELECT item, nb, cos2_micro FROM (
        SELECT item, nb, cos2_micro,
               row_number() OVER (PARTITION BY item
                                  ORDER BY cos2_micro DESC, nb) AS rn
        FROM scored
    ) WHERE rn <= {CF_NEIGHBORS}
),
serve AS (
    SELECT u.user_id, n.nb AS rec_item, n.cos2_micro
    FROM uc u JOIN nbrs n ON u.item = n.item
    WHERE NOT EXISTS (
        SELECT 1 FROM uc o2
        WHERE o2.user_id = u.user_id AND o2.item = n.nb
    )
),
scores AS (
    SELECT user_id, rec_item,
           CAST(sum(cos2_micro) AS BIGINT) AS score_micro,
           CAST(count(*) AS BIGINT) AS n_paths
    FROM serve GROUP BY 1, 2
)
SELECT user_id, CAST(rn AS INTEGER) AS rec_rank, rec_item,
       score_micro, n_paths
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY score_micro DESC, rec_item) AS rn
    FROM scores
)
WHERE rn <= {CF_RECS}
"""


# ---------------------------------------------------------------------------
# Time-decayed engagement score — the recency-weighted feature ranking
# models consume, with the decay EXACT by construction: weight halves
# every DECAY_HALF_LIFE_D days via integer right-shift-style division
# (cents div 2^k, k = age_days div half_life), so the score is pure
# bigint arithmetic — no exp()/pow() floats to drift across engines.
# k is capped at 62 (beyond that the contribution is provably 0 in
# int64), which also bounds the power-of-two literal. One user-keyed
# combine; the reference day broadcasts.
# ---------------------------------------------------------------------------
DECAY_HALF_LIFE_D = 7


def decayed_user_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            money_cents("value").alias("cents"),
        )
    )
    ref = ev.agg(F.max("d").alias("ref_day"))
    scored = ev.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.expr(
            f"least(cast(62 as bigint), "
            f"cast(datediff(ref_day, d) as bigint) div {DECAY_HALF_LIFE_D})"
        ).alias("k"),
        "cents",
    )
    return scored.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("cents").alias("raw_cents"),
        # shiftright, not div: arithmetic shift FLOORS for negative cents
        # identically on both engines (verified: -5 >> 1 = -3 on each).
        # div / DuckDB's // would ALSO agree cross-engine (both truncate
        # toward zero; verified -7 // 2 = -3 in DuckDB) — floor is chosen
        # because it is the decay convention that never rounds a debt
        # toward zero faster than an asset.
        F.sum(F.expr("shiftright(cents, cast(k as int))"))
        .alias("decayed_cents"),
    )


_DECAY_SQL = f"""
WITH ev AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events WHERE value IS NOT NULL
),
ref AS (SELECT max(d) AS ref_day FROM ev),
scored AS (
    SELECT user_id,
           least(CAST(62 AS BIGINT),
                 CAST(ref.ref_day - d AS BIGINT) // {DECAY_HALF_LIFE_D}) AS k,
           cents
    FROM ev CROSS JOIN ref
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS BIGINT) AS raw_cents,
       CAST(sum(cents >> CAST(k AS INTEGER)) AS BIGINT) AS decayed_cents
FROM scored
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Window funnel (view -> click -> purchase within FUNNEL_WINDOW_MIN of the
# FIRST step) — the ordered-sequence-with-timeout conversion metric
# (ClickHouse windowFunnel semantics). The naive form is a triple
# time-range self-join; this is the ZERO-JOIN form: one per-user sort
# carries THREE chained running-max window functions —
#   v_ts    = latest view strictly before this row,
#   vc      = on click rows, the anchor view if the click lands inside
#             the anchor's window (step 2 complete; CARRIES the anchor),
#   best_vc = latest such anchor strictly before this row,
# and a purchase completes depth 3 iff it lands inside best_vc's window.
# Maximizing the anchor is exact, not greedy-approximate: a later
# qualifying view can only extend the deadline, so depth-k existence is
# preserved (for fixed purchase p, any admissible (v, c) chain implies
# the maximal v admits one too).
#
# Scale: ONE shuffle on user_id, one sort reused by all three frames
# (same shape as running_balance_floor's stacked Lindley windows), then a
# per-user combine and a 4-row histogram. Per-user event counts are
# human-bounded, so window state is flat at any corpus size.
# ---------------------------------------------------------------------------
# 8h: at the driver's sf0.01 density this exercises every depth branch
# (measured 20/113/17 users at depths 1/2/3; 30 min leaves depth 3 empty)
FUNNEL_WINDOW_MIN = 480


def window_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id", "event_id", "ts", "event_type"
    ).filter(F.col("event_type").isin("view", "click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    horizon = F.expr(f"INTERVAL {FUNNEL_WINDOW_MIN} MINUTES")
    s1 = ev.withColumn(
        "v_ts",
        F.max(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    s2 = s1.withColumn(
        "vc",
        F.when(
            (F.col("event_type") == "click")
            & F.col("v_ts").isNotNull()
            & (F.col("ts") <= F.col("v_ts") + horizon),
            F.col("v_ts"),
        ),
    )
    s3 = s2.withColumn("best_vc", F.max("vc").over(w))
    depth = (
        F.when(
            (F.col("event_type") == "purchase")
            & F.col("best_vc").isNotNull()
            & (F.col("ts") <= F.col("best_vc") + horizon),
            3,
        )
        .when(F.col("vc").isNotNull(), 2)
        .when(F.col("event_type") == "view", 1)
        .otherwise(0)
    )
    per_user = s3.groupBy("user_id").agg(
        F.max(depth).cast("bigint").alias("depth")
    )
    return per_user.groupBy("depth").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


_FUNNEL_DEPTH_SQL = f"""
WITH ev AS (
    SELECT user_id, event_id, ts, event_type
    FROM events WHERE event_type IN ('view', 'click', 'purchase')
),
s1 AS (
    SELECT *,
           max(CASE WHEN event_type = 'view' THEN ts END) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS v_ts
    FROM ev
),
s2 AS (
    SELECT *,
           CASE WHEN event_type = 'click' AND v_ts IS NOT NULL
                     AND ts <= v_ts + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
                THEN v_ts END AS vc
    FROM s1
),
s3 AS (
    SELECT *,
           max(vc) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_vc
    FROM s2
),
per_user AS (
    SELECT user_id,
           CAST(max(CASE WHEN event_type = 'purchase'
                              AND best_vc IS NOT NULL
                              AND ts <= best_vc
                                  + INTERVAL {FUNNEL_WINDOW_MIN} MINUTE
                         THEN 3
                         WHEN vc IS NOT NULL THEN 2
                         WHEN event_type = 'view' THEN 1
                         ELSE 0 END) AS BIGINT) AS depth
    FROM s3
    GROUP BY 1
)
SELECT depth, CAST(count(*) AS BIGINT) AS n_users
FROM per_user
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Day-presence bitmap retention — the bitmap rollup a retention dashboard
# is built on: each user's activity over the RETENTION_DAYS after their
# first day collapses to ONE int64 bitmask (bit d = active on
# first_day + d), so per-cohort retention for EVERY horizon is a bitwise
# aggregate over one value per user, not a per-(user, day) frame. This is
# the classic presence-bitmap technique (roaring-bitmap engines expose it
# as groupBitmap/retention); int64 covers the 30-day product convention
# exactly.
#
# Scale: (user, day) distinct -> per-user combine (min day + bit_or mask,
# both map-side partial) -> cohort-sized output. The per-(user, day)
# frame is touched ONCE; every retention column afterwards is bit
# arithmetic on the mask.
# ---------------------------------------------------------------------------
RETENTION_DAYS = 30


def user_day_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        _events(spark, sf_dir)
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    first = ud.groupBy("user_id").agg(F.min("d").alias("first_day"))
    offs = ud.join(first, "user_id").select(
        "user_id",
        "first_day",
        F.datediff("d", "first_day").cast("bigint").alias("off"),
    ).filter(F.col("off") < RETENTION_DAYS)
    masks = offs.groupBy("user_id", "first_day").agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(off AS INT)))")
        .alias("mask")
    )
    return (
        masks.groupBy(
            F.date_format("first_day", "yyyy-MM-dd").alias("cohort_day")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum(F.bit_count("mask")).cast("bigint").alias("active_days"),
            F.sum(
                F.when(F.expr("mask & 2") != 0, 1).otherwise(0)
            ).cast("bigint").alias("retained_d1"),
            F.sum(
                F.when(F.expr("mask & 128") != 0, 1).otherwise(0)
            ).cast("bigint").alias("retained_d7"),
        )
    )


_BITMAP_RETENTION_SQL = f"""
WITH ud AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
first AS (
    SELECT user_id, min(d) AS first_day FROM ud GROUP BY 1
),
offs AS (
    SELECT u.user_id, f.first_day,
           CAST(u.d - f.first_day AS BIGINT) AS off
    FROM ud u JOIN first f ON u.user_id = f.user_id
    WHERE CAST(u.d - f.first_day AS BIGINT) < {RETENTION_DAYS}
),
masks AS (
    SELECT user_id, first_day,
           bit_or(CAST(1 AS BIGINT) << CAST(off AS INTEGER)) AS mask
    FROM offs GROUP BY 1, 2
)
SELECT strftime(first_day, '%Y-%m-%d') AS cohort_day,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(bit_count(mask)) AS BIGINT) AS active_days,
       CAST(sum(CASE WHEN (mask & 2) <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS retained_d1,
       CAST(sum(CASE WHEN (mask & 128) <> 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS retained_d7
FROM masks
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Conversion-lag profile — the measurement that JUSTIFIES the funnel
# window constant: distribution of each user's first-view -> first-
# subsequent-purchase lag, with conversion shares at the candidate window
# widths (30 min / FUNNEL_WINDOW_MIN / 24 h) and exact discrete lag
# percentiles. FUNNEL_WINDOW_MIN = 480 was picked from exactly this
# table; the doctrine is that tuned constants stay auditable from the
# data, not folklore (same spirit as minhash_band_tuning choosing the
# banding).
#
# One combine for first views, one min-reduce over the user-keyed
# purchase join, discrete percentiles via row_number over the
# (lag, user_id) total order — single-row output.
# ---------------------------------------------------------------------------
def conversion_lag_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    first_view = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    # Time bound in the JOIN condition, not a post-filter: a viewer whose
    # purchases all PRECEDE the first view must survive as a non-converted
    # row (a post-join filter would drop every one of their rows and
    # silently shrink n_viewers).
    conv = (
        first_view.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") > F.col("v_ts")),
            "left",
        )
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(min(CAST(p_ts AS LONG) - CAST(v_ts AS LONG)) div 60"
                " AS BIGINT)"
            ).alias("lag_min")
        )
    )
    ranked = conv.filter(F.col("lag_min").isNotNull()).withColumn(
        "rn",
        F.row_number().over(Window.orderBy("lag_min", "user_id")),
    )
    n_conv = ranked.agg(F.count(F.lit(1)).cast("bigint").alias("n_converted"))
    pcts = (
        ranked.crossJoin(F.broadcast(n_conv))
        .select(
            F.max(
                F.when(
                    F.col("rn") == F.expr("CAST(ceil(n_converted * 0.5) AS BIGINT)"),
                    F.col("lag_min"),
                )
            ).alias("p50_lag_min"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("CAST(ceil(n_converted * 0.9) AS BIGINT)"),
                    F.col("lag_min"),
                )
            ).alias("p90_lag_min"),
            F.sum(F.when(F.col("lag_min") <= 30, 1).otherwise(0))
            .cast("bigint")
            .alias("conv_30m"),
            F.sum(
                F.when(F.col("lag_min") <= FUNNEL_WINDOW_MIN, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("conv_funnel_window"),
            F.sum(F.when(F.col("lag_min") <= 1440, 1).otherwise(0))
            .cast("bigint")
            .alias("conv_24h"),
        )
    )
    totals = conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_viewers"),
        F.sum(F.when(F.col("lag_min").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_converted"),
    )
    return totals.crossJoin(F.broadcast(pcts)).select(
        "n_viewers",
        "n_converted",
        "conv_30m",
        "conv_funnel_window",
        "conv_24h",
        F.col("p50_lag_min").cast("bigint").alias("p50_lag_min"),
        F.col("p90_lag_min").cast("bigint").alias("p90_lag_min"),
    )


_CONV_LAG_SQL = f"""
WITH first_view AS (
    SELECT user_id, min(ts) AS v_ts FROM events
    WHERE event_type = 'view' GROUP BY 1
),
conv AS (
    SELECT f.user_id,
           CAST(min(date_diff('second', f.v_ts, p.ts)) // 60 AS BIGINT)
               AS lag_min
    FROM first_view f
    LEFT JOIN events p
      ON p.user_id = f.user_id AND p.event_type = 'purchase'
     AND p.ts > f.v_ts
    GROUP BY 1
),
ranked AS (
    SELECT lag_min,
           row_number() OVER (ORDER BY lag_min, user_id) AS rn
    FROM conv WHERE lag_min IS NOT NULL
),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_converted FROM ranked),
pcts AS (
    SELECT
        CAST(max(CASE WHEN r.rn = CAST(ceil(nc.n_converted * 0.5) AS BIGINT)
                 THEN r.lag_min END) AS BIGINT) AS p50_lag_min,
        CAST(max(CASE WHEN r.rn = CAST(ceil(nc.n_converted * 0.9) AS BIGINT)
                 THEN r.lag_min END) AS BIGINT) AS p90_lag_min,
        CAST(sum(CASE WHEN r.lag_min <= 30 THEN 1 ELSE 0 END) AS BIGINT)
            AS conv_30m,
        CAST(sum(CASE WHEN r.lag_min <= {FUNNEL_WINDOW_MIN} THEN 1 ELSE 0 END)
             AS BIGINT) AS conv_funnel_window,
        CAST(sum(CASE WHEN r.lag_min <= 1440 THEN 1 ELSE 0 END) AS BIGINT)
            AS conv_24h
    FROM ranked r CROSS JOIN nc
),
totals AS (
    SELECT CAST(count(*) AS BIGINT) AS n_viewers,
           CAST(sum(CASE WHEN lag_min IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_converted
    FROM conv
)
SELECT t.n_viewers, t.n_converted, p.conv_30m, p.conv_funnel_window,
       p.conv_24h, p.p50_lag_min, p.p90_lag_min
FROM totals t CROSS JOIN pcts p
"""


# ---------------------------------------------------------------------------
# Theil–Sen robust trend per user: the LOWER MEDIAN of all pairwise
# day-to-day spend slopes. The robust-statistics answer to "is this user's
# spend trending up" — a single outlier day shifts an OLS slope
# arbitrarily but moves the pairwise-slope median by at most one rank.
#
# Exactness: slope = floor((v2-v1) * 1e6 / (d2-d1)) micro-cents/day, the
# floor of an EXACT double quotient (numerator ≤ 1e12, denominator ≤ 31 —
# both exactly representable, so floor() agrees bit-for-bit across
# engines). The median is the lower order statistic picked by row_number
# over (slope, d1, d2) — deterministic, no interpolation, always an
# actual pair's slope.
#
# Scale: the pair explode is per-user over OBSERVED DAYS, capped by the
# calendar span (31 days → ≤ 465 pairs/user; a trailing-90-day window
# bounds it at 4 005 at any horizon) — total work is linear in users with
# a constant per-user factor, one user-keyed shuffle for the self-join +
# one window sort over the bounded pair set.
# ---------------------------------------------------------------------------
def user_value_trend_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(F.sum(money_cents("value")).alias("v_c"))
    )
    a = daily.select(
        "user_id", F.col("d").alias("d1"), F.col("v_c").alias("v1")
    )
    b = daily.select(
        "user_id", F.col("d").alias("d2"), F.col("v_c").alias("v2")
    )
    pairs = a.join(b, "user_id").filter(F.col("d1") < F.col("d2"))
    slopes = pairs.select(
        "user_id",
        "d1",
        "d2",
        F.floor(
            (F.col("v2") - F.col("v1"))
            * 1_000_000.0
            / F.datediff("d2", "d1")
        )
        .cast("bigint")
        .alias("slope_micro"),
    )
    w = Window.partitionBy("user_id").orderBy("slope_micro", "d1", "d2")
    ranked = slopes.withColumn("rn", F.row_number().over(w)).withColumn(
        "n_pairs", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
    )
    return ranked.filter(
        F.col("rn") == F.expr("(n_pairs + 1) div 2")
    ).select(
        "user_id",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.col("slope_micro").alias("theilsen_slope_micro"),
    )


_THEILSEN_SQL = """
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_c
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1, 2
),
slopes AS (
    SELECT a.user_id, a.d AS d1, b.d AS d2,
           CAST(floor((b.v_c - a.v_c) * 1000000.0 / (b.d - a.d))
                AS BIGINT) AS slope_micro
    FROM daily a JOIN daily b
      ON a.user_id = b.user_id AND a.d < b.d
),
ranked AS (
    SELECT user_id, slope_micro,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY slope_micro, d1, d2) AS rn,
           count(*) OVER (PARTITION BY user_id) AS n_pairs
    FROM slopes
)
SELECT user_id, CAST(n_pairs AS BIGINT) AS n_pairs,
       slope_micro AS theilsen_slope_micro
FROM ranked WHERE rn = (n_pairs + 1) // 2
"""


# ---------------------------------------------------------------------------
# OLS slope per user over the same daily-spend frame as the Theil–Sen
# estimator — the parametric baseline the robust slope is judged against
# (exactly the pairing doctrine used for seasonal_naive_backtest: ship the
# honest baseline next to the fancy estimator so a user can see when
# robustness actually pays). Closed-form least squares in EXACT integer
# sums — no mean-centering floats:
#   slope = (n·Σxy − Σx·Σy) / (n·Σxx − Σx²)       emitted as
#   slope_micro = (n·Σxy − Σx·Σy)·1e6 div (n·Σxx − Σx²)
# with x = day offset from the user's own first active day. Bounds: within
# a 31-day window, |n·Σxy| ≤ 31·31·31·1e7 ≈ 3e11 and the ×1e6 numerator
# stays ≤ ~3e17 < int64 — headroom documented, not assumed. n ≥ 2 distinct
# days ⇒ the denominator is strictly positive (x values distinct), so no
# division guard is needed beyond the n_days filter; `div` truncates
# toward zero identically in both engines for negative slopes.
# Scale: one fact shuffle to (user, day), then a single combine-backed
# per-user aggregation — no self-join, no window; the cheap O(n) sibling
# of Theil–Sen's O(n²)-pairs exactness.
# ---------------------------------------------------------------------------
def ols_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(F.sum(money_cents("value")).alias("v_c"))
    )
    xy = daily.withColumn(
        "x",
        F.datediff(
            "d", F.min("d").over(Window.partitionBy("user_id"))
        ).cast("bigint"),
    )
    sums = xy.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("v_c").alias("sy"),
        F.sum(F.col("x") * F.col("v_c")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return sums.filter(F.col("n_days") >= 2).select(
        "user_id",
        "n_days",
        F.expr(
            "(n_days * sxy - sx * sy) * 1000000"
            " div (n_days * sxx - sx * sx)"
        ).alias("ols_slope_micro"),
    )


_OLS_SQL = """
WITH daily AS (
    SELECT user_id, CAST(ts AS DATE) AS d,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_c
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1, 2
),
xy AS (
    SELECT user_id, v_c,
           CAST(d - min(d) OVER (PARTITION BY user_id) AS BIGINT) AS x
    FROM daily
),
sums AS (
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(v_c) AS BIGINT) AS sy,
           CAST(sum(x * v_c) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM xy GROUP BY 1
)
SELECT user_id, n_days,
       CAST((n_days * sxy - sx * sy) * 1000000
            // (n_days * sxx - sx * sx) AS BIGINT) AS ols_slope_micro
FROM sums WHERE n_days >= 2
"""


# ---------------------------------------------------------------------------
# Daily revenue concentration (Herfindahl–Hirschman index) — the
# marketplace-health audit: how concentrated is each day's purchase
# revenue across users? HHI = Σ share², with shares in exact floored
# micro-units (share_micro = v_c·1e6 div total_c), so
# HHI ∈ [~1e12/n, 1e12] is pure int64 arithmetic: Σ share_micro ≤ 1e6 ⇒
# Σ share_micro² ≤ 1e12, and the effective-participant transform
# 1e12·1e6 div HHI tops out at 1e18 — inside int64, bounds stated not
# assumed. nullif guards the zero-revenue day on BOTH sides (DuckDB's
# integer `//` ERRORS on zero where Spark's div returns NULL — an
# engine-divergence class, not just a wrong answer).
# Scale: one fact shuffle to (day, user); the per-day totals frame is
# calendar-sized and broadcasts back; the HHI reduce runs over the
# (day, user) frame with map-side combine. No window over the fact table.
# ---------------------------------------------------------------------------
def revenue_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase") & F.col("user_id").isNotNull()
    )
    ud = (
        ev.groupBy(F.to_date("ts").alias("d"), "user_id")
        .agg(F.sum(money_cents("value")).alias("v_c"))
        .filter(F.col("v_c").isNotNull())
    )
    tot = ud.groupBy("d").agg(
        F.sum("v_c").alias("total_c"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    shares = ud.join(F.broadcast(tot), "d").select(
        "d",
        "total_c",
        "n_users",
        F.expr("v_c * 1000000 div nullif(total_c, 0)").alias("share_micro"),
    )
    return shares.groupBy("d").agg(
        F.min("n_users").alias("n_users"),
        F.min("total_c").alias("total_c"),
        F.sum(F.expr("share_micro * share_micro")).cast("bigint").alias(
            "hhi"
        ),
        F.max("share_micro").alias("top_share_micro"),
    ).select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "n_users",
        "total_c",
        "hhi",
        "top_share_micro",
        F.expr(
            "1000000000000 * 1000000 div nullif(hhi, 0)"
        ).alias("eff_n_micro"),
    )


_HHI_SQL = """
WITH ud AS (
    SELECT CAST(ts AS DATE) AS d, user_id,
           sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v_c
    FROM events
    WHERE event_type = 'purchase' AND user_id IS NOT NULL
    GROUP BY 1, 2
    HAVING sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) IS NOT NULL
),
tot AS (
    SELECT d, CAST(sum(v_c) AS BIGINT) AS total_c,
           CAST(count(*) AS BIGINT) AS n_users
    FROM ud GROUP BY 1
),
shares AS (
    SELECT u.d, t.total_c, t.n_users,
           u.v_c * 1000000 // nullif(t.total_c, 0) AS share_micro
    FROM ud u JOIN tot t ON u.d = t.d
),
agg AS (
    SELECT d, min(n_users) AS n_users, min(total_c) AS total_c,
           CAST(sum(share_micro * share_micro) AS BIGINT) AS hhi,
           CAST(max(share_micro) AS BIGINT) AS top_share_micro
    FROM shares GROUP BY 1
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       n_users, total_c, hhi, top_share_micro,
       1000000000000 * 1000000 // nullif(hhi, 0) AS eff_n_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# Daily top-K membership churn — the leaderboard-stability monitor: how
# much of each day's top-K user set carried over from the previous day
# (Jaccard in micro), how many entered, how many left. The rank-flux
# signal behind "did the heavy-user population shift overnight".
# Determinism: top-K picked by (ct DESC, user_id ASC) — a total order, so
# the K-set is unique under ties. Scale: one fact shuffle to (day, user);
# WindowGroupLimit prunes each day's ranking to K rows BEFORE the
# consecutive-day self-join, which then runs on ~K rows per day.
# ---------------------------------------------------------------------------
TOPK_CHURN_K = 10


def topk_churn_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .groupBy(
            F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd").alias(
                "day"
            ),
            "user_id",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    )
    wr = Window.partitionBy("day").orderBy(
        F.desc("ct"), F.asc("user_id")
    )
    topk = daily.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") <= TOPK_CHURN_K
    )
    cur = topk.select("day", "user_id")
    prev = topk.select(
        F.expr("date_format(date_add(CAST(day AS DATE), 1), 'yyyy-MM-dd')")
        .alias("day"),
        F.col("user_id").alias("prev_user"),
    )
    # full outer on (day, user): rows present both sides = carried over
    j = cur.join(
        prev,
        (cur.day == prev.day) & (cur.user_id == prev.prev_user),
        "full_outer",
    ).select(
        F.coalesce(cur.day, prev.day).alias("day"),
        cur.user_id.alias("cu"),
        prev.prev_user.alias("pu"),
    )
    agg = j.groupBy("day").agg(
        F.sum(
            F.expr("CASE WHEN cu IS NOT NULL AND pu IS NOT NULL"
                   " THEN 1 ELSE 0 END")
        ).cast("bigint").alias("n_carried"),
        F.sum(
            F.expr("CASE WHEN cu IS NOT NULL AND pu IS NULL"
                   " THEN 1 ELSE 0 END")
        ).cast("bigint").alias("n_entered"),
        F.sum(
            F.expr("CASE WHEN cu IS NULL AND pu IS NOT NULL"
                   " THEN 1 ELSE 0 END")
        ).cast("bigint").alias("n_exited"),
    )
    # only days that HAVE a current top-k (drop the phantom day after the
    # last data day, which the prev-shift manufactures)
    have_cur = cur.select("day").distinct()
    return agg.join(have_cur, "day").select(
        "day",
        "n_carried",
        "n_entered",
        "n_exited",
        F.expr(
            "n_carried * 1000000 div (n_carried + n_entered + n_exited)"
        ).alias("jaccard_micro"),
    )


_TOPK_CHURN_SQL = f"""
WITH daily AS (
    SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, user_id,
           CAST(count(*) AS BIGINT) AS ct
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1, 2
),
topk AS (
    SELECT day, user_id FROM (
        SELECT day, user_id,
               row_number() OVER (PARTITION BY day
                                  ORDER BY ct DESC, user_id ASC) AS rn
        FROM daily
    ) WHERE rn <= {TOPK_CHURN_K}
),
prev AS (
    SELECT strftime(CAST(day AS DATE) + 1, '%Y-%m-%d') AS day,
           user_id AS prev_user
    FROM topk
),
j AS (
    SELECT coalesce(c.day, p.day) AS day, c.user_id AS cu, p.prev_user AS pu
    FROM topk c FULL JOIN prev p
      ON c.day = p.day AND c.user_id = p.prev_user
),
agg AS (
    SELECT day,
           CAST(sum(CASE WHEN cu IS NOT NULL AND pu IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_carried,
           CAST(sum(CASE WHEN cu IS NOT NULL AND pu IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_entered,
           CAST(sum(CASE WHEN cu IS NULL AND pu IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_exited
    FROM j GROUP BY 1
)
SELECT a.day, a.n_carried, a.n_entered, a.n_exited,
       CAST(a.n_carried * 1000000
            // (a.n_carried + a.n_entered + a.n_exited) AS BIGINT)
           AS jaccard_micro
FROM agg a
WHERE a.day IN (SELECT DISTINCT day FROM topk)
"""


# ---------------------------------------------------------------------------
# Next-event prediction accuracy — the sequence-model eval harness on
# user splits: train a first-order transition model (the
# `event_type_markov_transitions` statistic) on the md5-hash train
# users, predict each test transition's next type by the per-prev argmax
# under the (count DESC, type ASC) total order, and score accuracy per
# prev type against the global-majority baseline (the lift-over-baseline
# number that decides whether sequence context helps at all). Exact
# integers: counts, argmax tie order, floored micro accuracies. Scale
# shape: one lag window per split, a <=|types|^2 model frame broadcast
# back over the test transitions, a |types|-row output.
# ---------------------------------------------------------------------------
_NEP_SPLIT_SPARK = (
    "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
    " AS BIGINT) % 2"
)
_NEP_SPLIT_DUCK = (
    "TRY_CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 2"
)


def next_event_prediction_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    chained = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select(
            "prev_type",
            F.col("event_type").alias("next_type"),
            (F.expr(_NEP_SPLIT_SPARK) == 0).alias("is_train"),
        )
        .persist()
    )
    counts = (
        chained.filter("is_train")
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wm = Window.partitionBy("prev_type").orderBy(
        F.col("n").desc(), F.col("next_type")
    )
    model = (
        counts.withColumn("rn", F.row_number().over(wm))
        .filter("rn = 1")
        .select("prev_type", F.col("next_type").alias("predicted_next"))
    )
    baseline = (
        chained.filter("is_train")
        .groupBy("next_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("next_type"))
        .limit(1)
        .select(F.col("next_type").alias("baseline_next"))
    )
    test = chained.filter(~F.col("is_train"))
    return (
        test.join(F.broadcast(model), "prev_type")
        .crossJoin(F.broadcast(baseline))
        .groupBy("prev_type", "predicted_next", "baseline_next")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.expr(
                    "CASE WHEN next_type = predicted_next THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_correct"),
            F.sum(
                F.expr(
                    "CASE WHEN next_type = baseline_next THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_baseline_correct"),
        )
        .select(
            "prev_type",
            "predicted_next",
            "n_test",
            "n_correct",
            F.expr(
                "CAST(n_correct * 1000000 div n_test AS BIGINT)"
            ).alias("accuracy_micro"),
            F.expr(
                "CAST(n_baseline_correct * 1000000 div n_test AS BIGINT)"
            ).alias("baseline_accuracy_micro"),
        )
    )


_NEP_SQL = f"""
WITH chained AS (
    SELECT lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type,
           event_type AS next_type,
           ({_NEP_SPLIT_DUCK}) = 0 AS is_train
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
tr AS (SELECT * FROM chained WHERE prev_type IS NOT NULL),
counts AS (
    SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM tr WHERE is_train GROUP BY 1, 2
),
model AS (
    SELECT prev_type, next_type AS predicted_next FROM (
        SELECT prev_type, next_type,
               row_number() OVER (PARTITION BY prev_type
                                  ORDER BY n DESC, next_type) AS rn
        FROM counts
    ) WHERE rn = 1
),
baseline AS (
    SELECT next_type AS baseline_next
    FROM tr WHERE is_train
    GROUP BY 1 ORDER BY count(*) DESC, next_type LIMIT 1
)
SELECT t.prev_type, m.predicted_next,
       CAST(count(*) AS BIGINT) AS n_test,
       CAST(sum(CASE WHEN t.next_type = m.predicted_next
                THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(sum(CASE WHEN t.next_type = m.predicted_next THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS accuracy_micro,
       CAST(sum(CASE WHEN t.next_type = b.baseline_next THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS baseline_accuracy_micro
FROM tr t
JOIN model m USING (prev_type), baseline b
WHERE NOT t.is_train
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Markov removal-effect attribution — the data-driven attribution model
# (Anderl et al. 2016; the industry successor to last-touch/linear,
# both already in this registry): user journeys become a first-order
# absorbing Markov chain (start -> channels -> conv/null), and a
# channel's credit is its REMOVAL EFFECT — how much the chain's
# conversion probability drops when every visit to the channel is
# redirected to the null absorber.
#
# Exact-integer execution: transition probabilities are floored micro
# rationals; absorption probability is computed by MARKOV_STEPS unrolled
# mass-propagation steps over the PIVOTED 1-row transition matrix (the
# state space is the fixed event-type domain, so the matrix pivots into
# scalar columns and every step is plain column arithmetic in codegen —
# no driver-side linear algebra, no collect). Each product floors at
# micro (m*p div 1e6), identically in both engines; the truncation after
# MARKOV_STEPS drops only mass still in transient states (documented —
# paths longer than MARKOV_STEPS hops contribute nothing, the same
# horizon cap production attribution uses). Products stay < 1e12, well
# inside BIGINT.
#
# Scale shape: ONE data-sized pass (the per-user path/lag window the
# markov-transitions op already runs) down to a <=|types|^2 transition
# frame; the pivot and all 5 scenario iterations run on a 1-row frame.
# ---------------------------------------------------------------------------
MARKOV_CHANNELS = ("click", "error", "signup", "view")  # transient states
MARKOV_STATES = ("start",) + MARKOV_CHANNELS
MARKOV_STEPS = 8
_MK_MICRO = 1_000_000


def _markov_step_cols(div: str):
    """Expression strings for the unrolled mass propagation (the DuckDB
    oracle's chained-CTE form; the Spark side evaluates the identical
    recurrence as an aggregate fold — same fold-vs-unroll duality as
    Holt). Returns (init_cols, step_cols_fn): init maps scenario columns
    to literals; step_cols_fn(step) maps each scenario column to its
    update in terms of the previous step's columns (m_{scen}_{state},
    conv_{scen}) and the pivoted p_{src}_{dst} micro columns."""
    scens = ("all",) + MARKOV_CHANNELS
    init = {}
    for sc in scens:
        for s in MARKOV_STATES:
            init[f"m_{sc}_{s}"] = str(_MK_MICRO if s == "start" else 0)
        init[f"conv_{sc}"] = "0"

    def step(_i: int):
        out = {}
        for sc in scens:
            active = [s for s in MARKOV_STATES if s != sc]
            for t in MARKOV_STATES:
                if t == "start" or t == sc:
                    out[f"m_{sc}_{t}"] = "0"
                    continue
                terms = [
                    f"(m_{sc}_{s} * p_{s}_{t} {div} {_MK_MICRO})"
                    for s in active
                ]
                out[f"m_{sc}_{t}"] = " + ".join(terms)
            conv_terms = [
                f"(m_{sc}_{s} * p_{s}_conv {div} {_MK_MICRO})"
                for s in active
            ]
            out[f"conv_{sc}"] = f"conv_{sc} + " + " + ".join(conv_terms)
        return out

    return init, step


def markov_removal_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # path_id = number of conversions strictly BEFORE this row: events
    # after a purchase start a fresh journey
    pathed = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.coalesce(
            F.sum(
                F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
            ).over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("path_id"),
    )
    wp = Window.partitionBy("user_id", "path_id").orderBy("ts", "event_id")
    hops = pathed.select(
        F.coalesce(F.lag("event_type").over(wp), F.lit("start")).alias("src"),
        F.expr(
            "CASE WHEN event_type = 'purchase' THEN 'conv'"
            " ELSE event_type END"
        ).alias("dst"),
        F.expr(
            "CASE WHEN event_type != 'purchase' AND lead(event_type) OVER ("
            "PARTITION BY user_id, path_id ORDER BY ts, event_id) IS NULL"
            " THEN 1 ELSE 0 END"
        ).alias("is_path_end"),
        "event_type",
    )
    # explicit null-absorber exits so every state's outgoing mass sums to 1
    trans = hops.select("src", "dst").unionAll(
        hops.filter("is_path_end = 1").select(
            F.col("event_type").alias("src"), F.lit("null").alias("dst")
        )
    )
    counts = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # pivot to ONE row of p_{src}_{dst} micro columns
    aggs = []
    for s in MARKOV_STATES:
        tot = (
            f"sum(CASE WHEN src = '{s}' THEN n ELSE 0 END)"
        )
        for t in list(MARKOV_CHANNELS) + ["conv"]:
            aggs.append(
                F.expr(
                    f"CAST(coalesce(sum(CASE WHEN src = '{s}' AND dst = '{t}'"
                    f" THEN n END) * {_MK_MICRO} div nullif({tot}, 0), 0)"
                    f" AS BIGINT)"
                ).alias(f"p_{s}_{t}")
            )
    pivot = counts.agg(*aggs)

    # Per-scenario absorption as ONE aggregate-fold expression (the Holt
    # pattern): chained per-step projections would be collapsed by
    # Catalyst into an exponentially-inlined tree that blows janino's
    # method limit; the fold keeps the expression linear in
    # MARKOV_STEPS x |states| and inside codegen.
    def fold_expr(sc: str) -> str:
        active = [s for s in MARKOV_STATES if s != sc]
        zero = "CAST(0 AS BIGINT)"
        init_fields = ", ".join(
            f"CAST({_MK_MICRO if s == 'start' else 0} AS BIGINT) AS m_{s}"
            for s in MARKOV_STATES
        )
        upd_fields = []
        for t in MARKOV_STATES:
            if t == "start" or t == sc:
                upd_fields.append(f"{zero} AS m_{t}")
                continue
            terms = " + ".join(
                f"(a.m_{s} * p_{s}_{t} div {_MK_MICRO})" for s in active
            )
            upd_fields.append(f"CAST({terms} AS BIGINT) AS m_{t}")
        conv_terms = " + ".join(
            f"(a.m_{s} * p_{s}_conv div {_MK_MICRO})" for s in active
        )
        return (
            f"aggregate(sequence(1, {MARKOV_STEPS}),"
            f" struct({init_fields}, {zero} AS conv),"
            f" (a, i) -> struct({', '.join(upd_fields)},"
            f" CAST(a.conv + {conv_terms} AS BIGINT) AS conv),"
            f" a -> a.conv)"
        )

    cur = pivot.select(
        *[
            F.expr(fold_expr(sc)).cast("bigint").alias(f"conv_{sc}")
            for sc in ("all",) + MARKOV_CHANNELS
        ]
    )
    removal_sum = " + ".join(
        f"greatest(conv_all - conv_{c}, 0)" for c in MARKOV_CHANNELS
    )
    stack_args = ", ".join(
        f"'{c}', CAST(greatest(conv_all - conv_{c}, 0) AS BIGINT),"
        f" CAST(conv_{c} AS BIGINT)"
        for c in MARKOV_CHANNELS
    )
    return cur.select(
        F.col("conv_all").cast("bigint").alias("conv_full_micro"),
        F.expr(f"CAST({removal_sum} AS BIGINT)").alias("_rsum"),
        F.expr(
            f"stack({len(MARKOV_CHANNELS)}, {stack_args})"
            " AS (channel, removal_micro, conv_removed_micro)"
        ),
    ).select(
        "channel",
        "conv_full_micro",
        "conv_removed_micro",
        "removal_micro",
        F.expr(
            "CASE WHEN _rsum = 0 THEN -1"
            f" ELSE CAST(removal_micro * {_MK_MICRO} div _rsum AS BIGINT)"
            " END"
        ).alias("attribution_micro"),
    )


def _markov_removal_sql() -> str:
    p_defs = []
    for s in MARKOV_STATES:
        tot = f"sum(CASE WHEN src = '{s}' THEN n ELSE 0 END)"
        for t in list(MARKOV_CHANNELS) + ["conv"]:
            p_defs.append(
                f"CAST(coalesce(sum(CASE WHEN src = '{s}' AND dst = '{t}'"
                f" THEN n END) * {_MK_MICRO} // nullif({tot}, 0), 0)"
                f" AS BIGINT) AS p_{s}_{t}"
            )
    init, step = _markov_step_cols("//")
    p_cols = ", ".join(
        f"p_{s}_{t}" for s in MARKOV_STATES
        for t in list(MARKOV_CHANNELS) + ["conv"]
    )
    steps_sql = [
        "s0 AS (SELECT "
        + p_cols
        + ", "
        + ", ".join(f"CAST({v} AS BIGINT) AS {k}" for k, v in init.items())
        + " FROM pv)"
    ]
    for i in range(MARKOV_STEPS):
        upd = step(i)
        steps_sql.append(
            f"s{i + 1} AS (SELECT "
            + p_cols
            + ", "
            + ", ".join(
                f"CAST({v} AS BIGINT) AS {k}" for k, v in upd.items()
            )
            + f" FROM s{i})"
        )
    removal_sum = " + ".join(
        f"greatest(conv_all - conv_{c}, 0)" for c in MARKOV_CHANNELS
    )
    chan_rows = " UNION ALL ".join(
        f"SELECT '{c}' AS channel,"
        f" CAST(conv_all AS BIGINT) AS conv_full_micro,"
        f" CAST(conv_{c} AS BIGINT) AS conv_removed_micro,"
        f" CAST(greatest(conv_all - conv_{c}, 0) AS BIGINT)"
        f" AS removal_micro,"
        f" CAST({removal_sum} AS BIGINT) AS rsum"
        f" FROM s{MARKOV_STEPS}"
        for c in MARKOV_CHANNELS
    )
    return f"""
WITH pathed AS (
    SELECT user_id, event_id, ts, event_type,
           coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS path_id
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
hops AS (
    SELECT coalesce(lag(event_type) OVER w, 'start') AS src,
           CASE WHEN event_type = 'purchase' THEN 'conv'
                ELSE event_type END AS dst,
           CASE WHEN event_type <> 'purchase'
                 AND lead(event_type) OVER w IS NULL
                THEN 1 ELSE 0 END AS is_path_end,
           event_type
    FROM pathed
    WINDOW w AS (PARTITION BY user_id, path_id ORDER BY ts, event_id)
),
trans AS (
    SELECT src, dst FROM hops
    UNION ALL
    SELECT event_type AS src, 'null' AS dst FROM hops WHERE is_path_end = 1
),
counts AS (
    SELECT src, dst, CAST(count(*) AS BIGINT) AS n
    FROM trans GROUP BY 1, 2
),
pv AS (
    SELECT {", ".join(p_defs)} FROM counts
),
{", ".join(steps_sql)},
chans AS ({chan_rows})
SELECT channel, conv_full_micro, conv_removed_micro, removal_micro,
       CASE WHEN rsum = 0 THEN -1
            ELSE CAST(removal_micro * {_MK_MICRO} // rsum AS BIGINT)
       END AS attribution_micro
FROM chans
"""


# ---------------------------------------------------------------------------
# Recommender holdout evaluation — the TIME-SPLIT offline eval harness
# that turns `item_cf_recommend` from "we built a recommender" into "we
# measured one" (the standard leave-future-out protocol; Cremonesi et
# al., RecSys'10): train a co-occurrence recommender on orders BEFORE
# the 80% time cutoff, recommend top-K per user, and score hits against
# each user's AFTER-cutoff purchases. HitRate@k / Precision@k / MRR@k
# at k in {1, 5, 10}, every metric an exact floored micro rational
# (MRR's 1/rank terms are MICRO div rank — exact integers, no floats).
#
# The trained model here is the simple cooc-sum scorer ("users who
# bought X also bought", Linden et al.) rather than the full cos²
# neighborhoods — the EVAL HARNESS is the operator under test, and a
# second scorer keeps it from sharing a blind spot with item_cf's; the
# same harness evaluates any (user, item, rank) frame.
#
# Scale shape: identical bounds to item_cf (hub cap -> pair volume
# linear in users; candidate expansion <= neighbors per owned item;
# top-K via WindowGroupLimit); the eval joins are user-keyed; output is
# 3 rows. The time cutoff is derived from the data's own date range in
# integer day arithmetic — no wall clock.
# ---------------------------------------------------------------------------
EVAL_TRAIN_PCT_NUM, EVAL_TRAIN_PCT_DEN = 4, 5  # 80/20 time split
EVAL_KS = (1, 5, 10)


def recsys_holdout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.functions.exprs import (
        ordered_pair_structs,
    )

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    rng = orders.agg(
        F.expr("CAST(min(o_orderdate) AS DATE)").alias("d_min"),
        F.expr("CAST(max(o_orderdate) AS DATE)").alias("d_max"),
    )
    ui = (
        orders.crossJoin(F.broadcast(rng))
        .withColumn(
            "is_train",
            F.expr(
                f"CAST(o_orderdate AS DATE) < date_add(d_min,"
                f" CAST(datediff(d_max, d_min) * {EVAL_TRAIN_PCT_NUM}"
                f" div {EVAL_TRAIN_PCT_DEN} AS INT))"
            ),
        )
        .join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        .filter(F.col("l_partkey").isNotNull())
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("l_partkey").alias("item"),
            "is_train",
        )
        .distinct()
        .persist()
    )
    train = (
        ui.filter("is_train")
        .select("user_id", "item")
        .distinct()
        .withColumn(
            "n_items", F.count(F.lit(1)).over(Window.partitionBy("user_id"))
        )
        .filter(F.col("n_items") <= CF_ITEM_CAP)
        .select("user_id", "item")
        .persist()
    )
    test = ui.filter(~F.col("is_train")).select("user_id", "item").distinct()
    pairs = (
        train.groupBy("user_id")
        .agg(F.array_sort(F.collect_set("item")).alias("items"))
        .select(
            F.explode(ordered_pair_structs("items", "ia", "ib")).alias("p")
        )
        .groupBy("p.ia", "p.ib")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cooc"))
        .filter(F.col("cooc") >= CF_MIN_COOC)
    )
    sym_all = pairs.select(
        F.col("ia").alias("item"), F.col("ib").alias("cand"), "cooc"
    ).unionAll(
        pairs.select(
            F.col("ib").alias("item"), F.col("ia").alias("cand"), "cooc"
        )
    )
    # neighborhood cut BEFORE the serve join (same as item_cf: candidate
    # expansion is bounded by CF_NEIGHBORS per owned item, not by the
    # item's full cooc partner list — without it the serve join is
    # quadratic in popular-item degree)
    wn = Window.partitionBy("item").orderBy(
        F.col("cooc").desc(), F.col("cand")
    )
    sym = (
        sym_all.withColumn("nrk", F.row_number().over(wn))
        .filter(F.col("nrk") <= CF_NEIGHBORS)
        .drop("nrk")
    )
    scored = (
        train.join(sym, "item")
        .groupBy("user_id", "cand")
        .agg(F.sum("cooc").cast("bigint").alias("score"))
        .join(
            train.select(
                "user_id", F.col("item").alias("cand")
            ),
            ["user_id", "cand"],
            "left_anti",
        )
    )
    wk = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("cand")
    )
    recs = (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= max(EVAL_KS))
        .select("user_id", F.col("cand").alias("item"), "rank")
    )
    eval_users = (
        train.select("user_id")
        .distinct()
        .join(test.select("user_id").distinct(), "user_id")
    )
    hits = recs.join(test, ["user_id", "item"]).select("user_id", "rank")
    per_user = eval_users.join(
        hits.groupBy("user_id").agg(
            F.min("rank").alias("first_rank"),
            F.array_sort(F.collect_list("rank")).alias("hit_ranks"),
        ),
        "user_id",
        "left",
    )
    ks = ", ".join(str(k) for k in EVAL_KS)
    return (
        per_user.select(
            "user_id",
            "first_rank",
            "hit_ranks",
            F.explode(F.expr(f"array({ks})")).alias("k"),
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_users"),
            F.sum(
                F.expr("CASE WHEN first_rank <= k THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias("n_hit_users"),
            F.expr(
                "CAST(sum(CASE WHEN first_rank <= k THEN 1 ELSE 0 END)"
                " * 1000000 div count(*) AS BIGINT)"
            ).alias("hitrate_micro"),
            F.expr(
                "CAST(sum(coalesce(size(filter(hit_ranks, r -> r <= k)), 0))"
                " * 1000000 div (k * count(*)) AS BIGINT)"
            ).alias("precision_micro"),
            F.expr(
                "CAST(sum(CASE WHEN first_rank <= k"
                " THEN 1000000 div first_rank ELSE 0 END)"
                " div count(*) AS BIGINT)"
            ).alias("mrr_micro"),
        )
        .select(
            F.col("k").cast("bigint").alias("k"),
            "n_eval_users",
            "n_hit_users",
            "hitrate_micro",
            "precision_micro",
            "mrr_micro",
        )
    )


def _recsys_eval_sql() -> str:
    ks = ", ".join(str(k) for k in EVAL_KS)
    return f"""
WITH rng AS (
    SELECT CAST(min(o_orderdate) AS DATE) AS d_min,
           CAST(max(o_orderdate) AS DATE) AS d_max
    FROM orders WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
),
ui AS (
    SELECT DISTINCT o.o_custkey AS user_id, l.l_partkey AS item,
           CAST(o.o_orderdate AS DATE) <
             r.d_min + CAST(date_diff('day', r.d_min, r.d_max)
                 * {EVAL_TRAIN_PCT_NUM} // {EVAL_TRAIN_PCT_DEN} AS INT)
               AS is_train
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey, rng r
    WHERE o.o_custkey IS NOT NULL AND o.o_orderdate IS NOT NULL
      AND l.l_partkey IS NOT NULL
),
train AS (
    SELECT user_id, item FROM (
        SELECT user_id, item,
               count(*) OVER (PARTITION BY user_id) AS n_items
        FROM (SELECT DISTINCT user_id, item FROM ui WHERE is_train)
    ) WHERE n_items <= {CF_ITEM_CAP}
),
test AS (SELECT DISTINCT user_id, item FROM ui WHERE NOT is_train),
pairs AS (
    SELECT a.item AS ia, b.item AS ib, CAST(count(*) AS BIGINT) AS cooc
    FROM train a JOIN train b
      ON a.user_id = b.user_id AND a.item < b.item
    GROUP BY 1, 2
    HAVING count(*) >= {CF_MIN_COOC}
),
sym_all AS (
    SELECT ia AS item, ib AS cand, cooc FROM pairs
    UNION ALL
    SELECT ib AS item, ia AS cand, cooc FROM pairs
),
sym AS (
    SELECT item, cand, cooc FROM (
        SELECT item, cand, cooc,
               row_number() OVER (PARTITION BY item
                                  ORDER BY cooc DESC, cand) AS nrk
        FROM sym_all
    ) WHERE nrk <= {CF_NEIGHBORS}
),
scored AS (
    SELECT t.user_id, s.cand, CAST(sum(s.cooc) AS BIGINT) AS score
    FROM train t JOIN sym s ON s.item = t.item
    GROUP BY 1, 2
),
unowned AS (
    SELECT s.* FROM scored s
    WHERE NOT EXISTS (
        SELECT 1 FROM train t
        WHERE t.user_id = s.user_id AND t.item = s.cand
    )
),
recs AS (
    SELECT user_id, cand AS item, rank FROM (
        SELECT user_id, cand,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY score DESC, cand) AS rank
        FROM unowned
    ) WHERE rank <= {max(EVAL_KS)}
),
eval_users AS (
    SELECT DISTINCT t.user_id FROM train t
    JOIN (SELECT DISTINCT user_id FROM test) x USING (user_id)
),
hits AS (
    SELECT r.user_id, r.rank
    FROM recs r JOIN test e ON e.user_id = r.user_id AND e.item = r.item
),
per_user AS (
    SELECT u.user_id, h.first_rank, h.hit_ranks
    FROM eval_users u
    LEFT JOIN (
        SELECT user_id, min(rank) AS first_rank,
               list_sort(list(rank)) AS hit_ranks
        FROM hits GROUP BY 1
    ) h USING (user_id)
)
SELECT CAST(k.k AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_eval_users,
       CAST(sum(CASE WHEN first_rank <= k.k THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hit_users,
       CAST(sum(CASE WHEN first_rank <= k.k THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS hitrate_micro,
       CAST(sum(coalesce(len(list_filter(hit_ranks, r -> r <= k.k)), 0))
            * 1000000 // (k.k * count(*)) AS BIGINT) AS precision_micro,
       CAST(sum(CASE WHEN first_rank <= k.k
                THEN 1000000 // first_rank ELSE 0 END)
            // count(*) AS BIGINT) AS mrr_micro
FROM per_user, UNNEST([{ks}]) AS k(k)
GROUP BY k.k
"""


QUERIES = {
    "topk_churn_daily": topk_churn_daily,
    "user_ltv_segments": user_ltv_segments,
    "user_value_trend_theilsen": user_value_trend_theilsen,
    "ols_daily_trend": ols_daily_trend,
    "revenue_concentration_hhi": revenue_concentration_hhi,
    "conversion_lag_profile": conversion_lag_profile,
    "abandoned_view_rate": abandoned_view_rate,
    "user_journey_paths": user_journey_paths,
    "user_churn_labels": user_churn_labels,
    "user_event_diversity": user_event_diversity,
    "fifo_credit_matching": fifo_credit_matching,
    "event_type_markov_transitions": event_type_markov_transitions,
    "winsorized_value_stats": winsorized_value_stats,
    "rfm_user_features": rfm_user_features,
    "quantile_normalize_values": quantile_normalize_values,
    "market_basket_lift": market_basket_lift,
    "item_cf_recommend": item_cf_recommend,
    "recsys_holdout_eval": recsys_holdout_eval,
    "markov_removal_effect": markov_removal_effect,
    "next_event_prediction_accuracy": next_event_prediction_accuracy,
    "decayed_user_score": decayed_user_score,
    "window_funnel_depth": window_funnel_depth,
    "user_day_bitmap_retention": user_day_bitmap_retention,
}

ORACLE = {
    "topk_churn_daily": _TOPK_CHURN_SQL,
    "window_funnel_depth": _FUNNEL_DEPTH_SQL,
    "user_value_trend_theilsen": _THEILSEN_SQL,
    "ols_daily_trend": _OLS_SQL,
    "revenue_concentration_hhi": _HHI_SQL,
    "conversion_lag_profile": _CONV_LAG_SQL,
    "user_day_bitmap_retention": _BITMAP_RETENTION_SQL,
    "user_ltv_segments": _LTV_SQL,
    "abandoned_view_rate": _ABANDON_SQL,
    "user_journey_paths": _JOURNEY_SQL,
    "user_churn_labels": _CHURN_SQL,
    "user_event_diversity": _DIVERSITY_SQL,
    "fifo_credit_matching": _FIFO_SQL,
    "event_type_markov_transitions": _MARKOV_SQL,
    "winsorized_value_stats": _WINSOR_SQL,
    "rfm_user_features": _RFM_SQL,
    "quantile_normalize_values": _QNORM_SQL,
    "market_basket_lift": _BASKET_SQL,
    "item_cf_recommend": _ITEM_CF_SQL,
    "recsys_holdout_eval": _recsys_eval_sql(),
    "markov_removal_effect": _markov_removal_sql(),
    "next_event_prediction_accuracy": _NEP_SQL,
    "decayed_user_score": _DECAY_SQL,
}
