"""Experimentation / causal-readout operators: the analytics a warehouse
runs AFTER the pipelines ship — online-experiment scorecards over the same
event log the DWS layer aggregates (reference's event-log grain:
`R/app/dws/Dws02_TrafficPageViewWindow.java:55-96`; the arm-hash idiom is
the same deterministic md5 split `plans/featurize.py` uses for OOF folds).

- `ab_experiment_lift` — per-metric A/B scorecard. Users are split into
  two arms by a deterministic hash (no RNG — re-runs reproduce the split
  bit-for-bit, the property an auditable experiment system needs); each
  event_type's per-user daily-mean engagement is the metric; the readout
  is per-arm sufficient stats + mean diff + a Welch z² statistic, all in
  exact integer micro-units.
- `cuped_variance_reduction` — CUPED (Deng et al., WSDM'13): use each
  user's PRE-period metric as a control covariate for the post-period
  readout. Emits theta (the regression coefficient cov/var), the realized
  variance-reduction ratio (= corr² in micro), and the CUPED-adjusted
  arm diff next to the raw diff.
- `k_anonymity_audit` — privacy curation audit: equivalence-class sizes
  over a quasi-identifier tuple, the k-anonymity histogram, and the
  suppression cost (rows in classes below K) — what a release pipeline
  checks before shipping an extract.

Scale notes:
- All three are ONE combine-backed aggregate over the fact scan to a
  per-user (or per-class) frame, then windows/reduces over frames whose
  size is bounded by |users| or |classes|, not |events|. The per-user
  frame is the same shuffle grain every dws query already pays.
- The z²/theta arithmetic products reach ~(S·n)² ≈ (1e13·1e9)² at a
  1e9-user / 1e13-cent extreme — beyond DECIMAL(38,0). Headroom bound:
  exact int arithmetic holds while sum_cents·n_users < 10^19 (int64) per
  arm for the diff terms and (n·Q − S²)·n²·n < 10^38 for the variance
  composition; beyond that a production run shards the readout per
  experiment slice (the normal case — a scorecard is per-experiment, not
  per-warehouse) or accepts float z². Same documented-deviation doctrine
  as `featurize.py`'s cov² site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.exprs import money_cents
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table


def _events(spark, sf_dir):
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Deterministic arm assignment: 60-bit md5 of the user id, mod 2.
# The same hash family as featurize.target_encoding_oof's folds — one
# engine-identical split primitive reused everywhere a row needs a
# reproducible pseudo-random bucket.
# ---------------------------------------------------------------------------
_ARM_SPARK = (
    "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
    " AS BIGINT) % 2"
)
_ARM_DUCK = (
    "TRY_CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 2"
)

MICRO = 1_000_000


def ab_experiment_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type A/B scorecard: treatment (arm 1) vs control (arm 0).

    Metric = events per user (count over the full window). Exact pipeline:
    fact scan -> per-(type, user) counts (ONE shuffle, map-side combine)
    -> per-(type, arm) sufficient stats (tiny) -> conditional-aggregation
    pivot to one row per event_type carrying both arms -> closed-form
    Welch z² in integer micro-units:

        z² = (m1-m0)² / (v1/n1 + v0/n0)
           = (S1·n0 - S0·n1)²·(n1-1)·(n0-1)
             / ((n1·Q1 - S1²)·n0²·(n0-1) + (n0·Q0 - S0²)·n1²·(n1-1))

    (common denominators cleared; every term a product of int sums, so the
    whole statistic is one exact rational — z2_micro is its floor·1e6.)
    """
    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    per_user = ev.groupBy(
        "event_type",
        F.expr(_ARM_SPARK).alias("arm"),
        "user_id",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    arms = per_user.groupBy("event_type", "arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("q"),
    )
    # Pivot the 2-row arm pair into one row per metric via conditional
    # aggregation (no join: the frame is |types|·2 rows).
    w = arms.groupBy("event_type").agg(
        F.sum(F.expr("CASE WHEN arm = 0 THEN n END")).alias("n0"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN s END")).alias("s0"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN q END")).alias("q0"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN n END")).alias("n1"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN s END")).alias("s1"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN q END")).alias("q1"),
    )
    return w.select(
        "event_type",
        F.col("n0").cast("bigint").alias("n_ctrl"),
        F.col("n1").cast("bigint").alias("n_trt"),
        F.expr(f"s0 * {MICRO} div nullif(n0, 0)").cast("bigint").alias("mean_ctrl_micro"),
        F.expr(f"s1 * {MICRO} div nullif(n1, 0)").cast("bigint").alias("mean_trt_micro"),
        # diff of exact per-arm means over the common denominator n1·n0;
        # truncation toward zero is identical in Spark `div` / DuckDB `//`.
        F.expr(f"(s1 * n0 - s0 * n1) * {MICRO} div nullif(CAST(n1 AS DECIMAL(38,0)) * n0, 0)")
        .cast("bigint")
        .alias("diff_micro"),
        F.expr(
            f"CAST((CAST(s1 AS DECIMAL(38,0)) * n0 - CAST(s0 AS DECIMAL(38,0)) * n1)"
            f" * (CAST(s1 AS DECIMAL(38,0)) * n0 - CAST(s0 AS DECIMAL(38,0)) * n1)"
            f" * (n1 - 1) * (n0 - 1) * {MICRO}"
            f" div nullif("
            f"(CAST(n1 AS DECIMAL(38,0)) * q1 - CAST(s1 AS DECIMAL(38,0)) * s1)"
            f" * n0 * n0 * (n0 - 1)"
            f" + (CAST(n0 AS DECIMAL(38,0)) * q0 - CAST(s0 AS DECIMAL(38,0)) * s0)"
            f" * n1 * n1 * (n1 - 1), 0) AS BIGINT)"
        ).alias("welch_z2_micro"),
    )


_AB_LIFT_SQL = f"""
WITH per_user AS (
    SELECT event_type,
           {_ARM_DUCK} AS arm,
           user_id,
           CAST(count(*) AS BIGINT) AS x
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1, 2, 3
),
arms AS (
    SELECT event_type, arm,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS s,
           CAST(sum(x * x) AS BIGINT) AS q
    FROM per_user GROUP BY 1, 2
),
piv AS (
    SELECT event_type,
           sum(CASE WHEN arm = 0 THEN n END) AS n0,
           sum(CASE WHEN arm = 0 THEN s END) AS s0,
           sum(CASE WHEN arm = 0 THEN q END) AS q0,
           sum(CASE WHEN arm = 1 THEN n END) AS n1,
           sum(CASE WHEN arm = 1 THEN s END) AS s1,
           sum(CASE WHEN arm = 1 THEN q END) AS q1
    FROM arms GROUP BY 1
)
SELECT event_type,
       CAST(n0 AS BIGINT) AS n_ctrl,
       CAST(n1 AS BIGINT) AS n_trt,
       CAST(s0 * {MICRO} // nullif(n0, 0) AS BIGINT) AS mean_ctrl_micro,
       CAST(s1 * {MICRO} // nullif(n1, 0) AS BIGINT) AS mean_trt_micro,
       CAST((s1 * n0 - s0 * n1) * {MICRO}
            // nullif(CAST(n1 AS HUGEINT) * n0, 0) AS BIGINT) AS diff_micro,
       CAST((CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1)
            * (CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1)
            * (n1 - 1) * (n0 - 1) * {MICRO}
            // nullif(
                (CAST(n1 AS HUGEINT) * q1 - CAST(s1 AS HUGEINT) * s1)
                * n0 * n0 * (n0 - 1)
                + (CAST(n0 AS HUGEINT) * q0 - CAST(s0 AS HUGEINT) * s0)
                * n1 * n1 * (n1 - 1), 0) AS BIGINT) AS welch_z2_micro
FROM piv
"""


# ---------------------------------------------------------------------------
# CUPED: pre-period covariate adjustment.
#
# The window splits at its midpoint: X = user's purchase cents in the PRE
# half, Y = cents in the POST half. theta = cov(X,Y)/var(X) fitted on ALL
# users (arm-blind — fitting theta per-arm would bias the estimator;
# Deng et al. §3.2), then the readout compares arm means of the adjusted
# metric Yadj = Y − theta·X (the meanX shift cancels in the arm diff).
# Realized variance reduction = corr²(X,Y), emitted as micro.
# ---------------------------------------------------------------------------
CUPED_SPLIT = "2024-01-16"  # midpoint of the 30-day generator window


def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .filter(F.col("event_type") == "purchase")
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("ts") < F.lit(CUPED_SPLIT).cast("timestamp"),
                money_cents("value"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("x"),
        F.sum(
            F.when(
                F.col("ts") >= F.lit(CUPED_SPLIT).cast("timestamp"),
                money_cents("value"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).alias("y"),
    ).select(
        F.expr(_ARM_SPARK).alias("arm"), "x", "y"
    )
    stats = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN 1 ELSE 0 END")).cast("bigint").alias("n0"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN x ELSE 0 END")).cast("bigint").alias("sx0"),
        F.sum(F.expr("CASE WHEN arm = 0 THEN y ELSE 0 END")).cast("bigint").alias("sy0"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN 1 ELSE 0 END")).cast("bigint").alias("n1"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN x ELSE 0 END")).cast("bigint").alias("sx1"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN y ELSE 0 END")).cast("bigint").alias("sy1"),
    )
    # cov_num = n·Σxy − Σx·Σy ; var_num = n·Σxx − (Σx)² (same n² scale, so
    # theta = cov_num/var_num exactly). Signed division truncates toward
    # zero identically in both engines (timeseries.py:320 doctrine).
    return stats.select(
        "n",
        F.expr(
            f"CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * {MICRO}"
            " div nullif(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx, 0)"
            " AS BIGINT)"
        ).alias("theta_micro"),
        # corr² as the PRODUCT of the two floored regression slopes
        # (cov/varX)·(cov/varY), each scaled 1e3 — NOT cov²·1e6/(varX·varY):
        # cov² overflows 38 digits at the 100× stress scale, while by
        # Cauchy-Schwarz each slope factor is bounded by 1e3·√(varY/varX)
        # and their product by 1e6, independent of data volume. cov is
        # negative on both factors or neither, so the product stays ≥ 0;
        # toward-zero truncation composes identically in both engines.
        F.expr(
            "CAST(CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000"
            " div nullif(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx, 0)"
            " AS DECIMAL(38,0))"
            " * CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000"
            " div nullif(n * syy - CAST(sy AS DECIMAL(38,0)) * sy, 0)"
            " AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("var_reduction_micro"),
        F.expr(
            f"CAST((CAST(sy1 AS DECIMAL(38,0)) * n0 - CAST(sy0 AS DECIMAL(38,0)) * n1)"
            f" * {MICRO} div nullif(CAST(n1 AS DECIMAL(38,0)) * n0, 0) AS BIGINT)"
        ).alias("raw_diff_micro_cents"),
        # adjusted diff: diff(Y) − theta·diff(X), composed from the two
        # already-floored micro diffs so both engines floor identically.
        F.expr(
            f"CAST((CAST(sy1 AS DECIMAL(38,0)) * n0 - CAST(sy0 AS DECIMAL(38,0)) * n1) * {MICRO}"
            f" div nullif(CAST(n1 AS DECIMAL(38,0)) * n0, 0)"
            f" - ((CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * {MICRO}"
            f" div nullif(n * sxx - CAST(sx AS DECIMAL(38,0)) * sx, 0) AS DECIMAL(38,0)))"
            f" * CAST((CAST(sx1 AS DECIMAL(38,0)) * n0 - CAST(sx0 AS DECIMAL(38,0)) * n1) * {MICRO}"
            f" div nullif(CAST(n1 AS DECIMAL(38,0)) * n0, 0) AS DECIMAL(38,0))) div {MICRO}"
            f" AS BIGINT)"
        ).alias("cuped_diff_micro_cents"),
    )


_CUPED_SQL = f"""
WITH per_user AS (
    SELECT user_id,
           CAST(sum(CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS x,
           CAST(sum(CASE WHEN ts >= TIMESTAMP '{CUPED_SPLIT}'
                    THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT) AS y
    FROM events
    WHERE user_id IS NOT NULL AND event_type = 'purchase'
    GROUP BY 1
),
armed AS (
    SELECT {_ARM_DUCK} AS arm, x, y FROM per_user
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(x AS HUGEINT) * x) AS sxx,
           sum(CAST(y AS HUGEINT) * y) AS syy,
           CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
           CAST(sum(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
           CAST(sum(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           CAST(sum(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
           CAST(sum(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1
    FROM armed
)
SELECT n,
       CAST((n * sxy - CAST(sx AS HUGEINT) * sy) * {MICRO}
            // nullif(n * sxx - CAST(sx AS HUGEINT) * sx, 0)
            AS BIGINT) AS theta_micro,
       CAST(((n * sxy - CAST(sx AS HUGEINT) * sy) * 1000
             // nullif(n * sxx - CAST(sx AS HUGEINT) * sx, 0))
            * ((n * sxy - CAST(sx AS HUGEINT) * sy) * 1000
               // nullif(n * syy - CAST(sy AS HUGEINT) * sy, 0))
            AS BIGINT) AS var_reduction_micro,
       CAST((CAST(sy1 AS HUGEINT) * n0 - CAST(sy0 AS HUGEINT) * n1) * {MICRO}
            // nullif(CAST(n1 AS HUGEINT) * n0, 0) AS BIGINT) AS raw_diff_micro_cents,
       CAST(((CAST(sy1 AS HUGEINT) * n0 - CAST(sy0 AS HUGEINT) * n1) * {MICRO}
             // nullif(CAST(n1 AS HUGEINT) * n0, 0)
             - ((n * sxy - CAST(sx AS HUGEINT) * sy) * {MICRO}
                // nullif(n * sxx - CAST(sx AS HUGEINT) * sx, 0))
               * ((CAST(sx1 AS HUGEINT) * n0 - CAST(sx0 AS HUGEINT) * n1) * {MICRO}
                  // nullif(CAST(n1 AS HUGEINT) * n0, 0)) // {MICRO})
            AS BIGINT) AS cuped_diff_micro_cents
FROM stats
"""


# ---------------------------------------------------------------------------
# k-anonymity audit. Quasi-identifier = (event_type, day, coarse value
# bucket): the tuple a "de-identified" event extract would still carry.
# Classes below K are re-identification risk; the audit reports the class-
# size histogram and the suppression cost of enforcing K.
# ---------------------------------------------------------------------------
K_ANON = 5  # histogram edges: 1, 2-4, 5-9, 10+ (bucket keys 1/2/5/10)


def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    classes = ev.groupBy(
        "event_type",
        F.expr("CAST(ts AS DATE)").alias("d"),
        F.expr("CAST(floor(value / 25) AS BIGINT)").alias("vb"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size"),
        F.countDistinct("user_id").cast("bigint").alias("users_in_class"),
    )
    hist = classes.groupBy(
        F.expr(
            "CASE WHEN class_size = 1 THEN 1 WHEN class_size < 5 THEN 2"
            " WHEN class_size < 10 THEN 5 ELSE 10 END"
        )
        .cast("bigint")
        .alias("size_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.sum(
            F.when(F.col("class_size") < K_ANON, F.col("class_size")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("suppressed_rows"),
        F.sum("users_in_class").cast("bigint").alias("user_slots"),
    )
    return hist.select(
        "size_bucket",
        "n_classes",
        "n_rows",
        "suppressed_rows",
        "user_slots",
        F.expr(
            f"CAST(suppressed_rows * {MICRO}"
            f" div sum(n_rows) OVER () AS BIGINT)"
        ).alias("suppression_share_micro"),
    )


_K_ANON_SQL = f"""
WITH classes AS (
    SELECT event_type,
           CAST(ts AS DATE) AS d,
           CAST(floor(value / 25) AS BIGINT) AS vb,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users_in_class
    FROM events GROUP BY 1, 2, 3
),
hist AS (
    SELECT CAST(CASE WHEN class_size = 1 THEN 1 WHEN class_size < 5 THEN 2
                WHEN class_size < 10 THEN 5 ELSE 10 END AS BIGINT)
               AS size_bucket,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN class_size < {K_ANON} THEN class_size
                    ELSE 0 END) AS BIGINT) AS suppressed_rows,
           CAST(sum(users_in_class) AS BIGINT) AS user_slots
    FROM classes GROUP BY 1
)
SELECT size_bucket, n_classes, n_rows, suppressed_rows, user_slots,
       CAST(suppressed_rows * {MICRO} // sum(n_rows) OVER ()
            AS BIGINT) AS suppression_share_micro
FROM hist
"""


# ---------------------------------------------------------------------------
# Difference-in-differences: the quasi-experimental readout when there is
# no randomized assignment — two groups (the deterministic arm hash
# stands in for exposed/unexposed), two periods (the CUPED midpoint),
# same user panel in both periods. DiD = (T_post − T_pre) − (C_post −
# C_pre) over per-group user-mean purchase cents; each cell mean is
# floored to micro FIRST and the differences composed from the floored
# cells, so both engines round identically at every step.
# ---------------------------------------------------------------------------
def diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _events(spark, sf_dir)
        .filter(F.col("user_id").isNotNull())
        .filter(F.col("event_type") == "purchase")
        .filter(F.col("value").isNotNull())
    )
    rows = ev.select(
        F.expr(_ARM_SPARK).alias("grp"),
        F.col("user_id"),
        F.when(
            F.col("ts") < F.lit(CUPED_SPLIT).cast("timestamp"), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("period"),
        money_cents("value").alias("cents"),
    )
    # Panel denominators: users per GROUP (fixed across periods — the
    # panel-data convention), via one distinct-user aggregate.
    users = rows.groupBy("grp").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    )
    cells = rows.groupBy("grp", "period").agg(
        F.sum("cents").cast("bigint").alias("s")
    )
    piv = (
        cells.join(users, "grp")
        .groupBy()
        .agg(
            F.sum(
                F.expr(
                    f"CASE WHEN grp = 1 AND period = 1"
                    f" THEN s * {MICRO} div n_users END"
                )
            ).alias("m_t_post"),
            F.sum(
                F.expr(
                    f"CASE WHEN grp = 1 AND period = 0"
                    f" THEN s * {MICRO} div n_users END"
                )
            ).alias("m_t_pre"),
            F.sum(
                F.expr(
                    f"CASE WHEN grp = 0 AND period = 1"
                    f" THEN s * {MICRO} div n_users END"
                )
            ).alias("m_c_post"),
            F.sum(
                F.expr(
                    f"CASE WHEN grp = 0 AND period = 0"
                    f" THEN s * {MICRO} div n_users END"
                )
            ).alias("m_c_pre"),
        )
    )
    return piv.select(
        F.col("m_t_pre").cast("bigint").alias("mean_trt_pre_micro"),
        F.col("m_t_post").cast("bigint").alias("mean_trt_post_micro"),
        F.col("m_c_pre").cast("bigint").alias("mean_ctrl_pre_micro"),
        F.col("m_c_post").cast("bigint").alias("mean_ctrl_post_micro"),
        F.expr("CAST((m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS BIGINT)").alias(
            "did_micro"
        ),
    )


_DID_SQL = f"""
WITH rows_p AS (
    SELECT {_ARM_DUCK} AS grp,
           user_id,
           CASE WHEN ts < TIMESTAMP '{CUPED_SPLIT}' THEN 0 ELSE 1 END
               AS period,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
    WHERE user_id IS NOT NULL AND event_type = 'purchase'
      AND value IS NOT NULL
),
users AS (
    SELECT grp, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM rows_p GROUP BY 1
),
cells AS (
    SELECT grp, period, CAST(sum(cents) AS BIGINT) AS s
    FROM rows_p GROUP BY 1, 2
),
piv AS (
    SELECT
        sum(CASE WHEN c.grp = 1 AND c.period = 1
            THEN c.s * {MICRO} // u.n_users END) AS m_t_post,
        sum(CASE WHEN c.grp = 1 AND c.period = 0
            THEN c.s * {MICRO} // u.n_users END) AS m_t_pre,
        sum(CASE WHEN c.grp = 0 AND c.period = 1
            THEN c.s * {MICRO} // u.n_users END) AS m_c_post,
        sum(CASE WHEN c.grp = 0 AND c.period = 0
            THEN c.s * {MICRO} // u.n_users END) AS m_c_pre
    FROM cells c JOIN users u ON c.grp = u.grp
)
SELECT CAST(m_t_pre AS BIGINT) AS mean_trt_pre_micro,
       CAST(m_t_post AS BIGINT) AS mean_trt_post_micro,
       CAST(m_c_pre AS BIGINT) AS mean_ctrl_pre_micro,
       CAST(m_c_post AS BIGINT) AS mean_ctrl_post_micro,
       CAST((m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS BIGINT)
           AS did_micro
FROM piv
"""


# ---------------------------------------------------------------------------
# Discrete-time survival (the Kaplan-Meier grain without the float
# product): per lifetime-day k, the risk set, deaths, censored exits, and
# the discrete hazard d_k·1e6 div n_k. Lifetime = days from a user's
# first to last event; a user still active near the window's end (last
# event within CHURN-style horizon of the corpus max) is CENSORED at its
# observed lifetime — it leaves the risk set without being a death, the
# distinction that makes this survival analysis rather than a histogram.
# S(t) would be the running product of (1 − hazard) — deliberately NOT
# emitted: a float product is order-fragile across engines; the hazard
# sequence carries the same information exactly.
# ---------------------------------------------------------------------------
SURV_HORIZON_DAYS = 3


def survival_hazard_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    bounds = ev.agg(F.max(F.expr("CAST(ts AS DATE)")).alias("max_d"))
    users = ev.groupBy("user_id").agg(
        F.min(F.expr("CAST(ts AS DATE)")).alias("first_d"),
        F.max(F.expr("CAST(ts AS DATE)")).alias("last_d"),
    )
    per_user = users.crossJoin(F.broadcast(bounds)).select(
        F.expr("datediff(last_d, first_d)").cast("bigint").alias("lifetime"),
        F.expr(
            f"datediff(max_d, last_d) < {SURV_HORIZON_DAYS}"
        ).alias("censored"),
    )
    exits = per_user.groupBy("lifetime").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exits"),
        F.sum(F.expr("CASE WHEN censored THEN 0 ELSE 1 END"))
        .cast("bigint")
        .alias("deaths"),
        F.sum(F.expr("CASE WHEN censored THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_censored"),
    )
    w = Window.orderBy("lifetime").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wt = Window.partitionBy()
    return (
        exits.withColumn("total", F.sum("n_exits").over(wt))
        .withColumn(
            "at_risk",
            F.col("total") - F.coalesce(F.sum("n_exits").over(w), F.lit(0)),
        )
        .select(
            "lifetime",
            F.col("at_risk").cast("bigint").alias("at_risk"),
            "deaths",
            "n_censored",
            F.expr(f"deaths * {MICRO} div at_risk")
            .cast("bigint")
            .alias("hazard_micro"),
        )
    )


_SURV_SQL = f"""
WITH bounds AS (SELECT max(CAST(ts AS DATE)) AS max_d FROM events
                WHERE user_id IS NOT NULL),
users AS (
    SELECT user_id,
           min(CAST(ts AS DATE)) AS first_d,
           max(CAST(ts AS DATE)) AS last_d
    FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
per_user AS (
    SELECT CAST(datediff('day', u.first_d, u.last_d) AS BIGINT) AS lifetime,
           datediff('day', u.last_d, b.max_d) < {SURV_HORIZON_DAYS}
               AS censored
    FROM users u, bounds b
),
exits AS (
    SELECT lifetime,
           CAST(count(*) AS BIGINT) AS n_exits,
           CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT)
               AS deaths,
           CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT)
               AS n_censored
    FROM per_user GROUP BY 1
)
SELECT lifetime,
       CAST(sum(n_exits) OVER ()
            - coalesce(sum(n_exits) OVER (ORDER BY lifetime
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS at_risk,
       deaths,
       n_censored,
       CAST(deaths * {MICRO}
            // (sum(n_exits) OVER ()
                - coalesce(sum(n_exits) OVER (ORDER BY lifetime
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
            AS BIGINT) AS hazard_micro
FROM exits
"""


# ---------------------------------------------------------------------------
# l-diversity audit — k-anonymity's companion release gate (Machanavajjhala
# et al., ICDE'06): a class of k identical quasi-identifier rows still
# leaks if (nearly) all of them share ONE sensitive value. Quasi-ids here
# are (day, value-bucket); the sensitive attribute is event_type; l(class)
# = distinct sensitive values. Output: the l-histogram, the classes/rows
# failing l >= L_DIV, and the suppression cost of enforcing it — read
# next to k_anonymity_audit before any release.
# Scale: one combine-backed aggregate to the class grain (countDistinct
# over the bounded event_type domain), then a histogram over the tiny
# class frame.
# ---------------------------------------------------------------------------
L_DIV = 3


def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    )
    classes = ev.groupBy(
        F.expr("CAST(CAST(ts AS DATE) AS STRING)").alias("d"),
        F.expr("CAST(floor(value / 25) AS BIGINT)").alias("vb"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("class_size"),
        F.countDistinct("event_type").cast("bigint").alias("l_div"),
    )
    return (
        classes.groupBy("l_div")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("class_size").cast("bigint").alias("n_rows"),
            F.sum(
                F.when(F.col("l_div") < L_DIV, F.col("class_size")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("suppressed_rows"),
        )
        .withColumn(
            "fails_l", F.expr(f"CAST(l_div < {L_DIV} AS BIGINT)")
        )
    )


_L_DIV_SQL = f"""
WITH classes AS (
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
           CAST(floor(value / 25) AS BIGINT) AS vb,
           CAST(count(*) AS BIGINT) AS class_size,
           CAST(count(DISTINCT event_type) AS BIGINT) AS l_div
    FROM events
    WHERE event_type IS NOT NULL AND value IS NOT NULL
    GROUP BY 1, 2
)
SELECT l_div,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN l_div < {L_DIV} THEN class_size ELSE 0 END)
            AS BIGINT) AS suppressed_rows,
       CAST(l_div < {L_DIV} AS BIGINT) AS fails_l
FROM classes
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07) — the third
# privacy gate: a class can pass k-anonymity AND l-diversity and still
# leak if its SENSITIVE-VALUE DISTRIBUTION deviates from the corpus-wide
# one. Per quasi-identifier class, total-variation distance to the
# global event_type distribution in exact ppm:
#   TV = sum_types |ct_c*N - ct_g*n_c| / (2 * n_c * N)
# — pure integer cross-multiplication (the products ride DECIMAL(38,0)/
# HUGEINT internally: ct_c*N reaches 1e24 at corpus scale), absent types
# included via the broadcast type list (|0 - ct_g*n_c| terms). Output is
# the decile histogram of class TV with the failing mass under
# T_CLOSE_PPM — bounded by 10 rows at any scale.
# ---------------------------------------------------------------------------
T_CLOSE_PPM = 300_000  # class fails if TV > 0.3


def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("event_type").isNotNull() & F.col("value").isNotNull()
    ).select(
        F.expr("CAST(CAST(ts AS DATE) AS STRING)").alias("d"),
        F.expr("CAST(floor(value / 25) AS BIGINT)").alias("vb"),
        "event_type",
    )
    cls = ev.groupBy("d", "vb", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct_c")
    )  # no persist (r10 A/B: 0.52 s without vs 0.80 s with)
    classes = cls.groupBy("d", "vb").agg(
        F.sum("ct_c").cast("bigint").alias("n_c")
    )
    glob = cls.groupBy("event_type").agg(
        F.sum("ct_c").cast("bigint").alias("ct_g")
    )
    total = cls.agg(F.sum("ct_c").cast("bigint").alias("n_tot"))
    grid = (
        classes.crossJoin(F.broadcast(glob))
        .join(cls, ["d", "vb", "event_type"], "left")
        .crossJoin(F.broadcast(total))
        .select(
            "d",
            "vb",
            "n_c",
            "n_tot",
            F.expr(
                "abs(CAST(coalesce(ct_c, 0) AS DECIMAL(38,0)) * n_tot"
                " - CAST(ct_g AS DECIMAL(38,0)) * n_c)"
            ).alias("term"),
        )
    )
    tv = grid.groupBy("d", "vb", "n_c", "n_tot").agg(
        F.expr(
            "CAST(sum(term) * 1000000"
            " div (CAST(2 AS DECIMAL(38,0)) * n_c * n_tot) AS BIGINT)"
        ).alias("tv_ppm")
    )
    return (
        tv.groupBy(F.expr("tv_ppm div 100000").cast("bigint").alias("tv_decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("n_c").cast("bigint").alias("n_rows"),
            F.sum(
                F.expr(f"CASE WHEN tv_ppm > {T_CLOSE_PPM} THEN n_c ELSE 0 END")
            )
            .cast("bigint")
            .alias("failing_rows"),
        )
    )


_T_CLOSE_SQL = f"""
WITH ev AS (
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
           CAST(floor(value / 25) AS BIGINT) AS vb,
           event_type
    FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
),
cls AS (
    SELECT d, vb, event_type, CAST(count(*) AS BIGINT) AS ct_c
    FROM ev GROUP BY 1, 2, 3
),
classes AS (
    SELECT d, vb, CAST(sum(ct_c) AS BIGINT) AS n_c FROM cls GROUP BY 1, 2
),
gstats AS (
    SELECT event_type, CAST(sum(ct_c) AS BIGINT) AS ct_g FROM cls GROUP BY 1
),
total AS (SELECT CAST(sum(ct_c) AS BIGINT) AS n_tot FROM cls),
grid AS (
    SELECT c.d, c.vb, c.n_c, t.n_tot,
           abs(CAST(coalesce(x.ct_c, 0) AS HUGEINT) * t.n_tot
               - CAST(g.ct_g AS HUGEINT) * c.n_c) AS term
    FROM classes c
    CROSS JOIN gstats g
    LEFT JOIN cls x ON x.d = c.d AND x.vb = c.vb
                   AND x.event_type = g.event_type
    CROSS JOIN total t
),
tv AS (
    SELECT d, vb, n_c,
           CAST(sum(term) * 1000000
                // (CAST(2 AS HUGEINT) * n_c * n_tot) AS BIGINT) AS tv_ppm
    FROM grid GROUP BY d, vb, n_c, n_tot
)
SELECT CAST(tv_ppm // 100000 AS BIGINT) AS tv_decile,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(n_c) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN tv_ppm > {T_CLOSE_PPM} THEN n_c ELSE 0 END)
            AS BIGINT) AS failing_rows
FROM tv
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Differential-privacy sensitivity audit — the measurement a DP release
# runs BEFORE choosing its noise scale: after clipping each user's daily
# contribution to DP_CLIP_CENTS, the daily sum's L1 sensitivity is exactly
# the clip bound, and the audit quantifies what the clip costs (bias) and
# who it touches. Complements the k-anon / l-div / t-closeness release
# gates: those decide WHETHER a cut may ship, this sizes the noise if it
# ships under DP instead. No RNG anywhere — noise addition itself is
# deliberately out of scope (nondeterministic); everything here is the
# deterministic prep: contribution bounding + clip-loss accounting.
#
# Scale shape: fact scan -> per-(day, user) sums (ONE shuffle with
# map-side combine) -> per-day roll-up (tiny). Identical to the A/B
# scorecard's sufficient-statistics pattern.
# ---------------------------------------------------------------------------
DP_CLIP_CENTS = 10_000  # per-user-day contribution cap: 100.00 units


def dp_sensitivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
        & F.col("ts").isNotNull()
    )
    per_user_day = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "user_id",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
        F.sum(money_cents("value")).cast("bigint").alias("v_cents"),
    )
    return (
        per_user_day.groupBy("day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_ev").cast("bigint").alias("n_events"),
            F.max("n_ev").cast("bigint").alias("linf_max_events"),
            F.sum("v_cents").cast("bigint").alias("sum_cents"),
            F.sum(F.expr(f"least(v_cents, {DP_CLIP_CENTS})"))
            .cast("bigint")
            .alias("clipped_sum_cents"),
            F.sum(
                F.expr(f"CASE WHEN v_cents > {DP_CLIP_CENTS} THEN 1 ELSE 0 END")
            )
            .cast("bigint")
            .alias("users_clipped"),
        )
        .select(
            "day",
            "n_users",
            "n_events",
            "linf_max_events",
            "sum_cents",
            "clipped_sum_cents",
            F.expr("sum_cents - clipped_sum_cents")
            .cast("bigint")
            .alias("clip_loss_cents"),
            # Widened before the micro multiply (ADVICE r7): a daily
            # clip loss above ~9.2e12 cents would ANSI-overflow BIGINT.
            F.expr(
                f"CAST(CAST(sum_cents - clipped_sum_cents AS DECIMAL(38,0))"
                f" * {MICRO} div nullif(sum_cents, 0) AS BIGINT)"
            ).alias("clip_loss_ppm"),
            "users_clipped",
        )
    )


_DP_SENS_SQL = f"""
WITH per_user_day AS (
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id,
           CAST(count(*) AS BIGINT) AS n_ev,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS v_cents
    FROM events
    WHERE user_id IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(n_ev) AS BIGINT) AS n_events,
       CAST(max(n_ev) AS BIGINT) AS linf_max_events,
       CAST(sum(v_cents) AS BIGINT) AS sum_cents,
       CAST(sum(least(v_cents, {DP_CLIP_CENTS})) AS BIGINT)
           AS clipped_sum_cents,
       CAST(sum(v_cents) - sum(least(v_cents, {DP_CLIP_CENTS})) AS BIGINT)
           AS clip_loss_cents,
       CAST(CAST(sum(v_cents) - sum(least(v_cents, {DP_CLIP_CENTS}))
                 AS HUGEINT) * {MICRO}
            // nullif(sum(v_cents), 0) AS BIGINT) AS clip_loss_ppm,
       CAST(sum(CASE WHEN v_cents > {DP_CLIP_CENTS} THEN 1 ELSE 0 END)
            AS BIGINT) AS users_clipped
FROM per_user_day
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch guardrail — the FIRST check any experimentation
# platform runs, before it looks at a single metric: with the same
# deterministic arm hash as `ab_experiment_lift`, each day's active-user
# counts per arm must be statistically consistent with 50/50; a flagged
# day means the assignment or logging pipeline is biased and every
# downstream readout is invalid. Two-cell equal-share chi² collapses to
# (n0-n1)²/(n0+n1) — one exact rational in micro-units, flag at the
# 95% critical value 3.841459.
# ---------------------------------------------------------------------------
SRM_CHI2_CRIT_MICRO = 3_841_459


def srm_guardrail_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    day_user = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "user_id",
        F.expr(_ARM_SPARK).alias("arm"),
    ).distinct()
    per_day = day_user.groupBy("day").agg(
        F.sum(F.expr("CASE WHEN arm = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_ctrl"),
        F.sum(F.expr("CASE WHEN arm = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_trt"),
    )
    return per_day.select(
        "day",
        "n_ctrl",
        "n_trt",
        # First factor widened to DECIMAL(38,0) BEFORE the square+micro
        # multiply (ADVICE r7): plain BIGINT would ANSI-overflow once a
        # daily arm imbalance exceeds ~3.03M users; sibling operators
        # (item_cf cos2_micro, window-PMI odds) follow the same doctrine.
        F.expr(
            f"CAST(CAST(n_ctrl - n_trt AS DECIMAL(38,0)) * (n_ctrl - n_trt)"
            f" * {MICRO} div nullif(n_ctrl + n_trt, 0) AS BIGINT)"
        ).alias("chi2_micro"),
        F.expr(
            f"CAST(CASE WHEN CAST(n_ctrl - n_trt AS DECIMAL(38,0))"
            f" * (n_ctrl - n_trt) * {MICRO}"
            f" div nullif(n_ctrl + n_trt, 0) > {SRM_CHI2_CRIT_MICRO}"
            " THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("srm_flag"),
    )


_SRM_SQL = f"""
WITH day_user AS (
    SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, user_id,
           {_ARM_DUCK} AS arm
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
per_day AS (
    SELECT day,
           CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ctrl,
           CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_trt
    FROM day_user GROUP BY 1
)
SELECT day, n_ctrl, n_trt,
       CAST(CAST(n_ctrl - n_trt AS HUGEINT) * (n_ctrl - n_trt) * {MICRO}
            // nullif(n_ctrl + n_trt, 0) AS BIGINT) AS chi2_micro,
       CAST(CASE WHEN CAST(n_ctrl - n_trt AS HUGEINT) * (n_ctrl - n_trt)
                      * {MICRO}
                      // nullif(n_ctrl + n_trt, 0) > {SRM_CHI2_CRIT_MICRO}
            THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
FROM per_day
"""


# ---------------------------------------------------------------------------
# pass@k estimator — the unbiased eval-harness statistic (Chen et al.,
# "Evaluating Large Language Models Trained on Code", 2021, eq. 1): with n
# sampled attempts and c successes, pass@k = 1 - C(n-c,k)/C(n,k), averaged
# over problems. Here each (event_type, user) group is one problem-candidate
# run (attempts = events, success = value >= PASS_THRESH_CENTS cents), and
# the per-type average is the benchmark score. The binomial ratio collapses
# to prod_{i=0..k-1}(n-c-i)/(n-i) — evaluated as ONE exact rational in
# DECIMAL(38,0)/HUGEINT (no factorials, no floats), well-defined up to
# n ≈ 2.5e7 attempts per group at k=5 (n^5 < 1e38; far beyond any real
# eval harness). Scale shape: fact scan -> per-(type,user) sufficient
# stats (one combine-backed shuffle) -> per-type roll-up (5 rows).
# Averages of floored micros are floored sums-of-floors on both engines.
# ---------------------------------------------------------------------------
PASS_THRESH_CENTS = 5_000  # success: value >= 50.00 units
PASS_K = 5


def _passk_num_den(k: int) -> tuple[str, str]:
    num = " * ".join(f"(n - c - {i})" for i in range(1, k))
    den = " * ".join(f"(n - {i})" for i in range(1, k))
    num = f"CAST(n - c AS DECIMAL(38,0))" + (f" * {num}" if num else "")
    den = f"CAST(n AS DECIMAL(38,0))" + (f" * {den}" if den else "")
    return num, den


def pass_at_k_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    per = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.expr(
                f"CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT)"
                f" >= {PASS_THRESH_CENTS} THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("c"),
    )
    num_k, den_k = _passk_num_den(PASS_K)
    scored = per.select(
        "event_type",
        F.expr(f"CAST(c * {MICRO} div n AS BIGINT)").alias("p1"),
        F.expr(
            f"CASE WHEN n >= {PASS_K} THEN CAST(("
            f"  ({den_k}) - (CASE WHEN n - c >= {PASS_K} THEN {num_k}"
            f"               ELSE CAST(0 AS DECIMAL(38,0)) END)"
            f") * {MICRO} div ({den_k}) AS BIGINT) ELSE NULL END"
        ).alias("pk"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("pk").cast("bigint").alias("n_eligible_k"),
        F.expr(f"CAST(sum(p1) div count(p1) AS BIGINT)").alias(
            "pass_at_1_micro"
        ),
        F.expr(f"CAST(sum(pk) div nullif(count(pk), 0) AS BIGINT)").alias(
            f"pass_at_{PASS_K}_micro"
        ),
    )


def _passk_sql() -> str:
    num = " * ".join(f"(n - c - {i})" for i in range(1, PASS_K))
    den = " * ".join(f"(n - {i})" for i in range(1, PASS_K))
    num = "CAST(n - c AS HUGEINT)" + (f" * {num}" if num else "")
    den = "CAST(n AS HUGEINT)" + (f" * {den}" if den else "")
    return f"""
WITH per AS (
    SELECT event_type, user_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                              >= {PASS_THRESH_CENTS}
                    THEN 1 ELSE 0 END) AS BIGINT) AS c
    FROM events
    WHERE user_id IS NOT NULL AND value IS NOT NULL
    GROUP BY 1, 2
),
scored AS (
    SELECT event_type,
           CAST(c * {MICRO} // n AS BIGINT) AS p1,
           CASE WHEN n >= {PASS_K} THEN CAST((
                ({den}) - (CASE WHEN n - c >= {PASS_K} THEN {num}
                           ELSE CAST(0 AS HUGEINT) END)
           ) * {MICRO} // ({den}) AS BIGINT) ELSE NULL END AS pk
    FROM per
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(pk) AS BIGINT) AS n_eligible_k,
       CAST(sum(p1) // count(p1) AS BIGINT) AS pass_at_1_micro,
       CAST(sum(pk) // nullif(count(pk), 0) AS BIGINT)
           AS pass_at_{PASS_K}_micro
FROM scored
GROUP BY 1
"""


_PASSK_SQL = _passk_sql()


# ---------------------------------------------------------------------------
# Split-conformal calibration audit — the distribution-free coverage
# guarantee check (Vovk et al.; Angelopoulos & Bates '21 survey): hold out
# a calibration split, take the ceil((n+1)(1-alpha))-th smallest
# nonconformity score as the threshold, and the test-split coverage is
# guaranteed >= 1-alpha in expectation. Everything is exact-integer: the
# "model" is the calibration split's per-type mean (floored cents), the
# score is |v - mean| in cents, the threshold an ORDER-STATISTIC pick over
# the (score, event_id) total order (no percentile interpolation), and
# coverage a floored micro ratio. Scale shape: one scan -> per-type
# sufficient stats (broadcast back) -> one window rank over the
# calibration slice -> tiny per-type join; nothing holistic.
# ---------------------------------------------------------------------------
CONFORMAL_ALPHA_NUM, CONFORMAL_ALPHA_DEN = 1, 10  # alpha = 0.1
_SPLIT5_SPARK = (
    "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10)"
    " AS BIGINT) % 5"
)
_SPLIT5_DUCK = (
    "TRY_CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)"
    " AS BIGINT) % 5"
)


def conformal_calibration_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    )
    base = ev.select(
        "event_type",
        "event_id",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v_cents"),
        (F.expr(_SPLIT5_SPARK) < 2).alias("is_cal"),
    )
    mean = (
        base.filter("is_cal")
        .groupBy("event_type")
        .agg(
            F.expr("CAST(sum(v_cents) div count(*) AS BIGINT)").alias(
                "mean_cents"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_cal"),
        )
    )
    scored = base.join(F.broadcast(mean), "event_type").withColumn(
        "score", F.expr("abs(v_cents - mean_cents)")
    )
    # q_rank = ceil((n_cal + 1) * (1 - alpha)); threshold = the q_rank-th
    # smallest calibration score under the (score, event_id) total order
    qr = (
        f"CAST(((n_cal + 1) * ({CONFORMAL_ALPHA_DEN - CONFORMAL_ALPHA_NUM})"
        f" + {CONFORMAL_ALPHA_DEN - 1}) div {CONFORMAL_ALPHA_DEN} AS BIGINT)"
    )
    w = Window.partitionBy("event_type").orderBy("score", "event_id")
    thr = (
        scored.filter("is_cal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.expr(f"rn = least({qr}, n_cal)"))
        .select(
            "event_type",
            F.expr(qr).alias("q_rank"),
            F.col("score").alias("threshold_cents"),
        )
    )
    test = scored.filter(~F.col("is_cal"))
    return (
        test.join(F.broadcast(thr), "event_type")
        .groupBy("event_type", "q_rank", "threshold_cents")
        .agg(
            F.first("n_cal").alias("n_cal"),
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.expr(
                f"CAST(sum(CASE WHEN score <= threshold_cents THEN 1 ELSE 0"
                f" END) * {MICRO} div count(*) AS BIGINT)"
            ).alias("coverage_micro"),
        )
        .select(
            "event_type",
            "n_cal",
            "n_test",
            "q_rank",
            "threshold_cents",
            "coverage_micro",
        )
    )


_CONFORMAL_SQL = f"""
WITH base AS (
    SELECT event_type, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents,
           ({_SPLIT5_DUCK}) < 2 AS is_cal
    FROM events
    WHERE user_id IS NOT NULL AND value IS NOT NULL
),
m AS (
    SELECT event_type,
           CAST(sum(v_cents) // count(*) AS BIGINT) AS mean_cents,
           CAST(count(*) AS BIGINT) AS n_cal
    FROM base WHERE is_cal GROUP BY 1
),
scored AS (
    SELECT b.event_type, b.event_id, b.is_cal,
           abs(b.v_cents - m.mean_cents) AS score, m.n_cal
    FROM base b JOIN m USING (event_type)
),
thr AS (
    SELECT event_type,
           CAST(((n_cal + 1) * {CONFORMAL_ALPHA_DEN - CONFORMAL_ALPHA_NUM}
                 + {CONFORMAL_ALPHA_DEN - 1}) // {CONFORMAL_ALPHA_DEN}
                AS BIGINT) AS q_rank,
           score AS threshold_cents
    FROM (
        SELECT event_type, score, n_cal,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY score, event_id) AS rn
        FROM scored WHERE is_cal
    )
    WHERE rn = least(((n_cal + 1) * {CONFORMAL_ALPHA_DEN - CONFORMAL_ALPHA_NUM}
                      + {CONFORMAL_ALPHA_DEN - 1}) // {CONFORMAL_ALPHA_DEN},
                     n_cal)
),
test AS (SELECT * FROM scored WHERE NOT is_cal)
SELECT t.event_type,
       CAST(max(t.n_cal) AS BIGINT) AS n_cal,
       CAST(count(*) AS BIGINT) AS n_test,
       h.q_rank,
       h.threshold_cents,
       CAST(sum(CASE WHEN t.score <= h.threshold_cents THEN 1 ELSE 0 END)
            * {MICRO} // count(*) AS BIGINT) AS coverage_micro
FROM test t JOIN thr h USING (event_type)
GROUP BY 1, 4, 5
"""


# ---------------------------------------------------------------------------
# Inter-annotator agreement (Cohen's kappa) — the label-quality gate a
# training pipeline runs over any machine- or dual-labeled slice before
# trusting the labels: two deterministic annotators (A: length rule,
# B: lexical-diversity rule) label every document and kappa corrects the
# raw agreement for chance, per source. One exact rational:
#   kappa = (N*(n11+n00) - (a1*b1 + a0*b0)) / (N^2 - (a1*b1 + a0*b0))
# in micro-units, DECIMAL(38,0)/HUGEINT products (N up to ~1e16 per
# source before width matters). Degenerate chance-agreement pe=1 (all
# four marginal products concentrated) yields NULL via nullif — the
# convention for "kappa undefined", identical on both engines.
# Scale shape: one scan, per-row labeling in codegen, one per-source
# combine; output |sources| rows.
# ---------------------------------------------------------------------------
KAPPA_LEN_THRESH = 200  # annotator A: long-document rule, n_chars >= 200
# annotator B: lexical diversity, distinct tokens >= 3/10 of tokens
KAPPA_DIV_NUM, KAPPA_DIV_DEN = 3, 10


def annotator_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("text").isNotNull()
    )
    labeled = docs.select(
        "source",
        F.expr(f"CASE WHEN n_chars >= {KAPPA_LEN_THRESH} THEN 1 ELSE 0 END")
        .cast("bigint")
        .alias("a"),
        F.expr(
            f"CASE WHEN CAST(size(array_distinct(filter(split(text, ' '),"
            f" x -> x != ''))) AS BIGINT) * {KAPPA_DIV_DEN} >="
            f" CAST(size(filter(split(text, ' '), x -> x != '')) AS BIGINT)"
            f" * {KAPPA_DIV_NUM} THEN 1 ELSE 0 END"
        )
        .cast("bigint")
        .alias("b"),
    )
    cells = labeled.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.expr("a * b")).cast("bigint").alias("n11"),
        F.sum(F.expr("(1 - a) * (1 - b)")).cast("bigint").alias("n00"),
        F.sum(F.expr("a * (1 - b)")).cast("bigint").alias("n10"),
        F.sum(F.expr("(1 - a) * b")).cast("bigint").alias("n01"),
    )
    return cells.select(
        "source",
        "n_docs",
        "n11",
        "n00",
        "n10",
        "n01",
        F.expr(
            f"CAST((CAST(n_docs AS DECIMAL(38,0)) * (n11 + n00)"
            f" - (CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01)"
            f"    + CAST(n00 + n01 AS DECIMAL(38,0)) * (n00 + n10)))"
            f" * {MICRO} div nullif("
            f"CAST(n_docs AS DECIMAL(38,0)) * n_docs"
            f" - (CAST(n11 + n10 AS DECIMAL(38,0)) * (n11 + n01)"
            f"    + CAST(n00 + n01 AS DECIMAL(38,0)) * (n00 + n10)), 0)"
            f" AS BIGINT)"
        ).alias("kappa_micro"),
    )


_KAPPA_SQL = f"""
WITH labeled AS (
    SELECT source,
           CASE WHEN n_chars >= {KAPPA_LEN_THRESH} THEN 1 ELSE 0 END AS a,
           CASE WHEN CAST(len(list_distinct(list_filter(
                         string_split(text, ' '), x -> x <> '')))
                     AS BIGINT) * {KAPPA_DIV_DEN} >=
                     CAST(len(list_filter(string_split(text, ' '),
                         x -> x <> '')) AS BIGINT) * {KAPPA_DIV_NUM}
                THEN 1 ELSE 0 END AS b
    FROM documents
    WHERE text IS NOT NULL
),
cells AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(a * b) AS BIGINT) AS n11,
           CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00,
           CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
           CAST(sum((1 - a) * b) AS BIGINT) AS n01
    FROM labeled GROUP BY 1
)
SELECT source, n_docs, n11, n00, n10, n01,
       CAST((CAST(n_docs AS HUGEINT) * (n11 + n00)
             - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                + CAST(n00 + n01 AS HUGEINT) * (n00 + n10)))
            * {MICRO} // nullif(
            CAST(n_docs AS HUGEINT) * n_docs
            - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
               + CAST(n00 + n01 AS HUGEINT) * (n00 + n10)), 0)
            AS BIGINT) AS kappa_micro
FROM cells
"""


# ---------------------------------------------------------------------------
# Binary-classifier AUC — the ROC area computed EXACTLY from the
# Mann-Whitney rank-sum identity with tie-averaged ranks (Hanley &
# McNeil '82), no curve sampling, no floats:
#   avgrank2 = 2*min_rank + (tie_ct - 1)      (doubled to stay integer)
#   2U = sum_{positives} avgrank2 - n_pos*(n_pos + 1)
#   AUC = 2U / (2 * n_pos * n_neg)            (floored micro)
# Scored per day over the conversion label (purchase vs rest) with the
# event's cents as the score — the daily ranking-quality gate a
# propensity pipeline runs on its scorer output. -1-sentineled when a
# day has no positives or no negatives (AUC undefined). Scale shape:
# one rank window + one tie-count window on the same (day) exchange,
# one per-day combine; rank sums ride DECIMAL(38,0)/HUGEINT (sum of
# ranks is O(n^2)).
# ---------------------------------------------------------------------------
def binary_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _events(spark, sf_dir).filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    base = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("score"),
        F.expr(
            "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END"
        )
        .cast("bigint")
        .alias("label"),
    )
    wr = Window.partitionBy("day").orderBy("score")
    wt = Window.partitionBy("day", "score")
    ranked = base.select(
        "day",
        "label",
        (
            F.lit(2) * F.rank().over(wr).cast("bigint")
            + F.count(F.lit(1)).over(wt).cast("bigint")
            - F.lit(1)
        ).alias("avgrank2"),
    )
    return ranked.groupBy("day").agg(
        F.sum("label").cast("bigint").alias("n_pos"),
        F.expr("CAST(count(*) - sum(label) AS BIGINT)").alias("n_neg"),
        F.expr(
            "CASE WHEN sum(label) = 0 OR count(*) = sum(label) THEN -1"
            " ELSE CAST((CAST(sum(CASE WHEN label = 1 THEN avgrank2"
            " ELSE 0 END) AS DECIMAL(38,0))"
            " - CAST(sum(label) AS DECIMAL(38,0)) * (sum(label) + 1))"
            " * 1000000 div (CAST(2 AS DECIMAL(38,0)) * sum(label)"
            " * (count(*) - sum(label))) AS BIGINT) END"
        ).alias("auc_micro"),
    )


_AUC_SQL = """
WITH base AS (
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS score,
           CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                AS BIGINT) AS label
    FROM events
    WHERE value IS NOT NULL AND ts IS NOT NULL
),
ranked AS (
    SELECT day, label,
           2 * CAST(rank() OVER (PARTITION BY day ORDER BY score)
               AS BIGINT)
           + CAST(count(*) OVER (PARTITION BY day, score) AS BIGINT) - 1
               AS avgrank2
    FROM base
)
SELECT day,
       CAST(sum(label) AS BIGINT) AS n_pos,
       CAST(count(*) - sum(label) AS BIGINT) AS n_neg,
       CASE WHEN sum(label) = 0 OR count(*) = sum(label) THEN -1
            ELSE CAST((CAST(sum(CASE WHEN label = 1 THEN avgrank2
                 ELSE 0 END) AS HUGEINT)
                 - CAST(sum(label) AS HUGEINT) * (sum(label) + 1))
                 * 1000000 // (CAST(2 AS HUGEINT) * sum(label)
                 * (count(*) - sum(label))) AS BIGINT) END AS auc_micro
FROM ranked
GROUP BY 1
"""


QUERIES = {
    "ab_experiment_lift": ab_experiment_lift,
    "binary_classifier_auc": binary_classifier_auc,
    "cuped_variance_reduction": cuped_variance_reduction,
    "k_anonymity_audit": k_anonymity_audit,
    "diff_in_diff": diff_in_diff,
    "survival_hazard_daily": survival_hazard_daily,
    "l_diversity_audit": l_diversity_audit,
    "t_closeness_audit": t_closeness_audit,
    "dp_sensitivity_audit": dp_sensitivity_audit,
    "srm_guardrail_audit": srm_guardrail_audit,
    "pass_at_k_estimator": pass_at_k_estimator,
    "conformal_calibration_audit": conformal_calibration_audit,
    "annotator_agreement_kappa": annotator_agreement_kappa,
}

ORACLE = {
    "ab_experiment_lift": _AB_LIFT_SQL,
    "binary_classifier_auc": _AUC_SQL,
    "cuped_variance_reduction": _CUPED_SQL,
    "k_anonymity_audit": _K_ANON_SQL,
    "diff_in_diff": _DID_SQL,
    "survival_hazard_daily": _SURV_SQL,
    "l_diversity_audit": _L_DIV_SQL,
    "t_closeness_audit": _T_CLOSE_SQL,
    "dp_sensitivity_audit": _DP_SENS_SQL,
    "srm_guardrail_audit": _SRM_SQL,
    "pass_at_k_estimator": _PASSK_SQL,
    "conformal_calibration_audit": _CONFORMAL_SQL,
    "annotator_agreement_kappa": _KAPPA_SQL,
}
