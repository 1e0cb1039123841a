"""Drift monitoring: embedding centroid drift and categorical
distribution shift between two temporal cohorts — the checks a training
pipeline runs before trusting yesterday's data against today's.

Extends the monitoring family (`dq_constraint_audit`,
`anomaly_zscore_daily`; closest reference analogue: the per-window metric
reduces of ``R/app/dws/Dws02...java:81-203``, which trend counters over
time but never compare distributions) with the two standard drift
questions:

- **Embedding drift** (`embedding_centroid_drift`): per label, how far
  did the class centroid move between cohort A and cohort B? Quantizes
  to integer micro-units exactly like `embedding_gram_matrix`
  (floor(x*1e6) after exact float->double widening, identical in both
  engines), so centroids (floored mean per dimension) and the squared L2
  drift are pure bigint arithmetic — bit-exact cross-engine, no cosine
  floats. One scan: posexplode carries (label, cohort, dim) partial sums
  through a single combine-backed aggregation of ≤ labels × 2 × d rows.
- **Categorical shift** (`distribution_shift_chi2`): per event_type, the
  chi-square homogeneity contribution between the two halves of the time
  range, in the cross-multiplied integer form
  ``(c_a*n_b − c_b*n_a)² / (n_a*n_b*(c_a+c_b))`` — no expected-count
  fractions, so the statistic is an exact integer micro-unit division.
  Counts are DECIMAL(38,0)/HUGEINT before squaring: the numerator is
  (rows²)² and wraps int64 past ~55k rows per cohort. The wide arithmetic
  is INTERNAL only — the output boundary is a checked BIGINT cast on both
  sides (the contribution itself is <= total_rows * 1e6), because the
  driver's value-hash renders DECIMAL/HUGEINT differently from BIGINT.

Cohorts are deterministic: vec_id parity for embeddings (the table has no
timestamp; parity is stable, shuffle-independent, and splits ~50/50),
calendar halves for events (split at the midpoint day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.exprs import checked_bigint
from realtimedatawarehouse_self_spark.plans.mining import EMB_DIM, Q_SCALE
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table

SPLIT_DAY = "2024-01-16"  # events midpoint (testdata spans 2024-01)


def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    q = emb.select(
        "label",
        (F.col("vec_id") % 2).cast("int").alias("cohort"),
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
            f" * {Q_SCALE}.0) AS BIGINT))"
        ).alias("q"),
    )
    dims = q.select(
        "label", "cohort", F.posexplode("q").alias("dim", "v")
    )
    sums = dims.groupBy("label", "cohort", "dim").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # Floored per-dimension centroid; identical floor division on both
    # engines (micro-unit values are bounded, so no precision games).
    cent = sums.select(
        "label", "dim", "cohort", F.expr("s div n").alias("m"), "n"
    )
    a = cent.filter(F.col("cohort") == 0).select(
        "label", "dim", F.col("m").alias("m_a"), F.col("n").alias("n_a")
    )
    b = cent.filter(F.col("cohort") == 1).select(
        "label", "dim", F.col("m").alias("m_b"), F.col("n").alias("n_b")
    )
    return (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.min("n_a").alias("n_a"),
            F.min("n_b").alias("n_b"),
            F.sum(
                (F.col("m_a") - F.col("m_b")) * (F.col("m_a") - F.col("m_b"))
            ).alias("drift_sq_micro2"),
        )
        .select("label", "n_a", "n_b", "drift_sq_micro2")
    )


_CENTROID_SQL = f"""
WITH q AS (
    SELECT label,
           CAST(vec_id % 2 AS INTEGER) AS cohort,
           u.i AS dim,
           CAST(floor(CAST(embedding[u.i] AS DOUBLE) * {Q_SCALE}.0)
               AS BIGINT) AS v
    FROM embeddings, UNNEST(range(1, {EMB_DIM} + 1)) AS u(i)
),
sums AS (
    SELECT label, cohort, dim,
           sum(v) AS s, CAST(count(*) AS BIGINT) AS n
    FROM q GROUP BY 1, 2, 3
),
cent AS (SELECT label, dim, cohort, s // n AS m, n FROM sums)
SELECT a.label,
       min(a.n) AS n_a,
       min(b.n) AS n_b,
       -- CAST: un-cast sum(BIGINT) is HUGEINT in DuckDB and the driver
       -- hash renders it differently from BIGINT (r5 hash-red class).
       -- Bound: |m| <= Q_SCALE (unit-range dims), diff^2 <= 4e12, summed
       -- over EMB_DIM dims -- orders of magnitude inside int64.
       CAST(sum((a.m - b.m) * (a.m - b.m)) AS BIGINT) AS drift_sq_micro2
FROM cent a
JOIN cent b ON a.label = b.label AND a.dim = b.dim
WHERE a.cohort = 0 AND b.cohort = 1
GROUP BY 1
"""


def distribution_shift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events")
    tagged = ev.select(
        "event_type",
        F.when(F.col("ts") < F.lit(SPLIT_DAY).cast("timestamp"), 0)
        .otherwise(1)
        .alias("cohort"),
    )
    # ONE conditional aggregation, mirroring the oracle's GROUP BY shape —
    # a filter+full-outer-join form would also double-count a NULL
    # event_type group (Spark equijoins never match NULL keys).
    per_type = tagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c_a"),
        F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("c_b"),
    )
    totals = per_type.agg(
        F.sum("c_a").alias("n_a"), F.sum("c_b").alias("n_b")
    )
    return (
        per_type.crossJoin(F.broadcast(totals))
        .select(
            "event_type",
            "c_a",
            "c_b",
            F.expr(
                "CAST((CAST(c_a AS DECIMAL(38,0)) * n_b"
                " - CAST(c_b AS DECIMAL(38,0)) * n_a) AS DECIMAL(38,0))"
            ).alias("num_root"),
            F.expr(
                "CAST(CAST(n_a AS DECIMAL(38,0)) * n_b"
                " * (c_a + c_b) AS DECIMAL(38,0))"
            ).alias("den"),
        )
        .select(
            "event_type",
            "c_a",
            "c_b",
            # Wide arithmetic stays internal; the OUTPUT boundary is int64
            # (driver renders DECIMAL differently from BIGINT — r5 hash-red
            # class). The contribution is bounded by total_rows * 1e6
            # (chi2 contribution <= n), i.e. int64-safe until ~9e12 input
            # rows; checked_bigint raises loudly rather than wrap/NULL past
            # that.
            checked_bigint(
                F.expr("(num_root * num_root * 1000000) div den"),
                "chi2_contrib_micro",
            ),
        )
    )


_CHI2_SQL = f"""
WITH tagged AS (
    SELECT event_type,
           CASE WHEN ts < TIMESTAMP '{SPLIT_DAY}' THEN 0 ELSE 1 END AS cohort
    FROM events
),
counts AS (
    SELECT event_type,
           CAST(sum(CASE WHEN cohort = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
           CAST(sum(CASE WHEN cohort = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_b
    FROM tagged GROUP BY 1
),
tot AS (SELECT sum(c_a) AS n_a, sum(c_b) AS n_b FROM counts)
SELECT c.event_type, c.c_a, c.c_b,
       -- HUGEINT internally; BIGINT at the boundary (driver hash renders
       -- HUGEINT/DECIMAL differently from BIGINT). DuckDB's HUGEINT->BIGINT
       -- cast errors on overflow, mirroring checked_bigint on the Spark side.
       CAST(((CAST(c.c_a AS HUGEINT) * t.n_b - CAST(c.c_b AS HUGEINT) * t.n_a)
             * (CAST(c.c_a AS HUGEINT) * t.n_b - CAST(c.c_b AS HUGEINT) * t.n_a)
             * 1000000)
            // (CAST(t.n_a AS HUGEINT) * t.n_b * (c.c_a + c.c_b))
           AS BIGINT) AS chi2_contrib_micro
FROM counts c, tot t
"""


# ---------------------------------------------------------------------------
# Subsample-based uncertainty for the per-type mean value — "how sure is
# the metric?" quantified WITHOUT any nondeterministic RNG: B deterministic
# half-subsamples (membership = md5(b:event_id) bucket < 50%, the same
# cross-engine hash idiom as `stratified_sample_corpus`), each yielding an
# exact floored mean in cents; the spread of those B means IS the
# uncertainty estimate (half-sampling/subsampling in the Politis–Romano
# sense — Var(full-sample mean) ≈ var(half-sample means) / 2 for n/2
# subsamples; the raw integer variance numerator is emitted and the
# calibration note lives here, not in floats).
#
# Everything is exact integer arithmetic: per-subsample means are floored
# cents; the variance numerator is B_eff * Σm² − (Σm)² over those bigint
# means (m ~ 1e4 cents, B = 16 → Σm² ~ 1e9, far inside int64), so the
# whole result is bit-stable across engines and partitionings.
#
# Scale shape: ONE scan — the B-way replication is an in-row explode
# (sequence 0..B-1) followed by the hash gate, and map-side combine
# collapses everything to (types × B) rows before the only shuffle. The
# alternative (B separate jobs) would scan the fact table B times. B and
# the gate are compile-time constants mirrored into the oracle.
# ---------------------------------------------------------------------------
SUBSAMPLE_B = 16
SUBSAMPLE_HALF_BP = 5000


def subsample_mean_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.functions.exprs import money_cents

    apply_runtime_confs(spark)
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "event_id", "value")
    )
    full = ev.groupBy("event_type").agg(
        F.sum(money_cents("value")).alias("s_all"),
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
    )
    # r10 optimization (guide §1.2 per-task work): the hash gate runs
    # INSIDE an array filter over sequence(0, B-1), so the Generate only
    # emits the ~B/2 SURVIVING replicas of each event's (event_type,
    # value) instead of materializing all B wide rows and filtering
    # afterwards. Identical md5/conv expression per (b, event_id) — the
    # surviving (row, b) set is bit-identical to the explode-then-filter
    # original; NULL event_id makes the lambda NULL, which filter()
    # drops, exactly as the row filter did.
    surviving_bs = F.expr(
        f"filter(sequence(0, {SUBSAMPLE_B - 1}), b ->"
        " (CAST(conv(substring(md5(concat(CAST(b AS STRING), ':',"
        " CAST(event_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
        f" % 10000) < {SUBSAMPLE_HALF_BP})"
    )
    reps = ev.select(
        "event_type",
        "value",
        F.explode(surviving_bs).alias("b"),
    )
    sub = (
        reps.groupBy("event_type", "b")
        .agg(
            F.sum(money_cents("value")).alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .select("event_type", F.expr("s div n").alias("m"))
    )
    spread = sub.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("b_eff"),
        F.min("m").alias("submean_min_cents"),
        F.max("m").alias("submean_max_cents"),
        F.sum("m").alias("sum_m"),
        F.sum(F.expr("m * m")).alias("sum_m2"),
    )
    return (
        spread.join(F.broadcast(full), "event_type")
        .select(
            "event_type",
            "b_eff",
            F.expr("s_all div n_all").alias("full_mean_cents"),
            "submean_min_cents",
            "submean_max_cents",
            F.expr("b_eff * sum_m2 - sum_m * sum_m").alias("var_num"),
        )
    )


_SUBSAMPLE_SQL = f"""
WITH ev AS (
    SELECT event_type, event_id, value FROM events WHERE value IS NOT NULL
),
be AS (
    SELECT event_type,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS s_all,
           CAST(count(*) AS BIGINT) AS n_all
    FROM ev GROUP BY 1
),
sub AS (
    SELECT event_type, b,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               // CAST(count(*) AS BIGINT) AS m
    FROM ev, UNNEST(range(0, {SUBSAMPLE_B})) AS u(b)
    WHERE (TRY_CAST('0x' || substr(md5(
               CAST(b AS VARCHAR) || ':' || CAST(event_id AS VARCHAR)
           ), 1, 15) AS BIGINT) % 10000) < {SUBSAMPLE_HALF_BP}
    GROUP BY 1, 2
),
spread AS (
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS b_eff,
           min(m) AS submean_min_cents,
           max(m) AS submean_max_cents,
           CAST(sum(m) AS BIGINT) AS sum_m,
           CAST(sum(m * m) AS BIGINT) AS sum_m2
    FROM sub GROUP BY 1
)
SELECT s.event_type, s.b_eff,
       f.s_all // f.n_all AS full_mean_cents,
       s.submean_min_cents, s.submean_max_cents,
       s.b_eff * s.sum_m2 - s.sum_m * s.sum_m AS var_num
FROM spread s JOIN be f ON s.event_type = f.event_type
"""


# ---------------------------------------------------------------------------
# Embedding-norm QA profile — the vector-table health check that runs
# BEFORE any ANN/clustering consumes it: per label, the distribution of
# squared norms in exact integer micro^2 units (quantized like
# embedding_gram_matrix, so both engines see identical values). Zero/huge
# norms are the classic symptoms of a broken encoder batch or a botched
# normalization pass; the profile emits min/max/max-deviation and the
# count beyond NORM_DEV_PERMILLE so "0 outliers" is itself the recorded
# finding (measured on the driver testdata: all labels within 5%).
#
# Scale: norm2 is an in-row reduce (no explode survives the projection);
# one label-keyed combine for the stats, one broadcast-back pass for the
# deviation columns. Headroom: norm2 <= d * 1e12 ~ 6.4e13 at d=64; the
# permille scaling keeps every product under 1e17, far inside int64 (a
# micro scaling would overflow — documented here so nobody "upgrades" it).
# ---------------------------------------------------------------------------
NORM_DEV_PERMILLE = 50


def embedding_norm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    q = emb.select(
        "vec_id",
        "label",
        F.expr(
            f"aggregate(transform(embedding, x -> CAST(floor(CAST(x AS"
            f" DOUBLE) * {Q_SCALE}.0) AS BIGINT)), CAST(0 AS BIGINT),"
            f" (acc, v) -> acc + v * v)"
        ).alias("norm2"),
    )
    stats = q.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.expr("CAST(sum(norm2) div count(*) AS BIGINT)").alias("mean_norm2"),
        F.min("norm2").alias("min_norm2"),
        F.max("norm2").alias("max_norm2"),
    )
    return (
        q.join(F.broadcast(stats), "label")
        .groupBy("label")
        .agg(
            F.min("n_vecs").alias("n_vecs"),
            F.min("mean_norm2").alias("mean_norm2"),
            F.min("min_norm2").alias("min_norm2"),
            F.min("max_norm2").alias("max_norm2"),
            F.expr(
                "CAST(max(abs(norm2 - mean_norm2) * 1000 div mean_norm2)"
                " AS BIGINT)"
            ).alias("max_dev_permille"),
            F.expr(
                f"CAST(sum(CASE WHEN abs(norm2 - mean_norm2) * 1000"
                f" > {NORM_DEV_PERMILLE} * mean_norm2 THEN 1 ELSE 0 END)"
                f" AS BIGINT)"
            ).alias("n_outliers"),
        )
    )


_NORM_PROFILE_SQL = f"""
WITH q AS (
    SELECT vec_id, label,
           list_sum(list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * {Q_SCALE}.0) AS BIGINT)
                    * CAST(floor(CAST(x AS DOUBLE) * {Q_SCALE}.0) AS BIGINT)))
               AS norm2
    FROM embeddings
),
stats AS (
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(norm2) // count(*) AS BIGINT) AS mean_norm2,
           CAST(min(norm2) AS BIGINT) AS min_norm2,
           CAST(max(norm2) AS BIGINT) AS max_norm2
    FROM q GROUP BY 1
)
SELECT q.label,
       min(s.n_vecs) AS n_vecs,
       min(s.mean_norm2) AS mean_norm2,
       min(s.min_norm2) AS min_norm2,
       min(s.max_norm2) AS max_norm2,
       CAST(max(abs(q.norm2 - s.mean_norm2) * 1000 // s.mean_norm2)
            AS BIGINT) AS max_dev_permille,
       CAST(sum(CASE WHEN abs(q.norm2 - s.mean_norm2) * 1000
                          > {NORM_DEV_PERMILLE} * s.mean_norm2
                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM q JOIN stats s ON q.label = s.label
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Robust (median/MAD) daily-count anomaly detection — the heavy-tail
# companion to `anomaly_zscore_daily` (advanced.py): mean/sigma flags
# drown when one genuine spike inflates sigma; median & MAD ignore up to
# half the days being wild. Pure integer arithmetic end to end:
#   med  = LOWER median of the type's daily counts (the element at rank
#          (n+1) div 2 ordered by (ct, day) — a value the data actually
#          contains, never an interpolated float; the (ct, day) tiebreak
#          makes the chosen ROW deterministic, though the VALUE at the
#          rank is order-independent anyway),
#   mad  = lower median of |ct − med|,
#   score_micro = dev·1e6 div max(mad, 1)   (mad = 0 when ≥ half the
#          days share the median count — max(·,1) keeps the score
#          defined instead of NULL, mirroring the classic MAD fallback),
#   is_anomaly = dev > MAD_K · max(mad, 1).
# Scale: ONE shuffle of the fact table on (event_type, day); both median
# passes are windows over the tiny daily frame (types × days rows —
# thousands of rows at ANY corpus size, so the exact per-type sort is
# bounded by calendar length, not data volume). The two 1-row-per-type
# frames broadcast back. No floats, no approx-percentile: this is where
# exact medians are genuinely cheap.
# ---------------------------------------------------------------------------
MAD_K = 3  # the conventional "3 MADs" robust outlier rule


def mad_anomaly_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    ).persist()  # feeds the median pass, the dev frame, AND the MAD pass
    wt = Window.partitionBy("event_type")
    ranked = daily.withColumn(
        "rn", F.row_number().over(wt.orderBy("ct", "d"))
    ).withColumn("n", F.count(F.lit(1)).over(wt))
    med = ranked.filter(F.expr("rn = (n + 1) div 2")).select(
        "event_type", F.col("ct").alias("med")
    )
    dev = (
        daily.join(F.broadcast(med), "event_type")
        .withColumn("dev", F.expr("abs(ct - med)"))
    )
    ranked2 = dev.withColumn(
        "rn", F.row_number().over(wt.orderBy("dev", "d"))
    ).withColumn("n", F.count(F.lit(1)).over(wt))
    mad = ranked2.filter(F.expr("rn = (n + 1) div 2")).select(
        "event_type", F.col("dev").alias("mad")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "ct",
        "med",
        "mad",
        "dev",
        F.expr(
            "dev * 1000000 div greatest(mad, CAST(1 AS BIGINT))"
        ).alias("score_micro"),
        F.expr(
            f"CAST(dev > {MAD_K} * greatest(mad, CAST(1 AS BIGINT)) AS INT)"
        ).alias("is_anomaly"),
    )


_MAD_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS ct
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT event_type, d, ct,
           row_number() OVER (PARTITION BY event_type ORDER BY ct, d) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM daily
),
med AS (SELECT event_type, ct AS med FROM ranked WHERE rn = (n + 1) // 2),
dev AS (
    SELECT y.event_type, y.d, y.ct, m.med,
           CAST(abs(y.ct - m.med) AS BIGINT) AS dev
    FROM daily y JOIN med m ON y.event_type = m.event_type
),
ranked2 AS (
    SELECT event_type, d, ct, med, dev,
           row_number() OVER (PARTITION BY event_type ORDER BY dev, d) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM dev
),
mad AS (SELECT event_type, dev AS mad FROM ranked2 WHERE rn = (n + 1) // 2)
SELECT v.event_type,
       strftime(v.d, '%Y-%m-%d') AS day,
       v.ct, v.med, a.mad, v.dev,
       CAST(v.dev * 1000000 // greatest(a.mad, 1) AS BIGINT) AS score_micro,
       CAST(v.dev > {MAD_K} * greatest(a.mad, 1) AS INTEGER) AS is_anomaly
FROM dev v JOIN mad a ON v.event_type = a.event_type
"""


# ---------------------------------------------------------------------------
# Wave 56a (r10): per-dimension quantization outlier audit (Dettmers et
# al. 2022, "LLM.int8()": a few emergent feature dimensions carry
# systematically outsized magnitudes, and naive per-tensor int8
# quantization destroys them — the audit that decides which channels
# need mixed-precision treatment). Per embedding dimension: value count,
# mean |x| and max |x| in micro units (the embedding family's
# floor(x*1e6) quantization, identical in both engines), the
# max-to-mean magnitude ratio, and the outlier verdict at the paper's
# 6x-magnitude operating point (ratio >= 6e6 AND max_abs >= 1e5 — the
# absolute floor keeps all-tiny dimensions from flagging on noise).
#
# Arithmetic is BIGINT-safe at any corpus size: max_abs <= ~2e6 for
# unit-scale embeddings, so max_abs*1e6 and sum_abs stay far inside
# int64 (sum_abs ~ 1e6 * n needs n < 9e12 per dimension — ~9e12 vectors,
# beyond any real corpus; past that the chi2 DECIMAL(38) escape applies).
#
# Scale: posexplode -> ONE (dim) combine with map-side partials (the
# embedding_centroid_drift shape) -> EMB_DIM rows. Linear scan.
# ---------------------------------------------------------------------------
OUTLIER_RATIO_MICRO = 6_000_000
OUTLIER_ABS_FLOOR = 100_000  # 0.1 in micro units


def quantization_outlier_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    apply_runtime_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    vals = emb.select(
        F.posexplode(
            F.expr(
                f"transform(embedding, x -> abs(CAST(floor(CAST(x AS"
                f" DOUBLE) * {Q_SCALE}.0) AS BIGINT)))"
            )
        ).alias("dim", "q")
    )
    per_dim = vals.groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vals"),
        F.sum("q").cast("bigint").alias("sum_abs"),
        F.max("q").cast("bigint").alias("max_abs_micro"),
    )
    scored = per_dim.withColumn(
        "mean_abs_micro", F.expr("sum_abs div n_vals")
    ).withColumn(
        "ratio_micro",
        F.expr(
            "CASE WHEN mean_abs_micro = 0 THEN 0"
            " ELSE max_abs_micro * 1000000 div mean_abs_micro END"
        ),
    )
    return scored.select(
        F.col("dim").cast("int").alias("dim"),
        "n_vals",
        "mean_abs_micro",
        "max_abs_micro",
        "ratio_micro",
        F.expr(
            f"CASE WHEN ratio_micro >= {OUTLIER_RATIO_MICRO}"
            f" AND max_abs_micro >= {OUTLIER_ABS_FLOOR}"
            f" THEN 'outlier' ELSE 'normal' END"
        ).alias("verdict"),
    )


_QUANT_OUTLIER_SQL = f"""
WITH vals AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         abs(CAST(floor(CAST(unnest(embedding) AS DOUBLE)
             * {Q_SCALE}.0) AS BIGINT)) AS q
  FROM embeddings
),
per_dim AS (
  SELECT dim,
         CAST(count(*) AS BIGINT) AS n_vals,
         CAST(sum(q) AS BIGINT) AS sum_abs,
         CAST(max(q) AS BIGINT) AS max_abs_micro
  FROM vals GROUP BY 1
),
scored AS (
  SELECT dim, n_vals, sum_abs // n_vals AS mean_abs_micro,
         max_abs_micro
  FROM per_dim
)
SELECT CAST(dim AS INT) AS dim, n_vals,
       CAST(mean_abs_micro AS BIGINT) AS mean_abs_micro,
       max_abs_micro,
       CAST(CASE WHEN mean_abs_micro = 0 THEN 0
            ELSE max_abs_micro * 1000000 // mean_abs_micro END
            AS BIGINT) AS ratio_micro,
       CASE WHEN (CASE WHEN mean_abs_micro = 0 THEN 0
                  ELSE max_abs_micro * 1000000 // mean_abs_micro END)
                 >= {OUTLIER_RATIO_MICRO}
                 AND max_abs_micro >= {OUTLIER_ABS_FLOOR}
            THEN 'outlier' ELSE 'normal' END AS verdict
FROM scored
"""


QUERIES = {
    "quantization_outlier_audit": quantization_outlier_audit,
    "embedding_centroid_drift": embedding_centroid_drift,
    "embedding_norm_profile": embedding_norm_profile,
    "distribution_shift_chi2": distribution_shift_chi2,
    "subsample_mean_variance": subsample_mean_variance,
    "mad_anomaly_daily": mad_anomaly_daily,
}

ORACLE = {
    "quantization_outlier_audit": _QUANT_OUTLIER_SQL,
    "embedding_centroid_drift": _CENTROID_SQL,
    "embedding_norm_profile": _NORM_PROFILE_SQL,
    "distribution_shift_chi2": _CHI2_SQL,
    "subsample_mean_variance": _SUBSAMPLE_SQL,
    "mad_anomaly_daily": _MAD_SQL,
}
