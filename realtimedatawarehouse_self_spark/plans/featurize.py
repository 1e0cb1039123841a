"""ML featurization operators for the training-data pipeline: the steps
between a curated corpus/event log and a model's feature matrix.

- `feature_hashing_counts` — the hashing trick (Weinberger et al., ICML'09):
  token -> signed fixed-dim bucket via one md5, no vocabulary build, no
  dictionary broadcast. The standard way to featurize unbounded vocabularies
  at corpus scale because it is a pure map: zero state, zero lookup table.
- `target_encoding_oof` — out-of-fold, GROUP-AWARE target encoding with
  m-estimate smoothing. Folds are assigned by USER hash (not row hash), so
  every row of a user lands in the same fold and the encoding for fold f
  never sees fold f's users — the leakage trap this operator exists to
  avoid. All arithmetic integer (cents / micro) until the final div.
- `autocorrelation_daily_lags` — ACF of the per-type daily count series at
  lags 1..7, emitted as sign-preserving r² in micro (integer), computed from
  the five sufficient sums. No sqrt anywhere: r² = cov² / (varx·vary) needs
  only exact integer products.
- `pit_training_matrix` — point-in-time-correct feature assembly (the
  feature-store time-travel join): every feature column reflects only state
  as of label_day - embargo, via the union-stream as-of plan (one user-keyed
  sort, no label x history range join). `target_encoding_oof` guards fold
  leakage; this guards TIME leakage.

Scale notes:
- feature hashing is scan-bound: map (md5 + mod) fused into the scan, then
  one combine-backed aggregate on (lang, bucket) — at most |langs|·DIM
  groups regardless of corpus size. No shuffle grows with data volume
  beyond the tiny final combine.
- target encoding is two combine-backed aggregates on (event_type, fold) —
  25-ish groups — plus windows over that tiny frame. The fact table is
  scanned ONCE; totals per type are derived from the per-fold frame, never
  a second scan.
- the ACF joins run on the DAILY frame (|types|·|days| rows — thousands at
  a century of data), not the fact table: one fact shuffle to build the
  daily series, then lag-joins on the tiny frame. Products accumulate in
  DECIMAL(38,0) (HUGEINT on the oracle side); int64 headroom bound
  documented at the cov² site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.exprs import money_cents
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Hashing-trick featurization: token -> signed bucket in [0, HASH_DIM).
#
# One 60-bit md5 per token (the repo-wide hash idiom — identical bit
# extraction on both engines); bucket = h mod DIM, sign = bit DIM of h.
# The signed variant keeps E[collision contribution] = 0, the property that
# makes the trick usable as a drop-in bag-of-words at any vocabulary size.
# ---------------------------------------------------------------------------
HASH_DIM = 64


def feature_hashing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(
            F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")
        ).alias("token"),
    )
    hashed = toks.select(
        "lang",
        F.conv(F.substring(F.md5("token"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
        "token",
    ).select(
        "lang",
        F.expr(f"h % {HASH_DIM}").alias("bucket_id"),
        F.expr(f"CASE WHEN (h div {HASH_DIM}) % 2 = 0 THEN 1 ELSE -1 END")
        .cast("bigint")
        .alias("sgn"),
        "token",
    )
    return hashed.groupBy("lang", "bucket_id").agg(
        F.sum("sgn").cast("bigint").alias("feat_sum"),
        F.count(F.lit(1)).cast("bigint").alias("tok_ct"),
        F.countDistinct("token").cast("bigint").alias("distinct_toks"),
    )


_FEATURE_HASH_SQL = f"""
WITH tok AS (
    SELECT lang,
           unnest(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS token
    FROM documents
),
h AS (
    SELECT lang, token,
           TRY_CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) AS h
    FROM tok
)
SELECT lang,
       CAST(h % {HASH_DIM} AS BIGINT) AS bucket_id,
       CAST(sum(CASE WHEN (h // {HASH_DIM}) % 2 = 0 THEN 1 ELSE -1 END)
            AS BIGINT) AS feat_sum,
       CAST(count(*) AS BIGINT) AS tok_ct,
       CAST(count(DISTINCT token) AS BIGINT) AS distinct_toks
FROM h
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Out-of-fold target encoding (m-estimate smoothing, group-aware folds).
#
# enc(type, f) = (S_oth + M · P_f) / (C_oth + M)
#   where S_oth/C_oth = target sum/count for `type` EXCLUDING fold f, and
#   P_f = global mean target excluding fold f (the prior must exclude the
#   fold too, or the global mean leaks fold-f labels into fold f's rows).
# Exact rationals: enc_micro = 1e6·(S_oth·GC_oth + M·GS_oth)
#                              / ((C_oth + M)·GC_oth)
# — one div, everything else integer. Products run ~1e12·1e12 at extreme
# scale, so the numerator accumulates in DECIMAL(38,0)/HUGEINT.
# ---------------------------------------------------------------------------
ENC_FOLDS = 5
ENC_M = 100  # m-estimate pseudo-count


def target_encoding_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    rows = ev.select(
        "event_type",
        F.expr(
            "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
            f" 16, 10) AS BIGINT) % {ENC_FOLDS}"
        ).alias("fold"),
        money_cents("value").alias("t_c"),
    )
    per_fold = rows.groupBy("event_type", "fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt_f"),
        F.sum("t_c").cast("bigint").alias("sum_f"),
    )
    wt = Window.partitionBy("event_type")
    wg = Window.partitionBy()
    enc = (
        per_fold.withColumn("cnt_t", F.sum("cnt_f").over(wt))
        .withColumn("sum_t", F.sum("sum_f").over(wt))
        .withColumn("gcnt_t", F.sum("cnt_f").over(wg))
        .withColumn("gsum_t", F.sum("sum_f").over(wg))
        # per-fold GLOBAL totals ride the same tiny frame: sum over the
        # fold's rows across all types via a window keyed on fold.
        .withColumn("gcnt_f", F.sum("cnt_f").over(Window.partitionBy("fold")))
        .withColumn("gsum_f", F.sum("sum_f").over(Window.partitionBy("fold")))
    )
    return enc.select(
        "event_type",
        "fold",
        F.col("cnt_f").alias("n_rows"),
        F.expr(
            "CAST((CAST(sum_t - sum_f AS DECIMAL(38,0)) * (gcnt_t - gcnt_f)"
            f" + CAST({ENC_M} AS DECIMAL(38,0)) * (gsum_t - gsum_f))"
            " * 1000000"
            f" div (CAST(cnt_t - cnt_f + {ENC_M} AS DECIMAL(38,0))"
            " * (gcnt_t - gcnt_f)) AS BIGINT)"
        ).alias("enc_micro_cents"),
    )


_TARGET_ENC_SQL = f"""
WITH rows_f AS (
    SELECT event_type,
           TRY_CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % {ENC_FOLDS} AS fold,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS t_c
    FROM events WHERE user_id IS NOT NULL
),
per_fold AS (
    SELECT event_type, fold,
           CAST(count(*) AS BIGINT) AS cnt_f,
           CAST(sum(t_c) AS BIGINT) AS sum_f
    FROM rows_f GROUP BY 1, 2
),
tot AS (
    SELECT event_type, fold, cnt_f, sum_f,
           sum(cnt_f) OVER (PARTITION BY event_type) AS cnt_t,
           sum(sum_f) OVER (PARTITION BY event_type) AS sum_t,
           sum(cnt_f) OVER () AS gcnt_t,
           sum(sum_f) OVER () AS gsum_t,
           sum(cnt_f) OVER (PARTITION BY fold) AS gcnt_f,
           sum(sum_f) OVER (PARTITION BY fold) AS gsum_f
    FROM per_fold
)
SELECT event_type, fold, cnt_f AS n_rows,
       CAST((CAST(sum_t - sum_f AS HUGEINT) * (gcnt_t - gcnt_f)
             + CAST({ENC_M} AS HUGEINT) * (gsum_t - gsum_f)) * 1000000
            // (CAST(cnt_t - cnt_f + {ENC_M} AS HUGEINT)
                * (gcnt_t - gcnt_f)) AS BIGINT) AS enc_micro_cents
FROM tot
"""


# ---------------------------------------------------------------------------
# Daily-series autocorrelation at lags 1..7, as sign-preserving r² micro.
#
# r²(lag) = cov² / (varx · vary) over pairs (c_d, c_{d+lag}); the sign of
# cov is attached so weekly seasonality (positive at lag 7) and alternation
# (negative at lag 1) are distinguishable. Integer throughout:
#   num  = sign · 1e6 · cov²           (DECIMAL(38,0))
#   den  = varx_num · vary_num         (DECIMAL(38,0))
# with cov = n·Σxy − Σx·Σy etc. over daily COUNTS.
# int128 headroom: |cov| ≤ n²·c̄² where c̄ is the mean daily count; 1e6·cov²
# stays inside DECIMAL(38,0) while n·c̄ (events per type in the window)
# ≤ 3e15 — far above any daily series a single type accumulates over the
# 1000-day window this operator targets. Beyond that, shard the series into
# epochs before calling (documented, not silently truncated).
# ---------------------------------------------------------------------------
ACF_MAX_LAG = 7


def autocorrelation_daily_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        # no persist (r10 A/B: 0.31 s without vs 0.55 s with)
    )
    a = daily.select(
        "event_type",
        F.col("d").alias("da"),
        F.col("c").alias("x"),
        F.explode(F.sequence(F.lit(1), F.lit(ACF_MAX_LAG))).alias("lag"),
    )
    b = daily.select(
        F.col("event_type").alias("bt"),
        F.col("d").alias("db"),
        F.col("c").alias("y"),
    )
    pairs = a.join(
        b,
        (F.col("event_type") == F.col("bt"))
        & (F.expr("date_add(da, CAST(lag AS INT))") == F.col("db")),
    )
    sums = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
    )
    return sums.filter(F.col("n") >= 3).select(
        "event_type",
        F.col("lag").cast("bigint").alias("lag"),
        "n",
        F.expr(
            "CAST(CASE WHEN n * sxy - CAST(sx AS DECIMAL(38,0)) * sy < 0"
            " THEN -1 ELSE 1 END AS BIGINT)"
        ).alias("cov_sign"),
        F.expr(
            "CAST((n * sxy - CAST(sx AS DECIMAL(38,0)) * sy)"
            " * (n * sxy - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000"
            " div nullif((n * sxx - CAST(sx AS DECIMAL(38,0)) * sx)"
            " * (n * syy - CAST(sy AS DECIMAL(38,0)) * sy), 0)"
            " AS BIGINT)"
        ).alias("r2_micro"),
    )


_ACF_SQL = f"""
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS c
    FROM events GROUP BY 1, 2
),
pairs AS (
    SELECT a.event_type, l.lag, a.c AS x, b.c AS y
    FROM daily a
    CROSS JOIN (SELECT unnest(range(1, {ACF_MAX_LAG} + 1)) AS lag) l
    JOIN daily b
      ON b.event_type = a.event_type AND b.d = a.d + CAST(l.lag AS INT)
),
sums AS (
    SELECT event_type, CAST(lag AS BIGINT) AS lag,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(x AS HUGEINT) * x) AS sxx,
           sum(CAST(y AS HUGEINT) * y) AS syy
    FROM pairs GROUP BY 1, 2
)
SELECT event_type, lag, n,
       CAST(CASE WHEN n * sxy - CAST(sx AS HUGEINT) * sy < 0
            THEN -1 ELSE 1 END AS BIGINT) AS cov_sign,
       CAST((n * sxy - CAST(sx AS HUGEINT) * sy)
            * (n * sxy - CAST(sx AS HUGEINT) * sy) * 1000000
            // nullif((n * sxx - CAST(sx AS HUGEINT) * sx)
                      * (n * syy - CAST(sy AS HUGEINT) * sy), 0)
            AS BIGINT) AS r2_micro
FROM sums WHERE n >= 3
"""


# ---------------------------------------------------------------------------
# Point-in-time-correct training-matrix assembly — the feature-store
# "time-travel join" that keeps label leakage out of a training set: for
# every label row (a purchase day), every feature column must reflect
# ONLY state as of label_day - EMBARGO_DAYS or earlier. This is the
# multi-stream generalization of `asof_join_purchase_signup` (one as-of
# pair) and the batch counterpart of what a feature store serves online;
# `target_encoding_oof` guards fold leakage, this guards TIME leakage.
#
# Two feature streams are assembled against the label stream:
# - events:  cumulative event count + cumulative cents per user, plus the
#   feature AGE (label_day - last contributing day) as the staleness
#   diagnostic every PIT pipeline reports;
# - orders:  cumulative order count + cumulative spend cents per user.
#
# Scale shape — the UNION-STREAM as-of plan, not a per-label range join:
# daily per-user aggregates (one combine-backed shuffle per stream,
# bounded by user x active-day), cumulative sums by window, then feature
# rows (time-shifted by the embargo so ordering alone enforces it) and
# label rows are UNIONED and sorted once per user; last(ignorenulls)
# propagates each stream's latest admissible state onto every label row.
# Cost: one user-keyed sort-shuffle over |daily frames| + |labels| —
# linear, no label x history expansion, no range-join explosion. The
# embargo shift (feature day d usable iff d + EMBARGO <= label day)
# becomes "sort key d + EMBARGO, features before labels on equal days":
# correctness by ordering, enforced identically at any scale.
# The oracle states the same semantics declaratively (per-label argmax
# over admissible feature days) — same answer, different plan; labels
# with no admissible history keep NULL-coalesced zeros and age -1 on
# both engines.
# ---------------------------------------------------------------------------
EMBARGO_DAYS = 1


def pit_training_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            "event_type",
            "value",
        )
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ev_cum = (
        ev.groupBy("user_id", "d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dn"),
            F.coalesce(F.sum(money_cents("value")), F.lit(0))
            .cast("bigint")
            .alias("dc"),
        )
        .select(
            "user_id",
            "d",
            F.sum("dn").over(wcum).cast("bigint").alias("cev_cnt"),
            F.sum("dc").over(wcum).cast("bigint").alias("cev_cents"),
        )
    )
    ord_cum = (
        _t(spark, sf_dir, "orders")
        .filter(
            F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
        )
        .select(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("date").alias("d"),
            money_cents("o_totalprice").alias("cents"),
        )
        .groupBy("user_id", "d")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dn"),
            F.coalesce(F.sum("cents"), F.lit(0)).cast("bigint").alias("dc"),
        )
        .select(
            "user_id",
            "d",
            F.sum("dn").over(wcum).cast("bigint").alias("cord_cnt"),
            F.sum("dc").over(wcum).cast("bigint").alias("cord_cents"),
        )
    )
    labels = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("d").alias("label_day"))
        .agg(
            F.coalesce(F.sum(money_cents("value")), F.lit(0))
            .cast("bigint")
            .alias("label_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        )
    )
    shift = F.date_add("d", EMBARGO_DAYS)
    n = F.lit(None)
    fe = ev_cum.select(
        "user_id",
        shift.alias("sd"),
        F.lit(0).alias("kind"),
        F.col("d").alias("ev_d"),
        "cev_cnt",
        "cev_cents",
        n.cast("bigint").alias("cord_cnt"),
        n.cast("bigint").alias("cord_cents"),
        n.cast("date").alias("label_day"),
        n.cast("bigint").alias("label_cents"),
        n.cast("bigint").alias("n_purchases"),
    )
    fo = ord_cum.select(
        "user_id",
        shift.alias("sd"),
        F.lit(0).alias("kind"),
        n.cast("date").alias("ev_d"),
        n.cast("bigint").alias("cev_cnt"),
        n.cast("bigint").alias("cev_cents"),
        "cord_cnt",
        "cord_cents",
        n.cast("date").alias("label_day"),
        n.cast("bigint").alias("label_cents"),
        n.cast("bigint").alias("n_purchases"),
    )
    lb = labels.select(
        "user_id",
        F.col("label_day").alias("sd"),
        F.lit(1).alias("kind"),
        n.cast("date").alias("ev_d"),
        n.cast("bigint").alias("cev_cnt"),
        n.cast("bigint").alias("cev_cents"),
        n.cast("bigint").alias("cord_cnt"),
        n.cast("bigint").alias("cord_cents"),
        "label_day",
        "label_cents",
        "n_purchases",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sd", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def _carry(c: str):
        return F.last(F.col(c), ignorenulls=True).over(w).alias(c)

    assembled = (
        fe.unionAll(fo)
        .unionAll(lb)
        .select(
            "user_id",
            "kind",
            "label_day",
            "label_cents",
            "n_purchases",
            _carry("ev_d"),
            _carry("cev_cnt"),
            _carry("cev_cents"),
            _carry("cord_cnt"),
            _carry("cord_cents"),
        )
        .filter(F.col("kind") == 1)
    )
    return assembled.select(
        "user_id",
        # day-as-VARCHAR at the output boundary (repo temporal convention:
        # every daily query emits formatted strings, never raw DATE/TS)
        F.date_format("label_day", "yyyy-MM-dd").alias("label_day"),
        "label_cents",
        "n_purchases",
        F.coalesce("cev_cnt", F.lit(0)).cast("bigint").alias("f_ev_cnt"),
        F.coalesce("cev_cents", F.lit(0)).cast("bigint").alias("f_ev_cents"),
        F.coalesce(
            F.datediff(F.col("label_day"), F.col("ev_d")).cast("bigint"),
            F.lit(-1),
        ).alias("f_ev_age_days"),
        F.coalesce("cord_cnt", F.lit(0)).cast("bigint").alias("f_ord_cnt"),
        F.coalesce("cord_cents", F.lit(0))
        .cast("bigint")
        .alias("f_ord_cents"),
    )


_PIT_SQL = f"""
WITH ev AS (
    SELECT user_id, CAST(ts AS DATE) AS d, event_type, value
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
evc AS (
    SELECT user_id, d,
           CAST(sum(dn) OVER w AS BIGINT) AS cev_cnt,
           CAST(sum(dc) OVER w AS BIGINT) AS cev_cents
    FROM (
        SELECT user_id, d, CAST(count(*) AS BIGINT) AS dn,
               COALESCE(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT), 0) AS dc
        FROM ev GROUP BY 1, 2
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING)
),
odc AS (
    SELECT user_id, d,
           CAST(sum(dn) OVER w AS BIGINT) AS cord_cnt,
           CAST(sum(dc) OVER w AS BIGINT) AS cord_cents
    FROM (
        SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS d,
               CAST(count(*) AS BIGINT) AS dn,
               COALESCE(CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                      AS BIGINT)) AS BIGINT), 0) AS dc
        FROM orders
        WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        GROUP BY 1, 2
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY d ROWS UNBOUNDED PRECEDING)
),
lab AS (
    SELECT user_id, d AS label_day,
           COALESCE(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT), 0) AS label_cents,
           CAST(count(*) AS BIGINT) AS n_purchases
    FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2
),
fe AS (
    SELECT user_id, label_day, label_cents, n_purchases,
           fed, cev_cnt, cev_cents
    FROM (
        SELECT l.user_id, l.label_day, l.label_cents, l.n_purchases,
               e.d AS fed, e.cev_cnt, e.cev_cents,
               row_number() OVER (PARTITION BY l.user_id, l.label_day
                                  ORDER BY e.d DESC) AS rn
        FROM lab l
        LEFT JOIN evc e ON l.user_id = e.user_id
              AND e.d + {EMBARGO_DAYS} <= l.label_day
    ) WHERE rn = 1
),
fo AS (
    SELECT user_id, label_day, cord_cnt, cord_cents
    FROM (
        SELECT l.user_id, l.label_day,
               o.cord_cnt, o.cord_cents,
               row_number() OVER (PARTITION BY l.user_id, l.label_day
                                  ORDER BY o.d DESC) AS rn
        FROM lab l
        LEFT JOIN odc o ON l.user_id = o.user_id
              AND o.d + {EMBARGO_DAYS} <= l.label_day
    ) WHERE rn = 1
)
SELECT f.user_id, strftime(f.label_day, '%Y-%m-%d') AS label_day,
       f.label_cents, f.n_purchases,
       COALESCE(f.cev_cnt, 0) AS f_ev_cnt,
       COALESCE(f.cev_cents, 0) AS f_ev_cents,
       COALESCE(CAST(date_diff('day', f.fed, f.label_day) AS BIGINT),
                -1) AS f_ev_age_days,
       COALESCE(o.cord_cnt, 0) AS f_ord_cnt,
       COALESCE(o.cord_cents, 0) AS f_ord_cents
FROM fe f
JOIN fo o ON f.user_id = o.user_id AND f.label_day = o.label_day
"""


QUERIES = {
    "feature_hashing_counts": feature_hashing_counts,
    "target_encoding_oof": target_encoding_oof,
    "autocorrelation_daily_lags": autocorrelation_daily_lags,
    "pit_training_matrix": pit_training_matrix,
}

ORACLE = {
    "feature_hashing_counts": _FEATURE_HASH_SQL,
    "target_encoding_oof": _TARGET_ENC_SQL,
    "autocorrelation_daily_lags": _ACF_SQL,
    "pit_training_matrix": _PIT_SQL,
}
