"""Temporal-state and incremental-ingest operators: snapshot changelog
diff, ingest-time near-dup screening, and sketch-vs-exact quantiles.

Reference lineage: the CDC changelog family (``sources/envelopes.py``,
reference ``CDC/FlinkCDC_MysqlSource.java:47-60`` + Maxwell envelopes) —
these three give the BATCH counterparts a warehouse needs around that
stream:

- `snapshot_diff_user_state` derives the I/U/D changelog BETWEEN two
  temporal states of an append-only event log — the op a downstream
  consumer runs when it has no CDC feed and must reconcile snapshots.
  State@T is "each user's latest event in the trailing window"; the diff
  classifies insert (user appears), delete (user ages out), update
  (latest event changed). ONE scan — both snapshot states come out of a
  single conditional aggregation keyed by user (no per-snapshot scan, no
  self-join); the window predicate is pushed into the parquet scan.
- `dedup_incoming_batch` is the INGEST-TIME variant of the LSH near-dup
  pipeline (`llm_ops.dedup_lsh_verified`): an incoming batch is screened
  against the existing corpus, never against itself — the band join is
  incoming×corpus, so candidate count is linear in the BATCH size however
  large the corpus grows (the corpus side still prunes to matching band
  signatures). Verification (exact Jaccard via array_intersect) runs only
  on candidates; REJECTED candidates stay in the output with
  ``is_dup=false`` so the screening decision itself is oracle-checked.
- `value_quantile_sketch` computes per-type p50/p90/p99 twice — a
  fixed-width histogram sketch (ONE combine-backed aggregation to ~1000
  bins per type, the 100 TB path) and the exact order statistic (global
  per-type sort — the expensive truth) — and emits both plus their gap.
  The bin width IS the deterministic error bound (err in (0, BIN_CENTS]),
  asserted in pytest, and both paths are exact integer arithmetic so the
  cross-engine hash matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from realtimedatawarehouse_self_spark.functions.exprs import money_cents
from realtimedatawarehouse_self_spark.plans.llm_ops import (
    _SHINGLE_CTE,
    _doc_shingles,
    _minhash_aggs,
    _minhash_tail_cte,
    _shingle_hash,
)
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, "events")


# ---------------------------------------------------------------------------
# Snapshot changelog diff.
# ---------------------------------------------------------------------------
SNAP_T1 = "2024-01-10 00:00:00"
SNAP_T2 = "2024-01-25 00:00:00"
SNAP_WINDOW_DAYS = 1  # state@T = latest event in (T - 1 day, T]


def snapshot_diff_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "ts", "user_id", "event_id", money_cents("value").alias("cents")
    )
    lo1 = f"timestamp'{SNAP_T1}' - interval {SNAP_WINDOW_DAYS} days"
    lo2 = f"timestamp'{SNAP_T2}' - interval {SNAP_WINDOW_DAYS} days"
    # One pushed-down scan covering both windows; each snapshot's "latest
    # event" is a conditional struct-max (ordered by ts, then event_id —
    # identical to the oracle's row_number DESC ordering; cents rides in
    # the last slot and never influences the ordering because (ts,
    # event_id) is unique).
    ev = ev.filter(
        (F.col("ts") > F.expr(lo1)) & (F.col("ts") <= F.lit(SNAP_T2))
    )
    in_a = (F.col("ts") > F.expr(lo1)) & (F.col("ts") <= F.lit(SNAP_T1))
    in_b = F.col("ts") > F.expr(lo2)
    snap = ev.groupBy("user_id").agg(
        F.max(
            F.when(in_a, F.struct("ts", "event_id", "cents"))
        ).alias("la"),
        F.max(
            F.when(in_b, F.struct("ts", "event_id", "cents"))
        ).alias("lb"),
    )
    return (
        # Users whose events all fall BETWEEN the windows have no state in
        # either snapshot — they are not changelog rows (the oracle's full
        # outer join never sees them; without this guard they'd leak
        # through as spurious both-NULL 'I' rows).
        snap.filter(F.col("la").isNotNull() | F.col("lb").isNotNull())
        .filter(
            F.col("la").isNull()
            | F.col("lb").isNull()
            | (F.col("la.event_id") != F.col("lb.event_id"))
        )
        .select(
            "user_id",
            F.when(F.col("la").isNull(), F.lit("I"))
            .when(F.col("lb").isNull(), F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            F.col("la.cents").alias("old_cents"),
            F.col("lb.cents").alias("new_cents"),
        )
    )


_SNAP_SQL = f"""
WITH win AS (
    SELECT user_id, event_id, ts,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
    WHERE ts > TIMESTAMP '{SNAP_T1}' - INTERVAL {SNAP_WINDOW_DAYS} DAY
      AND ts <= TIMESTAMP '{SNAP_T2}'
),
a AS (
    SELECT user_id, event_id, cents FROM (
        SELECT user_id, event_id, cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM win
        WHERE ts <= TIMESTAMP '{SNAP_T1}'
    ) WHERE rn = 1
),
b AS (
    SELECT user_id, event_id, cents FROM (
        SELECT user_id, event_id, cents,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM win
        WHERE ts > TIMESTAMP '{SNAP_T2}' - INTERVAL {SNAP_WINDOW_DAYS} DAY
    ) WHERE rn = 1
)
SELECT coalesce(a.user_id, b.user_id) AS user_id,
       CASE WHEN a.user_id IS NULL THEN 'I'
            WHEN b.user_id IS NULL THEN 'D'
            ELSE 'U' END AS op,
       a.cents AS old_cents,
       b.cents AS new_cents
FROM a FULL OUTER JOIN b ON a.user_id = b.user_id
WHERE a.user_id IS NULL OR b.user_id IS NULL OR a.event_id <> b.event_id
"""


# ---------------------------------------------------------------------------
# Ingest-time near-dup screening: incoming batch vs existing corpus.
# ---------------------------------------------------------------------------
# Deterministic stand-in for "the newly arrived batch": every 5th doc_id.
INCOMING_MOD = 5


def dedup_incoming_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir)
    per_doc = (
        sh.select("doc_id", "lang", "sh", _shingle_hash())
        .groupBy("doc_id")
        .agg(
            F.first("lang").alias("lang"),
            F.count(F.lit(1)).alias("n_sh"),
            F.collect_list("sh").alias("sh_arr"),
            *_minhash_aggs(),
        )
        .withColumn("is_new", F.col("doc_id") % INCOMING_MOD == 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        signature_bands,
    )

    bands = signature_bands(per_doc, extra_cols=("is_new",))
    # Incoming x corpus only — the batch never self-joins, so candidates
    # are linear in batch size regardless of corpus growth.
    cand = (
        bands.filter("is_new")
        .alias("a")
        .join(
            bands.filter("NOT is_new").alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.sig") == F.col("b.sig")),
        )
        .select(
            F.col("a.doc_id").alias("new_doc"),
            F.col("b.doc_id").alias("corpus_doc"),
        )
        .distinct()
    )
    a = per_doc.select(
        F.col("doc_id").alias("new_doc"),
        F.col("lang").alias("lang_a"),
        F.col("n_sh").alias("n_a"),
        F.col("sh_arr").alias("arr_a"),
    )
    b = per_doc.select(
        F.col("doc_id").alias("corpus_doc"),
        F.col("lang").alias("lang_b"),
        F.col("n_sh").alias("n_b"),
        F.col("sh_arr").alias("arr_b"),
    )
    return (
        cand.join(a, "new_doc")
        .join(b, "corpus_doc")
        .filter(F.col("lang_a") == F.col("lang_b"))
        .withColumn(
            "inter_ct",
            F.size(F.array_intersect("arr_a", "arr_b")).cast("bigint"),
        )
        .withColumn(
            "union_ct", F.col("n_a") + F.col("n_b") - F.col("inter_ct")
        )
        .select(
            "new_doc",
            "corpus_doc",
            "inter_ct",
            "union_ct",
            (2 * F.col("inter_ct") >= F.col("union_ct")).alias("is_dup"),
        )
    )


def _incoming_sql() -> str:
    return f"""
WITH {_SHINGLE_CTE},
{_minhash_tail_cte()},
inc_cand AS (
    SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS corpus_doc
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.sig = b.sig
    WHERE a.doc_id % {INCOMING_MOD} = 0
      AND b.doc_id % {INCOMING_MOD} <> 0
),
doc_stats AS (
    SELECT doc_id, any_value(lang) AS lang,
           CAST(count(*) AS BIGINT) AS n_sh
    FROM sh GROUP BY 1
),
inter AS (
    SELECT c.new_doc, c.corpus_doc, CAST(count(*) AS BIGINT) AS inter_ct
    FROM inc_cand c
    JOIN sh a ON a.doc_id = c.new_doc
    JOIN sh b ON b.doc_id = c.corpus_doc AND b.sh = a.sh
    GROUP BY 1, 2
)
SELECT c.new_doc, c.corpus_doc,
       coalesce(i.inter_ct, 0) AS inter_ct,
       sa.n_sh + sb.n_sh - coalesce(i.inter_ct, 0) AS union_ct,
       2 * coalesce(i.inter_ct, 0)
           >= sa.n_sh + sb.n_sh - coalesce(i.inter_ct, 0) AS is_dup
FROM inc_cand c
JOIN doc_stats sa ON sa.doc_id = c.new_doc
JOIN doc_stats sb ON sb.doc_id = c.corpus_doc
LEFT JOIN inter i
  ON i.new_doc = c.new_doc AND i.corpus_doc = c.corpus_doc
WHERE sa.lang = sb.lang
"""


# ---------------------------------------------------------------------------
# Sketch-vs-exact quantiles.
# ---------------------------------------------------------------------------
BIN_CENTS = 50
PCTS = (50, 90, 99)


def value_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "event_type", "event_id", money_cents("value").alias("cents")
    )
    # Exact order statistic: per-type sort (the expensive truth path). The
    # per-type count rides the SAME exchange as the rank window (unordered
    # whole-partition frame) — no separate counting scan; the tiny
    # percentile explode happens on the <= |targets| candidate rows AFTER
    # the rank filter, never on the fact table.
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    wn = Window.partitionBy("event_type")
    pct_arr = F.array(*[F.lit(p) for p in PCTS])
    ranked = ev.withColumn(
        "rn", F.row_number().over(w).cast("bigint")
    ).withColumn("n", F.count(F.lit(1)).over(wn).cast("bigint"))
    ks = F.expr(
        "transform(array(%s), p -> (p * n + 99) div 100)"
        % ", ".join(str(p) for p in PCTS)
    )
    exact = (
        ranked.filter(F.array_contains(ks, F.col("rn")))
        .select(
            "event_type",
            "cents",
            "rn",
            "n",
            F.explode(pct_arr).alias("pct"),
        )
        .filter(F.expr("rn = (pct * n + 99) div 100"))
        .select("event_type", "pct", F.col("cents").alias("exact_cents"))
    )
    # Histogram sketch: one combine-backed aggregation to ~1000 bins/type;
    # cumulative counts AND the per-type total ride windows over the TINY
    # histogram, and the answer is the first bin whose cumulative count
    # reaches k.
    hist = ev.withColumn("bin", F.expr(f"cents div {BIN_CENTS}")).groupBy(
        "event_type", "bin"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    cum = hist.withColumn(
        "cum",
        F.sum("ct").over(
            Window.partitionBy("event_type")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("n", F.sum("ct").over(Window.partitionBy("event_type")))
    sketch = (
        cum.select(
            "event_type", "bin", "cum", "n", F.explode(pct_arr).alias("pct")
        )
        .filter(F.expr("cum >= (pct * n + 99) div 100"))
        .groupBy("event_type", "pct")
        .agg(
            ((F.min("bin") + 1) * BIN_CENTS).cast("bigint").alias(
                "sketch_upper_cents"
            )
        )
    )
    return exact.join(sketch, ["event_type", "pct"]).select(
        "event_type",
        "pct",
        "exact_cents",
        "sketch_upper_cents",
        (F.col("sketch_upper_cents") - F.col("exact_cents")).alias(
            "err_cents"
        ),
    )


_QUANTILE_SQL = f"""
WITH ev AS (
    SELECT event_type, event_id,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
),
n AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM ev GROUP BY 1
),
targets AS (
    SELECT event_type, n, p.pct, (p.pct * n + 99) // 100 AS k
    FROM n, (VALUES {", ".join(f"({p})" for p in PCTS)}) AS p(pct)
),
ranked AS (
    SELECT event_type, cents,
           CAST(row_number() OVER (PARTITION BY event_type
                                   ORDER BY cents, event_id) AS BIGINT) AS rn
    FROM ev
),
exact AS (
    SELECT r.event_type, t.pct, r.cents AS exact_cents
    FROM ranked r JOIN targets t
      ON r.event_type = t.event_type AND r.rn = t.k
),
hist AS (
    SELECT event_type, cents // {BIN_CENTS} AS bin,
           CAST(count(*) AS BIGINT) AS ct
    FROM ev GROUP BY 1, 2
),
cum AS (
    SELECT event_type, bin,
           sum(ct) OVER (PARTITION BY event_type ORDER BY bin
                         ROWS UNBOUNDED PRECEDING) AS cum
    FROM hist
),
sketch AS (
    SELECT c.event_type, t.pct,
           CAST((min(c.bin) + 1) * {BIN_CENTS} AS BIGINT)
               AS sketch_upper_cents
    FROM cum c JOIN targets t ON c.event_type = t.event_type
    WHERE c.cum >= t.k
    GROUP BY 1, 2
)
SELECT e.event_type, CAST(e.pct AS INTEGER) AS pct, e.exact_cents,
       s.sketch_upper_cents,
       s.sketch_upper_cents - e.exact_cents AS err_cents
FROM exact e
JOIN sketch s ON e.event_type = s.event_type AND e.pct = s.pct
"""


# ---------------------------------------------------------------------------
# Floor-at-zero running balance — the Lindley recursion, declaratively.
#
# B_t = max(0, B_{t-1} + D_t) is prefix-dependent and NOT associative, so
# it looks like it needs a stateful per-row loop (the reference would
# reach for a KeyedProcessFunction). The reflection identity
#     B_t = S_t - min(0, min_{k<=t} S_k)
# turns it into TWO stacked window functions over the same (user, ts)
# ordering — one prefix sum, one running min — so the whole computation
# stays in Spark's window operator: one shuffle on user_id, sort reused
# by both frames, zero Python. Wallet semantics: view/click/signup
# credit `cents`, purchase debits, error is a no-op.
# ---------------------------------------------------------------------------
def running_balance_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        money_cents("value").alias("cents"),
    )
    delta = (
        F.when(F.col("event_type") == "purchase", -F.col("cents"))
        .when(F.col("event_type") == "error", F.lit(0))
        .otherwise(F.col("cents"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_s = ev.withColumn("s", F.sum(delta).over(w))
    balanced = with_s.withColumn(
        "balance_cents",
        F.col("s") - F.least(F.lit(0), F.min("s").over(w)),
    )
    # Per-user summary: final balance + the depth of the worst drawdown
    # (how much floor-clamping absorbed) — both pure integer.
    last = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        balanced.withColumn("rn", F.row_number().over(last))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("balance_cents"))).alias(
                "final_balance_cents"
            ),
            (-F.least(F.lit(0), F.min("s"))).alias("clamped_cents"),
        )
    )


_BALANCE_SQL = """
WITH ev AS (
    SELECT user_id, event_id, ts, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
),
d AS (
    SELECT *, CASE WHEN event_type = 'purchase' THEN -cents
                   WHEN event_type = 'error' THEN 0
                   ELSE cents END AS delta
    FROM ev
),
s AS (
    SELECT user_id, event_id, ts,
           sum(delta) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS s
    FROM d
),
b AS (
    SELECT user_id, event_id, ts, s,
           s - least(0, min(s) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING))
               AS balance_cents
    FROM s
)
SELECT user_id,
       -- CAST: the window sum upstream is HUGEINT in DuckDB and the driver
       -- hash renders it differently from BIGINT (r5 hash-red class).
       CAST(max(CASE WHEN rn = 1 THEN balance_cents END) AS BIGINT)
           AS final_balance_cents,
       CAST(-least(0, min(s)) AS BIGINT) AS clamped_cents
FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM b
)
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# Last-touch attribution: each purchase's revenue is credited to the
# user's most recent view/click within the lookback window, else 'direct'.
# ONE scan, ONE window: purchases and touches ride the same per-user
# ordering and `last(..., ignorenulls)` carries the latest touch forward —
# no purchases×touches as-of self-join.
# ---------------------------------------------------------------------------
ATTR_LOOKBACK_DAYS = 7


def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        money_cents("value").alias("cents"),
    ).filter(F.col("event_type").isin("purchase", "view", "click"))
    is_touch = F.col("event_type").isin("view", "click")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "touch_type", F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w)
    ).withColumn(
        "touch_ts", F.last(F.when(is_touch, F.col("ts")), ignorenulls=True).over(w)
    )
    attributed = flagged.filter(F.col("event_type") == "purchase").withColumn(
        "channel",
        F.when(
            F.col("touch_ts")
            >= F.col("ts") - F.expr(f"interval {ATTR_LOOKBACK_DAYS} days"),
            F.col("touch_type"),
        ).otherwise(F.lit("direct")),
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("cents").alias("revenue_cents"),
    )


_ATTR_SQL = f"""
WITH ev AS (
    SELECT user_id, event_id, ts, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events
    WHERE event_type IN ('purchase', 'view', 'click')
),
flagged AS (
    SELECT *,
           last_value(CASE WHEN event_type IN ('view', 'click')
                           THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_type,
           last_value(CASE WHEN event_type IN ('view', 'click')
                           THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch_ts
    FROM ev
)
SELECT coalesce(CASE WHEN touch_ts >= ts - INTERVAL {ATTR_LOOKBACK_DAYS} DAY
                     THEN touch_type END, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM flagged
WHERE event_type = 'purchase'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Linear (equal-split) attribution with LARGEST-REMAINDER apportionment —
# the exact-integer budget split: each purchase's cents divide equally
# across the user's touches (view/click) in the 7-day lookback, with the
# remainder cents going one each to the EARLIEST touches. Conservation law
# (sum of credited cents == sum of purchase cents) holds exactly and is
# pinned in pytest; no floating-point shares anywhere.
# Floor-division parity: Spark `div` truncates toward zero while DuckDB
# `//` floors, so both sides derive base/rem from an explicitly
# non-negative remainder (rem = ((v % n) + n) % n; base = (v - rem)/n) —
# identical for negative amounts too (refunds).
# Scale: the purchases×touches join is equi-keyed on user with a bounded
# time-range predicate (per-purchase fan-out capped by 7 days of touches);
# the per-purchase window runs over that bounded join, and the final
# combine is on tiny (day, channel) keys.
# ---------------------------------------------------------------------------
APPORTION_LOOKBACK_DAYS = 7


def attribution_linear_apportion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir).filter(F.col("user_id").isNotNull())
    p = ev.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        money_cents("value").alias("v_c"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("tu"),
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("t_channel"),
    )
    j = p.join(
        t,
        (F.col("pu") == F.col("tu"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (
            F.col("t_ts")
            >= F.col("p_ts")
            - F.expr(f"interval {APPORTION_LOOKBACK_DAYS} days")
        ),
        "left",
    )
    wp = Window.partitionBy("p_id")
    wr = wp.orderBy("t_ts", "t_id")
    shared = (
        j.withColumn("n", F.count("t_id").over(wp))
        .withColumn("rn", F.row_number().over(wr))
        .withColumn(
            "rem", F.expr("CASE WHEN n > 0 THEN ((v_c % n) + n) % n END")
        )
        .withColumn(
            "share_c",
            F.expr(
                "CASE WHEN n = 0 THEN v_c "
                "ELSE (v_c - rem) div n"
                " + CASE WHEN rn <= rem THEN 1 ELSE 0 END END"
            ),
        )
    )
    return (
        shared.select(
            F.date_format(
                F.coalesce(F.col("t_ts"), F.col("p_ts")).cast("date"),
                "yyyy-MM-dd",
            ).alias("day"),
            F.coalesce(F.col("t_channel"), F.lit("direct")).alias("channel"),
            "share_c",
        )
        .groupBy("day", "channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_credits"),
            F.sum("share_c").cast("bigint").alias("credited_cents"),
        )
    )


_APPORTION_SQL = f"""
WITH ev AS (
    SELECT user_id, event_id, ts, event_type,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
    FROM events WHERE user_id IS NOT NULL
),
p AS (
    SELECT user_id AS pu, event_id AS p_id, ts AS p_ts, cents AS v_c
    FROM ev WHERE event_type = 'purchase' AND cents IS NOT NULL
),
t AS (
    SELECT user_id AS tu, event_id AS t_id, ts AS t_ts,
           event_type AS t_channel
    FROM ev WHERE event_type IN ('view', 'click')
),
j AS (
    SELECT p.*, t.t_id, t.t_ts, t.t_channel
    FROM p LEFT JOIN t
      ON p.pu = t.tu
     AND t.t_ts < p.p_ts
     AND t.t_ts >= p.p_ts - INTERVAL {APPORTION_LOOKBACK_DAYS} DAY
),
shared AS (
    SELECT *,
           count(t_id) OVER (PARTITION BY p_id) AS n,
           row_number() OVER (PARTITION BY p_id ORDER BY t_ts, t_id) AS rn
    FROM j
),
alloc AS (
    SELECT *,
           CASE WHEN n > 0 THEN ((v_c % n) + n) % n END AS rem
    FROM shared
)
SELECT strftime(CAST(coalesce(t_ts, p_ts) AS DATE), '%Y-%m-%d') AS day,
       coalesce(t_channel, 'direct') AS channel,
       CAST(count(*) AS BIGINT) AS n_credits,
       CAST(sum(CASE WHEN n = 0 THEN v_c
                ELSE (v_c - rem) // n
                     + CASE WHEN rn <= rem THEN 1 ELSE 0 END END)
            AS BIGINT) AS credited_cents
FROM alloc
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Rolling quantiles from MERGED daily histograms — the quantile member of
# the mergeable-summary algebra (KMV showed distinct merges losslessly;
# top-k showed its merge is lossy; histograms sit in between: the merge
# itself is EXACT — bins add — so a 7-day rolling quantile answered from
# daily histograms carries exactly the single-day sketch's bin-width
# error bound, never more). Production keeps only the (day, bin, ct)
# frames (≤ bins rows/day) and answers ANY window by summing them; the
# exact rolling order statistic here is the audit side, and the emitted
# err_cents must sit in (0, BIN_CENTS] — the same deterministic bound
# value_quantile_sketch pins for a single scan.
# Scale: the sketch path never re-touches the fact table (daily combine,
# then a bins-per-window merge); the ×7 row explode is on the EXACT
# audit side only.
# ---------------------------------------------------------------------------
QRM_DAYS = 7


def quantile_rolling_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _events(spark, sf_dir).select(
        F.col("ts").cast("date").alias("d"),
        money_cents("value").alias("cents"),
        "event_id",
    )
    off = F.explode(F.sequence(F.lit(0), F.lit(QRM_DAYS - 1))).alias("off")
    pct_arr = F.array(*[F.lit(p) for p in PCTS])
    rng = base.agg(
        F.min("d").alias("d_min"), F.max("d").alias("d_max")
    )  # 1-row broadcast: only full windows are emitted

    # exact audit side: per-window order statistic over the raw rows
    win_rows = base.select("d", "cents", "event_id", off).select(
        F.expr("date_add(d, off)").alias("w_end"), "cents", "event_id"
    )
    w = Window.partitionBy("w_end").orderBy("cents", "event_id")
    wn = Window.partitionBy("w_end")
    ranked = win_rows.withColumn(
        "rn", F.row_number().over(w).cast("bigint")
    ).withColumn("n", F.count(F.lit(1)).over(wn).cast("bigint"))
    exact = (
        ranked.select(
            "w_end", "cents", "rn", "n", F.explode(pct_arr).alias("pct")
        )
        .filter(F.expr("rn = (pct * n + 99) div 100"))
        .select("w_end", "pct", F.col("cents").alias("exact_cents"))
    )

    # sketch side: daily histograms merged per window (bins add — exact)
    hist = base.withColumn("bin", F.expr(f"cents div {BIN_CENTS}")).groupBy(
        "d", "bin"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    merged = (
        hist.select("d", "bin", "ct", off)
        .select(F.expr("date_add(d, off)").alias("w_end"), "bin", "ct")
        .groupBy("w_end", "bin")
        .agg(F.sum("ct").cast("bigint").alias("ct"))
    )
    cum = merged.withColumn(
        "cum",
        F.sum("ct").over(
            Window.partitionBy("w_end")
            .orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn("n", F.sum("ct").over(Window.partitionBy("w_end")))
    sketch = (
        cum.select("w_end", "bin", "cum", "n", F.explode(pct_arr).alias("pct"))
        .filter(F.expr("cum >= (pct * n + 99) div 100"))
        .groupBy("w_end", "pct")
        .agg(
            ((F.min("bin") + 1) * BIN_CENTS).cast("bigint").alias(
                "sketch_upper_cents"
            )
        )
    )
    return (
        exact.join(sketch, ["w_end", "pct"])
        .crossJoin(F.broadcast(rng))
        .filter(
            (F.col("w_end") >= F.expr(f"date_add(d_min, {QRM_DAYS - 1})"))
            & (F.col("w_end") <= F.col("d_max"))
        )
        .select(
            F.date_format("w_end", "yyyy-MM-dd").alias("w_end"),
            F.col("pct").cast("bigint").alias("pct"),
            "exact_cents",
            "sketch_upper_cents",
            (F.col("sketch_upper_cents") - F.col("exact_cents"))
            .cast("bigint")
            .alias("err_cents"),
        )
    )


_QRM_SQL = f"""
WITH base AS (
    SELECT CAST(ts AS DATE) AS d,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents, event_id
    FROM events
),
offs AS (SELECT unnest(range(0, {QRM_DAYS})) AS off),
rng AS (SELECT min(d) AS d_min, max(d) AS d_max FROM base),
win_rows AS (
    SELECT d + CAST(o.off AS INT) AS w_end, cents, event_id
    FROM base CROSS JOIN offs o
),
ranked AS (
    SELECT w_end, cents,
           CAST(row_number() OVER (PARTITION BY w_end
                                   ORDER BY cents, event_id) AS BIGINT) AS rn,
           CAST(count(*) OVER (PARTITION BY w_end) AS BIGINT) AS n
    FROM win_rows
),
exact AS (
    SELECT w_end, p.pct, cents AS exact_cents
    FROM ranked, (VALUES {", ".join(f"({p})" for p in PCTS)}) AS p(pct)
    WHERE rn = (p.pct * n + 99) // 100
),
hist AS (
    SELECT d, cents // {BIN_CENTS} AS bin, CAST(count(*) AS BIGINT) AS ct
    FROM base GROUP BY 1, 2
),
merged AS (
    SELECT d + CAST(o.off AS INT) AS w_end, bin, CAST(sum(ct) AS BIGINT) AS ct
    FROM hist CROSS JOIN offs o
    GROUP BY 1, 2
),
cum AS (
    SELECT w_end, bin,
           sum(ct) OVER (PARTITION BY w_end ORDER BY bin
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
           sum(ct) OVER (PARTITION BY w_end) AS n
    FROM merged
),
sketch AS (
    SELECT w_end, p.pct,
           CAST((min(bin) + 1) * {BIN_CENTS} AS BIGINT)
               AS sketch_upper_cents
    FROM cum, (VALUES {", ".join(f"({p})" for p in PCTS)}) AS p(pct)
    WHERE cum >= (p.pct * n + 99) // 100
    GROUP BY 1, 2
)
SELECT strftime(e.w_end, '%Y-%m-%d') AS w_end,
       CAST(e.pct AS BIGINT) AS pct, e.exact_cents, s.sketch_upper_cents,
       CAST(s.sketch_upper_cents - e.exact_cents AS BIGINT) AS err_cents
FROM exact e
JOIN sketch s ON e.w_end = s.w_end AND e.pct = s.pct, rng
WHERE e.w_end >= rng.d_min + {QRM_DAYS - 1} AND e.w_end <= rng.d_max
"""


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance — the delta-join rule every
# materialized-view maintainer implements (Blakeley et al. SIGMOD'86;
# the algebra behind Delta Live Tables / Materialize):
#   V = agg(O ⋈ C);  O = Bo ∪ ΔO, C = Bc ∪ ΔC
#   ΔV-terms: agg(Bo⋈Bc) [the stored view] + agg(ΔO⋈Bc) + agg(Bo⋈ΔC)
#             + agg(ΔO⋈ΔC), merged by re-aggregating the PARTIAL
#             aggregates on the view key.
# The Spark side executes the full four-term decomposition (delta slices
# are deterministic key residues standing in for a CDC batch) and merges;
# the oracle computes the direct full-join aggregate — proving the IVM
# algebra reaches the identical view. `n_partials` exposes the merge
# provenance (how many delta terms touched each key), re-derived by the
# oracle from the residue classes. The signed/retraction half of IVM
# lives in `retraction_rollup`; this op is the JOIN-delta half.
#
# Scale shape: at 100 TB only the three delta terms run per refresh (the
# base term IS the stored view); each term is a key-partitioned join
# whose delta side is batch-sized, followed by a combine-backed partial
# aggregate — the merge re-aggregates |view| rows, never re-scans facts.
# ---------------------------------------------------------------------------
IVM_ORDER_MOD = 4  # ΔO: o_orderkey % 4 == 0 (one CDC batch of orders)
IVM_CUST_MOD = 5  # ΔC: c_custkey % 5 == 0 (one CDC batch of customers)


def incremental_join_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    apply_runtime_confs(spark)
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isNotNull())
        .select(
            "o_orderkey",
            "o_custkey",
            money_cents("o_totalprice").alias("cents"),
        )
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    bo = o.filter(f"o_orderkey % {IVM_ORDER_MOD} != 0")
    d_o = o.filter(f"o_orderkey % {IVM_ORDER_MOD} = 0")
    bc = c.filter(f"c_custkey % {IVM_CUST_MOD} != 0")
    d_c = c.filter(f"c_custkey % {IVM_CUST_MOD} = 0")

    def term(os_, cs_):
        return (
            os_.join(cs_, os_["o_custkey"] == cs_["c_custkey"])
            .groupBy("c_nationkey")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.sum("cents").cast("bigint").alias("total_cents"),
            )
        )

    parts = (
        term(bo, bc)
        .unionByName(term(d_o, bc))
        .unionByName(term(bo, d_c))
        .unionByName(term(d_o, d_c))
    )
    return parts.groupBy("c_nationkey").agg(
        F.sum("n_orders").cast("bigint").alias("n_orders"),
        F.sum("total_cents").cast("bigint").alias("total_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_partials"),
    )


_IVM_SQL = f"""
WITH joined AS (
    SELECT c.c_nationkey,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
           (CASE WHEN o.o_orderkey % {IVM_ORDER_MOD} = 0 THEN 2 ELSE 0 END
            + CASE WHEN c.c_custkey % {IVM_CUST_MOD} = 0 THEN 1 ELSE 0 END)
               AS term_id
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_custkey IS NOT NULL
)
SELECT c_nationkey,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS total_cents,
       CAST(count(DISTINCT term_id) AS BIGINT) AS n_partials
FROM joined
GROUP BY 1
"""


QUERIES = {
    "snapshot_diff_user_state": snapshot_diff_user_state,
    "incremental_join_maintenance": incremental_join_maintenance,
    "running_balance_floor": running_balance_floor,
    "attribution_last_touch": attribution_last_touch,
    "attribution_linear_apportion": attribution_linear_apportion,
    "dedup_incoming_batch": dedup_incoming_batch,
    "value_quantile_sketch": value_quantile_sketch,
    "quantile_rolling_merge": quantile_rolling_merge,
}

ORACLE = {
    "snapshot_diff_user_state": _SNAP_SQL,
    "incremental_join_maintenance": _IVM_SQL,
    "running_balance_floor": _BALANCE_SQL,
    "attribution_last_touch": _ATTR_SQL,
    "attribution_linear_apportion": _APPORTION_SQL,
    "dedup_incoming_batch": _incoming_sql(),
    "value_quantile_sketch": _QUANTILE_SQL,
    "quantile_rolling_merge": _QRM_SQL,
}
