"""Mergeable-sketch, index-structure, and planner-support operators: the
summaries and statistics a 100 TB deployment keeps INSTEAD of raw data,
each audited against its own exact ground truth on the same scan.

The family grew across round-6 waves; the full set hosted here:
distinct (KMV daily + rolling-union merge + theta INTERSECTION),
membership (Bloom pre-filter), point frequency (count-min), the one
UNSAFE merge (top-k lists, recall-audited), plus the planner-support
audits those summaries feed: shuffle-skew strategy verdicts, per-key
join-cardinality estimation (uniform + end-biased histogram),
join-ORDER recommendation graded against exact intermediate sizes,
min-max file-skipping under two layouts, the positional phrase index,
and the watermark-lateness drop curve behind a withWatermark choice.
Per-operator designs follow; scale notes at the end of this docstring
and inline per operator.

- `kmv_distinct_daily` — K-minimum-values distinct sketch (Bar-Yossef et
  al., RANDOM'02; the theta-sketch core): per-day distinct users estimated
  from the K smallest 60-bit hashes, next to the exact count and the error
  in ppm. The per-day top-K compiles to WindowGroupLimit, which is exactly
  the sketch's partial aggregate: each input partition contributes at most
  K rows to the shuffle.
- `kmv_rolling_distinct` — the MERGE property, the reason sketches win at
  scale: 7-day rolling distinct users computed by unioning the seven daily
  K-min sets and re-taking the K smallest (valid because the K smallest of
  a union are contained in the union of per-set K smallest), vs the exact
  rolling distinct. Production keeps only the daily sketches (K rows/day)
  and answers any window by merging; the exact side here is the audit.
- `bloom_prefilter_audit` — a deterministic Bloom filter (m bits, 4 md5
  hash functions) built over the eval/benchmark shingle set and probed by
  the corpus: measured false-positive rate and the fraction of the corpus
  the pre-screen excuses from the expensive exact decontamination join.
  This is the runtime-filter pattern (Spark's own InjectRuntimeFilter /
  bloom_filter_agg) made explicit and auditable.
- `shuffle_skew_audit` — per candidate shuffle key (user_id, event_type,
  day): cardinality, max key frequency, top-1 share, hot-key count, and
  the strategy verdict (broadcast / salt / plain hash) the engine's own
  salted-join and broadcast paths key on. The planning artifact behind
  `skewed_salted_revenue`.
- `phrase_search_positional` — positional inverted index: token postings
  with in-document positions, phrase queries answered by anchor alignment
  (token at position p matching phrase slot j votes for anchor p-j; an
  anchor with all slots voting is an occurrence). The exact-phrase
  machinery BM25's bag-of-words ranking cannot express.

Scale notes:
- KMV: the only data-sized work is the distinct (day, h) combine; the
  rank<=K filter is WindowGroupLimit (partial top-K before the final
  per-day sort of at most K·partitions rows). Rolling merge touches K
  rows per day per window — constant, never re-scans the fact table.
- Bloom: the bit table is at most M_BITS rows, broadcast; the probe is
  one broadcast join over the corpus scan. The audited payoff is
  `excused_ppm`: at a realistic fill ratio the screen removes ~99.9% of
  the corpus from the exact join's shuffle.
- Skew audit: per-key frames are combine-backed aggregates; the per-key
  frame is persisted and reduced twice (once for totals, once for the
  hot-key count against the broadcast 1-row totals) — two passes over an
  aggregate, zero passes over the fact table beyond the first.
- Phrase search: the postings frame is pruned to QUERY tokens by a
  broadcast join before anything shuffles — matched volume, not corpus
  volume, reaches the anchor aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.plans.llm_ops import (
    _SHINGLE_CTE,
    _doc_shingles,
    _docs,
)
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table

KMV_K = 8  # sketch size; estimation active even at sf0.001 (>=11 users/day)
HASH_MOD = 1 << 60  # md5 60-bit hash domain, the repo-wide idiom

EVAL_MOD = 97  # same eval-membership convention as corpus_ops.decontaminate
M_BITS = 4096  # Bloom bit-array size
K_HASH = 4  # Bloom hash functions

SKEW_HOT_FACTOR = 10  # a key is hot if its rows exceed 10x the mean
SKEW_BROADCAST_KEYS = 256  # dimension-sized domains: broadcast, never salt
SKEW_SALT_TOP1_PPM = 50_000  # top key owning >5% of rows triggers salting

PHRASES = (
    "table part",
    "data query",
    "small query line",
    "join part filter",
)
PHRASE_TOP_DOCS = 5


def _t(spark, sf_dir, name):
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, name)


def _h60(col):
    """60-bit integer hash, identical on both engines."""
    return F.expr(
        f"CAST(conv(substring(md5(CAST({col} AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT)"
    )


_H60_DUCK = "TRY_CAST('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 15) AS BIGINT)"


# ---------------------------------------------------------------------------
# KMV daily distinct. est = (K-1) * 2^60 / h_K when the sketch is full,
# else the sketch holds every distinct hash and IS the exact count.
# (K-1)*2^60 ~ 8e18·K overflows int64, so the numerator rides DECIMAL(38,0)
# internally; the estimate itself is a count and fits BIGINT.
# ---------------------------------------------------------------------------
def _daily_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return (
        ev.select(F.col("ts").cast("date").alias("d"), _h60("user_id").alias("h"))
        .distinct()
    )


def _kmv_estimate(kth_col: str, n_col: str) -> F.Column:
    return F.expr(
        f"CAST(CASE WHEN {n_col} < {KMV_K} THEN {n_col}"
        f" ELSE CAST({KMV_K - 1} AS DECIMAL(38,0)) * {HASH_MOD} div {kth_col}"
        " END AS BIGINT)"
    )


def kmv_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    dh = _daily_hashes(spark, sf_dir)
    w = Window.partitionBy("d").orderBy("h")
    # rank<=K compiles to WindowGroupLimit: each scan partition forwards at
    # most K rows per day — the sketch's partial aggregate, optimizer-made.
    sketch = (
        dh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("d")
        .agg(
            F.max("h").alias("h_k"),
            F.count(F.lit(1)).cast("bigint").alias("n_in"),
        )
    )
    exact = dh.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("exact_users"))
    est = sketch.join(exact, "d").select(
        "d",
        "exact_users",
        _kmv_estimate("h_k", "n_in").alias("kmv_users"),
    )
    # day rendered as a string: temporal top-level columns stringify
    # differently between the engines under the driver's value-hash
    # (the r3 divergence class) — same convention as anomaly_zscore_daily.
    return est.select(
        F.date_format("d", "yyyy-MM-dd").alias("d"),
        "exact_users",
        "kmv_users",
        F.expr(
            "CAST(abs(kmv_users - exact_users) * 1000000 div exact_users"
            " AS BIGINT)"
        ).alias("err_ppm"),
    )


_KMV_DAILY_SQL = f"""
WITH dh AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d,
           {_H60_DUCK.format(col="user_id")} AS h
    FROM events WHERE user_id IS NOT NULL
),
ranked AS (
    SELECT d, h, row_number() OVER (PARTITION BY d ORDER BY h) AS rn
    FROM dh
),
sketch AS (
    SELECT d, max(h) AS h_k, CAST(count(*) AS BIGINT) AS n_in
    FROM ranked WHERE rn <= {KMV_K} GROUP BY 1
),
exact AS (
    SELECT d, CAST(count(*) AS BIGINT) AS exact_users FROM dh GROUP BY 1
),
est AS (
    SELECT s.d, e.exact_users,
           CAST(CASE WHEN s.n_in < {KMV_K} THEN s.n_in
                ELSE CAST({KMV_K - 1} AS HUGEINT) * {HASH_MOD} // s.h_k
                END AS BIGINT) AS kmv_users
    FROM sketch s JOIN exact e USING (d)
)
SELECT strftime(d, '%Y-%m-%d') AS d, exact_users, kmv_users,
       CAST(abs(kmv_users - exact_users) * 1000000 // exact_users AS BIGINT)
           AS err_ppm
FROM est
"""


# ---------------------------------------------------------------------------
# KMV rolling merge: 7-day windows answered from the daily K-min sets.
# Merge validity: the K smallest hashes of a union of sets are a subset of
# the union of each set's K smallest — so merging sketches loses nothing.
# Only windows fully inside the corpus date range are emitted (a partial
# leading window would compare a 3-day union against a 3-day exact, true
# but uninteresting).
# ---------------------------------------------------------------------------
ROLL_DAYS = 7


def kmv_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    dh = _daily_hashes(spark, sf_dir)  # no persist (r10 A/B: ReusedExchange)
    wd = Window.partitionBy("d").orderBy("h")
    daily_sketch = (
        dh.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= KMV_K)
        .select("d", "h")
    )
    off = F.explode(F.sequence(F.lit(0), F.lit(ROLL_DAYS - 1))).alias("off")
    # sketch path: merge = union the 7 daily K-sets, re-take the K smallest
    merged = (
        daily_sketch.select("d", "h", off)
        .select(F.expr("date_add(d, off)").alias("w_end"), "h")
        .distinct()
    )
    ww = Window.partitionBy("w_end").orderBy("h")
    sk = (
        merged.withColumn("rn", F.row_number().over(ww))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("w_end")
        .agg(
            F.max("h").alias("h_k"),
            F.count(F.lit(1)).cast("bigint").alias("n_in"),
        )
    )
    # exact path (the audit): full rolling distinct from the daily frame
    exact = (
        dh.select("d", "h", off)
        .select(F.expr("date_add(d, off)").alias("w_end"), "h")
        .distinct()
        .groupBy("w_end")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_users_7d"))
    )
    rng = dh.agg(
        F.min("d").alias("d_min"), F.max("d").alias("d_max")
    )  # 1-row broadcast
    out = (
        sk.join(exact, "w_end")
        .crossJoin(F.broadcast(rng))
        .filter(
            (F.col("w_end") >= F.expr(f"date_add(d_min, {ROLL_DAYS - 1})"))
            & (F.col("w_end") <= F.col("d_max"))
        )
        .select(
            "w_end",
            "exact_users_7d",
            _kmv_estimate("h_k", "n_in").alias("kmv_users_7d"),
        )
    )
    return out.select(
        F.date_format("w_end", "yyyy-MM-dd").alias("w_end"),
        "exact_users_7d",
        "kmv_users_7d",
        F.expr(
            "CAST(abs(kmv_users_7d - exact_users_7d) * 1000000"
            " div exact_users_7d AS BIGINT)"
        ).alias("err_ppm"),
    )


_KMV_ROLLING_SQL = f"""
WITH dh AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d,
           {_H60_DUCK.format(col="user_id")} AS h
    FROM events WHERE user_id IS NOT NULL
),
daily_sketch AS (
    SELECT d, h FROM (
        SELECT d, h, row_number() OVER (PARTITION BY d ORDER BY h) AS rn
        FROM dh
    ) WHERE rn <= {KMV_K}
),
offs AS (SELECT unnest(range(0, {ROLL_DAYS})) AS off),
merged AS (
    SELECT DISTINCT s.d + CAST(o.off AS INT) AS w_end, s.h
    FROM daily_sketch s CROSS JOIN offs o
),
sk AS (
    SELECT w_end, max(h) AS h_k, CAST(count(*) AS BIGINT) AS n_in
    FROM (
        SELECT w_end, h,
               row_number() OVER (PARTITION BY w_end ORDER BY h) AS rn
        FROM merged
    ) WHERE rn <= {KMV_K} GROUP BY 1
),
exact AS (
    SELECT w_end, CAST(count(*) AS BIGINT) AS exact_users_7d
    FROM (
        SELECT DISTINCT d + CAST(o.off AS INT) AS w_end, h
        FROM dh CROSS JOIN offs o
    ) GROUP BY 1
),
rng AS (SELECT min(d) AS d_min, max(d) AS d_max FROM dh),
est AS (
    SELECT s.w_end, e.exact_users_7d,
           CAST(CASE WHEN s.n_in < {KMV_K} THEN s.n_in
                ELSE CAST({KMV_K - 1} AS HUGEINT) * {HASH_MOD} // s.h_k
                END AS BIGINT) AS kmv_users_7d
    FROM sk s JOIN exact e USING (w_end), rng
    WHERE s.w_end >= rng.d_min + {ROLL_DAYS - 1} AND s.w_end <= rng.d_max
)
SELECT strftime(w_end, '%Y-%m-%d') AS w_end, exact_users_7d, kmv_users_7d,
       CAST(abs(kmv_users_7d - exact_users_7d) * 1000000 // exact_users_7d
            AS BIGINT) AS err_ppm
FROM est
"""


# ---------------------------------------------------------------------------
# HyperLogLog rolling union — the third mergeable distinct sketch beside
# KMV (`kmv_rolling_distinct`) and Spark's builtin HLL++
# (`approx_daily_users`), implemented from scratch so its REGISTER-level
# merge is visible to the oracle: a 7-day union is per-register max over
# the daily register maxima — constant 64-register state per window,
# versus KMV's K-set re-merge. That is the summary a 100 TB deployment
# ships between clusters (registers are trivially re-shardable; the
# merge is commutative/associative/idempotent).
#
# Exact-integer doctrine: the register RANK needs leading-zero counting,
# which both engines expose exactly as `length(bin(x))` (no float log2);
# the harmonic mean sum(2^-M_j) is computed scaled by 2^55 so every term
# is a BIGINT shift, and the alpha bias constant rides in micro-units.
# No small-range linear-counting correction on purpose (it needs ln):
# `occupied_regs` reports the regime, and err_ppm stays honest where a
# production sketch would switch to linear counting (n < 2.5m).
# ---------------------------------------------------------------------------
HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers
_HLL_REST_BITS = 60 - HLL_P  # 54
_HLL_POW_REST = 1 << _HLL_REST_BITS  # 2^54
_HLL_RANK_MAX = _HLL_REST_BITS + 1  # 55
_HLL_SCALE = 1 << _HLL_RANK_MAX  # 2^55 — the harmonic-sum scaling
# alpha_64 = 0.7213 / (1 + 1.079/64), pinned in micro-units so both
# engines use the identical rational constant
HLL_ALPHA_MICRO = 709_341


def hll_union_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    dh = _daily_hashes(spark, sf_dir)  # no persist (r10 A/B: ReusedExchange)
    # daily register maxima: (d, reg) -> max rank
    daily_reg = (
        dh.select(
            "d",
            F.expr(f"h div {_HLL_POW_REST}").alias("reg"),
            F.expr(
                f"CASE WHEN h % {_HLL_POW_REST} = 0 THEN {_HLL_RANK_MAX} "
                f"ELSE {_HLL_RANK_MAX} - length(bin(h % {_HLL_POW_REST})) "
                f"END"
            ).alias("rank"),
        )
        .groupBy("d", "reg")
        .agg(F.max("rank").alias("m_day"))
    )
    off = F.explode(F.sequence(F.lit(0), F.lit(ROLL_DAYS - 1))).alias("off")
    # register-level union across the window: max over the daily maxima
    win_reg = (
        daily_reg.select("d", "reg", "m_day", off)
        .select(F.expr("date_add(d, off)").alias("w_end"), "reg", "m_day")
        .groupBy("w_end", "reg")
        .agg(F.max("m_day").alias("m"))
    )
    sk = win_reg.groupBy("w_end").agg(
        F.count(F.lit(1)).cast("bigint").alias("occupied_regs"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_RANK_MAX} - m)")
        )
        .cast("bigint")
        .alias("s_occ"),
    )
    exact = (
        dh.select("d", "h", off)
        .select(F.expr("date_add(d, off)").alias("w_end"), "h")
        .distinct()
        .groupBy("w_end")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_users_7d"))
    )
    rng = dh.agg(F.min("d").alias("d_min"), F.max("d").alias("d_max"))
    out = (
        sk.join(exact, "w_end")
        .crossJoin(F.broadcast(rng))
        .filter(
            (F.col("w_end") >= F.expr(f"date_add(d_min, {ROLL_DAYS - 1})"))
            & (F.col("w_end") <= F.col("d_max"))
        )
        .withColumn(
            "s_total",
            F.expr(
                f"s_occ + ({HLL_M} - occupied_regs)"
                f" * CAST({_HLL_SCALE} AS BIGINT)"
            ),
        )
        .withColumn(
            "hll_users_7d",
            F.expr(
                f"CAST(CAST({HLL_ALPHA_MICRO} AS DECIMAL(38,0))"
                f" * {HLL_M} * {HLL_M} * {_HLL_SCALE}"
                f" div (CAST(s_total AS DECIMAL(38,0)) * 1000000)"
                f" AS BIGINT)"
            ),
        )
    )
    return out.select(
        F.date_format("w_end", "yyyy-MM-dd").alias("w_end"),
        "exact_users_7d",
        "hll_users_7d",
        F.expr(
            "CAST(abs(hll_users_7d - exact_users_7d) * 1000000"
            " div exact_users_7d AS BIGINT)"
        ).alias("err_ppm"),
        "occupied_regs",
    )


_HLL_ROLLING_SQL = f"""
WITH dh AS (
    SELECT DISTINCT CAST(ts AS DATE) AS d,
           {_H60_DUCK.format(col="user_id")} AS h
    FROM events WHERE user_id IS NOT NULL
),
daily_reg AS (
    SELECT d, h // {_HLL_POW_REST} AS reg,
           max(CASE WHEN h % {_HLL_POW_REST} = 0 THEN {_HLL_RANK_MAX}
               ELSE {_HLL_RANK_MAX} - length(bin(h % {_HLL_POW_REST}))
               END) AS m_day
    FROM dh GROUP BY 1, 2
),
offs AS (SELECT unnest(range(0, {ROLL_DAYS})) AS off),
win_reg AS (
    SELECT d + CAST(o.off AS INT) AS w_end, reg, max(m_day) AS m
    FROM daily_reg CROSS JOIN offs o
    GROUP BY 1, 2
),
sk AS (
    SELECT w_end, CAST(count(*) AS BIGINT) AS occupied_regs,
           CAST(sum(CAST(1 AS BIGINT) << ({_HLL_RANK_MAX} - m)) AS BIGINT)
               AS s_occ
    FROM win_reg GROUP BY 1
),
exact AS (
    SELECT w_end, CAST(count(*) AS BIGINT) AS exact_users_7d
    FROM (
        SELECT DISTINCT d + CAST(o.off AS INT) AS w_end, h
        FROM dh CROSS JOIN offs o
    ) GROUP BY 1
),
rng AS (SELECT min(d) AS d_min, max(d) AS d_max FROM dh),
est AS (
    SELECT s.w_end, e.exact_users_7d, s.occupied_regs,
           s.s_occ + ({HLL_M} - s.occupied_regs)
               * CAST({_HLL_SCALE} AS BIGINT) AS s_total
    FROM sk s JOIN exact e USING (w_end), rng
    WHERE s.w_end >= rng.d_min + {ROLL_DAYS - 1} AND s.w_end <= rng.d_max
),
fin AS (
    SELECT w_end, exact_users_7d,
           CAST(CAST({HLL_ALPHA_MICRO} AS HUGEINT)
                * {HLL_M} * {HLL_M} * {_HLL_SCALE}
                // (CAST(s_total AS HUGEINT) * 1000000) AS BIGINT)
               AS hll_users_7d,
           occupied_regs
    FROM est
)
SELECT strftime(w_end, '%Y-%m-%d') AS w_end, exact_users_7d, hll_users_7d,
       CAST(abs(hll_users_7d - exact_users_7d) * 1000000 // exact_users_7d
            AS BIGINT) AS err_ppm,
       occupied_regs
FROM fin
"""


# ---------------------------------------------------------------------------
# Bloom pre-filter audit. Bits set by the eval shingle set; the corpus
# probes. A shingle is a candidate only if all K_HASH positions are set —
# candidates (true + false positives) proceed to the exact decontamination
# join, everything else is excused. The audit measures the realized FPR
# and the excused fraction; `fill_ppm` is the bit-density the theoretical
# FPR (fill^k) keys on, so an operator can alarm when the filter is
# over-full for its eval-set size.
# ---------------------------------------------------------------------------
def bloom_prefilter_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = _doc_shingles(spark, sf_dir)
    eval_sh = (
        sh.filter(F.col("doc_id") % EVAL_MOD == 0).select("sh").distinct()
    )
    probe = (
        sh.filter(F.col("doc_id") % EVAL_MOD != 0).select("sh").distinct()
    )  # no persist (r10 A/B: 1.75 s without vs 2.58 s with — ReusedExchange)
    ks = F.explode(F.sequence(F.lit(1), F.lit(K_HASH))).alias("i")
    pos_expr = F.expr(
        "CAST(conv(substring(md5(concat(CAST(i AS STRING), ':', sh)), 1, 15),"
        f" 16, 10) AS BIGINT) % {M_BITS}"
    )
    bits = (
        eval_sh.select("sh", ks)
        .select(pos_expr.alias("pos"))
        .distinct()
        .withColumn("bit", F.lit(1))
    )
    probed = (
        probe.select("sh", ks)
        .select("sh", pos_expr.alias("pos"))
        .join(F.broadcast(bits), "pos", "left")
        .groupBy("sh")
        .agg(F.coalesce(F.sum("bit"), F.lit(0)).alias("hits"))
        .withColumn("bloom_hit", (F.col("hits") == K_HASH).cast("int"))
    )
    truth = probed.join(
        F.broadcast(eval_sh.withColumn("is_eval", F.lit(1))), "sh", "left"
    ).select(
        "bloom_hit", F.coalesce(F.col("is_eval"), F.lit(0)).alias("is_eval")
    )
    n_bits = bits.agg(F.count(F.lit(1)).alias("bits_set"))
    agg = truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("probes"),
        F.sum("bloom_hit").cast("bigint").alias("candidates"),
        F.sum(F.expr("bloom_hit * is_eval")).cast("bigint").alias("true_pos"),
        F.sum(F.expr("bloom_hit * (1 - is_eval)"))
        .cast("bigint")
        .alias("false_pos"),
        F.sum(F.expr("(1 - bloom_hit) * is_eval"))
        .cast("bigint")
        .alias("false_neg"),
        F.sum("is_eval").cast("bigint").alias("truth_pos"),
    )
    return agg.crossJoin(F.broadcast(n_bits)).select(
        "probes",
        "candidates",
        "true_pos",
        "false_pos",
        "false_neg",  # MUST be 0: Bloom filters have no false negatives
        F.expr(
            "CAST(false_pos * 1000000 div nullif(probes - truth_pos, 0)"
            " AS BIGINT)"
        ).alias("fpr_ppm"),
        F.expr(
            "CAST((probes - candidates) * 1000000 div probes AS BIGINT)"
        ).alias("excused_ppm"),
        F.expr(f"CAST(bits_set * 1000000 div {M_BITS} AS BIGINT)").alias(
            "fill_ppm"
        ),
    )


_BLOOM_SQL = f"""
WITH {_SHINGLE_CTE},
eval_sh AS (
    SELECT DISTINCT sh FROM sh WHERE doc_id % {EVAL_MOD} = 0
),
probe AS (
    SELECT DISTINCT sh FROM sh WHERE doc_id % {EVAL_MOD} <> 0
),
ks AS (SELECT unnest(range(1, {K_HASH} + 1)) AS i),
bits AS (
    SELECT DISTINCT
           TRY_CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || sh), 1, 15)
                    AS BIGINT) % {M_BITS} AS pos
    FROM eval_sh CROSS JOIN ks
),
probed AS (
    SELECT p.sh, count(b.pos) AS hits
    FROM (
        SELECT sh,
               TRY_CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || sh),
                        1, 15) AS BIGINT) % {M_BITS} AS pos
        FROM probe CROSS JOIN ks
    ) p LEFT JOIN bits b USING (pos)
    GROUP BY 1
),
truth AS (
    SELECT CASE WHEN pr.hits = {K_HASH} THEN 1 ELSE 0 END AS bloom_hit,
           CASE WHEN e.sh IS NULL THEN 0 ELSE 1 END AS is_eval
    FROM probed pr LEFT JOIN eval_sh e USING (sh)
),
agg AS (
    SELECT CAST(count(*) AS BIGINT) AS probes,
           CAST(sum(bloom_hit) AS BIGINT) AS candidates,
           CAST(sum(bloom_hit * is_eval) AS BIGINT) AS true_pos,
           CAST(sum(bloom_hit * (1 - is_eval)) AS BIGINT) AS false_pos,
           CAST(sum((1 - bloom_hit) * is_eval) AS BIGINT) AS false_neg,
           CAST(sum(is_eval) AS BIGINT) AS truth_pos
    FROM truth
),
nb AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM bits)
SELECT probes, candidates, true_pos, false_pos, false_neg,
       CAST(false_pos * 1000000 // nullif(probes - truth_pos, 0) AS BIGINT)
           AS fpr_ppm,
       CAST((probes - candidates) * 1000000 // probes AS BIGINT)
           AS excused_ppm,
       CAST(bits_set * 1000000 // {M_BITS} AS BIGINT) AS fill_ppm
FROM agg, nb
"""


# ---------------------------------------------------------------------------
# Shuffle-key skew audit: the measurement the salted-join / broadcast
# decisions key on, emitted as one row per candidate key column.
# ---------------------------------------------------------------------------
def _key_stats(kc: DataFrame, col_name: str) -> DataFrame:
    tot = kc.agg(
        F.count(F.lit(1)).cast("bigint").alias("distinct_keys"),
        F.sum("cnt").cast("bigint").alias("n_rows"),
        F.max("cnt").cast("bigint").alias("max_key_rows"),
    )
    hot = (
        kc.crossJoin(F.broadcast(tot))
        .agg(
            F.first("distinct_keys").alias("distinct_keys"),
            F.first("n_rows").alias("n_rows"),
            F.first("max_key_rows").alias("max_key_rows"),
            F.sum(
                F.expr(
                    f"CASE WHEN cnt * distinct_keys > {SKEW_HOT_FACTOR} * n_rows"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("hot_key_ct"),
        )
    )
    # Empty/all-NULL key domain: the global agg still emits one row (all
    # stats NULL) while the oracle's GROUP BY over the empty frame emits
    # zero — drop the degenerate row so both sides agree (ADVICE r6).
    hot = hot.filter(F.col("n_rows").isNotNull())
    return hot.select(
        F.lit(col_name).alias("key_col"),
        "n_rows",
        "distinct_keys",
        "max_key_rows",
        F.expr("CAST(max_key_rows * 1000000 div n_rows AS BIGINT)").alias(
            "top1_share_ppm"
        ),
        "hot_key_ct",
        F.expr(
            f"CASE WHEN distinct_keys <= {SKEW_BROADCAST_KEYS} THEN 'broadcast'"
            f" WHEN max_key_rows * 1000000 div n_rows > {SKEW_SALT_TOP1_PPM}"
            " THEN 'salt' ELSE 'hash' END"
        ).alias("strategy"),
    )


def shuffle_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    parts = []
    for col_name, expr in (
        ("user_id", "CAST(user_id AS STRING)"),
        ("event_type", "event_type"),
        ("day", "CAST(CAST(ts AS DATE) AS STRING)"),
    ):
        kc = (
            ev.filter(F.expr(f"{expr} IS NOT NULL"))
            .groupBy(F.expr(expr).alias("k"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        parts.append(_key_stats(kc, col_name))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_SKEW_COLS = (
    ("user_id", "CAST(user_id AS VARCHAR)"),
    ("event_type", "event_type"),
    ("day", "CAST(CAST(ts AS DATE) AS VARCHAR)"),
)

_SKEW_SQL = (
    "WITH "
    + ", ".join(
        f"""kc_{name} AS (
    SELECT {expr} AS k, count(*) AS cnt
    FROM events WHERE {expr} IS NOT NULL GROUP BY 1
),
st_{name} AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS distinct_keys,
           CAST(max(cnt) AS BIGINT) AS max_key_rows
    FROM kc_{name}
),
row_{name} AS (
    SELECT '{name}' AS key_col, s.n_rows, s.distinct_keys, s.max_key_rows,
           CAST(sum(CASE WHEN k.cnt * s.distinct_keys
                         > {SKEW_HOT_FACTOR} * s.n_rows
                    THEN 1 ELSE 0 END) AS BIGINT) AS hot_key_ct
    FROM kc_{name} k, st_{name} s
    GROUP BY 1, 2, 3, 4
)"""
        for name, expr in _SKEW_COLS
    )
    + "\n, stats AS ("
    + " UNION ALL ".join(f"SELECT * FROM row_{name}" for name, _ in _SKEW_COLS)
    + f""")
SELECT key_col, n_rows, distinct_keys, max_key_rows,
       CAST(max_key_rows * 1000000 // n_rows AS BIGINT) AS top1_share_ppm,
       hot_key_ct,
       CASE WHEN distinct_keys <= {SKEW_BROADCAST_KEYS} THEN 'broadcast'
            WHEN max_key_rows * 1000000 // n_rows > {SKEW_SALT_TOP1_PPM}
            THEN 'salt' ELSE 'hash' END AS strategy
FROM stats
"""
)


# ---------------------------------------------------------------------------
# Positional phrase search. Anchor alignment: a posting (doc, pos, tok)
# matching phrase slot j votes for anchor pos - j; an anchor collecting a
# vote from EVERY slot is one exact occurrence of the phrase.
# ---------------------------------------------------------------------------
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    postings = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(F.split("text", " "), lambda x: x != "")
        ).alias("pos", "tok"),
    )
    qtok = (
        spark.range(1)
        .select(
            F.explode(F.array(*[F.lit(p) for p in PHRASES])).alias("phrase")
        )
        .select(
            "phrase",
            F.size(F.split("phrase", " ")).alias("plen"),
            F.posexplode(F.split("phrase", " ")).alias("j", "qt"),
        )
    )
    # broadcast the handful of query tokens: postings are pruned to query
    # vocabulary before any shuffle.
    matched = postings.join(
        F.broadcast(qtok), postings["tok"] == qtok["qt"]
    ).select(
        "phrase", "plen", "doc_id", (F.col("pos") - F.col("j")).alias("anchor"), "j"
    )
    occ = (
        matched.groupBy("phrase", "plen", "doc_id", "anchor")
        .agg(F.countDistinct("j").alias("slots"))
        .filter(F.col("slots") == F.col("plen"))
        .groupBy("phrase", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("occurrences"))
    )
    w = Window.partitionBy("phrase").orderBy(
        F.col("occurrences").desc(), F.col("doc_id")
    )
    return (
        occ.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= PHRASE_TOP_DOCS)
        .select(
            "phrase",
            "doc_id",
            "occurrences",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


_PHRASE_VALUES = ", ".join(f"('{p}')" for p in PHRASES)

_PHRASE_SQL = f"""
WITH q AS (SELECT phrase FROM (VALUES {_PHRASE_VALUES}) v(phrase)),
qtok AS (
    SELECT phrase, len(qt) AS plen, j, qt[j] AS tok
    FROM (SELECT phrase, string_split(phrase, ' ') AS qt FROM q),
         UNNEST(range(1, len(qt) + 1)) AS u(j)
),
tok AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
postings AS (
    SELECT doc_id, i AS pos, t[i] AS tok
    FROM tok, UNNEST(range(1, len(t) + 1)) AS u(i)
),
matched AS (
    SELECT qt.phrase, qt.plen, p.doc_id, p.pos - qt.j AS anchor, qt.j
    FROM postings p JOIN qtok qt USING (tok)
),
occ AS (
    SELECT phrase, doc_id, CAST(count(*) AS BIGINT) AS occurrences
    FROM (
        SELECT phrase, plen, doc_id, anchor,
               count(DISTINCT j) AS slots
        FROM matched GROUP BY 1, 2, 3, 4
    ) WHERE slots = plen
    GROUP BY 1, 2
)
SELECT phrase, doc_id, occurrences, CAST(rnk AS BIGINT) AS rnk
FROM (
    SELECT phrase, doc_id, occurrences,
           row_number() OVER (PARTITION BY phrase
                              ORDER BY occurrences DESC, doc_id) AS rnk
    FROM occ
) WHERE rnk <= {PHRASE_TOP_DOCS}
"""


# ---------------------------------------------------------------------------
# Join-cardinality estimation audit — the planning decision BEFORE the
# skew audit's strategy verdict: how many rows will this join produce?
# For each audited (A.key = B.key) pair, three numbers from per-side key
# histograms only (what a real optimizer keeps in table stats; the raw
# join is never materialized):
#   exact      — sum over matched keys of cnt_a * cnt_b, computed from the
#                two per-key count frames (a keyed aggregate join: the
#                only shuffle is on the key, volume = key domains).
#   est_uniform— the System-R containment formula
#                rows_a * rows_b / max(ndv_a, ndv_b).
#   est_hh     — an end-biased histogram (Ioannidis & Poosala, SIGMOD'95):
#                the top-H heaviest keys per side kept exactly (their
#                cross products summed where both sides agree), the
#                residual mass estimated uniformly. This is what rescues
#                the estimate on skewed keys, measured against the same
#                exact truth.
# Wide arithmetic rides DECIMAL(38,0)/HUGEINT internally (rows_a * rows_b
# overflows int64 at real scale — the market_basket_lift idiom); outputs
# are BIGINT per the output-type contract.
# Scale: per-key count frames are one map-side-combine aggregate per
# table; top-H is TakeOrderedAndProject (no global sort); everything after
# operates on 1-row or H-row frames.
# ---------------------------------------------------------------------------
CARD_JOINS = (
    ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("customer_orders", "customer", "c_custkey", "orders", "o_custkey"),
    ("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
    ("events_self_user", "events", "user_id", "events", "user_id"),
)
CARD_HH = 8


def _key_counts(spark, sf_dir, table: str, key: str) -> DataFrame:
    # No persist (r10 A/B: 1.54 s without vs 2.88 s with; re-adjudicated
    # r11 per VERDICT #8 after the driver showed a 0.88x wobble: 1.16 s
    # without vs 2.34 s with, all seven call sites — the prune stands):
    # the count frame is an aggregate — an exchange boundary — so
    # its three consumers (side stats, exact count-product join, top-H
    # heavy hitters) share one ReusedExchange evaluation already.
    return (
        _t(spark, sf_dir, table)
        .filter(F.col(key).isNotNull())
        .groupBy(F.col(key).cast("bigint").alias("k"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _card_one(kc_a: DataFrame, kc_b: DataFrame, name: str) -> DataFrame:
    sa = kc_a.agg(
        F.sum("cnt").cast("bigint").alias("rows_a"),
        F.count(F.lit(1)).cast("bigint").alias("ndv_a"),
    )
    sb = kc_b.agg(
        F.sum("cnt").cast("bigint").alias("rows_b"),
        F.count(F.lit(1)).cast("bigint").alias("ndv_b"),
    )
    ex = (
        kc_a.select("k", F.col("cnt").alias("cnt_a"))
        .join(kc_b.select("k", F.col("cnt").alias("cnt_b")), "k")
        .agg(
            F.coalesce(
                F.sum(F.expr("CAST(cnt_a AS DECIMAL(38,0)) * cnt_b")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("exact_dec")
        )
    )
    # top-H heaviest keys: orderBy+limit compiles to TakeOrderedAndProject
    hh_a = kc_a.orderBy(F.col("cnt").desc(), "k").limit(CARD_HH)
    hh_b = kc_b.orderBy(F.col("cnt").desc(), "k").limit(CARD_HH)
    hhj = (
        hh_a.select("k", F.col("cnt").alias("cnt_a"))
        .join(hh_b.select("k", F.col("cnt").alias("cnt_b")), "k")
        .agg(
            F.coalesce(
                F.sum(F.expr("CAST(cnt_a AS DECIMAL(38,0)) * cnt_b")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("hh_exact_dec"),
            F.coalesce(F.sum("cnt_a"), F.lit(0)).cast("bigint").alias("m_rows_a"),
            F.coalesce(F.sum("cnt_b"), F.lit(0)).cast("bigint").alias("m_rows_b"),
            F.count("k").cast("bigint").alias("n_matched"),
        )
    )
    one = (
        sa.crossJoin(F.broadcast(sb))
        .crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(hhj))
    )
    return one.select(
        F.lit(name).alias("join_name"),
        "rows_a",
        "rows_b",
        "ndv_a",
        "ndv_b",
        F.expr("CAST(exact_dec AS BIGINT)").alias("exact_rows"),
        # zero-guards (empty-table boundary): an empty side means 0 keys —
        # estimate 0, error sentineled -1 (both mirrored in the oracle)
        F.expr(
            "CASE WHEN greatest(ndv_a, ndv_b) = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(CAST(rows_a AS DECIMAL(38,0)) * rows_b"
            " div greatest(ndv_a, ndv_b) AS BIGINT) END"
        ).alias("est_uniform"),
        F.expr(
            "CAST(hh_exact_dec + (CASE WHEN greatest(ndv_a - n_matched,"
            " ndv_b - n_matched) <= 0 THEN 0 ELSE"
            " CAST(rows_a - m_rows_a AS DECIMAL(38,0)) * (rows_b - m_rows_b)"
            " div greatest(ndv_a - n_matched, ndv_b - n_matched) END)"
            " AS BIGINT)"
        ).alias("est_hh"),
    ).select(
        "*",
        F.expr(
            "CASE WHEN exact_rows = 0 THEN CAST(-1 AS BIGINT)"
            " ELSE CAST(CAST(abs(est_uniform - exact_rows) AS DECIMAL(38,0))"
            " * 1000000 div exact_rows AS BIGINT) END"
        ).alias("err_uniform_ppm"),
        F.expr(
            "CASE WHEN exact_rows = 0 THEN CAST(-1 AS BIGINT)"
            " ELSE CAST(CAST(abs(est_hh - exact_rows) AS DECIMAL(38,0))"
            " * 1000000 div exact_rows AS BIGINT) END"
        ).alias("err_hh_ppm"),
    )


def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, ta, ka, tb, kb in CARD_JOINS:
        kc_a = _key_counts(spark, sf_dir, ta, ka)
        # self-join audits reuse ONE per-key frame on both sides
        kc_b = (
            kc_a if (ta, ka) == (tb, kb) else _key_counts(spark, sf_dir, tb, kb)
        )
        row = _card_one(kc_a, kc_b, name)
        out = row if out is None else out.unionByName(row)
    return out


def _card_sql_one(name: str, ta: str, ka: str, tb: str, kb: str) -> str:
    return f"""
kca_{name} AS (
    SELECT CAST({ka} AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS cnt
    FROM {ta} WHERE {ka} IS NOT NULL GROUP BY 1
),
kcb_{name} AS (
    SELECT CAST({kb} AS BIGINT) AS k, CAST(count(*) AS BIGINT) AS cnt
    FROM {tb} WHERE {kb} IS NOT NULL GROUP BY 1
),
sa_{name} AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS rows_a,
           CAST(count(*) AS BIGINT) AS ndv_a FROM kca_{name}
),
sb_{name} AS (
    SELECT CAST(sum(cnt) AS BIGINT) AS rows_b,
           CAST(count(*) AS BIGINT) AS ndv_b FROM kcb_{name}
),
ex_{name} AS (
    SELECT coalesce(sum(CAST(a.cnt AS HUGEINT) * b.cnt), 0) AS exact_dec
    FROM kca_{name} a JOIN kcb_{name} b USING (k)
),
hha_{name} AS (
    SELECT k, cnt FROM kca_{name} ORDER BY cnt DESC, k LIMIT {CARD_HH}
),
hhb_{name} AS (
    SELECT k, cnt FROM kcb_{name} ORDER BY cnt DESC, k LIMIT {CARD_HH}
),
hhj_{name} AS (
    SELECT coalesce(sum(CAST(a.cnt AS HUGEINT) * b.cnt), 0) AS hh_exact_dec,
           CAST(coalesce(sum(a.cnt), 0) AS BIGINT) AS m_rows_a,
           CAST(coalesce(sum(b.cnt), 0) AS BIGINT) AS m_rows_b,
           CAST(count(a.k) AS BIGINT) AS n_matched
    FROM hha_{name} a JOIN hhb_{name} b USING (k)
),
est_{name} AS (
    SELECT '{name}' AS join_name, rows_a, rows_b, ndv_a, ndv_b,
           CAST(exact_dec AS BIGINT) AS exact_rows,
           CASE WHEN greatest(ndv_a, ndv_b) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(CAST(rows_a AS HUGEINT) * rows_b
                // greatest(ndv_a, ndv_b) AS BIGINT) END AS est_uniform,
           CAST(hh_exact_dec + (CASE WHEN greatest(ndv_a - n_matched,
                ndv_b - n_matched) <= 0 THEN 0 ELSE
                CAST(rows_a - m_rows_a AS HUGEINT) * (rows_b - m_rows_b)
                // greatest(ndv_a - n_matched, ndv_b - n_matched) END)
                AS BIGINT) AS est_hh
    FROM sa_{name}, sb_{name}, ex_{name}, hhj_{name}
),
row_{name} AS (
    SELECT *,
           CASE WHEN exact_rows = 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST(CAST(abs(est_uniform - exact_rows) AS HUGEINT)
                * 1000000 // exact_rows AS BIGINT) END AS err_uniform_ppm,
           CASE WHEN exact_rows = 0 THEN CAST(-1 AS BIGINT)
                ELSE CAST(CAST(abs(est_hh - exact_rows) AS HUGEINT)
                * 1000000 // exact_rows AS BIGINT) END AS err_hh_ppm
    FROM est_{name}
)"""


_CARD_SQL = (
    "WITH "
    + ",".join(_card_sql_one(*j) for j in CARD_JOINS)
    + "\n"
    + " UNION ALL ".join(f"SELECT * FROM row_{n}" for n, *_ in CARD_JOINS)
)


# ---------------------------------------------------------------------------
# Theta-sketch intersection — the SET-OPERATION half of the mergeable-
# sketch algebra (union = kmv_rolling_distinct; this is intersection, the
# audience-overlap question answered from per-audience sketches alone).
# Per event type keep the K smallest user hashes; theta = the K-th
# smallest when the sketch is full, else the full hash domain. For a pair:
#   theta_pair = least(theta_a, theta_b)
#   D = |kmin_a INTERSECT kmin_b  strictly below theta_pair|
#   est = D * 2^60 / theta_pair      (Dasgupta et al., theta sketches)
# audited against the EXACT overlap from the same distinct frame — the
# sketch-vs-exact doctrine applied to set intersection. Estimates are
# coarse at tiny |D| (that is the honest property of intersection
# sketches — relative error grows as overlap shrinks); err_ppm makes the
# coarseness measurable instead of hidden, and est/err are -1-sentineled
# when the exact overlap is empty (NULL would render differently across
# the engines' dataframe bridges).
# Scale: the per-type distinct + k-min (WindowGroupLimit) is the only
# data-sized work; every pair computation runs over K-row-per-type
# frames. Production keeps the K-row sketches and answers ANY pairwise
# (or k-way) overlap without re-scanning the fact table.
# ---------------------------------------------------------------------------
KMV_INTER_K = 32


def kmv_audience_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    au = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", _h60("user_id").alias("h"))
        .distinct()
        .persist()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kmin = (
        au.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_INTER_K)
        .select("event_type", "h")
        .persist()
    )
    sk = kmin.groupBy("event_type").agg(
        F.max("h").alias("h_k"),
        F.count(F.lit(1)).cast("bigint").alias("n_in"),
    ).withColumn(
        "theta",
        F.expr(f"CASE WHEN n_in < {KMV_INTER_K} THEN {HASH_MOD} ELSE h_k END"),
    )
    types = sk.select("event_type", "theta")
    pairs = (
        types.select(F.col("event_type").alias("type_a"), F.col("theta").alias("theta_a"))
        .crossJoin(
            types.select(
                F.col("event_type").alias("type_b"), F.col("theta").alias("theta_b")
            )
        )
        .filter(F.col("type_a") < F.col("type_b"))
        .withColumn("theta_min", F.least("theta_a", "theta_b"))
    )
    exact = (
        au.select(F.col("event_type").alias("type_a"), "h")
        .join(au.select(F.col("event_type").alias("type_b"), "h"), "h")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_overlap"))
    )
    out = pairs.join(exact, ["type_a", "type_b"], "left").select(
        "type_a",
        "type_b",
        F.coalesce("exact_overlap", F.lit(0)).cast("bigint").alias(
            "exact_overlap"
        ),
        "theta_min",
    )
    # D counts only retained hashes strictly below theta_min
    d = (
        kmin.select(F.col("event_type").alias("type_a"), "h")
        .join(kmin.select(F.col("event_type").alias("type_b"), "h"), "h")
        .filter(F.col("type_a") < F.col("type_b"))
        .join(F.broadcast(pairs.select("type_a", "type_b", "theta_min")), ["type_a", "type_b"])
        .filter(F.col("h") < F.col("theta_min"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_below"))
    )
    return (
        out.join(d, ["type_a", "type_b"], "left")
        .withColumn("d_below", F.coalesce("d_below", F.lit(0)).cast("bigint"))
        .select(
            "type_a",
            "type_b",
            "exact_overlap",
            "d_below",
            F.expr(
                f"CAST(CAST(d_below AS DECIMAL(38,0)) * {HASH_MOD}"
                " div theta_min AS BIGINT)"
            ).alias("est_overlap"),
        )
        .withColumn(
            "err_ppm",
            F.expr(
                "CASE WHEN exact_overlap = 0 THEN -1"
                " ELSE CAST(abs(est_overlap - exact_overlap) * 1000000"
                " div exact_overlap AS BIGINT) END"
            ),
        )
    )


_KMV_INTER_SQL = f"""
WITH au AS (
    SELECT DISTINCT event_type,
           {_H60_DUCK.format(col="user_id")} AS h
    FROM events WHERE user_id IS NOT NULL
),
kmin AS (
    SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM au
    ) WHERE rn <= {KMV_INTER_K}
),
sk AS (
    SELECT event_type,
           CASE WHEN count(*) < {KMV_INTER_K} THEN {HASH_MOD}
                ELSE max(h) END AS theta
    FROM kmin GROUP BY 1
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           least(a.theta, b.theta) AS theta_min
    FROM sk a JOIN sk b ON a.event_type < b.event_type
),
exact AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS exact_overlap
    FROM au a JOIN au b ON a.h = b.h AND a.event_type < b.event_type
    GROUP BY 1, 2
),
d AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS d_below
    FROM kmin a
    JOIN kmin b ON a.h = b.h AND a.event_type < b.event_type
    JOIN pairs p ON p.type_a = a.event_type AND p.type_b = b.event_type
    WHERE a.h < p.theta_min
    GROUP BY 1, 2
),
est AS (
    SELECT p.type_a, p.type_b,
           CAST(coalesce(e.exact_overlap, 0) AS BIGINT) AS exact_overlap,
           CAST(coalesce(d.d_below, 0) AS BIGINT) AS d_below,
           CAST(CAST(coalesce(d.d_below, 0) AS HUGEINT) * {HASH_MOD}
                // p.theta_min AS BIGINT) AS est_overlap
    FROM pairs p
    LEFT JOIN exact e ON e.type_a = p.type_a AND e.type_b = p.type_b
    LEFT JOIN d ON d.type_a = p.type_a AND d.type_b = p.type_b
)
SELECT type_a, type_b, exact_overlap, d_below, est_overlap,
       CASE WHEN exact_overlap = 0 THEN -1
            ELSE CAST(abs(est_overlap - exact_overlap) * 1000000
                 // exact_overlap AS BIGINT) END AS err_ppm
FROM est
"""


# ---------------------------------------------------------------------------
# Theta-sketch A-NOT-B — the third set operation of the mergeable-sketch
# algebra (union = kmv_rolling_distinct, intersection =
# kmv_audience_intersection, difference = this): "how many of audience
# A are NOT in audience B", answered from the two K-row sketches alone.
# With theta_pair = least(theta_a, theta_b):
#   D = |{h in kmin_a : h < theta_pair AND h NOT IN kmin_b}|
#   est = D * 2^60 / theta_pair       (Dasgupta et al., theta sketches)
# (the anti-membership test against the FULL kmin_b is exact below
# theta_pair: theta_pair <= theta_b, so B's sketch retains every B hash
# below it). Unlike intersection, difference is DIRECTIONAL — both
# ordered pairs are emitted. The exact side needs no anti-join:
# |A \ B| = |A| - |A ∩ B| from the same distinct frame. -1-sentineled
# err when the exact difference is empty, as the intersection op does.
# Scale: identical to intersection — the per-type distinct + k-min
# (WindowGroupLimit) is the only data-sized work; everything pairwise
# runs over K-row frames.
# ---------------------------------------------------------------------------
def kmv_audience_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    au = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("event_type", _h60("user_id").alias("h"))
        .distinct()
        .persist()
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kmin = (
        au.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_INTER_K)
        .select("event_type", "h")
        .persist()
    )
    sk = (
        au.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
        .join(
            kmin.groupBy("event_type").agg(
                F.max("h").alias("h_k"),
                F.count(F.lit(1)).cast("bigint").alias("n_in"),
            ),
            "event_type",
        )
        .withColumn(
            "theta",
            F.expr(
                f"CASE WHEN n_in < {KMV_INTER_K} THEN {HASH_MOD}"
                " ELSE h_k END"
            ),
        )
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("theta").alias("theta_a"),
        F.col("n_total").alias("n_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"), F.col("theta").alias("theta_b")
    )
    pairs = (
        a.crossJoin(b)
        .filter(F.col("type_a") != F.col("type_b"))
        .withColumn("theta_min", F.least("theta_a", "theta_b"))
    )
    overlap = (
        au.select(F.col("event_type").alias("type_a"), "h")
        .join(au.select(F.col("event_type").alias("type_b"), "h"), "h")
        .filter(F.col("type_a") != F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_overlap"))
    )
    d = (
        kmin.select(F.col("event_type").alias("type_a"), "h")
        .join(
            F.broadcast(pairs.select("type_a", "type_b", "theta_min")),
            "type_a",
        )
        .filter(F.col("h") < F.col("theta_min"))
        .join(
            kmin.select(F.col("event_type").alias("type_b"), "h"),
            ["type_b", "h"],
            "left_anti",
        )
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_below"))
    )
    return (
        pairs.join(overlap, ["type_a", "type_b"], "left")
        .join(d, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            F.expr("n_a - coalesce(n_overlap, 0)")
            .cast("bigint")
            .alias("exact_diff"),
            F.coalesce("d_below", F.lit(0)).cast("bigint").alias("d_below"),
            F.expr(
                f"CAST(CAST(coalesce(d_below, 0) AS DECIMAL(38,0))"
                f" * {HASH_MOD} div theta_min AS BIGINT)"
            ).alias("est_diff"),
        )
        .withColumn(
            "err_ppm",
            F.expr(
                "CASE WHEN exact_diff = 0 THEN -1"
                " ELSE CAST(abs(est_diff - exact_diff) * 1000000"
                " div exact_diff AS BIGINT) END"
            ),
        )
    )


_KMV_DIFF_SQL = f"""
WITH au AS (
    SELECT DISTINCT event_type,
           {_H60_DUCK.format(col="user_id")} AS h
    FROM events WHERE user_id IS NOT NULL
),
kmin AS (
    SELECT event_type, h FROM (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM au
    ) WHERE rn <= {KMV_INTER_K}
),
sk AS (
    SELECT a.event_type, a.n_total, k.n_in, k.h_k,
           CASE WHEN k.n_in < {KMV_INTER_K} THEN {HASH_MOD}
                ELSE k.h_k END AS theta
    FROM (SELECT event_type, CAST(count(*) AS BIGINT) AS n_total
          FROM au GROUP BY 1) a
    JOIN (SELECT event_type, max(h) AS h_k,
                 CAST(count(*) AS BIGINT) AS n_in
          FROM kmin GROUP BY 1) k USING (event_type)
),
pairs AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.n_total AS n_a, least(a.theta, b.theta) AS theta_min
    FROM sk a, sk b
    WHERE a.event_type <> b.event_type
),
overlap AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS n_overlap
    FROM au a JOIN au b ON a.h = b.h AND a.event_type <> b.event_type
    GROUP BY 1, 2
),
d AS (
    SELECT p.type_a, p.type_b, CAST(count(*) AS BIGINT) AS d_below
    FROM pairs p
    JOIN kmin a ON a.event_type = p.type_a AND a.h < p.theta_min
    WHERE NOT EXISTS (
        SELECT 1 FROM kmin b
        WHERE b.event_type = p.type_b AND b.h = a.h
    )
    GROUP BY 1, 2
),
est AS (
    SELECT p.type_a, p.type_b,
           CAST(p.n_a - coalesce(o.n_overlap, 0) AS BIGINT) AS exact_diff,
           CAST(coalesce(d.d_below, 0) AS BIGINT) AS d_below,
           CAST(CAST(coalesce(d.d_below, 0) AS HUGEINT) * {HASH_MOD}
                // p.theta_min AS BIGINT) AS est_diff
    FROM pairs p
    LEFT JOIN overlap o ON o.type_a = p.type_a AND o.type_b = p.type_b
    LEFT JOIN d ON d.type_a = p.type_a AND d.type_b = p.type_b
)
SELECT type_a, type_b, exact_diff, d_below, est_diff,
       CASE WHEN exact_diff = 0 THEN -1
            ELSE CAST(abs(est_diff - exact_diff) * 1000000
                 // exact_diff AS BIGINT) END AS err_ppm
FROM est
"""


# ---------------------------------------------------------------------------
# Column-encoding choice audit — the write-path layout decision the
# skipping/z-order audits don't cover: for each column of the fact
# table, estimate PLAIN vs DICTIONARY vs RLE storage from one scan and
# recommend an encoding (what a parquet writer's encoding heuristic
# does; exposing it as a query lets a pipeline alarm when a column's
# cardinality drifts past dictionary viability — the classic silent
# 3x-file-size regression). All sizes are exact integer byte estimates:
#   plain = sum of value byte lengths (8/value for int64 columns)
#   dict  = distinct-value bytes + n * ceil(log2(ndv)) bits
#   rle   = runs-in-natural-order * (value bytes + 4-byte run length)
# Scale shape: ONE pass computes per-column (n, bytes) and the run
# flags via a single (ts, event_id) window; distinct-value stats are a
# per-column combine. Output is |columns| rows at any scale.
# ---------------------------------------------------------------------------
ENC_COLUMNS = ("event_type", "user_id", "v_cents", "props")


def encoding_choice_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.functions.exprs import money_cents

    ev = _t(spark, sf_dir, "events").select(
        "ts",
        "event_id",
        F.col("event_type").cast("string").alias("event_type"),
        F.col("user_id").cast("string").alias("user_id"),
        money_cents("value").cast("string").alias("v_cents"),
        F.col("props").cast("string").alias("props"),
    )
    # runs break at day boundaries on purpose: a global ORDER BY window
    # is single-partition at scale, while the per-day window mirrors how
    # a writer encodes per file/row-group anyway (runs never span files)
    runs = ev.select(
        *[
            F.expr(
                f"CASE WHEN {c} IS DISTINCT FROM"
                f" lag({c}) OVER (PARTITION BY CAST(ts AS DATE)"
                f" ORDER BY ts, event_id)"
                f" THEN 1 ELSE 0 END"
            ).alias(f"run_{c}")
            for c in ENC_COLUMNS
        ],
        *[F.col(c) for c in ENC_COLUMNS],
    )  # no persist (r10 A/B: 1.33 s vs 2.93 s)
    parts = []
    for c in ENC_COLUMNS:
        # int64-backed columns store 8 bytes/value PLAIN; strings store
        # their UTF-8 length (the cast to string above is only the audit
        # frame's common type — width comes from the source type)
        is_int = c in ("user_id", "v_cents")
        vbytes = (
            f"CASE WHEN {c} IS NULL THEN NULL ELSE 8 END"
            if is_int
            else f"octet_length({c})"
        )
        stats = runs.agg(
            F.expr(f"CAST(count({c}) AS BIGINT)").alias("n_values"),
            F.expr(f"CAST(count(DISTINCT {c}) AS BIGINT)").alias("ndv"),
            F.expr(f"CAST(sum({vbytes}) AS BIGINT)").alias("plain_bytes"),
            F.expr(f"CAST(sum(run_{c}) AS BIGINT)").alias("rle_runs"),
        ).select(
            F.lit(c).alias("column_name"),
            "n_values",
            "ndv",
            "plain_bytes",
            "rle_runs",
        )
        dict_vals = (
            runs.select(F.col(c).alias("v"))
            .filter("v IS NOT NULL")
            .distinct()
            .agg(
                F.expr(
                    f"CAST(sum({'8' if is_int else 'octet_length(v)'})"
                    f" AS BIGINT)"
                ).alias("dict_value_bytes")
            )
            .select(F.lit(c).alias("column_name"), "dict_value_bytes")
        )
        parts.append(stats.join(F.broadcast(dict_vals), "column_name"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "column_name",
        "n_values",
        "ndv",
        "plain_bytes",
        F.expr(
            "CAST(coalesce(dict_value_bytes, 0)"
            " + (n_values * greatest(length(bin(greatest(ndv - 1, 0))), 1)"
            " + 7) div 8 AS BIGINT)"
        ).alias("dict_bytes"),
        "rle_runs",
        F.expr(
            "CAST(rle_runs * (CASE WHEN n_values = 0 THEN 0"
            " ELSE plain_bytes div n_values END + 4) AS BIGINT)"
        ).alias("rle_bytes"),
    ).select(
        "*",
        F.expr(
            "CASE WHEN least(dict_bytes, rle_bytes) >= plain_bytes"
            " THEN 'PLAIN'"
            " WHEN dict_bytes <= rle_bytes THEN 'DICT' ELSE 'RLE' END"
        ).alias("recommended"),
    )


def _encoding_sql() -> str:
    parts = []
    for c in ENC_COLUMNS:
        is_int = c in ("user_id", "v_cents")
        vexpr = (
            "CAST(user_id AS VARCHAR)"
            if c == "user_id"
            else "CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR)"
            if c == "v_cents"
            else c
        )
        vbytes = "8" if is_int else "strlen(v)"  # DuckDB: bytes
        parts.append(
            f"""sel_{c} AS (
    SELECT {vexpr} AS v,
           CASE WHEN {vexpr} IS DISTINCT FROM
                lag({vexpr}) OVER (PARTITION BY CAST(ts AS DATE)
                                   ORDER BY ts, event_id)
           THEN 1 ELSE 0 END AS run
    FROM events
),
stat_{c} AS (
    SELECT '{c}' AS column_name,
           CAST(count(v) AS BIGINT) AS n_values,
           CAST(count(DISTINCT v) AS BIGINT) AS ndv,
           CAST(sum(CASE WHEN v IS NULL THEN NULL ELSE {vbytes} END)
                AS BIGINT) AS plain_bytes,
           CAST(sum(run) AS BIGINT) AS rle_runs,
           (SELECT CAST(sum({vbytes}) AS BIGINT) FROM
               (SELECT DISTINCT v FROM sel_{c} WHERE v IS NOT NULL))
               AS dict_value_bytes
    FROM sel_{c}
)"""
        )
    union = " UNION ALL ".join(f"SELECT * FROM stat_{c}" for c in ENC_COLUMNS)
    return f"""
WITH {", ".join(parts)},
raw AS ({union}),
sized AS (
    SELECT column_name, n_values, ndv, plain_bytes,
           CAST(coalesce(dict_value_bytes, 0)
                + (n_values * greatest(length(bin(greatest(ndv - 1, 0))), 1)
                   + 7) // 8 AS BIGINT) AS dict_bytes,
           rle_runs,
           CAST(rle_runs * (CASE WHEN n_values = 0 THEN 0
                ELSE plain_bytes // n_values END + 4) AS BIGINT) AS rle_bytes
    FROM raw
)
SELECT *,
       CASE WHEN least(dict_bytes, rle_bytes) >= plain_bytes THEN 'PLAIN'
            WHEN dict_bytes <= rle_bytes THEN 'DICT' ELSE 'RLE'
       END AS recommended
FROM sized
"""


# ---------------------------------------------------------------------------
# Min-max file-skipping audit — the data-layout decision BEHIND parquet
# predicate pushdown: per simulated file, the (min, max) of the probe
# column; a file is SCANNED for a predicate iff [min, max] overlaps it.
# Two layouts from the same rows:
#   natural   — files are (day, hour) ingestion slices: user_id ranges are
#               wide in every file, point lookups scan everything.
#   clustered — files are user_id range buckets (what a write-time
#               cluster-by produces): min/max are tight, lookups touch
#               one file.
# The audit quantifies the layout's payoff per predicate (skip_ppm) — the
# measurement behind a CLUSTER BY / Z-ORDER decision, sibling of
# zorder_layout_audit. One scan: stats aggregate at the (hour, bucket)
# CELL grain, and both layouts' file stats derive from the cell frame
# (min of mins / sum of counts) — the fact table is never read twice.
# ---------------------------------------------------------------------------
SKIP_UBUCKET = 16  # clustered-layout file width in user_id space
SKIP_PREDS = (  # (pred_id, lo, hi) on user_id
    (1, 7, 7),
    (2, 23, 23),
    (3, 140, 140),
    (4, 0, 9),
    (5, 40, 79),
    (6, 100, 149),
    (7, 10, 109),
)


def file_skipping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    # Both layouts' file stats derive from this cell frame; it is an
    # aggregate (exchange boundary), so ReusedExchange evaluates the fact
    # scan + combine once for both branches — the fact table is still
    # never read twice (r10 A/B: 0.84 s without persist vs 1.35 s with).
    cells = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd-HH").alias("hour_key"),
        F.expr(f"user_id div {SKIP_UBUCKET}").alias("bucket_key"),
    ).agg(
        F.min("user_id").alias("u_min"),
        F.max("user_id").alias("u_max"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    nat = cells.groupBy(F.col("hour_key").alias("file_key")).agg(
        F.min("u_min").alias("u_min"),
        F.max("u_max").alias("u_max"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )
    clu = cells.groupBy(
        F.col("bucket_key").cast("string").alias("file_key")
    ).agg(
        F.min("u_min").alias("u_min"),
        F.max("u_max").alias("u_max"),
        F.sum("n_rows").cast("bigint").alias("n_rows"),
    )
    preds = spark.createDataFrame(
        list(SKIP_PREDS), "pred_id int, lo bigint, hi bigint"
    )
    parts = []
    for layout, stats in (("natural", nat), ("clustered", clu)):
        scanned = (
            stats.crossJoin(F.broadcast(preds))
            .groupBy("pred_id", "lo", "hi")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("files_total"),
                F.sum(
                    F.expr("CASE WHEN u_min <= hi AND u_max >= lo THEN 1 ELSE 0 END")
                )
                .cast("bigint")
                .alias("files_scanned"),
                F.sum(
                    F.expr(
                        "CASE WHEN u_min <= hi AND u_max >= lo THEN n_rows ELSE 0 END"
                    )
                )
                .cast("bigint")
                .alias("rows_scanned"),
            )
            .select(
                F.lit(layout).alias("layout"),
                "pred_id",
                "lo",
                "hi",
                "files_total",
                "files_scanned",
                "rows_scanned",
                F.expr(
                    "CAST((files_total - files_scanned) * 1000000"
                    " div files_total AS BIGINT)"
                ).alias("skip_ppm"),
            )
        )
        parts.append(scanned)
    return parts[0].unionByName(parts[1])


_SKIP_PRED_VALUES = ", ".join(f"({p}, {lo}, {hi})" for p, lo, hi in SKIP_PREDS)

_SKIP_SQL = f"""
WITH cells AS (
    SELECT strftime(ts, '%Y-%m-%d-%H') AS hour_key,
           user_id // {SKIP_UBUCKET} AS bucket_key,
           min(user_id) AS u_min, max(user_id) AS u_max,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM events WHERE user_id IS NOT NULL
    GROUP BY 1, 2
),
nat AS (
    SELECT hour_key AS file_key, min(u_min) AS u_min, max(u_max) AS u_max,
           CAST(sum(n_rows) AS BIGINT) AS n_rows
    FROM cells GROUP BY 1
),
clu AS (
    SELECT CAST(bucket_key AS VARCHAR) AS file_key,
           min(u_min) AS u_min, max(u_max) AS u_max,
           CAST(sum(n_rows) AS BIGINT) AS n_rows
    FROM cells GROUP BY 1
),
preds AS (SELECT * FROM (VALUES {_SKIP_PRED_VALUES}) v(pred_id, lo, hi)),
stats AS (
    SELECT 'natural' AS layout, * FROM nat
    UNION ALL
    SELECT 'clustered' AS layout, * FROM clu
)
SELECT s.layout, CAST(p.pred_id AS INTEGER) AS pred_id,
       CAST(p.lo AS BIGINT) AS lo, CAST(p.hi AS BIGINT) AS hi,
       CAST(count(*) AS BIGINT) AS files_total,
       CAST(sum(CASE WHEN s.u_min <= p.hi AND s.u_max >= p.lo
                THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
       CAST(sum(CASE WHEN s.u_min <= p.hi AND s.u_max >= p.lo
                THEN s.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
       CAST((count(*) - sum(CASE WHEN s.u_min <= p.hi AND s.u_max >= p.lo
                            THEN 1 ELSE 0 END)) * 1000000
            // count(*) AS BIGINT) AS skip_ppm
FROM stats s CROSS JOIN preds p
GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# Count-min sketch frequency audit (Cormode & Muthukrishnan '05) — the
# point-frequency half of the mergeable-summary family (distinct = KMV,
# membership = Bloom, heavy hitters = Misra-Gries): D=4 salted hash rows
# x W=256 counters; est(user) = min over rows of its cell — never an
# undercount, over by at most the cell's collision mass. The audit probes
# EVERY user against the exact count and reports the realized error
# distribution next to the theoretical bound e*N/W (one row per depth
# configuration, so the output is O(1) regardless of user cardinality —
# the per-user probe frame never leaves the plan).
# Merge note: CMS merges by cell-wise addition (linear sketch), so
# per-slice sketches sum to the global one exactly — unlike top-k lists
# (see topk_merge_audit below, the lossy contrast).
# Scale: per-user exact counts are one combine-backed aggregate (the only
# data-sized shuffle); cells are D*W rows built FROM that frame and
# broadcast back; the min-over-depths is a D-row-per-user reduce.
# ---------------------------------------------------------------------------
CMS_DEPTH = 4
CMS_WIDTH = 256
_CMS_E_MILLI = 2_719  # ceil(e * 1000): bound = ceil(e*N/W) via integer math


def cms_frequency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    ).persist()
    ds = F.explode(F.sequence(F.lit(1), F.lit(CMS_DEPTH))).alias("d")
    pos_expr = F.expr(
        "CAST(conv(substring(md5(concat(CAST(d AS STRING), '#',"
        f" CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT) % {CMS_WIDTH}"
    )
    placed = per_user.select("user_id", "ct", ds).withColumn("pos", pos_expr)
    cells = placed.groupBy("d", "pos").agg(
        F.sum("ct").cast("bigint").alias("cell_ct")
    )
    est = (
        placed.join(F.broadcast(cells), ["d", "pos"])
        .groupBy("user_id", "ct")
        .agg(F.min("cell_ct").cast("bigint").alias("est_ct"))
    )
    tot = per_user.agg(F.sum("ct").cast("bigint").alias("n_events"))
    return (
        est.crossJoin(F.broadcast(tot))
        .withColumn(
            "bound",
            F.expr(
                f"(n_events * {_CMS_E_MILLI} + {CMS_WIDTH * 1000} - 1)"
                f" div {CMS_WIDTH * 1000}"
            ),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("probes"),
            F.first("n_events").alias("n_events"),
            F.sum(F.expr("CASE WHEN est_ct < ct THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("undercounts"),  # MUST be 0: CMS never undercounts
            F.max(F.expr("est_ct - ct")).cast("bigint").alias("max_over"),
            # int64 headroom: the summed overestimate can exceed int64 at
            # extreme scale (DuckDB's sum(BIGINT) is HUGEINT natively) —
            # ride DECIMAL(38,0) internally, BIGINT at the boundary
            F.expr(
                "CAST(sum(CAST(est_ct - ct AS DECIMAL(38,0))) * 1000000"
                " div sum(ct) AS BIGINT)"
            ).alias("avg_over_ppm"),
            F.sum(F.expr("CASE WHEN est_ct - ct <= bound THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("within_bound"),
            F.first("bound").cast("bigint").alias("bound_e_n_over_w"),
        )
    )


_CMS_SQL = f"""
WITH per_user AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS ct
    FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
placed AS (
    SELECT user_id, ct, d,
           TRY_CAST('0x' || substr(md5(CAST(d AS VARCHAR) || '#' ||
                    CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT)
               % {CMS_WIDTH} AS pos
    FROM per_user, UNNEST(range(1, {CMS_DEPTH} + 1)) AS u(d)
),
cells AS (
    SELECT d, pos, CAST(sum(ct) AS BIGINT) AS cell_ct
    FROM placed GROUP BY 1, 2
),
est AS (
    SELECT p.user_id, p.ct, CAST(min(c.cell_ct) AS BIGINT) AS est_ct
    FROM placed p JOIN cells c ON p.d = c.d AND p.pos = c.pos
    GROUP BY 1, 2
),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n_events FROM per_user)
SELECT CAST(count(*) AS BIGINT) AS probes,
       CAST(any_value(n_events) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN est_ct < ct THEN 1 ELSE 0 END) AS BIGINT)
           AS undercounts,
       CAST(max(est_ct - ct) AS BIGINT) AS max_over,
       CAST(sum(est_ct - ct) * 1000000 // sum(ct) AS BIGINT)
           AS avg_over_ppm,
       CAST(sum(CASE WHEN est_ct - ct <=
                (n_events * {_CMS_E_MILLI} + {CMS_WIDTH * 1000} - 1)
                // {CMS_WIDTH * 1000}
                THEN 1 ELSE 0 END) AS BIGINT) AS within_bound,
       CAST(any_value((n_events * {_CMS_E_MILLI} + {CMS_WIDTH * 1000} - 1)
            // {CMS_WIDTH * 1000}) AS BIGINT) AS bound_e_n_over_w
FROM est, tot
"""


# ---------------------------------------------------------------------------
# Top-k MERGE audit — the lossy contrast to the linear sketches above:
# merging per-day top-K lists does NOT recover the global top-K (a
# steady-but-never-daily-top key can be missing from every daily list).
# The audit merges the daily lists into a candidate set, recounts the
# candidates exactly, and measures recall@K against the true global
# top-K plus the worst-ranked miss — the number that tells a deployment
# whether daily-rollup leaderboards can answer weekly questions, or a
# full recount (or a Misra-Gries sketch, which DOES merge with bounded
# error) is required.
# Scale: two WindowGroupLimit top-Ks over the per-(day,user) /
# per-user combines; the candidate recount is a semi-join against a
# candidate set of at most days*K keys.
# ---------------------------------------------------------------------------
TOPK_MERGE_K = 10


def topk_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    # persisted: feeds the daily top-K candidates AND the day count
    daily = ev.groupBy(
        F.col("ts").cast("date").alias("d"), "user_id"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("ct")).persist()
    wd = Window.partitionBy("d").orderBy(F.col("ct").desc(), F.col("user_id"))
    cand = (
        daily.withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") <= TOPK_MERGE_K)
        .select("user_id")
        .distinct()
    )
    total = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    # global top-K via orderBy+limit (TakeOrderedAndProject — never a
    # single-partition window over ALL users); rnk is stamped by a window
    # over the already-limited K-row frame
    wg = Window.orderBy(F.col("ct").desc(), F.col("user_id"))
    exact_topk = (
        total.orderBy(F.col("ct").desc(), "user_id")
        .limit(TOPK_MERGE_K)
        .withColumn("rnk", F.row_number().over(wg))
    )
    hit = exact_topk.join(
        cand.withColumn("is_cand", F.lit(1)), "user_id", "left"
    ).select(
        "rnk", F.coalesce("is_cand", F.lit(0)).alias("is_cand")
    )
    n_cand = cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_candidates"))
    n_days = daily.select("d").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    return (
        hit.agg(
            F.sum("is_cand").cast("bigint").alias("topk_found"),
            F.coalesce(
                F.min(F.expr("CASE WHEN is_cand = 0 THEN rnk END")), F.lit(0)
            )
            .cast("bigint")
            .alias("best_missed_rank"),
        )
        .crossJoin(F.broadcast(n_cand))
        .crossJoin(F.broadcast(n_days))
        .select(
            F.lit(TOPK_MERGE_K).cast("bigint").alias("k"),
            "n_days",
            "n_candidates",
            "topk_found",
            F.expr(
                f"CAST(topk_found * 1000000 div {TOPK_MERGE_K} AS BIGINT)"
            ).alias("recall_ppm"),
            "best_missed_rank",
        )
    )


_TOPK_MERGE_SQL = f"""
WITH ev AS (
    SELECT CAST(ts AS DATE) AS d, user_id FROM events
    WHERE user_id IS NOT NULL
),
daily AS (
    SELECT d, user_id, CAST(count(*) AS BIGINT) AS ct FROM ev GROUP BY 1, 2
),
cand AS (
    SELECT DISTINCT user_id FROM (
        SELECT d, user_id,
               row_number() OVER (PARTITION BY d
                                  ORDER BY ct DESC, user_id) AS rn
        FROM daily
    ) WHERE rn <= {TOPK_MERGE_K}
),
total AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS ct FROM ev GROUP BY 1
),
exact_topk AS (
    SELECT user_id, rnk FROM (
        SELECT user_id, row_number() OVER (ORDER BY ct DESC, user_id) AS rnk
        FROM total
    ) WHERE rnk <= {TOPK_MERGE_K}
),
hit AS (
    SELECT e.rnk, CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS is_cand
    FROM exact_topk e LEFT JOIN cand c USING (user_id)
),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_candidates FROM cand),
nd AS (SELECT CAST(count(DISTINCT d) AS BIGINT) AS n_days FROM ev)
SELECT CAST({TOPK_MERGE_K} AS BIGINT) AS k,
       nd.n_days, nc.n_candidates,
       CAST(sum(h.is_cand) AS BIGINT) AS topk_found,
       CAST(sum(h.is_cand) * 1000000 // {TOPK_MERGE_K} AS BIGINT)
           AS recall_ppm,
       CAST(coalesce(min(CASE WHEN h.is_cand = 0 THEN h.rnk END), 0)
            AS BIGINT) AS best_missed_rank
FROM hit h, nc, nd
GROUP BY 2, 3
"""


# ---------------------------------------------------------------------------
# Watermark-lateness audit — the measurement BEHIND a withWatermark(delay)
# choice. The testdata's event_id is time-ordered (a replay in id order is
# never late — vacuous), so the audit replays a REALISTIC deterministic
# arrival model: 10-minute collector flushes, each flush delivered shard-
# by-shard (shard = user-hash % 64) and time-ordered within a shard — the
# cross-shard interleave inside a flush is what reorders events, exactly
# how a fan-in collector behaves. Each event's lateness is max(event time
# seen STRICTLY before it in arrival order) - its own event time; for
# each candidate delay, the rows a watermark at that delay would drop
# (lateness is bounded by the flush width, so the curve must reach zero
# at delay = 600 s — pinned in tests).
# The global exclusive prefix-max is a TWO-LEVEL scan: per-flush prefix
# max (window bounded by the flush's rows) + an exclusive cumulative max
# over the tiny flush frame broadcast back — never a whole-table single-
# partition window. Lateness is exact microseconds (unix_micros /
# epoch_us — identical integers on both engines).
# ---------------------------------------------------------------------------
LATE_FLUSH_S = 600  # collector flush width (the outer scan level)
LATE_SHARDS = 64  # delivery shards inside a flush
WATERMARK_DELAYS_S = (0, 10, 60, 300, 600)


def watermark_lateness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "event_id",
            F.expr("unix_micros(ts)").alias("t_us"),
            F.expr(f"unix_micros(ts) div {LATE_FLUSH_S * 1_000_000}").alias(
                "b"
            ),
            F.coalesce(_h60("user_id") % LATE_SHARDS, F.lit(-1)).alias(
                "shard"
            ),
        )
    )
    wb = (
        Window.partitionBy("b")
        .orderBy("shard", "t_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = ev.withColumn("in_bucket_max", F.max("t_us").over(wb))
    bmax = ev.groupBy("b").agg(F.max("t_us").alias("bucket_max"))
    wcum = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    # the single-partition window runs over the FLUSH frame (rows =
    # corpus span / 600 s), not the fact table
    cum = bmax.withColumn("prev_max", F.max("bucket_max").over(wcum)).select(
        "b", "prev_max"
    )
    late = (
        within.join(F.broadcast(cum), "b")
        .withColumn("seen", F.greatest("in_bucket_max", "prev_max"))
        .select(
            F.expr(
                "CASE WHEN seen IS NULL OR seen <= t_us THEN CAST(0 AS BIGINT)"
                " ELSE seen - t_us END"
            ).alias("late_us")
        )
    )
    delays = spark.createDataFrame(
        [(int(s),) for s in WATERMARK_DELAYS_S], "delay_s bigint"
    )
    return (
        late.crossJoin(F.broadcast(delays))
        .groupBy("delay_s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.expr("CASE WHEN late_us > delay_s * 1000000 THEN 1"
                         " ELSE 0 END"))
            .cast("bigint")
            .alias("dropped"),
            F.max("late_us").cast("bigint").alias("max_late_us"),
        )
        .withColumn(
            "dropped_ppm",
            F.expr("CAST(dropped * 1000000 div n_events AS BIGINT)"),
        )
    )


_LATE_DELAY_VALUES = ", ".join(f"({s})" for s in WATERMARK_DELAYS_S)

_LATENESS_SQL = f"""
WITH ev AS (
    SELECT event_id, epoch_us(ts) AS t_us,
           epoch_us(ts) // {LATE_FLUSH_S * 1_000_000} AS b,
           coalesce({_H60_DUCK.format(col="user_id")} % {LATE_SHARDS}, -1)
               AS shard
    FROM events WHERE ts IS NOT NULL
),
within AS (
    SELECT b, t_us,
           max(t_us) OVER (PARTITION BY b
                           ORDER BY shard, t_us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS in_bucket_max
    FROM ev
),
cum AS (
    SELECT b, max(bucket_max) OVER (ORDER BY b
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prev_max
    FROM (SELECT b, max(t_us) AS bucket_max FROM ev GROUP BY 1)
),
late AS (
    SELECT CASE WHEN seen IS NULL OR seen <= t_us THEN 0
                ELSE seen - t_us END AS late_us
    FROM (
        SELECT w.t_us, greatest(w.in_bucket_max, c.prev_max) AS seen
        FROM within w JOIN cum c USING (b)
    )
),
delays AS (SELECT CAST(delay_s AS BIGINT) AS delay_s
           FROM (VALUES {_LATE_DELAY_VALUES}) v(delay_s))
SELECT d.delay_s,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN l.late_us > d.delay_s * 1000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS dropped,
       CAST(max(l.late_us) AS BIGINT) AS max_late_us,
       CAST(sum(CASE WHEN l.late_us > d.delay_s * 1000000 THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS dropped_ppm
FROM late l CROSS JOIN delays d
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Join-order recommendation — the DECISION the cardinality estimates
# exist for: for the 3-table chain customer ⨝ orders ⨝ lineitem, which
# join runs first? Both candidate orders' INTERMEDIATE sizes are
# estimated System-R-style from per-side (rows, ndv) stats alone, and
# audited against the exact intermediate sizes — computed from the
# per-key count frames (sum of count products over the join key), never
# by materializing a join. The final row also grades the decision:
# does the estimate-chosen order coincide with the actually-cheaper one?
# Scale: three per-key combine aggregates + keyed joins of COUNT frames;
# the one subtle leg (final 3-way size) flows orders' (orderkey, custkey)
# pairs through a customer-presence semi-join into the lineitem count
# frame — key-domain volumes throughout.
# ---------------------------------------------------------------------------
def join_order_recommendation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey").isNotNull())
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_orderkey").isNotNull()
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey").isNotNull())

    kc_c = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    kc_oc = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    kc_l = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )

    def _stats(kc, pre):
        return kc.agg(
            F.sum("cnt").cast("bigint").alias(f"rows_{pre}"),
            F.count(F.lit(1)).cast("bigint").alias(f"ndv_{pre}"),
        )

    def _exact(kc_a, kc_b, out):
        return (
            kc_a.select("k", F.col("cnt").alias("ca"))
            .join(kc_b.select("k", F.col("cnt").alias("cb")), "k")
            .agg(
                # sum in DECIMAL(38,0) like _card_one's exact_dec — BIGINT
                # ca*cb would silently wrap at extreme key multiplicity
                # while the oracle's HUGEINT sum errors on the final cast
                F.coalesce(
                    F.sum(F.expr("CAST(ca AS DECIMAL(38,0)) * cb")), F.lit(0)
                )
                .cast("bigint")
                .alias(out)
            )
        )

    # exact(c ⨝ o) over custkey; exact(o ⨝ l) over orderkey (orders are
    # unique per orderkey, so its count frame is the orders projection)
    kc_oo = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    ex_co = _exact(kc_c, kc_oc, "actual_co")
    ex_ol = _exact(kc_oo, kc_l, "actual_ol")
    # final 3-way size: lineitem rows whose order's customer exists
    final = (
        orders.select(F.col("o_orderkey").alias("k"), "o_custkey")
        .join(
            kc_c.select(F.col("k").alias("o_custkey")), "o_custkey", "left_semi"
        )
        .join(kc_l, "k")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("final_rows"))
    )
    one = (
        _stats(kc_c, "c")
        .crossJoin(F.broadcast(_stats(kc_oc, "oc")))
        .crossJoin(F.broadcast(_stats(kc_oo, "oo")))
        .crossJoin(F.broadcast(_stats(kc_l, "l")))
        .crossJoin(F.broadcast(ex_co))
        .crossJoin(F.broadcast(ex_ol))
        .crossJoin(F.broadcast(final))
    )
    est = one.select(
        "*",
        F.expr(
            "CASE WHEN greatest(ndv_c, ndv_oc) = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(CAST(rows_c AS DECIMAL(38,0)) * rows_oc"
            " div greatest(ndv_c, ndv_oc) AS BIGINT) END"
        ).alias("est_co"),
        F.expr(
            "CASE WHEN greatest(ndv_oo, ndv_l) = 0 THEN CAST(0 AS BIGINT)"
            " ELSE CAST(CAST(rows_oo AS DECIMAL(38,0)) * rows_l"
            " div greatest(ndv_oo, ndv_l) AS BIGINT) END"
        ).alias("est_ol"),
    )
    orders_rows = est.select(
        F.explode(
            F.expr(
                "array(named_struct('join_order', 'customer_first',"
                " 'est_intermediate', est_co, 'actual_intermediate',"
                " actual_co, 'final_rows', final_rows),"
                " named_struct('join_order', 'lineitem_first',"
                " 'est_intermediate', est_ol, 'actual_intermediate',"
                " actual_ol, 'final_rows', final_rows))"
            )
        ).alias("r"),
        F.expr(
            "CASE WHEN est_co <= est_ol THEN 'customer_first'"
            " ELSE 'lineitem_first' END"
        ).alias("chosen_by_estimate"),
        F.expr(
            "CASE WHEN actual_co <= actual_ol THEN 'customer_first'"
            " ELSE 'lineitem_first' END"
        ).alias("actually_cheaper"),
    )
    return orders_rows.select(
        "r.join_order",
        "r.est_intermediate",
        "r.actual_intermediate",
        "r.final_rows",
        "chosen_by_estimate",
        "actually_cheaper",
        F.expr(
            "CAST(chosen_by_estimate = actually_cheaper AS BIGINT)"
        ).alias("decision_correct"),
    )


_JOIN_ORDER_SQL = """
WITH kc_c AS (
    SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS cnt
    FROM customer WHERE c_custkey IS NOT NULL GROUP BY 1
),
kc_oc AS (
    SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS cnt
    FROM orders WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
    GROUP BY 1
),
kc_oo AS (
    SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS cnt
    FROM orders WHERE o_custkey IS NOT NULL AND o_orderkey IS NOT NULL
    GROUP BY 1
),
kc_l AS (
    SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cnt
    FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
),
st AS (
    SELECT (SELECT CAST(sum(cnt) AS BIGINT) FROM kc_c) AS rows_c,
           (SELECT CAST(count(*) AS BIGINT) FROM kc_c) AS ndv_c,
           (SELECT CAST(sum(cnt) AS BIGINT) FROM kc_oc) AS rows_oc,
           (SELECT CAST(count(*) AS BIGINT) FROM kc_oc) AS ndv_oc,
           (SELECT CAST(sum(cnt) AS BIGINT) FROM kc_oo) AS rows_oo,
           (SELECT CAST(count(*) AS BIGINT) FROM kc_oo) AS ndv_oo,
           (SELECT CAST(sum(cnt) AS BIGINT) FROM kc_l) AS rows_l,
           (SELECT CAST(count(*) AS BIGINT) FROM kc_l) AS ndv_l,
           (SELECT CAST(coalesce(sum(a.cnt * b.cnt), 0) AS BIGINT)
            FROM kc_c a JOIN kc_oc b USING (k)) AS actual_co,
           (SELECT CAST(coalesce(sum(a.cnt * b.cnt), 0) AS BIGINT)
            FROM kc_oo a JOIN kc_l b USING (k)) AS actual_ol,
           (SELECT CAST(coalesce(sum(l.cnt), 0) AS BIGINT)
            FROM orders o JOIN kc_l l ON l.k = o.o_orderkey
            WHERE EXISTS (SELECT 1 FROM kc_c c WHERE c.k = o.o_custkey))
               AS final_rows
),
est AS (
    SELECT *,
           CASE WHEN greatest(ndv_c, ndv_oc) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(CAST(rows_c AS HUGEINT) * rows_oc
                // greatest(ndv_c, ndv_oc) AS BIGINT) END AS est_co,
           CASE WHEN greatest(ndv_oo, ndv_l) = 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(CAST(rows_oo AS HUGEINT) * rows_l
                // greatest(ndv_oo, ndv_l) AS BIGINT) END AS est_ol
    FROM st
),
verdict AS (
    SELECT *,
           CASE WHEN est_co <= est_ol THEN 'customer_first'
                ELSE 'lineitem_first' END AS chosen_by_estimate,
           CASE WHEN actual_co <= actual_ol THEN 'customer_first'
                ELSE 'lineitem_first' END AS actually_cheaper
    FROM est
)
SELECT o.join_order,
       CASE o.join_order WHEN 'customer_first' THEN v.est_co
            ELSE v.est_ol END AS est_intermediate,
       CASE o.join_order WHEN 'customer_first' THEN v.actual_co
            ELSE v.actual_ol END AS actual_intermediate,
       v.final_rows, v.chosen_by_estimate, v.actually_cheaper,
       CAST(v.chosen_by_estimate = v.actually_cheaper AS BIGINT)
           AS decision_correct
FROM verdict v
CROSS JOIN (VALUES ('customer_first'), ('lineitem_first')) o(join_order)
"""


QUERIES = {
    "kmv_distinct_daily": kmv_distinct_daily,
    "kmv_rolling_distinct": kmv_rolling_distinct,
    "hll_union_rolling": hll_union_rolling,
    "bloom_prefilter_audit": bloom_prefilter_audit,
    "shuffle_skew_audit": shuffle_skew_audit,
    "phrase_search_positional": phrase_search_positional,
    "join_cardinality_estimate": join_cardinality_estimate,
    "kmv_audience_intersection": kmv_audience_intersection,
    "kmv_audience_difference": kmv_audience_difference,
    "file_skipping_audit": file_skipping_audit,
    "encoding_choice_audit": encoding_choice_audit,
    "cms_frequency_audit": cms_frequency_audit,
    "topk_merge_audit": topk_merge_audit,
    "watermark_lateness_audit": watermark_lateness_audit,
    "join_order_recommendation": join_order_recommendation,
}

ORACLE = {
    "kmv_distinct_daily": _KMV_DAILY_SQL,
    "kmv_rolling_distinct": _KMV_ROLLING_SQL,
    "hll_union_rolling": _HLL_ROLLING_SQL,
    "bloom_prefilter_audit": _BLOOM_SQL,
    "shuffle_skew_audit": _SKEW_SQL,
    "phrase_search_positional": _PHRASE_SQL,
    "join_cardinality_estimate": _CARD_SQL,
    "kmv_audience_intersection": _KMV_INTER_SQL,
    "kmv_audience_difference": _KMV_DIFF_SQL,
    "file_skipping_audit": _SKIP_SQL,
    "encoding_choice_audit": _encoding_sql(),
    "cms_frequency_audit": _CMS_SQL,
    "topk_merge_audit": _TOPK_MERGE_SQL,
    "watermark_lateness_audit": _LATENESS_SQL,
    "join_order_recommendation": _JOIN_ORDER_SQL,
}
