"""Curation-recipe operators, round 3 (r9 waves 31-33): the published
pretrain/posttrain recipes between "dedup" and "train" that the earlier
families stopped short of — SemDeDup-style embedding-prune tuning, CCNet
perplexity bucketing, fastText-style hashed linear quality scoring,
preference-pair aggregation + Bradley-Terry strengths for reward-model
data, Dawid-Skene-style weighted label aggregation, discounted episode
returns for RL logs, and ROUGE-style n-gram overlap eval.

All beyond the reference surface (BASELINE.json north-star); each operator
cites the published recipe it re-expresses. Scale notes inline per
operator; the module-wide rules are the repo's standing ones: candidates
are always blocked/bucketed (never all-pairs), arithmetic that must match
the oracle bit-for-bit is integer micro/milli-units, doubles appear only
as single divisions of the same two integers on both engines, and every
iterative method runs a FIXED unrolled round count so the whole job is one
declarative DAG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.exprs import (
    cosine,
    occurrence_tagged,
    ordered_pair_structs,
    tokens,
)
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("text").isNotNull()
    )


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return load_table(spark, sf_dir, "events", fan_out=True)


# ---------------------------------------------------------------------------
# Wave 31a: SemDeDup epsilon sweep (Abbas et al. 2023, "SemDeDup: Data-
# efficient learning at web-scale through semantic deduplication").
# SemDeDup clusters embeddings with k-means and drops all but one of every
# within-cluster epsilon-similar group. The load-bearing decision is
# epsilon; this operator produces the tuning table the threshold is picked
# from: for each candidate epsilon, how many within-cell pairs exceed it,
# how many vectors the keep-first rule drops, and the corpus retention.
# Drop rule (documented): a vector is dropped at epsilon if ANY lower-id
# vector in its cell is > epsilon similar — the one-pass superset of the
# sequential greedy (identical when similarity is transitive inside an
# epsilon-ball, the regime SemDeDup targets). The actioning/tuning sibling
# of `dedup_embedding_cosine` (which emits the pair list at one threshold,
# blocked on (label, cell)); here blocking is cell-only, as in the paper.
# Scale: pairs live inside coarse-quantizer cells (llm_ops._cells: K grows
# with n, per-cell population ~IVF_TARGET_CELL), so pair volume is
# n·IVF_TARGET_CELL/2 — linear in n. The sweep reuses ONE pair frame and
# ONE per-vector max-similarity frame for every epsilon (conditional
# aggregates), so adding thresholds costs nothing but arithmetic.
# ---------------------------------------------------------------------------
SEMDEDUP_EPS = (0.4, 0.6, 0.8)


def semdedup_eps_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.plans.llm_ops import _cells

    apply_runtime_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    cells = _cells(emb)
    a, b = cells.alias("a"), cells.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("b.vec_id").alias("later_vec"),
        cosine(F.col("a.vec"), F.col("b.vec")).alias("score"),
    ).persist()  # two aggregation branches below; without the persist the
    #              within-cell cosine self-join (the operator's dominant
    #              cost) would evaluate twice per action
    # one pass over the pair frame: pair counts per eps + per-vector max
    pair_aggs = [
        F.sum(F.when(F.col("score") > F.lit(e), 1).otherwise(0))
        .cast("bigint")
        .alias(f"p{i}")
        for i, e in enumerate(SEMDEDUP_EPS)
    ]
    vmax = pairs.groupBy("later_vec").agg(F.max("score").alias("m"))
    drop_aggs = [
        F.sum(F.when(F.col("m") > F.lit(e), 1).otherwise(0))
        .cast("bigint")
        .alias(f"d{i}")
        for i, e in enumerate(SEMDEDUP_EPS)
    ]
    one = (
        pairs.agg(*pair_aggs)
        .crossJoin(F.broadcast(vmax.agg(*drop_aggs)))
        .crossJoin(
            F.broadcast(
                emb.agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
            )
        )
    )
    rows = ", ".join(
        f"struct({int(e * 1000)}L AS eps_milli, coalesce(p{i}, 0L) AS "
        f"n_pairs_over, coalesce(d{i}, 0L) AS n_dropped)"
        for i, e in enumerate(SEMDEDUP_EPS)
    )
    return (
        one.select(
            "n_vecs", F.explode(F.expr(f"array({rows})")).alias("r")
        )
        .select(
            F.col("r.eps_milli").alias("eps_milli"),
            "n_vecs",
            F.col("r.n_pairs_over").alias("n_pairs_over"),
            F.col("r.n_dropped").alias("n_dropped"),
            F.expr(
                "CASE WHEN n_vecs = 0 THEN 1000000L"
                " ELSE (n_vecs - r.n_dropped) * 1000000 div n_vecs END"
            ).alias("retention_micro"),
        )
    )


def _semdedup_sql() -> str:
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        IVF_ASSIGN_CTE,
        _COSINE_SQL,
    )

    per_eps = "\nUNION ALL\n".join(
        f"""SELECT CAST({int(e * 1000)} AS BIGINT) AS eps_milli,
       (SELECT CAST(count(*) AS BIGINT) FROM emb) AS n_vecs,
       (SELECT CAST(coalesce(sum(CASE WHEN score > {e} THEN 1 ELSE 0 END), 0)
               AS BIGINT) FROM pairs) AS n_pairs_over,
       (SELECT CAST(coalesce(sum(CASE WHEN m > {e} THEN 1 ELSE 0 END), 0)
               AS BIGINT) FROM vmax) AS n_dropped"""
        for e in SEMDEDUP_EPS
    )
    return f"""
WITH {IVF_ASSIGN_CTE},
pairs AS (
    SELECT b.vec_id AS later_vec,
           {_COSINE_SQL.format(a="a.vec", b="b.vec")} AS score
    FROM assigned a JOIN assigned b
      ON a.cell = b.cell AND a.vec_id < b.vec_id
),
vmax AS (SELECT later_vec, max(score) AS m FROM pairs GROUP BY 1),
sweep AS ({per_eps})
SELECT eps_milli, n_vecs, n_pairs_over, n_dropped,
       CASE WHEN n_vecs = 0 THEN CAST(1000000 AS BIGINT)
            ELSE (n_vecs - n_dropped) * 1000000 // n_vecs END
           AS retention_micro
FROM sweep
"""


# ---------------------------------------------------------------------------
# Wave 31b: CCNet perplexity bucketing (Wenzek et al. 2020, "CCNet:
# Extracting high quality monolingual datasets from web crawl data").
# CCNet scores every document with a per-language LM and splits each
# language into head/middle/tail perplexity terciles; training recipes then
# keep head(+middle). Here the LM score is the repo's oracle-proven
# corpus-bigram fluency score (`mining.lm_quality_probability` — HIGHER
# mean bigram probability = more fluent = "head"), and the split is the
# deterministic 30/40/30 rank rule: within each language, rank docs by
# (score DESC, doc_id) and cut at 3/10 and 7/10 of the language's doc
# count — pure integer comparisons, no percentile interpolation to drift
# between engines. Only docs the LM can score (>= 1 bigram) participate,
# exactly as CCNet scores only LM-scorable text.
# Scale: the LM build is the proven lm_quality shape (vocab-bounded
# broadcast table); bucketing adds one per-language window over doc-level
# rows — |docs| window rows, no corpus re-shuffle.
# ---------------------------------------------------------------------------
def perplexity_bucket_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.plans.mining import (
        lm_quality_probability,
    )

    scored = lm_quality_probability(spark, sf_dir).select(
        "doc_id", "mean_prob_micro"
    )
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    j = scored.join(docs, "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.col("mean_prob_micro").desc(), F.col("doc_id")
    )
    ranked = j.select(
        "doc_id",
        "lang",
        "mean_prob_micro",
        F.row_number().over(w).cast("bigint").alias("lang_rank"),
        F.count(F.lit(1))
        .over(Window.partitionBy("lang"))
        .cast("bigint")
        .alias("lang_n"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "mean_prob_micro",
        "lang_rank",
        F.when(F.col("lang_rank") * 10 <= F.col("lang_n") * 3, "head")
        .when(F.col("lang_rank") * 10 <= F.col("lang_n") * 7, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def _perplexity_bucket_sql() -> str:
    from realtimedatawarehouse_self_spark.plans.mining import _LM_PROB_SQL

    return f"""
WITH lm AS ({_LM_PROB_SQL}),
ranked AS (
    SELECT l.doc_id, d.lang, l.mean_prob_micro,
           CAST(row_number() OVER (
               PARTITION BY d.lang
               ORDER BY l.mean_prob_micro DESC, l.doc_id) AS BIGINT)
               AS lang_rank,
           CAST(count(*) OVER (PARTITION BY d.lang) AS BIGINT) AS lang_n
    FROM lm l JOIN documents d USING (doc_id)
)
SELECT doc_id, lang, mean_prob_micro, lang_rank,
       CASE WHEN lang_rank * 10 <= lang_n * 3 THEN 'head'
            WHEN lang_rank * 10 <= lang_n * 7 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM ranked
"""


# ---------------------------------------------------------------------------
# Wave 31c: fastText-style hashed linear quality scorer (Joulin et al.
# 2017 "Bag of Tricks for Efficient Text Classification"; the filter shape
# CCNet/RefinedWeb/FineWeb-Edu run over every crawl document). The real
# thing is: tokens -> hashing-trick feature ids -> linear layer -> keep/
# drop. Here the PLUMBING is real and the weights are a deterministic
# stand-in (weight(token) = 60-bit-md5 bucket mod 2001, range 0..2000
# milli with 1000 = neutral — swap the expression for a broadcast join
# against a trained weight table and nothing else changes). Weights are
# kept NON-NEGATIVE so the score is a floor division of non-negatives —
# Spark `div` truncates toward zero while DuckDB `//` floors, and they
# only agree when the dividend can't be negative (the repo's standing
# sign-robustness rule).
# Scale: per-row codegen over the token array (hash + sum inside one
# `aggregate`), zero shuffle, zero Python — the classifier runs at scan
# speed, which is the entire point of the fastText filter at 100 TB.
# ---------------------------------------------------------------------------
FT_WEIGHT_MOD = 2001  # weights 0..2000 milli; 1000 = neutral
FT_KEEP_MILLI = 1000  # keep iff mean token weight >= neutral


def fasttext_hash_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    w_expr = (
        "aggregate(transform(tok_arr, x -> "
        f"CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)"
        f" % {FT_WEIGHT_MOD}), "
        "0L, (acc, v) -> acc + v)"
    )
    scored = docs.filter(F.size("tok_arr") > 0).select(
        "doc_id",
        "lang",
        F.size("tok_arr").cast("bigint").alias("n_tokens"),
        F.expr(w_expr).alias("sum_w_milli"),
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_tokens",
        "sum_w_milli",
        F.expr("sum_w_milli div n_tokens").alias("score_milli"),
        F.when(
            F.expr("sum_w_milli div n_tokens") >= FT_KEEP_MILLI, "keep"
        )
        .otherwise("drop")
        .alias("decision"),
    )


_FASTTEXT_SQL = f"""
WITH t AS (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents WHERE text IS NOT NULL
),
s AS (
    SELECT doc_id, lang,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(toks, x ->
                TRY_CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
                % {FT_WEIGHT_MOD})) AS BIGINT) AS sum_w_milli
    FROM t WHERE len(toks) > 0
)
SELECT doc_id, lang, n_tokens, sum_w_milli,
       sum_w_milli // n_tokens AS score_milli,
       CASE WHEN sum_w_milli // n_tokens >= {FT_KEEP_MILLI}
            THEN 'keep' ELSE 'drop' END AS decision
FROM s
"""


# ---------------------------------------------------------------------------
# Wave 32a: pairwise preference matrix — the aggregation a reward-model /
# RLHF data pipeline runs over raw comparisons before ANY modeling: for
# every pair of alternatives, how many times was each preferred. The
# deterministic comparison source here: within each (user, day), event
# type A "beats" event type B when the user did A more often (ties
# recorded, excluded from wins) — the implicit-feedback analogue of a
# human A-vs-B vote.
# Scale: per-(user, day) counts are one map-side-combinable aggregate; the
# pair explode runs over each user-day's DISTINCT-TYPE list (bounded by
# |event types|, so <= T(T-1)/2 pairs per user-day regardless of event
# volume); the final matrix is a tiny (type_a, type_b) combine.
# `ordered_pair_structs` is the same codegen pair primitive the overlap/
# co-engagement family uses.
# ---------------------------------------------------------------------------
def _user_day_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    # ts IS NOT NULL matters for ENGINE PARITY, not just hygiene: Spark's
    # groupBy would keep a (user, NULL-day) group and explode comparisons
    # from it, while the oracle's self-join on a.day = b.day can never
    # match NULL = NULL — the repo-wide contract is that NULL-ts events
    # are not sequence evidence (episode_discounted_returns filters
    # identically).
    return (
        ev.filter(
            F.col("user_id").isNotNull()
            & F.col("event_type").isNotNull()
            & F.col("ts").isNotNull()
        )
        .groupBy(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    )


def _preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = _user_day_type_counts(spark, sf_dir)
    arr = counts.groupBy("user_id", "day").agg(
        F.sort_array(F.collect_list(F.struct("event_type", "ct"))).alias(
            "tc"
        )
    )
    return (
        arr.select(
            "day",
            F.explode(ordered_pair_structs("tc", "pa", "pb")).alias("p"),
        )
        .select(
            "day",
            F.col("p.pa.event_type").alias("type_a"),
            F.col("p.pb.event_type").alias("type_b"),
            F.col("p.pa.ct").alias("ca"),
            F.col("p.pb.ct").alias("cb"),
        )
    )


def pairwise_preference_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pairs = _preference_pairs(spark, sf_dir)
    return pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_comparisons"),
        F.sum(F.when(F.col("ca") > F.col("cb"), 1).otherwise(0))
        .cast("bigint")
        .alias("a_wins"),
        F.sum(F.when(F.col("cb") > F.col("ca"), 1).otherwise(0))
        .cast("bigint")
        .alias("b_wins"),
        F.sum(F.when(F.col("ca") == F.col("cb"), 1).otherwise(0))
        .cast("bigint")
        .alias("ties"),
    )


_PREF_PAIRS_CTE = """counts AS (
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(count(*) AS BIGINT) AS ct
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      AND ts IS NOT NULL
    GROUP BY 1, 2, 3
),
pp AS (
    SELECT a.day, a.event_type AS type_a, b.event_type AS type_b,
           a.ct AS ca, b.ct AS cb
    FROM counts a JOIN counts b
      ON a.user_id = b.user_id AND a.day = b.day
     AND a.event_type < b.event_type
)"""

_PREF_MATRIX_SQL = f"""
WITH {_PREF_PAIRS_CTE}
SELECT type_a, type_b,
       CAST(count(*) AS BIGINT) AS n_comparisons,
       CAST(sum(CASE WHEN ca > cb THEN 1 ELSE 0 END) AS BIGINT) AS a_wins,
       CAST(sum(CASE WHEN cb > ca THEN 1 ELSE 0 END) AS BIGINT) AS b_wins,
       CAST(sum(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS BIGINT) AS ties
FROM pp
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Wave 32b: Bradley-Terry strengths via the MM algorithm (Hunter 2004,
# "MM algorithms for generalized Bradley-Terry models") — THE model behind
# reward-model training pairs, chatbot-arena-style leaderboards, and
# preference-data quality checks. Fixed BT_ITERS minorization-maximization
# updates, unrolled declaratively:
#     s_i <- W_i * 1e12 // SUM_j ( n_ij * 1e12 // (s_i + s_j) )
# with strengths in integer micro-units (s0 = 1e6 flat), W_i = decisive
# wins of i, n_ij = decisive comparisons between i and j (ties excluded,
# the standard BT treatment). Every division is a floor over NON-NEGATIVE
# integers, so both engines agree bit-for-bit. Magnitudes: n_ij <= 1e5 at
# sf0.1 -> n_ij * 1e12 <= 1e17 < 2^63; D_i <= sum(n)*5e5 ~ 1e11; W*1e12
# <= 1e17 — all inside int64 with headroom (document before raising
# BT_ITERS past ~4 at larger n).
# Scale: the win matrix is |event types|^2 rows — driver-side tiny; each
# MM round is two joins on that tiny frame. The expensive part (the
# comparison scan) is the SAME one aggregate as the preference matrix.
# ---------------------------------------------------------------------------
BT_ITERS = 2
_BT_ONE = 1_000_000  # micro-unit strength scale
_BT_KK = 1_000_000_000_000  # 1e12: micro * micro


def _bt_strengths(pairs: DataFrame) -> DataFrame:
    """The MM core over a (type_a, type_b, ca, cb) comparison frame:
    returns (i, w_total, n_total, s) after BT_ITERS unrolled updates —
    shared by the full-data strengths below and the time-split holdout
    eval (`preference_holdout_accuracy`)."""
    matrix = pairs.groupBy("type_a", "type_b").agg(
        F.sum(F.when(F.col("ca") != F.col("cb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_ij"),
        F.sum(F.when(F.col("ca") > F.col("cb"), 1).otherwise(0))
        .cast("bigint")
        .alias("wins_a"),
    )
    # directed edges: (i, j, n_ij, wins of i over j) both ways
    edges = (
        matrix.select(
            F.col("type_a").alias("i"),
            F.col("type_b").alias("j"),
            "n_ij",
            F.col("wins_a").alias("w"),
        )
        .unionAll(
            matrix.select(
                F.col("type_b").alias("i"),
                F.col("type_a").alias("j"),
                "n_ij",
                (F.col("n_ij") - F.col("wins_a")).alias("w"),
            )
        )
        .filter(F.col("n_ij") > 0)
        .persist()
    )
    wins = edges.groupBy("i").agg(
        F.sum("w").cast("bigint").alias("w_total"),
        F.sum("n_ij").cast("bigint").alias("n_total"),
    )
    s = wins.select(
        "i", F.lit(_BT_ONE).cast("bigint").alias("s")
    )
    for _ in range(BT_ITERS):
        si = s.select(F.col("i"), F.col("s").alias("s_i"))
        sj = s.select(F.col("i").alias("j"), F.col("s").alias("s_j"))
        denom = (
            edges.join(si, "i")
            .join(sj, "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.expr(f"n_ij * CAST({_BT_KK} AS BIGINT) div (s_i + s_j)")
                )
                .cast("bigint")
                .alias("d")
            )
        )
        # greatest(., 1): a zero-win item floors to strength 1 micro so
        # (s_i + s_j) stays positive for the next round's division.
        # No localCheckpoint here, deliberately: the strengths frame is
        # |types| rows and the persisted `pairs` ancestor already caps
        # re-expansion; an EAGER checkpoint would shift the MM work into
        # untimed query-build and silently flatter the benched number.
        s = (
            wins.join(denom, "i")
            .select(
                "i",
                F.expr(
                    f"CASE WHEN d > 0 THEN greatest(w_total"
                    f" * CAST({_BT_KK} AS BIGINT) div d, 1L)"
                    f" ELSE CAST({_BT_ONE} AS BIGINT) END"
                ).alias("s"),
            )
        )
    return wins.join(s, "i")


def bradley_terry_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _bt_strengths(_preference_pairs(spark, sf_dir))
    w = Window.orderBy(F.col("s").desc(), F.col("i"))
    return out.select(
        F.col("i").alias("event_type"),
        F.col("w_total").alias("n_wins"),
        F.col("n_total").alias("n_comparisons"),
        F.col("s").alias("strength_micro"),
        F.row_number().over(w).cast("int").alias("rnk"),
    )


def _bt_cte_chain(src: str) -> list[str]:
    """The MM CTE chain (matrix -> edges -> wins -> s0..sN) over a pair
    source CTE named `src` — shared by the full-data oracle and the
    holdout eval's train-slice oracle. Final strengths CTE: s{BT_ITERS}."""
    ctes = [
        f"""matrix AS (
    SELECT type_a, type_b,
           CAST(sum(CASE WHEN ca <> cb THEN 1 ELSE 0 END) AS BIGINT) AS n_ij,
           CAST(sum(CASE WHEN ca > cb THEN 1 ELSE 0 END) AS BIGINT) AS wins_a
    FROM {src} GROUP BY 1, 2
)""",
        """edges AS (
    SELECT type_a AS i, type_b AS j, n_ij, wins_a AS w
    FROM matrix WHERE n_ij > 0
    UNION ALL
    SELECT type_b AS i, type_a AS j, n_ij, n_ij - wins_a AS w
    FROM matrix WHERE n_ij > 0
)""",
        """wins AS (
    SELECT i, CAST(sum(w) AS BIGINT) AS w_total,
           CAST(sum(n_ij) AS BIGINT) AS n_total
    FROM edges GROUP BY 1
)""",
        f"s0 AS (SELECT i, CAST({_BT_ONE} AS BIGINT) AS s FROM wins)",
    ]
    for k in range(BT_ITERS):
        ctes.append(f"""d{k} AS (
    SELECT e.i,
           CAST(sum(e.n_ij * CAST({_BT_KK} AS BIGINT) // (si.s + sj.s))
                AS BIGINT) AS d
    FROM edges e
    JOIN s{k} si ON e.i = si.i
    JOIN s{k} sj ON e.j = sj.i
    GROUP BY 1
)""")
        ctes.append(f"""s{k + 1} AS (
    SELECT w.i,
           CAST(CASE WHEN d.d > 0
                THEN greatest(w.w_total * CAST({_BT_KK} AS BIGINT) // d.d, 1)
                ELSE {_BT_ONE} END AS BIGINT) AS s
    FROM wins w JOIN d{k} d ON w.i = d.i
)""")
    return ctes


def _bt_sql() -> str:
    joined = ",\n".join([_PREF_PAIRS_CTE] + _bt_cte_chain("pp"))
    return f"""
WITH {joined}
SELECT w.i AS event_type,
       w.w_total AS n_wins,
       w.n_total AS n_comparisons,
       s.s AS strength_micro,
       CAST(row_number() OVER (ORDER BY s.s DESC, w.i) AS INTEGER) AS rnk
FROM wins w JOIN s{BT_ITERS} s ON w.i = s.i
"""


# ---------------------------------------------------------------------------
# Wave 35a: time-split holdout accuracy of the Bradley-Terry strengths —
# the eval the preference family ships with (the reward-model analogue of
# `recsys_holdout_eval`): fit strengths on the FIRST 4/5 of calendar days
# (deterministic day-rank split, integer rank*5 <= n*4 rule), then score
# every decisive held-out comparison whose pair has decisive TRAIN
# evidence. Two predictors on the SAME eval set: the BT strengths
# (higher s wins; exact tie -> type_a, the lexicographically smaller by
# construction) and the per-pair train majority (wins_a*2 vs n_ij; tie ->
# type_a) — BT beating majority is the signal the transitive strength
# model adds value over memorized pair win-rates.
# Scale: the comparison scan + pair explode is the one data-sized stage
# (shared shape with the matrix/BT); strengths and the train matrix are
# |types|-bounded broadcasts; output is |test days| rows.
# ---------------------------------------------------------------------------
def preference_holdout_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pairs = _preference_pairs(spark, sf_dir).persist()
    days = (
        pairs.select("day")
        .distinct()
        .select(
            "day",
            F.row_number()
            .over(Window.orderBy("day"))
            .cast("bigint")
            .alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy())
            .cast("bigint")
            .alias("n"),
        )
    )
    train_days = days.filter(F.expr("rn * 5 <= n * 4")).select("day")
    test_days = days.filter(F.expr("rn * 5 > n * 4")).select("day")
    train = pairs.join(F.broadcast(train_days), "day")
    strengths = _bt_strengths(train)
    tmaj = (
        train.groupBy("type_a", "type_b")
        .agg(
            F.sum(F.when(F.col("ca") != F.col("cb"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_ij"),
            F.sum(F.when(F.col("ca") > F.col("cb"), 1).otherwise(0))
            .cast("bigint")
            .alias("wins_a"),
        )
        .filter(F.col("n_ij") > 0)
        .select(
            "type_a",
            "type_b",
            F.expr(
                "CASE WHEN wins_a * 2 >= n_ij THEN type_a"
                " ELSE type_b END"
            ).alias("maj_pred"),
        )
    )
    sa = strengths.select(
        F.col("i").alias("type_a"), F.col("s").alias("s_a")
    )
    sb = strengths.select(
        F.col("i").alias("type_b"), F.col("s").alias("s_b")
    )
    ev = (
        pairs.join(F.broadcast(test_days), "day")
        .filter(F.col("ca") != F.col("cb"))
        .join(F.broadcast(tmaj), ["type_a", "type_b"])
        .join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "day",
            F.expr(
                "CASE WHEN ca > cb THEN type_a ELSE type_b END"
            ).alias("actual"),
            F.expr(
                "CASE WHEN s_a >= s_b THEN type_a ELSE type_b END"
            ).alias("bt_pred"),
            "maj_pred",
        )
    )
    return ev.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval"),
        F.sum(F.expr("CASE WHEN bt_pred = actual THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("bt_correct"),
        F.sum(F.expr("CASE WHEN maj_pred = actual THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("maj_correct"),
        F.expr(
            "sum(CASE WHEN bt_pred = actual THEN 1 ELSE 0 END)"
            " * 1000000 div count(*)"
        )
        .cast("bigint")
        .alias("bt_acc_micro"),
        F.expr(
            "sum(CASE WHEN maj_pred = actual THEN 1 ELSE 0 END)"
            " * 1000000 div count(*)"
        )
        .cast("bigint")
        .alias("maj_acc_micro"),
    )


def _pref_holdout_sql() -> str:
    chain = ",\n".join(_bt_cte_chain("train"))
    return f"""
WITH {_PREF_PAIRS_CTE},
days AS (
    SELECT day,
           CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
           CAST(count(*) OVER () AS BIGINT) AS n
    FROM (SELECT DISTINCT day FROM pp)
),
train AS (
    SELECT pp.* FROM pp JOIN days d ON pp.day = d.day
    WHERE d.rn * 5 <= d.n * 4
),
{chain},
tmaj AS (
    SELECT type_a, type_b,
           CASE WHEN wins_a * 2 >= n_ij THEN type_a ELSE type_b END
               AS maj_pred
    FROM matrix WHERE n_ij > 0
),
ev AS (
    SELECT pp.day,
           CASE WHEN pp.ca > pp.cb THEN pp.type_a ELSE pp.type_b END
               AS actual,
           CASE WHEN sa.s >= sb.s THEN pp.type_a ELSE pp.type_b END
               AS bt_pred,
           m.maj_pred
    FROM pp
    JOIN days d ON pp.day = d.day AND d.rn * 5 > d.n * 4
    JOIN tmaj m ON pp.type_a = m.type_a AND pp.type_b = m.type_b
    JOIN s{BT_ITERS} sa ON pp.type_a = sa.i
    JOIN s{BT_ITERS} sb ON pp.type_b = sb.i
    WHERE pp.ca <> pp.cb
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_eval,
       CAST(sum(CASE WHEN bt_pred = actual THEN 1 ELSE 0 END) AS BIGINT)
           AS bt_correct,
       CAST(sum(CASE WHEN maj_pred = actual THEN 1 ELSE 0 END) AS BIGINT)
           AS maj_correct,
       CAST(sum(CASE WHEN bt_pred = actual THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS bt_acc_micro,
       CAST(sum(CASE WHEN maj_pred = actual THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS maj_acc_micro
FROM ev
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Wave 32c: Dawid-Skene-style weighted label aggregation (Dawid & Skene
# 1979; the one-EM-round accuracy-weighted variant every label pipeline
# starts from). Three deterministic annotators label every document
# (A: length rule, B: lexical-diversity rule — the two kappa annotators —
# plus C: token-count rule); the majority vote initializes truth, each
# annotator's accuracy against the majority is estimated globally in
# micro-units, then labels are re-aggregated with accuracy weights
# (final = 1 iff sum of accuracies of 1-voters > sum of accuracies of
# 0-voters; exact tie keeps the majority). Output is the per-source audit:
# majority vs weighted positives and the flip count — the signal that a
# low-accuracy annotator was overruling better ones.
# Scale: one scan with per-row codegen labeling, one global 1-row accuracy
# aggregate (broadcast back), one per-source combine. No iteration beyond
# the single documented EM round; more rounds = repeat the same two tiny
# aggregates.
# ---------------------------------------------------------------------------
DS_LEN_THRESH = 200  # annotator A (= kappa's length rule)
DS_DIV_NUM, DS_DIV_DEN = 3, 10  # annotator B (= kappa's diversity rule)
DS_TOK_THRESH = 40  # annotator C: long-token-count rule

_DS_TOKS = "filter(split(text, ' '), x -> x != '')"
_DS_A = f"CASE WHEN n_chars >= {DS_LEN_THRESH} THEN 1 ELSE 0 END"
_DS_B = (
    f"CASE WHEN CAST(size(array_distinct({_DS_TOKS})) AS BIGINT)"
    f" * {DS_DIV_DEN} >= CAST(size({_DS_TOKS}) AS BIGINT)"
    f" * {DS_DIV_NUM} THEN 1 ELSE 0 END"
)
_DS_C = f"CASE WHEN size({_DS_TOKS}) >= {DS_TOK_THRESH} THEN 1 ELSE 0 END"


def dawid_skene_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    labeled = docs.select(
        "source",
        F.expr(_DS_A).cast("bigint").alias("a"),
        F.expr(_DS_B).cast("bigint").alias("b"),
        F.expr(_DS_C).cast("bigint").alias("c"),
    ).withColumn(
        "m", F.expr("CASE WHEN a + b + c >= 2 THEN 1 ELSE 0 END")
    )
    acc = labeled.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CASE WHEN a = m THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("ka"),
        F.sum(F.expr("CASE WHEN b = m THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("kb"),
        F.sum(F.expr("CASE WHEN c = m THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("kc"),
    ).select(
        F.expr("ka * 1000000 div nullif(n, 0)").alias("acc_a"),
        F.expr("kb * 1000000 div nullif(n, 0)").alias("acc_b"),
        F.expr("kc * 1000000 div nullif(n, 0)").alias("acc_c"),
    )
    rev = labeled.crossJoin(F.broadcast(acc)).withColumn(
        "f",
        F.expr(
            "CASE WHEN a * acc_a + b * acc_b + c * acc_c"
            " > (1 - a) * acc_a + (1 - b) * acc_b + (1 - c) * acc_c"
            " THEN 1 WHEN a * acc_a + b * acc_b + c * acc_c"
            " < (1 - a) * acc_a + (1 - b) * acc_b + (1 - c) * acc_c"
            " THEN 0 ELSE m END"
        ),
    )
    return rev.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("m").cast("bigint").alias("majority_pos"),
        F.sum("f").cast("bigint").alias("weighted_pos"),
        F.sum(F.expr("CASE WHEN f <> m THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_flips"),
        F.max(F.expr("acc_a")).alias("acc_a_micro"),
        F.max(F.expr("acc_b")).alias("acc_b_micro"),
        F.max(F.expr("acc_c")).alias("acc_c_micro"),
    )


_DS_TOKS_SQL = "list_filter(string_split(text, ' '), x -> x <> '')"
_DS_SQL = f"""
WITH labeled AS (
    SELECT source,
           CAST(CASE WHEN n_chars >= {DS_LEN_THRESH} THEN 1 ELSE 0 END
                AS BIGINT) AS a,
           CAST(CASE WHEN CAST(len(list_distinct({_DS_TOKS_SQL})) AS BIGINT)
                          * {DS_DIV_DEN}
                     >= CAST(len({_DS_TOKS_SQL}) AS BIGINT) * {DS_DIV_NUM}
                THEN 1 ELSE 0 END AS BIGINT) AS b,
           CAST(CASE WHEN len({_DS_TOKS_SQL}) >= {DS_TOK_THRESH}
                THEN 1 ELSE 0 END AS BIGINT) AS c
    FROM documents WHERE text IS NOT NULL
),
lm AS (
    SELECT *, CASE WHEN a + b + c >= 2 THEN 1 ELSE 0 END AS m FROM labeled
),
acc AS (
    SELECT CAST(sum(CASE WHEN a = m THEN 1 ELSE 0 END) * 1000000
                // nullif(count(*), 0) AS BIGINT) AS acc_a,
           CAST(sum(CASE WHEN b = m THEN 1 ELSE 0 END) * 1000000
                // nullif(count(*), 0) AS BIGINT) AS acc_b,
           CAST(sum(CASE WHEN c = m THEN 1 ELSE 0 END) * 1000000
                // nullif(count(*), 0) AS BIGINT) AS acc_c
    FROM lm
),
rev AS (
    SELECT lm.*, acc.acc_a, acc.acc_b, acc.acc_c,
           CASE WHEN a * acc_a + b * acc_b + c * acc_c
                     > (1 - a) * acc_a + (1 - b) * acc_b + (1 - c) * acc_c
                THEN 1
                WHEN a * acc_a + b * acc_b + c * acc_c
                     < (1 - a) * acc_a + (1 - b) * acc_b + (1 - c) * acc_c
                THEN 0 ELSE m END AS f
    FROM lm CROSS JOIN acc
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(m) AS BIGINT) AS majority_pos,
       CAST(sum(f) AS BIGINT) AS weighted_pos,
       CAST(sum(CASE WHEN f <> m THEN 1 ELSE 0 END) AS BIGINT) AS n_flips,
       CAST(max(acc_a) AS BIGINT) AS acc_a_micro,
       CAST(max(acc_b) AS BIGINT) AS acc_b_micro,
       CAST(max(acc_c) AS BIGINT) AS acc_c_micro
FROM rev
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Wave 33a: discounted episode returns — the first aggregate an RL /
# agentic-trace pipeline computes over logged episodes (returns-to-go for
# decision-transformer-style training, episode value for filtering).
# Episode = (user, day); steps ordered by (ts, event_id); reward = the
# event's cent value; gamma = 1/2 EXACTLY, so the return is
#     G = SUM_t  r_t_cents // 2^t      (per-term floor, documented)
# computed with arithmetic right-shifts — bit-identical across engines
# (arithmetic shift = floor division by 2^t for int64, matching DuckDB's
# flooring //; the repo's decayed_user_score sign-robustness precedent).
# Terms past t >= 40 are exactly 0 for any cent value that fits the table
# (and Java shift semantics wrap the shift amount mod 64, so the guard is
# correctness-critical, not just an optimization).
# Scale: one per-(user, day) window sort — the same shuffle sessionize
# pays — then a per-episode combine; output is |user-days| rows.
# ---------------------------------------------------------------------------
_GAMMA_MAX_T = 40


def episode_discounted_returns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    rr = F.expr("CAST(floor(coalesce(value, 0.0) * 100 + 0.5) AS BIGINT)")
    # ordering is (ts, event_id, reward): NULL event_ids coalesce to -1 and
    # the reward tie-break makes the step sequence RESULT-deterministic —
    # rows that still tie are interchangeable, so the discounted sum is
    # identical on both engines regardless of their NULL-sort defaults
    w = Window.partitionBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd")
    ).orderBy("ts", F.coalesce("event_id", F.lit(-1)), rr)
    steps = ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        rr.alias("r"),
        (F.row_number().over(w) - 1).cast("int").alias("t"),
    )
    return steps.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_steps"),
        F.sum("r").cast("bigint").alias("total_reward_cents"),
        F.sum(
            F.expr(
                f"CASE WHEN t >= {_GAMMA_MAX_T} THEN 0L"
                " ELSE shiftright(r, t) END"
            )
        )
        .cast("bigint")
        .alias("discounted_return_cents"),
    )


_EPISODE_SQL = f"""
WITH steps AS (
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
           CAST(floor(coalesce(value, 0.0) * 100 + 0.5) AS BIGINT) AS r,
           CAST(row_number() OVER (
               PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
               ORDER BY ts, coalesce(event_id, -1),
                        CAST(floor(coalesce(value, 0.0) * 100 + 0.5)
                             AS BIGINT)) - 1 AS INTEGER) AS t
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
)
SELECT user_id, day,
       CAST(count(*) AS BIGINT) AS n_steps,
       CAST(sum(r) AS BIGINT) AS total_reward_cents,
       CAST(sum(CASE WHEN t >= {_GAMMA_MAX_T} THEN 0
                     ELSE r // (CAST(1 AS BIGINT) << t) END) AS BIGINT)
           AS discounted_return_cents
FROM steps
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Wave 33b: ROUGE-style bigram overlap eval (Lin 2004, "ROUGE: A Package
# for Automatic Evaluation of Summaries") — clipped n-gram precision/
# recall/F1 of a candidate against a reference, THE summarization/
# generation eval a data pipeline batch-scores model outputs with. Here
# every document is scored against its group's deterministic reference
# (the lowest-doc_id bigram-bearing document of the same (source, lang)).
# Counts are CLIPPED (multiset intersection: sum of min(candidate count,
# reference count) per bigram) exactly as ROUGE defines them; P/R/F1 in
# integer micro-units (f1 = 2pr // (p+r), p,r <= 1e6 so 2pr <= 2e12 —
# int64-safe).
# Scale / plan shape (r10 optimization rewrite, guide §2.3-2.4): the
# reference side is ONE doc per (source, lang) — broadcast at every
# scale. Clipped overlap is computed IN-ROW via occurrence-tagged bigram
# sets (functions/exprs.occurrence_tagged): overlap_ct =
# size(array_intersect(tagged_cand, tagged_ref)). No bigram row crosses
# an exchange — the old explode -> (doc, bigram) combine -> overlap join
# (three data-sized shuffles of bigram strings) collapses to one tiny
# (source, lang) aggregate plus a broadcast join; bigram totals are
# n_tokens - 1 arithmetically (every position yields a bigram).
# ---------------------------------------------------------------------------
def rouge_bigram_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    eligible = docs.filter(F.size("tok_arr") >= 2)

    def tagged(src: DataFrame) -> DataFrame:
        srt = src.select(
            "doc_id",
            "source",
            "lang",
            (F.size("tok_arr").cast("bigint") - 1).alias("n_bigrams"),
            F.expr(
                "array_sort(transform(sequence(0, size(tok_arr) - 2),"
                " i -> concat(tok_arr[i], ' ', tok_arr[i+1])))"
            ).alias("sbg"),
        )
        return srt.select(
            "doc_id",
            "source",
            "lang",
            "n_bigrams",
            F.expr(occurrence_tagged("sbg")).alias("tbg"),
        )

    base = tagged(eligible)
    ref_ids = eligible.groupBy("source", "lang").agg(
        F.min("doc_id").alias("ref_doc_id")
    )
    rid = ref_ids.select(
        "ref_doc_id",
        F.col("source").alias("rsource0"),
        F.col("lang").alias("rlang0"),
    )
    ref = tagged(
        eligible.join(
            F.broadcast(rid),
            (eligible.doc_id == rid.ref_doc_id)
            & (eligible.source == rid.rsource0)
            & (eligible.lang == rid.rlang0),
        ).select("doc_id", "source", "lang", "tok_arr")
    ).select(
        F.col("doc_id").alias("ref_doc_id"),
        F.col("source").alias("rsource"),
        F.col("lang").alias("rlang"),
        F.col("n_bigrams").alias("n_ref_bigrams"),
        F.col("tbg").alias("rbg"),
    )
    out = (
        base.join(
            F.broadcast(ref),
            (base.source == ref.rsource) & (base.lang == ref.rlang),
        )
        .filter(F.col("doc_id") != F.col("ref_doc_id"))
        .select(
            "doc_id",
            "source",
            "lang",
            "ref_doc_id",
            F.col("n_bigrams").alias("n_cand_bigrams"),
            "n_ref_bigrams",
            F.expr("CAST(size(array_intersect(tbg, rbg)) AS BIGINT)").alias(
                "ovc"
            ),
        )
    )
    return out.select(
        "doc_id",
        "source",
        "lang",
        "ref_doc_id",
        "n_cand_bigrams",
        "n_ref_bigrams",
        F.col("ovc").alias("overlap_ct"),
        F.expr("ovc * 1000000 div n_cand_bigrams").alias("precision_micro"),
        F.expr("ovc * 1000000 div n_ref_bigrams").alias("recall_micro"),
        F.expr(
            "CASE WHEN (ovc * 1000000 div n_cand_bigrams)"
            " + (ovc * 1000000 div n_ref_bigrams) = 0 THEN 0L ELSE"
            " 2 * (ovc * 1000000 div n_cand_bigrams)"
            " * (ovc * 1000000 div n_ref_bigrams)"
            " div ((ovc * 1000000 div n_cand_bigrams)"
            " + (ovc * 1000000 div n_ref_bigrams)) END"
        ).alias("f1_micro"),
    )


_ROUGE_SQL = """
WITH bi AS (
    SELECT doc_id, source, lang, t[i] || ' ' || t[i+1] AS bg
    FROM (
        SELECT doc_id, source, lang,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents WHERE text IS NOT NULL
    ), UNNEST(range(1, greatest(len(t), 1))) AS u(i)
),
counts AS (
    SELECT doc_id, source, lang, bg, CAST(count(*) AS BIGINT) AS ct
    FROM bi GROUP BY 1, 2, 3, 4
),
ref_ids AS (
    SELECT source, lang, min(doc_id) AS ref_doc_id
    FROM counts GROUP BY 1, 2
),
ref AS (
    SELECT c.source, c.lang, r.ref_doc_id, c.bg, c.ct AS rct
    FROM counts c JOIN ref_ids r
      ON c.doc_id = r.ref_doc_id AND c.source = r.source
     AND c.lang = r.lang
),
ref_tot AS (
    SELECT source, lang, ref_doc_id,
           CAST(sum(rct) AS BIGINT) AS n_ref_bigrams
    FROM ref GROUP BY 1, 2, 3
),
cand_tot AS (
    SELECT doc_id, source, lang, CAST(sum(ct) AS BIGINT) AS n_cand_bigrams
    FROM counts GROUP BY 1, 2, 3
),
ov AS (
    SELECT c.doc_id, c.source, c.lang,
           CAST(sum(least(c.ct, r.rct)) AS BIGINT) AS overlap_ct
    FROM counts c JOIN ref r
      ON c.source = r.source AND c.lang = r.lang AND c.bg = r.bg
     AND c.doc_id <> r.ref_doc_id
    GROUP BY 1, 2, 3
),
out AS (
    SELECT ct.doc_id, ct.source, ct.lang, rt.ref_doc_id,
           ct.n_cand_bigrams, rt.n_ref_bigrams,
           coalesce(o.overlap_ct, 0) AS ovc
    FROM cand_tot ct
    JOIN ref_tot rt ON ct.source = rt.source AND ct.lang = rt.lang
    LEFT JOIN ov o ON ct.doc_id = o.doc_id AND ct.source = o.source
                  AND ct.lang = o.lang
    WHERE ct.doc_id <> rt.ref_doc_id
)
SELECT doc_id, source, lang, ref_doc_id, n_cand_bigrams, n_ref_bigrams,
       CAST(ovc AS BIGINT) AS overlap_ct,
       ovc * 1000000 // n_cand_bigrams AS precision_micro,
       ovc * 1000000 // n_ref_bigrams AS recall_micro,
       CAST(CASE WHEN (ovc * 1000000 // n_cand_bigrams)
                      + (ovc * 1000000 // n_ref_bigrams) = 0 THEN 0 ELSE
            2 * (ovc * 1000000 // n_cand_bigrams)
              * (ovc * 1000000 // n_ref_bigrams)
            // ((ovc * 1000000 // n_cand_bigrams)
                + (ovc * 1000000 // n_ref_bigrams)) END AS BIGINT)
           AS f1_micro
FROM out
"""


# ---------------------------------------------------------------------------
# Wave 39a: BLEU-style n-gram eval (Papineni et al. 2002) — the clipped
# 1..4-gram precision geometric mean against the same deterministic
# per-(source, lang) reference rouge_bigram_eval uses (lowest-doc_id
# group member), completing the generation-eval pair (ROUGE = recall
# view, BLEU = precision view). Exact-arithmetic notes:
#   * each p_n is ONE double division of two exact bigints — identical
#     bits on both engines;
#   * the 4-way geometric mean is sqrt(sqrt(p1*p2*p3*p4)) with a fixed
#     multiply order — sqrt and * are IEEE-754 correctly rounded on both
#     engines (the mixture_temperature_sweep doctrine); pow()/exp()/ln()
#     never appear;
#   * the brevity penalty needs exp(1 - r/c), which is NOT correctly-
#     rounded-portable, so the op emits the BP INPUTS instead — exact
#     cand_len / ref_len and the bp_applies flag (cand shorter than ref);
#     a consumer applies exp on its own numerics. bleu_micro is the
#     floored micro GM WITHOUT the penalty, the standard smoothing-free
#     "BLEU-4 (no BP)" table.
# Docs with fewer than 4 tokens have no 4-gram and are excluded, and the
# reference is the lowest-doc_id doc AMONG THE BLEU-ELIGIBLE (>= 4-token)
# group members — so when a group's overall-lowest bigram-bearing doc is
# short, ROUGE scores against it while BLEU elects the next eligible doc
# (the precision/recall pairing holds exactly when the shared reference
# has >= 4 tokens). Identical on both engines by construction.
# Scale / plan shape (r10 optimization rewrite, guide §2.3-2.4): the
# reference side is ONE doc per (source, lang) — broadcast at every
# scale. The clip counts are computed IN-ROW: each doc's per-n gram
# multiset is occurrence-tagged (functions/exprs.occurrence_tagged) so
# the clipped multiset intersection against the broadcast reference is
# size(array_intersect(tagged_cand, tagged_ref)) — pure codegen/HOF JVM
# work. No gram row ever crosses an exchange: the old explode ->
# (doc, n, gram) combine -> clip join chain (three data-sized shuffles
# of gram STRINGS) collapses to one tiny (source, lang) aggregate for
# reference election plus a broadcast join. tot_n needs no counting at
# all: every position yields a gram, so tot_n = n_tokens - n + 1
# arithmetically (the oracle's sum-of-counts equals it by construction).
# ---------------------------------------------------------------------------
_BLEU_GM_SQL = (
    "sqrt(sqrt(((CAST(clip1 AS DOUBLE) / CAST(tot1 AS DOUBLE))"
    " * (CAST(clip2 AS DOUBLE) / CAST(tot2 AS DOUBLE)))"
    " * ((CAST(clip3 AS DOUBLE) / CAST(tot3 AS DOUBLE))"
    " * (CAST(clip4 AS DOUBLE) / CAST(tot4 AS DOUBLE)))))"
)


def _word_gram_sorted_sql(n: int) -> str:
    """Sorted n-gram multiset of tok_arr, identical gram text to the
    oracle's array_to_string(t[i:i+n-1], ' ')."""
    return (
        f"array_sort(transform(sequence(0, size(tok_arr) - {n}),"
        f" i -> array_join(slice(tok_arr, i + 1, {n}), ' ')))"
    )


def bleu_ngram_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    eligible = docs.filter(F.size("tok_arr") >= 4)
    # Two-step projection: sorted gram arrays land in named columns FIRST
    # so the occurrence-tagging expression (which references its input
    # several times) never duplicates the sort (CollapseProject keeps
    # multi-referenced non-cheap aliases as a separate project).
    def tagged(src: DataFrame) -> DataFrame:
        srt = src.select(
            "doc_id",
            "source",
            "lang",
            F.size("tok_arr").cast("bigint").alias("n_tokens"),
            *[
                F.expr(_word_gram_sorted_sql(n)).alias(f"s{n}")
                for n in range(1, 5)
            ],
        )
        return srt.select(
            "doc_id",
            "source",
            "lang",
            "n_tokens",
            *[
                F.expr(occurrence_tagged(f"s{n}")).alias(f"t{n}")
                for n in range(1, 5)
            ],
        )

    base = tagged(eligible)
    ref_ids = eligible.groupBy("source", "lang").agg(
        F.min("doc_id").alias("ref_doc_id")
    )
    # Reference branch: the broadcast ref_ids filter runs BEFORE the gram
    # projection, so only the |source x lang| elected docs ever build
    # their tagged arrays on this side.
    rid = ref_ids.select(
        "ref_doc_id",
        F.col("source").alias("rsource0"),
        F.col("lang").alias("rlang0"),
    )
    ref = tagged(
        eligible.join(
            F.broadcast(rid),
            (eligible.doc_id == rid.ref_doc_id)
            & (eligible.source == rid.rsource0)
            & (eligible.lang == rid.rlang0),
        ).select("doc_id", "source", "lang", "tok_arr")
    ).select(
        F.col("doc_id").alias("ref_doc_id"),
        F.col("source").alias("rsource"),
        F.col("lang").alias("rlang"),
        F.col("n_tokens").alias("ref_len"),
        *[F.col(f"t{n}").alias(f"r{n}") for n in range(1, 5)],
    )
    out = base.join(
        F.broadcast(ref),
        (base.source == ref.rsource) & (base.lang == ref.rlang),
    ).filter(F.col("doc_id") != F.col("ref_doc_id"))
    clipped = out.select(
        "doc_id",
        "source",
        "lang",
        "ref_doc_id",
        "n_tokens",
        "ref_len",
        *[
            F.expr(f"CAST(size(array_intersect(t{i}, r{i})) AS BIGINT)")
            .alias(f"clip{i}")
            for i in range(1, 5)
        ],
        *[
            F.expr(f"n_tokens - {i - 1}").alias(f"tot{i}")
            for i in range(1, 5)
        ],
    )
    gm = _BLEU_GM_SQL  # ONE definition of the fixed multiply order
    return clipped.select(
        "doc_id",
        "source",
        "lang",
        "ref_doc_id",
        F.col("n_tokens").alias("cand_len"),
        "ref_len",
        "clip1",
        "clip2",
        "clip3",
        "clip4",
        F.expr(f"CAST(floor({gm} * 1000000.0) AS BIGINT)").alias(
            "bleu_micro"
        ),
        (F.col("n_tokens") < F.col("ref_len")).alias("bp_applies"),
        F.expr("ref_len * 1000000 div n_tokens").alias("len_ratio_micro"),
    )


_BLEU_SQL = f"""
WITH tok AS (
    SELECT doc_id, source, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents WHERE text IS NOT NULL
),
grams AS (
    SELECT doc_id, source, lang, CAST(len(t) AS BIGINT) AS n_tokens,
           n, array_to_string(t[i:i+n-1], ' ') AS gram
    FROM tok,
         UNNEST(range(1, 5)) AS un(n),
         UNNEST(range(1, len(t) - n + 2)) AS ui(i)
    WHERE len(t) >= 4
),
counts AS (
    SELECT doc_id, source, lang, n_tokens, n, gram,
           CAST(count(*) AS BIGINT) AS ct
    FROM grams GROUP BY 1, 2, 3, 4, 5, 6
),
ref_ids AS (
    SELECT source, lang, min(doc_id) AS ref_doc_id
    FROM counts GROUP BY 1, 2
),
ref AS (
    SELECT c.source, c.lang, r.ref_doc_id, c.n_tokens AS ref_len,
           c.n, c.gram, c.ct AS rct
    FROM counts c JOIN ref_ids r
      ON c.doc_id = r.ref_doc_id AND c.source = r.source
     AND c.lang = r.lang
),
ov AS (
    SELECT c.doc_id, c.n, CAST(sum(least(c.ct, r.rct)) AS BIGINT) AS clip
    FROM counts c JOIN ref r
      ON c.source = r.source AND c.lang = r.lang
     AND c.n = r.n AND c.gram = r.gram AND c.doc_id <> r.ref_doc_id
    GROUP BY 1, 2
),
tots AS (
    SELECT doc_id, source, lang, n_tokens, n,
           CAST(sum(ct) AS BIGINT) AS tot_ct
    FROM counts GROUP BY 1, 2, 3, 4, 5
),
per_n AS (
    SELECT t.doc_id, t.source, t.lang, t.n_tokens, t.n, t.tot_ct,
           coalesce(o.clip, 0) AS clip
    FROM tots t LEFT JOIN ov o ON t.doc_id = o.doc_id AND t.n = o.n
),
per_doc AS (
    SELECT doc_id, source, lang, n_tokens,
           CAST(sum(CASE WHEN n = 1 THEN clip END) AS BIGINT) AS clip1,
           CAST(sum(CASE WHEN n = 2 THEN clip END) AS BIGINT) AS clip2,
           CAST(sum(CASE WHEN n = 3 THEN clip END) AS BIGINT) AS clip3,
           CAST(sum(CASE WHEN n = 4 THEN clip END) AS BIGINT) AS clip4,
           CAST(sum(CASE WHEN n = 1 THEN tot_ct END) AS BIGINT) AS tot1,
           CAST(sum(CASE WHEN n = 2 THEN tot_ct END) AS BIGINT) AS tot2,
           CAST(sum(CASE WHEN n = 3 THEN tot_ct END) AS BIGINT) AS tot3,
           CAST(sum(CASE WHEN n = 4 THEN tot_ct END) AS BIGINT) AS tot4
    FROM per_n GROUP BY 1, 2, 3, 4
),
ref_meta AS (
    SELECT source, lang, ref_doc_id, any_value(ref_len) AS ref_len
    FROM ref GROUP BY 1, 2, 3
)
SELECT d.doc_id, d.source, d.lang, m.ref_doc_id,
       d.n_tokens AS cand_len, m.ref_len,
       d.clip1, d.clip2, d.clip3, d.clip4,
       CAST(floor({_BLEU_GM_SQL} * 1000000.0) AS BIGINT) AS bleu_micro,
       d.n_tokens < m.ref_len AS bp_applies,
       m.ref_len * 1000000 // d.n_tokens AS len_ratio_micro
FROM per_doc d
JOIN ref_meta m ON d.source = m.source AND d.lang = m.lang
WHERE d.doc_id <> m.ref_doc_id
"""


# ---------------------------------------------------------------------------
# Wave 34a: confident-learning label-issue matrix (Northcutt et al. 2021,
# "Confident Learning: Estimating Uncertainty in Dataset Labels" — the
# Cleanlab recipe). Given labels = documents.lang; predicted class
# probabilities = the engine's own lang-ID marker scores normalized to
# integer micro probabilities (prob_c = score_c * 1e6 // total). Per-class
# confidence threshold t_c = MEAN prob_c over docs GIVEN-labeled c; the
# confident joint counts C[i][j] = docs given i whose prob_j clears t_j,
# assigned to the argmax qualifying class (ties -> lowest LANG_ORDER
# index, total order). Off-diagonal cells are the estimated label issues
# — the audit that decides whether `lang` can be trusted as a training
# target. Completes the label-quality family (kappa, Dawid-Skene, ECE,
# AUC) with the noise-DETECTION step.
# Scale: per-row codegen scoring, one |classes|-row threshold aggregate
# (broadcast back), one explode bounded by |classes| per doc, one tiny
# (given, class) combine.
# ---------------------------------------------------------------------------
def confident_learning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        LANG_MARKERS,
        LANG_ORDER,
    )

    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    score_cols = []
    for lang in LANG_ORDER:
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        score_cols.append(
            F.expr(
                f"size(filter(tok_arr, x ->"
                f" array_contains(array({markers}), x)))"
            )
            .cast("bigint")
            .alias(f"s_{lang}")
        )
    scored = docs.select(
        "doc_id", F.col("lang").alias("given_lang"), *score_cols
    ).withColumn(
        "total", F.expr(" + ".join(f"s_{c}" for c in LANG_ORDER))
    )
    probs = scored.filter(F.col("total") > 0).select(
        "doc_id",
        "given_lang",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct('{c}' AS cls, {i} AS idx,"
                    f" s_{c} * 1000000 div total AS prob)"
                    for i, c in enumerate(LANG_ORDER)
                )
                + ")"
            )
        ).alias("p"),
    ).select(
        "doc_id", "given_lang", "p.cls", "p.idx", "p.prob"
    )
    probs = probs.persist()
    thr = (
        probs.filter(F.col("cls") == F.col("given_lang"))
        .groupBy("cls")
        .agg(F.expr("sum(prob) div count(*)").alias("t"))
    )
    confident = (
        probs.join(F.broadcast(thr), "cls")
        .filter(F.col("prob") >= F.col("t"))
        .groupBy("doc_id", "given_lang")
        .agg(
            F.max_by(
                "cls", F.struct(F.col("prob"), (-F.col("idx")).alias("ni"))
            ).alias("confident_cls")
        )
    )
    return confident.groupBy("given_lang", "confident_cls").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.max(
            F.expr(
                "CASE WHEN given_lang <> confident_cls THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("is_label_issue"),
    )


def _confident_learning_sql() -> str:
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        LANG_MARKERS,
        LANG_ORDER,
    )

    score_exprs = ",\n           ".join(
        f"CAST(len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{m}'" for m in LANG_MARKERS[c])
        + f"], x))) AS BIGINT) AS s_{c}"
        for c in LANG_ORDER
    )
    total = " + ".join(f"s_{c}" for c in LANG_ORDER)
    unpivot = "\n    UNION ALL\n    ".join(
        f"SELECT doc_id, given_lang, '{c}' AS cls, {i} AS idx,"
        f" s_{c} * 1000000 // total AS prob FROM scored"
        for i, c in enumerate(LANG_ORDER)
    )
    return f"""
WITH t0 AS (
    SELECT doc_id, lang AS given_lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents WHERE text IS NOT NULL
),
raw AS (
    SELECT doc_id, given_lang,
           {score_exprs}
    FROM t0
),
scored AS (
    SELECT *, {total} AS total FROM raw WHERE {total} > 0
),
probs AS (
    {unpivot}
),
thr AS (
    SELECT cls, sum(prob) // count(*) AS t
    FROM probs WHERE cls = given_lang GROUP BY 1
),
confident AS (
    SELECT doc_id, given_lang, cls AS confident_cls
    FROM (
        SELECT p.doc_id, p.given_lang, p.cls,
               row_number() OVER (PARTITION BY p.doc_id
                                  ORDER BY p.prob DESC, p.idx) AS rn
        FROM probs p JOIN thr ON p.cls = thr.cls AND p.prob >= thr.t
    ) WHERE rn = 1
)
SELECT given_lang, confident_cls,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(max(CASE WHEN given_lang <> confident_cls THEN 1 ELSE 0 END)
            AS BIGINT) AS is_label_issue
FROM confident
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Wave 34b: effective sample size of the DSIR importance weights (Kong
# 1992's ESS = (SUM w)^2 / SUM w^2 — the diagnostic every importance-
# resampling selection run checks BEFORE trusting the weights: ESS near n
# means the weights are flat and selection is near-uniform; ESS << n
# means a few documents dominate and the resample will collapse onto
# them). Weights are the exact micro odds-scores `importance_weight_
# selection` already computes (double-count rule: the weight build is
# that query's benched work; this audit adds two tiny combines).
# Wide arithmetic: (SUM w)^2 and SUM w^2 ride DECIMAL(38,0)/HUGEINT
# internally (w ~ 1e6 micro, so w^2 ~ 1e12 per doc — BIGINT dies at
# ~1e6 docs); the output boundary is the ESS itself in milli-units,
# always <= n * 1000.
# Scale: reuses the DSIR scoring shape (vocab-frame join, per-doc
# combine), then ONE per-source aggregate + one global row.
# ---------------------------------------------------------------------------
def importance_weight_ess(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        _dsir_scores,
    )

    scores = _dsir_scores(spark, sf_dir)
    per_source = scores.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("score_micro").cast("decimal(38,0)")).alias("sw"),
        F.sum(
            (
                F.col("score_micro").cast("decimal(38,0)")
                * F.col("score_micro")
            )
        ).alias("sw2"),
    )
    both = per_source.unionAll(
        scores.groupBy(F.lit("__all__").alias("source")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.col("score_micro").cast("decimal(38,0)")).alias("sw"),
            F.sum(
                (
                    F.col("score_micro").cast("decimal(38,0)")
                    * F.col("score_micro")
                )
            ).alias("sw2"),
        )
    )
    return both.select(
        "source",
        "n_docs",
        F.expr(
            "CAST(CASE WHEN sw2 > 0 THEN sw * sw * 1000 div sw2"
            " ELSE 0 END AS BIGINT)"
        ).alias("ess_milli"),
        F.expr(
            "CAST(CASE WHEN sw2 > 0 THEN sw * sw * 1000 div sw2"
            " ELSE 0 END * 1000 div n_docs AS BIGINT)"
        ).alias("ess_ratio_micro"),
    )


def _ess_sql() -> str:
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        _DSIR_SCORES_CTE,
    )

    return f"""
WITH {_DSIR_SCORES_CTE},
per AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           sum(CAST(score_micro AS HUGEINT)) AS sw,
           sum(CAST(score_micro AS HUGEINT) * score_micro) AS sw2
    FROM scores GROUP BY 1
    UNION ALL
    SELECT '__all__', CAST(count(*) AS BIGINT),
           sum(CAST(score_micro AS HUGEINT)),
           sum(CAST(score_micro AS HUGEINT) * score_micro)
    FROM scores
)
SELECT source, n_docs,
       CAST(CASE WHEN sw2 > 0 THEN sw * sw * 1000 // sw2
            ELSE 0 END AS BIGINT) AS ess_milli,
       CAST((CASE WHEN sw2 > 0 THEN sw * sw * 1000 // sw2
             ELSE 0 END) * 1000 // n_docs AS BIGINT) AS ess_ratio_micro
FROM per
"""


# ---------------------------------------------------------------------------
# Wave 34c: group-relative advantage baseline (the GRPO/RLOO shape:
# advantage = episode return minus the MEAN return of its comparison
# group, no learned critic). Groups = calendar day; returns = the
# gamma=1/2 discounted episode returns above. Baseline is the floored
# integer mean over the day's episodes; advantages are exact cent
# differences. Rewards are non-negative by the events contract
# (value >= 0, NULLs coalesce to 0), so every division operand is
# non-negative and Spark `div` == DuckDB `//`.
# Scale: reuses the episode frame (double-count rule: the window sort is
# episode_discounted_returns' benched work), then one per-day combine
# broadcast back — |days| rows of state.
# ---------------------------------------------------------------------------
def episode_advantage_baseline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ep = episode_discounted_returns(spark, sf_dir).select(
        "user_id", "day", "n_steps", "discounted_return_cents"
    )
    day_stats = ep.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_episodes"),
        F.expr(
            "sum(discounted_return_cents) div count(*)"
        ).alias("baseline_cents"),
    )
    return ep.join(F.broadcast(day_stats), "day").select(
        "user_id",
        "day",
        "n_steps",
        "discounted_return_cents",
        "n_episodes",
        "baseline_cents",
        (F.col("discounted_return_cents") - F.col("baseline_cents")).alias(
            "advantage_cents"
        ),
    )


_ADVANTAGE_SQL = f"""
WITH ep AS (
    SELECT user_id, day, n_steps, discounted_return_cents
    FROM ({_EPISODE_SQL})
),
day_stats AS (
    SELECT day, CAST(count(*) AS BIGINT) AS n_episodes,
           CAST(sum(discounted_return_cents) // count(*) AS BIGINT)
               AS baseline_cents
    FROM ep GROUP BY 1
)
SELECT e.user_id, e.day, e.n_steps, e.discounted_return_cents,
       d.n_episodes, d.baseline_cents,
       e.discounted_return_cents - d.baseline_cents AS advantage_cents
FROM ep e JOIN day_stats d USING (day)
"""


# ---------------------------------------------------------------------------
# Wave 34d: packing-efficiency audit of the shipped context-window
# packer — per language: pack count, overflow packs (the prefix rule
# lets a boundary-spanning doc overflow its pack), padding tokens across
# CLOSED packs (the last pack per lang is legitimately partial and
# excluded), mean closed-pack fill in micro, and cross-document
# boundaries (n_docs - n_packs: every extra doc in a pack is one
# attention boundary a masking-aware trainer must cut). The tuning
# artifact the PACK_BUDGET constant is picked from — the packing
# sibling of minhash_band_tuning.
# Scale: re-derives the pack assignment (double-count rule: the per-lang
# prefix window is doc_pack_greedy's benched work), then |packs|-row and
# |langs|-row combines.
# ---------------------------------------------------------------------------
def pack_attention_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        PACK_BUDGET,
        doc_pack_greedy,
    )

    packs = doc_pack_greedy(spark, sf_dir)
    # window, not an equi-join: PARTITION BY groups NULL langs together
    # on both engines, where a join on lang would drop the NULL group
    j = packs.withColumn(
        "max_pack", F.max("pack_id").over(Window.partitionBy("lang"))
    ).withColumn(
        "closed", F.expr("CASE WHEN pack_id < max_pack THEN 1 ELSE 0 END")
    )
    return j.groupBy("lang").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_packs"),
        F.sum(
            F.expr(f"CASE WHEN tok_sum > {PACK_BUDGET} THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("overflow_packs"),
        F.sum(
            F.expr(
                f"CASE WHEN closed = 1 AND tok_sum < {PACK_BUDGET}"
                f" THEN {PACK_BUDGET} - tok_sum ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("closed_pad_tokens"),
        F.expr(
            f"CAST(sum(CASE WHEN closed = 1 THEN tok_sum ELSE 0 END)"
            f" * 1000000 div nullif(sum(closed) * {PACK_BUDGET}, 0)"
            f" AS BIGINT)"
        ).alias("closed_fill_micro"),
        (F.sum("n_docs") - F.count(F.lit(1)))
        .cast("bigint")
        .alias("attention_boundaries"),
    )


def _pack_waste_sql() -> str:
    from realtimedatawarehouse_self_spark.plans.corpus_ops import (
        PACK_BUDGET,
        _PACK_SQL,
    )

    return f"""
WITH packs AS ({_PACK_SQL}),
j AS (
    SELECT *,
           CASE WHEN pack_id < max(pack_id) OVER (PARTITION BY lang)
                THEN 1 ELSE 0 END AS closed
    FROM packs
)
SELECT lang,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_packs,
       CAST(sum(CASE WHEN tok_sum > {PACK_BUDGET} THEN 1 ELSE 0 END)
            AS BIGINT) AS overflow_packs,
       CAST(sum(CASE WHEN closed = 1 AND tok_sum < {PACK_BUDGET}
                THEN {PACK_BUDGET} - tok_sum ELSE 0 END) AS BIGINT)
           AS closed_pad_tokens,
       CAST(sum(CASE WHEN closed = 1 THEN tok_sum ELSE 0 END) * 1000000
            // nullif(sum(closed) * {PACK_BUDGET}, 0) AS BIGINT)
           AS closed_fill_micro,
       CAST(sum(n_docs) - count(*) AS BIGINT) AS attention_boundaries
FROM j
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Wave 42a: chrF character n-gram eval (Popović 2015) — the third member
# of the generation-eval family (ROUGE = recall view, BLEU = precision
# view, chrF = the character-level F-view that is robust to tokenization
# and morphology). Same deterministic reference scheme: lowest-doc_id
# ELIGIBLE group member per (source, lang). The char stream is the doc's
# tokens joined with NO separator (the chrF convention of ignoring
# whitespace); n = 1..4 (the standard uses up to 6 — 4 here bounds the
# explode at the BLEU family's volume; the β=2 weighting is exact either
# way). Exact-arithmetic doctrine (the BLEU/mixture precedent): every
# P_n / R_n is ONE double division of two exact bigints; F_n and the
# 4-way mean compose only +, *, / — all IEEE-754 correctly rounded, so
# both engines agree bit-for-bit; pow()/exp()/ln() never appear.
# Scale: reference side is ONE doc per (source, lang) — broadcast at any
# scale; the candidate side is one explode (4 char-gram streams in a
# single Generate) + one (doc, n, gram) map-side-combined shuffle.
# ---------------------------------------------------------------------------
CHRF_MAX_N = 4
CHRF_BETA_SQ = 4  # β = 2


def _chrf_f_sql(i: int) -> str:
    """The per-n chrF F-score in IDENTICAL text for both engines:
    F_n = (1+β²)·P·R / (β²·P + R), 0 when nothing clipped."""
    p = f"(CAST(clip{i} AS DOUBLE) / CAST(tot{i} AS DOUBLE))"
    r = f"(CAST(clip{i} AS DOUBLE) / CAST(rtot{i} AS DOUBLE))"
    return (
        f"CASE WHEN clip{i} = 0 THEN 0.0 ELSE "
        f"({1 + CHRF_BETA_SQ}.0 * {p} * {r})"
        f" / ({CHRF_BETA_SQ}.0 * {p} + {r}) END"
    )


_CHRF_MEAN_SQL = (
    "CAST(floor(((({f1}) + ({f2})) + (({f3}) + ({f4}))) / 4.0"
    " * 1000000.0) AS BIGINT)"
).format(
    f1=_chrf_f_sql(1), f2=_chrf_f_sql(2), f3=_chrf_f_sql(3), f4=_chrf_f_sql(4)
)


# r10 optimization rewrite (guide §2.3-2.4): same in-row occurrence-
# tagged multiset-intersection shape as bleu_ngram_eval — the reference
# is ONE doc per (source, lang) (broadcast at every scale), clip_n =
# size(array_intersect(tagged_cand_n, tagged_ref_n)) computed per row,
# and tot_n / rtot_n are n_chars - n + 1 arithmetically. The old explode
# of every 1..4-char gram into (doc, n, gram) rows put ~4x the corpus
# CHARACTER volume through two exchanges; now no gram crosses any
# exchange and the only shuffle is the |source x lang|-row reference
# election.
def chrf_char_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _docs(spark, sf_dir)
        .withColumn("s", F.array_join(tokens("text"), ""))
        .filter(F.length("s") >= CHRF_MAX_N)
    )

    def tagged(src: DataFrame) -> DataFrame:
        srt = src.select(
            "doc_id",
            "source",
            "lang",
            F.length("s").cast("bigint").alias("n_chars_stream"),
            *[
                F.expr(
                    f"array_sort(transform(sequence(0, length(s) - {n}),"
                    f" i -> substring(s, i + 1, {n})))"
                ).alias(f"s{n}")
                for n in range(1, CHRF_MAX_N + 1)
            ],
        )
        return srt.select(
            "doc_id",
            "source",
            "lang",
            "n_chars_stream",
            *[
                F.expr(occurrence_tagged(f"s{n}")).alias(f"t{n}")
                for n in range(1, CHRF_MAX_N + 1)
            ],
        )

    base = tagged(docs)
    ref_ids = docs.groupBy("source", "lang").agg(
        F.min("doc_id").alias("ref_doc_id")
    )
    rid = ref_ids.select(
        "ref_doc_id",
        F.col("source").alias("rsource0"),
        F.col("lang").alias("rlang0"),
    )
    ref = tagged(
        docs.join(
            F.broadcast(rid),
            (docs.doc_id == rid.ref_doc_id)
            & (docs.source == rid.rsource0)
            & (docs.lang == rid.rlang0),
        ).select("doc_id", "source", "lang", "s")
    ).select(
        F.col("doc_id").alias("ref_doc_id"),
        F.col("source").alias("rsource"),
        F.col("lang").alias("rlang"),
        F.col("n_chars_stream").alias("ref_chars"),
        *[F.col(f"t{n}").alias(f"r{n}") for n in range(1, CHRF_MAX_N + 1)],
    )
    out = base.join(
        F.broadcast(ref),
        (base.source == ref.rsource) & (base.lang == ref.rlang),
    ).filter(F.col("doc_id") != F.col("ref_doc_id"))
    clipped = out.select(
        "doc_id",
        "source",
        "lang",
        "ref_doc_id",
        "n_chars_stream",
        "ref_chars",
        *[
            F.expr(f"CAST(size(array_intersect(t{i}, r{i})) AS BIGINT)")
            .alias(f"clip{i}")
            for i in range(1, CHRF_MAX_N + 1)
        ],
        *[
            F.expr(f"n_chars_stream - {i - 1}").alias(f"tot{i}")
            for i in range(1, CHRF_MAX_N + 1)
        ],
        *[
            F.expr(f"ref_chars - {i - 1}").alias(f"rtot{i}")
            for i in range(1, CHRF_MAX_N + 1)
        ],
    )
    return clipped.select(
        "doc_id",
        "source",
        "lang",
        "ref_doc_id",
        F.col("n_chars_stream").alias("cand_chars"),
        "ref_chars",
        *[F.col(f"clip{i}") for i in range(1, CHRF_MAX_N + 1)],
        F.expr(_CHRF_MEAN_SQL).alias("chrf_micro"),
    )


_CHRF_SQL = f"""
WITH tok AS (
    SELECT doc_id, source, lang,
           array_to_string(
               list_filter(string_split(text, ' '), x -> x <> ''), '') AS s
    FROM documents WHERE text IS NOT NULL
),
grams AS (
    SELECT doc_id, source, lang,
           CAST(len(s) AS BIGINT) AS n_chars_stream,
           n, substr(s, i, n) AS gram
    FROM tok,
         UNNEST(range(1, {CHRF_MAX_N + 1})) AS un(n),
         UNNEST(range(1, len(s) - n + 2)) AS ui(i)
    WHERE len(s) >= {CHRF_MAX_N}
),
counts AS (
    SELECT doc_id, source, lang, n_chars_stream, n, gram,
           CAST(count(*) AS BIGINT) AS ct
    FROM grams GROUP BY 1, 2, 3, 4, 5, 6
),
ref_ids AS (
    SELECT source, lang, min(doc_id) AS ref_doc_id
    FROM counts GROUP BY 1, 2
),
ref AS (
    SELECT c.source, c.lang, r.ref_doc_id, c.n_chars_stream AS ref_chars,
           c.n, c.gram, c.ct AS rct
    FROM counts c JOIN ref_ids r
      ON c.doc_id = r.ref_doc_id AND c.source = r.source
     AND c.lang = r.lang
),
ov AS (
    SELECT c.doc_id, c.n, CAST(sum(least(c.ct, r.rct)) AS BIGINT) AS clip
    FROM counts c JOIN ref r
      ON c.source = r.source AND c.lang = r.lang
     AND c.n = r.n AND c.gram = r.gram AND c.doc_id <> r.ref_doc_id
    GROUP BY 1, 2
),
tots AS (
    SELECT doc_id, source, lang, n_chars_stream, n,
           CAST(sum(ct) AS BIGINT) AS tot_ct
    FROM counts GROUP BY 1, 2, 3, 4, 5
),
per_n AS (
    SELECT t.doc_id, t.source, t.lang, t.n_chars_stream, t.n, t.tot_ct,
           coalesce(o.clip, 0) AS clip
    FROM tots t LEFT JOIN ov o ON t.doc_id = o.doc_id AND t.n = o.n
),
per_doc AS (
    SELECT doc_id, source, lang, n_chars_stream,
           CAST(sum(CASE WHEN n = 1 THEN clip END) AS BIGINT) AS clip1,
           CAST(sum(CASE WHEN n = 2 THEN clip END) AS BIGINT) AS clip2,
           CAST(sum(CASE WHEN n = 3 THEN clip END) AS BIGINT) AS clip3,
           CAST(sum(CASE WHEN n = 4 THEN clip END) AS BIGINT) AS clip4,
           CAST(sum(CASE WHEN n = 1 THEN tot_ct END) AS BIGINT) AS tot1,
           CAST(sum(CASE WHEN n = 2 THEN tot_ct END) AS BIGINT) AS tot2,
           CAST(sum(CASE WHEN n = 3 THEN tot_ct END) AS BIGINT) AS tot3,
           CAST(sum(CASE WHEN n = 4 THEN tot_ct END) AS BIGINT) AS tot4
    FROM per_n GROUP BY 1, 2, 3, 4
),
ref_meta AS (
    SELECT source, lang, ref_doc_id, any_value(ref_chars) AS ref_chars,
           CAST(sum(CASE WHEN n = 1 THEN rct END) AS BIGINT) AS rtot1,
           CAST(sum(CASE WHEN n = 2 THEN rct END) AS BIGINT) AS rtot2,
           CAST(sum(CASE WHEN n = 3 THEN rct END) AS BIGINT) AS rtot3,
           CAST(sum(CASE WHEN n = 4 THEN rct END) AS BIGINT) AS rtot4
    FROM ref GROUP BY 1, 2, 3
)
SELECT p.doc_id, p.source, p.lang, m.ref_doc_id,
       p.n_chars_stream AS cand_chars, m.ref_chars,
       clip1, clip2, clip3, clip4,
       {_CHRF_MEAN_SQL} AS chrf_micro
FROM per_doc p JOIN ref_meta m
  ON p.source = m.source AND p.lang = m.lang
WHERE p.doc_id <> m.ref_doc_id
"""


# ---------------------------------------------------------------------------
# Wave 42b: quality-threshold sweep — the tuning table every classifier-
# filtered corpus ships with (the CCNet/ RefinedWeb "how much survives at
# each cut" curve): for a grid of score thresholds, the per-language
# surviving doc/token mass. One scored scan; the engine computes the
# whole grid as CONDITIONAL AGGREGATES in a single per-lang combine
# (the semdedup_eps_sweep doctrine — never one pass per threshold) and
# unpivots the |langs|-sized result with stack(); the oracle recounts
# via the simple docs × taus cross join (sf0.01-only cost).
# ---------------------------------------------------------------------------
SWEEP_TAUS = (980, 1000, 1020, 1040, 1060, 1080, 1100, 1120)


def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    w_expr = (
        "aggregate(transform(tok_arr, x -> "
        f"CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)"
        f" % {FT_WEIGHT_MOD}), "
        "0L, (acc, v) -> acc + v)"
    )
    scored = docs.filter(F.size("tok_arr") > 0).select(
        "lang",
        F.size("tok_arr").cast("bigint").alias("n_tokens"),
        F.expr(f"{w_expr} div size(tok_arr)").alias("score_milli"),
    )
    agg = scored.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("total_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        *[
            F.sum(F.when(F.col("score_milli") >= t, 1).otherwise(0))
            .cast("bigint")
            .alias(f"d{t}")
            for t in SWEEP_TAUS
        ],
        *[
            F.sum(
                F.when(F.col("score_milli") >= t, F.col("n_tokens")).otherwise(
                    0
                )
            )
            .cast("bigint")
            .alias(f"k{t}")
            for t in SWEEP_TAUS
        ],
    )
    stack_args = ", ".join(
        f"{t}L, d{t}, k{t}" for t in SWEEP_TAUS
    )
    unp = agg.select(
        "lang",
        "total_docs",
        "total_tokens",
        F.expr(
            f"stack({len(SWEEP_TAUS)}, {stack_args})"
            " AS (tau_milli, surviving_docs, surviving_tokens)"
        ),
    )
    return unp.select(
        "lang",
        "tau_milli",
        "surviving_docs",
        "surviving_tokens",
        "total_docs",
        "total_tokens",
        F.expr("surviving_tokens * 1000000 div total_tokens").alias(
            "token_share_micro"
        ),
    )


_SWEEP_SQL = f"""
WITH t AS (
    SELECT lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS toks
    FROM documents WHERE text IS NOT NULL
),
scored AS (
    SELECT lang, CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(list_sum(list_transform(toks, x ->
                TRY_CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)
                % {FT_WEIGHT_MOD})) AS BIGINT) // len(toks) AS score_milli
    FROM t WHERE len(toks) > 0
),
taus AS (SELECT UNNEST({list(SWEEP_TAUS)}) AS tau_milli)
SELECT s.lang, CAST(tau_milli AS BIGINT) AS tau_milli,
       CAST(count(*) FILTER (s.score_milli >= tau_milli) AS BIGINT)
           AS surviving_docs,
       CAST(coalesce(sum(s.n_tokens)
            FILTER (s.score_milli >= tau_milli), 0) AS BIGINT)
           AS surviving_tokens,
       CAST(count(*) AS BIGINT) AS total_docs,
       CAST(sum(s.n_tokens) AS BIGINT) AS total_tokens,
       CAST(coalesce(sum(s.n_tokens)
            FILTER (s.score_milli >= tau_milli), 0) * 1000000
            // sum(s.n_tokens) AS BIGINT) AS token_share_micro
FROM scored s, taus
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Wave 42c: distinct-n diversity (Li et al. 2016 "A Diversity-Promoting
# Objective") — the standard within-set generation-diversity metric and
# the synthetic-data health check (mode-collapsed generators crater
# distinct-2/3 long before humans notice): per source, the ratio of
# DISTINCT n-grams to total n-grams for n = 1..3.
# Scale: one explode (3 gram streams) + the (source, n, gram) combine
# with map-side partials, then a (source, n) rollup — the vocab-counting
# shape; embarrassingly parallel, zero joins.
# ---------------------------------------------------------------------------
DISTINCT_NS = (1, 2, 3)


def distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _docs(spark, sf_dir)
        .withColumn("tok_arr", tokens("text"))
        .filter(F.size("tok_arr") >= 1)
        .select("source", "tok_arr")
    )
    by_n = docs.select(
        "source",
        "tok_arr",
        F.explode(F.array(*[F.lit(n) for n in DISTINCT_NS])).alias("n"),
    ).filter(F.size("tok_arr") >= F.col("n"))
    grams = by_n.select(
        "source",
        "n",
        F.explode(
            F.expr(
                "transform(sequence(0, size(tok_arr) - n),"
                " i -> array_join(slice(tok_arr, i + 1, n), ' '))"
            )
        ).alias("gram"),
    )
    counts = grams.groupBy("source", "n", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    return (
        counts.groupBy("source", "n")
        .agg(
            F.sum("ct").cast("bigint").alias("total_ngrams"),
            F.count(F.lit(1)).cast("bigint").alias("distinct_ngrams"),
        )
        .select(
            "source",
            F.col("n").cast("int").alias("n"),
            "total_ngrams",
            "distinct_ngrams",
            F.expr("distinct_ngrams * 1000000 div total_ngrams").alias(
                "distinct_micro"
            ),
        )
    )


_DISTINCT_N_SQL = f"""
WITH tok AS (
    SELECT source,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents WHERE text IS NOT NULL
),
grams AS (
    SELECT source, n, array_to_string(t[i:i+n-1], ' ') AS gram
    FROM tok,
         UNNEST({list(DISTINCT_NS)}) AS un(n),
         UNNEST(range(1, len(t) - n + 2)) AS ui(i)
    WHERE len(t) >= 1
),
counts AS (
    SELECT source, n, gram, CAST(count(*) AS BIGINT) AS ct
    FROM grams GROUP BY 1, 2, 3
)
SELECT source, CAST(n AS INTEGER) AS n,
       CAST(sum(ct) AS BIGINT) AS total_ngrams,
       CAST(count(*) AS BIGINT) AS distinct_ngrams,
       CAST(count(*) * 1000000 // sum(ct) AS BIGINT) AS distinct_micro
FROM counts GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Wave 46: return-to-go accounting (Decision Transformer data prep,
# Chen et al. 2021) — the conditioning target RvS/DT training attaches
# to every step: rtg_t = sum of rewards from step t to the episode end.
# Episodes and step order are EXACTLY episode_discounted_returns' (the
# (ts, event_id, reward) deterministic order), so the two RL preps can
# never disagree about what an episode is. The per-step frame is
# corpus-sized, so the driver row emits the episode-level integrity
# summary instead of every step: first/mid/max rtg plus the exact
# sequence checksum sum_t rtg_t == sum_t (t+1)*r_t (an algebraic
# identity the property test pins independently).
# Scale: one episode-keyed suffix-sum window (per-key volume bounded by
# a user-day of events — the proven episode exchange) + one combine.
# ---------------------------------------------------------------------------
def episode_return_to_go(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    rr = F.expr("CAST(floor(coalesce(value, 0.0) * 100 + 0.5) AS BIGINT)")
    w = Window.partitionBy(
        "user_id", F.date_format("ts", "yyyy-MM-dd")
    ).orderBy("ts", F.coalesce("event_id", F.lit(-1)), rr)
    steps = ev.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        rr.alias("r"),
        (F.row_number().over(w) - 1).cast("int").alias("t"),
    )
    wsuf = (
        Window.partitionBy("user_id", "day")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rtg = steps.withColumn(
        "rtg", F.sum("r").over(wsuf).cast("bigint")
    ).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("user_id", "day"))
    )
    return rtg.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_steps"),
        F.max(F.when(F.col("t") == 0, F.col("rtg")))
        .cast("bigint")
        .alias("total_reward_cents"),
        F.max("rtg").cast("bigint").alias("max_rtg_cents"),
        F.max(F.when(F.expr("t = CAST(n div 2 AS INT)"), F.col("rtg")))
        .cast("bigint")
        .alias("mid_rtg_cents"),
        F.sum("rtg").cast("bigint").alias("rtg_checksum_cents"),
    )


_RTG_SQL = """
WITH steps AS (
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day,
           CAST(floor(coalesce(value, 0.0) * 100 + 0.5) AS BIGINT) AS r,
           CAST(row_number() OVER (
               PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
               ORDER BY ts, coalesce(event_id, -1),
                        CAST(floor(coalesce(value, 0.0) * 100 + 0.5)
                             AS BIGINT)) - 1 AS INTEGER) AS t
    FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
),
rtgs AS (
    SELECT user_id, day, t, r,
           CAST(sum(r) OVER (PARTITION BY user_id, day
                             ORDER BY t DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS BIGINT) AS rtg,
           count(*) OVER (PARTITION BY user_id, day) AS n
    FROM steps
)
SELECT user_id, day,
       CAST(count(*) AS BIGINT) AS n_steps,
       CAST(max(CASE WHEN t = 0 THEN rtg END) AS BIGINT)
           AS total_reward_cents,
       CAST(max(rtg) AS BIGINT) AS max_rtg_cents,
       CAST(max(CASE WHEN t = CAST(n // 2 AS INTEGER) THEN rtg END)
            AS BIGINT) AS mid_rtg_cents,
       CAST(sum(rtg) AS BIGINT) AS rtg_checksum_cents
FROM rtgs
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Wave 45a: margin-based bitext mining (Artetxe & Schwenk 2019; the
# LASER/CCMatrix parallel-corpus miner): align two embedding spaces by
# pairing each source vector with its best target neighbor, accepting
# only pairs whose cosine stands out against BOTH sides' neighborhoods —
#   margin(x, y) = cos(x, y) / ((avgK(x) + avgK(y)) / 2)
# (the "ratio" margin). The two "languages" here are a deterministic
# md5 split of the embeddings table (the hash-gated-membership pattern);
# in production they are the two monolingual corpora.
# Exact-arithmetic doctrine: each pair cosine floors to BIGINT micro
# IMMEDIATELY (one double expression, bit-identical per pair); every
# rank, top-K average, and the margin ratio then run on integers, so
# float-summation ORDER can never diverge between engines (avg of
# doubles is NOT portable — this op never does it). Only positive-cosine
# candidates participate (mining semantics, and it keeps the integer
# division away from negative-floor edge cases).
# Scale: candidates are within-IVF-cell pairs only (the semdedup
# conjunct — linear pair volume, never all-pairs); the pair frame
# persists once and feeds both sides' top-K passes; per-side windows are
# cell-bounded.
# ---------------------------------------------------------------------------
BITEXT_K = 4
BITEXT_MARGIN_MICRO = 1_050_000  # accept iff margin > 1.05
_BITEXT_SRC_HEX = tuple("01234567")  # md5(vec_id) nibble -> source side


def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.plans.llm_ops import _cells

    apply_runtime_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    hexes = ", ".join(f"'{h}'" for h in _BITEXT_SRC_HEX)
    cells = _cells(emb).withColumn(
        "is_src",
        F.expr(
            f"array_contains(array({hexes}),"
            " substring(md5(CAST(vec_id AS STRING)), 1, 1))"
        ),
    )
    a = cells.filter(F.col("is_src")).select(
        F.col("vec_id").alias("src_id"), F.col("vec").alias("svec"), "cell"
    )
    b = cells.filter(~F.col("is_src")).select(
        F.col("vec_id").alias("tgt_id"), F.col("vec").alias("tvec"), "cell"
    )
    cands = (
        a.join(b, "cell")
        .select(
            "src_id",
            "tgt_id",
            F.floor(
                cosine(F.col("svec"), F.col("tvec")) * F.lit(1000000.0)
            )
            .cast("long")
            .alias("s_micro"),
        )
        .filter(F.col("s_micro") > 0)
        .persist()
    )
    wx = Window.partitionBy("src_id").orderBy(
        F.col("s_micro").desc(), "tgt_id"
    )
    topx = cands.withColumn("rnk", F.row_number().over(wx)).filter(
        F.col("rnk") <= BITEXT_K
    )
    x_stats = topx.groupBy("src_id").agg(
        F.sum("s_micro").cast("bigint").alias("sumk_x"),
        F.count(F.lit(1)).cast("bigint").alias("kx"),
        # rnk = 1 is unique per src (the deterministic window order), so
        # max(CASE ...) just extracts the best pair's fields
        F.max(F.when(F.col("rnk") == 1, F.col("tgt_id")))
        .cast("bigint")
        .alias("best_tgt"),
        F.max(F.when(F.col("rnk") == 1, F.col("s_micro")))
        .cast("bigint")
        .alias("best_micro"),
    )
    wy = Window.partitionBy("tgt_id").orderBy(
        F.col("s_micro").desc(), "src_id"
    )
    y_stats = (
        cands.withColumn("rnk", F.row_number().over(wy))
        .filter(F.col("rnk") <= BITEXT_K)
        .groupBy("tgt_id")
        .agg(
            F.sum("s_micro").cast("bigint").alias("sumk_y"),
            F.count(F.lit(1)).cast("bigint").alias("ky"),
        )
    )
    out = (
        x_stats.select(
            "src_id",
            F.col("best_tgt").alias("tgt_id"),
            F.col("best_micro").alias("pair_score_micro"),
            "sumk_x",
            "kx",
        )
        .join(y_stats, "tgt_id")
        .withColumn(
            "denom_micro",
            F.expr("(sumk_x div kx + sumk_y div ky) div 2"),
        )
        .withColumn(
            "margin_micro",
            F.expr("pair_score_micro * 1000000 div denom_micro"),
        )
    )
    return out.select(
        "src_id",
        "tgt_id",
        "pair_score_micro",
        "denom_micro",
        "margin_micro",
        (F.col("margin_micro") > BITEXT_MARGIN_MICRO).alias("accepted"),
    )


def _bitext_sql() -> str:
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        IVF_ASSIGN_CTE,
        _COSINE_SQL,
    )

    cos = _COSINE_SQL.format(a="a.vec", b="b.vec")
    return f"""
WITH {IVF_ASSIGN_CTE},
sided AS (
    SELECT vec_id, vec, cell,
           substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)
               IN {_BITEXT_SRC_HEX!r} AS is_src
    FROM assigned
),
cands AS (
    SELECT * FROM (
        SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
               CAST(floor(({cos}) * 1000000.0) AS BIGINT) AS s_micro
        FROM sided a JOIN sided b
          ON a.cell = b.cell AND a.is_src AND NOT b.is_src
    ) WHERE s_micro > 0
),
topx AS (
    SELECT *, row_number() OVER (PARTITION BY src_id
                                 ORDER BY s_micro DESC, tgt_id) AS rnk
    FROM cands QUALIFY rnk <= {BITEXT_K}
),
x_stats AS (
    SELECT src_id,
           CAST(sum(s_micro) AS BIGINT) AS sumk_x,
           CAST(count(*) AS BIGINT) AS kx,
           CAST(max(CASE WHEN rnk = 1 THEN tgt_id END) AS BIGINT) AS tgt_id,
           CAST(max(CASE WHEN rnk = 1 THEN s_micro END) AS BIGINT)
               AS pair_score_micro
    FROM topx GROUP BY 1
),
y_stats AS (
    SELECT tgt_id,
           CAST(sum(s_micro) AS BIGINT) AS sumk_y,
           CAST(count(*) AS BIGINT) AS ky
    FROM (
        SELECT *, row_number() OVER (PARTITION BY tgt_id
                                     ORDER BY s_micro DESC, src_id) AS rnk
        FROM cands QUALIFY rnk <= {BITEXT_K}
    ) GROUP BY 1
)
SELECT x.src_id, x.tgt_id, x.pair_score_micro,
       CAST((x.sumk_x // x.kx + y.sumk_y // y.ky) // 2 AS BIGINT)
           AS denom_micro,
       CAST(x.pair_score_micro * 1000000
            // ((x.sumk_x // x.kx + y.sumk_y // y.ky) // 2) AS BIGINT)
           AS margin_micro,
       x.pair_score_micro * 1000000
           // ((x.sumk_x // x.kx + y.sumk_y // y.ky) // 2)
           > {BITEXT_MARGIN_MICRO} AS accepted
FROM x_stats x JOIN y_stats y USING (tgt_id)
"""



# ---------------------------------------------------------------------------
# Wave 49a (r10): caption-image alignment filter — the LAION-400M/5B
# CLIP-score gate (Schuhmann et al. 2021: keep an image-text pair iff
# cosine(text_emb, image_emb) >= 0.28). The registry's embeddings table
# plays the image side (quantized to BIGINT micro exactly as
# embedding_gram_matrix does); the caption side is a deterministic
# hashing-trick bag-of-words projection of the document text into the
# SAME 64-dim space (md5 bucket + md5 sign — the fasttext_hash_quality
# derivation, vectorized), so both engines build bit-identical integer
# vectors and the whole score is exact until ONE double division
# (dot / sqrt(t2*q2)), floored to micro on both sides (the bitext
# doctrine). A production deployment swaps the projection for a real
# text-encoder embedding column; every downstream line is unchanged.
# Scale: caption vector built in-row (O(64·T) codegen, no shuffle); the
# pair join is 1:1 on the id — SHUFFLE_HASH-pinned here; bucketed
# co-located storage removes even that exchange at 100 TB.
# ---------------------------------------------------------------------------
CLIP_DIM = 64
CLIP_TAU_MICRO = 280_000  # LAION keep threshold 0.28, in micro units


def caption_image_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text")).filter(
        F.size("tok_arr") > 0
    )
    # in-row hashed projection: t[d] = sum of +-1 over tokens hashing to d.
    # r10 optimization (guide §1.2 per-task work): the md5 is computed ONCE
    # per token in a pre-pass transform — the original folded the bucket and
    # sign expressions directly into the per-dimension lambda, and
    # higher-order-function lambdas are interpreted with no common-
    # subexpression elimination, so each token paid 2 md5 calls PER
    # DIMENSION (128 md5/token at d=64). Same bucket/sign per token, so the
    # vector (and every output value) is bit-identical.
    ps = (
        "transform(transform(tok_arr, x -> md5(x)), h -> struct("
        f"CAST(conv(substring(h, 1, 2), 16, 10) AS INT) % {CLIP_DIM} AS b, "
        "IF(substring(h, 3, 1) < '8', 1L, -1L) AS s))"
    )
    tvec = (
        f"aggregate({ps}, "
        f"array_repeat(0L, {CLIP_DIM}), "
        f"(acc, p) -> transform(acc, (v, i) -> "
        f"v + IF(p.b = i, p.s, 0L)))"
    )
    cap = docs.select(
        "doc_id",
        F.expr(tvec).alias("t"),
    ).select(
        "doc_id",
        "t",
        F.expr(
            "aggregate(t, 0L, (acc, v) -> acc + v * v)"
        ).alias("t2"),
    )
    img = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
        F.col("vec_id"),
        F.expr(
            f"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)"
            f" * 1000000.0) AS BIGINT))"
        ).alias("q"),
    ).select(
        "vec_id",
        "q",
        F.expr("aggregate(q, 0L, (acc, v) -> acc + v * v)").alias("q2"),
    )
    paired = cap.join(
        img.hint("shuffle_hash"), cap.doc_id == img.vec_id, "inner"
    ).select(
        "doc_id",
        F.expr(
            "aggregate(zip_with(t, q, (a, b) -> a * b), 0L,"
            " (acc, v) -> acc + v)"
        ).alias("dot"),
        "t2",
        "q2",
    )
    scored = paired.withColumn(
        "cos_micro",
        F.expr(
            "CASE WHEN t2 = 0 OR q2 = 0 THEN 0 ELSE "
            "CAST(floor(CAST(dot AS DOUBLE)"
            " / sqrt(CAST(t2 * q2 AS DOUBLE)) * 1000000.0) AS BIGINT)"
            " END"
        ),
    )
    return scored.select(
        "doc_id",
        "dot",
        "t2",
        "q2",
        "cos_micro",
        F.when(F.col("cos_micro") >= CLIP_TAU_MICRO, "keep")
        .otherwise("drop")
        .alias("decision"),
    )


_CAPTION_ALIGN_SQL = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
  FROM documents WHERE text IS NOT NULL
),
tb AS (
  SELECT doc_id,
         CAST(TRY_CAST('0x' || substr(md5(w), 1, 2) AS INTEGER)
              % {CLIP_DIM} AS INTEGER) AS b,
         CASE WHEN substr(md5(w), 3, 1) < '8' THEN 1 ELSE -1 END AS s
  FROM tok
),
tvec AS (
  SELECT doc_id, b, CAST(sum(s) AS BIGINT) AS t FROM tb GROUP BY 1, 2
),
tn AS (
  SELECT doc_id, CAST(sum(t * t) AS BIGINT) AS t2 FROM tvec GROUP BY 1
),
q AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))
             AS q
  FROM embeddings
),
qn AS (
  SELECT vec_id,
         CAST(list_aggregate(list_transform(q, x -> x * x), 'sum')
              AS BIGINT) AS q2
  FROM q
),
dots AS (
  SELECT v.doc_id, CAST(sum(v.t * q.q[v.b + 1]) AS BIGINT) AS dot
  FROM tvec v JOIN q ON v.doc_id = q.vec_id GROUP BY 1
),
scored AS (
  SELECT d.doc_id, d.dot, tn.t2, qn.q2,
         CASE WHEN tn.t2 = 0 OR qn.q2 = 0 THEN 0 ELSE
           CAST(floor(CAST(d.dot AS DOUBLE)
                / sqrt(CAST(tn.t2 * qn.q2 AS DOUBLE)) * 1000000.0)
                AS BIGINT) END AS cos_micro
  FROM dots d
  JOIN tn ON d.doc_id = tn.doc_id
  JOIN qn ON d.doc_id = qn.vec_id
)
SELECT doc_id, dot, t2, q2, cos_micro,
       CASE WHEN cos_micro >= {CLIP_TAU_MICRO} THEN 'keep'
            ELSE 'drop' END AS decision
FROM scored
"""


# ---------------------------------------------------------------------------
# Wave 49b (r10): preference length-bias probe — the standard reward-data
# audit for verbosity bias (Singhal et al. 2023 "A Long Way to Go";
# RLHF reward models notoriously prefer longer responses). Over the SAME
# (user, day) comparison frame the Bradley-Terry family uses, each
# type's "response length" is its token volume (the wave-47 turn-token
# derivation); for every strictly-decided comparison the probe asks
# whether the longer side won, and reports the per-(type_a, type_b)
# longer-win rate plus chosen/rejected token sums — the table a reward-
# data prep inspects before training.
# Scale: one (user, day, type) combine -> per-(user, day) in-row pair
# explode (|types|^2-bounded) -> one tiny (type_a, type_b) combine; the
# pairwise_preference_matrix plan shape with one extra BIGINT per leg.
# ---------------------------------------------------------------------------


def preference_length_bias_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    counts = ev.groupBy(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("ct"),
        F.sum(
            F.lit(2)
            + F.coalesce(
                F.get_json_object("props", "$.k").cast("bigint"),
                F.lit(0),
            )
            % 5
        )
        .cast("bigint")
        .alias("tok"),
    )
    arr = counts.groupBy("user_id", "day").agg(
        F.sort_array(
            F.collect_list(F.struct("event_type", "ct", "tok"))
        ).alias("tc")
    )
    pairs = arr.select(
        F.explode(ordered_pair_structs("tc", "pa", "pb")).alias("p")
    ).select(
        F.col("p.pa.event_type").alias("type_a"),
        F.col("p.pb.event_type").alias("type_b"),
        F.col("p.pa.ct").alias("ca"),
        F.col("p.pb.ct").alias("cb"),
        F.col("p.pa.tok").alias("ta"),
        F.col("p.pb.tok").alias("tb"),
    )
    dec = pairs.withColumn(
        "chosen_tok",
        F.when(F.col("ca") > F.col("cb"), F.col("ta")).when(
            F.col("cb") > F.col("ca"), F.col("tb")
        ),
    ).withColumn(
        "rejected_tok",
        F.when(F.col("ca") > F.col("cb"), F.col("tb")).when(
            F.col("cb") > F.col("ca"), F.col("ta")
        ),
    )
    out = dec.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_comparisons"),
        F.count("chosen_tok").cast("bigint").alias("n_decided"),
        F.sum(
            F.when(F.col("chosen_tok") > F.col("rejected_tok"), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("longer_wins"),
        F.sum(
            F.when(F.col("chosen_tok") < F.col("rejected_tok"), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("shorter_wins"),
        F.coalesce(F.sum("chosen_tok"), F.lit(0))
        .cast("bigint")
        .alias("chosen_tok_sum"),
        F.coalesce(F.sum("rejected_tok"), F.lit(0))
        .cast("bigint")
        .alias("rejected_tok_sum"),
    )
    return out.withColumn(
        "longer_win_micro",
        F.expr(
            "CASE WHEN n_decided = 0 THEN 0"
            " ELSE longer_wins * 1000000 div n_decided END"
        ),
    )


_LENGTH_BIAS_SQL = """
WITH counts AS (
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(count(*) AS BIGINT) AS ct,
           CAST(sum(2 + coalesce(TRY_CAST(json_extract_string(
                    CASE WHEN json_valid(props) THEN props END, '$.k')
                    AS BIGINT), 0) % 5) AS BIGINT) AS tok
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      AND ts IS NOT NULL
    GROUP BY 1, 2, 3
),
pp AS (
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           a.ct AS ca, b.ct AS cb, a.tok AS ta, b.tok AS tb
    FROM counts a JOIN counts b
      ON a.user_id = b.user_id AND a.day = b.day
     AND a.event_type < b.event_type
),
dec AS (
    SELECT type_a, type_b,
           CASE WHEN ca > cb THEN ta WHEN cb > ca THEN tb END AS chosen_tok,
           CASE WHEN ca > cb THEN tb WHEN cb > ca THEN ta END AS rejected_tok
    FROM pp
),
agg AS (
    SELECT type_a, type_b,
           CAST(count(*) AS BIGINT) AS n_comparisons,
           CAST(count(chosen_tok) AS BIGINT) AS n_decided,
           CAST(sum(CASE WHEN chosen_tok > rejected_tok THEN 1 ELSE 0 END)
                AS BIGINT) AS longer_wins,
           CAST(sum(CASE WHEN chosen_tok < rejected_tok THEN 1 ELSE 0 END)
                AS BIGINT) AS shorter_wins,
           CAST(coalesce(sum(chosen_tok), 0) AS BIGINT) AS chosen_tok_sum,
           CAST(coalesce(sum(rejected_tok), 0) AS BIGINT)
               AS rejected_tok_sum
    FROM dec GROUP BY 1, 2
)
SELECT *,
       CAST(CASE WHEN n_decided = 0 THEN 0
                 ELSE longer_wins * 1000000 // n_decided END AS BIGINT)
           AS longer_win_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# Wave 50b (r10): DPO training-pair extraction (Rafailov et al. 2023,
# "Direct Preference Optimization"). A DPO prep turns raw preference
# signal into ONE (prompt, chosen, rejected) triple per prompt: the
# highest-margin decided comparison wins, weak-margin prompts are dropped
# (margin < MARGIN_MIN carries more label noise than signal — the
# standard filter), and each side carries its token volume so the trainer
# can length-balance. Runs over the SAME (user, day) comparison frame the
# Bradley-Terry / length-bias family uses: prompt = (user, day), response
# types ranked by engagement count, token volume = the wave-47 derivation.
#
# Scale: one (user, day, type) combine -> one (user, day) combine -> the
# in-row |types|^2-bounded pair explode -> row_number over the SAME
# (user, day) key (no third exchange; Spark plans a WindowGroupLimit so
# only the top row per prompt survives the sort). No joins anywhere.
# ---------------------------------------------------------------------------
DPO_MARGIN_MIN = 2


def dpo_pair_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).filter(
        F.col("user_id").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    )
    counts = ev.groupBy(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("ct"),
        F.sum(
            F.lit(2)
            + F.coalesce(
                F.get_json_object("props", "$.k").cast("bigint"),
                F.lit(0),
            )
            % 5
        )
        .cast("bigint")
        .alias("tok"),
    )
    arr = counts.groupBy("user_id", "day").agg(
        F.sort_array(
            F.collect_list(F.struct("event_type", "ct", "tok"))
        ).alias("tc")
    )
    pairs = arr.select(
        "user_id",
        "day",
        F.explode(ordered_pair_structs("tc", "pa", "pb")).alias("p"),
    ).select(
        "user_id",
        "day",
        F.col("p.pa.event_type").alias("type_a"),
        F.col("p.pb.event_type").alias("type_b"),
        F.col("p.pa.ct").alias("ca"),
        F.col("p.pb.ct").alias("cb"),
        F.col("p.pa.tok").alias("ta"),
        F.col("p.pb.tok").alias("tb"),
    )
    decided = pairs.filter(F.col("ca") != F.col("cb")).select(
        "user_id",
        "day",
        F.when(F.col("ca") > F.col("cb"), F.col("type_a"))
        .otherwise(F.col("type_b"))
        .alias("chosen_type"),
        F.when(F.col("ca") > F.col("cb"), F.col("type_b"))
        .otherwise(F.col("type_a"))
        .alias("rejected_type"),
        F.greatest(
            F.col("ca") - F.col("cb"), F.col("cb") - F.col("ca")
        ).alias("margin"),
        F.when(F.col("ca") > F.col("cb"), F.col("ta"))
        .otherwise(F.col("tb"))
        .alias("chosen_tok"),
        F.when(F.col("ca") > F.col("cb"), F.col("tb"))
        .otherwise(F.col("ta"))
        .alias("rejected_tok"),
    )
    w = Window.partitionBy("user_id", "day").orderBy(
        F.desc("margin"), F.asc("chosen_type"), F.asc("rejected_type")
    )
    best = (
        decided.withColumn("rn", F.row_number().over(w))
        .filter(
            (F.col("rn") == 1) & (F.col("margin") >= DPO_MARGIN_MIN)
        )
        .drop("rn")
    )
    return best.select(
        F.md5(
            F.concat_ws("|", F.col("user_id").cast("string"), F.col("day"))
        ).alias("prompt_id"),
        "day",
        "chosen_type",
        "rejected_type",
        "margin",
        "chosen_tok",
        "rejected_tok",
    )


_DPO_PAIR_SQL = f"""
WITH counts AS (
    SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_type,
           CAST(count(*) AS BIGINT) AS ct,
           CAST(sum(2 + coalesce(TRY_CAST(json_extract_string(
                    CASE WHEN json_valid(props) THEN props END, '$.k')
                    AS BIGINT), 0) % 5) AS BIGINT) AS tok
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      AND ts IS NOT NULL
    GROUP BY 1, 2, 3
),
pp AS (
    SELECT a.user_id, a.day,
           a.event_type AS type_a, b.event_type AS type_b,
           a.ct AS ca, b.ct AS cb, a.tok AS ta, b.tok AS tb
    FROM counts a JOIN counts b
      ON a.user_id = b.user_id AND a.day = b.day
     AND a.event_type < b.event_type
),
decided AS (
    SELECT user_id, day,
           CASE WHEN ca > cb THEN type_a ELSE type_b END AS chosen_type,
           CASE WHEN ca > cb THEN type_b ELSE type_a END AS rejected_type,
           greatest(ca - cb, cb - ca) AS margin,
           CASE WHEN ca > cb THEN ta ELSE tb END AS chosen_tok,
           CASE WHEN ca > cb THEN tb ELSE ta END AS rejected_tok
    FROM pp WHERE ca <> cb
),
best AS (
    SELECT * FROM decided
    QUALIFY row_number() OVER (
        PARTITION BY user_id, day
        ORDER BY margin DESC, chosen_type, rejected_type) = 1
)
SELECT md5(CAST(user_id AS VARCHAR) || '|' || day) AS prompt_id,
       day, chosen_type, rejected_type,
       CAST(margin AS BIGINT) AS margin, chosen_tok, rejected_tok
FROM best
WHERE margin >= {DPO_MARGIN_MIN}
"""


QUERIES = {
    "caption_image_alignment": caption_image_alignment,
    "dpo_pair_extraction": dpo_pair_extraction,
    "preference_length_bias_probe": preference_length_bias_probe,
    "semdedup_eps_sweep": semdedup_eps_sweep,
    "perplexity_bucket_assign": perplexity_bucket_assign,
    "fasttext_hash_quality": fasttext_hash_quality,
    "pairwise_preference_matrix": pairwise_preference_matrix,
    "bradley_terry_strength": bradley_terry_strength,
    "dawid_skene_vote": dawid_skene_vote,
    "episode_discounted_returns": episode_discounted_returns,
    "rouge_bigram_eval": rouge_bigram_eval,
    "bleu_ngram_eval": bleu_ngram_eval,
    "confident_learning_audit": confident_learning_audit,
    "importance_weight_ess": importance_weight_ess,
    "episode_advantage_baseline": episode_advantage_baseline,
    "pack_attention_waste": pack_attention_waste,
    "preference_holdout_accuracy": preference_holdout_accuracy,
    "chrf_char_eval": chrf_char_eval,
    "quality_threshold_sweep": quality_threshold_sweep,
    "distinct_ngram_diversity": distinct_ngram_diversity,
    "bitext_margin_mining": bitext_margin_mining,
    "episode_return_to_go": episode_return_to_go,
}

ORACLE = {
    "caption_image_alignment": _CAPTION_ALIGN_SQL,
    "dpo_pair_extraction": _DPO_PAIR_SQL,
    "preference_length_bias_probe": _LENGTH_BIAS_SQL,
    "semdedup_eps_sweep": _semdedup_sql(),
    "perplexity_bucket_assign": _perplexity_bucket_sql(),
    "fasttext_hash_quality": _FASTTEXT_SQL,
    "pairwise_preference_matrix": _PREF_MATRIX_SQL,
    "bradley_terry_strength": _bt_sql(),
    "dawid_skene_vote": _DS_SQL,
    "episode_discounted_returns": _EPISODE_SQL,
    "rouge_bigram_eval": _ROUGE_SQL,
    "bleu_ngram_eval": _BLEU_SQL,
    "confident_learning_audit": _confident_learning_sql(),
    "importance_weight_ess": _ess_sql(),
    "episode_advantage_baseline": _ADVANTAGE_SQL,
    "pack_attention_waste": _pack_waste_sql(),
    "preference_holdout_accuracy": _pref_holdout_sql(),
    "chrf_char_eval": _CHRF_SQL,
    "quality_threshold_sweep": _SWEEP_SQL,
    "distinct_ngram_diversity": _DISTINCT_N_SQL,
    "bitext_margin_mining": _bitext_sql(),
    "episode_return_to_go": _RTG_SQL,
}
