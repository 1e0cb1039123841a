"""Corpus retrieval / tokenizer-training operators: BM25 search,
BPE merge-candidate counting, and cross-document span dedup.

These extend the training-data-pipeline surface (BASELINE.json north-star,
beyond the reference's own operators — closest reference analogue is the
keyword-search filter ``DwsTrafficSourceKeywordPageViewWindow.java:50-56``,
which this generalizes from single-term match to ranked retrieval):

- BM25: the inverted-index retrieval shape. The query set is constant and
  tiny -> broadcast; the corpus side is ONE tokenize+explode scan filtered
  to query terms before any shuffle (posting lists for non-query terms
  never leave the scan stage). Two tiny-key aggregates (df per term, tf per
  (doc, term)) with map-side combine; the scoring join fans tf rows against
  the broadcast df/query constants. At 100 TB the only corpus-sized shuffle
  is the (doc_id, term) tf combine over matched postings.
- BPE pair counts: the first step of byte-pair-encoding tokenizer training
  — count adjacent-token pairs corpus-wide, take the top merge candidates.
  One shuffle on the pair key with map-side combine; top-k is
  TakeOrderedAndProject (no global sort materialization).
- Span dedup: the exact-substring-dedup approximation at fixed window
  granularity (the practical stand-in for suffix-array dedup at scale
  — cf. Lee et al., "Deduplicating Training Data Makes Language Models
  Better"): hash non-overlapping W-token windows, find windows appearing
  in >= 2 distinct documents, report each document's duplicated-span
  share. Everything keys on the span hash — one shuffle, even keys.

Float determinism: every double emitted here is either a single division
of two exact integers or a fixed-order chain of IEEE754 correctly-rounded
ops (+ - * / sqrt) over values derived from integers, written identically
in the Spark expression and the DuckDB oracle — so hash comparison is
exact. Per-term BM25 contributions are floored to integer micro-units
BEFORE the per-doc sum, so the aggregation is order-independent exact
bigint math (same trick as `functions/exprs.py::money_cents`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.exprs import (
    ordered_pair_structs,
    tokens,
)
from realtimedatawarehouse_self_spark.plans.llm_ops import _docs

# ---------------------------------------------------------------------------
# BM25-family scoring (k1 = 1.2, b = 0.75; constants inlined into both
# expression trees). idf is the Robertson odds ratio
# (N - df + 0.5)/(df + 0.5) WITHOUT the log — a DOCUMENTED DEVIATION from
# textbook BM25, chosen so the expression stays inside the IEEE754
# correctly-rounded op set (ln differs in the last ulp across libm
# implementations; +-*/ and sqrt never do), keeping the cross-engine
# oracle comparison exact. Consequences, stated honestly: per-TERM
# ranking is unchanged (log is monotone), but the per-document SUM
# weights rare terms more aggressively than log-idf BM25 — one very rare
# term can outrank two moderately rare ones that log-idf would score
# near-equal. Single-term queries rank identically to BM25. On a real
# deployment (no bit-parity oracle) swap the odds ratio for
# ln(odds + 1) in `_CONTRIB_FMT` — a one-line change; the distributed
# plan (pruned postings, broadcast df, micro-unit sum) is unaffected.
# ---------------------------------------------------------------------------
BM25_QUERIES = (
    (0, ("table", "scan", "filter")),
    (1, ("join", "merge", "sort")),
    (2, ("vector", "stream", "batch")),
)
BM25_TOPK = 10

# (query_id, term) rows for the broadcast side.
_QUERY_ROWS = [(qid, t) for qid, terms in BM25_QUERIES for t in terms]
_ALL_TERMS = sorted({t for _, terms in BM25_QUERIES for t in terms})

# One scoring formula, one operation order, two renderings. Placeholders
# are column/expression strings supplied per engine.
_CONTRIB_FMT = (
    "CAST(floor((((CAST({N} - {df} AS DOUBLE) + 0.5)"
    " / (CAST({df} AS DOUBLE) + 0.5))"
    " * ((CAST({tf} AS DOUBLE) * 2.2)"
    " / (CAST({tf} AS DOUBLE)"
    "    + 1.2 * (0.25 + 0.75 * (CAST({dl} AS DOUBLE) / {avgdl})))))"
    " * 1000000.0) AS BIGINT)"
)


def bm25_doc_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE tokenize pass over the corpus (r11; guide §8 decide-with-small-
    # rows). Previously the stats branch and the postings branch were
    # separate consumers of the tokenized scan — two full corpus
    # tokenizations, plus a corpus-sized (doc_id, term) exchange for the
    # tf combine. The slim frame below keeps only (doc_id, dl, matched
    # tokens) — a few dozen bytes per document at any scale — and is
    # persisted so stats and scoring read it instead of re-tokenizing.
    # tf then needs NO exchange at all: per-document term counts are
    # in-row array arithmetic over the matched sliver (multiset count per
    # distinct matched term == the former groupBy(doc_id, term) count).
    term_lits = F.array(*[F.lit(t) for t in _ALL_TERMS])
    slim = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(tokens("text")).cast("bigint").alias("dl"),
        F.filter(
            tokens("text"), lambda x: F.array_contains(term_lits, x)
        ).alias("mtoks"),
    ).persist()
    # Corpus stats: one tiny aggregate over persisted slim rows.
    stats = slim.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    # (doc, term, tf) without a shuffle: in-row count per distinct
    # matched term; docs with no matches emit nothing (empty explode),
    # exactly like the former filtered-postings groupBy.
    tf = slim.select(
        "doc_id",
        "dl",
        F.explode(
            F.expr(
                "transform(array_distinct(mtoks), t -> struct("
                "t AS term, "
                "CAST(size(filter(mtoks, x -> x = t)) AS BIGINT) AS tf))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.term").alias("term"), F.col("p.tf").alias("tf"), "dl")
    # df falls out of tf for free: one row per (doc, term) means counting
    # rows per term IS the document frequency. The aggregate runs over the
    # matched sliver with map-side combine down to |query terms| keys.
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    qterms = spark.createDataFrame(_QUERY_ROWS, "query_id INT, term STRING")
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "avgdl",
            F.expr("CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)"),
        )
        .withColumn(
            "contrib_micro",
            F.expr(
                _CONTRIB_FMT.format(
                    N="n_docs", df="df", tf="tf", dl="dl", avgdl="avgdl"
                )
            ),
        )
    )
    per_doc = scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib_micro").alias("score_micro"),
        F.count(F.lit(1)).cast("bigint").alias("matched_terms"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK)
        .select("query_id", "rank", "doc_id", "score_micro", "matched_terms")
    )


def _bm25_sql() -> str:
    qvals = ", ".join(f"({qid}, '{t}')" for qid, t in _QUERY_ROWS)
    terms = ", ".join(f"'{t}'" for t in _ALL_TERMS)
    contrib = _CONTRIB_FMT.format(
        N="s.n_docs", df="d.df", tf="t.tf", dl="t.dl", avgdl="s.avgdl"
    )
    return f"""
WITH docs AS (
    SELECT doc_id, t, CAST(len(t) AS BIGINT) AS dl
    FROM (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents
    )
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(dl) AS BIGINT) AS sum_dl,
           CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
    FROM docs
),
postings AS (
    SELECT docs.doc_id, docs.dl, u.term
    FROM docs, UNNEST(docs.t) AS u(term)
    WHERE u.term IN ({terms})
),
tf AS (
    SELECT doc_id, term,
           CAST(count(*) AS BIGINT) AS tf,
           any_value(dl) AS dl
    FROM postings GROUP BY 1, 2
),
df AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df
    FROM (SELECT DISTINCT doc_id, term FROM postings) GROUP BY 1
),
q(query_id, term) AS (VALUES {qvals}),
scored AS (
    SELECT q.query_id, t.doc_id, {contrib} AS contrib_micro
    FROM tf t
    JOIN q ON t.term = q.term
    JOIN df d ON t.term = d.term
    CROSS JOIN stats s
),
per_doc AS (
    SELECT query_id, doc_id,
           CAST(sum(contrib_micro) AS BIGINT) AS score_micro,
           CAST(count(*) AS BIGINT) AS matched_terms
    FROM scored GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, score_micro, matched_terms
FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank
    FROM per_doc
) WHERE rank <= {BM25_TOPK}
"""


# ---------------------------------------------------------------------------
# BPE merge-candidate counting: adjacent-pair frequencies, top merges.
# `_adjacent_pairs` is shared with `collocation_pmi` below.
# ---------------------------------------------------------------------------
BPE_TOPK = 20


def _adjacent_pairs(docs: DataFrame) -> DataFrame:
    """(lhs, rhs) rows for every adjacent token pair (expects tok_arr)."""
    return docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(tok_arr) < 2 THEN array() "
                "ELSE transform(sequence(0, size(tok_arr) - 2), "
                "i -> struct(tok_arr[i] AS lhs, tok_arr[i+1] AS rhs)) END"
            )
        ).alias("p")
    ).select("p.lhs", "p.rhs")


def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    pairs = _adjacent_pairs(docs)
    counted = pairs.groupBy("lhs", "rhs").agg(
        F.count(F.lit(1)).cast("bigint").alias("pair_ct")
    )
    # Total order (ct desc, lhs, rhs) -> the limit is deterministic and the
    # physical plan is TakeOrderedAndProject, not a global sort.
    ranked = counted.orderBy(
        F.col("pair_ct").desc(), F.col("lhs"), F.col("rhs")
    ).limit(BPE_TOPK)
    w = Window.orderBy(F.col("pair_ct").desc(), F.col("lhs"), F.col("rhs"))
    return ranked.withColumn("merge_rank", F.row_number().over(w)).select(
        "merge_rank", "lhs", "rhs", "pair_ct"
    )


_BPE_SQL = f"""
WITH tok AS (
    SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
pairs AS (
    SELECT t[i] AS lhs, t[i+1] AS rhs
    FROM tok, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
),
counted AS (
    SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS pair_ct
    FROM pairs GROUP BY 1, 2
)
SELECT CAST(row_number() OVER (ORDER BY pair_ct DESC, lhs, rhs) AS INTEGER)
           AS merge_rank,
       lhs, rhs, pair_ct
FROM counted
ORDER BY pair_ct DESC, lhs, rhs
LIMIT {BPE_TOPK}
"""


# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING (iterative subword merges) — the operator above
# (`bpe_pair_counts`) ranks word-level pairs once; this one actually runs
# the byte-pair-encoding loop at WORD-INTERNAL character level, the way a
# tokenizer is trained. The classic scale-out formulation: collapse the
# corpus to (word, freq) FIRST — one combine-backed shuffle bounded by
# |vocab|, not |tokens| — then every merge round operates on the vocab
# frame with a broadcast 1-row argmax, so 100 TB of text costs one corpus
# pass plus vocab-sized rounds (Sennrich et al., ACL'16, re-expressed
# DataFrame-first).
#
# Engine-identical primitives (verified bit-for-bit both engines):
#   - char split: regexp_replace(word, '(.)', '$1 ') — one codepoint per
#     symbol, unicode-safe;
#   - greedy merge: replace(sym, ' a b ', ' ab ') — leftmost
#     non-overlapping scan. NOTE (ADVICE r7): the pattern's trailing space
#     consumes the separator of the next match, so an even-length run of
#     identical symbols UNDER-merges relative to Sennrich BPE:
#     ' a a a a ' -> ' aa a a ' (one merge) where reference BPE produces
#     ' aa aa ' (two). Odd runs agree ('a a a' -> 'aa a' both). Both
#     engines use the identical replace, so parity holds exactly; the
#     divergence from textbook BPE is only on even-length identical runs;
#   - argmax total order: (count DESC, lhs, rhs).
# Symbol identity is the surface string (no end-of-word marker), the
# standard no-marker simplification; pair counts weight by word freq and
# count every adjacent position (the reference implementation's behavior).
# ---------------------------------------------------------------------------
BPE_MERGE_ROUNDS = 3


_BPE_CHAR_SPLIT = "' ' || regexp_replace({col}, '(.)', '$1 ')"


def _bpe_pair_top1(frame):
    """Argmax adjacent-symbol pair over a (freq, sym) vocab frame, under
    the (count DESC, lhs, rhs) total order (shared by train + apply)."""
    pairs = (
        frame.withColumn("arr", F.expr("split(trim(sym), ' ')"))
        .filter(F.expr("size(arr) >= 2"))
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(arr) - 2),"
                    " i -> struct(arr[i] AS lhs, arr[i+1] AS rhs))"
                )
            ).alias("p"),
        )
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum("freq").cast("bigint").alias("pair_ct"))
    )
    return pairs.orderBy(
        F.col("pair_ct").desc(), F.col("lhs"), F.col("rhs")
    ).limit(1)


def _bpe_apply_merge(frame, top, keep: tuple[str, ...] = ("freq",)):
    """One merge round: broadcast the 1-row (lhs, rhs) argmax and rewrite
    every symbol string (leftmost non-overlapping replace; see the
    even-run caveat in the module comment above)."""
    return frame.crossJoin(F.broadcast(top.select("lhs", "rhs"))).select(
        *keep,
        F.expr(
            "replace(sym, ' ' || lhs || ' ' || rhs || ' ',"
            " ' ' || lhs || rhs || ' ')"
        ).alias("sym"),
    )


def _bpe_vocab(docs: DataFrame) -> DataFrame:
    return (
        docs.select(F.explode("tok_arr").alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .select(
            "freq",
            F.expr(_BPE_CHAR_SPLIT.format(col="word")).alias("sym"),
        )
    )


def bpe_merge_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    wf = _bpe_vocab(docs)  # no persist (r10 A/B: 2.43 s vs 2.92 s)

    rows = []
    cur = wf
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        top = _bpe_pair_top1(cur)
        cur = _bpe_apply_merge(cur, top)
        after = cur.agg(
            F.sum(F.expr("freq * size(split(trim(sym), ' '))"))
            .cast("bigint")
            .alias("corpus_symbols_after")
        )
        rows.append(
            top.crossJoin(F.broadcast(after)).select(
                F.lit(rnd).cast("int").alias("round"),
                "lhs",
                "rhs",
                "pair_ct",
                F.expr("lhs || rhs").alias("new_symbol"),
                "corpus_symbols_after",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _bpe_merge_sql() -> str:
    rounds = []
    prev = "wf0"
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        rounds.append(
            f"""p{rnd} AS (
    SELECT t[i] AS lhs, t[i + 1] AS rhs, CAST(sum(freq) AS BIGINT) AS pair_ct
    FROM (SELECT freq, string_split(trim(sym), ' ') AS t FROM {prev}),
         UNNEST(range(1, greatest(len(t), 1))) AS u(i)
    GROUP BY 1, 2
),
top{rnd} AS (
    SELECT lhs, rhs, pair_ct FROM p{rnd}
    ORDER BY pair_ct DESC, lhs, rhs LIMIT 1
),
wf{rnd} AS (
    SELECT w.freq,
           replace(w.sym, ' ' || t.lhs || ' ' || t.rhs || ' ',
                   ' ' || t.lhs || t.rhs || ' ') AS sym
    FROM {prev} w, top{rnd} t
),
row{rnd} AS (
    SELECT CAST({rnd} AS INTEGER) AS round, t.lhs, t.rhs, t.pair_ct,
           t.lhs || t.rhs AS new_symbol,
           (SELECT CAST(sum(freq * len(string_split(trim(sym), ' ')))
                   AS BIGINT) FROM wf{rnd}) AS corpus_symbols_after
    FROM top{rnd} t
)"""
        )
        prev = f"wf{rnd}"
    union = " UNION ALL ".join(
        f"SELECT * FROM row{r}" for r in range(1, BPE_MERGE_ROUNDS + 1)
    )
    return f"""
WITH tok AS (
    SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
wf0 AS (
    SELECT CAST(count(*) AS BIGINT) AS freq,
           ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym
    FROM (SELECT unnest(t) AS word FROM tok)
    GROUP BY word
),
{", ".join(rounds)}
{union}
"""


# ---------------------------------------------------------------------------
# BPE tokenizer APPLICATION + fertility audit — the other half of
# `bpe_merge_rounds`: train the same BPE_MERGE_ROUNDS-round merge table
# on the whole corpus, APPLY it to every word, and report per-language
# fertility (symbols emitted per token occurrence) and compression
# (symbols per character) — the numbers a tokenizer team reads before
# shipping a vocab (a tokenizer trained on an 'en'-heavy corpus shows
# higher fertility on the minority languages; this op measures exactly
# that skew). Scale shape: the corpus collapses ONCE to (lang, word,
# freq) — a combine-backed shuffle bounded by |vocab|·|langs| — training
# runs on the lang-summed vocab frame (sublinear in corpus, same as
# bpe_merge_rounds), and application is BPE_MERGE_ROUNDS broadcast
# 1-row crossJoins over DISTINCT words, never the corpus. Fertility /
# compression are floored micro rationals over DECIMAL(38,0)/HUGEINT
# (token counts at 100 TB exceed BIGINT·1e6 headroom).
# ---------------------------------------------------------------------------
def _bpe_apply_merge_safe(frame, top, keep: tuple[str, ...] = ("freq",)):
    """Like _bpe_apply_merge, but survives an EXHAUSTED merge round: the
    argmax frame is aggregated to exactly one row (NULL lhs/rhs when no
    pair exists — a corpus whose vocabulary collapsed before
    BPE_MERGE_ROUNDS), and a NULL merge is a no-op instead of a
    vocabulary-wiping crossJoin against an empty frame (found by the
    hypothesis recount: a single one-word document)."""
    one = top.agg(F.max("lhs").alias("lhs"), F.max("rhs").alias("rhs"))
    return frame.crossJoin(F.broadcast(one)).select(
        *keep,
        F.expr(
            "CASE WHEN lhs IS NULL THEN sym"
            " ELSE replace(sym, ' ' || lhs || ' ' || rhs || ' ',"
            " ' ' || lhs || rhs || ' ') END"
        ).alias("sym"),
    )


def bpe_apply_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    wl = (
        docs.filter(F.col("lang").isNotNull())
        .select("lang", F.explode("tok_arr").alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
        .persist()
    )
    # train on the lang-summed vocab (identical merge table to
    # bpe_merge_rounds: same corpus totals, same argmax total order)
    wf = wl.groupBy("word").agg(F.sum("freq").cast("bigint").alias("freq")).select(
        "freq", F.expr(_BPE_CHAR_SPLIT.format(col="word")).alias("sym")
    )
    tops = []
    cur = wf
    for _ in range(BPE_MERGE_ROUNDS):
        top = _bpe_pair_top1(cur).persist()
        tops.append(top)
        cur = _bpe_apply_merge_safe(cur, top)
    # apply the learned merges to the distinct-word frame
    words = wl.select("word").distinct().select(
        "word", F.expr(_BPE_CHAR_SPLIT.format(col="word")).alias("sym")
    )
    for top in tops:
        words = _bpe_apply_merge_safe(words, top, keep=("word",))
    n_sym = words.select(
        "word",
        F.expr("CAST(size(split(trim(sym), ' ')) AS BIGINT)").alias("n_sym"),
    )
    return (
        wl.join(n_sym, "word")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
            F.sum("freq").cast("bigint").alias("n_tokens"),
            F.sum(F.expr("freq * n_sym")).cast("bigint").alias("sum_symbols"),
            F.sum(F.expr("freq * length(word)"))
            .cast("bigint")
            .alias("sum_chars"),
        )
        .select(
            "lang",
            "n_vocab",
            "n_tokens",
            "sum_symbols",
            F.expr(
                "CAST(CAST(sum_symbols AS DECIMAL(38,0)) * 1000000"
                " div n_tokens AS BIGINT)"
            ).alias("fertility_micro"),
            F.expr(
                "CAST(CAST(sum_symbols AS DECIMAL(38,0)) * 1000000"
                " div sum_chars AS BIGINT)"
            ).alias("compression_micro"),
        )
    )


def _bpe_apply_sql() -> str:
    rounds = []
    prev = "wf0"
    wprev = "w0"
    for rnd in range(1, BPE_MERGE_ROUNDS + 1):
        rounds.append(
            f"""p{rnd} AS (
    SELECT t[i] AS lhs, t[i + 1] AS rhs, CAST(sum(freq) AS BIGINT) AS pair_ct
    FROM (SELECT freq, string_split(trim(sym), ' ') AS t FROM {prev}),
         UNNEST(range(1, greatest(len(t), 1))) AS u(i)
    GROUP BY 1, 2
),
top{rnd} AS (
    SELECT max(lhs) AS lhs, max(rhs) AS rhs FROM (
        SELECT lhs, rhs FROM p{rnd}
        ORDER BY pair_ct DESC, lhs, rhs LIMIT 1
    )
),
wf{rnd} AS (
    SELECT w.freq,
           CASE WHEN t.lhs IS NULL THEN w.sym
                ELSE replace(w.sym, ' ' || t.lhs || ' ' || t.rhs || ' ',
                     ' ' || t.lhs || t.rhs || ' ') END AS sym
    FROM {prev} w, top{rnd} t
),
w{rnd} AS (
    SELECT w.word,
           CASE WHEN t.lhs IS NULL THEN w.sym
                ELSE replace(w.sym, ' ' || t.lhs || ' ' || t.rhs || ' ',
                     ' ' || t.lhs || t.rhs || ' ') END AS sym
    FROM {wprev} w, top{rnd} t
)"""
        )
        prev = f"wf{rnd}"
        wprev = f"w{rnd}"
    return f"""
WITH tokl AS (
    SELECT lang, list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
    WHERE lang IS NOT NULL
),
wl AS (
    SELECT lang, word, CAST(count(*) AS BIGINT) AS freq
    FROM (SELECT lang, unnest(t) AS word FROM tokl)
    GROUP BY 1, 2
),
wf0 AS (
    SELECT CAST(sum(freq) AS BIGINT) AS freq,
           ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym
    FROM wl GROUP BY word
),
w0 AS (
    SELECT DISTINCT word,
           ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS sym
    FROM wl
),
{", ".join(rounds)},
ns AS (
    SELECT word,
           CAST(len(string_split(trim(sym), ' ')) AS BIGINT) AS n_sym
    FROM {wprev}
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_vocab,
       CAST(sum(freq) AS BIGINT) AS n_tokens,
       CAST(sum(freq * n_sym) AS BIGINT) AS sum_symbols,
       CAST(CAST(sum(freq * n_sym) AS HUGEINT) * 1000000
            // sum(freq) AS BIGINT) AS fertility_micro,
       CAST(CAST(sum(freq * n_sym) AS HUGEINT) * 1000000
            // sum(freq * length(word)) AS BIGINT) AS compression_micro
FROM wl JOIN ns USING (word)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Kneser–Ney bigram counts — the discounted LM estimate the coverage /
# quality operators (`lm_bigram_coverage`, `lm_quality_probability`)
# stop short of: absolute discounting with continuation-count backoff
# (Kneser–Ney '95; Chen & Goodman '99), entirely in exact integers:
#   p_disc(b|a)  = (c(ab) - D) / c(a)            (D = 0.75 in micro)
#   lambda(a)    = D * N1+(a·) / c(a)            (backoff mass)
#   p_cont(b)    = N1+(·b)  / N1+(··)            (continuation unigram)
# Every quantity is a count ratio floored in micro-units — no logs, no
# floats. One pair shuffle (|bigram types|-bounded), two tiny distinct-
# neighbor frames broadcast back; top-K by the (ct DESC, lhs, rhs) total
# order compiles to TakeOrderedAndProject.
# ---------------------------------------------------------------------------
KN_TOPK = 25
KN_DISCOUNT_MICRO = 750_000


def kneser_ney_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    pairs = _adjacent_pairs(docs)
    bi = pairs.groupBy("lhs", "rhs").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_ab")
    ).persist()
    left_tot = bi.groupBy("lhs").agg(
        F.sum("c_ab").cast("bigint").alias("c_a"),
        F.count(F.lit(1)).cast("bigint").alias("n_follow"),
    )
    cont = bi.groupBy("rhs").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_precede")
    )
    n_types = bi.agg(F.count(F.lit(1)).cast("bigint").alias("n_bigram_types"))
    scored = (
        bi.join(F.broadcast(left_tot), "lhs")
        .join(F.broadcast(cont), "rhs")
        .crossJoin(F.broadcast(n_types))
        .select(
            "lhs",
            "rhs",
            "c_ab",
            "c_a",
            F.expr(
                f"CAST(greatest(c_ab * 1000000 - {KN_DISCOUNT_MICRO}, 0)"
                " div c_a AS BIGINT)"
            ).alias("p_disc_micro"),
            F.expr(
                f"CAST({KN_DISCOUNT_MICRO} * n_follow div c_a AS BIGINT)"
            ).alias("lambda_micro"),
            F.expr(
                "CAST(n_precede * 1000000 div n_bigram_types AS BIGINT)"
            ).alias("p_cont_micro"),
        )
    )
    return scored.orderBy(
        F.col("c_ab").desc(), F.col("lhs"), F.col("rhs")
    ).limit(KN_TOPK)


_KN_SQL = f"""
WITH tok AS (
    SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
pairs AS (
    SELECT t[i] AS lhs, t[i+1] AS rhs
    FROM tok, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
),
bi AS (
    SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS c_ab
    FROM pairs GROUP BY 1, 2
),
left_tot AS (
    SELECT lhs, CAST(sum(c_ab) AS BIGINT) AS c_a,
           CAST(count(*) AS BIGINT) AS n_follow
    FROM bi GROUP BY 1
),
cont AS (
    SELECT rhs, CAST(count(*) AS BIGINT) AS n_precede FROM bi GROUP BY 1
),
n_types AS (SELECT CAST(count(*) AS BIGINT) AS n_bigram_types FROM bi)
SELECT b.lhs, b.rhs, b.c_ab, l.c_a,
       CAST(greatest(b.c_ab * 1000000 - {KN_DISCOUNT_MICRO}, 0) // l.c_a
            AS BIGINT) AS p_disc_micro,
       CAST({KN_DISCOUNT_MICRO} * l.n_follow // l.c_a AS BIGINT)
           AS lambda_micro,
       CAST(c.n_precede * 1000000 // t.n_bigram_types AS BIGINT)
           AS p_cont_micro
FROM bi b JOIN left_tot l USING (lhs) JOIN cont c USING (rhs), n_types t
ORDER BY b.c_ab DESC, b.lhs, b.rhs
LIMIT {KN_TOPK}
"""


# ---------------------------------------------------------------------------
# PMI collocation mining: rank adjacent pairs by pointwise mutual
# information — the association measure separating real collocations
# ("hash join") from merely-frequent pairs ("the the"). Log-free like BM25's
# idf: ranking uses the PMI odds N_pairs*c_xy / (c_x*c_y) (log is monotone,
# and unlike BM25 nothing is summed afterwards, so the ranking is EXACTLY
# PMI's). The scaled odds is pure wide-integer arithmetic
# (DECIMAL(38,0)/HUGEINT products — bigint would overflow once
# 1e6*N_pairs*c_xy passes 2^63, i.e. web-scale corpora), floored via
# integer division: no floating point anywhere, bit-exact across engines.
# MIN_PAIR_CT prunes the singleton-pair tail (classic PMI noise) before
# the unigram join; unigram counts broadcast (vocab << corpus).
# ---------------------------------------------------------------------------
PMI_TOPK = 20
MIN_PAIR_CT = 5
PMI_SCALE = 1_000_000


def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    pairs = _adjacent_pairs(docs)
    pair_ct = pairs.groupBy("lhs", "rhs").agg(
        F.count(F.lit(1)).cast("bigint").alias("pair_ct")
    )
    n_pairs = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    uni = (
        docs.select(F.explode("tok_arr").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("uni_ct"))
    )
    scored = (
        pair_ct.filter(F.col("pair_ct") >= MIN_PAIR_CT)
        .join(
            F.broadcast(uni.select(F.col("tok").alias("lhs"),
                                   F.col("uni_ct").alias("lhs_ct"))),
            "lhs",
        )
        .join(
            F.broadcast(uni.select(F.col("tok").alias("rhs"),
                                   F.col("uni_ct").alias("rhs_ct"))),
            "rhs",
        )
        .crossJoin(F.broadcast(n_pairs))
        .withColumn(
            "pmi_odds_micro",
            F.expr(
                f"CAST((CAST({PMI_SCALE} AS DECIMAL(38,0)) * n_pairs"
                f" * pair_ct) div (CAST(lhs_ct AS DECIMAL(38,0)) * rhs_ct)"
                f" AS BIGINT)"
            ),
        )
    )
    w = Window.orderBy(
        F.col("pmi_odds_micro").desc(), F.col("lhs"), F.col("rhs")
    )
    return (
        scored.orderBy(
            F.col("pmi_odds_micro").desc(), F.col("lhs"), F.col("rhs")
        )
        .limit(PMI_TOPK)
        .withColumn("pmi_rank", F.row_number().over(w))
        .select("pmi_rank", "lhs", "rhs", "pair_ct", "pmi_odds_micro")
    )


_PMI_SQL = f"""
WITH tok AS (
    SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
pairs AS (
    SELECT t[i] AS lhs, t[i+1] AS rhs
    FROM tok, UNNEST(range(1, greatest(len(t), 1))) AS u(i)
),
pair_ct AS (
    SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS pair_ct
    FROM pairs GROUP BY 1, 2
),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs),
uni AS (
    SELECT u.t AS tok, CAST(count(*) AS BIGINT) AS uni_ct
    FROM tok, UNNEST(t) AS u(t) GROUP BY 1
),
scored AS (
    SELECT p.lhs, p.rhs, p.pair_ct,
           CAST((CAST({PMI_SCALE} AS HUGEINT) * np.n_pairs * p.pair_ct)
                // (CAST(l.uni_ct AS HUGEINT) * r.uni_ct)
                AS BIGINT) AS pmi_odds_micro
    FROM pair_ct p
    JOIN uni l ON p.lhs = l.tok
    JOIN uni r ON p.rhs = r.tok
    CROSS JOIN np
    WHERE p.pair_ct >= {MIN_PAIR_CT}
)
SELECT CAST(row_number() OVER (ORDER BY pmi_odds_micro DESC, lhs, rhs)
            AS INTEGER) AS pmi_rank,
       lhs, rhs, pair_ct, pmi_odds_micro
FROM scored
ORDER BY pmi_odds_micro DESC, lhs, rhs
LIMIT {PMI_TOPK}
"""


# ---------------------------------------------------------------------------
# Cross-document span dedup (fixed-window exact-substring approximation).
# ---------------------------------------------------------------------------
SPAN_W = 8


def span_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    spans = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(tok_arr) < {SPAN_W} THEN array() "
                f"ELSE transform(sequence(0, (size(tok_arr) div {SPAN_W}) - 1), "
                f"i -> md5(array_join(slice(tok_arr, i * {SPAN_W} + 1, "
                f"{SPAN_W}), ' '))) END"
            )
        ).alias("h"),
    )
    # Distinct docs per span hash; a span is duplicated if seen in >= 2.
    span_df = (
        spans.distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).cast("bigint").alias("span_docs"))
    )
    flagged = spans.join(span_df, "h")
    agg = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum((F.col("span_docs") >= 2).cast("bigint")).alias("dup_spans"),
    )
    return agg.select(
        "doc_id",
        "n_spans",
        "dup_spans",
        (F.col("dup_spans").cast("double") / F.col("n_spans")).alias(
            "dup_frac"
        ),
    )


_SPAN_SQL = f"""
WITH tok AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
spans AS (
    SELECT doc_id,
           md5(array_to_string(
               t[(i * {SPAN_W} + 1):(i * {SPAN_W} + {SPAN_W})], ' ')) AS h
    FROM tok,
         UNNEST(range(0, greatest(len(t) // {SPAN_W}, 0))) AS u(i)
    WHERE len(t) >= {SPAN_W}
),
span_df AS (
    SELECT h, CAST(count(*) AS BIGINT) AS span_docs
    FROM (SELECT DISTINCT doc_id, h FROM spans) GROUP BY 1
),
agg AS (
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN d.span_docs >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_spans
    FROM spans s JOIN span_df d USING (h)
    GROUP BY 1
)
SELECT doc_id, n_spans, dup_spans,
       CAST(dup_spans AS DOUBLE) / n_spans AS dup_frac
FROM agg
"""


# ---------------------------------------------------------------------------
# Cross-source span overlap matrix — corpus provenance / leakage
# diagnostics: which ingest sources share verbatim W-token spans (mirror
# sites, syndicated content, benchmark leakage between "independent"
# crawls). Same window-hash primitive as span_dedup_stats; the pair
# explode is bounded by the SOURCE domain (≤ S(S-1)/2 per span however
# many documents share it), so the shuffle is span-hash keyed and the
# output is at most S² rows. Overlap coefficient = inter / min(|a|, |b|)
# in integer micro-units (the containment-leaning measure — a small
# source fully copied into a big one scores 1.0, which is exactly the
# provenance signal wanted; Jaccard would dilute it).
# ---------------------------------------------------------------------------
def source_span_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    spans = docs.select(
        "source",
        F.explode(
            F.expr(
                f"CASE WHEN size(tok_arr) < {SPAN_W} THEN array() "
                f"ELSE transform(sequence(0, (size(tok_arr) div {SPAN_W}) - 1), "
                f"i -> md5(array_join(slice(tok_arr, i * {SPAN_W} + 1, "
                f"{SPAN_W}), ' '))) END"
            )
        ).alias("h"),
    ).distinct()
    sizes = spans.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans")
    )
    per_span = spans.groupBy("h").agg(
        F.array_sort(F.collect_set("source")).alias("srcs")
    ).filter(F.size("srcs") >= 2)
    inter = (
        per_span.select(
            F.explode(
                ordered_pair_structs("srcs", "src_a", "src_b")
            ).alias("p")
        )
        .groupBy("p.src_a", "p.src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_spans"))
    )
    sz_a = sizes.select(
        F.col("source").alias("src_a"), F.col("n_spans").alias("spans_a")
    )
    sz_b = sizes.select(
        F.col("source").alias("src_b"), F.col("n_spans").alias("spans_b")
    )
    return (
        inter.join(F.broadcast(sz_a), "src_a")
        .join(F.broadcast(sz_b), "src_b")
        .select(
            "src_a",
            "src_b",
            "spans_a",
            "spans_b",
            "shared_spans",
            F.expr(
                "shared_spans * 1000000 div least(spans_a, spans_b)"
            ).alias("overlap_micro"),
        )
    )


_SOURCE_OVERLAP_SQL = f"""
WITH tok AS (
    SELECT source,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
spans AS (
    SELECT DISTINCT source,
           md5(array_to_string(
               t[(i * {SPAN_W} + 1):(i * {SPAN_W} + {SPAN_W})], ' ')) AS h
    FROM tok,
         UNNEST(range(0, greatest(len(t) // {SPAN_W}, 0))) AS u(i)
    WHERE len(t) >= {SPAN_W}
),
sizes AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_spans
    FROM spans GROUP BY 1
),
inter AS (
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(count(*) AS BIGINT) AS shared_spans
    FROM spans a JOIN spans b
      ON a.h = b.h AND a.source < b.source
    GROUP BY 1, 2
)
SELECT i.src_a, i.src_b,
       sa.n_spans AS spans_a, sb.n_spans AS spans_b,
       i.shared_spans,
       i.shared_spans * 1000000 // least(sa.n_spans, sb.n_spans)
           AS overlap_micro
FROM inter i
JOIN sizes sa ON i.src_a = sa.source
JOIN sizes sb ON i.src_b = sb.source
"""


# ---------------------------------------------------------------------------
# Per-document TF-IDF keyword extraction: the top-K most characteristic
# terms of every document (vs. `vocab_topk`, which profiles the CORPUS).
# This is the classic doc-tagging / index-summarization op a training-data
# pipeline uses for topic routing and per-doc metadata enrichment.
#
# idf is the UNLOGGED odds N/df in integer micro-units
# (idf_micro = N * 1e6 div df) — the same documented deviation as BM25's
# odds-ratio idf above and for the same reason: per-TERM ranking within a
# document is unchanged (log is monotone and tf scales each term
# independently only across docs with the same tf... strictly, ranking by
# tf * N/df and tf * ln(N/df) can order two terms differently when their
# tf differ; this engine defines its score as the odds form and the oracle
# computes the identical form, so cross-engine comparison is exact and the
# semantics are honest rather than float-fuzzy).
#
# Scale shape: one tokenize+explode scan; tf via (doc, lang, term)
# hash-agg with map-side combine (shuffle #1); df via a window over the
# ALREADY-AGGREGATED tf frame keyed (lang, term) (shuffle #2 — vocab-sized
# input, not corpus-sized); per-lang N is #langs rows -> broadcast; top-K
# per doc via row_number over the per-doc partition (shuffle #3, bounded
# by per-doc vocab). No corpus-sized frame is shuffled more than once.
# ---------------------------------------------------------------------------
TFIDF_TOPK = 3
IDF_SCALE = 1_000_000


def tfidf_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    terms = docs.select("doc_id", "lang", F.explode("tok_arr").alias("term"))
    tf = terms.groupBy("doc_id", "lang", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    # df over the aggregated tf frame: each (doc, term) appears exactly
    # once post-agg, so COUNT(*) over (lang, term) IS the document
    # frequency — no second corpus scan, no distinct.
    tfdf = tf.withColumn(
        "df",
        F.count(F.lit(1))
        .over(Window.partitionBy("lang", "term"))
        .cast("bigint"),
    )
    n_docs = (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    # int64 headroom (ADVICE r5): score = tf * idf_micro with idf_micro up
    # to n_docs * 1e6 (df = 1), so the product exceeds int64 once
    # tf * n_docs > 9.2e12 — reachable at true corpus scale. Non-ANSI Spark
    # would silently wrap; the in-row guard below raises instead (one
    # bigint division, whole-stage-codegen-safe: for idf_micro >= 1,
    # tf <= INT64_MAX div idf_micro  <=>  tf * idf_micro <= INT64_MAX).
    # The DuckDB oracle needs no twin — its BIGINT multiply errors on
    # overflow natively. Output stays BIGINT per the output-type contract
    # (tests/test_output_type_contract.py).
    from realtimedatawarehouse_self_spark.functions.exprs import INT64_MAX

    scored = (
        tfdf.join(F.broadcast(n_docs), "lang")
        .withColumn("idf_micro", F.expr(f"n_docs * {IDF_SCALE} div df"))
        .withColumn(
            "score",
            F.expr(
                f"CASE WHEN tf <= {INT64_MAX} div idf_micro"
                f" THEN tf * idf_micro"
                f" ELSE raise_error(concat('int64 overflow at output"
                f" boundary score: tf=', tf, ' idf_micro=', idf_micro))"
                f" END"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("kw_rank", F.row_number().over(w))
        .filter(F.col("kw_rank") <= TFIDF_TOPK)
        .select("doc_id", "kw_rank", "term", "tf", "df", "score")
    )


_TFIDF_SQL = f"""
WITH tok AS (
    SELECT doc_id, lang,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
terms AS (
    SELECT doc_id, lang, t[i] AS term
    FROM tok, UNNEST(range(1, len(t) + 1)) AS u(i)
),
tf AS (
    SELECT doc_id, lang, term, CAST(count(*) AS BIGINT) AS tf
    FROM terms GROUP BY 1, 2, 3
),
tfdf AS (
    SELECT *, CAST(count(*) OVER (PARTITION BY lang, term) AS BIGINT) AS df
    FROM tf
),
nd AS (
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY 1
),
scored AS (
    SELECT t.doc_id, t.term, t.tf, t.df,
           t.tf * (n.n_docs * {IDF_SCALE} // t.df) AS score
    FROM tfdf t JOIN nd n ON t.lang = n.lang
)
SELECT doc_id,
       CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term) AS INTEGER)
           AS kw_rank,
       term, tf, df, score
FROM scored
QUALIFY kw_rank <= {TFIDF_TOPK}
"""


# ---------------------------------------------------------------------------
# MMR-diversified top-K (Carbonell & Goldstein, SIGIR'98) — the reranking
# step between ANN retrieval and a RAG prompt: from each query's top-N
# relevance candidates, greedily select K maximizing
#     lambda * rel(q, c)  -  (1 - lambda) * max_{s in selected} sim(c, s)
# so the shipped K are relevant AND mutually diverse (a plain top-K from a
# dense corpus is often K near-duplicates of the same passage).
#
# Exactness doctrine: relevance and pairwise similarity are int8-quantized
# dot products (the SAME shared quantizer as `embedding_quantize_int8` /
# `similarity_topk_ivf_adc_rerank`, so the proxy-score semantics already
# hold registry-wide); every score is exact bigint arithmetic
# (|dot| <= 127^2 * 64 ~ 1.03e6; * LAMBDA_PPM <= 7.3e11), so the greedy
# argmax — where a single last-ulp float difference would cascade into a
# DIFFERENT selection for every later round — is bit-deterministic across
# engines. DuckDB's list_dot_product returns DOUBLE, exact for integer
# values < 2^53 (max here ~1e6), so CAST AS BIGINT is lossless.
#
# Scale shape: the only corpus-sized work is the candidate generation
# (broadcast queries over one quantized scan + WindowGroupLimit top-N —
# identical to the benched brute-force/ANN paths; swap in the IVF probe at
# 100 TB). Everything after is per-query constant: NCAND^2 pairwise rows
# and K-1 unrolled greedy rounds over broadcast-sized frames — the greedy
# loop's cost is independent of corpus size by construction.
# ---------------------------------------------------------------------------
MMR_QUERIES = 8
MMR_NCAND = 12
MMR_K = 4
MMR_LAMBDA_PPM = 700_000
_MMR_MU_PPM = 1_000_000 - MMR_LAMBDA_PPM


def _int8_dot(a: str, b: str) -> F.Column:
    """Exact bigint dot product of two int8-code arrays."""
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    )


def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        _emb,
        _with_int8_codes,
    )

    quant = _with_int8_codes(_emb(spark, sf_dir)).select("vec_id", "q")
    qset = quant.filter(F.col("vec_id") < MMR_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("q").alias("qq")
    )
    cand0 = (
        quant.crossJoin(F.broadcast(qset))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("rel", _int8_dot("qq", "q"))
    )
    w_rel = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("vec_id")
    )
    # rank<=N compiles to WindowGroupLimit — the corpus-sized stage ends
    # here; everything after is per-query constant work.
    cand = (
        cand0.withColumn("rn", F.row_number().over(w_rel))
        .filter(F.col("rn") <= MMR_NCAND)
        .select("query_id", "vec_id", "rel", "q")
    )
    # The greedy runs as HOF expressions over ONE row per query — the
    # same lesson as embedding_power_iteration: a first cut iterated with
    # per-round joins/windows over the tiny candidate frame and cost
    # ~4-5 s of pure plan-analysis + stage-scheduling at ANY sf; the
    # candidate array form runs the identical integer arithmetic in K
    # chained projections (2 shuffles total: the top-N window and this
    # groupBy). Candidates are packed rel-desc so element 1 IS round 1.
    garr = cand.groupBy("query_id").agg(
        F.expr(
            "array_sort(collect_list(struct(vec_id, rel, q)),"
            " (l, r) -> CASE WHEN l.rel > r.rel THEN -1"
            " WHEN l.rel < r.rel THEN 1"
            " WHEN l.vec_id < r.vec_id THEN -1 ELSE 1 END)"
        ).alias("cs")
    )
    df = garr.withColumn(
        "sel",
        F.expr(
            f"array(named_struct('vec_id', cs[0].vec_id, 'rel', cs[0].rel,"
            f" 'mmr_score', cs[0].rel * {MMR_LAMBDA_PPM},"
            f" 'rnk', 1, 'q', cs[0].q))"
        ),
    )
    for r in range(2, MMR_K + 1):
        # maxsim over the selected set via array_max(transform(...)):
        # sel is non-empty from round 1 on. The trailing select+coalesce
        # is the plan barrier (cf. embedding_power_iteration): sel is
        # referenced twice per round (exists-filter + penalty), so without
        # it CollapseProject re-inlines the whole chain per reference.
        # try_element_at: an exhausted candidate pool (corpus smaller
        # than MMR_K+1) yields an empty filtered array; plain element_at
        # THROWS under ANSI. The NULL pick is dropped after the explode.
        pick = (
            "try_element_at(array_sort("
            "transform("
            "  filter(cs, c -> !exists(sel, s -> s.vec_id = c.vec_id)),"
            "  c -> named_struct("
            "    'vec_id', c.vec_id, 'rel', c.rel,"
            f"   'mmr_score', c.rel * {MMR_LAMBDA_PPM} - {_MMR_MU_PPM} *"
            "      array_max(transform(sel, s -> aggregate("
            "        zip_with(c.q, s.q, (x, y) -> x * y),"
            "        0L, (acc, v) -> acc + v))),"
            f"   'rnk', {r}, 'q', c.q)),"
            " (l, r2) -> CASE WHEN l.mmr_score > r2.mmr_score THEN -1"
            " WHEN l.mmr_score < r2.mmr_score THEN 1"
            " WHEN l.vec_id < r2.vec_id THEN -1 ELSE 1 END), 1)"
        )
        df = (
            df.withColumn("sel", F.expr(f"concat(sel, array({pick}))"))
            .select("query_id", "cs", "sel")
            .coalesce(1)
        )
    # explode_OUTER on purpose (cf. embedding_power_iteration): plain
    # explode makes the optimizer infer a size(sel) > 0 Filter carrying
    # the full nested-HOF chain as one interpreted predicate. A query
    # with fewer than MMR_K eligible candidates exhausts the pool and
    # later rounds append NULL structs (element_at on an empty filtered
    # array); the oracle simply emits fewer rows for that query, so drop
    # the NULL picks AFTER the Generate (the filter sits on the exploded
    # column and cannot be pushed into the HOF chain) — ADVICE r6.
    return (
        df.select("query_id", F.explode_outer("sel").alias("s"))
        .filter(F.col("s.vec_id").isNotNull())
        .select(
            "query_id",
            F.col("s.rnk").cast("int").alias("rnk"),
            F.col("s.vec_id").alias("neighbor_id"),
            F.col("s.rel").alias("rel"),
            F.col("s.mmr_score").alias("mmr_score"),
        )
    )


def _mmr_sql() -> str:
    from realtimedatawarehouse_self_spark.plans.llm_ops import (
        _quant_sql_fragment,
    )

    lam, mu = MMR_LAMBDA_PPM, _MMR_MU_PPM
    sql = f"""
WITH emb AS (
    SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
),
quant AS (
{_quant_sql_fragment("emb", "vec_id")}
),
qset AS (
    SELECT vec_id AS query_id, q AS qq FROM quant WHERE vec_id < {MMR_QUERIES}
),
cand0 AS (
    SELECT s.query_id, e.vec_id,
           CAST(list_dot_product(s.qq, e.q) AS BIGINT) AS rel, e.q
    FROM quant e JOIN qset s ON e.vec_id <> s.query_id
),
cand AS (
    SELECT query_id, vec_id, rel, q FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, vec_id) AS rn
        FROM cand0
    ) WHERE rn <= {MMR_NCAND}
),
pw AS (
    SELECT a.query_id, a.vec_id AS a_id, b.vec_id AS b_id,
           CAST(list_dot_product(a.q, b.q) AS BIGINT) AS sim
    FROM cand a JOIN cand b
      ON a.query_id = b.query_id AND a.vec_id <> b.vec_id
),
sel1 AS (
    SELECT query_id, vec_id, rel, rel * {lam} AS mmr_score, 1 AS rnk FROM (
        SELECT query_id, vec_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, vec_id) AS rn
        FROM cand
    ) WHERE rn = 1
)"""
    prev = "SELECT query_id, vec_id, rel, mmr_score, rnk FROM sel1"
    for r in range(2, MMR_K + 1):
        sql += f""",
selected{r - 1} AS ({prev}),
pen{r} AS (
    SELECT p.query_id, p.a_id AS vec_id, max(p.sim) AS maxsim
    FROM pw p JOIN selected{r - 1} s
      ON p.query_id = s.query_id AND p.b_id = s.vec_id
    GROUP BY 1, 2
),
sel{r} AS (
    SELECT query_id, vec_id, rel, mmr_score, {r} AS rnk FROM (
        SELECT c.query_id, c.vec_id, c.rel,
               c.rel * {lam} - pn.maxsim * {mu} AS mmr_score,
               row_number() OVER (
                   PARTITION BY c.query_id
                   ORDER BY c.rel * {lam} - pn.maxsim * {mu} DESC,
                            c.vec_id) AS rn
        FROM cand c
        JOIN pen{r} pn
          ON c.query_id = pn.query_id AND c.vec_id = pn.vec_id
        WHERE NOT EXISTS (SELECT 1 FROM selected{r - 1} s
                          WHERE s.query_id = c.query_id
                            AND s.vec_id = c.vec_id)
    ) WHERE rn = 1
)"""
        prev += (
            f" UNION ALL SELECT query_id, vec_id, rel, mmr_score, rnk"
            f" FROM sel{r}"
        )
    sql += f"""
SELECT query_id, CAST(rnk AS INTEGER) AS rnk, vec_id AS neighbor_id,
       rel, mmr_score
FROM ({prev})
"""
    return sql


# ---------------------------------------------------------------------------
# Skip-gram window co-occurrence PMI — the word-embedding-preparation
# counterpart of `collocation_pmi` (adjacent pairs only): pairs within a
# symmetric window of COOC_WINDOW tokens, canonicalized to (least,
# greatest) and self-pairs dropped — exactly the co-occurrence matrix a
# word2vec/GloVe pipeline aggregates before training. Pairs are generated
# IN-ROW with nested HOF transforms over the token array (no positional
# self-join: the corpus-sized stage is one scan + explode whose output is
# ≤ W·tokens), then one combine-backed shuffle on the pair key. Scoring
# reuses the log-free PMI odds doctrine (wide-decimal exact rational,
# ranking unchanged since log is monotone).
# ---------------------------------------------------------------------------
COOC_WINDOW = 3
COOC_MIN_CT = 5


def cooccurrence_window_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    pairs = (
        docs.filter(F.expr("size(tok_arr) >= 2"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(sequence(0, size(tok_arr) - 2),"
                    f" i -> transform(sequence(1, least({COOC_WINDOW},"
                    " size(tok_arr) - 1 - i)),"
                    " d -> struct(least(tok_arr[i], tok_arr[i+d]) AS a,"
                    " greatest(tok_arr[i], tok_arr[i+d]) AS b))))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
    )
    pair_ct = pairs.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("pair_ct")
    )
    n_pairs = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    uni = (
        docs.select(F.explode("tok_arr").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("uni_ct"))
    )
    scored = (
        pair_ct.filter(F.col("pair_ct") >= COOC_MIN_CT)
        .join(
            F.broadcast(
                uni.select(F.col("tok").alias("a"), F.col("uni_ct").alias("a_ct"))
            ),
            "a",
        )
        .join(
            F.broadcast(
                uni.select(F.col("tok").alias("b"), F.col("uni_ct").alias("b_ct"))
            ),
            "b",
        )
        .crossJoin(F.broadcast(n_pairs))
        .withColumn(
            "pmi_odds_micro",
            F.expr(
                f"CAST((CAST({PMI_SCALE} AS DECIMAL(38,0)) * n_pairs"
                f" * pair_ct) div (CAST(a_ct AS DECIMAL(38,0)) * b_ct)"
                f" AS BIGINT)"
            ),
        )
    )
    w = Window.orderBy(F.col("pmi_odds_micro").desc(), F.col("a"), F.col("b"))
    return (
        scored.orderBy(F.col("pmi_odds_micro").desc(), F.col("a"), F.col("b"))
        .limit(PMI_TOPK)
        .withColumn("pmi_rank", F.row_number().over(w))
        .select("pmi_rank", "a", "b", "pair_ct", "pmi_odds_micro")
    )


_COOC_SQL = f"""
WITH tok AS (
    SELECT list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
pairs AS (
    SELECT least(t[i], t[i + d]) AS a, greatest(t[i], t[i + d]) AS b
    FROM tok,
         UNNEST(range(1, greatest(len(t), 1))) AS u(i),
         UNNEST(range(1, {COOC_WINDOW} + 1)) AS v(d)
    WHERE i + d <= len(t) AND t[i] <> t[i + d]
),
pair_ct AS (
    SELECT a, b, CAST(count(*) AS BIGINT) AS pair_ct
    FROM pairs GROUP BY 1, 2
),
np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM pairs),
uni AS (
    SELECT u.t AS tok, CAST(count(*) AS BIGINT) AS uni_ct
    FROM tok, UNNEST(t) AS u(t) GROUP BY 1
),
scored AS (
    SELECT p.a, p.b, p.pair_ct,
           CAST((CAST({PMI_SCALE} AS HUGEINT) * np.n_pairs * p.pair_ct)
                // (CAST(ua.uni_ct AS HUGEINT) * ub.uni_ct) AS BIGINT)
               AS pmi_odds_micro
    FROM pair_ct p
    JOIN uni ua ON p.a = ua.tok
    JOIN uni ub ON p.b = ub.tok, np
    WHERE p.pair_ct >= {COOC_MIN_CT}
)
SELECT CAST(row_number() OVER (ORDER BY pmi_odds_micro DESC, a, b)
            AS INTEGER) AS pmi_rank,
       a, b, pair_ct, pmi_odds_micro
FROM scored
ORDER BY pmi_odds_micro DESC, a, b
LIMIT {PMI_TOPK}
"""


# ---------------------------------------------------------------------------
# Arbitrary-length duplicated-span detection (VERDICT r9 #4 — the real
# Lee-et-al.-2022 "Deduplicating Training Data Makes Language Models
# Better" class operator; upgrades span_dedup_stats' fixed-window
# stand-in). Anchor-shingle + diagonal run extension:
#
#   1. ANCHORS: every position i of every document gets the md5 of its
#      K-token window (SLIDING, unlike span_dedup_stats' non-overlapping
#      windows — sliding is what makes arbitrary alignment detectable).
#   2. CANDIDATES: occurrences of each anchor hash are grouped per hash
#      (ONE shuffle, keyed on the hash) and fanned into cross-document
#      position pairs via the shared upper-triangle primitive
#      (`ordered_pair_structs`); hashes occurring more than SPAN_DF_CAP
#      times are dropped first (the family's standard df-cap hub guard —
#      bounded C(CAP,2) pair fan-out per hash; spans made ONLY of
#      ultra-common K-grams are knowingly missed, documented lossiness).
#   3. EXTENSION: an aligned pair (pos_a, pos_b) lies on the "diagonal"
#      d = pos_a - pos_b of the (doc_a, doc_b) alignment matrix. A shared
#      substring of length M >= K contributes exactly M - K + 1
#      CONSECUTIVE anchor positions on one diagonal, so maximal duplicated
#      spans == maximal consecutive runs per (doc_a, doc_b, diag) —
#      classic gaps-and-islands (pos - row_number), no iteration.
#      Bidirectional maximality is exact: if the span could extend one
#      token left, the anchor at start_a - 1 would also match (its K-1
#      trailing tokens are inside the already-equal span), so it would be
#      in the run; symmetrically right. md5 has no false negatives, so a
#      missing anchor really is a mismatch.
#   4. VERIFY: candidates are exact-verified by re-slicing both documents
#      and comparing token arrays (the family doctrine: hash candidates,
#      exact-verify candidates only) — collisions cannot survive.
#
# Scale: the anchor frame is |corpus tokens| rows but every stage keys on
# the anchor hash or (doc_a, doc_b) — even keys post-cap; pair volume is
# sum over hashes of C(occ, 2) <= C(SPAN_DF_CAP, 2) per hash. The verify
# join touches only span candidates (duplication-sized, not corpus-sized)
# against the persisted tokenized scan, keyed on doc_id. Within-doc
# self-repeats are excluded by design (cross-document dedup).
# ---------------------------------------------------------------------------
SPAN_ANCHOR_K = 8   # anchor window width (tokens)
SPAN_MIN_LEN = 16   # emit maximal spans of at least this many tokens
SPAN_DF_CAP = 64    # drop anchor hashes occurring more often than this


def _verified_spans(spark: SparkSession, sf_dir: str, persist_tok: bool = True):
    """Shared core of the Lee-2022 span family: returns (tok, ver) where
    tok is the persisted tokenized scan and ver the exact-verified maximal
    duplicated spans (da, db, start_a, start_b, span_len, span_a). Both
    dedup_duplicated_spans (the report) and duplicated_span_removal (the
    action) consume this, so the anchor/cap/island/verify semantics cannot
    drift between them."""
    K, L, CAP = SPAN_ANCHOR_K, SPAN_MIN_LEN, SPAN_DF_CAP
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    # The tokenized scan feeds BOTH the anchor build and the final verify
    # joins; by default persist so the corpus scan + split runs once (not
    # unpersisted: builders return unexecuted frames, and the default
    # MEMORY_AND_DISK level is LRU-evictable). The removal op opts OUT
    # (r10 per-site A/B: 1.76 s vs 2.34 s there, while the report query
    # measures faster keeping it: 1.50 s vs 1.62 s).
    tok = docs.select("doc_id", "tok_arr")
    if persist_tok:
        tok = tok.persist()
    anchors = (
        tok.filter(F.size("tok_arr") >= K)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(tok_arr) - {K} + 1), "
                    f"i -> struct(CAST(i AS BIGINT) AS pos, "
                    f"md5(array_join(slice(tok_arr, i, {K}), ' ')) AS h))"
                )
            ).alias("a"),
        )
        .select("doc_id", F.col("a.pos").alias("pos"), F.col("a.h").alias("h"))
    )
    # One shuffle on the anchor hash; df-cap + upper-triangle pair fan-out
    # inside the grouped row (array_sort gives the deterministic (doc,
    # pos) order both engines share).
    occ = anchors.groupBy("h").agg(
        F.array_sort(F.collect_list(F.struct("doc_id", "pos"))).alias("occ")
    )
    pairs = (
        occ.filter((F.size("occ") >= 2) & (F.size("occ") <= CAP))
        .select(F.explode(ordered_pair_structs("occ", "a", "b")).alias("p"))
        .select(
            F.col("p.a.doc_id").alias("da"),
            F.col("p.a.pos").alias("pa"),
            F.col("p.b.doc_id").alias("db"),
            F.col("p.b.pos").alias("pb"),
        )
        .filter(F.col("da") < F.col("db"))
        .withColumn("diag", F.col("pa") - F.col("pb"))
    )
    runs = pairs.withColumn(
        "isl",
        F.col("pa")
        - F.row_number().over(
            Window.partitionBy("da", "db", "diag").orderBy("pa")
        ),
    )
    spans = (
        runs.groupBy("da", "db", "diag", "isl")
        .agg(
            F.min("pa").alias("start_a"),
            (F.count(F.lit(1)) + F.lit(K - 1)).cast("bigint").alias(
                "span_len"
            ),
        )
        .filter(F.col("span_len") >= L)
        .withColumn("start_b", F.col("start_a") - F.col("diag"))
    )
    ta = tok.select(F.col("doc_id").alias("da"), F.col("tok_arr").alias("ta"))
    tb = tok.select(F.col("doc_id").alias("db"), F.col("tok_arr").alias("tb"))
    # Verify joins are SHUFFLE_HASH-pinned with the span side as build:
    # left to itself the planner broadcast the token-array CORPUS side
    # (driver OOM at 10x sf0.1 — caught by the r10 stress run), and the
    # span side, while the smaller of the two, is duplication-sized (data-
    # sized at constant dup rate), so no side is broadcast-safe at 100 TB.
    # Both joins key on doc_id — even keys, bounded rows per key.
    ver = (
        spans.hint("shuffle_hash")
        .join(ta, "da")
        .hint("shuffle_hash")
        .join(tb, "db")
        .withColumn(
            "span_a",
            F.expr("slice(ta, CAST(start_a AS INT), CAST(span_len AS INT))"),
        )
        .withColumn(
            "span_b",
            F.expr("slice(tb, CAST(start_b AS INT), CAST(span_len AS INT))"),
        )
        .filter(F.col("span_a") == F.col("span_b"))
    )
    return tok, ver


def dedup_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    _tok, ver = _verified_spans(spark, sf_dir)
    return ver.select(
        F.col("da").cast("bigint").alias("doc_a"),
        F.col("db").cast("bigint").alias("doc_b"),
        F.col("start_a").cast("bigint").alias("start_a"),
        F.col("start_b").cast("bigint").alias("start_b"),
        "span_len",
        F.md5(F.array_join("span_a", " ")).alias("span_md5"),
    )


# ---------------------------------------------------------------------------
# Wave 40a: the ACTION half of exact-substring dedup (Lee et al. 2022
# keep-one-occurrence policy): every verified duplicated span is removed
# from the HIGHER doc_id of its pair (the lower doc keeps its copy —
# deterministic survivor election matching the family's keep-lowest
# rule). A document's removal intervals from different partners overlap,
# so the removed-token count is the size of their INTERVAL UNION — the
# classic sweep: sort intervals, new island when start exceeds the
# running max end (one keyed window), then min/max per island. Output is
# the per-document removal accounting a corpus build records before
# rewriting shards: tokens before/removed/after.
# Scale: the span frame is duplication-sized; the union sweep windows on
# doc_id (per-doc interval counts are document-bounded); the final join
# back to per-doc token counts keys on doc_id.
# ---------------------------------------------------------------------------
def duplicated_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok, ver = _verified_spans(spark, sf_dir, persist_tok=False)
    iv = ver.select(
        F.col("db").cast("bigint").alias("doc_id"),
        F.col("start_b").cast("bigint").alias("s"),
        (F.col("start_b") + F.col("span_len") - 1).cast("bigint").alias("e"),
    )
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    iv2 = iv.withColumn(
        "prev_max",
        F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
    ).withColumn(
        "new_isl",
        (
            F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max"))
        ).cast("int"),
    )
    isl = iv2.withColumn(
        "isl",
        F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = isl.groupBy("doc_id", "isl").agg(
        F.min("s").alias("ms"), F.max("e").alias("me")
    )
    rem = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("removed_intervals"),
        F.sum(F.col("me") - F.col("ms") + 1)
        .cast("bigint")
        .alias("removed_tokens"),
    )
    # every tokenizable doc gets a row. NULL text never tokenizes: under
    # this engine's ANSI runtime size(NULL array) is NULL (NOT the legacy
    # -1), and a NULL >= 0 comparison is NULL, so the filter drops the
    # row — matching DuckDB's t IS NOT NULL. Zero-token docs guard the
    # micro division
    base = tok.filter(F.size("tok_arr") >= 0).select(
        "doc_id", F.size("tok_arr").cast("bigint").alias("n_tokens")
    )
    # same doctrine as the verify joins: rem is duplication-sized (data-
    # sized at constant dup rate), so pin the keyed shuffle join rather
    # than letting the planner broadcast it
    out = base.hint("shuffle_hash").join(rem, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("removed_intervals", F.lit(0))
        .cast("bigint")
        .alias("removed_intervals"),
        F.coalesce("removed_tokens", F.lit(0))
        .cast("bigint")
        .alias("removed_tokens"),
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "removed_intervals",
        "removed_tokens",
        (F.col("n_tokens") - F.col("removed_tokens"))
        .cast("bigint")
        .alias("kept_tokens"),
        F.expr(
            "CASE WHEN n_tokens = 0 THEN 0L"
            " ELSE removed_tokens * 1000000 div n_tokens END"
        ).alias("removed_micro"),
    )


# Shared CTE chain for the span family (twin of _verified_spans): ends in
# `vspans` (doc_a, doc_b, start_a, start_b, span_len, span_md5), verified.
_DUP_SPAN_CTES = f"""tok AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
sh AS (
    SELECT doc_id, i AS pos,
           md5(array_to_string(t[i:i+{SPAN_ANCHOR_K}-1], ' ')) AS h
    FROM tok,
         UNNEST(range(1, len(t) - {SPAN_ANCHOR_K} + 2)) AS u(i)
    WHERE len(t) >= {SPAN_ANCHOR_K}
),
capped AS (
    SELECT h FROM sh GROUP BY h
    HAVING count(*) BETWEEN 2 AND {SPAN_DF_CAP}
),
pairs AS (
    SELECT a.doc_id AS da, a.pos AS pa, b.doc_id AS db, b.pos AS pb,
           a.pos - b.pos AS diag
    FROM sh a
    JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
    WHERE a.h IN (SELECT h FROM capped)
),
runs AS (
    SELECT da, db, diag, pa,
           pa - row_number() OVER (
               PARTITION BY da, db, diag ORDER BY pa) AS isl
    FROM pairs
),
spans AS (
    SELECT da, db, diag,
           min(pa) AS start_a,
           CAST(count(*) + {SPAN_ANCHOR_K} - 1 AS BIGINT) AS span_len
    FROM runs GROUP BY da, db, diag, isl
    HAVING count(*) + {SPAN_ANCHOR_K} - 1 >= {SPAN_MIN_LEN}
),
ver AS (
    SELECT s.da AS doc_a, s.db AS doc_b,
           CAST(s.start_a AS BIGINT) AS start_a,
           CAST(s.start_a - s.diag AS BIGINT) AS start_b,
           s.span_len,
           ta.t[s.start_a : s.start_a + s.span_len - 1] AS span_a,
           tb.t[(s.start_a - s.diag)
                : (s.start_a - s.diag) + s.span_len - 1] AS span_b
    FROM spans s
    JOIN tok ta ON s.da = ta.doc_id
    JOIN tok tb ON s.db = tb.doc_id
),
vspans AS (
    SELECT doc_a, doc_b, start_a, start_b, span_len,
           md5(array_to_string(span_a, ' ')) AS span_md5
    FROM ver
    WHERE span_a = span_b
)"""

_DUP_SPANS_SQL = f"""
WITH {_DUP_SPAN_CTES}
SELECT doc_a, doc_b, start_a, start_b, span_len, span_md5 FROM vspans
"""

_SPAN_REMOVAL_SQL = f"""
WITH {_DUP_SPAN_CTES},
iv AS (
    SELECT doc_b AS doc_id, start_b AS s,
           start_b + span_len - 1 AS e
    FROM vspans
),
iv2 AS (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_max
    FROM iv
),
isl AS (
    SELECT doc_id, s, e,
           sum(CASE WHEN prev_max IS NULL OR s > prev_max
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS isl
    FROM iv2
),
merged AS (
    SELECT doc_id, isl, min(s) AS ms, max(e) AS me
    FROM isl GROUP BY 1, 2
),
rem AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS removed_intervals,
           CAST(sum(me - ms + 1) AS BIGINT) AS removed_tokens
    FROM merged GROUP BY 1
)
SELECT t.doc_id,
       CAST(len(t.t) AS BIGINT) AS n_tokens,
       CAST(coalesce(r.removed_intervals, 0) AS BIGINT)
           AS removed_intervals,
       CAST(coalesce(r.removed_tokens, 0) AS BIGINT) AS removed_tokens,
       CAST(len(t.t) - coalesce(r.removed_tokens, 0) AS BIGINT)
           AS kept_tokens,
       CAST(CASE WHEN len(t.t) = 0 THEN 0
            ELSE coalesce(r.removed_tokens, 0) * 1000000 // len(t.t)
            END AS BIGINT) AS removed_micro
FROM tok t LEFT JOIN rem r USING (doc_id)
WHERE t.t IS NOT NULL
"""


# ---------------------------------------------------------------------------
# Wave 39b: content-defined-chunking dedup (the FastCDC/rsync family —
# Muthitacharoen et al. 2001 LBFS; the storage- and crawl-dedup shape for
# data whose duplication is SHIFTED rather than aligned). Fixed-window
# chunking (span_dedup_stats) misses a duplicate that slides by one
# token; CDC cuts chunk boundaries where a rolling CONTENT hash matches a
# pattern, so identical content produces identical chunks at ANY offset:
#
#   * boundary rule: a cut falls after token b+K-1 whenever the K-token
#     window at position b hashes (md5) to a first hex digit in
#     CDC_CUT_HEX — cut probability 2/16, expected chunk ~K + 8 tokens;
#   * chunks = the slices between consecutive cuts (doc start / end
#     close the first / last chunk); built entirely inside codegen from
#     ONE cuts array per document (starts = shift(cuts), ends = cuts) —
#     O(doc length) work, no per-position prefix rescans;
#   * dedup accounting: chunk md5 -> distinct-doc count; per doc, the
#     chunks (and tokens) whose content appears in >= 2 documents.
#
# vs dedup_duplicated_spans: spans finds the exact maximal shared
# REGIONS (pairwise, positional); CDC measures global SHARED-CONTENT
# MASS with storage-dedup semantics (each chunk either dedups or not) at
# strictly lower cost — one shuffle on the chunk hash, no pair fan-out
# at all. Both are standard members of the production dedup toolbox.
# Scale: everything keys on chunk md5 or doc_id; chunk count is
# len/~(K+8) per doc; no joins besides the chunk-stats re-join keyed on
# the hash.
# ---------------------------------------------------------------------------
CDC_K = 4                 # rolling-window width (tokens)
CDC_CUT_HEX = ("0", "1")  # md5 first hex in set -> boundary (p = 1/8)


def _cdc_chunk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_idx, chunk_len, chunk_md5) — the CDC chunk stream
    shared by cdc_chunk_dedup and the streaming owner-election twin."""
    K = CDC_K
    cut_set = ", ".join(f"'{h}'" for h in CDC_CUT_HEX)
    docs = _docs(spark, sf_dir).withColumn("tok_arr", tokens("text"))
    # cuts: token positions after which a boundary falls (window end
    # b+K-1 for every matching window start b), strictly inside the doc
    chunks = (
        docs.filter(F.size("tok_arr") >= K)
        .withColumn(
            "cuts",
            F.expr(
                f"filter(transform(filter(sequence(1, size(tok_arr) - {K} + 1),"
                f" b -> substring(md5(array_join(slice(tok_arr, b, {K}), ' ')),"
                f" 1, 1) IN ({cut_set})), b -> b + {K} - 1),"
                f" c -> c < size(tok_arr))"
            ),
        )
        .withColumn(
            "chunk",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(cuts)), i -> struct("
                    " CAST(i AS BIGINT) AS chunk_idx,"
                    " CAST(CASE WHEN i = size(cuts)"
                    "   THEN size(tok_arr) - (CASE WHEN i = 0 THEN 0"
                    "        ELSE cuts[i - 1] END)"
                    "   ELSE cuts[i] - (CASE WHEN i = 0 THEN 0"
                    "        ELSE cuts[i - 1] END) END AS BIGINT)"
                    "   AS chunk_len,"
                    " md5(array_join(slice(tok_arr,"
                    "   (CASE WHEN i = 0 THEN 0 ELSE cuts[i - 1] END) + 1,"
                    "   CASE WHEN i = size(cuts)"
                    "     THEN size(tok_arr) - (CASE WHEN i = 0 THEN 0"
                    "          ELSE cuts[i - 1] END)"
                    "     ELSE cuts[i] - (CASE WHEN i = 0 THEN 0"
                    "          ELSE cuts[i - 1] END) END), ' '))"
                    "   AS chunk_md5))"
                )
            ).alias("chunk"),
        )
        .select(
            "doc_id",
            F.col("chunk.chunk_idx").alias("chunk_idx"),
            F.col("chunk.chunk_len").alias("chunk_len"),
            F.col("chunk.chunk_md5").alias("chunk_md5"),
        )
    )
    return chunks


def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    chunks = _cdc_chunk_frame(spark, sf_dir)  # no persist (r10 A/B: 0.86 s vs 1.07 s)
    stats = chunks.groupBy("chunk_md5").agg(
        F.countDistinct("doc_id").cast("bigint").alias("chunk_docs")
    )
    flagged = chunks.join(stats, "chunk_md5")
    agg = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("chunk_len").cast("bigint").alias("total_tokens"),
        F.sum((F.col("chunk_docs") >= 2).cast("bigint"))
        .cast("bigint")
        .alias("dup_chunks"),
        F.sum(
            F.when(F.col("chunk_docs") >= 2, F.col("chunk_len")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("dup_tokens"),
    )
    return agg.select(
        "doc_id",
        "n_chunks",
        "total_tokens",
        "dup_chunks",
        "dup_tokens",
        F.expr("dup_tokens * 1000000 div total_tokens").alias(
            "dup_mass_micro"
        ),
    )


_CDC_CUT_SQL = ", ".join(f"'{h}'" for h in CDC_CUT_HEX)

_CDC_CHUNK_CTES = f"""tok AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS t
    FROM documents
),
cutdocs AS (
    SELECT doc_id, t,
           list_filter(
             list_transform(
               list_filter(range(1, len(t) - {CDC_K} + 2),
                 b -> substr(md5(array_to_string(t[b:b+{CDC_K}-1], ' ')),
                             1, 1) IN ({_CDC_CUT_SQL})),
               b -> b + {CDC_K} - 1),
             c -> c < len(t)) AS cuts
    FROM tok WHERE len(t) >= {CDC_K}
),
chunks AS (
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_idx,
           CAST(CASE WHEN i = len(cuts)
                THEN len(t) - (CASE WHEN i = 0 THEN 0 ELSE cuts[i] END)
                ELSE cuts[i + 1] - (CASE WHEN i = 0 THEN 0
                     ELSE cuts[i] END) END AS BIGINT) AS chunk_len,
           md5(array_to_string(
             t[(CASE WHEN i = 0 THEN 0 ELSE cuts[i] END) + 1
               : CASE WHEN i = len(cuts) THEN len(t)
                 ELSE cuts[i + 1] END], ' ')) AS chunk_md5
    FROM cutdocs, UNNEST(range(0, len(cuts) + 1)) AS u(i)
)"""

_CDC_SQL = f"""
WITH {_CDC_CHUNK_CTES},
stats AS (
    SELECT chunk_md5,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS chunk_docs
    FROM chunks GROUP BY 1
),
agg AS (
    SELECT c.doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(c.chunk_len) AS BIGINT) AS total_tokens,
           CAST(sum(CASE WHEN s.chunk_docs >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_chunks,
           CAST(sum(CASE WHEN s.chunk_docs >= 2 THEN c.chunk_len
                    ELSE 0 END) AS BIGINT) AS dup_tokens
    FROM chunks c JOIN stats s USING (chunk_md5)
    GROUP BY 1
)
SELECT doc_id, n_chunks, total_tokens, dup_chunks, dup_tokens,
       dup_tokens * 1000000 // total_tokens AS dup_mass_micro
FROM agg
"""


# ---------------------------------------------------------------------------
# Wave 51a (r10): graded retrieval-ranking eval — NDCG@K / MRR
# (Jarvelin & Kekalainen 2002; the metric every retrieval / RAG eval
# harness reports). A system "run" (ranked candidate list per query) is
# scored against graded relevance judgments: DCG@K = sum over ranks of
# gain(rel) * 1/log2(rank+1), normalized by the ideal ordering's IDCG@K;
# MRR = 1/first-relevant-rank.
#
# The irrational log2 discounts are the cross-engine hazard, so they are
# precomputed ONCE in Python at import (floor(1e6 / log2(r+1))) and
# embedded as the SAME integer literals in both renderings — every
# engine-side number is BIGINT arithmetic (gains 2^rel - 1 in {0,1,3,7},
# integer div for the final ratios). Run and qrels are deterministic
# md5 derivations per (query, doc) — the registry's standing stand-in
# pattern (a real deployment swaps in its run table + qrels table; every
# downstream line is unchanged).
#
# Scale: corpus scanned once, exploded x |queries| (a literal array);
# both per-query top-K orderings go through row_number windows whose
# rank<=K filter Spark plans as WindowGroupLimit (partial, map-side
# limit before the exchange), so shuffle volume is Q*K per map task,
# never the corpus. Final metrics: one |queries|-row combine.
# ---------------------------------------------------------------------------
NDCG_QUERIES = 5
NDCG_K = 10
# floor(1e6 / log2(rank+1)) for rank 1..K — shared integer constants.
import math as _math

NDCG_DISC_MICRO = tuple(
    int(1_000_000 // _math.log2(r + 1)) for r in range(1, NDCG_K + 1)
)


def _ndcg_case(rank_col: str) -> str:
    arms = " ".join(
        f"WHEN {rank_col} = {r + 1} THEN {d}L"
        for r, d in enumerate(NDCG_DISC_MICRO)
    )
    return f"CASE {arms} ELSE 0L END"


def _ndcg_case_duck(rank_col: str) -> str:
    arms = " ".join(
        f"WHEN {rank_col} = {r + 1} THEN {d}"
        for r, d in enumerate(NDCG_DISC_MICRO)
    )
    return f"CAST(CASE {arms} ELSE 0 END AS BIGINT)"


# rel grade from one hex digit: 8/16 -> 0, 4/16 -> 1, 2/16 -> 2, 2/16 -> 3
_REL_CASE = (
    "CASE WHEN {d} < '8' THEN 0L WHEN {d} < 'c' THEN 1L "
    "WHEN {d} < 'e' THEN 2L ELSE 3L END"
)
# gain(rel) = 2^rel - 1, spelled as a CASE so pow() never appears
# (repo-wide doctrine: no transcendental/pow calls in parity arithmetic)
_GAIN = (
    "(CASE WHEN rel = 0 THEN 0L WHEN rel = 1 THEN 1L "
    "WHEN rel = 2 THEN 3L ELSE 7L END)"
)
_GAIN_DUCK = (
    "(CASE WHEN rel = 0 THEN 0 WHEN rel = 1 THEN 1 "
    "WHEN rel = 2 THEN 3 ELSE 7 END)"
)


def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).filter(F.col("text").isNotNull())
    judged = docs.select(
        "doc_id",
        F.explode(
            F.array(*[F.lit(q) for q in range(NDCG_QUERIES)])
        ).alias("query_id"),
    ).withColumn(
        "h", F.md5(F.concat_ws(":", "query_id", "doc_id"))
    )
    scored = judged.select(
        "query_id",
        "doc_id",
        F.expr(
            "CAST(conv(substring(h, 1, 8), 16, 10) AS BIGINT)"
        ).alias("score"),
        F.expr(
            _REL_CASE.format(d="substring(h, 9, 1)")
        ).alias("rel"),
    )
    run_w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    run = (
        scored.withColumn("rank", F.row_number().over(run_w))
        .filter(F.col("rank") <= NDCG_K)
        .withColumn(
            "dg",
            F.expr(f"{_GAIN} * ({_ndcg_case('rank')})"),
        )
    )
    ideal_w = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    ideal = (
        scored.withColumn("irank", F.row_number().over(ideal_w))
        .filter(F.col("irank") <= NDCG_K)
        .withColumn(
            "ig",
            F.expr(f"{_GAIN} * ({_ndcg_case('irank')})"),
        )
    )
    run_agg = run.groupBy("query_id").agg(
        F.sum("dg").alias("dcg_micro"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_rel_at_k"),
        F.min(F.when(F.col("rel") >= 2, F.col("rank"))).alias(
            "first_good_rank"
        ),
    )
    ideal_agg = ideal.groupBy("query_id").agg(
        F.sum("ig").alias("idcg_micro")
    )
    out = run_agg.join(F.broadcast(ideal_agg), "query_id")
    return out.select(
        "query_id",
        "dcg_micro",
        "idcg_micro",
        F.expr(
            "CASE WHEN idcg_micro = 0 THEN 0 "
            "ELSE dcg_micro * 1000000 div idcg_micro END"
        ).alias("ndcg_micro"),
        "n_rel_at_k",
        F.coalesce(
            F.expr("1000000 div first_good_rank"), F.lit(0).cast("bigint")
        ).alias("rr_micro"),
    ).orderBy("query_id")


def _ndcg_sql() -> str:
    rel = _REL_CASE.format(d="substr(h, 9, 1)").replace("0L", "0").replace(
        "1L", "1"
    ).replace("2L", "2").replace("3L", "3")
    return f"""
WITH judged AS (
  SELECT d.doc_id, q.query_id,
         md5(q.query_id || ':' || d.doc_id) AS h
  FROM documents d
  CROSS JOIN (SELECT unnest(range({NDCG_QUERIES})) AS query_id) q
  WHERE d.text IS NOT NULL
),
scored AS (
  SELECT query_id, doc_id,
         TRY_CAST('0x' || substr(h, 1, 8) AS BIGINT) AS score,
         CAST({rel} AS BIGINT) AS rel
  FROM judged
),
run AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
  FROM scored QUALIFY rank <= {NDCG_K}
),
ideal AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY rel DESC, doc_id) AS irank
  FROM scored QUALIFY irank <= {NDCG_K}
),
run_agg AS (
  SELECT query_id,
         CAST(sum({_GAIN_DUCK}
              * ({_ndcg_case_duck('rank')})) AS BIGINT) AS dcg_micro,
         CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_rel_at_k,
         min(CASE WHEN rel >= 2 THEN rank END) AS first_good_rank
  FROM run GROUP BY 1
),
ideal_agg AS (
  SELECT query_id,
         CAST(sum({_GAIN_DUCK}
              * ({_ndcg_case_duck('irank')})) AS BIGINT) AS idcg_micro
  FROM ideal GROUP BY 1
)
SELECT r.query_id, r.dcg_micro, i.idcg_micro,
       CAST(CASE WHEN i.idcg_micro = 0 THEN 0
            ELSE r.dcg_micro * 1000000 // i.idcg_micro END AS BIGINT)
           AS ndcg_micro,
       r.n_rel_at_k,
       CAST(coalesce(1000000 // r.first_good_rank, 0) AS BIGINT)
           AS rr_micro
FROM run_agg r JOIN ideal_agg i USING (query_id)
ORDER BY query_id
"""


# ---------------------------------------------------------------------------
# Wave 53a (r10): memorization-risk audit (Carlini et al. 2022,
# "Quantifying Memorization Across Neural Language Models": extraction
# risk grows with how often a sequence is duplicated in the training
# corpus). The audit every privacy-conscious corpus prep runs before
# training: per document, (a) how many OTHER documents are byte-exact
# copies, and (b) how many of its tokens sit inside verified duplicated
# spans (BOTH legs of the span pair — a doc is risky whether it is the
# kept or the removed side), folded into an integer risk score and a
# release bucket. Composes the wave-37/40 span machinery (_verified_
# spans — anchor-shingle + extension + exact verify) with the exact-dup
# hash family; sharing the primitives means this audit cannot drift
# from the dedup ops that act on the same evidence.
#
# Scoring (integer, both engines): 4 points per exact duplicate (capped
# at 4 dups), span points by duplicated-mass share (>=50% -> 8,
# >=20% -> 4, >=5% -> 2, >0 -> 1). Buckets: >=12 critical, >=6 high,
# >=2 medium, >=1 low, 0 minimal.
#
# Scale: the span side is the df-capped anchor machinery (bounded pair
# fan-out, exact verify on candidates only — the wave-37 plan audit);
# the exact side is one md5 combine; the assembly joins are keyed
# shuffle joins pinned SHUFFLE_HASH (dup evidence is data-sized at a
# constant dup rate — the duplicated_span_removal doctrine).
# ---------------------------------------------------------------------------


def memorization_risk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok, ver = _verified_spans(spark, sf_dir)
    iv = (
        ver.select(
            F.col("da").cast("bigint").alias("doc_id"),
            F.col("start_a").cast("bigint").alias("s"),
            (F.col("start_a") + F.col("span_len") - 1)
            .cast("bigint")
            .alias("e"),
        )
        .unionByName(
            ver.select(
                F.col("db").cast("bigint").alias("doc_id"),
                F.col("start_b").cast("bigint").alias("s"),
                (F.col("start_b") + F.col("span_len") - 1)
                .cast("bigint")
                .alias("e"),
            )
        )
    )
    w = Window.partitionBy("doc_id").orderBy("s", "e")
    iv2 = iv.withColumn(
        "prev_max",
        F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
    ).withColumn(
        "new_isl",
        (
            F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max"))
        ).cast("int"),
    )
    isl = iv2.withColumn(
        "isl",
        F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    mass = (
        isl.groupBy("doc_id", "isl")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("me") - F.col("ms") + 1)
            .cast("bigint")
            .alias("dup_tokens")
        )
    )
    # the exact-dup leg needs the raw text for the hash, so it re-scans
    # the 2-column projection (the span side's persisted tok frame has
    # already dropped text); NULL-text docs are out of scope both sides
    docs = (
        _docs(spark, sf_dir)
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.size(tokens("text")).cast("bigint").alias("n_tokens"),
            F.md5("text").alias("th"),
        )
    )
    groups = docs.groupBy("th").agg(
        F.count(F.lit(1)).cast("bigint").alias("copies")
    )
    base = (
        docs.hint("shuffle_hash")
        .join(groups, "th")
        .withColumn("exact_dups", F.col("copies") - F.lit(1))
        .drop("th", "copies")
    )
    joined = base.hint("shuffle_hash").join(
        mass, "doc_id", "left"
    ).withColumn(
        "dup_tokens",
        F.coalesce("dup_tokens", F.lit(0)).cast("bigint"),
    )
    scored = joined.withColumn(
        "span_dup_micro",
        F.expr(
            "CASE WHEN n_tokens = 0 THEN 0"
            " ELSE dup_tokens * 1000000 div n_tokens END"
        ),
    ).withColumn(
        "risk_points",
        F.expr(
            "least(exact_dups, 4) * 4 + CASE"
            " WHEN span_dup_micro >= 500000 THEN 8"
            " WHEN span_dup_micro >= 200000 THEN 4"
            " WHEN span_dup_micro >= 50000 THEN 2"
            " WHEN span_dup_micro > 0 THEN 1 ELSE 0 END"
        ).cast("bigint"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "exact_dups",
        "dup_tokens",
        "span_dup_micro",
        "risk_points",
        F.expr(
            "CASE WHEN risk_points >= 12 THEN 'critical'"
            " WHEN risk_points >= 6 THEN 'high'"
            " WHEN risk_points >= 2 THEN 'medium'"
            " WHEN risk_points >= 1 THEN 'low'"
            " ELSE 'minimal' END"
        ).alias("risk_bucket"),
    )


_MEM_RISK_SQL = f"""
WITH {_DUP_SPAN_CTES},
iv AS (
    SELECT doc_a AS doc_id, start_a AS s,
           start_a + span_len - 1 AS e
    FROM vspans
    UNION ALL
    SELECT doc_b AS doc_id, start_b AS s,
           start_b + span_len - 1 AS e
    FROM vspans
),
iv2 AS (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_max
    FROM iv
),
isl AS (
    SELECT doc_id, s, e,
           sum(CASE WHEN prev_max IS NULL OR s > prev_max
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY s, e
                     ROWS UNBOUNDED PRECEDING) AS isl
    FROM iv2
),
merged AS (
    SELECT doc_id, isl, min(s) AS ms, max(e) AS me
    FROM isl GROUP BY 1, 2
),
mass AS (
    SELECT doc_id, CAST(sum(me - ms + 1) AS BIGINT) AS dup_tokens
    FROM merged GROUP BY 1
),
docs AS (
    SELECT doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
           md5(text) AS th
    FROM tok t JOIN documents USING (doc_id)
    WHERE t.t IS NOT NULL
),
grp AS (
    SELECT th, CAST(count(*) AS BIGINT) AS copies FROM docs GROUP BY 1
),
scored AS (
    SELECT d.doc_id, d.n_tokens,
           g.copies - 1 AS exact_dups,
           CAST(coalesce(m.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           CAST(CASE WHEN d.n_tokens = 0 THEN 0
                ELSE coalesce(m.dup_tokens, 0) * 1000000 // d.n_tokens
                END AS BIGINT) AS span_dup_micro
    FROM docs d
    JOIN grp g USING (th)
    LEFT JOIN mass m ON d.doc_id = m.doc_id
),
pts AS (
    SELECT *,
           CAST(least(exact_dups, 4) * 4 + CASE
                WHEN span_dup_micro >= 500000 THEN 8
                WHEN span_dup_micro >= 200000 THEN 4
                WHEN span_dup_micro >= 50000 THEN 2
                WHEN span_dup_micro > 0 THEN 1 ELSE 0 END
                AS BIGINT) AS risk_points
    FROM scored
)
SELECT doc_id, n_tokens, exact_dups, dup_tokens, span_dup_micro,
       risk_points,
       CASE WHEN risk_points >= 12 THEN 'critical'
            WHEN risk_points >= 6 THEN 'high'
            WHEN risk_points >= 2 THEN 'medium'
            WHEN risk_points >= 1 THEN 'low'
            ELSE 'minimal' END AS risk_bucket
FROM pts
"""


QUERIES = {
    "retrieval_ndcg_eval": retrieval_ndcg_eval,
    "memorization_risk_audit": memorization_risk_audit,
    "cooccurrence_window_pmi": cooccurrence_window_pmi,
    "bm25_doc_search": bm25_doc_search,
    "source_span_overlap": source_span_overlap,
    "bpe_pair_counts": bpe_pair_counts,
    "bpe_merge_rounds": bpe_merge_rounds,
    "bpe_apply_fertility": bpe_apply_fertility,
    "kneser_ney_counts": kneser_ney_counts,
    "collocation_pmi": collocation_pmi,
    "span_dedup_stats": span_dedup_stats,
    "dedup_duplicated_spans": dedup_duplicated_spans,
    "cdc_chunk_dedup": cdc_chunk_dedup,
    "duplicated_span_removal": duplicated_span_removal,
    "tfidf_doc_keywords": tfidf_doc_keywords,
    "mmr_diversified_topk": mmr_diversified_topk,
}

ORACLE = {
    "retrieval_ndcg_eval": _ndcg_sql(),
    "memorization_risk_audit": _MEM_RISK_SQL,
    "bm25_doc_search": _bm25_sql(),
    "cooccurrence_window_pmi": _COOC_SQL,
    "source_span_overlap": _SOURCE_OVERLAP_SQL,
    "bpe_pair_counts": _BPE_SQL,
    "bpe_merge_rounds": _bpe_merge_sql(),
    "bpe_apply_fertility": _bpe_apply_sql(),
    "kneser_ney_counts": _KN_SQL,
    "collocation_pmi": _PMI_SQL,
    "span_dedup_stats": _SPAN_SQL,
    "dedup_duplicated_spans": _DUP_SPANS_SQL,
    "cdc_chunk_dedup": _CDC_SQL,
    "duplicated_span_removal": _SPAN_REMOVAL_SQL,
    "tfidf_doc_keywords": _TFIDF_SQL,
    "mmr_diversified_topk": _mmr_sql(),
}
