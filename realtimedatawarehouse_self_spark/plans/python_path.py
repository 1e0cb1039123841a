"""Oracle-gated queries that exercise the engine's *Python* execution paths
(Arrow-batched mapInPandas / pandas UDF) — the quarantined slow path that
built-in functions can't express (media decode, pluggable tokenizers).

The multimodal decode stub derives dimensions deterministically from the
payload's sha256 (functions/multimodal.py), which DuckDB can mirror in SQL —
so the driver's oracle gate validates the actual mapInPandas plumbing
(Arrow batching, schema, 1->1 row mapping), not just a JVM twin.

Scale notes: both operators are per-row transforms with no shuffle —
embarrassingly parallel over Arrow batches; `arrow.maxRecordsPerBatch`
bounds decoder memory for large media.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtimedatawarehouse_self_spark.functions.multimodal import (
    PHASH_GRID,
    attach_payload,
    decode_media_metadata,
)
from realtimedatawarehouse_self_spark.functions.text import tokenize_udf
from realtimedatawarehouse_self_spark.session import apply_runtime_confs
from realtimedatawarehouse_self_spark.sources.tables import load_table


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """attach binary payload -> mapInPandas decode -> typed metadata."""
    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return decode_media_metadata(attach_payload(docs))


# The stub decoder (functions/multimodal.py::_decode_image_bytes):
#   h = sha256(payload); width = 160 + h[0]%8*80; height = 90 + h[1]%8*45
# mirrored below on the hex digest (byte 0 = hex chars 1-2, byte 1 = 3-4).
_MULTIMODAL_DECODE_SQL = """
WITH hashed AS (
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
)
SELECT doc_id, n_bytes,
       CASE WHEN n_bytes % 3 = 0 THEN 'image/png'
            WHEN n_bytes % 3 = 1 THEN 'audio/wav'
            ELSE 'video/mp4' END AS mime_type,
       CAST(160 + (TRY_CAST('0x' || substr(sha256, 1, 2) AS INTEGER) % 8) * 80
            AS INTEGER) AS width,
       CAST(90 + (TRY_CAST('0x' || substr(sha256, 3, 2) AS INTEGER) % 8) * 45
            AS INTEGER) AS height,
       sha256
FROM hashed
"""


def keyword_page_view_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 via the pluggable pandas-UDF tokenizer (Arrow batches), instead of
    the JVM split path of `keyword_page_view` — same oracle semantics."""
    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    words = docs.select(
        "lang", F.explode(tokenize_udf(F.col("text"))).alias("keyword")
    )
    return words.groupBy("lang", "keyword").agg(
        F.count(F.lit(1)).alias("keyword_ct")
    )


_KEYWORD_UDF_SQL = """
SELECT lang, keyword, CAST(count(*) AS BIGINT) AS keyword_ct
FROM (
    SELECT lang, unnest(string_split(text, ' ')) AS keyword FROM documents
)
WHERE keyword <> ''
GROUP BY 1, 2
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1->N frame sampling through mapInPandas (functions/multimodal.py::
    sample_frames): each payload yields one row per 64-byte "frame" (the
    stub for ffmpeg keyframe seeks). The oracle regenerates the same frames
    in SQL (payloads are ASCII, so byte slicing == character slicing) and
    hash-pins every frame's content — verifying the row-explosion plumbing
    end-to-end, not just row counts."""
    from realtimedatawarehouse_self_spark.functions.multimodal import (
        attach_payload,
        sample_frames,
    )

    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    frames = sample_frames(attach_payload(docs))
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame_bytes").cast("bigint").alias("n_frame_bytes"),
        "frame_sha256",
    )


_FRAME_SAMPLE_SQL = """
WITH d AS (
    SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
    FROM documents WHERE length(text) > 0
),
frames AS (
    SELECT doc_id,
           CAST(u.i AS INTEGER) AS frame_idx,
           substr(text, CAST(u.i * 64 + 1 AS BIGINT), 64) AS frame
    FROM d, UNNEST(range(0, CAST(ceil(n / 64.0) AS BIGINT))) AS u(i)
)
SELECT doc_id, frame_idx,
       CAST(length(frame) AS BIGINT) AS n_frame_bytes,
       sha256(frame) AS frame_sha256
FROM frames
"""


def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shape Python path: 256-byte PCM window segmentation with
    exact per-window energy (sum of byte values) via mapInPandas
    (functions/multimodal.py::audio_energy_windows). Payloads are ASCII
    text bytes, so the DuckDB oracle recomputes the identical energies
    with ord() over character slices — the Arrow plumbing AND the
    numeric reduction are both verified, not just row counts."""
    from realtimedatawarehouse_self_spark.functions.multimodal import (
        attach_payload,
        audio_energy_windows,
    )

    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return audio_energy_windows(attach_payload(docs))


_AUDIO_WINDOWS_SQL = """
WITH d AS (
    SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n
    FROM documents WHERE length(text) > 0
),
wins AS (
    SELECT doc_id,
           CAST(u.i AS INTEGER) AS win_idx,
           substr(text, CAST(u.i * 256 + 1 AS BIGINT), 256) AS w
    FROM d, UNNEST(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS u(i)
)
SELECT doc_id, win_idx,
       CAST(length(w) AS BIGINT) AS n_win_bytes,
       CAST(list_sum(list_transform(range(1, length(w) + 1),
                                    i -> ord(substr(w, i, 1))))
            AS BIGINT) AS energy
FROM wins
"""


# ---------------------------------------------------------------------------
# Grouped-agg pandas UDAF — the one Arrow execution shape the Python
# surface did not yet exercise (scalar pandas UDF: tokenizer; grouped-map:
# stateful processors; mapInPandas: multimodal). Exact interquartile
# (trimmed) mean of purchase cents per type: a whole-group statistic that
# built-ins cannot express in one aggregate (percentile_approx is a
# sketch; the exact form needs the group's sorted values at once).
# Determinism under value ties: the trim keeps ranks t+1..n-t of the
# SORTED cents; tied boundary values are interchangeable, so the kept
# MULTISET — hence the sum — is order-independent.
# Scale: one shuffle to (event_type); each group's values stream into one
# Arrow batch — per-group memory is the honest cost of an exact holistic
# aggregate (same class as exact median); int64 bound documented inline.
# ---------------------------------------------------------------------------
def trimmed_mean_value_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: F401 (resolves the stringified hints)
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    apply_runtime_confs(spark)

    # functionType passed explicitly: `from __future__ import annotations`
    # stringifies the hints, so signature inference cannot see pd.Series
    @pandas_udf("bigint", PandasUDFType.GROUPED_AGG)
    def trimmed_mean_micro(v):
        s = v.dropna().sort_values().to_numpy()
        n = len(s)
        if n == 0:
            return None
        t = n // 4
        kept = s[t : n - t]
        # Python-int arithmetic: kept.sum() (cents) fits int64 to ~9e16
        # cents; the *1e6 rescale would not — promote before multiplying.
        return int(kept.sum()) * 1_000_000 // len(kept)

    @pandas_udf("bigint", PandasUDFType.GROUPED_AGG)
    def n_nonnull(v):
        return int(v.notna().sum())

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "CAST(floor(value * 100 + 0.5) AS BIGINT)"
        ).alias("v_c"),
    )
    return ev.groupBy("event_type").agg(
        n_nonnull("v_c").alias("n_values"),
        trimmed_mean_micro("v_c").alias("trimmed_mean_micro"),
    )


_TRIMMED_MEAN_SQL = """
WITH v AS (
    SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_c
    FROM events WHERE value IS NOT NULL
),
r AS (
    SELECT event_type, v_c,
           row_number() OVER (PARTITION BY event_type ORDER BY v_c) AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM v
),
agg AS (
    SELECT event_type, n,
           sum(CASE WHEN rn > n // 4 AND rn <= n - n // 4
                    THEN v_c END) AS kept_sum
    FROM r GROUP BY 1, 2
)
SELECT a.event_type,
       CAST(coalesce(a.n, 0) AS BIGINT) AS n_values,
       CAST(a.kept_sum * 1000000 // (a.n - 2 * (a.n // 4)) AS BIGINT)
           AS trimmed_mean_micro
FROM agg a
UNION ALL
-- groups whose values are ALL NULL still appear on the Spark side (one
-- groupBy row with n=0); NOT EXISTS + IS NOT DISTINCT FROM keeps the
-- check NULL-key-safe (NOT IN would collapse under a NULL key)
SELECT DISTINCT e.event_type, CAST(0 AS BIGINT), CAST(NULL AS BIGINT)
FROM events e
WHERE NOT EXISTS (
    SELECT 1 FROM v
    WHERE v.event_type IS NOT DISTINCT FROM e.event_type
)
"""


# ---------------------------------------------------------------------------
# Payload byte profile — the compression/binary-content screen over the
# attached payload, through the REAL Arrow mapInPandas path (numpy
# np.unique histogram + one shifted comparison per payload; see
# functions/multimodal.py::byte_profile). The DuckDB mirror walks the
# text's characters — exact because the stand-in payload is the UTF-8
# encoding of ASCII-only text (pinned: octet_length(encode(text)) ==
# length(text) across the corpus); with real media bytes only the Spark
# side runs and the oracle would be dropped to a rows-only check.
# ---------------------------------------------------------------------------
def multimodal_byte_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.functions.multimodal import (
        byte_profile,
    )

    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return byte_profile(attach_payload(docs))


_BYTE_PROFILE_SQL = """
WITH chars AS (
    SELECT doc_id, ascii(substr(text, CAST(i AS INTEGER), 1)) AS byte
    FROM documents, UNNEST(range(1, length(text) + 1)) AS u(i)
),
hist AS (
    SELECT doc_id, byte, CAST(count(*) AS BIGINT) AS ct
    FROM chars GROUP BY 1, 2
),
top AS (
    SELECT doc_id, CAST(byte AS BIGINT) AS top_byte, ct AS top_byte_ct
    FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY ct DESC, byte) AS rn
        FROM hist
    ) WHERE rn = 1
),
stats AS (
    SELECT doc_id, CAST(sum(ct) AS BIGINT) AS n_bytes,
           CAST(count(*) AS BIGINT) AS distinct_bytes
    FROM hist GROUP BY 1
),
rep AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN substr(text, CAST(i AS INTEGER), 1)
                         = substr(text, CAST(i + 1 AS INTEGER), 1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS repeat_pairs
    FROM documents, UNNEST(range(1, length(text))) AS u(i)
    GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(s.n_bytes, 0) AS BIGINT) AS n_bytes,
       CAST(coalesce(s.distinct_bytes, 0) AS BIGINT) AS distinct_bytes,
       CAST(coalesce(t.top_byte, -1) AS BIGINT) AS top_byte,
       CAST(coalesce(t.top_byte_ct, 0) AS BIGINT) AS top_byte_ct,
       CAST(coalesce(r.repeat_pairs, 0) AS BIGINT) AS repeat_pairs
FROM documents d
LEFT JOIN stats s USING (doc_id)
LEFT JOIN top t USING (doc_id)
LEFT JOIN rep r USING (doc_id)
"""


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor 16x16 thumbnail pass (decode -> resize), the
    fifth quarantined Arrow path: real mapInPandas plumbing + vectorized
    gather, stub pixel geometry (see functions/multimodal.py::
    resize_nearest); the oracle re-derives every sampled pixel by
    character arithmetic and hash-pins the resized content.

    ASCII contract (ADVICE r7): the oracle samples CHARACTERS via
    substr(text, ...) at offsets computed modulo octet_length (a BYTE
    count) while the Spark side samples raw UTF-8 bytes — the two agree
    only because the corpus is pure ASCII (byte index == char index,
    ascii(ch) == byte value). This is the same contract every
    python_path oracle relies on; it is asserted per-session by
    tests/test_contract.py::test_python_path_ascii_corpus_contract.
    With real (non-ASCII / binary) payloads only the Spark side runs
    and the oracle drops to a rows-only check."""
    from realtimedatawarehouse_self_spark.functions.multimodal import (
        resize_nearest,
    )

    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return resize_nearest(attach_payload(docs))


_RESIZE_W = 16
_RESIZE_H = 16

_MULTIMODAL_RESIZE_SQL = f"""
WITH hashed AS (
    SELECT doc_id, text,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(160 + (TRY_CAST('0x' || substr(sha256(text), 1, 2)
                       AS INTEGER) % 8) * 80 AS BIGINT) AS w,
           CAST(90 + (TRY_CAST('0x' || substr(sha256(text), 3, 2)
                      AS INTEGER) % 8) * 45 AS BIGINT) AS h
    FROM documents
),
grid AS (
    SELECT doc_id, uy.y, ux.x,
           substr(text,
                  CAST(((uy.y * h // {_RESIZE_H}) * w
                        + (ux.x * w // {_RESIZE_W})) % n_bytes + 1
                       AS INTEGER), 1) AS ch
    FROM hashed,
         UNNEST(range(0, {_RESIZE_H})) AS uy(y),
         UNNEST(range(0, {_RESIZE_W})) AS ux(x)
    WHERE n_bytes > 0
),
agg AS (
    SELECT doc_id,
           CAST(sum(ascii(ch)) AS BIGINT) AS pix_sum,
           sha256(string_agg(ch, '' ORDER BY y, x)) AS resized_sha256
    FROM grid GROUP BY 1
)
SELECT d.doc_id,
       CAST(CASE WHEN d.n_bytes = 0 THEN 0 ELSE d.w END AS INTEGER) AS src_w,
       CAST(CASE WHEN d.n_bytes = 0 THEN 0 ELSE d.h END AS INTEGER) AS src_h,
       CAST({_RESIZE_W} AS INTEGER) AS out_w,
       CAST({_RESIZE_H} AS INTEGER) AS out_h,
       CAST(coalesce(a.pix_sum, 0) AS BIGINT) AS pix_sum,
       coalesce(a.resized_sha256, '') AS resized_sha256
FROM hashed d LEFT JOIN agg a USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Perceptual-hash image near-dup — the image-side analogue of the text
# dedup family: dHash fingerprints (56-bit row-gradient signs over a
# nearest-neighbor 8x8 grid; Krawetz) through the REAL Arrow mapInPandas
# path, then an entirely JVM-side SimHash-style banded candidate join
# (4 x 14-bit bands: Hamming-<=3 pairs are guaranteed a colliding band;
# the audit's threshold PHASH_HAM_MAX=6 keeps the usual LSH recall
# caveat, documented like dedup_simhash's) and a bit_count(xor) verify.
# Output is the per-band audit (buckets, candidate pairs, verified dup
# pairs) — bounded at exactly PHASH_BANDS rows at any corpus size; each
# candidate pair is attributed to its SMALLEST colliding band so the
# rows partition the pair set deterministically.
#
# Scale shape: hashing is one Arrow pass (real codecs plug in at
# functions/multimodal.py::dhash_bits); candidates come from a bucketed
# equi-join on (band, value) — never all pairs; the verify touches
# candidates only. ASCII-corpus contract shared with every python_path
# oracle (tests/test_contract.py::test_python_path_ascii_corpus_contract).
# ---------------------------------------------------------------------------
PHASH_BANDS = 4
PHASH_BAND_BITS = 14
PHASH_HAM_MAX = 6


def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.functions.multimodal import (
        dhash_bits,
    )

    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    hashed = dhash_bits(attach_payload(docs)).persist()
    mask = (1 << PHASH_BAND_BITS) - 1
    bands = hashed.select(
        "doc_id",
        "dhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {PHASH_BANDS - 1}),"
                f" b -> struct(CAST(b AS BIGINT) AS band_idx,"
                f" (shiftright(dhash, CAST(b * {PHASH_BAND_BITS} AS INT))"
                f" & {mask}) AS band_val))"
            )
        ).alias("bv"),
    ).select("doc_id", "dhash", "bv.band_idx", "bv.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.dhash").alias("ha"),
            F.col("b.dhash").alias("hb"),
        )
        .agg(F.min("a.band_idx").alias("band_idx"))
        .select(
            "band_idx",
            F.expr("bit_count(ha ^ hb)").cast("bigint").alias("hamming"),
        )
    )
    pair_stats = pairs.groupBy("band_idx").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"),
        F.sum(
            F.expr(f"CASE WHEN hamming <= {PHASH_HAM_MAX} THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("n_dup_pairs"),
        # the observable verify leg even when no pair clears the dup
        # threshold: the band's closest candidate distance
        F.min("hamming").cast("bigint").alias("min_hamming"),
    )
    buckets = bands.groupBy("band_idx").agg(
        F.countDistinct("band_val").cast("bigint").alias("n_buckets")
    )
    return (
        buckets.join(pair_stats, "band_idx", "left")
        .select(
            "band_idx",
            "n_buckets",
            F.coalesce("n_candidate_pairs", F.lit(0))
            .cast("bigint")
            .alias("n_candidate_pairs"),
            F.coalesce("n_dup_pairs", F.lit(0))
            .cast("bigint")
            .alias("n_dup_pairs"),
            F.coalesce("min_hamming", F.lit(-1))
            .cast("bigint")
            .alias("min_hamming"),
        )
    )


_PHASH_MASK = (1 << PHASH_BAND_BITS) - 1

_PHASH_SQL = f"""
WITH hashed AS (
    SELECT doc_id, text,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(160 + (TRY_CAST('0x' || substr(sha256(text), 1, 2)
                       AS INTEGER) % 8) * 80 AS BIGINT) AS w,
           CAST(90 + (TRY_CAST('0x' || substr(sha256(text), 3, 2)
                      AS INTEGER) % 8) * 45 AS BIGINT) AS h
    FROM documents
),
grid AS (
    SELECT doc_id, uy.y, ux.x,
           ascii(substr(text,
                 CAST(((uy.y * h // {PHASH_GRID}) * w
                       + (ux.x * w // {PHASH_GRID})) % n_bytes + 1
                      AS INTEGER), 1)) AS p
    FROM hashed,
         UNNEST(range(0, {PHASH_GRID})) AS uy(y),
         UNNEST(range(0, {PHASH_GRID})) AS ux(x)
    WHERE n_bytes > 0
),
dh AS (
    SELECT g1.doc_id,
           CAST(sum(CASE WHEN g1.p > g2.p
                    THEN CAST(1 AS BIGINT) << (g1.y * {PHASH_GRID - 1} + g1.x)
                    ELSE 0 END) AS BIGINT) AS dhash
    FROM grid g1
    JOIN grid g2 ON g2.doc_id = g1.doc_id AND g2.y = g1.y
                AND g2.x = g1.x + 1
    WHERE g1.x <= {PHASH_GRID - 2}
    GROUP BY 1
),
bands AS (
    SELECT doc_id, dhash, CAST(u.b AS BIGINT) AS band_idx,
           (dhash >> CAST(u.b * {PHASH_BAND_BITS} AS INTEGER))
               & {_PHASH_MASK} AS band_val
    FROM dh, UNNEST(range(0, {PHASH_BANDS})) AS u(b)
),
pairs AS (
    SELECT min(a.band_idx) AS band_idx,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
     AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id, a.dhash, b.dhash
),
pair_stats AS (
    SELECT band_idx,
           CAST(count(*) AS BIGINT) AS n_candidate_pairs,
           CAST(sum(CASE WHEN hamming <= {PHASH_HAM_MAX} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_pairs,
           CAST(min(hamming) AS BIGINT) AS min_hamming
    FROM pairs GROUP BY 1
),
buckets AS (
    SELECT band_idx,
           CAST(count(DISTINCT band_val) AS BIGINT) AS n_buckets
    FROM bands GROUP BY 1
)
SELECT k.band_idx, k.n_buckets,
       CAST(coalesce(p.n_candidate_pairs, 0) AS BIGINT)
           AS n_candidate_pairs,
       CAST(coalesce(p.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
       CAST(coalesce(p.min_hamming, -1) AS BIGINT) AS min_hamming
FROM buckets k LEFT JOIN pair_stats p USING (band_idx)
"""


# ---------------------------------------------------------------------------
# Web-corpus front door: HTML main-text extraction (VERDICT r8 #2a) — the
# eighth quarantined Arrow path. Structural region pruning (head/nav/ads/
# footer) + jusText-style block density classification over a
# deterministic synthetic page; the oracle builds the identical page and
# runs the identical prune/filter pipeline in SQL (regexp_extract_all +
# list_filter), so the hash gate checks the full extraction arithmetic.
# See functions/webtext.py for the trafilatura plug-in contract.


def html_text_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from realtimedatawarehouse_self_spark.functions.webtext import (
        attach_html,
        extract_main_text,
    )

    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return extract_main_text(attach_html(docs))


def html_extract_sql_ctes(src: str = "documents", cols: str = "") -> str:
    """DuckDB twin of attach_html + extract_main_text as reusable CTEs
    w/p/h/x/hk over `src` (carrying `cols` through each stage), shared by
    the standalone html_text_extraction oracle and the composed
    crawl_to_train_funnel so the extraction SQL cannot drift between
    them. `hk` exposes doc_id{{, cols}}, html, blocks, kept."""
    from realtimedatawarehouse_self_spark.functions import webtext as wt

    c = f", {cols}" if cols else ""
    return f"""w AS (
  SELECT doc_id{c}, coalesce(source, '') AS src_title,
         string_split(text, ' ') AS words
  FROM {src} WHERE text IS NOT NULL
), p AS (
  SELECT doc_id{c}, src_title,
         list_transform(
           range(0, CAST(ceil(len(words) / {wt.PARA_WORDS}.0) AS INTEGER)),
           i -> CASE WHEN i % 2 = 0
                THEN regexp_replace(
                       array_to_string(list_slice(words,
                         i*{wt.PARA_WORDS}+1, i*{wt.PARA_WORDS}+{wt.PARA_WORDS}), ' '),
                       '^(\\S+)',
                       '<a href="#p' || i || '">\\1</a>')
                ELSE array_to_string(list_slice(words,
                       i*{wt.PARA_WORDS}+1, i*{wt.PARA_WORDS}+{wt.PARA_WORDS}), ' ')
                END) AS paras
  FROM w
), h AS (
  SELECT doc_id{c},
         '{wt.HEAD_PRE}' || src_title || '{wt.HEAD_POST}{wt.NAV}<p>'
           || array_to_string(paras, '</p><p>')
           || '</p>{wt.AD}{wt.FOOT}' AS html
  FROM p
), x AS (
  SELECT doc_id{c}, html,
         regexp_extract_all(
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(html,
             '<head>.*?</head>', '', 'g'),
             '<nav>.*?</nav>', '', 'g'),
             '<div class="ad">.*?</div>', '', 'g'),
             '<footer>.*?</footer>', '', 'g'),
           '<p>(.*?)</p>', 1) AS blocks
  FROM h
), hk AS (
  SELECT doc_id{c}, html, blocks,
         list_transform(
           list_filter(blocks,
             b -> len(regexp_extract_all(
                    regexp_replace(b, '<[^>]+>', '', 'g'), '\\S+'))
                  >= {wt.MIN_BLOCK_WORDS}),
           b -> regexp_replace(b, '<[^>]+>', '', 'g')) AS kept
  FROM x
)"""


def _html_extraction_sql() -> str:
    return f"""
WITH {html_extract_sql_ctes()}
SELECT doc_id,
       CAST(len(blocks) AS INTEGER) AS n_blocks,
       CAST(len(kept) AS INTEGER) AS kept_blocks,
       CAST(length(html) AS BIGINT) AS html_chars,
       -- DuckDB's array_to_string on an EMPTY list is NULL, not '' — a
       -- page with zero surviving blocks extracts to the empty string
       CAST(length(coalesce(array_to_string(kept, ' '), '')) AS BIGINT)
           AS content_chars,
       coalesce(array_to_string(kept, ' '), '') AS extracted_text
FROM hk
"""


_HTML_EXTRACTION_SQL = _html_extraction_sql()



# ---------------------------------------------------------------------------
# Unicode NFC normalization audit (wave 48) — the canonicalization screen
# run before dedup/tokenization on any multilingual corpus (UAX #15;
# C4/mC4 and CCNet normalize up front): decomposed sequences hash
# differently from their precomposed equals, silently fragmenting exact
# dedup, shingles, and vocab counts. Catalyst has no normalize()
# expression, so this is the ninth quarantined Arrow path (one
# mapInPandas pass, no shuffle). The corpus is pure ASCII (contract-
# asserted), so non-NFC material is INJECTED deterministically by
# doc_id residue — decomposed e+U+0301 (changes under NFC), precomposed
# U+00E9 (non-ASCII but NFC-stable), decomposed n+U+0303, or nothing —
# built identically in both engines; DuckDB mirrors the normalization
# itself with nfc_normalize() (utf8proc) and the audit arithmetic in
# SQL, so the hash gate checks the real normalization behavior.
# The three injected sequences are Unicode-1.1-era canonical pairs —
# stable across every utf8proc/CPython Unicode version in play.
# ---------------------------------------------------------------------------
_NFC_SUFFIX_DECOMPOSED_E = " caf\u0065\u0301"   # e + COMBINING ACUTE
_NFC_SUFFIX_PRECOMPOSED = " caf\u00e9"           # é precomposed
_NFC_SUFFIX_DECOMPOSED_N = " pi\u006e\u0303a"   # n + COMBINING TILDE


def unicode_normalization_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from realtimedatawarehouse_self_spark.functions.text import nfc_audit

    apply_runtime_confs(spark)
    docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("text").isNotNull()
    )
    res = F.col("doc_id") % 4
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(res == 0, F.lit(_NFC_SUFFIX_DECOMPOSED_E))
            .when(res == 1, F.lit(_NFC_SUFFIX_PRECOMPOSED))
            .when(res == 2, F.lit(_NFC_SUFFIX_DECOMPOSED_N))
            .otherwise(F.lit("")),
        ).alias("aug"),
    )
    return nfc_audit(aug)


_NFC_AUDIT_SQL = """
WITH a AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 4 AS INTEGER)
           WHEN 0 THEN ' caf' || 'e' || chr(769)
           WHEN 1 THEN ' caf' || chr(233)
           WHEN 2 THEN ' pi' || 'n' || chr(771) || 'a'
           ELSE '' END AS aug
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(length(aug) AS BIGINT) AS n_chars_raw,
       CAST(length(nfc_normalize(aug)) AS BIGINT) AS n_chars_nfc,
       CAST(CASE WHEN nfc_normalize(aug) <> aug THEN 1 ELSE 0 END
            AS BIGINT) AS nfc_changed,
       CAST(CASE WHEN octet_length(encode(aug)) = length(aug)
                 THEN 1 ELSE 0 END AS BIGINT) AS ascii_only,
       CAST(length(aug) - length(regexp_replace(
                aug, chr(769) || '|' || chr(771), '', 'g')) AS BIGINT)
           AS combining_marks
FROM a
"""


QUERIES = {
    "unicode_normalization_audit": unicode_normalization_audit,
    "multimodal_decode": multimodal_decode,
    "multimodal_phash_dedup": multimodal_phash_dedup,
    "html_text_extraction": html_text_extraction,
    "multimodal_resize": multimodal_resize,
    "trimmed_mean_value_udaf": trimmed_mean_value_udaf,
    "keyword_page_view_udf": keyword_page_view_udf,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_audio_windows": multimodal_audio_windows,
    "multimodal_byte_profile": multimodal_byte_profile,
}

ORACLE = {
    "unicode_normalization_audit": _NFC_AUDIT_SQL,
    "multimodal_decode": _MULTIMODAL_DECODE_SQL,
    "multimodal_phash_dedup": _PHASH_SQL,
    "html_text_extraction": _HTML_EXTRACTION_SQL,
    "multimodal_resize": _MULTIMODAL_RESIZE_SQL,
    "trimmed_mean_value_udaf": _TRIMMED_MEAN_SQL,
    "keyword_page_view_udf": _KEYWORD_UDF_SQL,
    "multimodal_frame_sample": _FRAME_SAMPLE_SQL,
    "multimodal_audio_windows": _AUDIO_WINDOWS_SQL,
    "multimodal_byte_profile": _BYTE_PROFILE_SQL,
}
