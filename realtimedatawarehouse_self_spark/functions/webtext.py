"""Web-corpus front door: HTML main-text extraction.

The first stage of a C4/RefinedWeb-style pretraining pipeline is turning
crawled HTML into clean text (trafilatura / jusText class). The Spark-side
shape implemented here is real and scale-correct:

- the page rides through the engine as one string column (at 100 TB it is
  a WARC-derived `binary`/`string` column — same plumbing);
- extraction is a per-row CPU transform with NO shuffle: one Arrow-batched
  ``mapInPandas`` pass, embarrassingly parallel, decoder memory bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- the extraction logic is the actual algorithmic core of boilerplate
  removal — structural region pruning (head/nav/ads/footer) followed by
  jusText-style block classification (per-block plain-text density: a
  block survives only with >= ``MIN_BLOCK_WORDS`` words after tag
  stripping). A production deployment swaps the regex HTML walk for
  trafilatura/selectolax inside the SAME ``mapInPandas`` closure; the
  schema, batching, and partitioning are exactly what that plug-in keeps.

Because the container has no crawl corpus, ``attach_html`` synthesizes a
deterministic page per document JVM-side (title + nav + the document's
words re-flowed into ``<p>`` paragraphs with periodic anchors + an ad div
+ footer). The DuckDB oracle builds the identical string and runs the
identical region-prune/block-filter pipeline in SQL, so the driver's
hash gate validates the real extraction arithmetic end to end.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# page template shared by the Spark builder and the SQL oracle — module
# constants are the single source of truth, interpolated into both.
PARA_WORDS = 12        # words per synthesized <p> block
MIN_BLOCK_WORDS = 5    # jusText-style density floor: keep block iff >= 5
HEAD_PRE = '<html><head><title>'
HEAD_POST = '</title></head><body>'
NAV = (
    '<nav><a href="/">home</a> <a href="/about">about</a> '
    '<a href="/login">login</a></nav>'
)
AD = '<div class="ad"><a href="https://ads.example.com/buy">buy now</a></div>'
FOOT = (
    '<footer>copyright 2024 example.com all rights reserved</footer>'
    '</body></html>'
)

EXTRACTED_SCHEMA = (
    "doc_id long, n_blocks int, kept_blocks int, html_chars long, "
    "content_chars long, extracted_text string"
)

# structural region pruning: the selector set trafilatura/jusText drop
# before block scoring (non-greedy so sibling regions stay independent)
_REGION_RES = [
    re.compile(p, re.DOTALL)
    for p in (
        r"<head>.*?</head>",
        r"<nav>.*?</nav>",
        r'<div class="ad">.*?</div>',
        r"<footer>.*?</footer>",
        r"<script>.*?</script>",
        r"<style>.*?</style>",
    )
]
_BLOCK_RE = re.compile(r"<p>(.*?)</p>", re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")


def attach_html(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the deterministic test page (JVM-side, pure built-ins).

    The document's words re-flow into ``PARA_WORDS``-word ``<p>`` blocks;
    every even block's first word is wrapped in an anchor (so tag
    stripping inside kept blocks is exercised, not just region pruning);
    the final short block plus nav/ad/footer give the density filter real
    work. NULL text is dropped — a page that failed to fetch has no rows.
    """
    paras = F.expr(
        f"""
        transform(
          sequence(0, cast(ceil(size(words) / {PARA_WORDS}.0) as int) - 1),
          i -> CASE WHEN i % 2 = 0
               THEN regexp_replace(
                      array_join(slice(words, i*{PARA_WORDS}+1, {PARA_WORDS}), ' '),
                      '^(\\\\S+)',
                      concat('<a href="#p', cast(i as string), '">$1</a>'))
               ELSE array_join(slice(words, i*{PARA_WORDS}+1, {PARA_WORDS}), ' ')
               END)
        """
    )
    return (
        df.where(F.col(text_col).isNotNull())
        .withColumn("words", F.split(text_col, " "))
        .withColumn("paras", paras)
        .withColumn(
            "html",
            F.concat(
                F.lit(HEAD_PRE),
                # NULL source = untitled page, not a NULL page (concat
                # with NULL would otherwise swallow the whole document)
                F.coalesce(F.col("source"), F.lit("")),
                F.lit(HEAD_POST + NAV + "<p>"),
                F.array_join("paras", "</p><p>"),
                F.lit("</p>" + AD + FOOT),
            ),
        )
        .select("doc_id", "html")
    )


def extract_main_text(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Region-prune + block-classify extraction via ONE Arrow pass.

    Returns per-page extraction stats plus the extracted text itself —
    the exact payload the next pipeline stage (language ID, quality
    scoring, dedup) consumes.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, html in zip(pdf["doc_id"], pdf[html_col]):
                body = html
                for rx in _REGION_RES:
                    body = rx.sub("", body)
                blocks = _BLOCK_RE.findall(body)
                kept = []
                for b in blocks:
                    plain = _TAG_RE.sub("", b)
                    if len(plain.split()) >= MIN_BLOCK_WORDS:
                        kept.append(plain)
                text = " ".join(kept)
                out.append(
                    (
                        doc_id,
                        len(blocks),
                        len(kept),
                        len(html),
                        len(text),
                        text,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_blocks",
                    "kept_blocks",
                    "html_chars",
                    "content_chars",
                    "extracted_text",
                ],
            )

    return df.select("doc_id", html_col).mapInPandas(extract, EXTRACTED_SCHEMA)
