"""Text-analysis functions beyond pure Catalyst expressions.

The JVM-side tokenization used across the engine is `split` + `filter`
(functions/exprs.py `tokens`). This module adds the pieces that genuinely
need Python, all Arrow-batched:

- a pluggable pandas-UDF tokenizer (the U1 UDTF analogue for real
  analyzers; the reference used the IK Chinese analyzer inside a Flink
  TableFunction, SplitFunction.java:12-28 — `jieba`/`sentencepiece` plug in
  here the same way, behind an import-try);
- a BPE-ish regex token counter for token-budget accounting.
"""

from __future__ import annotations

import re


import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, StringType

# GPT-2-style pre-tokenizer shape: word pieces, numbers, punctuation runs.
BPE_ISH = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+")

# CJK unified ideographs (+ext A, compat). CJK text carries no spaces, so a
# whitespace fallback would return whole sentences as single tokens; char
# bigrams are the standard analyzer-free IR fallback (what Lucene's
# CJKAnalyzer does when a dictionary segmenter like IK/jieba is absent).
CJK_RE = re.compile(r"[\u3400-\u4dbf\u4e00-\u9fff\uf900-\ufaff]+")


def _cjk_fallback(text: str) -> list[str]:
    """Whitespace tokens for non-CJK spans; character bigrams inside CJK
    runs (a single isolated ideograph stays a unigram)."""
    toks: list[str] = []
    for piece in text.split(" "):
        pos = 0
        for m in CJK_RE.finditer(piece):
            if m.start() > pos:
                toks.append(piece[pos : m.start()])
            run = m.group()
            if len(run) == 1:
                toks.append(run)
            else:
                toks.extend(run[i : i + 2] for i in range(len(run) - 1))
            pos = m.end()
        if pos < len(piece):
            toks.append(piece[pos:])
    return toks


def _segment(text: str) -> list[str]:
    """Pluggable analyzer: jieba if importable (IK-analyzer analogue),
    else whitespace + CJK char-bigram fallback."""
    try:  # pragma: no cover - jieba not in this container
        import jieba

        return [t for t in jieba.cut(text, cut_all=False) if t.strip()]
    except ImportError:
        return _cjk_fallback(text)


@pandas_udf(ArrayType(StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """Arrow-batched tokenizer (U1). Invoke + explode for UDTF semantics:

        df.select(explode(tokenize_udf("text")))
    """
    return texts.map(lambda t: _segment(t) if t is not None else [])


@pandas_udf(IntegerType())
def bpe_ish_token_count(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: len(BPE_ISH.findall(t)) if t is not None else 0)


def explode_keywords(df: DataFrame, text_col: str = "text") -> DataFrame:
    """LATERAL TABLE(splitfunc(...)) analogue over the pandas tokenizer."""
    return df.withColumn("keyword", F.explode(tokenize_udf(F.col(text_col))))


# ---------------------------------------------------------------------------
# Unicode NFC normalization audit (r10 wave 48) — the canonicalization
# screen every multilingual corpus runs before dedup/tokenization:
# visually-identical strings with different codepoint sequences (e +
# COMBINING ACUTE vs precomposed é) hash differently, so exact dedup,
# shingles, and vocab counts all silently fragment until the corpus is
# NFC-normalized (Unicode UAX #15; C4/mC4 and CCNet both normalize up
# front). Catalyst has no normalize() expression, so this is a genuine
# Python-path operator: one Arrow-batched mapInPandas pass over
# (doc_id, aug), no shuffle, embarrassingly parallel.
# ---------------------------------------------------------------------------
NFC_AUDIT_SCHEMA = (
    "doc_id long, n_chars_raw long, n_chars_nfc long, nfc_changed long, "
    "ascii_only long, combining_marks long"
)


def nfc_audit(df: DataFrame, text_col: str = "aug") -> DataFrame:
    """mapInPandas NFC audit: (doc_id, text) -> per-doc normalization
    stats. len() counts code points (matches DuckDB length()); the
    combining-mark count uses unicodedata.combining, which on the
    injected-suffix corpus equals the oracle's fixed-codepoint regexp
    count (the ASCII-corpus contract in tests/test_contract.py keeps the
    base text free of other marks)."""
    import unicodedata

    from collections.abc import Iterator as _Iter

    def audit(batches: _Iter[pd.DataFrame]) -> _Iter[pd.DataFrame]:
        for pdf in batches:
            texts = pdf[text_col].astype(str)
            nfc = texts.map(lambda s: unicodedata.normalize("NFC", s))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_chars_raw": texts.str.len().astype("int64"),
                    "n_chars_nfc": nfc.str.len().astype("int64"),
                    "nfc_changed": (nfc != texts).astype("int64"),
                    "ascii_only": texts.map(
                        lambda s: int(s.isascii())
                    ).astype("int64"),
                    "combining_marks": texts.map(
                        lambda s: sum(
                            1 for c in s if unicodedata.combining(c)
                        )
                    ).astype("int64"),
                }
            )

    return df.select("doc_id", text_col).mapInPandas(
        audit, NFC_AUDIT_SCHEMA
    )
