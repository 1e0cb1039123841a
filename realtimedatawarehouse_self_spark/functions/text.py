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
