"""Deterministic tokenization (SURVEY §2.11 D1).

The reference registers an IKAnalyzer-based Chinese-segmentation UDTF
(SplitFunction.java:13-31, KeywordUtil.java:13-35) applied via
``LATERAL TABLE(split_words(...))``. Spark-first replacement:

- the scale path is a pure-SQL tokenizer — lowercase + regexp_extract_all
  — which stays inside whole-stage codegen (no Python in the hot path)
  and is deterministic, so golden tests hold;
- ``tokenize_udf`` is the extension point for a real segmenter (jieba if
  installed — public lib, IK-like full-mode segmentation) as an
  Arrow-batched pandas UDF; it falls back to the same regex so behavior
  is identical when jieba is absent. Error behavior mirrors the
  reference (SplitFunction.java:25-29: on failure emit the input row
  unchanged).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_RE = "[a-z0-9]+"

try:  # pragma: no cover - jieba is not in the test image
    import jieba  # noqa: F401

    _HAVE_JIEBA = True
except Exception:  # pragma: no cover
    _HAVE_JIEBA = False


def tokenize(col: Column | str) -> Column:
    """JVM-side tokenizer: lowercase, extract [a-z0-9]+ runs.
    Identical regex semantics in DuckDB: regexp_extract_all(lower(x), ...)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(texts: pd.Series) -> pd.Series:
    """D1 as an Arrow-batched pandas UDF (the UDTF slow path). Uses jieba
    full-mode when available, else the same regex as `tokenize`. On any
    per-row failure, emits the raw input as a single token (reference
    behavior, SplitFunction.java:25-29)."""
    pat = re.compile(TOKEN_RE)

    def _one(t):
        if t is None:
            return []
        try:
            if _HAVE_JIEBA:
                return [w for w in jieba.lcut(t.lower(), cut_all=True) if w.strip()]
            return pat.findall(t.lower())
        except Exception:
            return [t]

    return texts.map(_one)
