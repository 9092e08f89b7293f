"""Analysis chain: tokenization shared by index and query paths.

The reference delegates analysis to Elasticsearch's standard analyzer
(implicit in every ``prepareIndex(...).setSource(doc)`` at reference
``MessageHandler.java:135-139``). We pin an exact, documented tokenizer —
lowercase then extract ``[a-z0-9]+`` runs — so rank-identity between the
fast path, the DataFrame oracle, and the DuckDB SQL oracle
(``regexp_extract_all(lower(text), '[a-z0-9]+')``) is well defined.

Two implementations with identical output:

* ``tokenize_udf`` — Arrow-batched pandas UDF (the path mandated by the
  baseline's input_hint: vectorized pandas, no per-row Python);
* ``tokenize_col`` — pure Column expression (JVM-side, whole-stage
  codegen; no Python worker round-trip at all). This is the default for
  the hot index-build path because it is strictly faster at scale; the
  UDF variant exists to prove the Arrow kernel plumbing and is
  asserted equal in tests.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_PATTERN = r"[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_text(text: str | None) -> list[str]:
    """Single-string tokenizer (driver-side, for query analysis)."""
    return _TOKEN_RE.findall((text or "").lower())


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    return s.fillna("").str.lower().str.findall(_TOKEN_RE)


def tokenize_col(c: Column) -> Column:
    """JVM-side tokenizer: split on non-token runs, drop empties."""
    parts = F.split(F.lower(F.coalesce(c, F.lit(""))), "[^a-z0-9]+")
    return F.filter(parts, lambda x: x != F.lit(""))


def tokens_from(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    method: str = "sql",
) -> DataFrame:
    """(id..., term, tf) term frequencies per document.

    ``method='sql'`` keeps tokenize + explode + count inside one
    whole-stage-codegen'd stage; ``method='pandas'`` routes the tokenizer
    through the Arrow pandas UDF. Documents with no tokens produce no
    rows here (their dl=0 is still tracked by doc_stats).
    """
    tok = tokenize_udf(F.col(text_col)) if method == "pandas" else tokenize_col(F.col(text_col))
    exploded = df.select(*id_cols, F.explode(tok).alias("term"))
    return exploded.groupBy(*id_cols, "term").agg(F.count("*").alias("tf"))
