"""Tokenizers: plain text -> index terms.

Two analysis chains (see config.IndexConfig.tokenizer):

- 'simple': lowercase + split on non-alphanumerics. Fully expressible
  as JVM-side Spark SQL functions AND as DuckDB SQL, so every operator
  built on it is oracle-checkable by the driver harness.
- 'porter': 'simple' followed by Porter stemming — the engine default,
  mirroring the reference's Solr dismax analysis (reference
  text/text_engine_client.py:15-52 delegates this to Solr; we own it).
  Runs as a vectorized pandas UDF; the same Python function is the
  test oracle.

Both emit the (doc_id, term, tf, dl) shape the indexer consumes, where
dl is the document length in tokens (carried with every term row so
the postings builder never needs a doc-length join).
"""

from __future__ import annotations

import re
from typing import Iterator, List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tangent_spark.functions.porter import stem

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# The exact regex DuckDB's oracle SQL uses to split; keep in sync with
# oracle_sql() in __spark_entry__.py.
SPLIT_PATTERN = "[^a-z0-9]+"


def tokenize_simple(text: str) -> List[str]:
    return _TOKEN_RE.findall(text.lower()) if text else []


def tokenize_porter(text: str) -> List[str]:
    return [stem(t) for t in tokenize_simple(text)]


# --- Spark-side ------------------------------------------------------------

def tokens_col_simple(text: Column) -> Column:
    """JVM-side simple tokenizer (stays inside whole-stage codegen)."""
    arr = F.split(F.lower(text), SPLIT_PATTERN)
    return F.filter(arr, lambda x: x != "")


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokens_udf_porter(texts: pd.Series) -> pd.Series:
    # memoize stems across the batch: natural-language token streams are
    # Zipf-distributed, so unique tokens << total tokens.
    memo: dict[str, str] = {}

    def stem_cached(tok: str) -> str:
        s = memo.get(tok)
        if s is None:
            s = memo[tok] = stem(tok)
        return s

    return texts.map(
        lambda t: [stem_cached(x) for x in tokenize_simple(t)]
        if isinstance(t, str)
        else []
    )


def with_tokens(df: DataFrame, text_col: str, tokenizer: str) -> DataFrame:
    if tokenizer == "simple":
        return df.withColumn("tokens", tokens_col_simple(F.col(text_col)))
    if tokenizer == "porter":
        return df.withColumn("tokens", tokens_udf_porter(F.col(text_col)))
    raise ValueError(f"unknown tokenizer {tokenizer!r}")


def terms_df(df: DataFrame, id_col: str, text_col: str, tokenizer: str = "porter") -> DataFrame:
    """Documents -> (doc_id, term, tf, dl).

    This is the reference's T9 word tokenizer (SURVEY.md §2.3) producing
    the postings input shape. groupBy gets map-side partial aggregation
    from Spark automatically; dl is carried per row to avoid the
    doc-length join the naive design would need at block-encode time.
    """
    toks = with_tokens(df, text_col, tokenizer)
    return (
        toks.select(
            F.col(id_col).alias("doc_id"),
            F.size("tokens").alias("dl"),
            F.explode("tokens").alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"), F.first("dl").alias("dl"))
    )
