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
    """Documents -> (doc_id, term, tf, dl) with NO shuffle.

    This is the reference's T9 word tokenizer (SURVEY.md §2.3) producing
    the postings input shape. The naive plan (explode -> groupBy(doc,
    term)) shuffles one row per (doc, term) partial — tens of millions
    of rows for a modest corpus — yet the aggregation boundary is the
    document, and a document never spans partitions. So tf is counted
    INSIDE the tokenizer UDF (one Counter per doc per Arrow batch) and
    the operator emits final rows with zero exchanges. dl rides along
    per row so block encoding never needs a doc-length join.
    """
    from collections import Counter
    from typing import Iterator

    tok_fn = tokenize_porter if tokenizer == "porter" else tokenize_simple
    if tokenizer not in ("porter", "simple"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    use_memo = tokenizer == "porter"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict = {}

            def toks(text: str):
                if not isinstance(text, str):
                    return []
                if not use_memo:
                    return tokenize_simple(text)
                out = []
                for t in tokenize_simple(text):
                    s = memo.get(t)
                    if s is None:
                        s = memo[t] = stem(t)
                    out.append(s)
                return out

            doc_ids, terms, tfs, dls = [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                counts = Counter(toks(text))
                dl = sum(counts.values())
                for term, tf in counts.items():
                    doc_ids.append(doc_id)
                    terms.append(term)
                    tfs.append(tf)
                    dls.append(dl)
            yield pd.DataFrame(
                {"doc_id": doc_ids, "term": terms, "tf": tfs, "dl": dls}
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="doc_id long, term string, tf int, dl long"
    )


def terms_positions_df(
    df: DataFrame, id_col: str, text_col: str, tokenizer: str = "porter"
) -> DataFrame:
    """Documents -> (doc_id, term, tf, dl, positions) in ONE tokenize
    pass, no shuffle. Emits exactly terms_df's rows (tf = len(positions),
    dl = doc token count, first-occurrence row order) PLUS positions_df's
    positions column, so a positional index build tokenizes + stems the
    corpus once instead of twice (the Porter pass is the build's
    dominant Python cost; see plans/indexer.py)."""
    if tokenizer not in ("porter", "simple"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    use_memo = tokenizer == "porter"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict = {}
            doc_ids, terms, tfs, dls, poss = [], [], [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    continue
                by_term: dict[str, list[int]] = {}
                for i, t in enumerate(tokenize_simple(text)):
                    if use_memo:
                        s = memo.get(t)
                        if s is None:
                            s = memo[t] = stem(t)
                        t = s
                    by_term.setdefault(t, []).append(i)
                dl = sum(len(p) for p in by_term.values())
                for term, pos in by_term.items():
                    doc_ids.append(doc_id)
                    terms.append(term)
                    tfs.append(len(pos))
                    dls.append(dl)
                    poss.append(pos)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "term": terms,
                    "tf": tfs,
                    "dl": dls,
                    "positions": poss,
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        kernel,
        schema="doc_id long, term string, tf int, dl long, positions array<int>",
    )


def positions_df(
    df: DataFrame, id_col: str, text_col: str, tokenizer: str = "porter"
) -> DataFrame:
    """Documents -> (doc_id, term, positions array<int>) with NO shuffle
    (same per-doc aggregation-inside-the-tokenizer trick as terms_df).
    Positions are 0-based token offsets in tokenize order — the input
    for phrase/proximity matching (plans/phrase.py)."""
    if tokenizer not in ("porter", "simple"):
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    use_memo = tokenizer == "porter"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            memo: dict = {}
            doc_ids, terms, poss = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if not isinstance(text, str):
                    continue
                by_term: dict[str, list[int]] = {}
                for i, t in enumerate(tokenize_simple(text)):
                    if use_memo:
                        s = memo.get(t)
                        if s is None:
                            s = memo[t] = stem(t)
                        t = s
                    by_term.setdefault(t, []).append(i)
                for term, pos in by_term.items():
                    doc_ids.append(doc_id)
                    terms.append(term)
                    poss.append(pos)
            yield pd.DataFrame({"doc_id": doc_ids, "term": terms, "positions": poss})

    return df.select(id_col, text_col).mapInPandas(
        kernel, schema="doc_id long, term string, positions array<int>"
    )
