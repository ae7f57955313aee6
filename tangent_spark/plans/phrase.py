"""Phrase / proximity queries over the positional 'positions' table.

The reference served phrase-capable text search by keeping stemmed-term
positions in Solr term vectors (reference text/TextResult.py:29-52 pulls
them back per hit); we store them as a first-class doc-sharded parquet
table (plans/indexer.py 'positions' stage, behind
IndexConfig.store_positions) and match phrases with a fully declarative
fold — no Python in the hot path:

    acc_0 = positions(term_0)
    acc_i = array_intersect(transform(acc_{i-1}, p -> p+1), positions(term_i))

After the fold, acc holds the positions of the phrase's LAST token for
every complete occurrence; size(acc) is the per-doc phrase tf.

Scale shape: each step is an equi-join on doc_id between two scans that
are FILTERED TO ONE TERM each — pushed to parquet row groups (the table
is term-major sorted within files). Only docs containing every phrase
term survive past their join, so the join inputs shrink monotonically.
At 100 TB this is the standard positional-intersection plan: data moved
is proportional to the phrase terms' postings, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tangent_spark.sources.store import IndexStore


def phrase_match_positions(positions: DataFrame, phrase_terms: list[str]) -> DataFrame:
    """(doc_id, phrase_tf) for docs containing the exact consecutive
    phrase. `positions` rows: (doc_id, term, positions array<int>)."""
    if not phrase_terms:
        raise ValueError("empty phrase")
    acc = positions.filter(F.col("term") == phrase_terms[0]).select(
        "doc_id", F.col("positions").alias("acc")
    )
    for t in phrase_terms[1:]:
        nxt = positions.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias("p")
        )
        acc = (
            acc.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.array_intersect(
                    F.transform("acc", lambda x: x + F.lit(1)), F.col("p")
                ).alias("acc"),
            )
            .filter(F.size("acc") > 0)
        )
    return acc.select("doc_id", F.size("acc").cast("int").alias("phrase_tf"))


def phrase_topk(
    spark: SparkSession, store: IndexStore, phrase: str, k: int
) -> DataFrame:
    """Top-k docs for an exact phrase (phrase_tf desc, doc_id asc) off
    the index's positions table. Requires store_positions=True at build
    time."""
    cfg = store.get_config()
    if not cfg.store_positions:
        raise ValueError(
            "index was built without positions (IndexConfig.store_positions)"
        )
    terms = [t for t in _phrase_terms(phrase, cfg.tokenizer)]
    if not terms:
        return spark.createDataFrame([], "doc_id long, phrase_tf int")
    pos = spark.read.parquet(store.path("positions"))
    return (
        phrase_match_positions(pos, terms)
        .orderBy(F.desc("phrase_tf"), F.asc("doc_id"))
        .limit(k)
    )


def _phrase_terms(phrase: str, tokenizer: str) -> list[str]:
    """Phrase tokens IN ORDER (query_terms sorts+dedups — wrong here)."""
    from tangent_spark.functions.tokenize import tokenize_porter, tokenize_simple

    return tokenize_porter(phrase) if tokenizer == "porter" else tokenize_simple(phrase)
