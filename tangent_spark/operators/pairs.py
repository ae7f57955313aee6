"""Spark-side formula operators: pages -> expressions -> pair-tuple terms.

This is the distributed shape of the reference's indexing chain
(index.py:94-127 -> mathindex.cpp:322-369): extract <math> blocks,
parse to SLT strings, dedup per document with positions (P4,
math_extractor.py:201-211), expand unique expressions to symbol-pair
tuples (T7, mathindexmid.h:34-36). Everything tuple-related runs in
vectorized pandas UDFs over Arrow batches; no per-row Python UDFs.
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.operators.slt import mathml_to_slt, pairs, parse_slt
from tangent_spark.sources.extract import extract_math

# terms are "fr<US>to<US>rel" — loc is NOT part of the index vocabulary
# (the C++ lexicon keys tokentuple{fr,to,rel}, mathindexbase.h:82-94)
TERM_SEP = "\x1f"

EXPRS_SCHEMA = "doc_id long, slt string, positions array<int>, n_instances int"


def exprs_df(pages: DataFrame, id_col: str = "doc_id", html_col: str = "html") -> DataFrame:
    """Pages -> one row per unique expression per document:
    (doc_id, slt, positions, n_instances). Unparseable math is dropped
    (reference counts those as conversion failures)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, html in zip(pdf[id_col], pdf[html_col]):
                seen: dict[str, List[int]] = {}
                for pos, block in enumerate(extract_math(html)):
                    slt = mathml_to_slt(block)
                    if slt:
                        seen.setdefault(slt, []).append(pos)
                for slt, positions in seen.items():
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "slt": slt,
                            "positions": positions,
                            "n_instances": len(positions),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "slt", "positions", "n_instances"]
            )

    from tangent_spark.functions.util import ensure_parallelism

    return ensure_parallelism(pages.select(id_col, html_col)).mapInPandas(
        extract, schema=EXPRS_SCHEMA
    )


TUPLES_SCHEMA = "slt string, fr string, to string, rel string, cnt int"


def expr_tuples_df(unique_exprs: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Unique expressions -> per-expression tuple multiset
    (slt, fr, to, rel, cnt). Input must already be deduped on slt (P5:
    postings are per unique expression, mathindex.cpp:339-342)."""
    window, eol, max_len = cfg.window, cfg.eol_mode, cfg.max_pair_len

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for slt in pdf["slt"]:
                tree = parse_slt(slt)
                if tree is None:
                    continue
                counts: dict[tuple, int] = {}
                for fr, to, rel, _loc in pairs(tree, window, eol, max_pair_len=max_len):
                    counts[(fr, to, rel)] = counts.get((fr, to, rel), 0) + 1
                for (fr, to, rel), cnt in counts.items():
                    rows.append(
                        {"slt": slt, "fr": fr, "to": to, "rel": rel, "cnt": cnt}
                    )
            yield pd.DataFrame(rows, columns=["slt", "fr", "to", "rel", "cnt"])

    return unique_exprs.select("slt").mapInPandas(expand, schema=TUPLES_SCHEMA)


def formula_terms_df(
    pages: DataFrame, cfg: IndexConfig, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Doc-level formula terms for the unified BM25 index:
    (doc_id, term, tf, dl) where term = fr\\x1fto\\x1frel,
    tf = sum over expressions of (per-expr tuple count x instances),
    dl = the document's total formula-tuple count (math-field length;
    BM25F-style per-field normalization — word terms carry the word
    field's dl)."""
    exprs = exprs_df(pages, id_col, html_col)
    tuples = expr_tuples_df(exprs.select("slt").distinct(), cfg)
    per_doc = (
        exprs.join(tuples, "slt")
        .withColumn("occ", F.col("cnt") * F.col("n_instances"))
        .groupBy(
            "doc_id",
            F.concat_ws(TERM_SEP, "fr", "to", "rel").alias("term"),
        )
        .agg(F.sum("occ").cast("int").alias("tf"))
    )
    dl = per_doc.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return per_doc.join(dl, "doc_id").select("doc_id", "term", "tf", "dl")
