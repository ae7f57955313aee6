"""Boolean query language over the BM25 index: `+must -not "a phrase"`.

The reference exposed boolean/phrase structure through its Solr text
backend (reference text/Query.py builds Solr queries; Solr's own parser
supplies +/-/"" semantics); here the same surface is served off our own
IndexStore, Spark-first:

  grammar      bare word   -> SHOULD  (scores, not required)
               +word       -> MUST    (required, scores)
               -word       -> MUST_NOT(excluded, never scores)
               "w1 w2 .."  -> PHRASE  (required consecutive run; terms
                                       also score; -"..." excludes)

Semantics follow the Lucene discipline: a query needs at least one
positive clause; ranking is plain BM25 over the positive terms
(should + must + positive-phrase terms), restricted to documents that
contain EVERY must term and every positive phrase, minus documents
containing any must-not term or phrase. Ties: score desc, doc_id asc.

Scale shape: conjunctive queries need doc-level membership, so this
plan decodes the matched terms' postings (data moved is proportional to
the MATCHED posting lists, never the corpus) and lets Catalyst compose
the filters:

  postings(filtered to q-terms, row-group pruned)
    -> mapInPandas decode                (per-shard, no shuffle)
    -> groupBy(doc) BM25 sum             (one shuffle on doc_id)
    <- semi-join must-set  (groupBy doc having n_distinct == |must|)
    <- anti-join not-set   (distinct docs of must-not terms)
    <- semi/anti-join phrase sets        (positions-table fold,
                                          plans/phrase.py)
    -> TakeOrderedAndProject(k)

Block-max WAND (plans/search.py) stays the pure-disjunctive fast path;
conjunctive scoring decodes what it must and nothing else.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.sources.store import IndexStore

_CLAUSE = re.compile(r'([+-]?)("([^"]*)"|\S+)')


@dataclass
class BooleanQuery:
    should: list = field(default_factory=list)      # [term]
    must: list = field(default_factory=list)        # [term]
    must_not: list = field(default_factory=list)    # [term]
    phrases: list = field(default_factory=list)     # [[term, ...]] required
    not_phrases: list = field(default_factory=list)  # [[term, ...]] excluded

    @property
    def positive_terms(self) -> list:
        """Distinct scoring terms, sorted (should + must + phrase terms)."""
        return sorted(
            set(self.should) | set(self.must) | {t for p in self.phrases for t in p}
        )


def parse_boolean_query(query: str, cfg: IndexConfig) -> BooleanQuery:
    """Parse the +/-/"" surface; each clause is run through the index's
    tokenizer so query terms hit the same stemmed vocabulary the index
    stores. A quoted single word degrades to a plain must/not/should
    term; a multi-word unquoted clause (tokenizer split, e.g. 'a-b')
    contributes each token to the same bucket."""
    from tangent_spark.functions.tokenize import tokenize_porter, tokenize_simple

    tok = tokenize_porter if cfg.tokenizer == "porter" else tokenize_simple
    out = BooleanQuery()
    for mod, raw, quoted in _CLAUSE.findall(query):
        is_phrase = raw.startswith('"')
        terms = tok(quoted if is_phrase else raw)
        if not terms:
            continue
        if is_phrase and len(terms) > 1:
            (out.not_phrases if mod == "-" else out.phrases).append(terms)
        elif mod == "-":
            out.must_not.extend(terms)
        elif mod == "+":
            out.must.extend(terms)
        else:
            out.should.extend(terms)
    return out


def decoded_postings(postings: DataFrame, terms: list[str]) -> DataFrame:
    """Decode the given terms' compressed postings back to
    (shard, term, doc_id, tf, dl) rows. The term filter is pushed to the
    parquet scan (term-sorted files -> row-group pruning); decode is a
    per-partition pandas pass, no shuffle."""
    from tangent_spark.codec import decode_posting_list

    def decode(batches):
        for pdf in batches:
            frames = []
            for _, row in pdf.iterrows():
                ids, tfs, dls = decode_posting_list(
                    row["docs_blob"], row["tfs_blob"], row["dls_blob"],
                    np.asarray(row["d_cuts"]), np.asarray(row["t_cuts"]),
                    np.asarray(row["l_cuts"]), row["counts"],
                )
                frames.append(pd.DataFrame({
                    "shard": np.full(ids.size, row["shard"], dtype=np.int32),
                    "term": row["term"],
                    "doc_id": ids.astype(np.int64),
                    "tf": tfs.astype(np.int32),
                    "dl": dls.astype(np.int64),
                }))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return postings.filter(F.col("term").isin(terms)).mapInPandas(
        decode, schema="shard int, term string, doc_id long, tf int, dl long"
    )


def boolean_topk(
    spark: SparkSession, store: IndexStore, query: str, k: int
) -> DataFrame:
    """Top-k (doc_id, score) for a boolean query string off the index
    (cold path: postings/stats read from parquet per query).

    Raises ValueError if the query has no positive clause, or if it
    carries a phrase but the index was built without positions."""
    cs = store.read(spark, "corpus_stats").collect()[0]
    return _boolean_plan(
        spark,
        store,
        query,
        k,
        postings=store.read(spark, "postings"),
        term_stats=store.read(spark, "term_stats"),
        n_docs=int(cs["n_docs"]),
        avgdl=float(cs["avgdl"]) if cs["avgdl"] else 1.0,
    )


def _boolean_plan(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    k: int,
    postings: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
) -> DataFrame:
    """Shared boolean plan over any postings/term_stats DataFrames —
    cold parquet reads (boolean_topk) or a Searcher's cached, shard-
    partitioned copies (Searcher.boolean — same plan, zero file I/O
    for postings)."""
    cfg = store.get_config()
    q = parse_boolean_query(query, cfg)
    qts = q.positive_terms
    if not qts:
        raise ValueError("boolean query needs at least one positive clause")
    if (q.phrases or q.not_phrases) and not cfg.store_positions:
        raise ValueError(
            "phrase clauses need an index built with store_positions=True"
        )

    all_terms = sorted(set(qts) | set(q.must_not))
    decoded = decoded_postings(postings, all_terms)

    qstats = (
        term_stats.filter(F.col("term").isin(qts))
        .select(
            "term",
            F.log(
                F.lit(1.0)
                + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
        )
    )
    scored = (
        decoded.filter(F.col("term").isin(qts))
        .join(F.broadcast(qstats), "term")
        .withColumn(
            "part",
            F.col("idf")
            * F.col("tf") * (cfg.k1 + 1.0)
            / (F.col("tf") + cfg.k1 * (1.0 - cfg.b + cfg.b * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score"))
    )

    must = sorted(set(q.must))
    if must:
        ok = (
            decoded.filter(F.col("term").isin(must))
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("_n"))
            .filter(F.col("_n") == len(must))
            .select("doc_id")
        )
        scored = scored.join(ok, "doc_id", "left_semi")
    if q.must_not:
        deny = (
            decoded.filter(F.col("term").isin(sorted(set(q.must_not))))
            .select("doc_id")
            .distinct()
        )
        scored = scored.join(deny, "doc_id", "left_anti")
    if q.phrases or q.not_phrases:
        from tangent_spark.plans.phrase import phrase_match_positions

        pos = spark.read.parquet(store.path("positions"))
        for p in q.phrases:
            scored = scored.join(
                phrase_match_positions(pos, p).select("doc_id"), "doc_id", "left_semi"
            )
        for p in q.not_phrases:
            scored = scored.join(
                phrase_match_positions(pos, p).select("doc_id"), "doc_id", "left_anti"
            )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
