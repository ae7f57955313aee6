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

Scale shape (the Lucene conjunction discipline, Spark-first): when the
query has must terms, the RAREST must term (by df — a <=|must|-row
lexicon lookup) seeds the candidate set, and every other term's
postings are decoded RESTRICTED to those candidates — whole blocks
whose [first_doc, next_first) range misses every candidate are skipped
using the block-max metadata alone, without decompression. A query
like `the +rarename` therefore never decodes (let alone shuffles) the
head term's posting list; data moved is proportional to the CANDIDATE
set, not the matched lists:

  seed = argmin_{t in must} df(t)
  cand = decode(seed)                          (per-shard, no shuffle)
  rows = cogroup(postings[q-terms minus seed], cand) BY shard
           -> block-skip decode, candidates only  (one small shuffle of
              q-term rows + candidate ids, both query-bounded)
    -> ONE groupBy(doc) aggregate computing, together:
         BM25 sum over positive terms,
         must-coverage count,
         must-not flag
    -> filter(coverage == |must|-1 AND NOT flagged)   (seed containment
       is implied by construction)
    <- semi/anti-join phrase sets (positions-table fold, plans/phrase.py;
       runs on the already-restricted aggregate)
    -> TakeOrderedAndProject(k)

The decoded subtree is evaluated exactly once (round-3 review finding:
the previous plan re-evaluated it up to 3x across join branches) —
membership and scoring now ride the same rows through a single
aggregate. Queries with no must terms decode the positive + must-not
terms once (must-not membership decodes doc-id blocks only, skipping
the tf/dl blobs) and apply the same single-aggregate restriction.

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

_DECODE_SCHEMA = "shard int, term string, doc_id long, tf int, dl long"
_MAXDOC = np.int64(2**62)


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
    contributes each token to the same bucket. An UNBALANCED quote
    (`he said "hello`) falls back to plain-term treatment of the
    stray-quoted token instead of silently dropping it."""
    from tangent_spark.functions.tokenize import tokenize_porter, tokenize_simple

    tok = tokenize_porter if cfg.tokenizer == "porter" else tokenize_simple
    out = BooleanQuery()
    for mod, raw, quoted in _CLAUSE.findall(query):
        is_phrase = raw.startswith('"') and raw.endswith('"') and len(raw) >= 2
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


def _decode_row_blocks(row, block_idx, score: bool, cand_ids=None):
    """Decode the given blocks of one compressed postings row; when
    `cand_ids` (sorted int64) is given, keep only candidate postings.
    Membership-only rows (score=False) decode just the doc-id blob.
    Returns (ids, tfs, dls) int64/int32/int64 arrays."""
    from tangent_spark.codec import decode_block

    counts = row["counts"]
    d_cuts = np.asarray(row["d_cuts"])
    ids_parts, tf_parts, dl_parts = [], [], []
    t_cuts = np.asarray(row["t_cuts"]) if score else None
    l_cuts = np.asarray(row["l_cuts"]) if score else None
    for bi in block_idx:
        cnt = int(counts[bi])
        ids = decode_block(row["docs_blob"], d_cuts, bi, cnt, True).astype(np.int64)
        if cand_ids is not None:
            idx = np.searchsorted(cand_ids, ids)
            idx_c = np.minimum(idx, cand_ids.size - 1)
            mask = cand_ids[idx_c] == ids
            if not mask.any():
                continue
        else:
            mask = None
        if score:
            tfs = decode_block(row["tfs_blob"], t_cuts, bi, cnt, False).astype(np.int64)
            dls = decode_block(row["dls_blob"], l_cuts, bi, cnt, False).astype(np.int64)
        else:
            tfs = np.zeros(ids.size, dtype=np.int64)
            dls = np.ones(ids.size, dtype=np.int64)
        if mask is not None:
            ids, tfs, dls = ids[mask], tfs[mask], dls[mask]
        ids_parts.append(ids)
        tf_parts.append(tfs)
        dl_parts.append(dls)
    if not ids_parts:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    return (
        np.concatenate(ids_parts),
        np.concatenate(tf_parts),
        np.concatenate(dl_parts),
    )


def _rows_frame(shard, term, ids, tfs, dls) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "shard": np.full(ids.size, shard, dtype=np.int32),
            "term": term,
            "doc_id": ids,
            "tf": tfs.astype(np.int32),
            "dl": dls,
        }
    )


def _empty_rows() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "shard": pd.Series(dtype="int32"),
            "term": pd.Series(dtype="object"),
            "doc_id": pd.Series(dtype="int64"),
            "tf": pd.Series(dtype="int32"),
            "dl": pd.Series(dtype="int64"),
        }
    )


def decoded_postings(
    postings: DataFrame,
    terms: list[str],
    score_terms: set[str] | None = None,
    counter=None,
) -> DataFrame:
    """Decode the given terms' compressed postings back to
    (shard, term, doc_id, tf, dl) rows. The term filter is pushed to the
    parquet scan (term-sorted files -> row-group pruning); decode is a
    per-partition pandas pass, no shuffle. Terms OUTSIDE `score_terms`
    (membership-only, e.g. must-not terms) decode only the doc-id blob
    and emit tf=0/dl=1. `counter` (optional Spark accumulator) receives
    the number of doc-id blocks decoded."""
    score_set = set(terms) if score_terms is None else set(score_terms)

    def decode(batches):
        for pdf in batches:
            frames = []
            decoded = 0
            for _, row in pdf.iterrows():
                n_blocks = len(row["counts"])
                ids, tfs, dls = _decode_row_blocks(
                    row, range(n_blocks), score=row["term"] in score_set
                )
                decoded += n_blocks
                frames.append(_rows_frame(int(row["shard"]), row["term"], ids, tfs, dls))
            if counter is not None and decoded:
                counter.add(decoded)
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return postings.filter(F.col("term").isin(terms)).mapInPandas(
        decode, schema=_DECODE_SCHEMA
    )


def _restricted_decode(
    postings: DataFrame,
    terms: list[str],
    cand: DataFrame,
    score_terms: set[str],
    counter=None,
) -> DataFrame:
    """Decode `terms`' postings restricted to the candidate docs, and
    pass the candidate rows themselves through (they are the seed
    term's already-decoded postings). Runs as ONE cogroup by shard —
    the only shuffle moves the query-term postings rows plus the
    candidate ids, both bounded by the seed term's df, never a head
    term's list. Blocks whose doc range contains no candidate are
    skipped from metadata alone (no decompression)."""
    pf = postings.filter(F.col("term").isin(terms)) if terms else None

    def kernel(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        frames = []
        if len(right):
            frames.append(right[["shard", "term", "doc_id", "tf", "dl"]])
            cand_ids = np.unique(right["doc_id"].to_numpy(np.int64))
        else:
            cand_ids = np.zeros(0, dtype=np.int64)
        decoded = 0
        if cand_ids.size and len(left):
            for _, row in left.iterrows():
                firsts = np.asarray(row["first_docs"], dtype=np.int64)
                his = np.empty_like(firsts)
                his[:-1] = firsts[1:] - 1
                his[-1] = _MAXDOC
                lo = np.searchsorted(cand_ids, firsts, side="left")
                hi = np.searchsorted(cand_ids, his, side="right")
                needed = np.flatnonzero(hi > lo)
                if not needed.size:
                    continue
                ids, tfs, dls = _decode_row_blocks(
                    row, needed, score=row["term"] in score_terms, cand_ids=cand_ids
                )
                decoded += int(needed.size)
                if ids.size:
                    frames.append(
                        _rows_frame(int(row["shard"]), row["term"], ids, tfs, dls)
                    )
        if counter is not None and decoded:
            counter.add(decoded)
        if not frames:
            return _empty_rows()
        return pd.concat(frames, ignore_index=True)

    if pf is None:
        return cand
    return (
        pf.groupby("shard")
        .cogroup(cand.groupby("shard"))
        .applyInPandas(kernel, schema=_DECODE_SCHEMA)
    )


def boolean_topk(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    k: int,
    decode_counter=None,
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
        decode_counter=decode_counter,
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
    positions: DataFrame | None = None,
    decode_counter=None,
    df_lookup=None,
) -> DataFrame:
    """Shared boolean plan over any postings/term_stats DataFrames —
    cold parquet reads (boolean_topk) or a Searcher's cached, shard-
    partitioned copies (Searcher.boolean — same plan, zero file I/O for
    postings/positions). `df_lookup(terms) -> {term: df}` lets the warm
    path answer the seed-selection lookup from its resident lexicon;
    the cold path does one <=|must|-row filtered collect."""
    cfg = store.get_config()
    q = parse_boolean_query(query, cfg)
    qts = q.positive_terms
    if not qts:
        raise ValueError("boolean query needs at least one positive clause")
    if (q.phrases or q.not_phrases) and not cfg.store_positions:
        raise ValueError(
            "phrase clauses need an index built with store_positions=True"
        )

    must = sorted(set(q.must))
    must_not = sorted(set(q.must_not))
    score_set = set(qts)

    if must:
        if df_lookup is not None:
            m_dfs = df_lookup(must)
        else:
            m_dfs = {
                r["term"]: int(r["df"])
                for r in term_stats.filter(F.col("term").isin(must)).collect()
            }
        if len(m_dfs) < len(must):
            # a must term absent from the index matches nothing
            return spark.createDataFrame([], "doc_id long, score double")
        seed = min(must, key=lambda t: (m_dfs[t], t))
        rest = sorted((score_set | set(must_not)) - {seed})
        cand = decoded_postings(postings, [seed], counter=decode_counter)
        rows = _restricted_decode(
            postings, rest, cand, score_set, counter=decode_counter
        )
        must_check = [t for t in must if t != seed]
    else:
        rows = decoded_postings(
            postings,
            sorted(score_set | set(must_not)),
            score_terms=score_set,
            counter=decode_counter,
        )
        must_check = []

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
    # ONE aggregate computes score + must coverage + must-not flag —
    # membership never pays a second decode or a pre-shuffle of its own.
    aggs = [F.coalesce(F.sum("part"), F.lit(0.0)).alias("score")]
    aggs.append(
        (
            F.countDistinct(F.when(F.col("term").isin(must_check), F.col("term")))
            if must_check
            else F.max(F.lit(0))
        ).alias("_nm")
    )
    aggs.append(
        (
            F.max(F.when(F.col("term").isin(must_not), 1).otherwise(0))
            if must_not
            else F.max(F.lit(0))
        ).alias("_deny")
    )
    scored = (
        rows.join(F.broadcast(qstats), "term", "left")
        .withColumn(
            "part",
            F.col("idf")
            * F.col("tf") * (cfg.k1 + 1.0)
            / (F.col("tf") + cfg.k1 * (1.0 - cfg.b + cfg.b * F.col("dl") / F.lit(avgdl))),
        )
        .groupBy("doc_id")
        .agg(*aggs)
        .filter((F.col("_nm") == len(must_check)) & (F.col("_deny") == 0))
        .select("doc_id", "score")
    )
    if q.phrases or q.not_phrases:
        from tangent_spark.plans.phrase import phrase_match_positions

        pos = (
            positions
            if positions is not None
            else spark.read.parquet(store.path("positions"))
        )
        for p in q.phrases:
            scored = scored.join(
                phrase_match_positions(pos, p).select("doc_id"), "doc_id", "left_semi"
            )
        for p in q.not_phrases:
            scored = scored.join(
                phrase_match_positions(pos, p).select("doc_id"), "doc_id", "left_anti"
            )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
