"""Hybrid lexical + vector retrieval fused by Reciprocal Rank Fusion.

The reference engine combines math and text evidence by reranking one
candidate list (ranking/query.py R12, ranking/mathdocs.py); the modern
fulltext-engine equivalent for *heterogeneous* retrievers — a BM25 leg
and an embedding-ANN leg whose scores live on incomparable scales — is
Reciprocal Rank Fusion (Cormack/Clarke/Buettcher SIGIR'09; the
Elasticsearch 8.8 `rrf` retriever and OpenSearch hybrid query):

    score(d) = sum over legs L of  1 / (rrf_k + rank_L(d))

with rank starting at 1 inside each leg and documents absent from a
leg contributing nothing. Rank-based fusion needs no score calibration
between BM25 and cosine, which is exactly why the engines standardised
on it.

Scale notes (100 TB): each leg is already a bounded top-n — the
lexical leg through block-max WAND (plans/search.py), the vector leg
through the IVF probe join (plans/ann.py) — so fusion touches at most
`n_legs x n_per_leg` rows regardless of corpus size. The rank windows
and the fused aggregate therefore run on driver-scale row counts by
construction; nothing here shuffles corpus-sized data.

Determinism: both legs rank on scores pre-rounded to 4 decimals with
doc-id tie-breaks, so knife-edge ulps cannot reorder legs between
engines; the fused score is a sum of at most `n_legs` exact reciprocals
of small integers (addition of two doubles is commutative), so the
fused order is reproducible bit-for-bit.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tangent_spark.sources.store import IndexStore

DEFAULT_RRF_K = 60  # the constant from the RRF paper; ES/OpenSearch default


def rrf_fuse(
    legs: Sequence[tuple[str, DataFrame]],
    k: int = 10,
    rrf_k: int = DEFAULT_RRF_K,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Fuse bounded (id, score) legs by RRF.

    `legs` is [(name, df), ...]; every df MUST already be a bounded
    top-n result (the caller's k-limit is the contract — this function
    ranks each leg with a global window, which is only sane on bounded
    input). Returns (doc_id, score, <name>_rank ... one per leg) with
    score = the RRF sum rounded to 6 decimals and <name>_rank = the
    1-based rank inside that leg (0 when the doc missed the leg),
    ordered by (score desc, doc_id asc), limited to k.
    """
    if not legs:
        raise ValueError("rrf_fuse needs at least one leg")
    names = [n for n, _ in legs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate leg names: {names}")
    ranked = []
    for name, df in legs:
        w = Window.orderBy(F.desc(score_col), F.asc(id_col))
        ranked.append(
            df.select(
                F.col(id_col).cast("long").alias("doc_id"),
                F.lit(name).alias("leg"),
                F.row_number().over(w).alias("leg_rank"),
            )
        )
    union = ranked[0]
    for r in ranked[1:]:
        union = union.unionByName(r)
    aggs = [
        F.round(
            F.sum(F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("leg_rank"))), 6
        ).alias("score")
    ]
    for name in names:
        aggs.append(
            F.coalesce(
                F.max(F.when(F.col("leg") == name, F.col("leg_rank"))),
                F.lit(0),
            )
            .cast("int")
            .alias(f"{name}_rank")
        )
    return (
        union.groupBy("doc_id")
        .agg(*aggs)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def hybrid_topk(
    spark: SparkSession,
    store: IndexStore,
    ann_store: IndexStore,
    query: str,
    probe_vec: list[float],
    k: int = 10,
    n_per_leg: int = 50,
    rrf_k: int = DEFAULT_RRF_K,
    n_probe: int = 8,
    searcher=None,
    where: str | None = None,
) -> DataFrame:
    """Top-k hybrid search off the real stores: the lexical leg is
    block-max-WAND BM25 over `store` (or `searcher`'s warm cache when
    given), the vector leg is IVF ANN over `ann_store` for `probe_vec`
    (ann_vectors ids must share the word index's doc-id space), fused
    by RRF. Returns (doc_id, score, lex_rank, vec_rank).

    `where` (a SQL predicate over the word index's meta_cols) applies
    to BOTH legs — the ES 8 rrf-retriever shape where the query leg
    carries a `filter` clause and the knn leg carries the same
    predicate in its own `filter`: the lexical leg routes through
    filtered_topk, the vector leg through ann_topk_ivf_filtered with
    the word index's docs dictionary as the metadata side, so the two
    legs agree on the allowed doc set and fusion never surfaces a
    filtered-out document."""
    from tangent_spark.plans.ann import ann_topk_ivf, ann_topk_ivf_filtered
    from tangent_spark.plans.boolean import filtered_topk
    from tangent_spark.plans.search import bm25_topk_wand

    if where is not None:
        if searcher is not None:
            lex = searcher.filtered(query, n_per_leg, where)
        else:
            lex = filtered_topk(spark, store, query, n_per_leg, where)
    elif searcher is not None:
        lex = searcher.topk(query, n_per_leg)
    else:
        lex = bm25_topk_wand(spark, store, query, n_per_leg)
    # rank on 4-decimal scores (both legs) so fused order is engine-stable
    lex = lex.select("doc_id", F.round("score", 4).alias("score"))
    probe = spark.createDataFrame([(0, [float(x) for x in probe_vec])],
                                  "query_id long, q array<double>")
    if where is not None:
        meta = store.read(spark, "docs")
        ann = ann_topk_ivf_filtered(
            spark, ann_store, probe, meta, where, k=n_per_leg,
            n_probe=n_probe, meta_id_col="doc_id",
        )
    else:
        ann = ann_topk_ivf(spark, ann_store, probe, k=n_per_leg, n_probe=n_probe)
    vec = ann.select(
        F.col("vec_id").alias("doc_id"), F.round("cos", 4).alias("score")
    )
    return rrf_fuse([("lex", lex), ("vec", vec)], k=k, rrf_k=rrf_k)
