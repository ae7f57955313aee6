"""Sort-by-field results (Solr `sort=<field> asc|desc`, Lucene
TopFieldCollector): the query selects the match set, a docs-dictionary
metadata column orders it — newest-first web results being the
canonical use. The reference served this through Solr's sort param
(SURVEY S12).

Plan shape: per shard, the match set (union of the query terms'
postings — no scoring, sort queries need no BM25) maps through the
broadcast docs-dictionary (doc_id -> value) arrays and the kernel
emits only the shard's top-k rows under (value, doc_id) order —
k rows per shard, never the match set. The global tail merges
shards x k typed rows JVM-side. Without an index-sorted layout
(Lucene's indexSort early-termination) every matched posting must
still be decoded once — the standard cost; the bound is on data
MOVED, not data read.

Types: the value column keeps its parquet type end to end (pandas
dtype inside the kernel, the field's own Spark type in the output
schema), so timestamps order as timestamps, not strings. Docs absent
from the map or with null values are excluded (Lucene sortMissingLast
semantics are a caller-side choice we do not emulate — documented
divergence).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tangent_spark.sources.store import IndexStore


def _sorted_kernel(k: int, ascending: bool, ids: np.ndarray, vals, deleted):
    """Per-shard: union of query-term postings -> doc->value map ->
    top-k (doc_id, val) under (value asc|desc, doc_id asc)."""
    from tangent_spark.codec import decode_posting_list
    from tangent_spark.plans.search import _deleted_mask

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        all_docs = []
        for ri in range(len(pdf)):
            row = pdf.iloc[ri]
            d, _, _ = decode_posting_list(
                row["docs_blob"], row["tfs_blob"], row["dls_blob"],
                np.asarray(row["d_cuts"]), np.asarray(row["t_cuts"]),
                np.asarray(row["l_cuts"]), row["counts"],
            )
            d = d.astype(np.int64)
            dm = _deleted_mask(d, deleted)
            if dm is not None:
                d = d[dm]
            all_docs.append(d)
        if not all_docs:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "val": pd.Series(vals[:0])})
        uids = np.unique(np.concatenate(all_docs))
        pos = np.minimum(np.searchsorted(ids, uids), max(ids.size - 1, 0))
        ok = (ids[pos] == uids) if ids.size else np.zeros(uids.size, bool)
        df = pd.DataFrame({"doc_id": uids[ok], "val": pd.Series(vals[pos[ok]])})
        df = df[pd.notna(df["val"])]
        return df.sort_values(
            ["val", "doc_id"], ascending=[ascending, True], kind="mergesort"
        ).head(k)

    return kernel


def sorted_topk(
    spark: SparkSession,
    store: IndexStore,
    query: str,
    by: str,
    k: int = 10,
    ascending: bool = False,
    max_driver_docs: int = 1_000_000,
) -> DataFrame:
    """Top-k matching docs ordered by metadata column `by` (in
    IndexConfig.meta_cols) instead of relevance — (doc_id, <by>) rows
    in (value asc|desc, doc_id asc) order. Matching = contains at
    least one analyzed query term (the plain BM25 match set)."""
    from tangent_spark.plans.boolean import _facet_map
    from tangent_spark.plans.search import load_deleted_ids, query_terms

    cfg = store.get_config()
    if by not in cfg.meta_cols:
        raise ValueError(
            f"sort field {by!r} not in the index's meta_cols {cfg.meta_cols}"
        )
    docs = store.read(spark, "docs")
    out_schema = f"doc_id long, val {docs.schema[by].dataType.simpleString()}"
    qts = query_terms(query, cfg.tokenizer)
    if not qts:
        return spark.createDataFrame([], out_schema).withColumnRenamed("val", by)
    fmap = _facet_map(docs, by, max_driver_docs)
    if fmap is None:
        raise ValueError(
            f"docs dictionary exceeds max_driver_docs={max_driver_docs}; "
            "raise the cap to broadcast the doc->value map"
        )
    kern = _sorted_kernel(
        k, ascending, fmap[0], fmap[1], load_deleted_ids(spark, store)
    )
    local = (
        store.read(spark, "postings")
        .filter(F.col("term").isin(qts))
        .groupBy("shard")
        .applyInPandas(lambda pdf: kern(pdf), schema=out_schema)
    )
    return (
        local.orderBy(
            F.asc("val") if ascending else F.desc("val"), F.asc("doc_id")
        )
        .limit(k)
        .withColumnRenamed("val", by)
    )
