"""Incremental index: N appended batches must answer queries EXACTLY
like a from-scratch batch build over the union (docs, scores, order),
and replayed batches must be no-ops."""

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.plans.indexer import build_index, verify_index
from tangent_spark.plans.search import bm25_topk_wand
from tangent_spark.sources.store import IndexStore
from tangent_spark.streaming.incremental import append_batch, incremental_index_stream

CFG = IndexConfig(n_shards=4, block_size=16)
QUERIES = ["matrix theorem proof", "spark shuffle data", "the of and"]


@pytest.fixture(scope="module")
def all_pages(spark):
    return pages_with_doc_ids(generate_pages(spark, 90, partitions=4)).persist()


def test_incremental_equals_batch(spark, all_pages, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("inc"))
    # batch build over first 60 docs
    first = all_pages.filter(F.col("doc_id") < 60)
    second = all_pages.filter(F.col("doc_id") >= 60).drop("doc_id")
    inc_store = build_index(spark, first, f"{base}/inc", CFG, url_col="url")
    counters = append_batch(spark, inc_store, second, batch_id=1)
    assert counters["new_docs"] == 30
    verify_index(spark, inc_store)

    full_store = build_index(spark, all_pages, f"{base}/full", CFG, url_col="url")
    for q in QUERIES:
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk_wand(spark, inc_store, q, 10).collect()
        ]
        want = [
            (r["doc_id"], round(r["score"], 9))
            for r in bm25_topk_wand(spark, full_store, q, 10).collect()
        ]
        assert got == want, q

    # replay: same batch id is a no-op (effectively-once)
    before = spark.read.parquet(inc_store.path("postings")).count()
    again = append_batch(spark, inc_store, second, batch_id=1)
    assert again == counters
    assert spark.read.parquet(inc_store.path("postings")).count() == before

    # same urls under a NEW batch id: anti-join drops them all
    c3 = append_batch(spark, inc_store, second, batch_id=2)
    assert c3["new_docs"] == 0


def test_streaming_driver(spark, all_pages, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    first = all_pages.filter(F.col("doc_id") < 50)
    store = build_index(spark, first, f"{base}/idx", CFG, url_col="url")
    n0 = spark.read.parquet(store.path("docs")).count()
    # drop two new chunks into the watched dir
    incoming = f"{base}/incoming"
    all_pages.filter((F.col("doc_id") >= 50) & (F.col("doc_id") < 70)).drop(
        "doc_id"
    ).write.mode("append").parquet(incoming)
    all_pages.filter(F.col("doc_id") >= 70).drop("doc_id").write.mode("append").parquet(
        incoming
    )
    q = incremental_index_stream(spark, store, incoming, f"{base}/ckpt")
    q.awaitTermination(300)
    assert spark.read.parquet(store.path("docs")).count() == 90
    assert n0 == 50
    res = bm25_topk_wand(spark, store, "matrix theorem", 5).collect()
    assert len(res) == 5
