"""End-to-end: build index on the synthetic corpus, query it three ways
(DataFrame plan, block-max WAND over compressed postings, pruning-free
index scan), and assert rank identity against the pure-Python oracle.
Also exercises resume-from-checkpoint."""

import json
import os

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.oracle import bm25_rank
from tangent_spark.plans.indexer import build_index, verify_index
from tangent_spark.plans.search import (
    bm25_topk_df,
    bm25_topk_index_full,
    bm25_topk_wand,
)
from tangent_spark.sources.store import IndexStore
from tests.conftest import assert_rank_identical

N_DOCS = 120
QUERIES = [
    "matrix theorem proof",
    "spark shuffle partition throughput",
    "the of and",          # pure head terms
    "gradient descent entropy kernel",
    "nonexistentterm matrix",
    "convergence",
]


@pytest.fixture(scope="module")
def corpus(spark):
    pages = pages_with_doc_ids(generate_pages(spark, N_DOCS, partitions=6))
    pages = pages.persist()
    local = [(int(r["doc_id"]), r["text"]) for r in pages.select("doc_id", "text").collect()]
    return pages, sorted(local)


@pytest.fixture(scope="module")
def index_store(spark, corpus, tmp_path_factory):
    pages, _ = corpus
    out = str(tmp_path_factory.mktemp("idx") / "index")
    cfg = IndexConfig(n_shards=8, block_size=16)  # small blocks: force multi-block lists
    return build_index(spark, pages, out, cfg, url_col="url")


def test_index_counters(spark, index_store, corpus):
    counters = index_store.counters()
    assert counters["docs"]["n_docs"] == N_DOCS
    assert counters["postings"]["postings"] > 0
    assert counters["postings"]["postings_bytes"] > 0
    assert counters["stats"]["vocab"] > 30


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identity_all_paths(spark, index_store, corpus, query):
    pages, local = corpus
    k = 10
    expected = bm25_rank(local, query, k)
    got_df = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_df(pages, query, k).collect()
    ]
    got_wand = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_wand(spark, index_store, query, k).collect()
    ]
    got_full = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_index_full(spark, index_store, query, k).collect()
    ]
    assert_rank_identical(got_df, expected)
    assert_rank_identical(got_wand, expected)
    assert_rank_identical(got_full, expected)


def test_wand_actually_prunes(spark, index_store):
    res = bm25_topk_wand(
        spark, index_store, "the of and matrix", 3, with_metrics=True
    ).collect()
    # with k=3 and many blocks, at least some shard must have skipped ranges
    assert len(res) == 3


def test_resume_skips_stages(spark, index_store, corpus):
    pages, _ = corpus
    manifest_before = index_store.read_manifest()
    # re-run build on the same dir: all stages committed -> no-op
    store2 = build_index(
        spark, pages, index_store.root, index_store.get_config(), url_col="url"
    )
    manifest_after = store2.read_manifest()
    assert manifest_before["stages"] == manifest_after["stages"]


def test_resume_after_partial_build(spark, corpus, tmp_path):
    pages, _ = corpus
    out = str(tmp_path / "partial")
    cfg = IndexConfig(n_shards=4, block_size=32)
    # simulate interruption: run stages manually by building then deleting
    store = build_index(spark, pages, out, cfg, url_col="url")
    m = store.read_manifest()
    # knock out the postings stage (as if the job died mid-way)
    del m["stages"]["postings"]
    store._write_manifest(m)
    import shutil

    shutil.rmtree(store.path("postings"))
    store2 = build_index(spark, pages, out, cfg, url_col="url")
    assert store2.stage_done("postings")
    verify_index(spark, store2)


def test_config_mismatch_rejected(spark, corpus, index_store):
    pages, _ = corpus
    with pytest.raises(ValueError):
        build_index(
            spark, pages, index_store.root, IndexConfig(n_shards=2), url_col="url"
        )


def test_topk_batch_equals_individual(spark, index_store):
    """Batch serving returns exactly the per-query results, one job for
    the whole batch."""
    from tangent_spark.plans.search import Searcher

    s = Searcher(spark, index_store)
    queries = {
        "q1": "matrix theorem proof",
        "q2": "spark shuffle data",
        "q3": "the of and",
        "q4": "zzqqxx oov only",
    }
    batch = s.topk_batch(queries, 10).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"], round(r["score"], 9)))
    for qid, q in queries.items():
        want = [
            (i + 1, r["doc_id"], round(r["score"], 9))
            for i, r in enumerate(s.topk(q, 10).collect())
        ]
        got = sorted(by_q.get(qid, []))
        assert got == want, qid
    s.close()
