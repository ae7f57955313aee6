"""Recency-boosted BM25 (plans/search.boosted_topk — Lucene
FunctionScoreQuery / Solr boost=recip): score x 1/(1 + age/half_life)
with weights in (0, 1] so block-max pruning stays exact. Rank identity
vs a pure-Python oracle that recomputes BM25 and the decay."""

import datetime

import pytest

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.oracle import bm25_rank
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.search import boosted_topk, bm25_topk_wand
from tests.conftest import assert_rank_identical

N = 120
NOW = datetime.datetime(2025, 6, 1)
Q = "matrix convergence theorem"


@pytest.fixture(scope="module")
def boost_setup(spark, tmp_path_factory):
    pages = pages_with_doc_ids(generate_pages(spark, N, partitions=6)).persist()
    out = str(tmp_path_factory.mktemp("boost") / "index")
    store = build_index(
        spark, pages, out,
        IndexConfig(n_shards=8, block_size=16, meta_cols=("warc_ts",)),
        url_col="url",
    )
    local = [
        (int(r["doc_id"]), r["text"], r["warc_ts"])
        for r in pages.select("doc_id", "text", "warc_ts").collect()
    ]
    return store, local


def boosted_oracle(local, query, k, now, half_life):
    scored = bm25_rank([(d, t) for d, t, _ in local], query, k=len(local))
    ts = {d: w for d, _, w in local}
    out = []
    for d, s in scored:
        age = max((now - ts[d].replace(tzinfo=None)).total_seconds() / 86400.0, 0.0)
        out.append((d, s / (1.0 + age / half_life)))
    return sorted(out, key=lambda x: (-x[1], x[0]))[:k]


@pytest.mark.parametrize("half_life", [7.0, 365.0])
def test_boosted_rank_identity(spark, boost_setup, half_life):
    store, local = boost_setup
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in boosted_topk(
            spark, store, Q, 15, "warc_ts", NOW, half_life_days=half_life
        ).collect()
    ]
    assert_rank_identical(got, boosted_oracle(local, Q, 15, NOW, half_life))


def test_now_before_corpus_equals_plain(spark, boost_setup):
    """now <= every timestamp -> every age clamps to 0 -> weight 1.0
    everywhere -> identical to plain BM25."""
    store, local = boost_setup
    past = datetime.datetime(1990, 1, 1)
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in boosted_topk(spark, store, Q, 10, "warc_ts", past).collect()
    ]
    want = [
        (int(r["doc_id"]), float(r["score"]))
        for r in bm25_topk_wand(spark, store, Q, 10).collect()
    ]
    assert_rank_identical(got, want)


def test_tiny_half_life_prefers_recent(spark, boost_setup):
    """With an aggressive decay the newest matching docs rise: the
    boosted top-1 must be at least as recent as the plain top-1 unless
    relevance already agreed."""
    store, local = boost_setup
    ts = {d: w for d, _, w in local}
    plain = bm25_topk_wand(spark, store, Q, 1).collect()[0]
    boosted = boosted_topk(
        spark, store, Q, 1, "warc_ts", NOW, half_life_days=0.5
    ).collect()[0]
    if int(boosted["doc_id"]) != int(plain["doc_id"]):
        assert ts[int(boosted["doc_id"])] > ts[int(plain["doc_id"])]


def test_boosted_after_tiles(spark, boost_setup):
    store, _ = boost_setup
    want = [
        (int(r["doc_id"]), float(r["score"]))
        for r in boosted_topk(spark, store, Q, 12, "warc_ts", NOW).collect()
    ]
    got, cursor = [], None
    for _ in range(3):
        rows = boosted_topk(
            spark, store, Q, 4, "warc_ts", NOW, after=cursor
        ).collect()
        got += [(int(r["doc_id"]), float(r["score"])) for r in rows]
        cursor = (float(rows[-1]["score"]), int(rows[-1]["doc_id"]))
    assert got == want


def test_boosted_validation(spark, boost_setup):
    store, _ = boost_setup
    with pytest.raises(ValueError, match="missing weight"):
        boosted_topk(spark, store, Q, 5, "warc_ts", NOW, missing=0.0)
    with pytest.raises(ValueError, match="half_life_days"):
        boosted_topk(spark, store, Q, 5, "warc_ts", NOW, half_life_days=0)
    with pytest.raises(ValueError, match="not in the index's meta_cols"):
        boosted_topk(spark, store, Q, 5, "lang", NOW)
    assert boosted_topk(spark, store, "", 5, "warc_ts", NOW).count() == 0
