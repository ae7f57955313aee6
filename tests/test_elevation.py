"""Query elevation (Solr QueryElevationComponent) —
plans/search.elevated_topk: pinned doc ids occupy the first ranks in
the given order (flagged `elevated`, real BM25 score when they match,
NULL otherwise), organic results fill the rest. The reference has no
elevation (Solr owned its text serving, SURVEY S12); this is the
editorial-pinning surface of that stack, Spark-native.
"""

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.search import bm25_topk_wand, elevated_topk

Q = "matrix convergence theorem"
N = 120


@pytest.fixture(scope="module")
def pages(spark):
    return pages_with_doc_ids(generate_pages(spark, N, partitions=4)).persist()


@pytest.fixture(scope="module")
def store(spark, pages, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("elev"))
    cfg = IndexConfig(n_shards=4, block_size=16)
    return build_index(spark, pages, f"{base}/idx", cfg, url_col="url")


def _organic(spark, store, k):
    return [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in bm25_topk_wand(spark, store, Q, k).collect()
    ]


def test_no_pins_equals_plain_bm25(spark, store):
    got = [
        (r["rank"], int(r["doc_id"]), round(float(r["score"]), 9), r["elevated"])
        for r in elevated_topk(spark, store, Q, 10, []).collect()
    ]
    exp = [
        (i + 1, d, s, False) for i, (d, s) in enumerate(_organic(spark, store, 10))
    ]
    assert got == exp


def test_pinned_rank_first_in_given_order(spark, store):
    org = _organic(spark, store, 10)
    # pin the 5th and 2nd organic hits, in that (non-score) order
    pins = [org[4][0], org[1][0]]
    got = elevated_topk(spark, store, Q, 10, pins).collect()
    head = [(r["rank"], int(r["doc_id"]), r["elevated"]) for r in got[:2]]
    assert head == [(1, pins[0], True), (2, pins[1], True)]
    # elevated docs keep their REAL BM25 scores
    scores = {d: s for d, s in org}
    assert round(float(got[0]["score"]), 9) == scores[pins[0]]
    assert round(float(got[1]["score"]), 9) == scores[pins[1]]
    # organic tail = original ranking minus the pinned docs, ranks 3..10
    tail = [(r["rank"], int(r["doc_id"]), round(float(r["score"]), 9)) for r in got[2:]]
    exp_tail = [
        (i + 3, d, s)
        for i, (d, s) in enumerate(
            [(d, s) for d, s in _organic(spark, store, 12) if d not in pins][:8]
        )
    ]
    assert tail == exp_tail
    assert all(not r["elevated"] for r in got[2:])


def test_nonmatching_pin_gets_null_score(spark, pages, store):
    # a doc that contains none of the query terms
    qterms = set(Q.split())
    nohit = (
        pages.filter(
            ~F.arrays_overlap(
                F.split(F.lower("text"), r"[^a-z0-9]+"),
                F.array(*[F.lit(t) for t in qterms]),
            )
        )
        .select("doc_id")
        .limit(1)
        .collect()
    )
    if not nohit:
        pytest.skip("corpus has no query-free doc")
    d = int(nohit[0]["doc_id"])
    got = elevated_topk(spark, store, Q, 5, [d]).collect()
    assert int(got[0]["doc_id"]) == d and got[0]["elevated"]
    assert got[0]["score"] is None
    assert len(got) == 5


def test_duplicate_pins_dedupe(spark, store):
    org = _organic(spark, store, 5)
    d = org[0][0]
    got = elevated_topk(spark, store, Q, 5, [d, d]).collect()
    assert [int(r["doc_id"]) for r in got].count(d) == 1
    assert int(got[0]["doc_id"]) == d and got[0]["elevated"]


def test_deleted_pin_never_resurrected(spark, pages, store, tmp_path_factory):
    from tangent_spark.streaming.incremental import delete_docs

    base = str(tmp_path_factory.mktemp("elevdel"))
    cfg = IndexConfig(n_shards=4, block_size=16)
    s2 = build_index(spark, pages, f"{base}/idx", cfg, url_col="url")
    org = _organic(spark, s2, 5)
    victim = org[0][0]
    delete_docs(spark, s2, pages.filter(F.col("doc_id") == victim), 1)
    got = elevated_topk(spark, s2, Q, 5, [victim]).collect()
    assert victim not in [int(r["doc_id"]) for r in got]
    assert all(not r["elevated"] for r in got)


def test_api_pinned_route(spark, store):
    import pytest as _pytest

    from tangent_spark import api

    org = _organic(spark, store, 10)
    pins = [org[3][0]]
    via_api = [
        (r["rank"], int(r["doc_id"]), r["elevated"])
        for r in api.search(spark, store, Q, 10, pinned=pins).collect()
    ]
    direct = [
        (r["rank"], int(r["doc_id"]), r["elevated"])
        for r in elevated_topk(spark, store, Q, 10, pins).collect()
    ]
    assert via_api == direct
    with _pytest.raises(ValueError):
        api.search(spark, store, Q, 10, pinned=pins, sort_by="lang")
    with _pytest.raises(ValueError):
        api.search(spark, store, "data +query", 10, pinned=pins)
    with _pytest.raises(ValueError):
        api.search(spark, store, "*:*", 10, pinned=pins)
