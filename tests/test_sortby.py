"""Sort-by-field (plans/sortby.sorted_topk — Solr sort=<field>): top-k
matching docs ordered by a typed metadata column, vs a pure-Python
oracle over the raw corpus."""

import pytest

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.oracle import _tok
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.sortby import sorted_topk

N = 140
CFG = IndexConfig(
    n_shards=8, block_size=16, meta_cols=("lang", "warc_ts")
)


@pytest.fixture(scope="module")
def sort_setup(spark, tmp_path_factory):
    pages = pages_with_doc_ids(generate_pages(spark, N, partitions=6)).persist()
    out = str(tmp_path_factory.mktemp("srt") / "index")
    store = build_index(spark, pages, out, CFG, url_col="url")
    local = [
        (int(r["doc_id"]), r["text"], r["lang"], r["warc_ts"])
        for r in pages.select("doc_id", "text", "lang", "warc_ts").collect()
    ]
    return store, local


def matching(local, query):
    qts = set(_tok(query, "porter"))
    return [
        row for row in local if qts & set(_tok(row[1], "porter"))
    ]


@pytest.mark.parametrize("ascending", [True, False])
def test_sort_by_timestamp_matches_oracle(spark, sort_setup, ascending):
    store, local = sort_setup
    q = "matrix theorem"
    got = [
        (int(r["doc_id"]), r["warc_ts"])
        for r in sorted_topk(
            spark, store, q, "warc_ts", k=12, ascending=ascending
        ).collect()
    ]
    m = matching(local, q)
    want = sorted(
        ((d, ts) for d, _, _, ts in m),
        key=lambda x: ((x[1], x[0]) if ascending else (_neg_ts(x[1]), x[0])),
    )[:12]
    assert got == want and got


def _neg_ts(ts):
    import datetime

    return datetime.datetime.max - ts.replace(tzinfo=None)


def test_sort_by_string_field(spark, sort_setup):
    store, local = sort_setup
    q = "convergence"
    got = [
        (int(r["doc_id"]), r["lang"])
        for r in sorted_topk(spark, store, q, "lang", k=8, ascending=True).collect()
    ]
    m = matching(local, q)
    want = sorted(((d, lang) for d, _, lang, _ in m), key=lambda x: (x[1], x[0]))[:8]
    assert got == want and got


def test_sort_unknown_field_and_empty_query(spark, sort_setup):
    store, _ = sort_setup
    with pytest.raises(ValueError, match="not in the index's meta_cols"):
        sorted_topk(spark, store, "matrix", "nope")
    assert sorted_topk(spark, store, "", "lang").count() == 0
    assert sorted_topk(spark, store, "zzqqxx", "lang").count() == 0


def test_sort_respects_deletes(spark, sort_setup, tmp_path):
    from tangent_spark.streaming.incremental import delete_docs
    from tangent_spark.corpus import generate_pages, pages_with_doc_ids

    pages = pages_with_doc_ids(generate_pages(spark, 60, partitions=4)).persist()
    store = build_index(spark, pages, str(tmp_path / "sdel"), CFG, url_col="url")
    q = "matrix theorem"
    before = sorted_topk(spark, store, q, "warc_ts", k=5).collect()
    victims = [int(r["doc_id"]) for r in before[:2]]
    delete_docs(spark, store, victims, batch_id="sort-del")
    after = sorted_topk(spark, store, q, "warc_ts", k=5).collect()
    assert not ({int(r["doc_id"]) for r in after} & set(victims))
