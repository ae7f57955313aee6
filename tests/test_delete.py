"""Document deletion lifecycle (Lucene live-docs discipline).

delete_docs marks tombstones (tagged, crash-idempotent append protocol);
serving kernels MASK tombstoned ids at decode time immediately — WAND,
full-decode twin, warm Searcher, boolean, phrase — with survivor scores
FROZEN at index-time stats (exactly Lucene: deleted docs count toward
df/avgdl until segments merge); compact_postings makes deletes physical
(postings/positions/docs/terms dropped, stats recomputed) after which
the store is EXACTLY a fresh build over the survivors. The reference
has no delete path at all (its index is rebuild-only, SURVEY.md §2.7);
this is Spark-native lifecycle the 100 TB story requires.
"""

import os

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.plans.indexer import build_index, verify_index
from tangent_spark.plans.search import (
    Searcher,
    bm25_topk_index_full,
    bm25_topk_wand,
    load_deleted_ids,
)
from tangent_spark.plans.phrase import phrase_topk
from tangent_spark.streaming.incremental import (
    append_batch,
    compact_postings,
    delete_docs,
    update_docs,
)

CFG = IndexConfig(n_shards=4, block_size=16, store_positions=True)
Q = "matrix convergence theorem"


@pytest.fixture(scope="module")
def pages(spark):
    return pages_with_doc_ids(generate_pages(spark, 150, partitions=4)).persist()


@pytest.fixture(scope="module")
def deleted_store(spark, pages, tmp_path_factory):
    """One store with the top-3 hits of Q tombstoned (not compacted),
    plus the pre-delete baseline ranking."""
    base = str(tmp_path_factory.mktemp("del"))
    store = build_index(spark, pages, f"{base}/idx", CFG, url_col="url")
    before = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk_wand(spark, store, Q, 20).collect()
    ]
    victims = [d for d, _ in before[:3]]
    delete_docs(spark, store, victims, 1)
    return store, before, victims


def _topk(spark, store, q, k):
    return [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk_wand(spark, store, q, k).collect()
    ]


def test_masking_excludes_and_freezes_survivors(spark, deleted_store):
    store, before, victims = deleted_store
    after = _topk(spark, store, Q, 20)
    assert not (set(victims) & {d for d, _ in after})
    # survivors keep their exact pre-delete scores (stats frozen)
    bmap = dict(before)
    assert all(bmap.get(d, s) == s for d, s in after)
    # pruning stays exact under masking: WAND == full-decode twin
    full = [
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk_index_full(spark, store, Q, 20).collect()
    ]
    assert after == full


def test_warm_boolean_phrase_respect_tombstones(spark, deleted_store, pages):
    store, _before, victims = deleted_store
    s = Searcher(spark, store)
    assert sorted(s.deleted.tolist()) == sorted(victims)
    warm = [(r["doc_id"], round(r["score"], 9)) for r in s.topk(Q, 20).collect()]
    assert warm == _topk(spark, store, Q, 20)
    assert not (
        set(victims)
        & {r["doc_id"] for r in s.boolean("matrix +convergence", 50).collect()}
    )
    # phrase: a bigram straight out of a victim doc must not return it
    row = pages.filter(F.col("doc_id") == victims[0]).collect()[0]
    bigram = " ".join(row["text"].split()[:2])
    assert victims[0] not in {
        r["doc_id"] for r in s.phrase(bigram, 1000).collect()
    }
    assert victims[0] not in {
        r["doc_id"] for r in phrase_topk(spark, store, bigram, 1000).collect()
    }
    s.close()


def test_delete_replay_and_crash_orphans(spark, pages, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("delreplay"))
    store = build_index(spark, pages, f"{base}/idx", CFG, url_col="url")
    c1 = delete_docs(spark, store, [5, 6], 1)
    assert c1 == {"marked": 2, "requested_live": 2}
    assert delete_docs(spark, store, [5, 6], 1) == c1  # committed replay: no-op
    # already-tombstoned ids don't re-mark; unknown ids don't count
    c2 = delete_docs(spark, store, [6, 7, 10**9], 2)
    assert c2 == {"marked": 1, "requested_live": 2}
    # simulate a crash AFTER the tagged copy, BEFORE the commit: the
    # orphan file masks conservatively but the next delete sweeps it
    import pandas as pd

    orphan = os.path.join(store.path("tombstones"), "del99-00000.parquet")
    pd.DataFrame({"doc_id": [8]}).to_parquet(orphan)
    spark.catalog.refreshByPath(store.path("tombstones"))
    assert 8 in load_deleted_ids(spark, store).tolist()
    delete_docs(spark, store, [9], 3)  # sweeps uncommitted del99
    assert not os.path.exists(orphan)
    assert sorted(load_deleted_ids(spark, store).tolist()) == [5, 6, 7, 9]


def test_compaction_equals_fresh_build_over_survivors(
    spark, pages, tmp_path_factory
):
    base = str(tmp_path_factory.mktemp("delcompact"))
    store = build_index(spark, pages, f"{base}/idx", CFG, url_col="url")
    victims = [d for d, _ in _topk(spark, store, Q, 3)]
    delete_docs(spark, store, victims, 1)
    cc = compact_postings(spark, store)
    assert cc["deleted_docs"] == 3 and cc["deleted_postings"] > 0
    assert load_deleted_ids(spark, store).size == 0  # tombstones reset
    verify_index(spark, store)
    ref = build_index(
        spark,
        pages.filter(~F.col("doc_id").isin(victims)),
        f"{base}/ref",
        CFG,
        url_col="url",
    )
    for q in (Q, "spark shuffle data", "the of and"):
        assert _topk(spark, store, q, 25) == _topk(spark, ref, q, 25), q
    # docs/terms/stats physically dropped the victims
    assert (
        spark.read.parquet(store.path("docs"))
        .filter(F.col("doc_id").isin(victims))
        .count()
        == 0
    )
    n = spark.read.parquet(store.path("corpus_stats")).collect()[0]["n_docs"]
    assert int(n) == pages.count() - 3


def test_append_after_delete_compact_never_reuses_ids(
    spark, pages, tmp_path_factory
):
    """The high-water-mark fix: fresh ids after a delete+compact must not
    collide with surviving docs (count-based n0 would reuse ids)."""
    base = str(tmp_path_factory.mktemp("delappend"))
    first = pages.filter(F.col("doc_id") < 100)
    store = build_index(spark, first, f"{base}/idx", CFG, url_col="url")
    delete_docs(spark, store, [10, 20, 30], 1)
    compact_postings(spark, store)
    second = pages.filter(F.col("doc_id") >= 100).drop("doc_id")
    append_batch(spark, store, second, batch_id=1)
    docs = spark.read.parquet(store.path("docs"))
    assert docs.count() == docs.select("doc_id").distinct().count()
    assert docs.groupBy("url").count().filter(F.col("count") > 1).count() == 0
    # appended ids start above the surviving high-water mark (99)
    appended = docs.filter(F.col("doc_id") >= 100)
    assert appended.count() == 50
    # corpus_stats counts LIVE docs (97 survivors + 50), not the
    # high-water mark (a count of 150 would corrupt idf/avgdl for
    # every query after a delete+compact+append sequence)
    cs = spark.read.parquet(store.path("corpus_stats")).collect()[0]
    assert int(cs["n_docs"]) == 147


def _mutate(pages_df, victim_url, new_text):
    """The batch that re-crawls victim_url with new_text."""
    return (
        pages_df.filter(F.col("url") == victim_url)
        .drop("doc_id")
        .withColumn("text", F.lit(new_text))
    )


def test_update_docs_replaces_recrawled_url(spark, pages, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("upd"))
    store = build_index(spark, pages, f"{base}/idx", CFG, url_col="url")
    old_id = _topk(spark, store, Q, 1)[0][0]
    row = pages.filter(F.col("doc_id") == old_id).collect()[0]
    new_text = "zyqfresh crawl content only " + " ".join(
        row["text"].split()[:5]
    )
    c = update_docs(spark, store, _mutate(pages, row["url"], new_text), 1)
    assert c["replaced"] == 1 and c["new_docs"] == 1
    # the stale crawl no longer serves Q; the fresh crawl serves its
    # unique token under a NEW id (never reused)
    assert old_id not in {d for d, _ in _topk(spark, store, Q, 50)}
    hits = _topk(spark, store, "zyqfresh", 10)
    assert len(hits) == 1 and hits[0][0] > old_id
    # replay of the same batch id is a committed no-op that returns the
    # stored counters — crucially it must NOT tombstone the fresh doc
    # (the stale-id plan is lazy; delete_docs short-circuits first)
    c2 = update_docs(spark, store, _mutate(pages, row["url"], new_text), 1)
    assert c2 == c
    assert _topk(spark, store, "zyqfresh", 10) == hits
    # docs carries both crawls until compaction makes the swap physical
    docs = spark.read.parquet(store.path("docs"))
    assert docs.filter(F.col("url") == row["url"]).count() == 2
    compact_postings(spark, store)
    docs = spark.read.parquet(store.path("docs"))
    assert docs.filter(F.col("url") == row["url"]).count() == 1
    verify_index(spark, store)
    # compacted store == fresh build over (pages - victim) + new crawl
    new_id = hits[0][0]
    ref_pages = pages.filter(F.col("doc_id") != old_id).unionByName(
        _mutate(pages, row["url"], new_text).withColumn(
            "doc_id", F.lit(new_id).cast("long")
        )
    )
    ref = build_index(spark, ref_pages, f"{base}/ref", CFG, url_col="url")
    for q in (Q, "zyqfresh", "spark shuffle data"):
        assert _topk(spark, store, q, 25) == _topk(spark, ref, q, 25), q


def test_update_stage_namespace_is_reserved(spark, pages, tmp_path_factory):
    """A caller's own batch id can never alias update_docs' sub-stages
    (an alias would skip indexing the re-crawl after tombstoning the
    old doc — silent data loss)."""
    base = str(tmp_path_factory.mktemp("updns"))
    store = build_index(
        spark, pages.filter(F.col("doc_id") < 20), f"{base}/idx", CFG, url_col="url"
    )
    batch = spark.createDataFrame(
        [("https://ns.example/1", "some page")], "url string, text string"
    )
    with pytest.raises(ValueError, match="reserved"):
        append_batch(spark, store, batch, batch_id="upd-1")
    with pytest.raises(ValueError, match="reserved"):
        delete_docs(spark, store, [1], "upd-1")
    # a user batch id that happens to look like the OLD composition
    # ('u1') must not collide with update_docs(batch_id=1)
    append_batch(spark, store, batch, batch_id="u1")
    row = pages.filter(F.col("doc_id") == 3).collect()[0]
    c = update_docs(spark, store, _mutate(pages, row["url"], "zyqns fresh"), 1)
    assert c["replaced"] == 1 and c["new_docs"] == 1
    assert len(_topk(spark, store, "zyqns", 5)) == 1


def test_update_docs_upserts_brand_new_url(spark, pages, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("upsert"))
    store = build_index(spark, pages, f"{base}/idx", CFG, url_col="url")
    fresh = spark.createDataFrame(
        [("https://new.example/zz", "zyqbrand new page about matrices")],
        "url string, text string",
    )
    c = update_docs(spark, store, fresh, 1)
    assert c["replaced"] == 0 and c["new_docs"] == 1
    assert len(_topk(spark, store, "zyqbrand", 10)) == 1


def test_filter_deleted_large_set_uses_anti_join(spark):
    """ADVICE r4: a huge uncompacted tombstone set must not become a
    literal In-expression (plan-size/driver blowup) — above the isin
    threshold filter_deleted ships the ids as a broadcast anti-join,
    same rows either way."""
    import numpy as np

    from tangent_spark.plans.search import _MAX_ISIN_TOMBSTONES, filter_deleted

    df = spark.range(0, 50).withColumnRenamed("id", "doc_id")
    big = np.arange(0, _MAX_ISIN_TOMBSTONES + 5000, dtype=np.int64) * 2
    out = filter_deleted(df, big)
    got = sorted(r["doc_id"] for r in out.collect())
    assert got == [i for i in range(50) if i % 2 == 1]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan

    small = np.asarray([1, 3], dtype=np.int64)
    out2 = filter_deleted(df, small)
    assert sorted(r["doc_id"] for r in out2.collect()) == [
        i for i in range(50) if i not in (1, 3)
    ]
