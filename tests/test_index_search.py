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
    Searcher,
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


def test_searcher_rank_identical_to_wand(spark, index_store, corpus):
    from tangent_spark.plans.search import Searcher

    _, local = corpus
    s = Searcher(spark, index_store)
    try:
        for query in QUERIES:
            got = [(r["doc_id"], r["score"]) for r in s.topk(query, 10).collect()]
            assert_rank_identical(got, bm25_rank(local, query, 10))
    finally:
        s.close()


def test_searcher_bounded_lexicon_10m_vocab(spark, index_store, corpus, tmp_path):
    """The scale-killer check: construct a Searcher against a 10M-term
    vocabulary with a small driver-side head (max_lexicon=1000). Driver
    memory stays bounded (head dict only), and every query — whose real
    terms are all OUTSIDE the synthetic high-df head — still ranks
    identically to the cold WAND path via the tail broadcast-lookup."""
    import shutil

    from tangent_spark.plans.search import Searcher

    _, local = corpus
    # clone the index so the version flip doesn't pollute the shared fixture
    root = str(tmp_path / "bigvocab")
    shutil.copytree(index_store.root, root)
    store = IndexStore(root)
    # flood term_stats with 10M synthetic terms at df far above any real term;
    # flip the table pointer through the store's own versioning mechanism
    real = spark.read.parquet(store.path("term_stats"))
    synth = spark.range(10_000_000).select(
        F.concat(F.lit("zzsynth"), F.col("id")).alias("term"),
        (F.lit(1000) + (F.col("id") % 1000)).cast("int").alias("df"),
        (F.lit(1000) + (F.col("id") % 1000)).cast("long").alias("cf"),
    )
    nxt = store.table_version("term_stats") + 1
    real.unionByName(synth).write.mode("overwrite").parquet(
        store.versioned_path("term_stats", nxt)
    )
    store.commit_stage("synthetic_vocab", [], {}, table_flips={"term_stats": nxt})

    s = Searcher(spark, store, max_lexicon=1000)
    try:
        assert not s._full_lexicon
        assert len(s.dfs) == 1000  # bounded driver head, not 10M entries
        assert all(t.startswith("zzsynth") for t in s.dfs)  # head = high-df terms
        for query in QUERIES[:3]:
            got = [(r["doc_id"], r["score"]) for r in s.topk(query, 10).collect()]
            assert_rank_identical(got, bm25_rank(local, query, 10))
        # batch path resolves tail terms the same way
        batch = s.topk_batch({"q0": QUERIES[0]}, 10).collect()
        got = [(r["doc_id"], r["score"]) for r in sorted(batch, key=lambda r: r["rank"])]
        assert_rank_identical(got, bm25_rank(local, QUERIES[0], 10))
    finally:
        s.close()
    shutil.rmtree(root, ignore_errors=True)


def test_batch_shares_decode_cache(spark, index_store):
    """Overlapping queries in one batch must decode strictly fewer blocks
    than the same queries run singly (VERDICT round-2 item #2)."""
    from tangent_spark.plans.search import Searcher

    overlapping = {
        "q1": "matrix theorem proof",
        "q2": "matrix theorem",
        "q3": "theorem proof spark",
        "q4": "matrix proof the",
    }
    s = Searcher(spark, index_store)
    try:
        single_acc = spark.sparkContext.accumulator(0)
        for q in overlapping.values():
            s.topk(q, 10, decode_counter=single_acc).collect()
        single_total = single_acc.value
        acc = spark.sparkContext.accumulator(0)
        batch = s.topk_batch(overlapping, 10, decode_counter=acc)
        batch.collect()
        assert acc.value > 0
        assert acc.value < single_total, (acc.value, single_total)
    finally:
        s.close()


def test_phrase_topk_matches_python_oracle(spark, corpus, tmp_path):
    """Positional index: phrase_topk off the positions table must equal a
    pure-python consecutive-token scan (Porter-stemmed, like the index)."""
    from tangent_spark.functions.tokenize import tokenize_porter
    from tangent_spark.plans.phrase import phrase_topk

    pages, local = corpus
    cfg = IndexConfig(n_shards=4, block_size=32, store_positions=True)
    store = build_index(spark, pages, str(tmp_path / "posidx"), cfg, url_col="url")
    assert store.stage_done("positions")

    # pick a phrase that actually occurs: the first bigram of doc 0
    toks0 = tokenize_porter(local[0][1])
    phrase = " ".join(toks0[:2])
    pts = tokenize_porter(phrase)

    def oracle_tf(text):
        ts = tokenize_porter(text)
        return sum(
            1
            for i in range(len(ts) - len(pts) + 1)
            if ts[i : i + len(pts)] == pts
        )

    want = sorted(
        ((tf, doc_id) for doc_id, text in local if (tf := oracle_tf(text)) > 0),
        key=lambda x: (-x[0], x[1]),
    )[:10]
    got = [
        (r["phrase_tf"], r["doc_id"])
        for r in phrase_topk(spark, store, phrase, 10).collect()
    ]
    assert got == want and len(got) > 0

    # an index built without positions refuses phrase queries loudly
    no_pos = build_index(
        spark, pages, str(tmp_path / "noposidx"), IndexConfig(n_shards=4), url_col="url"
    )
    with pytest.raises(ValueError, match="without positions"):
        phrase_topk(spark, no_pos, phrase, 5)


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


def test_warm_query_is_one_job_even_on_full_tail_miss(spark, index_store, corpus):
    """Round-3 review #3: a query whose terms ALL miss the driver head
    lexicon must still run as ONE Spark job — idf comes off the cached
    rows' g_df column, never a separate stats collect."""
    from tangent_spark.plans.search import Searcher

    _, local = corpus
    s = Searcher(spark, index_store, max_lexicon=1)  # head holds 1 term only
    try:
        assert not s._full_lexicon and len(s.dfs) == 1
        query = "matrix convergence theorem"
        assert not any(t in s.dfs for t in query.split())  # 100% tail
        sc = spark.sparkContext
        sc.setJobGroup("tailq_one_job", "one-job serving check")
        try:
            got = [(r["doc_id"], r["score"]) for r in s.topk(query, 10).collect()]
        finally:
            sc.setJobGroup("tailq_done", "")
        jobs = sc.statusTracker().getJobIdsForGroup("tailq_one_job")
        assert len(jobs) == 1, f"warm tail query ran {len(jobs)} jobs: {jobs}"
        assert_rank_identical(got, bm25_rank(local, query, 10))
    finally:
        s.close()


def test_search_after_pages_tile_global_ordering(spark, index_store, corpus):
    """Cursor deep paging (Lucene searchAfter): consecutive pages of k
    must tile the one-shot top-N exactly — no overlap, no gap — on
    BOTH the cold path (bm25_topk_wand) and the warm Searcher, which
    share the kernel. The cursor is the previous page's last
    (score, doc_id); float comparison at the boundary is exact because
    both sides come from the same kernel on the same rows."""
    from tangent_spark.plans.search import Searcher

    query = "matrix theorem proof"
    want = [
        (int(r["doc_id"]), float(r["score"]))
        for r in bm25_topk_wand(spark, index_store, query, 30).collect()
    ]
    assert len(want) == 30

    got = []
    cursor = None
    for _ in range(3):
        rows = bm25_topk_wand(
            spark, index_store, query, 10, after=cursor
        ).collect()
        got += [(int(r["doc_id"]), float(r["score"])) for r in rows]
        cursor = (float(rows[-1]["score"]), int(rows[-1]["doc_id"]))
    assert got == want

    # warm pages tile the WARM one-shot (the warm kernel computes idf
    # from the cached g_df column — same math, different float op
    # order than the cold JVM-side log, so scores may differ in the
    # last ulp between paths; cursor exactness is a per-path property)
    s = Searcher(spark, index_store)
    try:
        want_warm = [
            (int(r["doc_id"]), float(r["score"]))
            for r in s.topk(query, 30).collect()
        ]
        got_warm = []
        cursor = None
        for _ in range(3):
            rows = s.topk(query, 10, after=cursor).collect()
            got_warm += [(int(r["doc_id"]), float(r["score"])) for r in rows]
            cursor = (float(rows[-1]["score"]), int(rows[-1]["doc_id"]))
        assert got_warm == want_warm
    finally:
        s.close()


def test_search_after_exhausted_cursor_is_empty(spark, index_store):
    """A cursor below every score returns an empty page, not an error."""
    rows = bm25_topk_wand(
        spark, index_store, "convergence", 10, after=(-1.0, 1 << 60)
    ).collect()
    assert rows == []


def test_explain_contributions_sum_to_kernel_score(spark, index_store):
    """explain_score (Lucene IndexSearcher.explain): per-(doc, term)
    contributions must sum to the kernel's BM25 score for the doc, and
    idf/df must match the index's term_stats."""
    from tangent_spark.plans.search import explain_score

    query = "matrix theorem proof"
    top = bm25_topk_wand(spark, index_store, query, 5).collect()
    ids = [int(r["doc_id"]) for r in top]
    kernel_scores = {int(r["doc_id"]): float(r["score"]) for r in top}
    rows = explain_score(spark, index_store, query, ids).collect()
    assert {int(r["doc_id"]) for r in rows} == set(ids)
    sums: dict[int, float] = {}
    for r in rows:
        assert r["tf"] >= 1 and r["df"] >= 1 and r["idf"] > 0
        sums[int(r["doc_id"])] = sums.get(int(r["doc_id"]), 0.0) + float(
            r["contribution"]
        )
    for d, s in sums.items():
        assert abs(s - kernel_scores[d]) < 1e-9, (d, s, kernel_scores[d])


def test_explain_empty_inputs(spark, index_store):
    from tangent_spark.plans.search import explain_score

    assert explain_score(spark, index_store, "", [1]).count() == 0
    assert explain_score(spark, index_store, "matrix", []).count() == 0


# --- Lucene term boosts (`term^2.5`) -----------------------------------------

def _boosted_oracle(local, weighted_terms, k):
    """Brute force: sum of per-term BM25 contributions, each scaled by
    its boost (bm25_rank per single term, combined driver-side)."""
    from collections import defaultdict

    acc = defaultdict(float)
    for term, w in weighted_terms.items():
        for d, s in bm25_rank(local, [term], 10**9):
            acc[d] += w * s
    ranked = sorted(acc.items(), key=lambda x: (-x[1], x[0]))
    return [(d, s) for d, s in ranked[:k]]


def test_term_boosts_cold_and_warm_match_oracle(spark, index_store, corpus):
    """`matrix^2 convergence` scales matrix's idf 2x in both the cold
    declarative WAND plan and the warm Searcher kernel; block-max
    bounds inherit the scaling so pruning stays rank-exact."""
    from tangent_spark.plans.search import split_term_boosts

    _, local = corpus
    qts, boosts = split_term_boosts("matrix^2 convergence", "porter")
    weighted = {t: boosts.get(t, 1.0) for t in qts}
    want = _boosted_oracle(local, weighted, 12)

    got_cold = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_wand(
            spark, index_store, "matrix^2 convergence", 12
        ).collect()
    ]
    assert_rank_identical(got_cold, want)

    s = Searcher(spark, index_store)
    try:
        got_warm = [
            (r["doc_id"], r["score"])
            for r in s.topk("matrix^2 convergence", 12).collect()
        ]
        assert_rank_identical(got_warm, want)
        # boost actually changes the ranking vs the unboosted query
        plain = [
            (r["doc_id"], r["score"])
            for r in s.topk("matrix convergence", 12).collect()
        ]
        assert [d for d, _ in got_warm] != [d for d, _ in plain]
    finally:
        s.close()


def test_term_boost_batch_rejected(spark, index_store):
    s = Searcher(spark, index_store)
    try:
        with pytest.raises(ValueError, match="term boosts"):
            s.topk_batch({"q1": "matrix^2 convergence"}, 5)
    finally:
        s.close()


def test_terms_positions_df_matches_separate_passes(spark, corpus):
    """The build's single-tokenize pass (round 6) must emit exactly
    terms_df's rows plus positions_df's positions — the terms/positions
    tables it feeds are byte-compatible with the two-pass build."""
    from tangent_spark.functions.tokenize import (
        positions_df,
        terms_df,
        terms_positions_df,
    )

    pages, _ = corpus
    pages = pages.select("doc_id", "text")
    combined = terms_positions_df(pages, "doc_id", "text", "porter")
    t_sep = terms_df(pages, "doc_id", "text", "porter")
    p_sep = positions_df(pages, "doc_id", "text", "porter")

    t_cmb = combined.select("doc_id", "term", "tf", "dl")
    assert t_cmb.schema == t_sep.schema
    assert t_cmb.exceptAll(t_sep).count() == 0
    assert t_sep.exceptAll(t_cmb).count() == 0

    p_cmb = combined.select("doc_id", "term", "positions")
    assert p_cmb.schema == p_sep.schema
    assert p_cmb.exceptAll(p_sep).count() == 0
    assert p_sep.exceptAll(p_cmb).count() == 0
