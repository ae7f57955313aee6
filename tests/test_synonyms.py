"""Query-time synonym expansion (plans/search.bm25_topk_synonyms —
Lucene SynonymQuery semantics: per-group max df for idf, per-doc tf
SUM before tf-normalization). Rank identity vs a pure-Python oracle,
plus the no-synonyms == plain-BM25 equivalence and recall growth."""

import math

import pytest

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.oracle import _tok
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.search import bm25_topk_synonyms, bm25_topk_wand
from tests.conftest import assert_rank_identical

N = 130


def synonym_rank(local, query, synonyms, k, k1=1.2, b=0.75, tokenizer="porter"):
    qts = _tok(query, tokenizer)
    assigned: dict[str, int] = {}
    for gi, t in enumerate(qts):
        members = [t] + [m for s in synonyms.get(t, ()) for m in _tok(s, tokenizer)]
        for m in members:
            assigned.setdefault(m, gi)
    tf: dict[int, dict[str, int]] = {}
    dl: dict[int, int] = {}
    for doc_id, text in local:
        toks = _tok(text, tokenizer)
        if toks:
            d: dict[str, int] = {}
            for t in toks:
                d[t] = d.get(t, 0) + 1
            tf[doc_id] = d
            dl[doc_id] = len(toks)
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs if n_docs else 1.0
    dfs = {
        m: sum(1 for d in tf.values() if m in d) for m in assigned
    }
    groups: dict[int, list[str]] = {}
    for m, gi in assigned.items():
        if dfs[m] > 0:  # members absent from the vocabulary carry no stats
            groups.setdefault(gi, []).append(m)
    scores: dict[int, float] = {}
    for gi, members in groups.items():
        gdf = max(dfs[m] for m in members)
        idf = math.log(1.0 + (n_docs - gdf + 0.5) / (gdf + 0.5))
        for doc_id, d in tf.items():
            tf_sum = sum(d.get(m, 0) for m in members)
            if tf_sum:
                tfn = (
                    tf_sum * (k1 + 1.0)
                    / (tf_sum + k1 * (1.0 - b + b * dl[doc_id] / avgdl))
                )
                scores[doc_id] = scores.get(doc_id, 0.0) + idf * tfn
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]


@pytest.fixture(scope="module")
def syn_setup(spark, tmp_path_factory):
    pages = pages_with_doc_ids(generate_pages(spark, N, partitions=6)).persist()
    out = str(tmp_path_factory.mktemp("syn") / "index")
    store = build_index(
        spark, pages, out, IndexConfig(n_shards=8, block_size=16), url_col="url"
    )
    local = sorted(
        (int(r["doc_id"]), r["text"])
        for r in pages.select("doc_id", "text").collect()
    )
    return store, local


SYNS = {"matrix": ["tensor", "eigenvalue"], "proof": ["lemma"]}


@pytest.mark.parametrize(
    "query,syns",
    [
        ("matrix proof", SYNS),
        ("matrix convergence theorem", SYNS),
        ("gradient", {"gradient": ["descent", "entropy"]}),
        ("the of", {"the": ["of"]}),  # head-term group, overlapping df
    ],
)
def test_synonym_rank_identity(spark, syn_setup, query, syns):
    store, local = syn_setup
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in bm25_topk_synonyms(spark, store, query, 15, syns).collect()
    ]
    assert_rank_identical(got, synonym_rank(local, query, syns, 15))


def test_no_synonyms_equals_plain_bm25(spark, syn_setup):
    store, _ = syn_setup
    q = "matrix convergence theorem"
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in bm25_topk_synonyms(spark, store, q, 10, {}).collect()
    ]
    want = [
        (int(r["doc_id"]), float(r["score"]))
        for r in bm25_topk_wand(spark, store, q, 10).collect()
    ]
    assert_rank_identical(got, want)


def test_synonyms_grow_recall(spark, syn_setup):
    """Docs containing only a synonym (never the original term) must
    enter the match set."""
    store, local = syn_setup
    plain = {int(r["doc_id"]) for r in bm25_topk_wand(spark, store, "kernel", N).collect()}
    assert plain  # 'kernel' matches somewhere in the synthetic corpus
    exp = {
        int(r["doc_id"])
        for r in bm25_topk_synonyms(
            spark, store, "descent", N, {"descent": ["kernel"]}
        ).collect()
    }
    base = {int(r["doc_id"]) for r in bm25_topk_wand(spark, store, "descent", N).collect()}
    assert exp >= base and exp >= plain and len(exp) > len(base)


def test_term_claimed_once_across_groups(spark, syn_setup):
    """A member appearing in two groups stays in the first — no
    double-scoring (oracle applies the same rule, so identity holds)."""
    store, local = syn_setup
    syns = {"matrix": ["theorem"], "theorem": ["matrix"]}
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in bm25_topk_synonyms(spark, store, "matrix theorem", 10, syns).collect()
    ]
    assert_rank_identical(got, synonym_rank(local, "matrix theorem", syns, 10))


def test_oov_synonyms_harmless(spark, syn_setup):
    store, _ = syn_setup
    q = "matrix"
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in bm25_topk_synonyms(
            spark, store, q, 10, {"matrix": ["zzqqnotaword"]}
        ).collect()
    ]
    want = [
        (int(r["doc_id"]), float(r["score"]))
        for r in bm25_topk_wand(spark, store, q, 10).collect()
    ]
    assert_rank_identical(got, want)


def test_synonym_search_after_tiles(spark, syn_setup):
    store, _ = syn_setup
    q, syns = "matrix proof", SYNS
    want = [
        (int(r["doc_id"]), float(r["score"]))
        for r in bm25_topk_synonyms(spark, store, q, 20, syns).collect()
    ]
    got, cursor = [], None
    for _ in range(4):
        rows = bm25_topk_synonyms(spark, store, q, 5, syns, after=cursor).collect()
        got += [(int(r["doc_id"]), float(r["score"])) for r in rows]
        cursor = (float(rows[-1]["score"]), int(rows[-1]["doc_id"]))
    assert got == want
