"""Hybrid lexical+vector retrieval (plans/hybrid.py): RRF fusion
semantics and the end-to-end path over the real stores (block-max WAND
leg + persisted IVF leg)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.plans.ann import ann_topk_ivf, build_ann_index
from tangent_spark.plans.hybrid import DEFAULT_RRF_K, hybrid_topk, rrf_fuse
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.search import bm25_topk_wand
from tangent_spark.sources.store import IndexStore

N_DOCS = 60
QUERY = "matrix theorem proof"


def _leg(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_rrf_fuse_exact(spark):
    """Hand-checkable fusion: score(d) = sum 1/(60+rank_leg(d))."""
    lex = _leg(spark, [(1, 5.0), (2, 4.0), (3, 3.0)])
    vec = _leg(spark, [(2, 0.9), (4, 0.8)])
    got = {r["doc_id"]: r for r in rrf_fuse([("lex", lex), ("vec", vec)], k=10).collect()}
    exp = {
        1: 1 / 61,
        2: 1 / 62 + 1 / 61,
        3: 1 / 63,
        4: 1 / 62,
    }
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert got[d]["score"] == pytest.approx(round(s, 6), abs=1e-9)
    assert (got[2]["lex_rank"], got[2]["vec_rank"]) == (2, 1)
    assert (got[1]["lex_rank"], got[1]["vec_rank"]) == (1, 0)
    # fused order: doc2 first (two legs), then doc1, doc4, doc3
    order = [r["doc_id"] for r in sorted(got.values(), key=lambda r: (-r["score"], r["doc_id"]))]
    assert order == [2, 1, 4, 3]


def test_rrf_fuse_tie_breaks_on_id(spark):
    """Equal scores inside a leg rank by doc_id asc; equal fused scores
    order by doc_id asc."""
    lex = _leg(spark, [(7, 1.0), (3, 1.0)])
    rows = rrf_fuse([("lex", lex)], k=10).collect()
    assert [(r["doc_id"], r["lex_rank"]) for r in rows] == [(3, 1), (7, 2)]


def test_rrf_fuse_rejects_bad_legs(spark):
    lex = _leg(spark, [(1, 1.0)])
    with pytest.raises(ValueError):
        rrf_fuse([], k=5)
    with pytest.raises(ValueError):
        rrf_fuse([("a", lex), ("a", lex)], k=5)


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    pages = pages_with_doc_ids(generate_pages(spark, N_DOCS, partitions=4)).persist()
    root = tmp_path_factory.mktemp("hybrid")
    word = build_index(
        spark, pages,
        str(root / "words"),
        IndexConfig(n_shards=4, block_size=16, meta_cols=("lang",)),
        url_col="url",
    )
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, 8)) * 3.0
    vecs = np.stack([centers[i % 4] + 0.2 * rng.standard_normal(8) for i in range(N_DOCS)])
    emb = spark.createDataFrame(
        [(int(i), vecs[i].tolist()) for i in range(N_DOCS)],
        "vec_id long, embedding array<double>",
    )
    ann = build_ann_index(spark, emb, str(root / "ann"), n_centroids=4, m=4,
                          n_codes=16, seed=5)
    return word, ann, vecs


def test_hybrid_topk_matches_python_fusion(spark, stores):
    """hybrid_topk == RRF computed in pure python from the two legs
    (full probing makes the vector leg exact, so both legs are
    independently deterministic)."""
    word, ann, vecs = stores
    probe = vecs[0].tolist()
    n = 15
    got = hybrid_topk(
        spark, word, ann, QUERY, probe, k=10, n_per_leg=n, n_probe=4
    ).collect()

    lex_rows = bm25_topk_wand(spark, word, QUERY, n).collect()
    lex_ranked = sorted(
        [(round(float(r["score"]), 4), -int(r["doc_id"])) for r in lex_rows],
        key=lambda t: (-t[0], -t[1]),
    )
    probe_df = spark.createDataFrame([(0, probe)], "query_id long, q array<double>")
    vec_rows = ann_topk_ivf(spark, ann, probe_df, k=n, n_probe=4).collect()
    vec_ranked = sorted(
        [(round(float(r["cos"]), 4), -int(r["vec_id"])) for r in vec_rows],
        key=lambda t: (-t[0], -t[1]),
    )
    fused: dict[int, float] = {}
    for rank, (_, neg_id) in enumerate(lex_ranked, start=1):
        fused[-neg_id] = fused.get(-neg_id, 0.0) + 1.0 / (DEFAULT_RRF_K + rank)
    for rank, (_, neg_id) in enumerate(vec_ranked, start=1):
        fused[-neg_id] = fused.get(-neg_id, 0.0) + 1.0 / (DEFAULT_RRF_K + rank)
    exp = sorted(fused.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:10]

    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, round(s, 6)) for d, s in exp
    ]
    # every fused doc must come from at least one leg, score bounded by
    # the two-leg maximum 2/(rrf_k+1)
    leg_ids = {int(r["doc_id"]) for r in lex_rows} | {int(r["vec_id"]) for r in vec_rows}
    for r in got:
        assert r["doc_id"] in leg_ids
        assert 0.0 < r["score"] <= 2.0 / (DEFAULT_RRF_K + 1)
        assert (r["lex_rank"] > 0) or (r["vec_rank"] > 0)


def test_api_vector_route(spark, stores):
    """api.search(vector=...) == hybrid_topk directly; shaping options
    and non-bm25 routes are rejected, never silently dropped."""
    from tangent_spark.api import SearchStores, search

    word, ann, vecs = stores
    probe = vecs[0].tolist()
    ss = SearchStores(words=word, vectors=ann)
    via_api = search(spark, ss, QUERY, k=8, vector=probe,
                     n_per_leg=12, n_probe=4).collect()
    direct = hybrid_topk(spark, word, ann, QUERY, probe, k=8,
                         n_per_leg=12, n_probe=4).collect()
    assert [(r["doc_id"], r["score"]) for r in via_api] == [
        (r["doc_id"], r["score"]) for r in direct
    ]
    with pytest.raises(ValueError, match="vectors"):
        search(spark, SearchStores(words=word), QUERY, vector=probe)
    with pytest.raises(ValueError, match="routed"):
        search(spark, ss, '+matrix "theorem proof"', vector=probe)
    with pytest.raises(ValueError, match="not supported"):
        search(spark, ss, QUERY, vector=probe, sort_by="n_chars")


def test_hybrid_reopened_store(spark, stores):
    """Same fused ranking from fresh IndexStore handles (no warm
    state) — the serving path a new session takes."""
    word, ann, vecs = stores
    probe = vecs[0].tolist()
    a = hybrid_topk(spark, word, ann, QUERY, probe, k=8, n_per_leg=12, n_probe=4).collect()
    b = hybrid_topk(
        spark, IndexStore(word.root), IndexStore(ann.root), QUERY, probe,
        k=8, n_per_leg=12, n_probe=4,
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [(r["doc_id"], r["score"]) for r in b]


def test_hybrid_filtered_where_restricts_both_legs(spark, stores):
    """where= composes with vector search (the ES 8 rrf shape: the
    same filter on both retriever legs): the fused result equals
    python RRF over the two FILTERED legs, and never surfaces a
    filtered-out doc."""
    from tangent_spark.plans.ann import ann_topk_ivf_filtered
    from tangent_spark.plans.boolean import filtered_topk

    word, ann, vecs = stores
    probe = vecs[0].tolist()
    n = 12
    got = hybrid_topk(
        spark, word, ann, QUERY, probe, k=8, n_per_leg=n, n_probe=4,
        where="lang = 'en'",
    ).collect()

    docs = word.read(spark, "docs")
    allowed = {int(r["doc_id"]) for r in docs.filter("lang = 'en'").collect()}
    assert allowed and len(allowed) < N_DOCS  # the filter actually bites
    assert {int(r["doc_id"]) for r in got} <= allowed

    lex_rows = filtered_topk(spark, word, QUERY, n, "lang = 'en'").collect()
    probe_df = spark.createDataFrame([(0, probe)], "query_id long, q array<double>")
    vec_rows = ann_topk_ivf_filtered(
        spark, ann, probe_df, docs, "lang = 'en'", k=n, n_probe=4,
        meta_id_col="doc_id",
    ).collect()
    fused: dict[int, float] = {}
    lex_ranked = sorted(
        [(round(float(r["score"]), 4), int(r["doc_id"])) for r in lex_rows],
        key=lambda t: (-t[0], t[1]),
    )
    vec_ranked = sorted(
        [(round(float(r["cos"]), 4), int(r["vec_id"])) for r in vec_rows],
        key=lambda t: (-t[0], t[1]),
    )
    for rank, (_, d) in enumerate(lex_ranked, start=1):
        fused[d] = fused.get(d, 0.0) + 1.0 / (DEFAULT_RRF_K + rank)
    for rank, (_, d) in enumerate(vec_ranked, start=1):
        fused[d] = fused.get(d, 0.0) + 1.0 / (DEFAULT_RRF_K + rank)
    exp = sorted(fused.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:8]
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (d, round(s, 6)) for d, s in exp
    ]


def test_api_vector_route_with_where(spark, stores):
    """api.search(vector=..., where=...) routes through the filtered
    hybrid path and equals hybrid_topk(where=...) directly."""
    from tangent_spark.api import SearchStores, search

    word, ann, vecs = stores
    probe = vecs[0].tolist()
    ss = SearchStores(words=word, vectors=ann)
    via_api = search(spark, ss, QUERY, k=6, vector=probe, where="lang = 'en'",
                     n_per_leg=10, n_probe=4).collect()
    direct = hybrid_topk(spark, word, ann, QUERY, probe, k=6, n_per_leg=10,
                         n_probe=4, where="lang = 'en'").collect()
    assert via_api and [(r["doc_id"], r["score"]) for r in via_api] == [
        (r["doc_id"], r["score"]) for r in direct
    ]
