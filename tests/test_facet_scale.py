"""Facet scale hardening (round-5, VERDICT r4 #6): when the docs
dictionary's (doc_id -> value) map fits in the driver, facets aggregate
INSIDE the per-shard kernel and only (value, count) partials move —
the match set's (doc_id, value) pairs never shuffle through a join."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.plans.boolean import facet_counts
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.search import Searcher

N_DOCS = 400


@pytest.fixture(scope="module")
def pages(spark):
    base = pages_with_doc_ids(generate_pages(spark, N_DOCS, partitions=6))
    return base.withColumn(
        "lang",
        F.element_at(
            F.array(*[F.lit(x) for x in ("en", "de", "fr", "pt", "ja")]),
            (F.col("doc_id") % 5 + 1).cast("int"),
        ),
    ).persist()


@pytest.fixture(scope="module")
def store(spark, pages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("facet_idx") / "index")
    cfg = IndexConfig(
        n_shards=8, block_size=16, store_positions=True, meta_cols=("lang",)
    )
    return build_index(spark, pages, out, cfg, url_col="url")


def _oracle_facets(pages, query_term):
    from collections import Counter

    from tangent_spark.functions.tokenize import tokenize_porter

    qt = tokenize_porter(query_term)[0]
    rows = pages.select("doc_id", "text", "lang").collect()
    c = Counter(r["lang"] for r in rows if qt in tokenize_porter(r["text"]))
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))


def test_facet_kernel_route_matches_join_route_and_oracle(spark, pages, store):
    """Kernel-route facets (map fits driver) == join-route facets
    (cap=0 forces the old path) == python oracle."""
    q = "matrix"
    kernel_rows = [
        (r["lang"], int(r["n_docs"]))
        for r in facet_counts(spark, store, q, "lang").collect()
    ]
    join_rows = [
        (r["lang"], int(r["n_docs"]))
        for r in facet_counts(spark, store, q, "lang", max_driver_docs=0).collect()
    ]
    assert kernel_rows == join_rows == _oracle_facets(pages, q)

    s = Searcher(spark, store)
    try:
        warm_rows = [
            (r["lang"], int(r["n_docs"]))
            for r in s.facets(q, "lang").collect()
        ]
        assert warm_rows == kernel_rows
        # repeated warm facet reuses the cached driver map (no refetch)
        warm2 = [
            (r["lang"], int(r["n_docs"]))
            for r in s.facets(q, "lang").collect()
        ]
        assert warm2 == warm_rows
    finally:
        s.close()


def test_facet_kernel_route_moves_only_value_partials(spark, pages, store):
    """The rows leaving the kernel are bounded by n_values x shards —
    NOT by the match-set size (the term 'the' matches most docs)."""
    acc = spark.sparkContext.accumulator(0)
    out = facet_counts(spark, store, "the", "lang", rows_counter=acc)
    rows = out.collect()
    n_matches = sum(int(r["n_docs"]) for r in rows)
    cfg = store.get_config()
    assert n_matches > 100  # a head-term match set
    assert 0 < acc.value <= 5 * cfg.n_shards, (acc.value, n_matches)
    assert acc.value < n_matches


def test_facet_kernel_route_with_filter_and_phrase(spark, pages, store):
    """Facets compose with metadata filters (kernel route) and, warm,
    with phrase clauses (the serving cache co-locates positions) —
    always matching the join route exactly."""
    first = pages.select("text").limit(1).collect()[0]["text"]
    phrase = " ".join(first.split()[:2])
    q_f, where = "matrix theorem", "lang = 'en' or lang = 'de'"
    a = [
        (r["lang"], int(r["n_docs"]))
        for r in facet_counts(spark, store, q_f, "lang", where=where).collect()
    ]
    b = [
        (r["lang"], int(r["n_docs"]))
        for r in facet_counts(
            spark, store, q_f, "lang", where=where, max_driver_docs=0
        ).collect()
    ]
    assert a == b and a

    q_p = f'matrix "{phrase}"'
    join_route = [
        (r["lang"], int(r["n_docs"]))
        for r in facet_counts(
            spark, store, q_p, "lang", max_driver_docs=0
        ).collect()
    ]
    # cold facet with a phrase clause must FALL BACK to the join route
    # (no co-located positions cold) and still agree
    cold = [
        (r["lang"], int(r["n_docs"]))
        for r in facet_counts(spark, store, q_p, "lang").collect()
    ]
    assert cold == join_route
    s = Searcher(spark, store)
    try:
        # warm phrase facets take the kernel route (in-kernel phrase
        # over the combined serving cache)
        warm = [
            (r["lang"], int(r["n_docs"]))
            for r in s.facets(q_p, "lang").collect()
        ]
        assert warm == join_route and warm
    finally:
        s.close()
