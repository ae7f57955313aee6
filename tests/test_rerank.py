"""Rerank pipeline: Dice prefilter -> MSS rescore -> doc aggregation ->
math+text combination."""

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.operators.mss import mss_score
from tangent_spark.operators.slt import mathml_to_slt
from tangent_spark.plans.formula import build_formula_index
from tangent_spark.plans.rerank import combine_math_text, rerank_docs, rerank_topk
from tangent_spark.sources.extract import extract_math

CFG = IndexConfig(n_shards=4, block_size=16)


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pages = pages_with_doc_ids(generate_pages(spark, 120, partitions=4)).persist()
    out = str(tmp_path_factory.mktemp("rr") / "fidx")
    store = build_formula_index(spark, pages, out, CFG)
    # a query that exists in the corpus
    q = None
    for r in pages.select("html").limit(40).collect():
        blocks = extract_math(r["html"])
        if blocks:
            q = blocks[0]
            break
    assert q is not None
    return pages, store, q


def test_rerank_matches_local_mss(spark, setup):
    pages, store, q = setup
    got = rerank_topk(spark, store, q, 10).collect()
    assert got, "reranker returned nothing for a corpus query"
    # exact self-match must lead with MSS f == 1.0
    assert got[0]["mss_f"] == 1.0
    qslt = mathml_to_slt(q)
    # every row's scores must equal a driver-side mss_score call
    for r in got:
        f, neg_un, exact = mss_score(qslt, r["slt"])
        assert r["mss_f"] == pytest.approx(f)
        assert r["neg_unmatched"] == neg_un and r["exact_matches"] == exact
    # sorted by the score vector
    keys = [(-r["mss_f"], -r["neg_unmatched"], -r["exact_matches"], r["expr_id"]) for r in got]
    assert keys == sorted(keys)


def test_rerank_docs_and_combination(spark, setup):
    pages, store, q = setup
    mdocs = rerank_docs(spark, store, q, 10)
    rows = mdocs.collect()
    assert rows
    assert rows[0]["best_score"] == 1.0
    text = spark.createDataFrame(
        [(int(r["doc_id"]), 2.0 + i) for i, r in enumerate(rows[:3])],
        "doc_id long, score double",
    )
    combined = combine_math_text(mdocs, text, n_exprs=1, n_keywords=1).collect()
    assert combined
    # outer join keeps math-only docs; weights are 0.5/0.5
    top = combined[0]
    assert 0.0 <= top["final_score"] <= 1.0 + 1e-9


def test_pad_topk_cycles_short_results():
    """R13 (comp_query.py:334-354): exactly k rows, cycling short result
    lists; repeats carry the minimum score; ranks always 1..k."""
    from tangent_spark.plans.rerank import pad_topk

    rows = [
        {"doc_id": 7, "final_score": 0.9},
        {"doc_id": 3, "final_score": 0.5},
        {"doc_id": 9, "final_score": 0.2},
    ]
    got = pad_topk(rows, 8)
    assert len(got) == 8
    assert [r for r, _, _ in got] == list(range(1, 9))
    # originals keep their score
    assert [s for _, s, _ in got[:3]] == [0.9, 0.5, 0.2]
    # fillers cycle docs and all carry the min score
    assert [row["doc_id"] for _, _, row in got] == [7, 3, 9, 7, 3, 9, 7, 3]
    assert all(s == 0.2 for _, s, _ in got[3:])
    # k smaller than results truncates; empty stays empty
    assert len(pad_topk(rows, 2)) == 2
    assert pad_topk([], 5) == []
