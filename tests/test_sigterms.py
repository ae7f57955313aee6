"""Significant terms (plans/sigterms.py) vs a pure-python JLH oracle
over the synthetic corpus, plus boolean_matches itself."""

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.functions.tokenize import tokenize_porter, tokenize_simple
from tangent_spark.plans.boolean import boolean_matches
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.sigterms import significant_terms
from tangent_spark.sources.store import IndexStore

N_DOCS = 90


@pytest.fixture(scope="module")
def corpus(spark):
    pages = pages_with_doc_ids(generate_pages(spark, N_DOCS, partitions=4)).persist()
    local = {
        int(r["doc_id"]): r["text"]
        for r in pages.select("doc_id", "text").collect()
    }
    return pages, local


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    pages, _ = corpus
    out = str(tmp_path_factory.mktemp("sig") / "idx")
    return build_index(
        spark, pages, out, IndexConfig(n_shards=4, block_size=32), url_col="url"
    )


def _tok(text, tokenizer):
    return tokenize_porter(text) if tokenizer == "porter" else tokenize_simple(text)


def _match_set(local, tokenizer, must=(), must_not=(), should=()):
    out = set()
    for d, text in local.items():
        toks = set(_tok(text, tokenizer))
        if any(m not in toks for m in must):
            continue
        if any(m in toks for m in must_not):
            continue
        pos = set(must) | set(should)
        if pos and not (toks & pos):
            continue
        out.add(d)
    return out


def _py_sig(local, fg_ids, tokenizer, k, min_doc_count):
    n_docs = len(local)
    fg_total = len(fg_ids)
    fg_df: dict[str, int] = {}
    bg_df: dict[str, int] = {}
    for d, text in local.items():
        toks = set(_tok(text, tokenizer))
        for t in toks:
            bg_df[t] = bg_df.get(t, 0) + 1
            if d in fg_ids:
                fg_df[t] = fg_df.get(t, 0) + 1
    rows = []
    for t, f in fg_df.items():
        if f < min_doc_count:
            continue
        fgp = f / fg_total
        bgp = bg_df[t] / n_docs
        score = round((fgp - bgp) * (fgp / bgp), 6)
        if score > 0:
            rows.append((t, f, bg_df[t], score))
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:k]


@pytest.mark.parametrize(
    "query,spec",
    [
        ("matrix", {"should": ("matrix",)}),
        ("+matrix -theorem proof", {"must": ("matrix",), "must_not": ("theorem",), "should": ("proof",)}),
    ],
)
def test_significant_terms_matches_python_oracle(spark, corpus, store, query, spec):
    pages, local = corpus
    cfg = store.get_config()
    stemmed = {
        k: tuple(_tok(" ".join(v), cfg.tokenizer)) for k, v in spec.items()
    }
    fg = _match_set(local, cfg.tokenizer, **stemmed)
    exp = _py_sig(local, fg, cfg.tokenizer, k=15, min_doc_count=2)
    got = significant_terms(
        spark, store, pages, query, k=15, min_doc_count=2
    ).collect()
    assert [(r["term"], r["fg_df"], r["bg_df"], r["score"]) for r in got] == exp


def test_query_must_term_is_most_significant(spark, corpus, store):
    """The must term itself has fg_pct == 1.0 — it must rank first
    (the ES sanity property)."""
    got = significant_terms(spark, store, corpus[0], "+matrix", k=5).collect()
    assert got and got[0]["term"] == "matrix"
    assert got[0]["fg_df"] == got[0]["bg_df"]  # every fg doc has it; fg == its own postings


def test_min_doc_count_filters(spark, corpus, store):
    pages, _ = corpus
    # k large enough to be untruncated — the subset property only
    # holds on the full filtered sets, not on truncated top-k's
    lo = significant_terms(spark, store, pages, "matrix", k=10**6, min_doc_count=1).collect()
    hi = significant_terms(spark, store, pages, "matrix", k=10**6, min_doc_count=5).collect()
    assert {r["term"] for r in hi} <= {r["term"] for r in lo}
    assert all(r["fg_df"] >= 5 for r in hi)


def test_empty_match_set(spark, corpus, store):
    pages, _ = corpus
    assert significant_terms(spark, store, pages, "+zzzunseenterm", k=5).count() == 0


def test_boolean_matches_equals_python_set(spark, corpus, store):
    _, local = corpus
    cfg = store.get_config()
    got = {
        int(r["doc_id"])
        for r in boolean_matches(spark, store, "+matrix -theorem").collect()
    }
    exp = _match_set(
        local, cfg.tokenizer,
        must=tuple(_tok("matrix", cfg.tokenizer)),
        must_not=tuple(_tok("theorem", cfg.tokenizer)),
    )
    assert got == exp
