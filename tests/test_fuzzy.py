"""Fuzzy term queries (plans/fuzzy.py): expansion vs a pure-python
Levenshtein oracle over the vocabulary, cap/order semantics,
transpositions (Damerau), prefix pushdown, and rank-identity of the
served scores with BM25 over the expanded set.
"""

import math
from collections import Counter

import pytest

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.functions.tokenize import tokenize_porter
from tangent_spark.oracle import bm25_rank
from tangent_spark.plans.fuzzy import (
    damerau_levenshtein,
    expand_fuzzy,
    fuzzy_terms,
    fuzzy_topk,
    is_fuzzy_token,
    parse_fuzzy_query,
)
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.search import Searcher, bm25_topk_wand

CFG = IndexConfig(n_shards=4, block_size=16, store_positions=True)
N = 150
# targets picked against the synthetic corpus vocabulary (post-Porter):
# blok->block, grap->graph, querri->queri (2 edits), th->the/to
TARGETS = [("blok", 1), ("grap", 1), ("querri", 2), ("th", 1)]


def levenshtein(a: str, b: str) -> int:
    """Classic DP oracle (no transpositions)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def corpus(spark):
    pages = pages_with_doc_ids(generate_pages(spark, N, partitions=4)).persist()
    local = [
        (int(r["doc_id"]), r["text"]) for r in pages.select("doc_id", "text").collect()
    ]
    return pages, sorted(local)


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    pages, _ = corpus
    return build_index(
        spark, pages, str(tmp_path_factory.mktemp("fz") / "idx"), CFG, url_col="url"
    )


def _vocab_dfs(local):
    dfs = Counter()
    for _, text in local:
        for t in set(tokenize_porter(text)):
            dfs[t] += 1
    return dfs


def _expand_oracle(vocab, target, edits, cap=50, prefix=0, damerau=False):
    dist = damerau_levenshtein if damerau else levenshtein
    cands = sorted(
        (d, -df, t)
        for t, df in vocab.items()
        if (prefix == 0 or t.startswith(target[:prefix]))
        and (d := dist(t, target)) <= edits
    )
    return [t for _, _, t in cands[:cap]]


def test_token_and_parse_semantics():
    assert is_fuzzy_token("querry~")
    assert is_fuzzy_token("querry~1")
    assert is_fuzzy_token("querry~0")
    assert not is_fuzzy_token("querry~3")  # only 0-2 edits are Lucene-legal
    assert not is_fuzzy_token("~2")  # no body
    assert not is_fuzzy_token("plain")
    targets, lits = parse_fuzzy_query("Data querry~1 spel~ ok~0 Value", "porter")
    # bare ~ means 2 edits; ~0 degrades to a literal; literals analyzed
    assert targets == [("querry", 1), ("spel", 2)]
    assert lits == sorted(set(tokenize_porter("Data ok Value")))
    # max edits wins for a repeated target; punctuation drops to alphabet
    targets, _ = parse_fuzzy_query("a-b~1 ab~2", "porter")
    assert targets == [("ab", 2)]


def test_damerau_distance():
    assert damerau_levenshtein("ab", "ba") == 1  # transposition costs 1
    assert levenshtein("ab", "ba") == 2  # ... but 2 classic edits
    assert damerau_levenshtein("kitten", "sitting") == 3
    assert damerau_levenshtein("", "abc") == 3
    assert damerau_levenshtein("abc", "abc") == 0


def test_expansion_matches_python_oracle(spark, store, corpus):
    _, local = corpus
    vocab = _vocab_dfs(local)
    ts = spark.read.parquet(store.path("term_stats"))
    hit_any = False
    for target, edits in TARGETS:
        got = expand_fuzzy(ts, target, edits, max_expansions=1024)
        want = sorted(_expand_oracle(vocab, target, edits, cap=10**9))
        assert sorted(got) == want, (target, edits)
        hit_any = hit_any or bool(want)
    assert hit_any  # the corpus must actually exercise expansions


def test_expansion_cap_keeps_closest_then_popular(spark, store, corpus):
    _, local = corpus
    vocab = _vocab_dfs(local)
    ts = spark.read.parquet(store.path("term_stats"))
    # 2 edits of a 2-letter target matches many stopwords — the cap
    # keeps (dist asc, df desc, term asc), the FuzzyTermsEnum order
    cap = 5
    uncapped = _expand_oracle(vocab, "to", 2, cap=10**9)
    assert len(uncapped) > cap  # the cap must actually bind
    got = expand_fuzzy(ts, "to", 2, max_expansions=cap)
    want = _expand_oracle(vocab, "to", 2, cap=cap)
    assert got == want
    assert len(got) == cap


def test_prefix_length_and_transpositions(spark, store, corpus):
    _, local = corpus
    vocab = _vocab_dfs(local)
    ts = spark.read.parquet(store.path("term_stats"))
    got = expand_fuzzy(ts, "grap", 2, max_expansions=1024, prefix_length=2)
    want = sorted(_expand_oracle(vocab, "grap", 2, cap=10**9, prefix=2))
    assert sorted(got) == want
    # Damerau: a transposed pair within 1 edit that classic counts as 2
    vt = next((t for t in vocab if len(t) >= 4), None)
    assert vt is not None
    swapped = vt[1] + vt[0] + vt[2:]
    got = expand_fuzzy(ts, swapped, 1, max_expansions=1024, transpositions=True)
    want = sorted(_expand_oracle(vocab, swapped, 1, cap=10**9, damerau=True))
    assert sorted(got) == want
    assert vt in got


def test_prefix_pushdown_reaches_scan(spark, store):
    from pyspark.sql import functions as F

    ts = spark.read.parquet(store.path("term_stats")).select("term", "df")
    plan = (
        ts.filter(F.col("term").startswith("gr"))
        .filter(F.abs(F.length("term") - F.lit(4)) <= F.lit(2))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "StartsWith" in plan and "PushedFilters" in plan


def test_fuzzy_topk_matches_python_oracle(spark, store, corpus):
    _, local = corpus
    vocab = _vocab_dfs(local)
    for query in ("blok~1", "grap~1 block", "querri~2 th~1"):
        ts = spark.read.parquet(store.path("term_stats"))
        qts = fuzzy_terms(ts, query, "porter")
        targets, lits = parse_fuzzy_query(query, "porter")
        want_terms = set(lits)
        for target, edits in targets:
            want_terms.update(_expand_oracle(vocab, target, edits))
        assert qts == sorted(want_terms), query
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in fuzzy_topk(spark, store, query, 15).collect()
        ]
        want = bm25_rank(local, qts, 15, CFG.k1, CFG.b, "porter")
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), query


def test_fuzzy_rank_identical_to_expanded_plain_query(spark, store):
    ts = spark.read.parquet(store.path("term_stats"))
    qts = fuzzy_terms(ts, "blok~1", "porter")
    assert qts
    got = fuzzy_topk(spark, store, "blok~1", 10).collect()
    want = bm25_topk_wand(spark, store, " ".join(qts), 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_warm_fuzzy_matches_cold_and_caches(spark, store):
    s = Searcher(spark, store)
    try:
        cold = fuzzy_topk(spark, store, "blok~1 graph", 10).collect()
        warm = s.fuzzy("blok~1 graph", 10).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in warm] == [
            (r["doc_id"], round(r["score"], 9)) for r in cold
        ]
        assert ("blok", 1, 50, 0, False) in s._fuzzy_cache
        # repeated target answers from the cache (no new expansion)
        before = dict(s._fuzzy_cache)
        s.fuzzy("blok~1", 10).collect()
        assert s._fuzzy_cache == before
    finally:
        s.close()


def test_no_match_and_empty_query(spark, store):
    assert fuzzy_topk(spark, store, "zzzqqqxx~1", 5).count() == 0
    assert fuzzy_topk(spark, store, "", 5).count() == 0


def test_fuzzy_respects_deletes(spark, corpus, tmp_path_factory):
    from tangent_spark.streaming.incremental import delete_docs

    pages, _ = corpus
    store = build_index(
        spark, pages, str(tmp_path_factory.mktemp("fzd") / "idx"), CFG, url_col="url"
    )
    top = fuzzy_topk(spark, store, "blok~1", 5).collect()
    assert top
    victim = int(top[0]["doc_id"])
    delete_docs(spark, store, doc_ids=[victim], batch_id="fz-del-1")
    after = fuzzy_topk(spark, store, "blok~1", 5).collect()
    assert victim not in {int(r["doc_id"]) for r in after}


def test_front_door_routes_fuzzy(spark, store):
    from tangent_spark.api import route, search

    assert route("blok~1 query") == "fuzzy"
    assert route("querry~") == "fuzzy"
    assert route("plain words") == "bm25"
    assert route("dat* query") == "wildcard"
    assert route('+spark "a b"~2') == "boolean"
    got = search(spark, store, "blok~1 graph", 10).collect()
    want = fuzzy_topk(spark, store, "blok~1 graph", 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    # cursor paging composes: page 2 strictly after page 1's last row
    if len(want) >= 4:
        cur = (float(want[1]["score"]), int(want[1]["doc_id"]))
        page2 = search(spark, store, "blok~1 graph", 2, after=cur).collect()
        assert [(r["doc_id"], r["score"]) for r in page2] == [
            (r["doc_id"], r["score"]) for r in want[2:4]
        ]


def test_front_door_rejects_unsupported_fuzzy_combos(spark, store):
    from tangent_spark.api import search

    with pytest.raises(ValueError, match="boolean"):
        search(spark, store, "+spark querry~1", 5)
    with pytest.raises(ValueError, match="metadata"):
        search(spark, store, "blok~1", 5, where="lang = 'en'")
    with pytest.raises(ValueError, match="fuzzy"):
        search(spark, store, "blok~1", 5, group_by="source")
    with pytest.raises(ValueError, match="combined"):
        search(spark, store, "blok~1 qu*ry", 5)
    # phrase slop is proximity syntax, not a fuzzy term: routes to
    # boolean and serves
    assert search(spark, store, '+block "a b"~2', 5).count() >= 0
