"""Lucene sloppy-phrase (unordered slop) semantics — plans/phrase.py
in_order=False. The matching criterion is Lucene's SloppyPhraseMatcher:
adjusted positions a_i = p_i - slot_i, a configuration matches iff
max(a_i) - min(a_i) <= slop, with repeated-term slots picking distinct
underlying positions. phrase_tf keeps the module's convention (distinct
completion positions of the last slot). Verified against a brute-force
configuration enumerator on token sequences, plus Lucene's own
documented transposition example."""

import itertools
import random

import numpy as np
import pytest

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.phrase import phrase_tf_np


@pytest.fixture(scope="module")
def built_store(spark, tmp_path_factory):
    pages = pages_with_doc_ids(generate_pages(spark, 120, partitions=4)).persist()
    out = str(tmp_path_factory.mktemp("unord_idx") / "index")
    cfg = IndexConfig(n_shards=4, block_size=16, store_positions=True)
    store = build_index(spark, pages, out, cfg, url_col="url")
    yield store, pages
    pages.unpersist()


def brute_unordered_tf(plists, slop, term_keys):
    """Enumerate every configuration (one position per slot, distinct
    underlying positions for same-term slots) and count distinct
    last-slot completions with adjusted spread <= slop."""
    hits = set()
    for combo in itertools.product(*[list(map(int, p)) for p in plists]):
        seen = {}
        ok = True
        for t, p in zip(term_keys, combo):
            s = seen.setdefault(t, set())
            if p in s:
                ok = False
                break
            s.add(p)
        if not ok:
            continue
        adj = [p - i for i, p in enumerate(combo)]
        if max(adj) - min(adj) <= slop:
            hits.add(combo[-1])
    return len(hits)


def plists_from_text(tokens, phrase):
    """Per-slot position arrays from a token sequence (one term per
    position — exactly what the positions table stores)."""
    out = []
    for t in phrase:
        ps = [i for i, w in enumerate(tokens) if w == t]
        if not ps:
            return None
        out.append(np.asarray(ps, dtype=np.int64))
    return out


def test_lucene_transposition_example():
    # Lucene docs: "b a" needs slop 2 to match the phrase "a b"
    toks = ["b", "a"]
    pl = plists_from_text(toks, ["a", "b"])
    assert phrase_tf_np(pl, 2, in_order=False, term_keys=["a", "b"]) == 1
    assert phrase_tf_np(pl, 1, in_order=False, term_keys=["a", "b"]) == 0
    # in-order slop never matches the transposition
    assert phrase_tf_np(pl, 9, in_order=True) == 0


def test_slop_zero_unordered_is_exact():
    toks = "x a b y a c b".split()
    for phrase in (["a", "b"], ["a", "c", "b"]):
        pl = plists_from_text(toks, phrase)
        assert phrase_tf_np(pl, 0, in_order=False, term_keys=phrase) == \
            phrase_tf_np(pl, 0, in_order=True)


def test_repeated_term_needs_distinct_positions():
    # phrase "a a": a single 'a' token can NOT satisfy both slots
    toks = ["a", "x", "y"]
    pl = plists_from_text(toks, ["a", "a"])
    assert phrase_tf_np(pl, 3, in_order=False, term_keys=["a", "a"]) == 0
    # two 'a' tokens can
    toks = ["a", "x", "a"]
    pl = plists_from_text(toks, ["a", "a"])
    assert phrase_tf_np(pl, 1, in_order=False, term_keys=["a", "a"]) == 1


@pytest.mark.parametrize("seed", range(40))
def test_unordered_tf_matches_bruteforce(seed):
    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d"]
    toks = [rng.choice(vocab) for _ in range(rng.randint(4, 18))]
    n = rng.randint(2, 3)
    phrase = [rng.choice(vocab) for _ in range(n)]
    slop = rng.randint(0, 4)
    pl = plists_from_text(toks, phrase)
    if pl is None:
        return
    got = phrase_tf_np(pl, slop, in_order=False, term_keys=phrase)
    want = brute_unordered_tf(pl, slop, phrase)
    assert got == want, (toks, phrase, slop, got, want)


def test_unordered_matches_are_superset_of_inorder_docs():
    # any doc matching in-order also matches unordered at equal slop
    rng = random.Random(7)
    vocab = ["a", "b", "c"]
    for _ in range(30):
        toks = [rng.choice(vocab) for _ in range(rng.randint(4, 15))]
        phrase = [rng.choice(vocab) for _ in range(2)]
        slop = rng.randint(1, 3)
        pl = plists_from_text(toks, phrase)
        if pl is None:
            continue
        if phrase_tf_np(pl, slop, in_order=True) > 0:
            assert phrase_tf_np(pl, slop, in_order=False, term_keys=phrase) > 0


def test_boolean_route_unordered_phrases(spark, built_store):
    """api.search(unordered_phrases=True): warm == cold, the unordered
    match set contains the in-order one, and the flag is rejected off
    the boolean route."""
    from tangent_spark.api import search
    from tangent_spark.plans.boolean import boolean_topk
    from tangent_spark.plans.search import Searcher

    store, _ = built_store
    q = '"theorem matrix"~3 convergence'
    cold_in = [
        (r["doc_id"], round(r["score"], 9))
        for r in boolean_topk(spark, store, q, 50).collect()
    ]
    cold_un = [
        (r["doc_id"], round(r["score"], 9))
        for r in boolean_topk(
            spark, store, q, 50, unordered_phrases=True
        ).collect()
    ]
    api_un = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, store, q, 50, unordered_phrases=True
        ).collect()
    ]
    assert api_un == cold_un
    s = Searcher(spark, store, cache_positions=True)
    try:
        warm_un = [
            (r["doc_id"], round(r["score"], 9))
            for r in s.boolean(q, 50, unordered_phrases=True).collect()
        ]
    finally:
        s.close()
    assert warm_un == cold_un
    assert set(d for d, _ in cold_in) <= set(d for d, _ in cold_un)
    with pytest.raises(ValueError, match="unordered_phrases"):
        search(spark, store, "plain terms", 5, unordered_phrases=True)


def test_declarative_and_warm_paths_match_kernel(spark, built_store):
    """Cold phrase_topk(in_order=False) == warm Searcher.phrase
    (in_order=False), and both equal the per-doc numpy kernel run over
    the raw positions table."""
    from tangent_spark.plans.phrase import phrase_topk
    from tangent_spark.plans.search import Searcher

    store, pages = built_store
    query, slop, k = "theorem matrix", 3, 12
    cold = [
        (r["doc_id"], r["phrase_tf"])
        for r in phrase_topk(
            spark, store, query, k, slop=slop, in_order=False
        ).collect()
    ]
    s = Searcher(spark, store, cache_positions=True)
    try:
        warm = [
            (r["doc_id"], r["phrase_tf"])
            for r in s.phrase(query, k, slop=slop, in_order=False).collect()
        ]
    finally:
        s.close()
    assert cold == warm
    assert cold, "query must match in the fixture corpus"
    # ground truth from the raw positions table through the numpy twin
    from tangent_spark.plans.phrase import _phrase_terms

    terms = _phrase_terms(query, store.get_config().tokenizer)
    pos = spark.read.parquet(store.path("positions"))
    rows = pos.filter(pos.term.isin(terms)).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], {})[r["term"]] = np.asarray(
            r["positions"], dtype=np.int64
        )
    want = []
    for d, m in per_doc.items():
        if any(t not in m for t in terms):
            continue
        tf = phrase_tf_np(
            [m[t] for t in terms], slop, in_order=False, term_keys=terms
        )
        if tf > 0:
            want.append((d, tf))
    want.sort(key=lambda x: (-x[1], x[0]))
    assert cold == want[:k]
