"""Query-assist surfaces (plans/suggest.py): prefix term suggestions
and more-like-this, against pure-python oracles over the same corpus.
"""

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.functions.tokenize import tokenize_porter
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.search import Searcher
from tangent_spark.plans.suggest import (
    did_you_mean,
    mlt_query_terms,
    more_like_this,
    suggest_terms,
)

CFG = IndexConfig(n_shards=4, block_size=16)
N = 150


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
        spark, pages, str(tmp_path_factory.mktemp("sug") / "idx"), CFG, url_col="url"
    )


def _local_stats(local):
    tf, dl = {}, {}
    for d, text in local:
        toks = tokenize_porter(text)
        if toks:
            tf[d] = Counter(toks)
            dl[d] = len(toks)
    return tf, dl


def test_suggest_matches_vocabulary_oracle(spark, store, corpus):
    _, local = corpus
    tf, _ = _local_stats(local)
    for prefix in ("con", "ma", "th"):
        dfs = Counter()
        for c in tf.values():
            for t in c:
                if t.startswith(prefix):
                    dfs[t] += 1
        want = sorted(((d, t) for t, d in dfs.items()), key=lambda x: (-x[0], x[1]))[:8]
        got = [
            (int(r["df"]), r["term"])
            for r in suggest_terms(spark, store, prefix, 8).collect()
        ]
        assert got == want and got, prefix


def test_suggest_warm_and_edges(spark, store):
    s = Searcher(spark, store)
    try:
        warm = [(r["term"], r["df"]) for r in s.suggest("con", 8).collect()]
        cold = [(r["term"], r["df"]) for r in suggest_terms(spark, store, "con", 8).collect()]
        assert warm == cold and warm
        # a multi-word box completes the token being TYPED (the last
        # one), not the alphabetically-first already-complete word
        multi = [(r["term"], r["df"]) for r in s.suggest("matrix con", 8).collect()]
        assert multi == cold
    finally:
        s.close()
    assert [
        (r["term"], r["df"])
        for r in suggest_terms(spark, store, "matrix con", 8).collect()
    ] == cold
    assert suggest_terms(spark, store, "", 8).count() == 0
    assert suggest_terms(spark, store, "zzzzqq", 8).count() == 0


def _mlt_oracle(local, doc_id, max_terms, k):
    """Pure-python MLT: top tf*idf terms of the source doc, then BM25
    over them, source excluded."""
    tf, dl = _local_stats(local)
    n = len(dl)
    avgdl = sum(dl.values()) / n
    dfs_all = Counter()
    for c in tf.values():
        dfs_all.update(c.keys())

    def idf(d):
        return math.log(1.0 + (n - d + 0.5) / (d + 0.5))

    src = tf[doc_id]
    sel = sorted(
        ((t_tf * idf(dfs_all[t]), t) for t, t_tf in src.items()),
        key=lambda x: (-x[0], x[1]),
    )
    qts = sorted(t for _, t in sel[:max_terms])
    scores = {}
    for d, counts in tf.items():
        if d == doc_id:
            continue
        s = 0.0
        for t in qts:
            if t in counts:
                t_tf = counts[t]
                s += idf(dfs_all[t]) * t_tf * 2.2 / (
                    t_tf + 1.2 * (1.0 - 0.75 + 0.75 * dl[d] / avgdl)
                )
        if s > 0:
            scores[d] = s
    return qts, sorted(
        ((d, round(s, 9)) for d, s in scores.items()),
        key=lambda x: (-x[1], x[0]),
    )[:k]


def test_mlt_matches_python_oracle(spark, store, corpus):
    _, local = corpus
    for doc_id in (0, 17, 42):
        want_terms, want = _mlt_oracle(local, doc_id, 10, 10)
        assert mlt_query_terms(spark, store, doc_id, 10) == want_terms
        got = [
            (int(r["doc_id"]), round(float(r["score"]), 9))
            for r in more_like_this(spark, store, doc_id, 10).collect()
        ]
        assert got == want and got, doc_id
        assert doc_id not in {d for d, _ in got}


def test_mlt_warm_matches_cold(spark, store, corpus):
    s = Searcher(spark, store)
    try:
        for doc_id in (0, 42):
            warm = [
                (int(r["doc_id"]), round(float(r["score"]), 9))
                for r in s.more_like_this(doc_id, 10).collect()
            ]
            cold = [
                (int(r["doc_id"]), round(float(r["score"]), 9))
                for r in more_like_this(spark, store, doc_id, 10).collect()
            ]
            assert warm == cold and warm, doc_id
    finally:
        s.close()


def test_mlt_unknown_doc_is_empty(spark, store):
    assert more_like_this(spark, store, 10**9, 10).count() == 0


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_did_you_mean_matches_python_oracle(spark, store, corpus):
    _, local = corpus
    tf, _ = _local_stats(local)
    dfs = Counter()
    for c in tf.values():
        dfs.update(c.keys())
    for typo in ("matrux", "theorm", "converk"):
        tok = tokenize_porter(typo)[-1]
        want = sorted(
            (
                (_lev(t, tok), -d, t)
                for t, d in dfs.items()
                if _lev(t, tok) <= 1
            ),
        )[:5]
        want = [(t, -nd, dist) for dist, nd, t in want]
        got = [
            (r["term"], int(r["df"]), int(r["dist"]))
            for r in did_you_mean(spark, store, typo, 5).collect()
        ]
        assert got == want and got, (typo, tok, got, want)


def test_did_you_mean_warm_and_exact_term(spark, store):
    s = Searcher(spark, store)
    try:
        warm = [
            (r["term"], r["df"], r["dist"])
            for r in s.did_you_mean("matrux", 5).collect()
        ]
        cold = [
            (r["term"], r["df"], r["dist"])
            for r in did_you_mean(spark, store, "matrux", 5).collect()
        ]
        assert warm == cold and warm
        # a correctly spelled vocabulary term ranks itself first (dist 0)
        top = s.did_you_mean("matrix", 3).collect()[0]
        assert top["dist"] == 0 and top["term"] == tokenize_porter("matrix")[0]
    finally:
        s.close()
    assert did_you_mean(spark, store, "", 5).count() == 0


# --- spellcheck collation -----------------------------------------------------

def test_spellcheck_collate_corrects_oov_tokens(spark, store, corpus):
    from tangent_spark.plans.suggest import dym_plan, spellcheck_collate

    _, local = corpus
    # a real corpus term (stemmed) + a misspelling of another
    vocab = Counter()
    for _, text in local:
        vocab.update(set(tokenize_porter(text)))
    good = vocab.most_common(1)[0][0]
    # pick a term and misspell it by swapping a middle char to 'q'
    target = next(t for t, _ in vocab.most_common(30) if len(t) >= 5 and t != good)
    typo = target[:2] + "q" + target[3:]
    assert typo not in vocab
    r = spellcheck_collate(spark, store, f"{good} {typo}").collect()[0]
    ts = spark.read.parquet(store.path("term_stats"))
    best = dym_plan(ts, tokenize_porter(typo)[0], 1, 1).collect()
    expected_fix = best[0]["term"] if best and best[0]["dist"] > 0 else typo
    assert r["collation"] == f"{good} {expected_fix}"
    assert r["n_corrected"] == (1 if expected_fix != typo else 0)
    # hits oracle: docs containing >= 1 collated term
    cts = set(tokenize_porter(r["collation"]))
    exp_hits = sum(1 for _, text in local if cts & set(tokenize_porter(text)))
    assert r["hits"] == exp_hits > 0


def test_spellcheck_collate_edges(spark, store):
    from tangent_spark.plans.suggest import spellcheck_collate

    # unfixable garbage: unchanged, zero hits, zero corrections
    r = spellcheck_collate(spark, store, "zzqqxxyy wwvvkkjj").collect()[0]
    assert r["n_corrected"] == 0 and r["hits"] == 0
    # empty input
    r = spellcheck_collate(spark, store, "???").collect()[0]
    assert r["collation"] == "" and r["hits"] == 0 and r["n_corrected"] == 0
