"""Wildcard and regexp term queries (plans/wildcard.py): expansion vs
pure-python glob / re.fullmatch oracles over the vocabulary, cap
semantics, pushdown, and rank-identity of the served scores with BM25
over the expanded set.
"""

import fnmatch
import math
import re as _re
from collections import Counter

import pytest

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.functions.tokenize import tokenize_porter
from tangent_spark.oracle import bm25_rank
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.search import Searcher, bm25_topk_wand
from tangent_spark.plans.wildcard import (
    expand_pattern,
    expand_regexp,
    literal_prefix,
    parse_regexp_query,
    parse_wildcard_query,
    regexp_prefix,
    regexp_terms,
    regexp_topk,
    wildcard_regex,
    wildcard_terms,
    wildcard_topk,
)

CFG = IndexConfig(n_shards=4, block_size=16)
N = 150
PATTERNS = ["con*", "ma?h", "*tion", "va?ue*", "th*m"]


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
        spark, pages, str(tmp_path_factory.mktemp("wc") / "idx"), CFG, url_col="url"
    )


def _vocab_dfs(local):
    dfs = Counter()
    for _, text in local:
        for t in set(tokenize_porter(text)):
            dfs[t] += 1
    return dfs


def _glob(vocab, pattern):
    return sorted(t for t in vocab if fnmatch.fnmatchcase(t, pattern))


def test_regex_and_prefix():
    assert wildcard_regex("te*t") == "^te.*t$"
    assert wildcard_regex("?u.ry") == "^.u\\.ry$"
    assert literal_prefix("con*") == "con"
    assert literal_prefix("*tion") == ""
    assert literal_prefix("ma?h") == "ma"


def test_parse_separates_patterns_from_literals():
    pats, lits = parse_wildcard_query("Data qu*ry  ?ndex data", "porter")
    assert pats == ["?ndex", "qu*ry"]
    assert lits == ["data"]
    # punctuation inside a wildcard token drops to the index alphabet;
    # a token of pure wildcards survives (cap bounds it); an empty one
    # drops entirely
    pats, lits = parse_wildcard_query('"fo*o!" * ,', "porter")
    assert pats == ["*", "fo*o"]
    assert lits == []


def test_expansion_matches_glob_oracle(spark, store, corpus):
    _, local = corpus
    vocab = _vocab_dfs(local)
    ts = spark.read.parquet(store.path("term_stats"))
    hit_any = False
    for pattern in PATTERNS:
        got = sorted(expand_pattern(ts, pattern, 1024))
        want = _glob(vocab, pattern)
        assert got == want, pattern
        hit_any = hit_any or bool(want)
    assert hit_any  # the corpus must actually exercise expansions


def test_expansion_cap_keeps_top_df(spark, store, corpus):
    _, local = corpus
    vocab = _vocab_dfs(local)
    ts = spark.read.parquet(store.path("term_stats"))
    # '*' matches the whole vocabulary — the cap keeps the highest-df
    # terms (df desc, term asc), the top-terms rewrite order
    cap = 7
    got = expand_pattern(ts, "*", cap)
    want = [t for _, t in sorted(((-d, t) for t, d in vocab.items()))[:cap]]
    assert sorted(got) == sorted(want)
    assert len(got) == cap


def test_prefix_pushdown_reaches_scan(spark, store):
    ts = spark.read.parquet(store.path("term_stats")).select("term", "df")
    from pyspark.sql import functions as F

    plan = ts.filter(F.col("term").startswith("con")).filter(
        F.col("term").rlike(wildcard_regex("con*ed"))
    )._jdf.queryExecution().executedPlan().toString()
    assert "StartsWith" in plan and "PushedFilters" in plan


def test_wildcard_topk_matches_python_oracle(spark, store, corpus):
    _, local = corpus
    vocab = _vocab_dfs(local)
    for query in ("con* data", "ma?h", "*tion value"):
        qts = wildcard_terms(
            spark.read.parquet(store.path("term_stats")), query, "porter", 1024
        )
        pats, lits = parse_wildcard_query(query, "porter")
        want_terms = set(lits)
        for p in pats:
            want_terms.update(_glob(vocab, p))
        assert qts == sorted(want_terms), query
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in wildcard_topk(spark, store, query, 15).collect()
        ]
        want = bm25_rank(local, qts, 15, CFG.k1, CFG.b, "porter")
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), query


def test_wildcard_rank_identical_to_expanded_plain_query(spark, store):
    ts = spark.read.parquet(store.path("term_stats"))
    qts = wildcard_terms(ts, "con*", "porter", 1024)
    assert qts
    got = wildcard_topk(spark, store, "con*", 10).collect()
    want = bm25_topk_wand(spark, store, " ".join(qts), 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_warm_wildcard_matches_cold_and_caches(spark, store):
    s = Searcher(spark, store)
    try:
        cold = wildcard_topk(spark, store, "con* data", 10).collect()
        warm = s.wildcard("con* data", 10).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in warm] == [
            (r["doc_id"], round(r["score"], 9)) for r in cold
        ]
        assert ("con*", 1024) in s._wildcard_cache
        # repeated pattern answers from the cache (no new expansion)
        before = dict(s._wildcard_cache)
        s.wildcard("con*", 10).collect()
        assert s._wildcard_cache == before
    finally:
        s.close()


def test_no_match_and_empty_query(spark, store):
    assert wildcard_topk(spark, store, "zzzqqq*", 5).count() == 0
    assert wildcard_topk(spark, store, "", 5).count() == 0


def test_wildcard_respects_deletes(spark, corpus, tmp_path_factory):
    from tangent_spark.streaming.incremental import delete_docs

    pages, _ = corpus
    store = build_index(
        spark, pages, str(tmp_path_factory.mktemp("wcd") / "idx"), CFG, url_col="url"
    )
    top = wildcard_topk(spark, store, "con*", 5).collect()
    assert top
    victim = int(top[0]["doc_id"])
    delete_docs(spark, store, doc_ids=[victim], batch_id="wc-del-1")
    after = wildcard_topk(spark, store, "con*", 5).collect()
    assert victim not in {int(r["doc_id"]) for r in after}


def test_front_door_routes_wildcards(spark, store):
    from tangent_spark.api import route, search

    assert route("dat* query") == "wildcard"
    assert route("?uery") == "wildcard"
    assert route("plain words") == "bm25"
    assert route('+spark "a b"') == "boolean"
    got = search(spark, store, "con* data", 10).collect()
    want = wildcard_topk(spark, store, "con* data", 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    # cursor paging composes: page 2 strictly after page 1's last row
    if len(want) >= 4:
        cur = (float(want[1]["score"]), int(want[1]["doc_id"]))
        page2 = search(spark, store, "con* data", 2, after=cur).collect()
        assert [(r["doc_id"], r["score"]) for r in page2] == [
            (r["doc_id"], r["score"]) for r in want[2:4]
        ]


REGEXPS = ["con.*", "ma.h", ".*tion", "th(e|eorem)", "grap.?"]


def test_regexp_prefix_extraction():
    assert regexp_prefix("conv.*") == "conv"
    assert regexp_prefix("abc*") == "ab"  # '*' may erase the 'c'
    assert regexp_prefix("abc?") == "ab"
    assert regexp_prefix("abc{0,2}") == "ab"
    assert regexp_prefix("a|b") == ""  # alternation voids the prefix
    assert regexp_prefix("ab(c|d)") == ""
    assert regexp_prefix(r"\d+") == ""
    assert regexp_prefix("plain") == "plain"


def test_parse_regexp_query():
    bodies, lits = parse_regexp_query("Data /QU.RY/ /the+/ data", "porter")
    assert bodies == ["qu.ry", "the+"]
    assert lits == ["data"]


def test_malformed_regexp_raises_clean_valueerror(spark, store):
    ts = spark.read.parquet(store.path("term_stats"))
    with pytest.raises(ValueError, match="invalid regexp"):
        expand_regexp(ts, "[", 10)


def test_regexp_expansion_matches_fullmatch_oracle(spark, store, corpus):
    _, local = corpus
    vocab = _vocab_dfs(local)
    ts = spark.read.parquet(store.path("term_stats"))
    hit_any = False
    for body in REGEXPS:
        got = sorted(expand_regexp(ts, body, 1024))
        want = sorted(t for t in vocab if _re.fullmatch(body, t))
        assert got == want, body
        hit_any = hit_any or bool(want)
    assert hit_any


def test_regexp_cap_keeps_top_df(spark, store, corpus):
    _, local = corpus
    vocab = _vocab_dfs(local)
    ts = spark.read.parquet(store.path("term_stats"))
    cap = 7
    got = expand_regexp(ts, ".*", cap)  # whole vocabulary, cap binds
    want = [t for _, t in sorted(((-d, t) for t, d in vocab.items()))[:cap]]
    assert sorted(got) == sorted(want)


def test_regexp_rank_identical_to_expanded_plain_query(spark, store):
    ts = spark.read.parquet(store.path("term_stats"))
    qts = regexp_terms(ts, "/con.*/ data", "porter")
    assert qts
    got = regexp_topk(spark, store, "/con.*/ data", 10).collect()
    want = bm25_topk_wand(spark, store, " ".join(qts), 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_warm_regexp_matches_cold_and_caches(spark, store):
    s = Searcher(spark, store)
    try:
        cold = regexp_topk(spark, store, "/con.*/ data", 10).collect()
        warm = s.regexp("/con.*/ data", 10).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in warm] == [
            (r["doc_id"], round(r["score"], 9)) for r in cold
        ]
        assert ("re", "con.*", 1024) in s._wildcard_cache
        before = dict(s._wildcard_cache)
        s.regexp("/con.*/", 10).collect()
        assert s._wildcard_cache == before
    finally:
        s.close()


def test_front_door_routes_regexp(spark, store):
    from tangent_spark.api import route, search

    assert route("/con.*/ data") == "regexp"
    assert route("/a~1/") == "regexp"  # slash token wins over fuzzy
    assert route("con* data") == "wildcard"
    got = search(spark, store, "/con.*/ data", 10).collect()
    want = regexp_topk(spark, store, "/con.*/ data", 10).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]
    if len(want) >= 4:
        cur = (float(want[1]["score"]), int(want[1]["doc_id"]))
        page2 = search(spark, store, "/con.*/ data", 2, after=cur).collect()
        assert [(r["doc_id"], r["score"]) for r in page2] == [
            (r["doc_id"], r["score"]) for r in want[2:4]
        ]


def test_front_door_rejects_unsupported_regexp_combos(spark, store):
    from tangent_spark.api import search

    with pytest.raises(ValueError, match="boolean"):
        search(spark, store, "+spark /con.*/", 5)
    with pytest.raises(ValueError, match="metadata"):
        search(spark, store, "/con.*/", 5, where="lang = 'en'")
    with pytest.raises(ValueError, match="regexp"):
        search(spark, store, "/con.*/", 5, group_by="source")
    with pytest.raises(ValueError, match="combined"):
        search(spark, store, "/con.*/ qu*ry", 5)
    with pytest.raises(ValueError, match="combined"):
        search(spark, store, "/con.*/ querry~1", 5)


def test_front_door_rejects_unsupported_wildcard_combos(spark, store):
    import pytest as _pt

    from tangent_spark.api import search

    with _pt.raises(ValueError, match="boolean"):
        search(spark, store, "+spark qu*ry", 5)
    with _pt.raises(ValueError, match="metadata"):
        search(spark, store, "con*", 5, where="lang = 'en'")
    with _pt.raises(ValueError, match="wildcard"):
        search(spark, store, "con*", 5, group_by="source")
    # '?' INSIDE a quoted phrase is punctuation, not a glob: routes to
    # boolean and serves (the tokenizer strips it)
    assert search(spark, store, '+data "how?"', 5).count() >= 0


# ---- reversed term dictionary (leading wildcards at scale) ----------------
# Solr/Lucene answer `*ing` with ReversedWildcardFilter (the token is
# indexed reversed so the query rewrites to the prefix query 'gni*');
# here the reversed form is a derived side table of the vocabulary,
# sorted by r_term so the reversed prefix predicate prunes the scan.


def test_rev_table_written_reversed_and_range_sorted(spark, store):
    from pyspark.sql import functions as F

    from tangent_spark.plans.wildcard import REV_TABLE, load_rev_terms

    rev = load_rev_terms(spark, store)
    assert rev is not None
    ts = spark.read.parquet(store.path("term_stats"))
    assert rev.count() == ts.count()
    assert rev.filter(F.reverse(F.col("term")) != F.col("r_term")).count() == 0
    # layout claim: files hold disjoint, internally sorted r_term ranges
    # (range partition + sort), so min/max stats prune at file level
    per_file = (
        rev.select("r_term", F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(F.min("r_term").alias("lo"), F.max("r_term").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi_prev), (lo, _) in zip(spans, spans[1:]):
        assert hi_prev <= lo
    assert store.table_version(REV_TABLE) == store.table_version("term_stats")


def test_leading_wildcard_rev_route_equals_forward_scan(spark, store, corpus):
    _, local = corpus
    vocab = _vocab_dfs(local)
    from tangent_spark.plans.wildcard import load_rev_terms

    ts = spark.read.parquet(store.path("term_stats"))
    rev = load_rev_terms(spark, store)
    for pattern in ("*tion", "?ath", "*alu?", "*"):
        via_rev = sorted(expand_pattern(ts, pattern, 1024, term_stats_rev=rev))
        forward = sorted(expand_pattern(ts, pattern, 1024))
        assert via_rev == forward, pattern
        assert via_rev == _glob(vocab, pattern), pattern


def test_rev_route_pushes_reversed_prefix_to_scan(spark, store):
    from tangent_spark.plans.wildcard import load_rev_terms, pattern_scan

    ts = spark.read.parquet(store.path("term_stats"))
    rev = load_rev_terms(spark, store)
    plan = (
        pattern_scan(ts, "*tion", term_stats_rev=rev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the reversed literal suffix is the pushed prefix key
    assert "StartsWith(r_term,noit)" in plan.replace(" ", "")
    assert "PushedFilters" in plan
    # trailing-wildcard patterns must keep the forward prefix route even
    # when the rev table is offered
    fwd = (
        pattern_scan(ts, "con*", term_stats_rev=rev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "StartsWith(term,con)" in fwd.replace(" ", "")


def test_wildcard_topk_without_rev_table_falls_back(
    spark, corpus, tmp_path_factory
):
    """Stores built before the rev table existed keep answering
    leading-wildcard queries (forward vocabulary scan)."""
    import shutil

    pages, local = corpus
    base = str(tmp_path_factory.mktemp("wcold") / "idx")
    st = build_index(spark, pages, base, CFG, url_col="url")
    from tangent_spark.plans.wildcard import REV_TABLE, load_rev_terms

    shutil.rmtree(st.path(REV_TABLE), ignore_errors=True)
    assert load_rev_terms(spark, st) is None
    vocab = _vocab_dfs(local)
    got = [
        int(r["doc_id"]) for r in wildcard_topk(spark, st, "*tion", 10).collect()
    ]
    qts = _glob(vocab, "*tion")
    want = [d for d, _ in bm25_rank(local, qts, 10, CFG.k1, CFG.b, "porter")]
    assert got == want


def test_rev_table_rides_append_and_compaction(spark, tmp_path_factory):
    """The reversed dictionary flips in lockstep with term_stats through
    the whole store lifecycle: append (merged stats) and delete +
    compaction (rebuilt stats) both regenerate it; at every point it is
    exactly reverse(term_stats)."""
    from pyspark.sql import functions as F

    from tangent_spark.plans.wildcard import REV_TABLE, load_rev_terms
    from tangent_spark.streaming.incremental import (
        append_batch,
        compact_postings,
        delete_docs,
    )

    pages = pages_with_doc_ids(generate_pages(spark, 60, partitions=4)).persist()
    first = pages.filter(F.col("doc_id") < 40)
    second = pages.filter(F.col("doc_id") >= 40).drop("doc_id")
    base = str(tmp_path_factory.mktemp("wrev") / "idx")
    st = build_index(spark, first, base, CFG, url_col="url")

    def assert_consistent():
        rev = load_rev_terms(spark, st)
        assert rev is not None
        ts = spark.read.parquet(st.path("term_stats"))
        diff = (
            rev.select(F.col("term"), F.col("r_term"))
            .withColumn("want", F.reverse(F.col("term")))
            .filter(F.col("r_term") != F.col("want"))
            .count()
        )
        assert diff == 0
        assert rev.count() == ts.count()
        missing = ts.join(rev.select("term"), "term", "left_anti").count()
        assert missing == 0
        assert st.table_version(REV_TABLE) == st.table_version("term_stats")

    assert_consistent()
    append_batch(spark, st, second, batch_id=1)
    assert_consistent()
    ids = [
        int(r["doc_id"])
        for r in spark.read.parquet(st.path("docs")).limit(5).collect()
    ]
    delete_docs(spark, st, ids, batch_id=2)
    compact_postings(spark, st)
    assert_consistent()
    # and the rev route still answers over the post-compaction vocab
    ts = spark.read.parquet(st.path("term_stats"))
    rev = load_rev_terms(spark, st)
    assert sorted(expand_pattern(ts, "*tion", 1024, term_stats_rev=rev)) == sorted(
        expand_pattern(ts, "*tion", 1024)
    )
