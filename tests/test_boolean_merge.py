"""Boolean query language (plans/boolean.py) + index merge
(plans/merge.py) against pure-Python oracles and from-scratch builds."""

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.functions.tokenize import tokenize_porter
from tangent_spark.oracle import bm25_rank
from tangent_spark.plans.boolean import boolean_topk, parse_boolean_query
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.merge import merge_indexes
from tangent_spark.plans.search import Searcher, bm25_topk_wand

from tests.conftest import assert_rank_identical

N_DOCS = 240


@pytest.fixture(scope="module")
def corpus(spark):
    pages = pages_with_doc_ids(generate_pages(spark, N_DOCS, partitions=6)).persist()
    local = [
        (int(r["doc_id"]), r["text"]) for r in pages.select("doc_id", "text").collect()
    ]
    return pages, sorted(local)


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    pages, _ = corpus
    out = str(tmp_path_factory.mktemp("bool_idx") / "index")
    cfg = IndexConfig(n_shards=8, block_size=16, store_positions=True)
    return build_index(spark, pages, out, cfg, url_col="url")


# --- parser ------------------------------------------------------------------

def test_parse_boolean_query():
    cfg = IndexConfig()
    q = parse_boolean_query('matrix +theorem -slow "gradient descent"', cfg)
    assert q.should == tokenize_porter("matrix")
    assert q.must == tokenize_porter("theorem")
    assert q.must_not == tokenize_porter("slow")
    assert q.phrases == [(tokenize_porter("gradient descent"), 0)]
    assert not q.not_phrases
    # positive terms include phrase terms, deduped + sorted
    assert set(q.positive_terms) == set(
        tokenize_porter("matrix theorem gradient descent")
    )
    # negated phrase; quoted single word degrades to a plain term
    q2 = parse_boolean_query('-"gradient descent" +"matrix"', cfg)
    assert q2.not_phrases == [(tokenize_porter("gradient descent"), 0)]
    assert q2.must == tokenize_porter("matrix")
    # proximity suffix: "..."~N sets the phrase slop
    q3 = parse_boolean_query('"gradient descent"~3 -"a b"~1 fast', cfg)
    assert q3.phrases == [(tokenize_porter("gradient descent"), 3)]
    assert q3.not_phrases == [(tokenize_porter("a b"), 1)]
    assert q3.should == tokenize_porter("fast")


# --- boolean scoring vs oracle -----------------------------------------------

def _doc_terms(local):
    return {d: set(tokenize_porter(t)) for d, t in local}


def _oracle_boolean(local, should, must, must_not, k):
    """Brute force: BM25 over should+must terms, restricted to docs with
    every must term, minus docs with any must-not term."""
    terms = _doc_terms(local)
    pos = " ".join(sorted(set(should) | set(must)))
    must_s = set(tokenize_porter(" ".join(must)))
    not_s = set(tokenize_porter(" ".join(must_not)))
    full = bm25_rank(local, pos, len(local))
    out = [
        (d, s)
        for d, s in full
        if must_s <= terms[d] and not (not_s & terms[d])
    ]
    return out[:k]


@pytest.mark.parametrize(
    "should,must,must_not",
    [
        (["matrix", "convergence"], ["theorem"], []),
        (["matrix"], [], ["theorem"]),
        ([], ["matrix", "convergence"], ["theorem"]),
        (["matrix", "nonexistentterm"], [], []),
    ],
)
def test_boolean_topk_matches_oracle(spark, store, corpus, should, must, must_not):
    _, local = corpus
    qstr = " ".join(
        should + [f"+{t}" for t in must] + [f"-{t}" for t in must_not]
    )
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in boolean_topk(spark, store, qstr, 10).collect()
    ]
    assert_rank_identical(got, _oracle_boolean(local, should, must, must_not, 10))


def test_boolean_must_not_excludes(spark, store, corpus):
    _, local = corpus
    terms = _doc_terms(local)
    got = boolean_topk(spark, store, "matrix -theorem", 50).collect()
    assert got, "query should match something"
    for r in got:
        assert "theorem" not in terms[int(r["doc_id"])]


def test_boolean_requires_positive_clause(spark, store):
    with pytest.raises(ValueError):
        boolean_topk(spark, store, "-matrix -theorem", 10)


def test_proximity_phrase_matches_python_oracle(spark, store, corpus):
    """Sloppy phrases (`"a b"~slop`): the declarative (pos, slack) fold
    must equal a pure-python in-order-within-slack scan; slop=0 through
    the general fold must equal the exact array_intersect path."""
    from tangent_spark.plans.phrase import phrase_topk

    _pages, local = corpus
    toks0 = tokenize_porter(local[0][1])
    t1, t2, t3 = toks0[0], toks0[1], toks0[2]

    def positions(ts, t):
        return [i for i, x in enumerate(ts) if x == t]

    # 2-term: completion positions j of t2 with an earlier t1 within slack
    for slop in (0, 1, 3):
        def oracle_tf(text):
            ts = tokenize_porter(text)
            p1, p2 = positions(ts, t1), positions(ts, t2)
            return len({j for j in p2 if any(i < j and j - i - 1 <= slop for i in p1)})

        want = sorted(
            ((tf, d) for d, text in local if (tf := oracle_tf(text)) > 0),
            key=lambda x: (-x[0], x[1]),
        )[:15]
        got = [
            (r["phrase_tf"], r["doc_id"])
            for r in phrase_topk(spark, store, f"{t1} {t2}", 15, slop=slop).collect()
        ]
        assert got == want, slop
        assert len(got) > 0, slop

    # 3-term: total slack j - i1 - 2 <= slop with a t2 strictly between
    def oracle3(text, slop):
        ts = tokenize_porter(text)
        p1, p2, p3 = positions(ts, t1), positions(ts, t2), positions(ts, t3)
        return len({
            j for j in p3
            if any(
                i1 < i2 < j and j - i1 - 2 <= slop
                for i1 in p1 for i2 in p2
            )
        })

    for slop in (0, 2):
        want = sorted(
            ((tf, d) for d, text in local if (tf := oracle3(text, slop)) > 0),
            key=lambda x: (-x[0], x[1]),
        )[:15]
        got = [
            (r["phrase_tf"], r["doc_id"])
            for r in phrase_topk(
                spark, store, f"{t1} {t2} {t3}", 15, slop=slop
            ).collect()
        ]
        assert got == want, slop

    # grammar: a ~slop phrase clause restricts the boolean match set
    matching = {d for d, text in local if oracle_tf(text) > 0}
    got_b = {
        int(r["doc_id"])
        for r in boolean_topk(
            spark, store, f'matrix "{t1} {t2}"~3', 100
        ).collect()
    }
    assert got_b and got_b <= matching


def test_boolean_phrase_filters(spark, store, corpus):
    _, local = corpus
    # first bigram of doc 0 — guaranteed to occur somewhere
    toks0 = tokenize_porter(local[0][1])
    phrase_raw = " ".join(local[0][1].split()[:2])
    pts = tokenize_porter(phrase_raw)
    assert len(pts) >= 2, "need a 2-token phrase"

    def has_phrase(text):
        tt = tokenize_porter(text)
        return any(tt[i : i + len(pts)] == pts for i in range(len(tt)))

    got = boolean_topk(spark, store, f'matrix "{phrase_raw}"', 50).collect()
    matching = {d for d, t in local if has_phrase(t)}
    assert {int(r["doc_id"]) for r in got} <= matching
    # the oracle docs that also score on the positive terms must be there
    terms = _doc_terms(local)
    scorable = {
        d for d in matching
        if (set(tokenize_porter("matrix")) | set(pts)) & terms[d]
    }
    assert {int(r["doc_id"]) for r in got} == scorable


def test_warm_boolean_identical_to_cold(spark, store):
    q = 'matrix +theorem -slow'
    cold = [(int(r["doc_id"]), round(float(r["score"]), 9))
            for r in boolean_topk(spark, store, q, 10).collect()]
    s = Searcher(spark, store)
    try:
        warm = [(int(r["doc_id"]), round(float(r["score"]), 9))
                for r in s.boolean(q, 10).collect()]
    finally:
        s.close()
    assert warm == cold and warm


# --- highlight / snippet windows ---------------------------------------------

def _oracle_window(toks, qts):
    """Brute force best (covered desc, span asc, start asc) window."""
    occ = [(i, t) for i, t in enumerate(toks) if t in qts]
    best = None
    for a in range(len(occ)):
        seen = set()
        for b in range(a, len(occ)):
            seen = {t for _, t in occ[a : b + 1]}
            cand = (len(seen), occ[b][0] - occ[a][0], occ[a][0])
            key = (cand[0], -cand[1], -cand[2])
            if best is None or key > (best[0], -best[1], -best[2]):
                best = cand
    return best


def test_highlight_windows_match_bruteforce(spark, store, corpus):
    from tangent_spark.plans.phrase import highlight_windows

    _, local = corpus
    qts = sorted(set(tokenize_porter("matrix convergence theorem")))
    pos = spark.read.parquet(store.path("positions"))
    got = {
        int(r["doc_id"]): (r["n_terms_covered"], r["win_end"] - r["win_start"], r["win_start"])
        for r in highlight_windows(pos, qts).collect()
    }
    checked = 0
    for d, text in local:
        toks = tokenize_porter(text)
        exp = _oracle_window(toks, set(qts))
        if exp is None:
            assert d not in got
            continue
        assert got[d] == exp, f"doc {d}: {got[d]} != {exp}"
        checked += 1
    assert checked > 10


def test_snippet_topk_shape(spark, store):
    from tangent_spark.plans.phrase import snippet_topk

    rows = snippet_topk(spark, store, "matrix convergence theorem", 5).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_terms_covered"] >= 1
        assert r["win_end"] >= r["win_start"] >= 0
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_snippet_render_properties(spark, store, corpus):
    """Rendered snippets: tag-stripped text is an exact substring of
    the source doc; exactly the window's query-term tokens are wrapped
    (checked against an independent re-tokenization); context widening
    yields a superstring."""
    import re

    from tangent_spark.functions.porter import stem as porter_stem
    from tangent_spark.plans.phrase import snippet_render, snippet_topk

    pages, local = corpus
    q = "matrix convergence theorem"
    qts = set(tokenize_porter(q))
    snips = snippet_topk(spark, store, q, 5)
    wins = {int(r["doc_id"]): (int(r["win_start"]), int(r["win_end"]))
            for r in snips.collect()}
    got = {
        int(r["doc_id"]): r["snippet"]
        for r in snippet_render(snips, pages, q, "porter").collect()
    }
    assert set(got) == set(wins) and len(got) == 5
    texts = dict(local)
    rx = re.compile(r"[a-z0-9]+")
    for d, snip in got.items():
        text = texts[d]
        stripped = snip.replace("<em>", "").replace("</em>", "")
        assert stripped in text, d
        # wrapped tokens are exactly the window's query-term tokens
        wrapped = re.findall(r"<em>(.*?)</em>", snip)
        assert wrapped and all(
            porter_stem(w.lower()) in qts for w in wrapped
        ), d
        a, b = wins[d]
        window_toks = [m.group(0) for m in rx.finditer(text.lower())][a:b + 1]
        exp_n = sum(1 for t in window_toks if porter_stem(t) in qts)
        assert len(wrapped) == exp_n, d
        assert len(list(rx.finditer(stripped.lower()))) == len(window_toks), d
    wide = {
        int(r["doc_id"]): r["snippet"]
        for r in snippet_render(snips, pages, q, "porter", context=3).collect()
    }
    for d in got:
        assert got[d] in wide[d], d


# --- index merge -------------------------------------------------------------

@pytest.fixture(scope="module")
def merged_setup(spark, corpus, tmp_path_factory):
    pages, _ = corpus
    base = tmp_path_factory.mktemp("merge")
    cfg = IndexConfig(n_shards=8, block_size=16, store_positions=True)
    from pyspark.sql import functions as F

    half = N_DOCS // 2
    a = build_index(spark, pages.filter(F.col("doc_id") < half), str(base / "a"), cfg, url_col="url")
    b = build_index(spark, pages.filter(F.col("doc_id") >= half), str(base / "b"), cfg, url_col="url")
    merged = merge_indexes(spark, [a, b], str(base / "m"))
    full = build_index(spark, pages, str(base / "full"), cfg, url_col="url")
    return a, b, merged, full


def test_merge_stats_identical_to_full_build(spark, merged_setup):
    _, _, merged, full = merged_setup
    for t in ("term_stats", "corpus_stats"):
        m = sorted(map(tuple, merged.read(spark, t).collect()))
        f = sorted(map(tuple, full.read(spark, t).collect()))
        assert m == f, t
    assert (
        merged.counters()["postings"]["postings"]
        == full.counters()["postings"]["postings"]
    )


@pytest.mark.parametrize("query", ["matrix convergence theorem", "convergence"])
def test_merge_queries_rank_identical_to_full_build(spark, merged_setup, query):
    _, _, merged, full = merged_setup
    gm = [(int(r["doc_id"]), float(r["score"]))
          for r in bm25_topk_wand(spark, merged, query, 10).collect()]
    gf = [(int(r["doc_id"]), float(r["score"]))
          for r in bm25_topk_wand(spark, full, query, 10).collect()]
    assert_rank_identical(gm, gf, tol=1e-12)
    s = Searcher(spark, merged)
    try:
        gw = [(int(r["doc_id"]), float(r["score"]))
              for r in s.topk(query, 10).collect()]
    finally:
        s.close()
    assert_rank_identical(gw, gf, tol=1e-12)


def test_merge_positions_serve_phrases(spark, merged_setup, corpus):
    _, local = corpus
    _, _, merged, full = merged_setup
    from tangent_spark.plans.phrase import phrase_topk

    phrase = " ".join(local[0][1].split()[:2])
    gm = [(r["doc_id"], r["phrase_tf"]) for r in phrase_topk(spark, merged, phrase, 10).collect()]
    gf = [(r["doc_id"], r["phrase_tf"]) for r in phrase_topk(spark, full, phrase, 10).collect()]
    assert gm == gf and gm


def test_merge_rejects_overlapping_docs(spark, merged_setup, tmp_path):
    a, _, _, _ = merged_setup
    with pytest.raises(ValueError, match="overlap"):
        merge_indexes(spark, [a, a], str(tmp_path / "bad"))


def test_merge_rejects_config_mismatch(spark, corpus, merged_setup, tmp_path):
    pages, _ = corpus
    a, _, _, _ = merged_setup
    from pyspark.sql import functions as F

    other = build_index(
        spark,
        pages.filter(F.col("doc_id") >= N_DOCS - 10),
        str(tmp_path / "other"),
        IndexConfig(n_shards=4, block_size=16),
        url_col="url",
    )
    with pytest.raises(ValueError, match="config"):
        merge_indexes(spark, [a, other], str(tmp_path / "bad2"))


# --- conjunctive restriction precedes decode + shuffle (round-3 #1) ----------

def test_unbalanced_quote_falls_back_to_plain_term():
    cfg = IndexConfig()
    q = parse_boolean_query('he said "hello', cfg)
    assert q.should == tokenize_porter("he said hello")
    assert not q.phrases and not q.must and not q.must_not
    q2 = parse_boolean_query('-"stray +matrix', cfg)
    assert q2.must_not == tokenize_porter("stray")
    assert q2.must == tokenize_porter("matrix")


def test_must_restriction_skips_head_term_decode(spark, tmp_path_factory):
    """`the +<rare>`: the head term's posting list must NOT be decoded in
    full — candidates come from the rare must term, and head blocks with
    no candidate are skipped from block metadata alone. Requires >=5x
    fewer blocks decoded than the full-decode plan (accumulator), with
    the SAME ranked answer as the brute-force oracle."""
    from tangent_spark.oracle import bm25_rank

    pages = pages_with_doc_ids(generate_pages(spark, 1000, partitions=8))
    rare = "zweirdrare"
    pages = pages.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when((F.col("doc_id") % 251) == 0, F.lit(f" {rare}")).otherwise(F.lit("")),
        ),
    ).persist()
    out = str(tmp_path_factory.mktemp("headrare") / "index")
    cfg = IndexConfig(n_shards=4, block_size=16)
    store = build_index(spark, pages, out, cfg, url_col="url")

    qterms = sorted(set(tokenize_porter(f"the {rare}")))
    full_blocks = (
        spark.read.parquet(store.path("postings"))
        .filter(F.col("term").isin(qterms))
        .agg(F.sum(F.size("counts")))
        .collect()[0][0]
    )
    acc = spark.sparkContext.accumulator(0)
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in boolean_topk(spark, store, f"the +{rare}", 20, decode_counter=acc).collect()
    ]
    assert acc.value * 5 <= full_blocks, (acc.value, full_blocks)

    local = sorted(
        (int(r["doc_id"]), r["text"])
        for r in pages.select("doc_id", "text").collect()
    )
    rare_docs = {d for d, t in local if rare in t.split()}
    want = [
        (d, s)
        for d, s in bm25_rank(local, f"the {rare}", len(local))
        if d in rare_docs
    ][:20]
    assert_rank_identical(got, want)
    pages.unpersist()


def test_should_only_threshold_pruning(spark, tmp_path_factory):
    """`the zbursty -<rare>` has NO must seed, so it takes the
    should-only path — which must WAND (block-max threshold pruning,
    round-5): >=3x fewer blocks decoded than the full-decode plan
    (accumulator), with the SAME ranked answer as the brute-force
    oracle restricted by the must-not term. The corpus plants a
    high-scoring bursty term in a contiguous doc range so the top-k
    threshold rises above every bursty-free block's upper bound."""
    from tangent_spark.oracle import bm25_rank

    pages = pages_with_doc_ids(generate_pages(spark, 1000, partitions=8))
    rare, bursty = "zweirdrare", "zbursty"
    pages = pages.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when((F.col("doc_id") % 251) == 0, F.lit(f" {rare}")).otherwise(
                F.lit("")
            ),
            F.when(
                F.col("doc_id") < 40, F.lit((" " + bursty) * 20)
            ).otherwise(F.lit("")),
        ),
    ).persist()
    out = str(tmp_path_factory.mktemp("shouldonly") / "index")
    cfg = IndexConfig(n_shards=4, block_size=16)
    store = build_index(spark, pages, out, cfg, url_col="url")

    qterms = sorted(set(tokenize_porter(f"the {bursty} {rare}")))
    full_blocks = (
        spark.read.parquet(store.path("postings"))
        .filter(F.col("term").isin(qterms))
        .agg(F.sum(F.size("counts")))
        .collect()[0][0]
    )
    acc = spark.sparkContext.accumulator(0)
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in boolean_topk(
            spark, store, f"the {bursty} -{rare}", 5, decode_counter=acc
        ).collect()
    ]
    assert acc.value * 3 <= full_blocks, (acc.value, full_blocks)

    local = sorted(
        (int(r["doc_id"]), r["text"])
        for r in pages.select("doc_id", "text").collect()
    )
    rare_docs = {d for d, t in local if rare in t.split()}
    want = [
        (d, s)
        for d, s in bm25_rank(local, f"the {bursty}", len(local))
        if d not in rare_docs
    ][:5]
    assert_rank_identical(got, want)
    pages.unpersist()


def test_warm_phrase_and_snippets_match_cold(spark, store, corpus):
    from tangent_spark.plans.phrase import phrase_topk, snippet_topk

    _, local = corpus
    phrase = " ".join(local[0][1].split()[:2])
    query = "matrix convergence theorem"
    s = Searcher(spark, store)
    try:
        assert s.positions is not None  # store_positions index -> warm cache
        warm_p = [(r["doc_id"], r["phrase_tf"]) for r in s.phrase(phrase, 10).collect()]
        cold_p = [(r["doc_id"], r["phrase_tf"]) for r in phrase_topk(spark, store, phrase, 10).collect()]
        assert warm_p == cold_p and warm_p
        def _norm(rows):
            # warm (numpy log) vs cold (JVM log) idf may differ by 1 ulp
            return [
                (r["doc_id"], round(float(r["score"]), 9), r["win_start"],
                 r["win_end"], r["n_terms_covered"])
                for r in rows
            ]

        warm_s = _norm(s.snippets(query, 5).collect())
        cold_s = _norm(snippet_topk(spark, store, query, 5).collect())
        assert warm_s == cold_s and len(warm_s) == 5
    finally:
        s.close()


def test_warm_boolean_is_one_job_zero_shuffle(spark, store):
    """Round-4 plan shape: the whole warm conjunction (seed decode,
    restricted decode, aggregate, must/not filter, local top-k) runs
    inside one per-shard kernel over the cached partitions — ONE Spark
    job, no shuffle."""
    s = Searcher(spark, store)
    try:
        s.boolean("matrix +theorem -slow", 10).collect()  # warm the path
        sc = spark.sparkContext
        sc.setJobGroup("bool_one_job", "boolean one-job check")
        try:
            rows = s.boolean("matrix +theorem -slow", 10).collect()
        finally:
            sc.setJobGroup("bool_done", "")
        jobs = sc.statusTracker().getJobIdsForGroup("bool_one_job")
        assert len(jobs) == 1, f"warm boolean ran {len(jobs)} jobs"
        assert rows
    finally:
        s.close()


def _ran_stages(sc, group):
    """Stages of the group's jobs that actually RAN tasks (a cached
    RDD's parent stage is listed but skipped — 0 tasks run)."""
    n = 0
    for j in sc.statusTracker().getJobIdsForGroup(group):
        for st in sc.statusTracker().getJobInfo(j).stageIds:
            si = sc.statusTracker().getStageInfo(st)
            if si is not None and (si.numCompletedTasks or si.numActiveTasks):
                n += 1
    return n


def test_warm_phrase_in_kernel_one_job_single_stage(spark, store, corpus):
    """Round-5 (VERDICT r4 #4): warm phrase serving runs the positional
    intersection INSIDE the per-shard kernel over the combined serving
    cache — ONE job, ONE executed stage (zero shuffle), rank-identical
    to the cold declarative fold, for exact and sloppy phrases."""
    from tangent_spark.plans.phrase import phrase_topk

    _, local = corpus
    phrase = " ".join(local[0][1].split()[:3])
    s = Searcher(spark, store)
    sc = spark.sparkContext
    try:
        for slop in (0, 2):
            warm = [
                (int(r["doc_id"]), int(r["phrase_tf"]))
                for r in s.phrase(phrase, 10, slop=slop).collect()
            ]
            cold = [
                (int(r["doc_id"]), int(r["phrase_tf"]))
                for r in phrase_topk(spark, store, phrase, 10, slop=slop).collect()
            ]
            assert warm == cold and warm, (slop, warm, cold)
        sc.setJobGroup("phrase_one_job", "")
        try:
            s.phrase(phrase, 10).collect()
        finally:
            sc.setJobGroup("phrase_done", "")
        jobs = sc.statusTracker().getJobIdsForGroup("phrase_one_job")
        assert len(jobs) == 1, f"warm phrase ran {len(jobs)} jobs"
        assert _ran_stages(sc, "phrase_one_job") == 1
    finally:
        s.close()


def test_warm_boolean_phrase_in_kernel(spark, store, corpus):
    """Warm boolean queries WITH phrase clauses (+phrase / -phrase /
    bare phrase / sloppy phrase) resolve the phrases inside the shard
    kernel: rank-identical to the cold join-based plan, still ONE job
    and ONE executed stage (zero shuffle in the phrase step)."""
    _, local = corpus
    phrase = " ".join(local[0][1].split()[:2])
    queries = [
        f'matrix +"{phrase}"',
        f'theorem -"{phrase}"',
        f'"{phrase}" convergence',
        f'matrix +"{phrase}"~2',
    ]
    s = Searcher(spark, store)
    sc = spark.sparkContext
    try:
        for q in queries:
            warm = [
                (int(r["doc_id"]), round(float(r["score"]), 9))
                for r in s.boolean(q, 10).collect()
            ]
            cold = [
                (int(r["doc_id"]), round(float(r["score"]), 9))
                for r in boolean_topk(spark, store, q, 10).collect()
            ]
            assert warm == cold and warm, (q, warm, cold)
        sc.setJobGroup("boolp_one_job", "")
        try:
            s.boolean(queries[0], 10).collect()
        finally:
            sc.setJobGroup("boolp_done", "")
        jobs = sc.statusTracker().getJobIdsForGroup("boolp_one_job")
        assert len(jobs) == 1, f"warm boolean+phrase ran {len(jobs)} jobs"
        assert _ran_stages(sc, "boolp_one_job") == 1
    finally:
        s.close()


def test_warm_phrase_clause_restricts_decode(spark, tmp_path_factory):
    """A required phrase acts like a must clause in the warm kernel:
    its doc set is intersected into the candidates BEFORE any postings
    decode, so `the +"<rare phrase>"` decodes a small fraction of the
    head term's blocks (the phrase-free blocks skip on metadata)."""
    marker = "zqx zvw"
    pages = pages_with_doc_ids(generate_pages(spark, 1000, partitions=8))
    pages = pages.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when((F.col("doc_id") % 211) == 0, F.lit(f" {marker}")).otherwise(
                F.lit("")
            ),
        ),
    ).persist()
    out = str(tmp_path_factory.mktemp("phrasecand") / "index")
    cfg = IndexConfig(n_shards=4, block_size=16, store_positions=True)
    store = build_index(spark, pages, out, cfg, url_col="url")

    qterms = sorted(set(tokenize_porter("the zqx zvw")))
    full_blocks = (
        spark.read.parquet(store.path("postings"))
        .filter(F.col("term").isin(qterms))
        .agg(F.sum(F.size("counts")))
        .collect()[0][0]
    )
    s = Searcher(spark, store)
    try:
        acc = spark.sparkContext.accumulator(0)
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in s.boolean(f'the +"{marker}"', 20, decode_counter=acc).collect()
        ]
        assert acc.value * 5 <= full_blocks, (acc.value, full_blocks)
    finally:
        s.close()

    local = sorted(
        (int(r["doc_id"]), r["text"])
        for r in pages.select("doc_id", "text").collect()
    )
    phrase_docs = {d for d, t in local if marker in t}
    want = [
        (d, sc_)
        for d, sc_ in bm25_rank(local, f"the {marker}", len(local))
        if d in phrase_docs
    ][:20]
    assert_rank_identical(got, want)
    pages.unpersist()


def test_parse_slop_edge_cases():
    """ADVICE r4: slop-suffix edge cases must not silently misparse.
    '"a b" ~2' (detached slop) attaches to the preceding phrase instead
    of adding a bogus numeric term; '"a b"~2x' (glued junk) degrades to
    plain terms like any malformed quoting; a '~N' with no preceding
    phrase is dropped."""
    cfg = IndexConfig()
    q = parse_boolean_query('"gradient descent" ~2', cfg)
    assert q.phrases == [(tokenize_porter("gradient descent"), 2)]
    assert not q.should and not q.must and not q.must_not

    # explicit suffix wins; a later detached slop cannot override it
    q2 = parse_boolean_query('"gradient descent"~3 ~5', cfg)
    assert q2.phrases == [(tokenize_porter("gradient descent"), 3)]

    q3 = parse_boolean_query('"a b"~2x matrix', cfg)
    assert not q3.phrases and not q3.not_phrases
    assert q3.should == tokenize_porter("a") + tokenize_porter("b 2x matrix")

    q4 = parse_boolean_query("~7 matrix", cfg)
    assert q4.should == tokenize_porter("matrix") and not q4.phrases

    # detached slop attaches to a NEGATED phrase too
    q5 = parse_boolean_query('-"gradient descent" ~1 fast', cfg)
    assert q5.not_phrases == [(tokenize_porter("gradient descent"), 1)]
    assert q5.should == tokenize_porter("fast")


# --- minimum_should_match ----------------------------------------------------

def test_resolve_mm():
    """Solr mm spec grammar (boolean.resolve_mm): positive ints are
    Lucene as-is (overshoot = match nothing upstream), negative and
    percentage forms follow the Solr dismax rules and clamp."""
    from tangent_spark.plans.boolean import resolve_mm

    assert resolve_mm(None, 4) == 0
    assert resolve_mm(0, 4) == 0
    assert resolve_mm("", 4) == 0
    assert resolve_mm(2, 4) == 2
    assert resolve_mm(9, 4) == 9        # as-is: plan returns no hits
    assert resolve_mm("9", 4) == 9
    assert resolve_mm(-1, 4) == 3       # all but one
    assert resolve_mm(-9, 4) == 0
    assert resolve_mm("-1", 4) == 3
    assert resolve_mm("50%", 4) == 2
    assert resolve_mm("75%", 4) == 3
    assert resolve_mm("80%", 4) == 3    # floor
    assert resolve_mm("-25%", 4) == 3
    assert resolve_mm("200%", 4) == 4   # percent forms clamp
    assert resolve_mm("-200%", 4) == 0


def _oracle_mm(local, should, mm, k, must=(), must_not=()):
    """Brute force with the mm constraint: BM25 over all positive
    terms, restricted to docs with >= mm distinct should terms (plus
    the usual must / must-not constraints)."""
    terms = _doc_terms(local)
    should_s = set(tokenize_porter(" ".join(should)))
    must_s = set(tokenize_porter(" ".join(must)))
    not_s = set(tokenize_porter(" ".join(must_not)))
    pos = " ".join(sorted(should_s | must_s))
    full = bm25_rank(local, pos, len(local))
    out = [
        (d, s)
        for d, s in full
        if len(should_s & terms[d]) >= mm
        and must_s <= terms[d]
        and not (not_s & terms[d])
    ]
    return out[:k]


def test_mm_should_only_matches_oracle(spark, store, corpus):
    """Should-only queries take the threshold-pruning sweep; mm must
    filter per range without breaking rank-exactness."""
    _, local = corpus
    should = ["matrix", "convergence", "theorem"]
    for mm in (1, 2, 3):
        got = [
            (int(r["doc_id"]), float(r["score"]))
            for r in boolean_topk(
                spark, store, " ".join(should), 15, min_should_match=mm
            ).collect()
        ]
        assert_rank_identical(got, _oracle_mm(local, should, mm, 15))
    # mm=2 must be a strict subset situation vs mm=1 on this corpus
    n1 = len(_oracle_mm(local, should, 1, 10**9))
    n2 = len(_oracle_mm(local, should, 2, 10**9))
    assert n2 < n1, "corpus should discriminate mm=1 vs mm=2"


def test_mm_with_must_and_not_matches_oracle(spark, store, corpus):
    """mm composes with must (conjunction kernel path) and must-not."""
    _, local = corpus
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in boolean_topk(
            spark, store, "matrix convergence +theorem -slow", 15,
            min_should_match=2,
        ).collect()
    ]
    want = _oracle_mm(
        local, ["matrix", "convergence"], 2, 15,
        must=["theorem"], must_not=["slow"],
    )
    assert_rank_identical(got, want)


def test_mm_above_should_count_matches_nothing(spark, store):
    assert boolean_topk(
        spark, store, "matrix convergence", 10, min_should_match=3
    ).count() == 0
    # Lucene: mm > 0 with zero should clauses also matches nothing
    assert boolean_topk(
        spark, store, "+matrix", 10, min_should_match=1
    ).count() == 0


def test_mm_warm_matches_cold(spark, store):
    s = Searcher(spark, store)
    try:
        for q, mm in [("matrix convergence theorem", 2),
                      ("matrix convergence +theorem", "100%")]:
            warm = [
                (r["doc_id"], round(float(r["score"]), 9))
                for r in s.boolean(q, 15, min_should_match=mm).collect()
            ]
            cold = [
                (r["doc_id"], round(float(r["score"]), 9))
                for r in boolean_topk(
                    spark, store, q, 15, min_should_match=mm
                ).collect()
            ]
            assert warm == cold and warm
    finally:
        s.close()


def test_mm_api_routing_and_rejections(spark, store, corpus):
    """Front door: mm serves bm25/boolean routes, rejects the rest."""
    from tangent_spark.api import search

    _, local = corpus
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in search(
            spark, store, "matrix convergence theorem", k=15,
            min_should_match=2,
        ).collect()
    ]
    assert_rank_identical(
        got, _oracle_mm(local, ["matrix", "convergence", "theorem"], 2, 15)
    )
    with pytest.raises(ValueError, match="min_should_match"):
        search(spark, store, "mat*", k=5, min_should_match=1)
    with pytest.raises(ValueError, match="min_should_match"):
        search(
            spark, store, "matrix theorem", k=5,
            min_should_match=1, group_by="lang",
        )


# --- Lucene boosts in the boolean grammar ------------------------------------

def test_parse_boosts():
    cfg = IndexConfig()
    q = parse_boolean_query('matrix^2 +theorem^3 -slow^9 "gradient descent"^1.5', cfg)
    assert q.boosts["matrix"] == 2.0
    assert q.boosts[tokenize_porter("theorem")[0]] == 3.0
    assert tokenize_porter("slow")[0] not in q.boosts  # must-not boost ignored
    g, d = tokenize_porter("gradient descent")
    assert q.boosts[g] == 1.5 and q.boosts[d] == 1.5
    # slop-then-boost suffix order (Lucene), and detached ^B repair
    q2 = parse_boolean_query('"gradient descent"~3^2', cfg)
    assert q2.phrases == [([g, d], 3)] and q2.boosts[g] == 2.0
    q3 = parse_boolean_query('"gradient descent" ^2', cfg)
    assert q3.phrases == [([g, d], 0)] and q3.boosts[d] == 2.0
    # malformed boost suffix degrades like malformed slop
    q4 = parse_boolean_query('"a b"^2x', cfg)
    assert not q4.phrases and not q4.boosts


def _oracle_boosted_boolean(local, weighted, k, must=(), must_not=(), mm=0,
                            should=()):
    """Per-term BM25 contributions scaled by boost, membership rules
    applied driver-side."""
    from collections import defaultdict

    terms = _doc_terms(local)
    must_s = set(tokenize_porter(" ".join(must)))
    not_s = set(tokenize_porter(" ".join(must_not)))
    should_s = set(tokenize_porter(" ".join(should)))
    acc = defaultdict(float)
    for term, w in weighted.items():
        for d, s in bm25_rank(local, [term], 10**9):
            acc[d] += w * s
    out = [
        (d, s)
        for d, s in sorted(acc.items(), key=lambda x: (-x[1], x[0]))
        if must_s <= terms[d]
        and not (not_s & terms[d])
        and (mm == 0 or len(should_s & terms[d]) >= mm)
    ]
    return out[:k]


def test_boolean_boosts_match_oracle(spark, store, corpus):
    """Boosts ride the idf map, so the conjunction kernel, the
    should-only sweep, and mm all stay rank-exact under them."""
    _, local = corpus
    m, c, t = (tokenize_porter(w)[0] for w in ("matrix", "convergence", "theorem"))

    # conjunction path: +must^3 with boosted should
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in boolean_topk(
            spark, store, "matrix^2 +theorem^3 -slow", 15
        ).collect()
    ]
    want = _oracle_boosted_boolean(
        local, {m: 2.0, t: 3.0}, 15, must=["theorem"], must_not=["slow"]
    )
    assert_rank_identical(got, want)

    # should-only sweep path + mm
    got2 = [
        (int(r["doc_id"]), float(r["score"]))
        for r in boolean_topk(
            spark, store, "matrix^2 convergence theorem^0.5", 15,
            min_should_match=2,
        ).collect()
    ]
    want2 = _oracle_boosted_boolean(
        local, {m: 2.0, c: 1.0, t: 0.5}, 15, mm=2,
        should=["matrix", "convergence", "theorem"],
    )
    assert_rank_identical(got2, want2)


def test_boolean_boosts_warm_matches_cold(spark, store):
    s = Searcher(spark, store)
    try:
        q = 'matrix^2 +theorem "gradient descent"^1.5'
        warm = [
            (r["doc_id"], round(float(r["score"]), 9))
            for r in s.boolean(q, 15).collect()
        ]
        cold = [
            (r["doc_id"], round(float(r["score"]), 9))
            for r in boolean_topk(spark, store, q, 15).collect()
        ]
        assert warm == cold
    finally:
        s.close()


def test_warm_highlights_match_cold_render(spark, store, corpus):
    from tangent_spark.plans.phrase import snippet_render, snippet_topk

    pages, _ = corpus
    q = "matrix convergence theorem"
    cold = [
        (int(r["doc_id"]), r["snippet"])
        for r in snippet_render(
            snippet_topk(spark, store, q, 5), pages, q, "porter"
        ).collect()
    ]
    s = Searcher(spark, store)
    try:
        warm = [
            (int(r["doc_id"]), r["snippet"])
            for r in s.highlights(q, 5, pages).collect()
        ]
    finally:
        s.close()
    assert warm == cold and len(warm) == 5


# --- Lucene classic QueryParser keyword operators (AND/OR/NOT/&&/||/!) -------

def test_parse_keyword_operators():
    """Pairwise Lucene classic-QueryParser semantics: a clause is MUST
    when an adjacent operator is AND; NOT prohibits the next clause and
    wins over AND; OR is the default (and clears a pending AND);
    lowercase keywords stay ordinary terms."""
    cfg = IndexConfig(tokenizer="simple")

    def shape(q):
        bq = parse_boolean_query(q, cfg)
        return (bq.should, bq.must, bq.must_not)

    assert shape("a AND b OR c") == (["c"], ["a", "b"], [])       # Lucene: +a +b c
    assert shape("a OR b AND c") == (["a"], ["b", "c"], [])       # Lucene: a +b +c
    assert shape("a AND NOT b") == ([], ["a"], ["b"])             # NOT wins over AND
    assert shape("NOT a AND b") == ([], ["b"], ["a"])
    assert shape("a NOT b") == (["a"], [], ["b"])
    assert shape("!a b") == (["b"], [], ["a"])                    # !term == -term
    assert shape("a && b || c") == (["c"], ["a", "b"], [])
    assert shape("a and b or c") == (["a", "and", "b", "or", "c"], [], [])
    assert shape("+a AND -b") == ([], ["a"], ["b"])               # explicit mods win
    # dangling operators degrade instead of raising (parser discipline)
    assert shape("AND a") == ([], ["a"], [])
    assert shape("a AND") == ([], ["a"], [])
    assert shape("NOT") == ([], [], [])
    assert shape("OR OR") == ([], [], [])


def test_parse_keyword_operators_with_phrases():
    cfg = IndexConfig(tokenizer="simple")
    q = parse_boolean_query('"x y" AND z', cfg)
    assert q.phrases == [(["x", "y"], 0)] and q.must == ["z"]
    q = parse_boolean_query('a OR NOT "x y"', cfg)
    assert q.should == ["a"] and q.not_phrases == [(["x", "y"], 0)]
    q = parse_boolean_query('!"x y" a', cfg)
    assert q.not_phrases == [(["x", "y"], 0)] and q.should == ["a"]
    # detached ~N repair token stays transparent to a pending AND
    q = parse_boolean_query('"a b" ~2 AND c', cfg)
    assert q.phrases == [(["a", "b"], 2)] and q.must == ["c"]


KEYWORD_EQUIV = [
    ("matrix AND theorem NOT slow", "+matrix +theorem -slow"),
    ("matrix OR theorem", "matrix theorem"),
    ("matrix AND NOT theorem", "+matrix -theorem"),
    ("!slow matrix", "-slow matrix"),
    ("matrix && convergence || theorem", "+matrix +convergence theorem"),
]


@pytest.mark.parametrize("kw_query,plain_query", KEYWORD_EQUIV)
def test_keyword_query_rank_identical_to_plain(spark, store, kw_query, plain_query):
    """A keyword-operator query must produce EXACTLY the ranking of its
    +/- twin through the full engine (same kernel, same scores)."""
    kw = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in boolean_topk(spark, store, kw_query, 10).collect()
    ]
    plain = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in boolean_topk(spark, store, plain_query, 10).collect()
    ]
    assert kw == plain and kw


def test_keyword_query_warm_matches_cold(spark, store):
    q = "matrix AND convergence NOT slow"
    cold = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in boolean_topk(spark, store, q, 10).collect()
    ]
    s = Searcher(spark, store)
    try:
        warm = [
            (int(r["doc_id"]), round(float(r["score"]), 9))
            for r in s.boolean(q, 10).collect()
        ]
    finally:
        s.close()
    assert warm == cold and warm


# --- Occur.FILTER clauses (#term — ES bool.filter: required, non-scoring) ----

def test_parse_filter_clauses():
    cfg = IndexConfig(tokenizer="simple")
    q = parse_boolean_query("#a b +c -d", cfg)
    assert (q.filters, q.should, q.must, q.must_not) == (["a"], ["b"], ["c"], ["d"])
    # boosting a filter is meaningless and ignored (like must_not)
    q = parse_boolean_query("#a^2 b", cfg)
    assert q.filters == ["a"] and q.boosts == {}
    # a filter chunk tokenizing to several tokens keeps them all
    assert parse_boolean_query("#data-base x", cfg).filters == ["data", "base"]
    with pytest.raises(ValueError, match="filter phrases"):
        parse_boolean_query('#"a b" c', cfg)


def test_filter_clause_membership_and_scores(spark, store):
    """`matrix #theorem` must match EXACTLY the docs of
    `matrix +theorem` but score each as plain BM25 of `matrix` alone
    (the filter contributes membership, never score) — Lucene
    Occur.FILTER / ES bool.filter."""
    from tangent_spark.plans.search import bm25_topk_index_full

    filt = {
        int(r["doc_id"]): round(float(r["score"]), 9)
        for r in boolean_topk(spark, store, "matrix #theorem", 1000).collect()
    }
    plus = {
        int(r["doc_id"])
        for r in boolean_topk(spark, store, "matrix +theorem", 1000).collect()
    }
    assert set(filt) == plus and filt
    plain = {
        int(r["doc_id"]): round(float(r["score"]), 9)
        for r in bm25_topk_index_full(spark, store, "matrix", 1000).collect()
    }
    for d, s in filt.items():
        # a doc matching the filter but not the should term serves at
        # score 0 (ES: sum over scoring clauses present = 0)
        assert s == plain.get(d, 0.0)
    # a term that is BOTH should and filter scores once (Lucene: two
    # clauses — membership from the filter, score from the should)
    both = {
        int(r["doc_id"]): round(float(r["score"]), 9)
        for r in boolean_topk(spark, store, "matrix #matrix", 1000).collect()
    }
    for d, s in both.items():
        assert s == plain[d]  # every match contains matrix here


def test_pure_filter_query_scores_zero(spark, store, corpus):
    """`#matrix #theorem` = ES bool with only filter clauses: the full
    conjunction match set at constant score 0.0, doc_id order."""
    _, local = corpus
    got = [
        (int(r["doc_id"]), float(r["score"]))
        for r in boolean_topk(spark, store, "#matrix #theorem", 1000).collect()
    ]
    terms = _doc_terms(local)
    want_ids = sorted(
        d for d, ts in terms.items() if "matrix" in ts and "theorem" in ts
    )
    assert [d for d, _ in got] == want_ids and want_ids
    assert all(s == 0.0 for _, s in got)


def test_filter_clause_warm_matches_cold(spark, store):
    q = "matrix convergence #theorem -slow"
    cold = [
        (int(r["doc_id"]), round(float(r["score"]), 9))
        for r in boolean_topk(spark, store, q, 10).collect()
    ]
    s = Searcher(spark, store)
    try:
        warm = [
            (int(r["doc_id"]), round(float(r["score"]), 9))
            for r in s.boolean(q, 10).collect()
        ]
    finally:
        s.close()
    assert warm == cold and warm


def test_filter_clause_mm_counts_should_only(spark, store, corpus):
    """minimum_should_match counts SHOULD terms only — a filter clause
    neither satisfies nor consumes mm."""
    _, local = corpus
    terms = _doc_terms(local)
    got = [
        int(r["doc_id"])
        for r in boolean_topk(
            spark, store, "matrix convergence #theorem", 100, min_should_match=2
        ).collect()
    ]
    assert got
    need = set(tokenize_porter("matrix convergence theorem"))
    for d in got:
        assert need <= terms[d]


def test_filter_clause_absent_term_matches_nothing(spark, store):
    assert boolean_topk(spark, store, "matrix #zzzxqqy", 10).count() == 0
