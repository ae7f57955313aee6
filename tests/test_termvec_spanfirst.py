"""Per-doc term vectors (plans/termvec.py — the ES _termvectors
surface) and SpanFirstQuery (plans/phrase.span_first_match/_topk), both
against pure-python oracles over the raw corpus."""

import pytest
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.corpus import generate_pages, pages_with_doc_ids
from tangent_spark.functions.tokenize import tokenize_porter, tokenize_simple
from tangent_spark.plans.indexer import build_index
from tangent_spark.plans.phrase import span_first_match, span_first_topk
from tangent_spark.plans.termvec import term_vectors

N_DOCS = 80
CFG = IndexConfig(n_shards=4, block_size=16, store_positions=True)


@pytest.fixture(scope="module")
def corpus(spark):
    pages = pages_with_doc_ids(generate_pages(spark, N_DOCS, partitions=4)).persist()
    local = {
        int(r["doc_id"]): r["text"] for r in pages.select("doc_id", "text").collect()
    }
    return pages, local


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    pages, _ = corpus
    out = str(tmp_path_factory.mktemp("tv") / "idx")
    return build_index(spark, pages, out, CFG, url_col="url")


def _tok(text, tokenizer):
    return tokenize_porter(text) if tokenizer == "porter" else tokenize_simple(text)


def _py_tv(local, doc_ids, tokenizer):
    """(doc_id, term) -> (tf, df, positions) from raw text."""
    df: dict[str, int] = {}
    for text in local.values():
        for t in set(_tok(text, tokenizer)):
            df[t] = df.get(t, 0) + 1
    out = {}
    for d in doc_ids:
        pos: dict[str, list[int]] = {}
        for i, t in enumerate(_tok(local[d], tokenizer)):
            pos.setdefault(t, []).append(i)
        for t, ps in pos.items():
            out[(d, t)] = (len(ps), df[t], ps)
    return out


def test_term_vectors_match_python_oracle(spark, corpus, store):
    _, local = corpus
    ids = [0, 17, 42]
    exp = _py_tv(local, ids, store.get_config().tokenizer)
    got = term_vectors(spark, store, ids, with_positions=True).collect()
    assert len(got) == len(exp)
    for r in got:
        e = exp[(int(r["doc_id"]), r["term"])]
        assert (int(r["tf"]), int(r["df"]), list(r["positions"])) == e, r
    # sorted (doc_id, term)
    keys = [(int(r["doc_id"]), r["term"]) for r in got]
    assert keys == sorted(keys)


def test_term_vectors_without_positions(spark, corpus, store):
    _, local = corpus
    got = term_vectors(spark, store, [3]).collect()
    exp = _py_tv(local, [3], store.get_config().tokenizer)
    assert {(r["term"], r["tf"], r["df"]) for r in got} == {
        (t, tf, df) for (_, t), (tf, df, _) in exp.items()
    }
    assert "positions" not in got[0].asDict()


def test_term_vectors_validation(spark, store, corpus, tmp_path_factory):
    with pytest.raises(ValueError, match="no doc ids"):
        term_vectors(spark, store, [])
    pages, _ = corpus
    bare = build_index(
        spark, pages, str(tmp_path_factory.mktemp("tvnp") / "idx"),
        IndexConfig(n_shards=2, block_size=16, store_positions=False),
        url_col="url",
    )
    with pytest.raises(ValueError, match="positions"):
        term_vectors(spark, bare, [0], with_positions=True)
    # positions-less call works on the bare index
    assert term_vectors(spark, bare, [0]).count() > 0


def _py_span_first(local, terms, end, tokenizer):
    """doc_id -> span_tf: occurrences of the consecutive phrase whose
    last position + 1 <= end."""
    out = {}
    m = len(terms)
    for d, text in local.items():
        toks = _tok(text, tokenizer)
        n = 0
        for i in range(min(len(toks), end) - m + 1):
            if toks[i : i + m] == terms and i + m <= end:
                n += 1
        if n:
            out[d] = n
    return out


@pytest.mark.parametrize("end", [1, 5, 25, 100, 10_000])
def test_span_first_single_term(spark, corpus, store, end):
    pages, local = corpus
    cfg = store.get_config()
    term = _tok("matrix", cfg.tokenizer)[0]
    pos = spark.read.parquet(store.path("positions"))
    got = {
        int(r["doc_id"]): int(r["span_tf"])
        for r in span_first_match(pos, [term], end).collect()
    }
    assert got == _py_span_first(local, [term], end, cfg.tokenizer)


def test_span_first_phrase(spark, corpus, store):
    pages, local = corpus
    cfg = store.get_config()
    # find a bigram that actually occurs so the test has teeth
    sample = _tok(local[0], cfg.tokenizer)
    terms = sample[:2]
    pos = spark.read.parquet(store.path("positions"))
    for end in (2, 10, 50):
        got = {
            int(r["doc_id"]): int(r["span_tf"])
            for r in span_first_match(pos, terms, end).collect()
        }
        exp = _py_span_first(local, terms, end, cfg.tokenizer)
        assert got == exp, end
    assert _py_span_first(local, terms, 10_000, cfg.tokenizer)  # non-trivial


def test_span_first_end_zero_and_oov(spark, store):
    pos = spark.read.parquet(store.path("positions"))
    assert span_first_match(pos, ["matrix"], 0).count() == 0
    assert span_first_match(pos, ["zzzunseen"], 100).count() == 0
    with pytest.raises(ValueError):
        span_first_match(pos, [], 10)


def test_span_first_topk_ordering(spark, corpus, store):
    _, local = corpus
    cfg = store.get_config()
    got = span_first_topk(spark, store, "matrix", 40, 5).collect()
    exp = sorted(
        _py_span_first(
            local, _tok("matrix", cfg.tokenizer), 40, cfg.tokenizer
        ).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert [(int(r["doc_id"]), int(r["span_tf"])) for r in got] == exp


# --- match_phrase_prefix (ES search-as-you-type) ----------------------------


def _py_phrase_prefix(local, lead, prefix, tokenizer, slop=0, max_expansions=50):
    vocab = sorted({t for tx in local.values() for t in _tok(tx, tokenizer)})
    exps = set([t for t in vocab if t.startswith(prefix)][:max_expansions])
    out = {}
    for d, text in local.items():
        toks = _tok(text, tokenizer)
        comp = set()
        m = len(lead)
        for q in range(len(toks)):
            if toks[q] not in exps:
                continue
            if m == 0:
                comp.add(q)
                continue
            # lead positions p1<..<pm < q, in order, total gap <= slop
            def ok(idx, start, slack):
                if idx == m:
                    gap = q - start - 1
                    return gap >= 0 and slack + gap <= slop
                for p in range(start + 1, len(toks)):
                    if toks[p] == lead[idx]:
                        g = p - start - 1 if idx > 0 else 0
                        if idx > 0 and slack + g > slop:
                            break
                        if ok(idx + 1, p, slack + (g if idx > 0 else 0)):
                            return True
                return False

            if ok(0, -1, 0):
                comp.add(q)
        if comp:
            out[d] = len(comp)
    return out


@pytest.mark.parametrize("slop", [0, 2])
def test_phrase_prefix_matches_python_oracle(spark, corpus, store, slop):
    from tangent_spark.plans.phrase import phrase_prefix_match

    pages, local = corpus
    cfg = store.get_config()
    toks0 = _tok(local[0], cfg.tokenizer)
    # a real bigram from the corpus guarantees >= 1 match
    lead, prefix = [toks0[0]], toks0[1][:2]
    pos = spark.read.parquet(store.path("positions"))
    vocab = store.read(spark, "term_stats")
    got = {
        int(r["doc_id"]): int(r["phrase_tf"])
        for r in phrase_prefix_match(pos, vocab, lead, prefix, slop=slop).collect()
    }
    exp = _py_phrase_prefix(local, lead, prefix, cfg.tokenizer, slop=slop)
    assert got == exp
    assert exp  # non-trivial


def test_phrase_prefix_bare_prefix_counts_occurrences(spark, corpus, store):
    """No lead terms: phrase_tf == total occurrences of all expansions
    (distinct positions)."""
    from tangent_spark.plans.phrase import phrase_prefix_match

    _, local = corpus
    cfg = store.get_config()
    pos = spark.read.parquet(store.path("positions"))
    got = {
        int(r["doc_id"]): int(r["phrase_tf"])
        for r in phrase_prefix_match(
            pos, store.read(spark, "term_stats"), [], "ma"
        ).collect()
    }
    exp = _py_phrase_prefix(local, [], "ma", cfg.tokenizer)
    assert got == exp and exp


def test_phrase_prefix_max_expansions_alphabetical(spark, corpus, store):
    """max_expansions=1 keeps only the alphabetically-first expansion
    (the Lucene term-dictionary order contract)."""
    from tangent_spark.plans.phrase import phrase_prefix_match

    _, local = corpus
    cfg = store.get_config()
    pos = spark.read.parquet(store.path("positions"))
    vocab = store.read(spark, "term_stats")
    capped = {
        int(r["doc_id"]): int(r["phrase_tf"])
        for r in phrase_prefix_match(pos, vocab, [], "ma", max_expansions=1).collect()
    }
    exp = _py_phrase_prefix(local, [], "ma", cfg.tokenizer, max_expansions=1)
    assert capped == exp
    full = _py_phrase_prefix(local, [], "ma", cfg.tokenizer)
    assert sum(capped.values()) <= sum(full.values())


def test_phrase_prefix_topk_and_validation(spark, corpus, store):
    from tangent_spark.plans.phrase import phrase_prefix_topk

    _, local = corpus
    cfg = store.get_config()
    lead_raw = local[0].split()[0]
    got = phrase_prefix_topk(spark, store, f"{lead_raw} th*", 5).collect()
    lead = _tok(lead_raw, cfg.tokenizer)
    exp = sorted(
        _py_phrase_prefix(local, lead, "th", cfg.tokenizer).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )[:5]
    assert [(int(r["doc_id"]), int(r["phrase_tf"])) for r in got] == exp
    assert phrase_prefix_topk(spark, store, "zzz*", 5).count() == 0
    with pytest.raises(ValueError, match="prefix"):
        phrase_prefix_topk(spark, store, "row *", 5)


def test_api_phrase_prefix_route(spark, corpus, store):
    """api.search(phrase_prefix=True) == phrase_prefix_topk directly;
    shaping options are rejected, never silently dropped."""
    from tangent_spark.api import search
    from tangent_spark.plans.phrase import phrase_prefix_topk

    _, local = corpus
    lead_raw = local[0].split()[0]
    q = f"{lead_raw} th*"
    via_api = search(spark, store, q, k=5, phrase_prefix=True).collect()
    direct = phrase_prefix_topk(spark, store, q, 5).collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in via_api] == [
        (r["doc_id"], r["phrase_tf"]) for r in direct
    ]
    with pytest.raises(ValueError, match="not supported"):
        search(spark, store, q, k=5, phrase_prefix=True, sort_by="lang")
