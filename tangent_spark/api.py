"""Front-door search API: one call that routes a query to the right
engine path, the way the reference's top-level query driver does
(reference comp_query.py builds a combined math+text query from a topic
and dispatches to the math index and the Solr text core).

Routing rules (deterministic, inspectable via `route()`):

  * query contains a MathML fragment (``<math``/``mws:qvar``)
        -> formula Dice over the expression index
           (plans.formula.dice_topk_docs); any plain-text remainder
           outside the MathML contributes BM25 text scores, combined
           with the reference's dynamic weight rule
           (plans.rerank.combine_math_text).
  * query uses boolean syntax (+term / -term / "a phrase")
        -> plans.boolean.boolean_topk over the word index.
  * query has a regexp token (/que.y/)
        -> plans.wildcard.regexp_topk (Lucene RegexpQuery: anchored
           match against the vocabulary, top-terms scoring-boolean
           rewrite, then the standard block-max kernel).
  * query has a fuzzy token (querry~ / querry~1)
        -> plans.fuzzy.fuzzy_topk (Lucene FuzzyQuery: vocabulary
           terms within max_edits expand into a disjunction, then
           the standard block-max kernel).
  * query has a bare wildcard token (te*t / ?uery)
        -> plans.wildcard.wildcard_topk (Lucene MultiTermQuery
           top-terms scoring-boolean rewrite over the vocabulary,
           then the standard block-max kernel).
  * anything else
        -> warm BM25 (Searcher) when one is supplied, else one-shot
           block-max WAND (plans.search.bm25_topk_wand).

`stores` carries the word index and (optionally) the formula index —
they are separate IndexStores because their build inputs differ
(tokenized text vs extracted MathML), exactly as the reference keeps
Solr cores separate from its math index files.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from tangent_spark.sources.store import IndexStore

_MATH = re.compile(r"<math|<mws:qvar", re.IGNORECASE)
_BOOL = re.compile(r'(^|\s)[+\-#!]\S|"|(^|\s)(AND|OR|NOT|&&|\|\|)(\s|$)')
_MATH_BLOCK = re.compile(r"<math.*?</math>", re.IGNORECASE | re.DOTALL)
_WILD = re.compile(r"[*?]")


@dataclass
class SearchStores:
    words: IndexStore
    formulas: IndexStore | None = None
    vectors: IndexStore | None = None  # plans/ann.build_ann_index store


def route(query: str) -> str:
    """'match_all' | 'formula' | 'boolean' | 'regexp' | 'fuzzy' |
    'wildcard' | 'bm25' — which path search() will take. Wildcard metacharacters /
    fuzzy suffixes / regexp tokens inside boolean syntax route to
    'boolean' and are rejected there (explicitly unsupported
    combinations — see search()); a MathML query keeps its
    `*`/`?`/`~` (they are formula markup, not operators). Regexp
    wins over fuzzy/wildcard (a `/.../` token is unambiguous and its
    body may contain their metacharacters)."""
    from tangent_spark.plans.fuzzy import is_fuzzy_token
    from tangent_spark.plans.wildcard import is_regexp_token

    if query.strip() == "*:*":
        return "match_all"  # Solr q=*:* — before the wildcard check
    if _MATH.search(query):
        return "formula"
    if _BOOL.search(query):
        return "boolean"
    if any(is_regexp_token(t) for t in query.split()):
        return "regexp"
    if any(is_fuzzy_token(t) for t in query.split()):
        return "fuzzy"
    if _WILD.search(query):
        return "wildcard"
    return "bm25"


def search(
    spark: SparkSession,
    stores: SearchStores | IndexStore,
    query: str,
    k: int = 10,
    searcher=None,
    where: str | None = None,
    after: tuple[float, int] | None = None,
    group_by: str | None = None,
    group_limit: int = 1,
    boosts: dict[str, float] | None = None,
    tie: float | None = None,
    synonyms: dict[str, list[str]] | None = None,
    sort_by: str | None = None,
    sort_ascending: bool = False,
    recency_boost: dict | None = None,
    min_should_match=0,
    pinned: list[int] | None = None,
    unordered_phrases: bool = False,
    boost_fn: str | None = None,
    rescore: dict | None = None,
    vector: list[float] | None = None,
    rrf_k: int = 60,
    n_per_leg: int = 50,
    n_probe: int = 8,
    phrase_prefix: bool = False,
    max_expansions: int = 50,
) -> DataFrame:
    """Top-k (doc_id, score) for any supported query form. Pass a bare
    IndexStore for text-only serving, or SearchStores to enable the
    formula route; pass a warm plans.search.Searcher to serve plain
    BM25 queries from the resident index. `where` (a SQL predicate over
    the word index's IndexConfig.meta_cols) restricts text routes to
    matching documents — Lucene filter semantics, see
    plans.boolean.filtered_topk; the formula route does not support it
    (the formula store's expression index has no doc metadata). Range
    clauses may also ride the QUERY STRING in Lucene/Solr syntax —
    `spark warc_ts:[2025-01 TO 2025-06]`, `{..}` exclusive, `*` open
    ends, `-field:[..]` negated, `field:[* TO *]` exists — they strip
    from the scoring query and AND into `where`
    (plans.boolean.parse_range_clauses); a pure-range query serves as
    `*:*` match-all + filter.

    Round-5 result-shaping options (plain-BM25 route only — each maps
    to its Solr/Lucene counterpart and raises on routes that do not
    support it rather than silently ignoring the request):

      * after=(score, doc_id) — cursor deep paging (Solr cursorMark /
        Lucene searchAfter); the next page strictly after the cursor.
      * group_by / group_limit — result grouping / field collapse
        (Solr group=true): returns the grouping contract columns
        (grp, group_hits, rank_in_group, doc_id, score), not the plain
        (doc_id, score) shape.
      * boosts={field: weight} — fielded search over a
        plans.fielded.build_fielded_index store (Solr title:q^2
        OR body:q); combinable with `after`. The query may scope
        clauses to fields with Lucene classic-QueryParser syntax
        (`title:spark body:proof^2 data` — scoped clauses are single
        boosted TermQueries, bare clauses expand over boosts as qf);
        `tie` switches the bare-clause combiner to Solr edismax's
        DisjunctionMaxQuery (max + tie x rest) —
        plans.fielded.field_query_topk.
      * synonyms={token: [expansion, ...]} — query-time synonym
        expansion (Lucene SynonymQuery: group max-df idf, per-doc tf
        sum); combinable with `after`.
      * sort_by / sort_ascending — order the match set by a metadata
        column instead of relevance (Solr sort=<field> asc|desc);
        returns (doc_id, <field>) rows.
      * recency_boost={'by': ts_col, 'now': datetime, ...} — kwargs
        for plans.search.boosted_topk (Solr boost=recip: BM25 x
        1/(1 + age/half_life)); combinable with `after`.
      * boost_fn='<sql expr>' — function query (Solr boost=<func> /
        Lucene FunctionScoreQuery): BM25 x f(doc) for any positive
        SQL expression over the index's meta_cols, e.g.
        `1.0 + 0.1 * ln(n_chars)`; combinable with `after`
        (plans.search.function_boosted_topk — pruning stays exact via
        power-of-two weight normalization).
      * rescore={'weight': w, 'window': n, 'slop': s, 'in_order': b,
        'phrase': p} — phrase rescoring (Lucene QueryRescorer / ES
        rescore; the Solr edismax `pf` effect): the base top-`window`
        is re-scored as BM25 + w x phrase_bm25 of the query (or an
        explicit `phrase`) and re-sorted
        (plans.rescore.phrase_rescore_topk; requires a positional
        index). Combines with no other shaping option.
      * vector=[...] — hybrid retrieval (ES 8.8 `rrf` retriever /
        OpenSearch hybrid query): the BM25 top-n_per_leg and the IVF
        ANN top-n_per_leg for the probe vector (SearchStores.vectors),
        fused by Reciprocal Rank Fusion with constant rrf_k; returns
        (doc_id, score, lex_rank, vec_rank). Composes with `where`
        (the ES 8 shape: the same filter clause on both retriever
        legs — lexical via filtered_topk, vector via
        ann_topk_ivf_filtered) but with no other shaping option (each
        would need its own fusion contract).
      * pinned=[doc_id, ...] — query elevation (Solr
        QueryElevationComponent): the given ids occupy the first ranks
        in order, organic results fill the rest; returns the elevation
        contract columns (rank, doc_id, score, elevated), not the
        plain (doc_id, score) shape. Combines with no other shaping
        option.
      * min_should_match — Solr mm spec (int, '-n', 'p%', '-p%'; see
        plans.boolean.resolve_mm): matches must contain at least that
        many DISTINCT should terms; serves the bm25/boolean routes
        (including `where` filters) and rejects the other routes and
        shaping options rather than silently ignoring the constraint.
      * unordered_phrases — serve every `"..."~N` phrase clause with
        Lucene sloppy (reorder-tolerant) matching instead of the
        default in-order slack (plans.phrase._unordered_tf); boolean
        route only (the only route that carries phrases), rejected
        elsewhere.
      * phrase_prefix — ES match_phrase_prefix (search-as-you-type):
        the WHOLE query is one phrase whose LAST token is a prefix
        (its trailing '*' optional), expanded against the vocabulary
        in term order up to `max_expansions`
        (plans.phrase.phrase_prefix_topk); returns (doc_id, phrase_tf)
        and combines with no other shaping option.

    In-query Lucene boost syntax (`matrix^2.5`, `+must^3`, `"a b"^2`)
    is honored on the plain-BM25 and boolean routes (warm and cold,
    incl. `where`-filtered and mm queries): the boost scales the
    term's idf inside the kernels, keeping block-max pruning exact
    (plans.search.split_term_boosts / plans.boolean grammar). The
    batch path rejects it (shared decode cache).
    """
    if isinstance(stores, IndexStore):
        stores = SearchStores(words=stores)
    if phrase_prefix:
        # ES match_phrase_prefix (search-as-you-type): the WHOLE query
        # is one phrase whose last token is a prefix; see
        # plans.phrase.phrase_prefix_topk. No other shaping option has
        # fusion semantics with a prefix phrase — reject, don't drop.
        bad = [
            n
            for n, on in (
                ("where", where is not None),
                ("after", after is not None),
                ("group_by", group_by is not None),
                ("boosts", boosts is not None),
                ("tie", tie is not None),
                ("synonyms", synonyms is not None),
                ("sort_by", sort_by is not None),
                ("recency_boost", recency_boost is not None),
                ("pinned", pinned is not None),
                ("boost_fn", boost_fn is not None),
                ("rescore", rescore is not None),
                ("vector", vector is not None),
                ("min_should_match", bool(min_should_match)),
                ("unordered_phrases", unordered_phrases),
            )
            if on
        ]
        if bad:
            raise ValueError(f"{'/'.join(bad)} not supported with phrase_prefix")
        from tangent_spark.plans.phrase import phrase_prefix_topk

        return phrase_prefix_topk(
            spark, stores.words, query, k, max_expansions=max_expansions
        )
    # Lucene/Solr range clauses over the index's metadata fields
    # (`warc_ts:[a TO b]`, `{..}` exclusive, `*` open ends, `-` negates)
    # compile to the filtered route's SQL predicate and leave the
    # scoring query to route normally; a pure-filter query (nothing
    # left after stripping) is Solr `q=*:* fq=range`. Clauses on
    # unknown fields stay query text (the parser-wide Lucene degrade).
    from tangent_spark.plans.boolean import parse_range_clauses

    _rng_rest, _rng_where = parse_range_clauses(
        query, stores.words.get_config().meta_cols
    )
    if _rng_where is not None:
        query = _rng_rest or "*:*"
        where = _rng_where if where is None else f"({where}) AND ({_rng_where})"
    kind = route(query)
    if unordered_phrases and kind != "boolean":
        # phrases only exist on the boolean route; raise instead of
        # silently ignoring the semantics request
        raise ValueError(
            f"unordered_phrases only applies to phrase-carrying boolean "
            f"queries (query routed to {kind!r})"
        )
    if min_should_match and kind not in ("bm25", "boolean"):
        # checked before the multi-term/formula routes dispatch so the
        # constraint is never silently dropped
        raise ValueError(
            f"min_should_match only supported on the bm25/boolean "
            f"routes (query routed to {kind!r})"
        )
    if tie is not None and boosts is None:
        # checked early so no other shaping branch can silently drop it
        raise ValueError("tie (edismax dismax combiner) requires fielded boosts")
    if vector is not None:
        # hybrid lexical+vector retrieval (ES 8.8 `rrf` retriever):
        # block-max-WAND BM25 leg + IVF ANN leg for `vector`, fused by
        # Reciprocal Rank Fusion — plans/hybrid.hybrid_topk. Only the
        # plain BM25 route carries a vector leg; shaping options do not
        # compose (each would need its own fusion contract) and are
        # rejected rather than silently dropped.
        if stores.vectors is None:
            raise ValueError("vector search needs SearchStores.vectors (an ANN store)")
        if kind != "bm25":
            raise ValueError(
                f"vector= only composes with plain BM25 queries "
                f"(query routed to {kind!r})"
            )
        bad = [
            n
            for n, on in (
                ("after", after is not None),
                ("group_by", group_by is not None),
                ("boosts", boosts is not None),
                ("synonyms", synonyms is not None),
                ("sort_by", sort_by is not None),
                ("recency_boost", recency_boost is not None),
                ("pinned", pinned is not None),
                ("boost_fn", boost_fn is not None),
                ("rescore", rescore is not None),
                ("min_should_match", bool(min_should_match)),
            )
            if on
        ]
        if bad:
            raise ValueError(f"{'/'.join(bad)} not supported with vector search")
        from tangent_spark.plans.hybrid import hybrid_topk

        return hybrid_topk(
            spark, stores.words, stores.vectors, query, vector, k=k,
            n_per_leg=n_per_leg, rrf_k=rrf_k, n_probe=n_probe,
            searcher=searcher, where=where,
        )
    if kind == "match_all":
        # Solr q=*:* (Lucene MatchAllDocsQuery): every live doc,
        # constant score — composes with `where`, `after` OR `sort_by`;
        # relevance-shaping options are meaningless here and rejected
        bad = [
            n
            for n, on in (
                ("group_by", group_by is not None),
                ("boosts", boosts is not None),
                ("synonyms", synonyms is not None),
                ("recency_boost", recency_boost is not None),
                ("pinned", pinned is not None),
            )
            if on
        ]
        if bad:
            raise ValueError(
                f"{'/'.join(bad)} not supported with the match-all query"
            )
        from tangent_spark.plans.search import match_all_docs

        return match_all_docs(
            spark, stores.words, k, where=where, after=after,
            sort_by=sort_by, sort_ascending=sort_ascending,
        )
    shaping = [
        name
        for name, on in (
            ("after", after is not None),
            ("group_by", group_by is not None),
            ("boosts", boosts is not None),
            ("synonyms", synonyms is not None),
            ("sort_by", sort_by is not None),
            ("recency_boost", recency_boost is not None),
            ("pinned", pinned is not None),
            ("boost_fn", boost_fn is not None),
            ("rescore", rescore is not None),
        )
        if on
    ]
    if shaping and (
        kind not in ("bm25", "wildcard", "fuzzy", "regexp")
        or where is not None
    ):
        raise ValueError(
            f"{'/'.join(shaping)} only supported on the plain BM25 route "
            f"(query routed to {kind!r}"
            + (", with a metadata filter)" if where is not None else ")")
        )
    if kind == "regexp":
        # same contract as the other multi-term routes: cursor paging
        # composes; other shaping, metadata filters, and mixing with
        # fuzzy/wildcard tokens outside the /.../ bodies are rejected
        # rather than silently analyzed away
        from tangent_spark.plans.fuzzy import is_fuzzy_token
        from tangent_spark.plans.wildcard import is_regexp_token

        if shaping and shaping != ["after"]:
            raise ValueError(
                f"{'/'.join(shaping)} not supported with regexp terms"
            )
        if where is not None:
            raise ValueError(
                "metadata filters are not supported with regexp terms"
            )
        rest = [t for t in query.split() if not is_regexp_token(t)]
        if any(is_fuzzy_token(t) for t in rest) or any(
            _WILD.search(t) for t in rest
        ):
            raise ValueError(
                "fuzzy/wildcard terms cannot be combined with regexp "
                "terms in one query"
            )
        if searcher is not None:
            return searcher.regexp(query, k, after=after)
        from tangent_spark.plans.wildcard import regexp_topk

        return regexp_topk(spark, stores.words, query, k, after=after)
    if kind == "fuzzy":
        # cursor paging composes (the expanded disjunction serves
        # through the same kernel); the other shaping options and
        # metadata filters do not expand fuzzy targets yet — raise
        # rather than silently scoring `querry~1` as the literal
        # token `querry1`. A wildcard/fuzzy mix in one query is also
        # rejected (Lucene keeps them as separate token queries; the
        # literal remainder here goes through the analyzer, which
        # would shred a bare `dat*` into `dat`).
        if shaping and shaping != ["after"]:
            raise ValueError(
                f"{'/'.join(shaping)} not supported with fuzzy terms"
            )
        if where is not None:
            raise ValueError(
                "metadata filters are not supported with fuzzy terms"
            )
        if _WILD.search(query):
            raise ValueError(
                "wildcard and fuzzy terms cannot be combined in one query"
            )
        if searcher is not None:
            return searcher.fuzzy(query, k, after=after)
        from tangent_spark.plans.fuzzy import fuzzy_topk

        return fuzzy_topk(spark, stores.words, query, k, after=after)
    if kind == "wildcard":
        # cursor paging composes (the expanded disjunction serves
        # through the same kernel); the other shaping options and
        # metadata filters do not expand patterns yet — raise rather
        # than silently treating `qu*ry` as the literal tokens qu/ry
        if shaping and shaping != ["after"]:
            raise ValueError(
                f"{'/'.join(shaping)} not supported with wildcard terms"
            )
        if where is not None:
            raise ValueError(
                "metadata filters are not supported with wildcard terms"
            )
        if searcher is not None:
            return searcher.wildcard(query, k, after=after)
        from tangent_spark.plans.wildcard import wildcard_topk

        return wildcard_topk(spark, stores.words, query, k, after=after)
    if kind == "boolean" and _WILD.search(re.sub(r'"[^"]*"', " ", query)):
        # a bare (unquoted) wildcard token inside boolean syntax would
        # silently tokenize `qu*ry` -> qu/ry; reject it explicitly
        # (quoted phrases keep their punctuation — `"how?"` is fine).
        # Checked before the `where` branch too: filtered_topk serves
        # boolean-routed queries and has the same tokenizer.
        raise ValueError(
            "wildcard terms inside boolean queries are not supported"
        )
    if kind == "boolean":
        # likewise a bare fuzzy token (`querry~1`) inside boolean
        # syntax would silently tokenize to `querry1`; phrases keep
        # their slop suffix (`"a b"~2` is proximity syntax, stripped
        # with its quotes before the check)
        from tangent_spark.plans.fuzzy import is_fuzzy_token

        stripped = re.sub(r'"[^"]*"(~\d+)?', " ", query)
        if any(is_fuzzy_token(t.lstrip("+-")) for t in stripped.split()):
            raise ValueError(
                "fuzzy terms inside boolean queries are not supported"
            )
        from tangent_spark.plans.wildcard import is_regexp_token

        if any(is_regexp_token(t.lstrip("+-")) for t in stripped.split()):
            raise ValueError(
                "regexp terms inside boolean queries are not supported"
            )
    if min_should_match:
        # Solr mm: serves the bm25/boolean routes (the boolean grammar
        # is a superset of plain BM25 — a bare query is all-should),
        # composes with `where`, rejects everything else explicitly
        if shaping:
            raise ValueError(
                f"min_should_match is not combinable with {'/'.join(shaping)}"
            )
        if kind == "bm25":
            from tangent_spark.plans.search import query_terms

            if not query_terms(query, stores.words.get_config().tokenizer):
                return spark.createDataFrame([], "doc_id long, score double")
        if where is not None:
            if searcher is not None:
                return searcher.filtered(
                    query, k, where, min_should_match=min_should_match,
                    unordered_phrases=unordered_phrases,
                )
            from tangent_spark.plans.boolean import filtered_topk

            return filtered_topk(
                spark, stores.words, query, k, where,
                min_should_match=min_should_match,
                unordered_phrases=unordered_phrases,
            )
        if searcher is not None:
            return searcher.boolean(
                query, k, min_should_match=min_should_match,
                unordered_phrases=unordered_phrases,
            )
        from tangent_spark.plans.boolean import boolean_topk

        return boolean_topk(
            spark, stores.words, query, k, min_should_match=min_should_match,
            unordered_phrases=unordered_phrases,
        )
    if pinned is not None:
        if shaping != ["pinned"]:
            raise ValueError(
                "pinned elevation combines with no other shaping option"
            )
        from tangent_spark.plans.search import elevated_topk

        return elevated_topk(spark, stores.words, query, k, pinned)
    if sort_by is not None:
        if group_by is not None or boosts is not None or synonyms is not None \
                or after is not None or recency_boost is not None \
                or pinned is not None or boost_fn is not None:
            raise ValueError("sort_by is not combinable with other shaping options")
        from tangent_spark.plans.sortby import sorted_topk

        return sorted_topk(
            spark, stores.words, query, sort_by, k=k, ascending=sort_ascending
        )
    if rescore is not None:
        if shaping != ["rescore"]:
            raise ValueError("rescore combines with no other shaping option")
        if kind != "bm25":
            raise ValueError(
                f"rescore only supported on the plain BM25 route "
                f"(query routed to {kind!r})"
            )
        allowed = {"weight", "window", "slop", "in_order", "phrase"}
        bad_keys = sorted(set(rescore) - allowed)
        if bad_keys:
            raise ValueError(
                f"unknown rescore option(s) {bad_keys}; allowed: {sorted(allowed)}"
            )
        if searcher is not None:
            return searcher.rescore(query, k, **rescore)
        from tangent_spark.plans.rescore import phrase_rescore_topk

        return phrase_rescore_topk(spark, stores.words, query, k, **rescore)
    if recency_boost is not None:
        if group_by is not None or boosts is not None or synonyms is not None \
                or boost_fn is not None:
            raise ValueError(
                "recency_boost combines only with `after` (cursor paging)"
            )
        from tangent_spark.plans.search import boosted_topk

        return boosted_topk(
            spark, stores.words, query, k, after=after, **recency_boost
        )
    if boost_fn is not None:
        if group_by is not None or boosts is not None or synonyms is not None:
            raise ValueError(
                "boost_fn combines only with `after` (cursor paging)"
            )
        from tangent_spark.plans.search import function_boosted_topk

        return function_boosted_topk(
            spark, stores.words, query, k, boost_fn, after=after
        )
    if boosts is not None:
        if group_by is not None or synonyms is not None:
            raise ValueError(
                "group_by/synonyms are not supported with fielded boosts"
            )
        cfg = stores.words.get_config()
        fielded_fields = getattr(cfg, "fields", None) or ()
        has_field_prefix = any(
            re.search(rf"(?:^|\s){f}:", query) for f in fielded_fields
        )
        if tie is not None or has_field_prefix:
            # Lucene classic-QueryParser field scoping and/or the Solr
            # edismax tie combiner: `title:spark body:proof^2 data`
            # with qf=boosts — scoped clauses are single boosted
            # TermQueries, bare clauses expand over qf (summed, or
            # DisjunctionMaxQuery max + tie x rest when tie is set)
            from tangent_spark.plans.fielded import field_query_topk

            return field_query_topk(
                spark, stores.words, query, k, boosts, tie=tie, after=after
            )
        from tangent_spark.plans.fielded import fielded_topk

        return fielded_topk(spark, stores.words, query, k, boosts, after=after)
    if synonyms is not None:
        if group_by is not None:
            raise ValueError("group_by is not supported with synonyms")
        from tangent_spark.plans.search import bm25_topk_synonyms

        return bm25_topk_synonyms(
            spark, stores.words, query, k, synonyms, after=after
        )
    if group_by is not None:
        if after is not None:
            raise ValueError("cursor paging is not supported with grouping")
        from tangent_spark.plans.group import grouped_topk

        return grouped_topk(
            spark, stores.words, query, group_by, k=k, group_limit=group_limit
        )
    if after is not None:
        if searcher is not None:
            return searcher.topk(query, k, after=after)
        from tangent_spark.plans.search import bm25_topk_wand

        return bm25_topk_wand(spark, stores.words, query, k, after=after)
    if kind == "formula":
        if where is not None:
            raise ValueError("metadata filters are not supported on the formula route")
        return _formula_search(spark, stores, query, k, searcher)
    if where is not None:
        # filtered_topk serves the full grammar, so it covers both the
        # boolean and plain-BM25 routes. Mirror the unfiltered bm25
        # route's contract for un-tokenizable plain queries (empty
        # result, not the boolean parser's no-positive-clause error —
        # a punctuation-only search box with a filter is not a bug).
        if kind == "bm25":
            from tangent_spark.plans.search import query_terms

            if not query_terms(query, stores.words.get_config().tokenizer):
                return spark.createDataFrame([], "doc_id long, score double")
        if searcher is not None:
            return searcher.filtered(
                query, k, where, unordered_phrases=unordered_phrases
            )
        from tangent_spark.plans.boolean import filtered_topk

        return filtered_topk(
            spark, stores.words, query, k, where,
            unordered_phrases=unordered_phrases,
        )
    if kind == "boolean":
        if searcher is not None:
            return searcher.boolean(query, k, unordered_phrases=unordered_phrases)
        from tangent_spark.plans.boolean import boolean_topk

        return boolean_topk(
            spark, stores.words, query, k, unordered_phrases=unordered_phrases
        )
    if searcher is not None:
        return searcher.topk(query, k)
    from tangent_spark.plans.search import bm25_topk_wand

    return bm25_topk_wand(spark, stores.words, query, k)


def _formula_search(
    spark: SparkSession,
    stores: SearchStores,
    query: str,
    k: int,
    searcher=None,
) -> DataFrame:
    from pyspark.sql import functions as F

    from tangent_spark.plans.formula import dice_topk_docs
    from tangent_spark.plans.rerank import combine_math_text
    from tangent_spark.plans.search import bm25_topk_wand, query_terms

    if stores.formulas is None:
        raise ValueError("query contains MathML but no formula store was given")
    mathml = _MATH_BLOCK.findall(query)
    if not mathml:
        # a qvar/XML fragment without a <math> wrapper: wrap ONLY the
        # markup span so the SLT parser sees a well-formed block, and
        # keep the surrounding plain text as the BM25 remainder
        # (mirrors the findall branch — prose is never fed to the
        # SLT parser, fragment terms never to the text engine). The
        # span starts at the first MATH-ish open tag (not any '<' —
        # prose like "1<2" must not anchor it) and ends at the last
        # '>'; markup too malformed to bracket (no closing '>') falls
        # back to wrapping the whole query with no text remainder.
        m = re.search(r"<(?:mws:qvar|m[a-z]+)\b", query, re.IGNORECASE)
        j = query.rfind(">")
        if m and j > m.start():
            i = m.start()
            mathml = [f"<math>{query[i : j + 1]}</math>"]
            text_rest = (query[:i] + " " + query[j + 1 :]).strip()
        else:
            mathml = [f"<math>{query}</math>"]
            text_rest = ""
    else:
        text_rest = _MATH_BLOCK.sub(" ", query).strip()

    math_scores = None
    for block in mathml:
        d = dice_topk_docs(spark, stores.formulas, block, k)
        math_scores = d if math_scores is None else math_scores.unionByName(d)
    if math_scores is not None and len(mathml) > 1:
        # several expressions: per doc, best formula score + total
        math_scores = math_scores.groupBy("doc_id").agg(
            F.max("best_score").alias("best_score"),
            F.sum("total_score").alias("total_score"),
            F.sum("n_exprs").alias("n_exprs"),
        )

    kw = query_terms(text_rest, stores.words.get_config().tokenizer) if text_rest else []
    if not kw:
        return (
            math_scores.select("doc_id", F.col("best_score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
    text_scores = (
        searcher.topk(text_rest, k)
        if searcher is not None
        else bm25_topk_wand(spark, stores.words, text_rest, k)
    )
    combined = combine_math_text(
        math_scores, text_scores, n_exprs=len(mathml), n_keywords=len(kw)
    )
    return (
        combined.select("doc_id", F.col("final_score").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
