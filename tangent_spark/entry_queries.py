"""Driver-contract query battery: one entry per implemented operator
from SURVEY.md §2, runnable on the /root/testdata tables, each with a
DuckDB-oracle SQL twin in __spark_entry__.py.

Conventions (driver compares row-count + schema + order-insensitive
value hash after sorting columns by name):
  * every computed column is aliased identically in Spark and SQL;
  * doubles are rounded to 4 decimals on BOTH sides;
  * top-k queries order by (rounded score desc, id asc) so knife-edge
    float ulps cannot change the selected row set.

The word-term queries use the 'simple' tokenizer (lowercase + split on
[^a-z0-9]+) because it is expressible in both engines; the Porter path
is exercised by the pytest oracle instead (tests/test_index_search.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tangent_spark.functions.tokenize import tokens_col_simple

K1, B = 1.2, 0.75
BM25_QUERY = ["data", "query", "spark", "index"]
DICE_QUERY = {"data": 2, "query": 1, "table": 1}
UNION_TERMS = ["data", "query", "spark"]
WILDCARD_PREFIX = "c"
EN_STOP = ["the", "of", "and", "is", "a", "to"]
DE_STOP = ["der", "die", "und", "ist", "das", "zu"]
ID_STOP = ["yang", "dan", "di", "itu", "dengan", "untuk"]


def _eq_term(term: str):
    """Unary lambda factory for higher-order array functions. A plain
    `lambda x, _t=term: x == _t` would NOT work: PySpark counts lambda
    parameters to decide unary-vs-binary, and a two-parameter lambda in
    filter/exists is invoked as (element, index) — the default arg
    becomes the INDEX column and the comparison silently casts."""
    return lambda x: x == term


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term) — one row per token occurrence."""
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(tokens_col_simple(F.col("text"))).alias("term"))
    )


def _tf(spark, sf_dir) -> DataFrame:
    return (
        _tok(spark, sf_dir)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )


def _dl(spark, sf_dir) -> DataFrame:
    return _tok(spark, sf_dir).groupBy("doc_id").agg(F.count("*").alias("dl"))


# --- §2.1 scans -------------------------------------------------------------

def s1_doc_scan(spark, sf_dir):
    """S1: projection+filter scan with pushdown (doc dictionary shape)."""
    return (
        _docs(spark, sf_dir)
        .filter(F.col("lang") == "en")
        .select("doc_id", "source", "n_chars")
    )


# --- §2.3 tokenizer ----------------------------------------------------------

def t9_tokenize_tf(spark, sf_dir):
    """T9: word tokenizer -> (doc_id, term, tf)."""
    return _tf(spark, sf_dir)


# --- §2.4 index build aggregations -------------------------------------------

def a1_term_dict(spark, sf_dir):
    """A1 + A8 in one contract entry (phase column; same oracle math as
    the former separate entries):

    phase 'dict' — A1 string interning: dense term ids by sorted term
        order via the scale-safe range-partition + prefix-sum path
        (functions/ids.dense_ids), not a single-partition global
        window (key = term, val = term_id);
    phase 'hist' — A8 index stats: histogram of term document
        frequencies (key = df as string, val = n_terms)."""
    from tangent_spark.functions.ids import dense_ids

    vocab = _tf(spark, sf_dir).groupBy("term").agg(F.count("*").cast("int").alias("df"))
    dict_rows = dense_ids(vocab, "term", "_tid").select(
        F.lit("dict").alias("phase"),
        F.col("term").alias("key"),
        "df",
        (F.col("_tid") + 1).cast("long").alias("val"),
    )
    hist_rows = vocab.groupBy("df").agg(F.count("*").alias("val")).select(
        F.lit("hist").alias("phase"),
        F.col("df").cast("string").alias("key"),
        "df",
        "val",
    )
    return dict_rows.unionByName(hist_rows)


def a4_doc_stats(spark, sf_dir):
    """A4-analog: per-doc posting stats (dl, distinct terms, max tf)."""
    return (
        _tf(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("dl"),
            F.count("*").cast("int").alias("n_terms"),
            F.max("tf").alias("max_tf"),
        )
    )


def a5_corpus_stats(spark, sf_dir):
    """A5/A7-analog + Q13 in one contract entry (phase column; same
    oracle math as the former separate entries):

    phase 'corpus' — global counters the manifest stores (consistency
        check): n_docs, total_tokens, avgdl;
    phase 'q13'    — distinct matched-doc count for the union query
        (n_docs = count; total_tokens = -1, avgdl = -1, n/a)."""
    # both phases are single aggregate scans over the token ARRAY —
    # dl == size(tokens) and "doc matched" == exists(token in set), so
    # neither needs the explode + groupBy shuffle of the naive plan
    toks = tokens_col_simple(F.col("text"))
    dls = (
        _docs(spark, sf_dir)
        .select(F.size(toks).alias("dl"))
        .filter(F.col("dl") > 0)  # explode semantics: empty docs have no rows
    )
    corpus = dls.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_tokens"),
        F.round(F.avg("dl"), 4).alias("avgdl"),
    ).select(F.lit("corpus").alias("phase"), "n_docs", "total_tokens", "avgdl")
    q13 = (
        _docs(spark, sf_dir)
        .select(
            F.arrays_overlap(
                toks, F.array(*[F.lit(t) for t in UNION_TERMS])
            ).cast("int").alias("hit")
        )
        .agg(F.sum("hit").cast("long").alias("n_docs"))
        .select(
            F.lit("q13").alias("phase"),
            "n_docs",
            F.lit(-1).cast("long").alias("total_tokens"),
            F.lit(-1.0).alias("avgdl"),
        )
    )
    return corpus.unionByName(q13)


def p4_dedup_count(spark, sf_dir):
    """P4: within-doc dedup — tokens vs distinct terms per doc.
    Zero-exchange: both counts are array functions of the token array
    (the aggregation boundary is the document, which never spans
    rows), replacing the explode + groupBy + countDistinct shuffles."""
    toks = tokens_col_simple(F.col("text"))
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.size(toks).cast("long").alias("n_tokens"),
            F.size(F.array_distinct(toks)).cast("int").alias("n_unique"),
        )
        .filter(F.col("n_tokens") > 0)  # explode semantics: empty docs drop
    )


# --- §2.5 query execution -----------------------------------------------------

def q3_or_union(spark, sf_dir):
    """Q3 + Q4 in one contract entry (phase column; same oracle math as
    the former separate entries):

    phase 'union'  — Q3: postings OR-union of a fixed term set, per-doc
        total tf (agg_tf) and number of distinct query terms hit;
    phase 'capped' — Q4: count-capped match cc = sum(min(q_tf, d_tf))
        per doc (agg_tf = cc; n_terms_hit = -1, not applicable)."""
    union = (
        _tf(spark, sf_dir)
        .filter(F.col("term").isin(UNION_TERMS))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("agg_tf"),
            F.count("*").cast("int").alias("n_terms_hit"),
        )
        .select(F.lit("union").alias("phase"), "doc_id", "agg_tf", "n_terms_hit")
    )
    qdf = spark.createDataFrame(
        [(t, c) for t, c in sorted(DICE_QUERY.items())], "term string, q_tf int"
    )
    capped = (
        _tf(spark, sf_dir)
        .join(F.broadcast(qdf), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.least("q_tf", "tf")).alias("agg_tf"))
        .select(
            F.lit("capped").alias("phase"),
            "doc_id",
            "agg_tf",
            F.lit(-1).cast("int").alias("n_terms_hit"),
        )
    )
    return union.unionByName(capped)


def q8_dice_topk(spark, sf_dir):
    """Q8/Q9: Tangent Dice F = 2cc/(dl+qtc), top-20 with id tie-break
    (mathindex.cpp:239-246 semantics transplanted onto word multisets).

    Single-stage plan: per-doc term frequencies come from higher-order
    array functions over the token array (cc and dl are INTEGER sums,
    so the values are exactly the explode+join+groupBy plan's), the
    matched-docs inner join becomes the cc > 0 filter, and the top-20
    is a TakeOrderedAndProject — zero exchanges before the k-row
    collect at any corpus size."""
    qtc = sum(DICE_QUERY.values())
    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens_col_simple(F.col("text")).alias("toks")
    )
    cc = None
    for t, c in sorted(DICE_QUERY.items()):
        tf_t = F.size(F.filter("toks", _eq_term(t)))
        term_cc = F.least(F.lit(c), tf_t)
        cc = term_cc if cc is None else cc + term_cc
    scored = (
        docs.select("doc_id", F.size("toks").alias("dl"), cc.alias("cc"))
        .filter(F.col("cc") > 0)
        .withColumn(
            "score", F.round(2.0 * F.col("cc") / (F.col("dl") + F.lit(qtc)), 4)
        )
    )
    return (
        scored.select("doc_id", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


def q9_bm25_topk(spark, sf_dir):
    """Q9 flagship: BM25(k1=1.2,b=0.75) top-20, Lucene idf, id tie-break.

    Two-scan plan (was five scan subtrees + three exchanges): one
    1-row broadcast aggregate carries n_docs, avgdl AND all four
    per-term dfs (df = docs containing the term == the old per-(doc,
    term) row count, since tf rows were unique per doc-term); the main
    scan derives tf per query term from the token array with
    higher-order functions, sums the per-term BM25 parts per row (a
    zero tf contributes exactly 0.0), and feeds TakeOrderedAndProject
    directly — no explode, no doc_id join, no groupBy exchange."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens_col_simple(F.col("text")).alias("toks")
    )
    tok = docs.withColumn("dl", F.size("toks")).filter(F.col("dl") > 0)
    stats_aggs = [
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    ]
    for i, t in enumerate(BM25_QUERY):
        stats_aggs.append(
            F.sum(
                F.exists("toks", _eq_term(t)).cast("int")
            ).cast("double").alias(f"df{i}")
        )
    stats = tok.agg(*stats_aggs)
    parts = None
    for i, t in enumerate(BM25_QUERY):
        tf_t = F.size(F.filter("toks", _eq_term(t)))
        df_i = F.col(f"df{i}")
        part = (
            F.log(F.lit(1.0) + (F.col("n_docs") - df_i + 0.5) / (df_i + 0.5))
            * tf_t * (K1 + 1.0)
            / (tf_t + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl")))
        )
        parts = part if parts is None else parts + part
    scored = (
        tok.crossJoin(F.broadcast(stats))
        .filter(
            F.arrays_overlap("toks", F.array(*[F.lit(t) for t in BM25_QUERY]))
        )
        .select("doc_id", F.round(parts, 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(20)


BATCH_QUERIES = {
    "b1": ["data", "index", "query", "spark"],
    "b2": ["filter", "join", "scan", "table"],
    "b3": ["fast", "hash", "value"],
}


def q9_bm25_batch(spark, sf_dir):
    """Q9 batch serving: one plan scores a whole query batch — the shape
    Searcher.topk_batch serves warm (one job per batch, shared decode
    cache; plans/search.py). Same BM25 math as q9_bm25_topk per
    query_id; rank window is per query (top-10 each)."""
    tf = _tf(spark, sf_dir)
    dl = _dl(spark, sf_dir)
    stats = dl.agg(
        F.count("*").cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qrows = [(qid, t) for qid, ts in sorted(BATCH_QUERIES.items()) for t in ts]
    q = spark.createDataFrame(qrows, "query_id string, term string")
    all_terms = sorted({t for _, t in qrows})
    matched = tf.filter(F.col("term").isin(all_terms))
    dfs = matched.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    scored = (
        matched.join(F.broadcast(q), "term")
        .join(F.broadcast(dfs), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "part",
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * F.col("tf") * (K1 + 1.0)
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("part"), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("query_id", "rank", "doc_id", "score")
    )


BOOL_CONJ_QUERY = "data query +spark -join"
BOOL_SHOULD_QUERY = "data query -join"


def boolean_bm25_topk(spark, sf_dir):
    """Boolean serving end-to-end through the REAL per-shard conjunction
    kernel (plans/boolean.py) over a freshly built index, BOTH planner
    paths in one entry:

    phase 'conj'   — `data query +spark -join`: the must term seeds the
        candidate set, every other term's decode is block-skip
        restricted to it;
    phase 'should' — `data query -join`: no must seed — the should-only
        path (round-5: block-max threshold pruning applies here).
    phase 'kw'     — `data AND query NOT join`: the Lucene classic
        QueryParser keyword-operator surface (== `+data +query -join`,
        see plans/boolean._apply_keyword_ops) through the same
        conjunction kernel.
    phase 'filter' — `data #spark -join`: an Occur.FILTER clause (ES
        bool.filter) — spark is REQUIRED for membership and seeds the
        conjunction but contributes NOTHING to the score; docs with
        spark but without data serve at score 0.

    Oracle recomputes all four with plain set algebra + BM25 SQL. Lucene
    semantics: BM25 over positive terms, restricted to docs containing
    every must term, minus docs with any must-not term; ties doc_id
    asc."""
    import shutil
    import tempfile

    from tangent_spark.plans.boolean import boolean_topk

    base = tempfile.mkdtemp(prefix="tangent_bool_entry_")
    try:
        store = _simple_store(spark, sf_dir, base)
        out = []
        for phase, q in (
            ("conj", BOOL_CONJ_QUERY),
            ("should", BOOL_SHOULD_QUERY),
            ("kw", "data AND query NOT join"),
            ("filter", "data #spark -join"),
        ):
            out += [
                (phase, int(r["doc_id"]), round(float(r["score"]), 4))
                for r in boolean_topk(spark, store, q, 20).collect()
            ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "phase string, doc_id long, score double")


def q5_wildcard(spark, sf_dir):
    """Q5: wildcard term expansion — prefix 'con*' -> per-term df + cf."""
    return (
        _tf(spark, sf_dir)
        .filter(F.col("term").startswith(WILDCARD_PREFIX))
        .groupBy("term")
        .agg(F.count("*").cast("int").alias("df"), F.sum("tf").alias("cf"))
    )


PHRASE = ["row", "column", "sort"]


NEAR_PHRASE = ["row", "sort"]
NEAR_SLOP = 2

SPAN_PHRASE = ["row", "column"]
SPAN_FIRST_END = 60


def _positions_of(spark, sf_dir, terms):
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.posexplode(tokens_col_simple(F.col("text"))).alias("pos", "term"),
        )
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )


def phrase_match(spark, sf_dir):
    """Phrase queries, BOTH positional folds in one contract entry:

    phase 'exact' — docs containing the exact consecutive phrase
        'row column sort' (array_intersect fold, slop=0);
    phase 'near'  — proximity `"row sort"~2` ('sort' after 'row' with
        at most 2 tokens between; phrase_tf = distinct completion
        positions of the last term — the (pos, slack) fold);
    phase 'unord' — the same `"row sort"~2` under Lucene sloppy
        semantics (in_order=False: adjusted-position spread <= slop,
        so 'sort ... row' also matches — the transposition criterion);
    phase 'first' — Lucene SpanFirstQuery: 'row column' occurrences
        whose span lies within the first 60 tokens
        (plans/phrase.span_first_match — head-pruned exact fold);
    phase 'prefix' — ES match_phrase_prefix `"table s*"`: 'table'
        followed by ANY term starting with 's', phrase_tf = distinct
        completion positions across the expansion union
        (plans/phrase.phrase_prefix_match).

    Same folds the index-side plans/phrase.py runs over the positions
    table, expressed over raw documents so DuckDB can twin them."""
    from tangent_spark.plans.phrase import (
        phrase_match_positions,
        phrase_prefix_match,
        span_first_match,
    )

    exact = phrase_match_positions(
        _positions_of(spark, sf_dir, PHRASE), PHRASE
    ).select(F.lit("exact").alias("phase"), "doc_id", "phrase_tf")
    near = phrase_match_positions(
        _positions_of(spark, sf_dir, NEAR_PHRASE), NEAR_PHRASE, slop=NEAR_SLOP
    ).select(F.lit("near").alias("phase"), "doc_id", "phrase_tf")
    unord = phrase_match_positions(
        _positions_of(spark, sf_dir, NEAR_PHRASE),
        NEAR_PHRASE,
        slop=NEAR_SLOP,
        in_order=False,
    ).select(F.lit("unord").alias("phase"), "doc_id", "phrase_tf")
    first = span_first_match(
        _positions_of(spark, sf_dir, SPAN_PHRASE), SPAN_PHRASE, SPAN_FIRST_END
    ).select(
        F.lit("first").alias("phase"), "doc_id",
        F.col("span_tf").alias("phrase_tf"),
    )
    pos_pf = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.posexplode(tokens_col_simple(F.col("text"))).alias("pos", "term"),
        )
        .filter((F.col("term") == "table") | F.col("term").startswith("s"))
        .groupBy("doc_id", "term")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )
    prefix = phrase_prefix_match(
        pos_pf, pos_pf.select("term"), ["table"], "s"
    ).select(F.lit("prefix").alias("phase"), "doc_id", "phrase_tf")
    return (
        exact.unionByName(near)
        .unionByName(unord)
        .unionByName(first)
        .unionByName(prefix)
    )


def grouped_collapse_topk(spark, sf_dir):
    """Result grouping / field collapse through a REAL index
    (plans/group.grouped_topk — Solr group=true / collapse, the web
    site-dedup surface, SURVEY S12): top-5 source groups for the BM25
    query ordered by their best hit, 2 docs per group, with per-group
    total hit counts (Solr numFound per group). Oracle recomputes full
    BM25 scores, the per-group ranking, the group ordering and the
    hit counts from the raw corpus."""
    import shutil
    import tempfile

    from tangent_spark.plans.group import grouped_topk
    from tangent_spark.plans.search import elevated_topk

    base = tempfile.mkdtemp(prefix="tangent_group_entry_")
    try:
        store = _simple_store(spark, sf_dir, base, meta=("source",))
        out = [
            (
                r["grp"],
                int(r["group_hits"]),
                int(r["rank_in_group"]),
                int(r["doc_id"]),
                round(float(r["score"]), 4),
            )
            for r in grouped_topk(
                spark, store, SEARCH_AFTER_QUERY, "source", k=5, group_limit=2
            ).collect()
        ]
        # query elevation rides the same 5-column contract off the same
        # store (grp = '__elevated__' sentinel — no source value
        # collides; group_hits carries the elevated flag, rank_in_group
        # the rank): docs 7 and 3 pinned in that order, organic WAND
        # tail fills ranks 3-10 (plans/search.elevated_topk)
        out += [
            (
                "__elevated__",
                1 if r["elevated"] else 0,
                int(r["rank"]),
                int(r["doc_id"]),
                None if r["score"] is None else round(float(r["score"]), 4),
            )
            for r in elevated_topk(
                spark, store, ELEV_QUERY, 10, ELEV_PINS
            ).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out,
        "grp string, group_hits long, rank_in_group int, doc_id long, score double",
    )


# --- §2.6 rerank-side aggregation ---------------------------------------------

def r10_doc_agg(spark, sf_dir):
    """R10: per-group best+total score (documents ranked by
    (top formula score, total score)) — on events per user."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("user_id")
        .agg(
            F.round(F.max("value"), 4).alias("top_score"),
            F.round(F.sum("value"), 4).alias("total_score"),
            F.count("*").alias("n"),
        )
    )


# --- §2.7 standard analytics (joins / windows / sorts) --------------------------

def tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def tpch_q3_topk(spark, sf_dir):
    """Aggregate-before-join: o_orderkey / c_custkey are primary keys
    (unique), so the inner joins cannot fan out lineitem rows — per-
    orderkey revenue groups are identical whether grouped before or
    after the joins. Pre-aggregating shuffles order-count partials
    (map-side combined, 3 columns) instead of the full lineitem table,
    and the joins shrink to existence filters on projected keys."""
    cu = spark.read.parquet(f"{sf_dir}/customer.parquet")
    od = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        li.groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    valid_orders = od.join(
        F.broadcast(cu.select("c_custkey")),
        od.o_custkey == F.col("c_custkey"),
        "left_semi",
    ).select("o_orderkey")
    return (
        rev.join(valid_orders, rev.l_orderkey == F.col("o_orderkey"), "left_semi")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def events_hourly(spark, sf_dir):
    """Tumbling-window agg (batch shape of the streaming operator)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), F.col("event_type")
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )


def events_sessionize(spark, sf_dir):
    """Sessionization via lag window: sessions = gaps > 30 min, per user."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"), F.count("*").alias("n_events"))
    )


# --- training-data pipeline operators ------------------------------------------

def dedup_exact(spark, sf_dir):
    """Exact dedup: md5(text) groups (hash, group size, representative id)."""
    return (
        _docs(spark, sf_dir)
        .select(F.md5(F.col("text")).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.count("*").cast("int").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def minhash_signature(spark, sf_dir):
    """MinHash signatures (4 permutations) over term sets, md5-keyed so
    the hash family is identical in Spark and DuckDB (lexicographic min
    over hex strings).

    Computed with ZERO exchanges: min(md5) over the doc's token array
    via array_min(transform(...)) — min is duplicate-insensitive, so
    the explode + distinct + groupBy shuffles of the naive plan add
    nothing. One narrow scan-projection at any corpus size."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens_col_simple(F.col("text")).alias("toks")
    )
    cols = [
        F.array_min(
            F.transform("toks", lambda t: F.md5(F.concat(F.lit(f"{i}:"), t)))
        ).alias(f"mh{i}")
        for i in range(4)
    ]
    return docs.filter(F.size("toks") > 0).select("doc_id", *cols)


def dedup_ngram_jaccard(spark, sf_dir):
    """Exact Jaccard over token-3-gram shingle sets via inverted-index
    self-join (the scalable near-dup pattern: shingle -> candidate pair),
    reporting pairs with J >= 0.2."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", tokens_col_simple(F.col("text")).alias("toks")
    )
    # 3-gram shingles straight off the token array (one narrow pass) —
    # the old plan posexploded every token and self-joined TWICE on
    # (doc_id, pos) to reassemble adjacent triples, shuffling the full
    # token table three times for what is a per-row array slice.
    # sequence() with stop < start counts DOWN, so guard short docs.
    shingles = F.when(
        F.size("toks") >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 3),
            lambda i: F.concat_ws(
                " ",
                F.get("toks", i),
                F.get("toks", i + 1),
                F.get("toks", i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # one exchange does triple duty: repartition by shingle satisfies
    # the (doc_id, shingle) dedup's clustering requirement (hash on a
    # subset of the dedup key co-locates duplicates), the df window's
    # partitionBy(shingle), AND the pair self-join's key distribution —
    # the naive plan paid a separate (doc_id, shingle) distinct
    # exchange first
    g = (
        docs.select("doc_id", F.explode(shingles).alias("shingle"))
        .repartition("shingle")
        .dropDuplicates(["doc_id", "shingle"])
    )
    sizes = g.groupBy("doc_id").agg(F.count("*").alias("n"))
    # candidate-pair prefilter: a shingle held by ONE doc cannot form a
    # pair, so drop df=1 shingles before the self-join. The window
    # count rides the same shingle partitioning, so the prefilter costs
    # no extra shuffle while shrinking the join input to the (rare)
    # shared shingles.
    g2 = (
        g.withColumn("_df", F.count("*").over(Window.partitionBy("shingle")))
        .filter(F.col("_df") >= 2)
        .drop("_df")
    )
    inter = (
        g2.alias("x")
        .join(g2.alias("y"), (F.col("x.shingle") == F.col("y.shingle")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .groupBy(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
    )


def embedding_cosine_topk(spark, sf_dir):
    """Vector + hybrid retrieval in one entry. Phase 'cos': brute-force
    cosine top-10 neighbors for 3 probe vectors (the ANN baseline; the
    LSH/IVF variants are the scale paths). Phase 'rrf': hybrid
    lexical+vector search — the BM25 top-20 (q9's exact leg) fused with
    probe-0's cosine top-20 by Reciprocal Rank Fusion
    (plans/hybrid.rrf_fuse; ES 8.8 `rrf` retriever semantics,
    rrf_k=60) — reported as (rank, doc_id-as-vec_id, rrf-as-cos)."""
    from tangent_spark.plans.hybrid import rrf_fuse

    # norms are attached to each SIDE before the crossJoin — the same
    # sqrt(sum(x^2)) expression over the same array yields the same
    # double, but each vector's norm is computed once instead of once
    # per (probe, vector) pair
    norm_of = lambda col: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("nv", norm_of("v"))
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"),
        F.col("nv").alias("nq"),
    )
    dot = F.aggregate(
        F.zip_with("q", "v", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    scored = (
        probes.crossJoin(emb)
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", F.round(dot / (F.col("nq") * F.col("nv")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    cos_phase = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(F.lit("cos").alias("phase"), "query_id", "rank", "vec_id", "cos")
    )
    # hybrid phase: both legs rank on 4-decimal scores with id tie-breaks
    # (engine-stable), fusion = sum of <=2 exact reciprocals, rounded 6
    lex = q9_bm25_topk(spark, sf_dir)  # top-20 (doc_id, score-rounded-4)
    vec = (
        scored.filter(F.col("query_id") == 0)
        .select(F.col("vec_id").alias("doc_id"), F.col("cos").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )
    fused = rrf_fuse([("lex", lex), ("vec", vec)], k=10)
    wr = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    rrf_phase = fused.select(
        F.lit("rrf").alias("phase"),
        F.lit(-1).cast("long").alias("query_id"),
        F.row_number().over(wr).alias("rank"),
        F.col("doc_id").alias("vec_id"),
        F.col("score").alias("cos"),
    )
    return cos_phase.unionByName(rrf_phase)


def text_quality(spark, sf_dir):
    """Quality scoring + language id in one per-doc pass: length, token
    stats, alpha ratio, stopword ratio, per-language stopword hits and
    the argmax language prediction (en/de/id, tie->en). One scan, one
    projection — the shape a 100 TB quality-filter pipeline runs."""
    docs = _docs(spark, sf_dir).withColumn("tokens", tokens_col_simple(F.col("text")))
    en = F.size(F.filter("tokens", lambda t: t.isin(EN_STOP)))
    de = F.size(F.filter("tokens", lambda t: t.isin(DE_STOP)))
    idn = F.size(F.filter("tokens", lambda t: t.isin(ID_STOP)))
    pred = (
        F.when((en >= de) & (en >= idn), "en")
        .when(de >= idn, "de")
        .otherwise("id")
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_m"),
        F.size("tokens").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace("text", "[^a-zA-Z0-9]", "")) / F.length("text"), 4
        ).alias("alpha_ratio"),
        F.round(en / F.size("tokens"), 4).alias("stopword_ratio"),
        en.alias("en_hits"),
        de.alias("de_hits"),
        idn.alias("id_hits"),
        pred.alias("pred_lang"),
    )


def doc_signatures(spark, sf_dir):
    """Per-doc dedup signatures in one entry: the whitespace-normalized
    md5 fingerprint (rolling-hash analog) AND the 4-permutation MinHash
    signature (md5 hash family — identical in Spark and DuckDB). One
    row per doc: (doc_id, fingerprint, mh0..mh3)."""
    docs = _docs(spark, sf_dir).withColumn(
        "toks", tokens_col_simple(F.col("text"))
    )
    mh = [
        F.array_min(
            F.transform("toks", lambda t: F.md5(F.concat(F.lit(f"{i}:"), t)))
        ).alias(f"mh{i}")
        for i in range(4)
    ]
    # fingerprint + MinHash in ONE projection over one scan (was: a
    # doc_id join of two subplans; the join's inner semantics — only
    # docs with >= 1 token carry a MinHash row — survives as the size
    # filter)
    return docs.filter(F.size("toks") > 0).select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.col("text")), "[ \\t\\n\\r]+", " ")).alias(
            "fingerprint"
        ),
        *mh,
    )


# --- formula operators (rows-only: pair-tuple UDFs are not SQL-expressible) ---

_FORMULA_N_PAGES = 200
_FORMULA_QUERY = "<math><mfrac><mi>x</mi><mrow><mi>y</mi><mo>+</mo><mn>3</mn></mrow></mfrac></math>"


def _pages(spark):
    from tangent_spark.corpus import generate_pages, pages_with_doc_ids

    return pages_with_doc_ids(generate_pages(spark, _FORMULA_N_PAGES, partitions=8))


def t1_slt_parse(spark, sf_dir):
    """T1-T5: MathML -> SLT over the deterministic synthetic corpus;
    one row per unique expression with global instance counts."""
    from tangent_spark.operators.pairs import exprs_df

    return (
        exprs_df(_pages(spark))
        .groupBy("slt")
        .agg(
            F.sum("n_instances").cast("int").alias("instances"),
            F.countDistinct("doc_id").cast("int").alias("n_docs"),
        )
    )


def t7_pair_tuples(spark, sf_dir):
    """T6/T7: symbol-pair tuple expansion (window=4, EOL=small) —
    vocabulary with corpus-wide counts."""
    from tangent_spark.config import IndexConfig
    from tangent_spark.operators.pairs import expr_tuples_df, exprs_df

    exprs = exprs_df(_pages(spark)).select("slt").distinct()
    return (
        expr_tuples_df(exprs, IndexConfig())
        .groupBy("fr", "to", "rel")
        .agg(F.count("*").cast("int").alias("n_exprs"), F.sum("cnt").alias("total"))
    )


def f8_dice_topk(spark, sf_dir):
    """Q2-Q9: Dice F-measure top-10 expressions for a fixed formula
    query, computed store-free (exprs -> tuples -> count-capped overlap)."""
    from tangent_spark.config import IndexConfig
    from tangent_spark.functions.ids import dense_ids
    from tangent_spark.operators.pairs import expr_tuples_df, exprs_df
    from tangent_spark.plans.formula import query_tuple_multiset

    cfg = IndexConfig()
    concrete, wildcard, qtc = query_tuple_multiset(_FORMULA_QUERY, cfg)
    exprs = exprs_df(_pages(spark)).select("slt").distinct()
    tuples = expr_tuples_df(exprs, cfg)
    tc = tuples.groupBy("slt").agg(F.sum("cnt").alias("expr_tc"))
    qdf = spark.createDataFrame(
        [(fr, to, rel, c) for (fr, to, rel), c in sorted(concrete.items())],
        "fr string, to string, rel string, q_cnt int",
    )
    cc = (
        tuples.join(F.broadcast(qdf), ["fr", "to", "rel"])
        .groupBy("slt")
        .agg(F.sum(F.least("q_cnt", "cnt")).alias("cc"))
    )
    scored = (
        dense_ids(cc.join(tc, "slt"), "slt", "expr_id")
        .withColumn("score", F.round(2.0 * F.col("cc") / (F.col("expr_tc") + F.lit(qtc)), 4))
    )
    return (
        scored.select("slt", "score")
        .orderBy(F.desc("score"), F.asc("slt"))
        .limit(10)
    )


def r5_mss_rerank(spark, sf_dir):
    """R5: Maximum Subtree Similarity rerank of the Dice candidates for
    the fixed formula query (rows-only: tree alignment is a pandas UDF)."""
    from tangent_spark.operators.mss import mss_score
    from tangent_spark.operators.pairs import exprs_df
    from tangent_spark.operators.slt import mathml_to_slt

    qslt = mathml_to_slt(_FORMULA_QUERY)
    exprs = exprs_df(_pages(spark)).select("slt").distinct()

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for slt in pdf["slt"]:
                f, neg_un, exact = mss_score(qslt, slt)
                if f > 0:
                    rows.append(
                        {"slt": slt, "mss_f": round(f, 4), "neg_unmatched": neg_un,
                         "exact_matches": exact}
                    )
            yield pd.DataFrame(
                rows, columns=["slt", "mss_f", "neg_unmatched", "exact_matches"]
            )

    scored = exprs.mapInPandas(
        kernel, schema="slt string, mss_f double, neg_unmatched int, exact_matches int"
    )
    return scored.orderBy(
        F.desc("mss_f"), F.desc("neg_unmatched"), F.desc("exact_matches"), F.asc("slt")
    ).limit(10)


def r7_v11_rerank(spark, sf_dir):
    """R7: the NTCIR-12 submission rerank metric (v11 = subtree-
    unification matching + m4 score vector) over the Dice candidates for
    the fixed formula query. The scorer itself carries golden parity vs
    the reference's shipped reranked_paper_m4_w0_e2.tsv (3,940 pairs,
    tests/test_golden_rerank.py); its driver oracle is a precomputed
    golden parquet (goldens/r7_v11_rerank.parquet)."""
    from tangent_spark.operators.mss_subtree import subtree_similarity
    from tangent_spark.operators.pairs import exprs_df
    from tangent_spark.operators.slt import mathml_to_slt

    qslt = mathml_to_slt(_FORMULA_QUERY)
    exprs = exprs_df(_pages(spark)).select("slt").distinct()

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for slt in pdf["slt"]:
                f, neg_un, exact = subtree_similarity(qslt, slt, scoring="m4")
                if f > 0:
                    rows.append(
                        {"slt": slt, "v11_f": round(f, 4), "neg_unmatched": neg_un,
                         "exact_matches": exact}
                    )
            yield pd.DataFrame(
                rows, columns=["slt", "v11_f", "neg_unmatched", "exact_matches"]
            )

    scored = exprs.mapInPandas(
        kernel, schema="slt string, v11_f double, neg_unmatched int, exact_matches int"
    )
    return scored.orderBy(
        F.desc("v11_f"), F.desc("neg_unmatched"), F.desc("exact_matches"), F.asc("slt")
    ).limit(10)


_WILDCARD_QUERY = (
    "<math><mrow><mws:qvar name=\"a\"/><mo>+</mo><mws:qvar name=\"b\"/>"
    "<mo>+</mo><mi>x</mi></mrow></math>"
)


def q5f_wildcard_dice(spark, sf_dir):
    """Q5 (formula wildcards): Dice top-10 for a COUPLED wildcard query
    (repeated patterns + concrete sharing) over the synthetic corpus,
    scored with the shared-budget rule (plans/formula.wildcard_cc — the
    golden-verified deterministic equivalent of the reference's shared
    posting-list iterators). Store-free composition: per-expression pure
    scoring in a mapInPandas kernel; oracle = golden parquet."""
    from tangent_spark.config import IndexConfig
    from tangent_spark.operators.pairs import exprs_df
    from tangent_spark.operators.slt import pairs as slt_pairs
    from tangent_spark.operators.slt import parse_slt
    from tangent_spark.plans.formula import query_tuple_multiset, wildcard_cc

    from tangent_spark.operators.pairs import expr_tuples_df

    cfg = IndexConfig()
    concrete, wildcard, qtc = query_tuple_multiset(_WILDCARD_QUERY, cfg)
    exprs = exprs_df(_pages(spark)).select("slt").distinct().persist()
    # Corpus-wide posting sizes (unique exprs per tuple) for the matched
    # patterns — one small aggregate, same stats the indexed path reads
    # off f_postings (plans/formula.dice_topk_exprs).
    tup = expr_tuples_df(exprs, cfg)
    cond = None
    for fr, to, rel in set(wildcard):
        c = (
            (F.col("to") == to) & (F.col("rel") == rel)
            if fr.startswith("?")
            else (F.col("fr") == fr) & (F.col("rel") == rel)
        )
        cond = c if cond is None else (cond | c)
    sizes = (
        {
            (r["fr"], r["to"], r["rel"]): r["sz"]
            for r in tup.filter(cond)
            .groupBy("fr", "to", "rel")
            .agg(F.count("*").alias("sz"))
            .collect()
        }
        if cond is not None
        else {}
    )
    n_exprs = exprs.count()
    from tangent_spark.plans.formula import wildcard_dense_flags

    dense = wildcard_dense_flags(wildcard, sizes, n_exprs)

    def kernel(batches):
        import pandas as pd
        from collections import Counter

        for pdf in batches:
            rows = []
            for slt in pdf["slt"]:
                ec = Counter(
                    (fr, to, rel)
                    for fr, to, rel, _ in slt_pairs(
                        parse_slt(slt), cfg.window, cfg.eol_mode,
                        max_pair_len=cfg.max_pair_len,
                    )
                )
                cc = sum(min(qn, ec.get(t, 0)) for t, qn in concrete.items())
                cc += wildcard_cc(concrete, wildcard, dict(ec), sizes, dense=dense)
                if cc > 0:
                    etc = sum(ec.values())
                    rows.append({"slt": slt, "score": round(2.0 * cc / (etc + qtc), 4)})
            yield pd.DataFrame(rows, columns=["slt", "score"])

    scored = exprs.mapInPandas(kernel, schema="slt string, score double")
    # materialize the 10-row answer so the cached exprs can be released
    # here (lazy return would leak one cache entry per invocation)
    out = scored.orderBy(F.desc("score"), F.asc("slt")).limit(10).collect()
    exprs.unpersist()
    return spark.createDataFrame(out, "slt string, score double")


def dedup_minhash_band_pairs(spark, sf_dir):
    """Banded-LSH candidate pairs with an md5 hash family both engines
    share (each of the 4 MinHash components is one band): docs whose
    signatures collide on ANY band become a candidate pair — the
    bucket-equi-join pattern of operators/dedup.lsh_candidate_pairs,
    SQL-expressible for the oracle."""
    sig = minhash_signature(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(i).alias("band"), F.col(f"mh{i}").alias("bucket"))
                for i in range(4)
            ])
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    x, y = bands.alias("x"), bands.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
    )


def events_asof_join(spark, sf_dir):
    """As-of join: each purchase event matched to the user's most recent
    click at-or-before it. Spark lacks a native as-of join; the scalable
    shape is ONE shuffle — union both streams with a side marker, then a
    running `last(..., ignorenulls)` window per user ordered by
    (ts, marker) so a same-timestamp click is visible to the purchase.
    Oracle twin: DuckDB's native ASOF JOIN."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts"), F.col("value").alias("cval")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    u = purch.select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("double").alias("cval"), F.lit(1).alias("m"),
    ).unionByName(
        clicks.select(
            F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
            "cval", F.lit(0).alias("m"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "m")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("click_value", F.last("cval", ignorenulls=True).over(w))
        .withColumn(
            "click_ts",
            F.last(F.when(F.col("m") == 0, F.col("ts")), ignorenulls=True).over(w),
        )
        .filter((F.col("m") == 1) & F.col("click_value").isNotNull())
        .select(
            "event_id", "user_id",
            F.round("click_value", 4).alias("click_value"), "click_ts",
        )
    )


def events_range_window(spark, sf_dir):
    """Range-frame window: per event, count and sum of the SAME user's
    events in the preceding 300 seconds (exclusive of the current row) —
    the range-join-style neighborhood aggregate, one shuffle on user."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-300, -1)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(F.count("*").over(w), F.lit(0)).alias("n_prev_5min"),
        F.round(F.coalesce(F.sum("value").over(w), F.lit(0.0)), 4).alias("sum_prev_5min"),
    )


def events_pivot(spark, sf_dir):
    """Pivot: per-user event-type count matrix (fixed column set)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .select(
            "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in types]
        )
    )


def lineitem_percentiles(spark, sf_dir):
    """Exact interpolated percentiles of extended price per return flag
    (Spark `percentile` == DuckDB `quantile_cont`)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("p75"),
    )


def events_rollup(spark, sf_dir):
    """Time-bucketed aggregation, BOTH shapes in one contract entry:

    phase 'hourly' — tumbling-window agg by (hour, event_type) — the
        batch shape of the streaming operator;
    phase 'rollup' — ROLLUP over (event_type, day): subtotal and
        grand-total rows included (bucket/event_type NULL there)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    hourly = events_hourly(spark, sf_dir).select(
        F.lit("hourly").alias("phase"), "event_type", "bucket", "n", "total"
    )
    roll = (
        ev.withColumn("bucket", F.date_trunc("day", "ts"))
        .rollup("event_type", "bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .select(F.lit("rollup").alias("phase"), "event_type", "bucket", "n", "total")
    )
    return hourly.unionByName(roll)


def token_count_by_source(spark, sf_dir):
    """Token counting rolled up by source (pipeline accounting)."""
    docs = _docs(spark, sf_dir).withColumn("tokens", tokens_col_simple(F.col("text")))
    return docs.groupBy("source").agg(
        F.sum(F.size("tokens")).alias("total_tokens"),
        F.count("*").alias("n_docs"),
        F.round(F.avg(F.size("tokens")), 4).alias("avg_tokens"),
    )


# --- round-4 serving-surface entries (snippets, api front door, ANN) ---------

SNIPPET_TERMS = ["data", "query", "spark"]


def snippet_windows(spark, sf_dir):
    """Best highlight window per doc — the SMALLEST token window covering
    the MOST distinct query terms (plans/phrase.highlight_windows, the
    index-side half of snippet generation). Computed over raw documents
    so the DuckDB twin can brute-force every occurrence-bracketed window
    and pick per doc by (covered desc, span asc, start asc)."""
    from tangent_spark.plans.phrase import highlight_windows

    pos = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.posexplode(tokens_col_simple(F.col("text"))).alias("pos", "term"),
        )
        .filter(F.col("term").isin(SNIPPET_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.sort_array(F.collect_list("pos")).alias("positions"))
    )
    return highlight_windows(pos, SNIPPET_TERMS).orderBy("doc_id")


API_BM25_QUERY = "data query spark"
API_BOOL_QUERY = "data query +spark -join"
API_WILD_QUERY = "dat* ?uery"
API_FUZZY_QUERY = "data querry~1"
API_RE_QUERY = "/quer./ data"


def _api_stores(spark, sf_dir, base, with_words=True):
    """Word + formula IndexStores for the front-door entry, built fresh
    under `base` (simple tokenizer — the SQL-expressible one; see module
    docstring). with_words=False skips the word-index build for
    pure-math callers (the formula route never reads it); the formula
    store stands in as the (untouched) words slot."""
    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.formula import build_formula_index
    from tangent_spark.plans.indexer import build_index

    from tangent_spark.api import SearchStores

    cfg = IndexConfig(n_shards=4, block_size=32, tokenizer="simple")
    formulas = build_formula_index(spark, _pages(spark), f"{base}/f", cfg)
    if not with_words:
        return SearchStores(words=formulas, formulas=formulas)
    words = build_index(spark, _docs(spark, sf_dir), f"{base}/w", cfg)
    return SearchStores(words=words, formulas=formulas)


def api_formula_route(spark, sf_dir):
    """The api.search FORMULA route in isolation (golden-parquet twin:
    the expression path is not SQL-expressible; ground truth is the
    formula parity suite). Store built from the seeded synthetic pages,
    so the result is sf-independent and deterministic."""
    import shutil
    import tempfile

    from tangent_spark.api import search

    base = tempfile.mkdtemp(prefix="tangent_api_golden_")
    try:
        ss = _api_stores(spark, sf_dir, base, with_words=False)
        rows = [
            (int(r["doc_id"]), round(float(r["score"]), 4))
            for r in search(spark, ss, _FORMULA_QUERY, 10).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(sorted(rows), "doc_id long, score double")


def api_search_routes(spark, sf_dir):
    """End-to-end front-door routing (api.search): ONE query per route
    over freshly built stores — 'bm25' (plain words -> warm/cold WAND
    path), 'boolean' (+/- syntax -> conjunctive planner), 'formula'
    (MathML -> Dice over the expression index), 'wildcard' (`dat*
    ?uery` -> MultiTermQuery rewrite against the vocabulary, then the
    same kernel), 'fuzzy' (`querry~1` -> FuzzyQuery rewrite: vocabulary
    terms within 1 edit, then the same kernel), 'regexp' (`/quer./` ->
    RegexpQuery: anchored vocabulary match, then the same kernel). The
    bm25/boolean/wildcard/fuzzy/regexp rows are twinned by independent
    DuckDB BM25 SQL over the same documents table (the wildcard twin
    re-derives the expansion with LIKE/regexp, the fuzzy twin with
    levenshtein(), the regexp twin with regexp_full_match() over the
    SQL-tokenized vocabulary); the formula rows by the
    api_formula_route golden parquet."""
    import shutil
    import tempfile

    from tangent_spark.api import search

    base = tempfile.mkdtemp(prefix="tangent_api_entry_")
    try:
        ss = _api_stores(spark, sf_dir, base)
        out = []
        for route_name, q in (
            ("bm25", API_BM25_QUERY),
            ("boolean", API_BOOL_QUERY),
            ("formula", _FORMULA_QUERY),
            ("wildcard", API_WILD_QUERY),
            ("fuzzy", API_FUZZY_QUERY),
            ("regexp", API_RE_QUERY),
        ):
            for r in search(spark, ss, q, 10).collect():
                out.append((route_name, int(r["doc_id"]), round(float(r["score"]), 4)))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "route string, doc_id long, score double")


def ann_ivf_topk(spark, sf_dir):
    """IVF ANN off the embeddings table, three phases:

    'full' — unfiltered FULL probing (n_probe == n_centroids is exact
    by construction, the recall knob's upper end), so the brute-force
    cosine SQL twin independently oracles the whole IVF machinery —
    assignment, probe join, rescore, window.

    'filtered' — ES 8 knn-with-filter (plans/ann.ann_topk_ivf_filtered)
    over a PERSISTED store: `label = 2` restricts the candidate set
    before scoring; full probing makes the filtered path exact, so the
    brute-force-with-WHERE SQL is a genuine oracle of the filter
    semi-join + probe machinery.

    'tiny' — a highly selective filter (vec_id % 37 = 0) takes the
    brute-force route (ES "exact search when the filter is selective"),
    oracled by the same WHERE'd brute force.

    Partial-probe recall and the over-probe/escalation guarantee are
    pytest-covered (tests/test_ann_filtered.py, tests/test_ann_store.py).
    Rank is recomputed over the 4-decimal rounded cosines (both
    engines), so knife-edge ulps cannot reorder the output."""
    import shutil
    import tempfile

    from tangent_spark.operators.similarity import cosine_topk_ivf
    from tangent_spark.plans.ann import ann_topk_ivf_filtered, build_ann_index

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
        "label",
    )
    probes = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))

    def shape(df, phase):
        wide = df.select("query_id", "vec_id", F.round("cos", 4).alias("cos"))
        return (
            wide.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select(
                F.lit(phase).alias("phase"), "query_id", "rank", "vec_id", "cos"
            )
        )

    full = shape(
        cosine_topk_ivf(
            emb.select("vec_id", "embedding"), probes,
            k=50, n_centroids=8, n_probe=8, n_iter=4, seed=7,
        ),
        "full",
    )
    base = tempfile.mkdtemp(prefix="tangent_annf_entry_")
    try:
        store = build_ann_index(
            spark, emb.select("vec_id", "embedding"), f"{base}/ann",
            n_centroids=8, n_iter=4, seed=7,
        )
        rows = full.collect()
        rows += shape(
            ann_topk_ivf_filtered(
                spark, store, probes, emb, "label = 2", k=50, n_probe=8
            ),
            "filtered",
        ).collect()
        rows += shape(
            ann_topk_ivf_filtered(
                spark, store, probes, emb, "vec_id % 37 = 0", k=50, n_probe=1
            ),
            "tiny",
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        rows, "phase string, query_id long, rank int, vec_id long, cos double"
    )


def _ann_embeddings(spark):
    """Seeded clustered embedding corpus (sf-independent) for the PQ
    golden — the data shape PQ targets."""
    import numpy as np

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((10, 32)) * 4.0
    vecs = np.concatenate([c + 0.3 * rng.standard_normal((40, 32)) for c in centers])
    rows = [(int(i), vecs[i].tolist()) for i in range(len(vecs))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def ann_pq_topk(spark, sf_dir):
    """PQ-ADC ANN with exact re-rank (operators/similarity.cosine_topk_pq)
    over the seeded clustered corpus — m-byte codes scanned via LUT,
    top-`refine` candidates re-scored with exact cosines. Golden-parquet
    twin (ADC tables are not SQL-expressible); determinism comes from
    the seeded corpus + seeded xxhash64 training sample, guarded by the
    goldens staleness gate."""
    from tangent_spark.operators.similarity import cosine_topk_pq

    emb = _ann_embeddings(spark)
    probes = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    out = cosine_topk_pq(emb, probes, k=10, m=4, n_codes=32, refine=60, seed=7)
    return out.select("query_id", "rank", "vec_id", F.round("cos", 4).alias("cos"))


# --- round 4: store-lifecycle + graph entries (merge / append / CC) --------

def dedup_cc_components(spark, sf_dir):
    """Connected components over the VERIFIED near-dup graph: edges are
    the dedup_ngram_jaccard pairs (exact 3-gram Jaccard >= 0.2), labels
    via alternating large-star/small-star (operators/dedup.
    connected_components_star — the O(log^2 n)-round formulation that
    survives billion-edge dedup graphs; 9.1M-edge run in BENCH.md).
    component = min doc_id of the component. Oracle: DuckDB
    recursive-CTE reachability over the identical pair SQL."""
    from tangent_spark.operators.dedup import connected_components_star

    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    labels, _rounds = connected_components_star(pairs)
    return labels.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("component").cast("long").alias("component"),
    ).orderBy("doc_id")


MERGE_QUERY = "data query spark"


def merge_bm25_topk(spark, sf_dir):
    """Exact index merge end-to-end (plans/merge.merge_indexes): the
    documents table is split by doc_id parity, each half indexed
    INDEPENDENTLY (A9's parallel chunk indexing), the two stores merged
    (one (term, shard) shuffle, additive stats), and BM25 top-20 served
    from the MERGED store through the real Searcher kernel. The oracle
    is independent DuckDB BM25 SQL over the FULL documents table — i.e.
    the driver verifies merged == single-build-over-the-union exactly
    (scores, ranks, tie-breaks), not just internal consistency."""
    import shutil
    import tempfile

    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.indexer import build_index
    from tangent_spark.plans.merge import merge_indexes
    from tangent_spark.plans.search import Searcher

    base = tempfile.mkdtemp(prefix="tangent_merge_entry_")
    try:
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        cfg = IndexConfig(n_shards=4, block_size=32, tokenizer="simple")
        a = build_index(spark, docs.filter(F.col("doc_id") % 2 == 0), f"{base}/a", cfg)
        b = build_index(spark, docs.filter(F.col("doc_id") % 2 == 1), f"{base}/b", cfg)
        merged = merge_indexes(spark, [a, b], f"{base}/m")
        s = Searcher(spark, merged)
        rows = [
            (int(r["doc_id"]), round(float(r["score"]), 4))
            for r in s.topk(MERGE_QUERY, 20).collect()
        ]
        s.close()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(sorted(rows), "doc_id long, score double")


INCR_QUERY = "index data fast"


def incremental_bm25_all(spark, sf_dir):
    """Incremental indexing end-to-end (streaming/incremental): batch 0
    builds the store, batches 1-2 arrive via append_batch (the
    crash-idempotent tagged-append protocol), compact_postings restores
    1 run/(shard,term), and EVERY matched doc's BM25 score is served
    from the compacted store. Batches are contiguous doc_id ranges with
    zero-padded doc:// urls, so append's url-rank renumbering reproduces
    the original doc_ids and the DuckDB twin (full-corpus BM25, no
    top-k boundary — every matched doc, so no tie-break sensitivity)
    compares directly on doc_id."""
    import shutil
    import tempfile

    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.indexer import build_index
    from tangent_spark.plans.search import Searcher
    from tangent_spark.streaming.incremental import append_batch, compact_postings

    base = tempfile.mkdtemp(prefix="tangent_incr_entry_")
    try:
        docs = _docs(spark, sf_dir).select(
            "doc_id",
            "text",
            F.concat(F.lit("doc://"), F.lpad(F.col("doc_id").cast("string"), 9, "0")).alias("url"),
        )
        n = docs.count()
        c1, c2 = n // 3, 2 * n // 3
        cfg = IndexConfig(n_shards=4, block_size=32, tokenizer="simple")
        store = build_index(
            spark, docs.filter(F.col("doc_id") < c1), f"{base}/s", cfg, url_col="url"
        )
        append_batch(spark, store, docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)), 1)
        append_batch(spark, store, docs.filter(F.col("doc_id") >= c2), 2)
        compact_postings(spark, store)
        s = Searcher(spark, store)
        rows = [
            (int(r["doc_id"]), round(float(r["score"]), 4))
            for r in s.topk(INCR_QUERY, n).collect()
        ]
        s.close()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(sorted(rows), "doc_id long, score double")


DELETE_QUERY = "data query spark"
FILTERED_QUERY = "data query spark index"
FACET_ANY_QUERY = "data query spark"
FACET_BOOL_QUERY = "data +spark -join"
SUGGEST_PREFIX = "da"
MLT_DOC = 7
MLT_MAX_TERMS = 8


def _simple_store(spark, sf_dir, base, meta=(), positions=False):
    """documents -> a simple-tokenizer index (the oracle-comparable
    configuration shared by the engine-backed contract entries).
    positions=True additionally stores the positional table (phrase /
    rescore entries)."""
    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.indexer import build_index

    cols = ["doc_id", "text", *meta]
    cfg = IndexConfig(
        n_shards=4, block_size=32, tokenizer="simple", meta_cols=tuple(meta),
        store_positions=positions,
    )
    return build_index(
        spark, _docs(spark, sf_dir).select(*cols), f"{base}/s", cfg
    )


DYM_TYPO = "sparc"


def suggest_and_dym(spark, sf_dir):
    """Query-assist surfaces off ONE real index's term_stats, both in
    one contract entry:

    phase 'suggest' — prefix completion (plans/suggest.suggest_terms):
        top-10 'da…' vocabulary terms by df desc, term asc (dist = -1,
        no edit distance applies);
    phase 'dym'     — spelling correction (plans/suggest.did_you_mean,
        the Solr spellcheck surface): vocabulary terms within 1
        Levenshtein edit of 'sparc', closest-then-most-popular order."""
    import shutil
    import tempfile

    from tangent_spark.plans.suggest import (
        did_you_mean,
        spellcheck_collate,
        suggest_terms,
    )

    base = tempfile.mkdtemp(prefix="tangent_suggest_entry_")
    try:
        store = _simple_store(spark, sf_dir, base)
        out = [
            ("suggest", r["term"], int(r["df"]), -1)
            for r in suggest_terms(spark, store, SUGGEST_PREFIX, 10).collect()
        ] + [
            ("dym", r["term"], int(r["df"]), int(r["dist"]))
            for r in did_you_mean(spark, store, DYM_TYPO, 5).collect()
        ] + [
            # collation rides the same contract row: term = the
            # collated query, df = its hit count, dist = n_corrected
            ("collate", r["collation"], int(r["hits"]), int(r["n_corrected"]))
            for r in spellcheck_collate(spark, store, COLLATE_QUERY).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "phase string, term string, df int, dist int")


def mlt_topk(spark, sf_dir):
    """More-like-this (plans/suggest.more_like_this, Lucene MLT): the
    source doc's top tf*idf terms become a disjunctive BM25 query
    served by the WAND kernel, source excluded. Top-15 for doc 7 with
    8 selection terms."""
    import shutil
    import tempfile

    from tangent_spark.plans.suggest import more_like_this

    base = tempfile.mkdtemp(prefix="tangent_mlt_entry_")
    try:
        store = _simple_store(spark, sf_dir, base)
        out = [
            (int(r["doc_id"]), round(float(r["score"]), 4))
            for r in more_like_this(
                spark, store, MLT_DOC, 15, max_terms=MLT_MAX_TERMS
            ).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "doc_id long, score double")


def facet_counts_lang(spark, sf_dir):
    """Facet panel end-to-end (plans/boolean.facet_counts) over a real
    index with meta_cols=('lang',): per-lang hit counts of the match
    set, two phases — 'any' (pure disjunctive: docs containing >=1
    query term) and 'bool' (`data +spark -join`: >=1 positive term AND
    spark AND NOT join). Oracle recomputes both match sets with set
    algebra over the tokenized corpus."""
    import shutil
    import tempfile

    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.boolean import facet_counts
    from tangent_spark.plans.indexer import build_index

    base = tempfile.mkdtemp(prefix="tangent_facet_entry_")
    try:
        docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
        cfg = IndexConfig(
            n_shards=4, block_size=32, tokenizer="simple", meta_cols=("lang",)
        )
        store = build_index(spark, docs, f"{base}/s", cfg)
        out = []
        for phase, q in (("any", FACET_ANY_QUERY), ("bool", FACET_BOOL_QUERY)):
            out += [
                (phase, r["lang"], int(r["n_docs"]))
                for r in facet_counts(spark, store, q, "lang").collect()
            ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "phase string, lang string, n_docs long")


def filtered_bm25_topk(spark, sf_dir):
    """Metadata-filtered serving end-to-end (plans/boolean.filtered_topk)
    over a real index built with meta_cols=('lang',): BM25 top-20
    restricted to lang='en' documents, served by BOTH delivery routes —
    'driver' (candidate ids broadcast into the kernel, block-skip
    restricted decode) and 'join' (candidates stay distributed,
    semi-join before the global top-k) — which must agree exactly.
    Lucene filter semantics: the predicate restricts candidates only;
    scores keep corpus-level df/avgdl."""
    import shutil
    import tempfile

    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.boolean import filtered_topk
    from tangent_spark.plans.indexer import build_index

    base = tempfile.mkdtemp(prefix="tangent_filtered_entry_")
    try:
        docs = _docs(spark, sf_dir).select("doc_id", "text", "lang")
        cfg = IndexConfig(
            n_shards=4, block_size=32, tokenizer="simple", meta_cols=("lang",)
        )
        store = build_index(spark, docs, f"{base}/s", cfg)
        out = []
        for route, cap in (("driver", 1_000_000), ("join", 1)):
            out += [
                (route, int(r["doc_id"]), round(float(r["score"]), 4))
                for r in filtered_topk(
                    spark, store, FILTERED_QUERY, 20, "lang = 'en'",
                    max_driver_candidates=cap,
                ).collect()
            ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "route string, doc_id long, score double")


SEARCH_AFTER_QUERY = "data query spark index"


def search_after_explain(spark, sf_dir):
    """Cursor deep paging + score explain off ONE real index (both
    new-in-round-5 Solr/Lucene surfaces share the build and the query):

    phases 'p1'/'p2'/'p3' — searchAfter (Lucene IndexSearcher.
        searchAfter / Solr cursorMark): three consecutive pages of 10,
        each page one single-stage kernel job with after=(score,
        doc_id) from the previous page's last row. Page N moves <= k
        rows per shard exactly like page 1 — the only paging
        discipline that survives 10^12 docs (OFFSET moves N*k rows per
        shard). Oracle: ranks 1-30 of the full BM25 ordering sliced by
        rank — the pages must tile it exactly, no overlap, no gap.
        Paging rows carry term=''/tf=-1/df=-1/idf=-1 (n/a).
    phase 'explain'       — score explain (Lucene IndexSearcher.
        explain / Solr debug=results, SURVEY S12): per-(doc, term)
        BM25 factor breakdown for the engine's top-5 docs, read
        declaratively off the doc dictionary — no postings decode;
        score column = the term's contribution; contributions sum to
        the kernel score (test-asserted to 1e-9 in
        tests/test_index_search.py)."""
    import shutil
    import tempfile

    from tangent_spark.plans.search import bm25_topk_wand, explain_score

    base = tempfile.mkdtemp(prefix="tangent_after_entry_")
    try:
        store = _simple_store(spark, sf_dir, base)
        out: list = []
        cursor = None
        for page in ("p1", "p2", "p3"):
            rows = bm25_topk_wand(
                spark, store, SEARCH_AFTER_QUERY, 10, after=cursor
            ).collect()
            out += [
                (page, int(r["doc_id"]), "", -1, -1, -1.0,
                 round(float(r["score"]), 4))
                for r in rows
            ]
            if not rows:
                break
            cursor = (float(rows[-1]["score"]), int(rows[-1]["doc_id"]))
        top = bm25_topk_wand(spark, store, SEARCH_AFTER_QUERY, 5).collect()
        ids = [int(r["doc_id"]) for r in top]
        out += [
            (
                "explain",
                int(r["doc_id"]),
                r["term"],
                int(r["tf"]),
                int(r["df"]),
                round(float(r["idf"]), 4),
                round(float(r["contribution"]), 4),
            )
            for r in explain_score(
                spark, store, SEARCH_AFTER_QUERY, ids
            ).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out,
        "phase string, doc_id long, term string, tf int, df int, "
        "idf double, score double",
    )


def fielded_bm25_topk(spark, sf_dir):
    """Fielded (multi-field) boosted BM25 through a REAL fielded index
    (plans/fielded.py — the Solr `title:q^2 OR body:q` surface the
    reference delegated to its Solr sidecar, SURVEY S12). Documents
    are split deterministically into title = first 8 simple tokens,
    body = the rest; each field is its own postings space with its own
    docCount IDF and its own length norm (Lucene per-field norms).

    phase 'flat'    — boosts {title: 1, body: 1};
    phase 'boosted' — boosts {title: 2, body: 1} (title hits must
        outrank where the flat ordering had them tied or behind);
    phase 'dismax'  — boosts {title: 2, body: 1}, tie=0.3: Lucene
        DisjunctionMaxQuery / edismax's default combiner — per base
        term max over fields + tie x the rest (plans/fielded.
        dismax_topk).
    phase 'qp' / 'qp_dismax' — the Lucene classic-QueryParser
        field-scoped string ``title:data spark^2 index`` through
        plans/fielded.field_query_topk with qf {title: 2, body: 1}:
        ``title:data`` is a single boosted TermQuery (qf NOT applied
        to scoped clauses); bare ``spark^2`` / ``index`` expand over
        qf (title 2x, body 1x, times the ^boost); 'qp' sums the
        expansions, 'qp_dismax' combines each bare clause's
        expansions as max + 0.3 x rest.

    Oracle recomputes the per-field tf/dl/df/avgdl/docCount and the
    boosted two-field BM25 sum (and the dismax max-plus-tie combine,
    and the qp clause expansion table) from the raw corpus with the
    identical pos<=8 field split."""
    import shutil
    import tempfile

    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.fielded import (
        build_fielded_index,
        dismax_topk,
        field_query_topk,
        fielded_topk,
    )

    base = tempfile.mkdtemp(prefix="tangent_fielded_entry_")
    try:
        fdocs = (
            _docs(spark, sf_dir)
            .withColumn("toks", tokens_col_simple(F.col("text")))
            .select(
                "doc_id",
                F.array_join(F.slice("toks", 1, 8), " ").alias("title"),
                F.expr(
                    "array_join(slice(toks, 9, size(toks)), ' ')"
                ).alias("body"),
            )
        )
        cfg = IndexConfig(n_shards=4, block_size=32, tokenizer="simple")
        store = build_fielded_index(
            spark, fdocs, f"{base}/f", ("title", "body"), cfg
        )
        out = []
        for phase, boosts, tie in (
            ("flat", {"title": 1.0, "body": 1.0}, None),
            ("boosted", {"title": 2.0, "body": 1.0}, None),
            ("dismax", {"title": 2.0, "body": 1.0}, 0.3),
        ):
            topk = (
                fielded_topk(spark, store, SEARCH_AFTER_QUERY, 20, boosts)
                if tie is None
                else dismax_topk(
                    spark, store, SEARCH_AFTER_QUERY, 20, boosts, tie=tie
                )
            )
            out += [
                (phase, int(r["doc_id"]), round(float(r["score"]), 4))
                for r in topk.collect()
            ]
        qf = {"title": 2.0, "body": 1.0}
        for phase, tie in (("qp", None), ("qp_dismax", 0.3)):
            topk = field_query_topk(
                spark, store, "title:data spark^2 index", 20, qf, tie=tie
            )
            out += [
                (phase, int(r["doc_id"]), round(float(r["score"]), 4))
                for r in topk.collect()
            ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "phase string, doc_id long, score double")


def delete_bm25_topk(spark, sf_dir):
    """Document deletion lifecycle end-to-end (streaming/incremental.
    delete_docs + compact_postings), BOTH phases oracle-checked:

    phase 'masked'    — tombstones only (docs where doc_id % 7 == 3):
        serving MASKS them immediately while survivor scores stay at
        index-time stats (Lucene live-docs: deleted docs still count
        toward df/avgdl until merge). Twin: BM25 with stats/df over the
        FULL corpus, scoring restricted to survivors.
    phase 'compacted' — after compact_postings the removal is physical
        and stats are recomputed, so the store must equal a fresh build
        over the survivors. Twin: BM25 recomputed over survivors only.
    """
    import shutil
    import tempfile

    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.indexer import build_index
    from tangent_spark.plans.search import Searcher
    from tangent_spark.streaming.incremental import compact_postings, delete_docs

    base = tempfile.mkdtemp(prefix="tangent_delete_entry_")
    try:
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        cfg = IndexConfig(n_shards=4, block_size=32, tokenizer="simple")
        store = build_index(spark, docs, f"{base}/s", cfg)
        delete_docs(spark, store, docs.filter(F.col("doc_id") % 7 == 3), 1)
        out = []
        for phase in ("masked", "compacted"):
            s = Searcher(spark, store)
            out += [
                (phase, int(r["doc_id"]), round(float(r["score"]), 4))
                for r in s.topk(DELETE_QUERY, 20).collect()
            ]
            s.close()
            if phase == "masked":
                compact_postings(spark, store)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "phase string, doc_id long, score double")


# --- round-5 multi-term rewrites + scoring shapers (engine-backed) ----------

MULTITERM_GLOB_QUERY = "s* data"
MULTITERM_REGEXP_QUERY = "/s.a[a-z]+/ data"
MULTITERM_FUZZY_QUERY = "quary~1 sort~2 data"


def multiterm_expand_topk(spark, sf_dir):
    """Multi-term rewrites end-to-end through the REAL expansion +
    block-max WAND kernel over a freshly built index, all three
    rewrite families in one entry (Lucene MultiTermQuery with the
    TopTermsScoringBooleanQueryRewrite — plans/wildcard.py,
    plans/fuzzy.py):

    phase 'glob'   — `s* data`: the glob expands against the
        vocabulary (prefix pushed to the scan, anchored regex on top);
    phase 'regexp' — `/s.a[a-z]+/ data`: Lucene RegexpQuery syntax,
        body matched anchored against whole terms;
    phase 'fuzzy'  — `quary~1 sort~2 data`: Levenshtein expansion
        (FuzzyTermsEnum order dist asc, df desc, term asc).

    Expanded terms + literals then score as ONE disjunctive BM25 query,
    each term with its own idf. The expansion caps (1024 glob / 50
    fuzzy) cannot bind on the contract corpus's vocabulary, so the
    oracle recomputes each expansion exactly with LIKE / regexp_matches
    / levenshtein over the token stream."""
    import shutil
    import tempfile

    from tangent_spark.plans.fuzzy import fuzzy_topk
    from tangent_spark.plans.wildcard import regexp_topk, wildcard_topk

    base = tempfile.mkdtemp(prefix="tangent_mt_entry_")
    try:
        store = _simple_store(spark, sf_dir, base)
        out = []
        for phase, fn, q in (
            ("glob", wildcard_topk, MULTITERM_GLOB_QUERY),
            ("regexp", regexp_topk, MULTITERM_REGEXP_QUERY),
            ("fuzzy", fuzzy_topk, MULTITERM_FUZZY_QUERY),
        ):
            out += [
                (phase, int(r["doc_id"]), round(float(r["score"]), 4))
                for r in fn(spark, store, q, 20).collect()
            ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "phase string, doc_id long, score double")


SYN_QUERY = "data table"
SYN_MAP = {"data": ["big"]}


def synonym_bm25_topk(spark, sf_dir):
    """Query-time synonym expansion through the REAL kernel
    (plans/search.bm25_topk_synonyms — Lucene SynonymQuery semantics):
    'data' and its synonym 'big' score as ONE pseudo-term — member tfs
    sum per doc BEFORE the BM25 tf-normalization and the group idf
    comes from the group's max df; 'table' scores alone."""
    import shutil
    import tempfile

    from tangent_spark.plans.search import bm25_topk_synonyms

    base = tempfile.mkdtemp(prefix="tangent_syn_entry_")
    try:
        store = _simple_store(spark, sf_dir, base)
        out = [
            (int(r["doc_id"]), round(float(r["score"]), 4))
            for r in bm25_topk_synonyms(
                spark, store, SYN_QUERY, 20, SYN_MAP
            ).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "doc_id long, score double")


BOOST_QUERY = "data^2 query table^0.5"
MM_QUERY = "data query table value"
MM_SPEC = 3


def boosted_mm_topk(spark, sf_dir):
    """Score-shaping surfaces through the REAL kernels, both in one
    entry:

    phase 'boost' — `data^2 query table^0.5` (Lucene term-boost syntax
        on the plain BM25 route): each boosted term's idf is scaled by
        its boost, block-max pruning stays exact
        (plans/search.split_term_boosts);
    phase 'mm'    — `data query table value` with minimum_should_match
        = 3 (Solr mm): a doc must match >= 3 distinct should terms;
        surviving docs keep their full BM25 score over matching terms
        (plans/boolean.resolve_mm)."""
    import shutil
    import tempfile

    from tangent_spark.plans.boolean import boolean_topk
    from tangent_spark.plans.search import bm25_topk_wand

    base = tempfile.mkdtemp(prefix="tangent_shape_entry_")
    try:
        store = _simple_store(spark, sf_dir, base)
        out = [
            ("boost", int(r["doc_id"]), round(float(r["score"]), 4))
            for r in bm25_topk_wand(spark, store, BOOST_QUERY, 20).collect()
        ]
        out += [
            ("mm", int(r["doc_id"]), round(float(r["score"]), 4))
            for r in boolean_topk(
                spark, store, MM_QUERY, 20, min_should_match=MM_SPEC
            ).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "phase string, doc_id long, score double")


FACET_RANGE_QUERY = "data +spark -join"
FR_START, FR_END, FR_GAP = 0.0, 600.0, 100.0
# synthetic warc_ts derivation for the date histogram: one week of
# crawl timestamps spread deterministically by doc_id, day buckets
DH_EPOCH0, DH_SPAN, DH_INTERVAL = 1_600_000_000, 604_800, 86_400.0


def facet_dhist_counts(spark, sf_dir):
    """Date histogram (ES date_histogram fixed_interval / Solr date
    facet.range) through the REAL kernel route (plans/boolean.
    facet_date_histogram): day-bucket hit counts of a derived
    warc_ts-style TIMESTAMP metadata column (epoch0 + (doc_id*137)
    mod one-week) over the `data +spark -join` match set, zero-filled
    in time order. Output k1 = bucket ordinal (timezone-proof for the
    SQL twin); the timestamp bucket labels themselves are asserted in
    tests/test_facet_range_stats.py."""
    import shutil
    import tempfile

    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.boolean import facet_date_histogram
    from tangent_spark.plans.indexer import build_index

    base = tempfile.mkdtemp(prefix="tangent_dhist_entry_")
    try:
        docs = _docs(spark, sf_dir).select("doc_id", "text").withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(DH_EPOCH0) + (F.col("doc_id") * 137) % DH_SPAN
            ),
        )
        cfg = IndexConfig(
            n_shards=4, block_size=32, tokenizer="simple", meta_cols=("ts",)
        )
        store = build_index(spark, docs, f"{base}/s", cfg)
        rows = facet_date_histogram(
            spark, store, FACET_RANGE_QUERY, "ts",
            float(DH_EPOCH0), float(DH_EPOCH0 + DH_SPAN), DH_INTERVAL,
        ).collect()
        out = [(i, int(r["n_docs"])) for i, r in enumerate(rows)]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "bucket long, n_docs long")


def facet_range_nchars(spark, sf_dir):
    """Numeric range facet (Solr facet.range) through the REAL kernel
    route (plans/boolean.facet_range): hit counts per 100-char bucket
    of n_chars over the `data +spark -join` match set, phase 'all'
    unfiltered and phase 'en' with a lang filter composed in. Every
    bucket appears zero-filled in range order — the Solr shape."""
    import shutil
    import tempfile

    from tangent_spark.plans.boolean import facet_range

    base = tempfile.mkdtemp(prefix="tangent_frange_entry_")
    try:
        store = _simple_store(spark, sf_dir, base, meta=("n_chars", "lang"))
        out = []
        for phase, where in (("all", None), ("en", "lang = 'en'")):
            out += [
                (phase, float(r["bucket"]), int(r["n_docs"]))
                for r in facet_range(
                    spark, store, FACET_RANGE_QUERY, "n_chars",
                    FR_START, FR_END, FR_GAP, where=where,
                ).collect()
            ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out, "phase string, bucket double, n_docs long"
    )


def facet_stats_nchars(spark, sf_dir):
    """Stats facet (Solr StatsComponent) through the REAL kernel route
    (plans/boolean.facet_stats): one moment row (count, missing, min,
    max, sum, mean) of n_chars over the `data +spark -join` match set.
    The kernel moves one partial per shard regardless of the column's
    cardinality."""
    import shutil
    import tempfile

    from tangent_spark.plans.boolean import facet_stats

    base = tempfile.mkdtemp(prefix="tangent_fstats_entry_")
    try:
        store = _simple_store(spark, sf_dir, base, meta=("n_chars",))
        r = facet_stats(
            spark, store, FACET_RANGE_QUERY, "n_chars"
        ).collect()[0]
        out = [(
            int(r["n_count"]), int(r["n_missing"]),
            float(r["v_min"]), float(r["v_max"]),
            float(r["v_sum"]), round(float(r["v_mean"]), 4),
        )]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out,
        "n_count long, n_missing long, v_min double, v_max double, "
        "v_sum double, v_mean double",
    )


def facet_pivot_counts(spark, sf_dir):
    """Two-level pivot facet (Solr facet.pivot) through the REAL kernel
    route (plans/boolean.facet_pivot): (lang, source) hit-count pairs
    over the `data +spark -join` match set, flattened n_docs desc then
    values asc. The pair rides the kernel as ONE composite value;
    typed columns are restored by a broadcast join against the
    dictionary's distinct pairs."""
    import shutil
    import tempfile

    from tangent_spark.plans.boolean import facet_pivot

    base = tempfile.mkdtemp(prefix="tangent_fpivot_entry_")
    try:
        store = _simple_store(spark, sf_dir, base, meta=("lang", "source"))
        out = [
            (r["lang"], r["source"], int(r["n_docs"]))
            for r in facet_pivot(
                spark, store, FACET_RANGE_QUERY, ("lang", "source")
            ).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out, "lang string, source string, n_docs long"
    )


ELEV_QUERY = "data query spark"
ELEV_PINS = [7, 3]


def elevated_bm25_topk(spark, sf_dir):
    """Query elevation (Solr QueryElevationComponent) through the REAL
    serving paths (plans/search.elevated_topk): docs 7 and 3 pinned to
    ranks 1-2 in that order (real BM25 scores — the candidate-routed
    boolean kernel scores exactly the pinned set), organic WAND
    results fill ranks 3-10 with the pinned docs removed."""
    import shutil
    import tempfile

    from tangent_spark.plans.search import elevated_topk

    base = tempfile.mkdtemp(prefix="tangent_elev_entry_")
    try:
        store = _simple_store(spark, sf_dir, base)
        out = [
            (
                int(r["rank"]), int(r["doc_id"]),
                None if r["score"] is None else round(float(r["score"]), 4),
                bool(r["elevated"]),
            )
            for r in elevated_topk(
                spark, store, ELEV_QUERY, 10, ELEV_PINS
            ).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out, "rank int, doc_id long, score double, elevated boolean"
    )


NEAR_DUP_COS = 0.3  # sf0.01 embeddings are near-orthogonal; 0.3 yields ~1k pairs


def dedup_embedding_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs — the EXACT baseline
    (operators/similarity.embedding_near_dup_pairs_exact): all (doc_a <
    doc_b) pairs with cosine >= 0.3 over the embeddings table. The
    LSH-bucketed scale path (embedding_near_dup_pairs) is pytest-
    covered for precision (exact-by-construction) and recall on
    planted clusters; this entry pins the verification semantics both
    share."""
    from tangent_spark.operators.similarity import (
        embedding_near_dup_pairs_exact,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (
        embedding_near_dup_pairs_exact(emb, NEAR_DUP_COS)
        .select("doc_a", "doc_b", F.round("cos", 4).alias("cos"))
        .orderBy("doc_a", "doc_b")
    )


COLLATE_QUERY = "quary sparc data"


def spellcheck_collation(spark, sf_dir):
    """Spellcheck collation (Solr spellcheck.collate) through the REAL
    surface (plans/suggest.spellcheck_collate): 'quary' and 'sparc'
    correct to their closest vocabulary terms (dist asc, df desc, term
    asc), in-vocabulary 'data' passes through, and the one-row result
    carries the collated query with its disjunctive hit count."""
    import shutil
    import tempfile

    from tangent_spark.plans.suggest import spellcheck_collate

    base = tempfile.mkdtemp(prefix="tangent_collate_entry_")
    try:
        store = _simple_store(spark, sf_dir, base)
        out = [
            (r["collation"], int(r["hits"]), int(r["n_corrected"]))
            for r in spellcheck_collate(spark, store, COLLATE_QUERY).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        out, "collation string, hits long, n_corrected int"
    )


# --- merged contract entries (the driver harness runs at most 50) ------------
# Each wrapper unions the already-verified building blocks above under a
# phase column so every oracle survives consolidation.

FNB_QUERY = "data query table"
FNB_EXPR = "1.0 + 0.1 * ln(1 + n_chars)"


def fnboost_topk(spark, sf_dir):
    """Function query (Solr boost=<func> / Lucene FunctionScoreQuery)
    through the REAL kernel: BM25 top-20 for 'data query table' scored
    x (1 + 0.1 ln(1 + n_chars)) — the weight exceeds 1, exercising the
    power-of-two normalization that keeps block-max pruning exact
    (plans/search.function_boosted_topk)."""
    import shutil
    import tempfile

    from tangent_spark.plans.search import function_boosted_topk

    base = tempfile.mkdtemp(prefix="tangent_fnb_entry_")
    try:
        store = _simple_store(spark, sf_dir, base, meta=("n_chars",))
        out = [
            ("fnboost", int(r["doc_id"]), round(float(r["score"]), 4))
            for r in function_boosted_topk(
                spark, store, FNB_QUERY, 20, FNB_EXPR
            ).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "phase string, doc_id long, score double")


RESCORE_QUERY = "data query"
RESCORE_WEIGHT = 2.0
RESCORE_WINDOW = 50


def rescore_phase_topk(spark, sf_dir):
    """Phrase rescoring through the REAL pipeline (Lucene QueryRescorer
    / ES rescore / Solr edismax pf — plans/rescore.py): BM25 top-50 for
    'data query', re-scored as base + 2.0 x phrase_bm25("data query")
    and re-sorted to top-20. The oracle recomputes the window, the
    positional phrase tf, the summed member idf and the combination
    from raw documents."""
    import shutil
    import tempfile

    from tangent_spark.plans.rescore import phrase_rescore_topk

    base = tempfile.mkdtemp(prefix="tangent_rescore_entry_")
    try:
        store = _simple_store(spark, sf_dir, base, positions=True)
        out = [
            ("rescore", int(r["doc_id"]), round(float(r["score"]), 4))
            for r in phrase_rescore_topk(
                spark, store, RESCORE_QUERY, 20,
                window=RESCORE_WINDOW, weight=RESCORE_WEIGHT,
            ).collect()
        ]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(out, "phase string, doc_id long, score double")


def multiterm_shaping_topk(spark, sf_dir):
    """Eight serving phases in one entry — the multi-term rewrites
    (glob / regexp / fuzzy, see multiterm_expand_topk), SynonymQuery
    scoring ('syn', see synonym_bm25_topk), the score shapers
    ('boost' / 'mm', see boosted_mm_topk), the function query
    ('fnboost', see fnboost_topk) and phrase rescoring ('rescore',
    see rescore_phase_topk)."""
    mt = multiterm_expand_topk(spark, sf_dir)
    syn = synonym_bm25_topk(spark, sf_dir).select(
        F.lit("syn").alias("phase"), "doc_id", "score"
    )
    bm = boosted_mm_topk(spark, sf_dir)
    fb = fnboost_topk(spark, sf_dir)
    rs = rescore_phase_topk(spark, sf_dir)
    return mt.unionByName(syn).unionByName(bm).unionByName(fb).unionByName(rs)


def significant_terms_jlh(spark, sf_dir):
    """ES significant_terms with JLH scoring (plans/sigterms.py) over
    the `data +spark -join` match set, served off a real index
    (boolean match-set kernel -> fg re-tokenize of ONLY matched docs ->
    stored term_stats as background): top-10 (term, fg_df, score),
    min_doc_count=3."""
    import shutil
    import tempfile

    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.indexer import build_index
    from tangent_spark.plans.sigterms import significant_terms

    base = tempfile.mkdtemp(prefix="tangent_sig_entry_")
    try:
        docs = _docs(spark, sf_dir).select("doc_id", "text")
        cfg = IndexConfig(n_shards=4, block_size=32, tokenizer="simple")
        store = build_index(spark, docs, f"{base}/s", cfg)
        return significant_terms(
            spark, store, docs, FACET_BOOL_QUERY, k=10, min_doc_count=3
        ).collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def facet_pcts_card(spark, sf_dir):
    """ES percentiles + cardinality aggregations over the `data +spark
    -join` match set (plans/boolean.facet_percentiles /
    facet_cardinality, both exact): 'pcts' rows are percentile_cont of
    n_chars at 4 fractions computed from the kernel's (value, count)
    histogram; 'card' is the distinct non-NULL lang count."""
    import shutil
    import tempfile

    from tangent_spark.plans.boolean import facet_cardinality, facet_percentiles

    base = tempfile.mkdtemp(prefix="tangent_fpcts_entry_")
    try:
        store = _simple_store(spark, sf_dir, base, meta=("n_chars", "lang"))
        fr = (0.25, 0.5, 0.75, 0.95)
        rows = [
            ("pcts", f"{r['pct']:g}", round(float(r["val"]), 4))
            for r in facet_percentiles(
                spark, store, FACET_BOOL_QUERY, "n_chars", fr
            ).collect()
        ]
        card = facet_cardinality(
            spark, store, FACET_BOOL_QUERY, "lang"
        ).collect()[0]
        rows.append(("card", "lang", float(card["n_distinct"])))
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(rows, "phase string, k1 string, val double")


def facet_panels(spark, sf_dir):
    """The whole facet surface in one entry (generic (phase, k1, k2,
    val) rows): 'any'/'bool' per-lang counts (facet_counts_lang),
    'range_all'/'range_en' n_chars buckets (facet_range_nchars —
    integral buckets rendered as integer strings), 'stats' moment rows
    (facet_stats_nchars, one row per metric), 'pivot' (lang, source)
    pairs (facet_pivot_counts), 'sig' significant terms
    (significant_terms_jlh: k1=term, k2=fg_df, val=JLH score), 'pcts'
    exact percentiles of n_chars, 'card' distinct-lang cardinality
    (facet_pcts_card), and 'dhist' day-bucket date-histogram counts
    over a derived warc_ts-style timestamp (facet_dhist_counts)."""
    rows = []
    for r in facet_counts_lang(spark, sf_dir).collect():
        rows.append((r["phase"], r["lang"], "", float(r["n_docs"])))
    for r in facet_range_nchars(spark, sf_dir).collect():
        rows.append(
            ("range_" + r["phase"], str(int(r["bucket"])), "", float(r["n_docs"]))
        )
    st = facet_stats_nchars(spark, sf_dir).collect()[0]
    for m in ("n_count", "n_missing", "v_min", "v_max", "v_sum", "v_mean"):
        rows.append(("stats", m, "", float(st[m])))
    for r in facet_pivot_counts(spark, sf_dir).collect():
        rows.append(("pivot", r["lang"], r["source"], float(r["n_docs"])))
    for r in significant_terms_jlh(spark, sf_dir):
        rows.append(("sig", r["term"], str(int(r["fg_df"])), float(r["score"])))
    for r in facet_pcts_card(spark, sf_dir).collect():
        rows.append((r["phase"], r["k1"], "", float(r["val"])))
    for r in facet_dhist_counts(spark, sf_dir).collect():
        rows.append(("dhist", str(int(r["bucket"])), "", float(r["n_docs"])))
    return spark.createDataFrame(
        rows, "phase string, k1 string, k2 string, val double"
    )


def dedup_pair_scores(spark, sf_dir):
    """Near-duplicate pair surfaces in one entry: 'ngram' = exact
    3-gram Jaccard pairs (dedup_ngram_jaccard), 'cos' = exact
    embedding-cosine pairs (dedup_embedding_pairs)."""
    ng = dedup_ngram_jaccard(spark, sf_dir).select(
        F.lit("ngram").alias("phase"), "doc_a", "doc_b",
        F.col("jaccard").alias("sim"),
    )
    co = dedup_embedding_pairs(spark, sf_dir).select(
        F.lit("cos").alias("phase"), "doc_a", "doc_b",
        F.col("cos").alias("sim"),
    )
    return ng.unionByName(co)


def store_lifecycle_bm25(spark, sf_dir):
    """Store-lifecycle serving in one entry: 'merged' = BM25 top-20
    from two independently-built halves merged into one store
    (merge_bm25_topk — oracle knows nothing of the split);
    'incremental' = every matched doc served after two tagged appends
    plus compaction (incremental_bm25_all — append == batch exactly)."""
    m = merge_bm25_topk(spark, sf_dir).select(
        F.lit("merged").alias("phase"), "doc_id", "score"
    )
    i = incremental_bm25_all(spark, sf_dir).select(
        F.lit("incremental").alias("phase"), "doc_id", "score"
    )
    return m.unionByName(i)
