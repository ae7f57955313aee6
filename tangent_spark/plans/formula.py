"""Formula search: expression-level index + Dice top-k
(SURVEY.md §2.5 Q1-Q11 — the reference engine's actual scoring path).

Two-level index exactly as the reference keeps it in memory
(mathindexbase.h:201-261): postings point at unique *expressions*, a
second map expands expressions to (doc, positions). At web scale the
expression dedup is the big win: identical formulas across the corpus
collapse to one postings entry (the NTCIR corpus has ~2.6M unique
expressions over 319k docs; Common-Crawl math repeats far more).

Tables in the IndexStore:
  f_dict(expr_id, slt, expr_tc)        — id = deterministic rank of slt
  f_postings(fr, to, rel, expr_id, cnt) — split term columns so wildcard
                                          lookups are plain equi-joins
  f_docs(expr_id, doc_id, positions)

Scoring: Dice/F-measure F = 2*cc/(expr_tc + query_tc), cc = count-capped
multiset overlap (mathindex.cpp:239-246); wildcard query tuples (?x at
either end) match any concrete symbol at that end via an equi-join on
the remaining two fields, contributing min(q_cnt, 1) per expression
(the reference's IDIterANY cap, mathindexmid.h:134-141). Ties break on
ascending expr_id (mathindexbase.h:100)."""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.functions.ids import dense_ids
from tangent_spark.operators.pairs import exprs_df, expr_tuples_df
from tangent_spark.operators.slt import mathml_to_slt, pairs, parse_slt
from tangent_spark.sources.store import IndexStore


def build_formula_index(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    cfg: IndexConfig = IndexConfig(),
    id_col: str = "doc_id",
    html_col: str = "html",
) -> IndexStore:
    store = IndexStore(out_dir)
    store.set_config(cfg)

    if not store.stage_done("exprs"):
        t0 = time.time()
        exprs_df(pages, id_col, html_col).write.mode("overwrite").parquet(
            store.path("exprs")
        )
        n = spark.read.parquet(store.path("exprs")).count()
        store.commit_stage("exprs", ["exprs"], {"expr_doc_rows": n, "secs": time.time() - t0})

    exprs = spark.read.parquet(store.path("exprs"))

    if not store.stage_done("f_dict"):
        t0 = time.time()
        uniq = exprs.select("slt").distinct()
        tuples = expr_tuples_df(uniq, cfg)
        tc = tuples.groupBy("slt").agg(F.sum("cnt").cast("int").alias("expr_tc"))
        dense_ids(uniq.join(tc, "slt", "left"), "slt", "expr_id").na.fill(
            {"expr_tc": 0}
        ).write.mode("overwrite").parquet(store.path("f_dict"))
        n = spark.read.parquet(store.path("f_dict")).count()
        store.commit_stage("f_dict", ["f_dict"], {"unique_exprs": n, "secs": time.time() - t0})

    fdict = spark.read.parquet(store.path("f_dict"))

    if not store.stage_done("f_postings"):
        t0 = time.time()
        tuples = expr_tuples_df(fdict.select("slt"), cfg)
        (
            tuples.join(fdict.select("slt", "expr_id"), "slt")
            .select("fr", "to", "rel", "expr_id", "cnt")
            .repartition(
                max(cfg.n_shards, spark.sparkContext.defaultParallelism),
                "fr", "to", "rel",
            )
            .sortWithinPartitions("fr", "to", "rel", "expr_id")
            .write.mode("overwrite")
            .parquet(store.path("f_postings"))
        )
        n = spark.read.parquet(store.path("f_postings")).count()
        store.commit_stage(
            "f_postings", ["f_postings"], {"postings": n, "secs": time.time() - t0}
        )

    if not store.stage_done("f_docs"):
        t0 = time.time()
        (
            exprs.join(fdict.select("slt", "expr_id"), "slt")
            .select("expr_id", "doc_id", "positions")
            .write.mode("overwrite")
            .parquet(store.path("f_docs"))
        )
        n = spark.read.parquet(store.path("f_docs")).count()
        store.commit_stage("f_docs", ["f_docs"], {"expr_docs": n, "secs": time.time() - t0})

    return store


def query_tuple_multiset(query_mathml: str, cfg: IndexConfig):
    """Driver-side Q2: query MathML -> (concrete, wildcard, query_tc).
    concrete: {(fr,to,rel): cnt}; wildcard: {(fr,to,rel): cnt} with '?'
    at exactly one end. Both-wildcard tuples are dropped (P7,
    mathindex.cpp:280-281)."""
    slt = mathml_to_slt(query_mathml)
    if slt is None:
        return {}, {}, 0
    tree = parse_slt(slt)
    concrete: dict = {}
    wildcard: dict = {}
    qtc = 0
    for fr, to, rel, _loc in pairs(tree, cfg.window, cfg.eol_mode, max_pair_len=cfg.max_pair_len):
        fr_w, to_w = fr.startswith("?"), to.startswith("?")
        if fr_w and to_w:
            continue
        qtc += 1
        target = wildcard if (fr_w or to_w) else concrete
        key = (fr, to, rel)
        target[key] = target.get(key, 0) + 1
    return concrete, wildcard, qtc


def dice_topk_exprs(
    spark: SparkSession,
    store: IndexStore,
    query_mathml: str,
    k: int,
) -> DataFrame:
    """Top-k expressions by Dice score -> (expr_id, slt, score, expr_tc)."""
    cfg = store.get_config()
    concrete, wildcard, qtc = query_tuple_multiset(query_mathml, cfg)
    if qtc == 0:
        return spark.createDataFrame([], "expr_id long, slt string, score double, expr_tc int")
    postings = spark.read.parquet(store.path("f_postings"))
    parts = []
    if concrete:
        qdf = spark.createDataFrame(
            [(fr, to, rel, c) for (fr, to, rel), c in sorted(concrete.items())],
            "fr string, to string, rel string, q_cnt int",
        )
        parts.append(
            postings.join(F.broadcast(qdf), ["fr", "to", "rel"])
            .select("expr_id", F.least("q_cnt", "cnt").alias("contrib"))
        )
    for (fr, to, rel), c in sorted(wildcard.items()):
        cap = min(c, 1)
        if fr.startswith("?"):
            m = postings.filter((F.col("to") == to) & (F.col("rel") == rel))
        else:
            m = postings.filter((F.col("fr") == fr) & (F.col("rel") == rel))
        parts.append(
            m.select("expr_id").distinct().select("expr_id", F.lit(cap).alias("contrib"))
        )
    contribs = parts[0]
    for p in parts[1:]:
        contribs = contribs.unionByName(p)
    cc = contribs.groupBy("expr_id").agg(F.sum("contrib").alias("cc"))
    fdict = spark.read.parquet(store.path("f_dict"))
    scored = cc.join(fdict, "expr_id").withColumn(
        "score", 2.0 * F.col("cc") / (F.col("expr_tc") + F.lit(qtc))
    )
    return (
        scored.select("expr_id", "slt", "score", "expr_tc")
        .orderBy(F.desc("score"), F.asc("expr_id"))
        .limit(k)
    )


def dice_topk_docs(
    spark: SparkSession, store: IndexStore, query_mathml: str, k: int
) -> DataFrame:
    """Q11 + R10: expand top-k expressions to documents and rank docs by
    (best formula score, total score), ties on doc_id ascending."""
    exprs = dice_topk_exprs(spark, store, query_mathml, k)
    docs = spark.read.parquet(store.path("f_docs"))
    return (
        exprs.join(docs, "expr_id")
        .groupBy("doc_id")
        .agg(
            F.max("score").alias("best_score"),
            F.sum("score").alias("total_score"),
            F.count("*").alias("n_exprs"),
        )
        .orderBy(F.desc("best_score"), F.desc("total_score"), F.asc("doc_id"))
        .limit(k)
    )
