"""Incremental index maintenance.

The reference has no streaming (SURVEY.md §2.7) — its closest analog
is the socket server feeding `Lexicon.add` on a live in-memory index
(mathindexbase.h:222). Our batch index becomes incremental almost for
free because of two design choices made upstream:

1. postings rows are APPEND-ONLY RUNS: the WAND kernel already merges
   any number of (shard, term) rows (each row is just more blocks), so
   a new batch's postings can be appended to the parquet dir without
   rewriting old runs;
2. block-max metadata is (max_tf, min_dl), not a baked score bound, so
   bounds stay safe as avgdl/df drift across batches (codec.py).

Each micro-batch: anti-join already-indexed urls -> assign fresh dense
doc ids above the current high-water mark -> tokenize -> append postings
runs + docs rows -> MERGE the (small) term_stats and corpus_stats
tables -> commit a manifest stage 'batch_<epoch>' with counters. A
replayed epoch (foreachBatch redelivery) is skipped by the manifest
check — that plus the atomic manifest write gives effectively-once
semantics. Query results after N appends are EXACTLY the results of a
from-scratch batch build over the union (tested).

Compaction (merging a term's many short runs into one) is a pure
rewrite of the postings table and can run any time; query correctness
never depends on it.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tangent_spark.config import IndexConfig
from tangent_spark.functions.ids import dense_ids
from tangent_spark.functions.tokenize import terms_df
from tangent_spark.plans.indexer import POSTINGS_SCHEMA, _encode_runs
from tangent_spark.sources.store import IndexStore


def append_batch(
    spark: SparkSession,
    store: IndexStore,
    pages: DataFrame,
    batch_id: int | str,
    text_col: str = "text",
    url_col: str = "url",
    extra_terms_fn=None,
) -> dict:
    """Append one batch of pages to an existing index. Idempotent per
    batch_id (manifest-gated). Returns the batch counters."""
    stage = f"batch_{batch_id}"
    if store.stage_done(stage):
        return store.read_manifest()["stages"][stage]["counters"]
    cfg = store.get_config()

    existing_docs = spark.read.parquet(store.path("docs"))
    n0 = existing_docs.count()
    fresh = pages.join(
        existing_docs.select("url"), pages[url_col] == existing_docs.url, "left_anti"
    )
    fresh = dense_ids(fresh.drop("doc_id") if "doc_id" in fresh.columns else fresh,
                      url_col, "_rank")
    fresh = fresh.withColumn("doc_id", (F.col("_rank") + F.lit(n0)).cast("long")).drop("_rank")

    # Stage the batch to its own parquet and re-read: appending to the
    # docs/postings paths below invalidates any cached plan that READS
    # those paths (Spark refreshes written paths), so the batch lineage
    # must be rooted at an independent location first. The staging dir
    # doubles as the batch's crash checkpoint.
    staging = store.path(f"_staging_{stage}")
    fresh.write.mode("overwrite").parquet(staging + "/pages")
    fresh = spark.read.parquet(staging + "/pages")
    n_new = fresh.count()
    if n_new == 0:
        store.commit_stage(stage, [], {"new_docs": 0})
        return {"new_docs": 0}

    t0 = time.time()
    terms = terms_df(fresh, "doc_id", text_col, cfg.tokenizer)
    if extra_terms_fn is not None:
        terms = terms.unionByName(extra_terms_fn(fresh))
    terms.write.mode("overwrite").parquet(staging + "/terms")
    terms = spark.read.parquet(staging + "/terms")

    # postings runs: same shuffle as the batch build, appended
    shard_parts = max(cfg.n_shards, spark.sparkContext.defaultParallelism)
    (
        terms.withColumn("shard", (F.col("doc_id") % cfg.n_shards).cast("int"))
        .repartition(shard_parts, "term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
        .mapInPandas(_encode_runs(cfg), schema=POSTINGS_SCHEMA)
        .write.mode("append")
        .parquet(store.path("postings"))
    )
    terms.write.mode("append").parquet(store.path("terms"))
    fresh.select("doc_id", F.col(url_col).alias("url")).write.mode("append").parquet(
        store.path("docs")
    )

    # merge the small dictionaries (term_stats / corpus_stats)
    batch_stats = terms.groupBy("term").agg(
        F.count("*").cast("int").alias("df"), F.sum("tf").alias("cf")
    )
    old_stats = spark.read.parquet(store.path("term_stats"))
    merged = (
        old_stats.unionByName(batch_stats)
        .groupBy("term")
        .agg(F.sum("df").cast("int").alias("df"), F.sum("cf").alias("cf"))
    ).persist()
    merged.count()  # materialize BEFORE overwriting the input path
    merged.write.mode("overwrite").parquet(store.path("term_stats") + "_tmp")
    spark.read.parquet(store.path("term_stats") + "_tmp").write.mode(
        "overwrite"
    ).parquet(store.path("term_stats"))

    old_cs = spark.read.parquet(store.path("corpus_stats")).collect()[0]
    batch_tokens = terms.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.sum("dl")
    ).collect()[0][0] or 0
    n_docs = n0 + n_new
    total_tokens = int(old_cs["total_tokens"] or 0) + int(batch_tokens)
    spark.createDataFrame(
        [(n_docs, total_tokens, total_tokens / max(n_docs, 1))],
        "n_docs long, total_tokens long, avgdl double",
    ).write.mode("overwrite").parquet(store.path("corpus_stats"))

    counters = {
        "new_docs": n_new,
        "batch_tokens": int(batch_tokens),
        "n_docs_after": n_docs,
        "secs": time.time() - t0,
    }
    store.commit_stage(stage, ["postings", "docs"], counters)
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return counters


def incremental_index_stream(
    spark: SparkSession,
    store: IndexStore,
    input_dir: str,
    checkpoint_dir: str,
    pages_schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    text_col: str = "text",
):
    """Structured Streaming driver: watch input_dir for new page files,
    append each micro-batch to the index. availableNow trigger drains
    what exists and stops (cron-style ingest); swap the trigger for
    continuous tailing."""
    stream = spark.readStream.schema(pages_schema).parquet(input_dir)
    return (
        stream.writeStream.foreachBatch(
            lambda df, epoch: append_batch(spark, store, df, epoch, text_col=text_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
