"""Merge independently-built indexes into one (distributed chunk builds).

The reference splits a big corpus into chunks, indexes each chunk in a
separate process, and serves them together (S2 chunked reader + A9
parallel chunk indexing; reference index.py:36-66 drives per-chunk
processes). At cluster scale the same need appears one level up: build
an IndexStore per corpus partition (per day, per crawl segment, per
tenant), then merge them into one queryable index without re-tokenizing
anything.

Merge is exact, not approximate:
  * doc sets must be DISJOINT (verified with one distinct-count
    aggregate over the doc dictionaries — a merge of overlapping builds
    would double-count postings, so it refuses);
  * configs must be identical (same tokenizer/window/sharding — postings
    from different analyzer chains share no vocabulary space);
  * postings are decoded and re-encoded per (shard, term) through the
    same run-builder the from-scratch build uses, so the merged store is
    bit-identical in layout to a single build over the union corpus
    (same repartition key, same sort, same codec);
  * term_stats/corpus_stats are additive (df/cf/total_tokens sum;
    avgdl = total_tokens / n_docs) — no recompute from text.

Shuffle inventory: ONE repartition on (term, shard) over the decoded
postings (the same shuffle a fresh build pays), plus metadata unions.
The merged store passes verify_index and serves through every existing
query path (WAND, Searcher, boolean, phrase).
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tangent_spark.plans.indexer import POSTINGS_SCHEMA, _encode_runs, verify_index
from tangent_spark.sources.store import IndexStore


def merge_indexes(
    spark: SparkSession, stores: list[IndexStore], out_dir: str
) -> IndexStore:
    """Merge >= 2 IndexStores with identical configs and disjoint doc ids
    into a new store at out_dir. Returns the merged store."""
    if len(stores) < 2:
        raise ValueError("merge needs at least two stores")
    cfgs = [s.get_config() for s in stores]
    if any(c != cfgs[0] for c in cfgs[1:]):
        raise ValueError("cannot merge indexes built with different configs")
    cfg = cfgs[0]
    from tangent_spark.plans.search import load_deleted_ids

    for s in stores:
        if load_deleted_ids(spark, s).size:
            raise ValueError(
                f"store {s.root} has live tombstones — run compact_postings "
                "first (merging uncompacted deletes would resurrect docs)"
            )

    out = IndexStore(out_dir)
    out.set_config(cfg)
    t0 = time.time()

    docs_u = stores[0].read(spark, "docs")
    for s in stores[1:]:
        docs_u = docs_u.unionByName(s.read(spark, "docs"), allowMissingColumns=True)
    n_total = docs_u.count()
    n_distinct = docs_u.select("doc_id").distinct().count()
    if n_total != n_distinct:
        raise ValueError(
            f"doc ids overlap across stores ({n_total} rows, {n_distinct} distinct)"
            " — merge would double-count postings"
        )

    if not out.stage_done("docs"):
        docs_u.write.mode("overwrite").parquet(out.path("docs"))
        out.commit_stage("docs", ["docs"], {"n_docs": n_total, "secs": time.time() - t0})

    # terms union (kept so the merged store supports appends + verify)
    if not out.stage_done("terms"):
        t1 = time.time()
        terms_u = stores[0].read(spark, "terms")
        for s in stores[1:]:
            terms_u = terms_u.unionByName(s.read(spark, "terms"))
        terms_u.write.mode("overwrite").parquet(out.path("terms"))
        n_rows = spark.read.parquet(out.path("terms")).count()
        out.commit_stage("terms", ["terms"], {"term_rows": n_rows, "secs": time.time() - t1})

    # additive stats
    if not out.stage_done("stats"):
        t1 = time.time()
        ts_u = stores[0].read(spark, "term_stats")
        for s in stores[1:]:
            ts_u = ts_u.unionByName(s.read(spark, "term_stats"))
        (
            ts_u.groupBy("term")
            .agg(F.sum("df").cast("int").alias("df"), F.sum("cf").alias("cf"))
            .write.mode("overwrite")
            .parquet(out.path("term_stats"))
        )
        cs = [s.read(spark, "corpus_stats").collect()[0] for s in stores]
        n_docs = sum(int(r["n_docs"]) for r in cs)
        total_tokens = sum(int(r["total_tokens"] or 0) for r in cs)
        spark.createDataFrame(
            [(n_docs, total_tokens, total_tokens / max(n_docs, 1))],
            "n_docs long, total_tokens long, avgdl double",
        ).write.mode("overwrite").parquet(out.path("corpus_stats"))
        if n_docs != n_total:
            raise AssertionError(
                f"corpus_stats n_docs {n_docs} != doc dictionary {n_total}"
            )
        from tangent_spark.plans.wildcard import REV_TABLE, write_rev_terms

        write_rev_terms(spark, out.path("term_stats"), out.path(REV_TABLE))
        vocab = spark.read.parquet(out.path("term_stats")).count()
        out.commit_stage(
            "stats",
            ["term_stats", "corpus_stats", REV_TABLE],
            {"vocab": vocab, "n_docs": n_docs, "secs": time.time() - t1},
        )

    # postings: decode all sources, ONE (term, shard) shuffle, re-encode
    if not out.stage_done("postings"):
        from tangent_spark.codec import decode_posting_list

        t1 = time.time()
        p_u = stores[0].read(spark, "postings")
        for s in stores[1:]:
            p_u = p_u.unionByName(s.read(spark, "postings"))
        before_mass = int(p_u.agg(F.sum("df")).collect()[0][0] or 0)

        def decode_rows(batches):
            for pdf in batches:
                frames = []
                for _, row in pdf.iterrows():
                    ids, tfs, dls = decode_posting_list(
                        row["docs_blob"], row["tfs_blob"], row["dls_blob"],
                        np.asarray(row["d_cuts"]), np.asarray(row["t_cuts"]),
                        np.asarray(row["l_cuts"]), row["counts"],
                    )
                    frames.append(pd.DataFrame({
                        "shard": np.full(ids.size, row["shard"], dtype=np.int32),
                        "term": row["term"],
                        "doc_id": ids.astype(np.int64),
                        "tf": tfs.astype(np.int32),
                        "dl": dls.astype(np.int64),
                    }))
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        shard_parts = max(cfg.n_shards, spark.sparkContext.defaultParallelism)
        merged = (
            p_u.mapInPandas(
                decode_rows, schema="shard int, term string, doc_id long, tf int, dl long"
            )
            .repartition(shard_parts, "term", "shard")
            .sortWithinPartitions("term", "shard", "doc_id")
            .mapInPandas(_encode_runs(cfg), schema=POSTINGS_SCHEMA)
        )
        merged.write.mode("overwrite").parquet(out.path("postings"))
        p = spark.read.parquet(out.path("postings"))
        metrics = p.groupBy("shard").agg(
            F.count("*").alias("n_terms"),
            F.sum("df").alias("n_postings"),
            (
                F.sum(F.length("docs_blob"))
                + F.sum(F.length("tfs_blob"))
                + F.sum(F.length("dls_blob"))
            ).alias("postings_bytes"),
        )
        mrows = metrics.collect()
        spark.createDataFrame(mrows, metrics.schema).write.mode("overwrite").parquet(
            out.path("metrics")
        )
        after_mass = sum(int(r["n_postings"]) for r in mrows)
        if after_mass != before_mass:
            raise AssertionError(
                f"merge lost postings: {before_mass} -> {after_mass}"
            )
        out.commit_stage(
            "postings",
            ["postings", "metrics"],
            {
                "shards": len(mrows),
                "postings": after_mass,
                "merged_from": len(stores),
                "secs": time.time() - t1,
            },
        )

    # positions (optional table): union, same doc-sharded term-major layout
    if cfg.store_positions and not out.stage_done("positions"):
        t1 = time.time()
        pos_u = stores[0].read(spark, "positions")
        for s in stores[1:]:
            pos_u = pos_u.unionByName(s.read(spark, "positions"))
        shard_parts = max(cfg.n_shards, spark.sparkContext.defaultParallelism)
        (
            pos_u.repartition(shard_parts, "term", "shard")
            .sortWithinPartitions("term", "shard", "doc_id")
            .write.mode("overwrite")
            .parquet(out.path("positions"))
        )
        n_rows = spark.read.parquet(out.path("positions")).count()
        out.commit_stage(
            "positions", ["positions"], {"position_rows": n_rows, "secs": time.time() - t1}
        )

    verify_index(spark, out)
    return out
