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
runs + docs rows -> rewrite the (small) term_stats and corpus_stats
tables as new versions -> commit a manifest stage 'batch_<epoch>'.

Crash-idempotency protocol (effectively-once at ANY crash point, not
just whole-batch foreachBatch redelivery):
  * every part file appended to a live table dir carries the batch tag
    in its name; replay first deletes its own tagged files, restoring
    the exact pre-batch state of postings/terms/docs;
  * stats are never merged in place — the merge reads the CURRENT
    version dirs (intact until commit) and writes version N+1; the
    manifest commit atomically flips the table pointers (Iceberg-style
    snapshot swap) in the same write that marks the stage committed.
So a crash after any subset of appends/merges replays to an identical
state; a replayed committed epoch is skipped by the manifest check.
Query results after N appends are EXACTLY the results of a
from-scratch batch build over the union (tested).

Compaction (`compact_postings`): appends leave one run per (shard,
term) PER BATCH, so run count grows linearly with batches — scan and
block-max bound quality degrade. Compaction decodes all runs, merges
them into one run per (shard, term) (exact: batches only add new doc
ids), writes a fresh postings version, verifies the postings-mass
invariant, and flips the pointer atomically. Query correctness never
depends on it; it restores the one-run invariant.

Deletes (`delete_docs`): Lucene live-docs discipline. A delete batch
appends its doc ids to a `tombstones` table via the same tagged
crash-idempotent protocol; every serving kernel (WAND, boolean,
phrase — plans/search.load_deleted_ids) MASKS tombstoned ids at decode
time immediately, while survivor scores stay at index-time stats
(deleted docs keep counting toward df/avgdl — exactly Lucene before a
segment merge; block-max bounds over a superset only overestimate, so
pruning stays exact). The next compact_postings makes deletes
physical: postings/positions/docs/terms drop the docs, term_stats and
corpus_stats are recomputed with build_index's exact math, tombstones
reset to empty — all pointer-flipped in one atomic manifest commit,
after which the store EQUALS a fresh build over the survivors
(tests/test_delete.py). Fresh append ids come from the doc-id
high-water mark, never the doc count, so ids of removed docs are never
reused.

Updates (`update_docs`): Lucene's updateDocument = delete-then-add
under one key (the url). Tombstone every live doc serving one of the
batch's urls, then append the batch — append's already-indexed-url
anti-join excludes tombstoned docs, so the re-crawl gets a fresh doc id
and serves immediately while the stale crawl is masked; compaction
removes the stale rows. Two committed stages, each independently
crash-idempotent.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    _internal: bool = False,
) -> dict:
    """Append one batch of pages to an existing index. Idempotent per
    batch_id at any crash point (see module docstring). Returns the
    batch counters. Batch ids beginning with 'upd-' are reserved for
    update_docs' sub-stages (a collision would alias a different
    batch's committed stage and silently skip this one)."""
    if not _internal and str(batch_id).startswith("upd-"):
        raise ValueError("batch ids with the 'upd-' prefix are reserved for update_docs")
    stage = f"batch_{batch_id}"
    if store.stage_done(stage):
        return store.read_manifest()["stages"][stage]["counters"]
    cfg = store.get_config()
    tag = f"b{batch_id}"

    # replay cleanup: remove anything a crashed previous attempt appended,
    # so every read below sees the exact pre-batch state. File mutations
    # happen OUTSIDE Spark writes, so Spark's shared FileStatusCache must
    # be invalidated explicitly or readers keep the stale listing.
    appended_tables = ["postings", "terms", "docs"] + (
        ["positions"] if cfg.store_positions else []
    )
    for t in appended_tables:
        store.clean_tagged(t, tag)
        spark.catalog.refreshByPath(store.path(t))

    existing_docs = spark.read.parquet(store.path("docs"))
    hw = existing_docs.agg(
        F.count("*").alias("n"), F.max("doc_id").alias("mx")
    ).collect()[0]
    # high-water mark, NOT count: after delete_docs + compaction removes
    # docs, count < max_id + 1 and count-based fresh ids would COLLIDE
    # with surviving docs (for dense never-deleted stores the two are
    # identical, so pre-delete behavior is unchanged)
    n0 = int(hw["mx"]) + 1 if int(hw["n"]) else 0
    n_existing = int(hw["n"])
    # the already-indexed-url set excludes tombstoned docs: a url whose
    # only doc is deleted (delete_docs/update_docs) must be re-addable —
    # Lucene's updateDocument is exactly delete-then-add under one key
    live = existing_docs.select("doc_id", "url")
    tdir = store.path("tombstones")
    if os.path.isdir(tdir) and any(f.endswith(".parquet") for f in os.listdir(tdir)):
        live = live.join(
            spark.read.parquet(tdir).select("doc_id"), "doc_id", "left_anti"
        )
    live_urls = live.select("url")
    fresh = pages.join(
        live_urls, pages[url_col] == live_urls["url"], "left_anti"
    )
    fresh = dense_ids(fresh.drop("doc_id") if "doc_id" in fresh.columns else fresh,
                      url_col, "_rank")
    fresh = fresh.withColumn("doc_id", (F.col("_rank") + F.lit(n0)).cast("long")).drop("_rank")

    # Stage the batch to its own parquet and re-read: appending to the
    # docs/postings paths below invalidates any cached plan that READS
    # those paths (Spark refreshes written paths), so the batch lineage
    # must be rooted at an independent location first. The staging dir
    # doubles as the batch's crash checkpoint.
    staging = os.path.join(store.root, f"_staging_{stage}")
    fresh.write.mode("overwrite").parquet(staging + "/pages")
    fresh = spark.read.parquet(staging + "/pages")
    n_new = fresh.count()
    if n_new == 0:
        store.commit_stage(stage, [], {"new_docs": 0})
        shutil.rmtree(staging, ignore_errors=True)
        return {"new_docs": 0}

    t0 = time.time()
    terms = terms_df(fresh, "doc_id", text_col, cfg.tokenizer)
    if extra_terms_fn is not None:
        terms = terms.unionByName(extra_terms_fn(fresh))
    terms.write.mode("overwrite").parquet(staging + "/terms")
    terms = spark.read.parquet(staging + "/terms")

    # postings runs: same shuffle as the batch build, staged first
    shard_parts = max(cfg.n_shards, spark.sparkContext.defaultParallelism)
    (
        terms.withColumn("shard", (F.col("doc_id") % cfg.n_shards).cast("int"))
        .repartition(shard_parts, "term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
        .mapInPandas(_encode_runs(cfg), schema=POSTINGS_SCHEMA)
        .write.mode("overwrite")
        .parquet(staging + "/postings")
    )
    fresh.select(
        "doc_id", F.col(url_col).alias("url"), *[F.col(c) for c in cfg.meta_cols]
    ).write.mode("overwrite").parquet(staging + "/docs")

    # positions (phrase/snippet support): the batch's rows in the same
    # doc-sharded term-major layout — without this, a positional index
    # would serve phrase queries that silently miss appended docs
    if cfg.store_positions:
        from tangent_spark.functions.tokenize import positions_df

        (
            positions_df(fresh, "doc_id", text_col, cfg.tokenizer)
            .withColumn("shard", (F.col("doc_id") % cfg.n_shards).cast("int"))
            .repartition(shard_parts, "term", "shard")
            .sortWithinPartitions("term", "shard", "doc_id")
            .write.mode("overwrite")
            .parquet(staging + "/positions")
        )

    # merged dictionaries -> NEXT version dirs (current versions stay
    # intact until the manifest flip, so replay recomputes from the same
    # inputs after a crash anywhere in this function)
    ts_v = store.table_version("term_stats")
    cs_v = store.table_version("corpus_stats")
    batch_stats = terms.groupBy("term").agg(
        F.count("*").cast("int").alias("df"), F.sum("tf").alias("cf")
    )
    old_stats = spark.read.parquet(store.path("term_stats"))
    (
        old_stats.unionByName(batch_stats)
        .groupBy("term")
        .agg(F.sum("df").cast("int").alias("df"), F.sum("cf").alias("cf"))
        .write.mode("overwrite")
        .parquet(store.versioned_path("term_stats", ts_v + 1))
    )
    # the reversed dictionary flips in lockstep with term_stats (same
    # version number), derived from the just-written merged stats
    from tangent_spark.plans.wildcard import REV_TABLE, write_rev_terms

    rv_v = store.table_version(REV_TABLE)
    write_rev_terms(
        spark,
        store.versioned_path("term_stats", ts_v + 1),
        store.versioned_path(REV_TABLE, rv_v + 1),
    )

    old_cs = spark.read.parquet(store.path("corpus_stats")).collect()[0]
    # dl(doc) == sum(tf) — deterministic across partitionings (see
    # plans/indexer.py stats stage for the unified-field definition)
    batch_tokens = terms.agg(F.sum("tf")).collect()[0][0] or 0
    # count, NOT high-water mark: after delete+compaction ids are sparse
    # (max_id+1 > live count) and n0-based n_docs would inflate the BM25
    # idf numerator and deflate avgdl for every later batch
    n_docs = n_existing + n_new
    total_tokens = int(old_cs["total_tokens"] or 0) + int(batch_tokens)
    spark.createDataFrame(
        [(n_docs, total_tokens, total_tokens / max(n_docs, 1))],
        "n_docs long, total_tokens long, avgdl double",
    ).write.mode("overwrite").parquet(store.versioned_path("corpus_stats", cs_v + 1))

    # idempotent live appends: tagged part-file copies (cleaned on replay)
    for t in appended_tables:
        store.copy_tagged(staging + "/" + t, t, tag)
        spark.catalog.refreshByPath(store.path(t))

    counters = {
        "new_docs": n_new,
        "batch_tokens": int(batch_tokens),
        "n_docs_after": n_docs,
        "secs": time.time() - t0,
    }
    store.commit_stage(
        stage,
        ["postings", "docs"] + (["positions"] if cfg.store_positions else []),
        counters,
        table_flips={
            "term_stats": ts_v + 1,
            "corpus_stats": cs_v + 1,
            REV_TABLE: rv_v + 1,
        },
    )
    shutil.rmtree(staging, ignore_errors=True)
    return counters


def _clean_delete_orphans(spark: SparkSession, store: IndexStore) -> None:
    """Remove tagged tombstone part files of every UNCOMMITTED delete
    batch (tag family 'del<id>' — store.orphan_tags only knows the
    postings 'b<id>' family). Without this, compaction would bake a
    crashed delete's rows in untagged and the replay would then delete
    the same docs twice (breaking the removed-mass invariant)."""
    import glob

    stages = store.read_manifest()["stages"]
    tdir = store.path("tombstones")
    if not os.path.isdir(tdir):
        return
    tags = set()
    for f in glob.glob(os.path.join(tdir, "del*-*.parquet")):
        name = os.path.basename(f)[: -len(".parquet")]
        tag, _, suffix = name.rpartition("-")
        if not (tag.startswith("del") and suffix.isdigit()):
            continue
        st = stages.get("delete_" + tag[3:])
        if not st or st.get("status") != "committed":
            tags.add(tag)
    for tag in sorted(tags):
        store.clean_tagged("tombstones", tag)
        spark.catalog.refreshByPath(tdir)


def delete_docs(
    spark: SparkSession,
    store: IndexStore,
    doc_ids,
    batch_id: int | str,
    _internal: bool = False,
) -> dict:
    """Mark docs deleted (Lucene live-docs discipline): append their ids
    to the tombstones table as one tagged part-file set — idempotent per
    batch_id at any crash point, the postings append protocol. Serving
    kernels mask tombstoned ids at decode time IMMEDIATELY (block-max
    bounds over a superset only overestimate, so pruning stays exact);
    postings/positions/docs/terms/stats are physically cleaned by the
    next compact_postings. Stats stay at their index-time values until
    that compaction — exactly Lucene's behavior, where deleted docs
    still count toward df/avgdl until segments merge.

    doc_ids: a DataFrame with a doc_id column, or an iterable of ints.
    A warm Searcher holds a point-in-time tombstone snapshot; build a
    new one to observe this delete. Batch ids beginning with 'upd-'
    are reserved for update_docs' sub-stages."""
    if not _internal and str(batch_id).startswith("upd-"):
        raise ValueError("batch ids with the 'upd-' prefix are reserved for update_docs")
    stage = f"delete_{batch_id}"
    if store.stage_done(stage):
        return store.read_manifest()["stages"][stage]["counters"]
    _clean_delete_orphans(spark, store)
    tag = f"del{batch_id}"
    store.clean_tagged("tombstones", tag)
    spark.catalog.refreshByPath(store.path("tombstones"))

    if not isinstance(doc_ids, DataFrame):
        doc_ids = spark.createDataFrame(
            [(int(d),) for d in doc_ids], "doc_id long"
        )
    ids = doc_ids.select(F.col("doc_id").cast("long")).distinct()
    # only ids that exist and aren't already tombstoned — keeps the
    # counters and the compaction removed-mass arithmetic exact
    ids = ids.join(
        spark.read.parquet(store.path("docs")).select("doc_id"), "doc_id", "left_semi"
    )
    n_requested = ids.count()
    tdir = store.path("tombstones")
    if os.path.isdir(tdir) and any(
        f.endswith(".parquet") for f in os.listdir(tdir)
    ):
        ids = ids.join(
            spark.read.parquet(tdir).select("doc_id"), "doc_id", "left_anti"
        )
    staging = os.path.join(store.root, f"_staging_{stage}")
    ids.coalesce(1).write.mode("overwrite").parquet(staging)
    n_new = spark.read.parquet(staging).count()
    store.copy_tagged(staging, "tombstones", tag)
    # lineage marker so stage_done's file check passes for this table
    open(os.path.join(store.path("tombstones"), "_SUCCESS"), "a").close()
    spark.catalog.refreshByPath(store.path("tombstones"))
    counters = {"marked": int(n_new), "requested_live": int(n_requested)}
    store.commit_stage(stage, ["tombstones"], counters)
    shutil.rmtree(staging, ignore_errors=True)
    return counters


def update_docs(
    spark: SparkSession,
    store: IndexStore,
    pages: DataFrame,
    batch_id: int | str,
    text_col: str = "text",
    url_col: str = "url",
    extra_terms_fn=None,
) -> dict:
    """Re-index re-crawled pages: Lucene's updateDocument = delete+add
    under one key (the url). Tombstones every live doc serving one of
    the batch's urls (delete_docs, stage `delete_u<id>`), then appends
    the batch (append_batch, stage `batch_u<id>`) — the anti-join skips
    tombstoned urls, so the new crawl gets a FRESH doc id above the
    high-water mark and serves immediately while the stale doc is
    masked. The next compact_postings removes the stale docs
    physically. Composed of two committed stages, each idempotent at
    any crash point, so a replay at any position converges: the
    candidate-id plan is LAZY and delete_docs short-circuits on its
    committed stage before evaluating it (evaluating after the append
    would wrongly tombstone the fresh docs).

    The sub-stages live under the RESERVED batch-id prefix `upd-`
    (stages `delete_upd-<id>` / `batch_upd-<id>`), so they can never
    collide with a caller's own append_batch/delete_docs ids — a
    collision would silently skip indexing the re-crawl after
    tombstoning the old doc. append_batch/delete_docs reject raw ids
    using the prefix.

    Returns delete + append counters ({"replaced": n, "new_docs": m,
    ...}); new_docs counts the whole batch (replacements + brand-new
    urls)."""
    live = spark.read.parquet(store.path("docs"))
    stale = live.join(
        pages.select(F.col(url_col).alias("url")).distinct(), "url", "left_semi"
    ).select("doc_id")
    dc = delete_docs(spark, store, stale, f"upd-{batch_id}", _internal=True)
    ac = append_batch(
        spark, store, pages, batch_id=f"upd-{batch_id}",
        text_col=text_col, url_col=url_col, extra_terms_fn=extra_terms_fn,
        _internal=True,
    )
    return {"replaced": int(dc["marked"]), **ac}


def compact_postings(spark: SparkSession, store: IndexStore) -> dict:
    """Merge every (shard, term)'s runs into a single compressed run and
    atomically flip the postings table to the compacted version.

    Exact by construction: append_batch only ever adds doc ids above the
    high-water mark, so the union of a term's runs has no duplicate
    (term, doc_id) and re-sorting by doc_id is the exact merged posting
    list. The postings-mass invariant (sum of df unchanged) is asserted
    before the flip; a crash at any point leaves the current version
    live and the next attempt rewrites the staging version.

    Orphan guard: if a previous append_batch CRASHED, its batch-tagged
    part files are still in the live dirs. Baking those rows untagged
    into the compacted version would duplicate them when the batch
    replays (replay deletes tagged files — but they'd no longer be
    tagged). So compaction first applies the same cleanup the replay
    itself would: delete tagged files of every uncommitted batch from
    all appended tables (postings/terms/docs keep their mutual
    consistency — all three are restored to the pre-batch state)."""
    from tangent_spark.codec import decode_posting_list

    cfg = store.get_config()
    tables = ["postings", "terms", "docs"] + (
        ["positions"] if cfg.store_positions else []
    )
    for table in tables:
        for tag in store.orphan_tags(table):
            store.clean_tagged(table, tag)
            spark.catalog.refreshByPath(store.path(table))
    _clean_delete_orphans(spark, store)

    # tombstones (delete_docs): compaction is where marked deletes become
    # physical — postings/positions/docs/terms drop the docs, stats are
    # recomputed exactly, and the tombstone set resets to empty
    tomb = None
    n_deleted = 0
    tdir = store.path("tombstones")
    if os.path.isdir(tdir) and any(f.endswith(".parquet") for f in os.listdir(tdir)):
        tomb = spark.read.parquet(tdir).select("doc_id").distinct().persist()
        n_deleted = tomb.count()
        if n_deleted == 0:
            tomb.unpersist()
            tomb = None

    nxt = store.table_version("postings") + 1
    t0 = time.time()
    p = spark.read.parquet(store.path("postings"))
    before = p.agg(
        F.count("*").alias("runs"), F.sum("df").alias("mass")
    ).collect()[0]
    # the removed-mass invariant needs the exact posting count of the
    # deleted docs; the terms table mirrors postings row-for-row
    expected_removed = 0
    if tomb is not None:
        expected_removed = (
            spark.read.parquet(store.path("terms"))
            .join(tomb, "doc_id", "left_semi")
            .count()
        )

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
    decoded = p.mapInPandas(
        decode_rows, schema="shard int, term string, doc_id long, tf int, dl long"
    )
    if tomb is not None:
        decoded = decoded.join(F.broadcast(tomb), "doc_id", "left_anti")
    compacted = (
        decoded.repartition(shard_parts, "term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
        .mapInPandas(_encode_runs(cfg), schema=POSTINGS_SCHEMA)
    )
    out = store.versioned_path("postings", nxt)
    compacted.write.mode("overwrite").parquet(out)
    q = spark.read.parquet(out)
    after = q.agg(F.count("*").alias("runs"), F.sum("df").alias("mass")).collect()[0]
    if int(after["mass"] or 0) != int(before["mass"] or 0) - expected_removed:
        raise AssertionError(
            f"compaction postings-mass mismatch: {before['mass']} -> "
            f"{after['mass']} (expected removal of {expected_removed})"
        )
    counters = {
        "runs_before": int(before["runs"]),
        "runs_after": int(after["runs"]),
        "postings": int(after["mass"] or 0),
        "deleted_docs": int(n_deleted),
        "deleted_postings": int(expected_removed),
        "secs": time.time() - t0,
    }
    flips = {"postings": nxt}
    stage_tables = ["postings"]

    if tomb is not None:
        # physical removal beyond postings: docs/terms drop the deleted
        # rows, stats are recomputed from the cleaned terms table with
        # build_index's exact math, and tombstones reset to empty — all
        # pointer-flipped in the same atomic manifest commit below
        dv = store.table_version("docs") + 1
        docs_clean = spark.read.parquet(store.path("docs")).join(
            F.broadcast(tomb), "doc_id", "left_anti"
        )
        docs_clean.write.mode("overwrite").parquet(store.versioned_path("docs", dv))
        n_docs_after = spark.read.parquet(store.versioned_path("docs", dv)).count()

        tv = store.table_version("terms") + 1
        terms_clean = spark.read.parquet(store.path("terms")).join(
            F.broadcast(tomb), "doc_id", "left_anti"
        )
        terms_clean.write.mode("overwrite").parquet(store.versioned_path("terms", tv))
        terms_clean = spark.read.parquet(store.versioned_path("terms", tv))

        sv = store.table_version("term_stats") + 1
        (
            terms_clean.groupBy("term")
            .agg(F.count("*").cast("int").alias("df"), F.sum("tf").alias("cf"))
            .write.mode("overwrite")
            .parquet(store.versioned_path("term_stats", sv))
        )
        from tangent_spark.plans.wildcard import REV_TABLE, write_rev_terms

        rvv = store.table_version(REV_TABLE) + 1
        write_rev_terms(
            spark,
            store.versioned_path("term_stats", sv),
            store.versioned_path(REV_TABLE, rvv),
        )
        cv = store.table_version("corpus_stats") + 1
        (
            terms_clean.agg(
                F.lit(n_docs_after).alias("n_docs"),
                F.sum("tf").cast("long").alias("total_tokens"),
                (F.sum("tf") / F.lit(n_docs_after)).alias("avgdl"),
            )
            .write.mode("overwrite")
            .parquet(store.versioned_path("corpus_stats", cv))
        )
        tsv = store.table_version("tombstones") + 1
        spark.createDataFrame([], "doc_id long").write.mode("overwrite").parquet(
            store.versioned_path("tombstones", tsv)
        )
        flips.update(
            {
                "docs": dv,
                "terms": tv,
                "term_stats": sv,
                "corpus_stats": cv,
                "tombstones": tsv,
                REV_TABLE: rvv,
            }
        )
        stage_tables += [
            "docs", "terms", "term_stats", "corpus_stats", "tombstones",
            REV_TABLE,
        ]
        counters["n_docs_after"] = int(n_docs_after)

    # positions ride the same compaction: appends add one tagged part-file
    # set per batch with no rewrite path of their own (round-3 review:
    # small-files growth + degraded row-group pruning). Rows are exact
    # as-is — (shard, term, doc_id) is unique across batches — so the
    # rewrite just restores the term-major sorted, few-files layout. The
    # position-mass invariant (row count + total positions) is asserted
    # before the same atomic manifest flip.
    if cfg.store_positions and os.path.isdir(store.path("positions")):
        pnxt = store.table_version("positions") + 1
        pos = spark.read.parquet(store.path("positions"))
        if tomb is not None:
            # deleted docs leave the positions table with the same
            # anti-join; the row/mass invariant below is computed on the
            # already-filtered rows (write-lost-nothing check)
            pos = pos.join(F.broadcast(tomb), "doc_id", "left_anti")
        pb = pos.agg(
            F.count("*").alias("rows"), F.sum(F.size("positions")).alias("mass")
        ).collect()[0]
        pout = store.versioned_path("positions", pnxt)
        (
            pos.repartition(shard_parts, "term", "shard")
            .sortWithinPartitions("term", "shard", "doc_id")
            .write.mode("overwrite")
            .parquet(pout)
        )
        pa = spark.read.parquet(pout).agg(
            F.count("*").alias("rows"), F.sum(F.size("positions")).alias("mass")
        ).collect()[0]
        if (int(pa["rows"]), int(pa["mass"] or 0)) != (int(pb["rows"]), int(pb["mass"] or 0)):
            raise AssertionError(
                f"positions compaction lost rows: {tuple(pb)} -> {tuple(pa)}"
            )
        counters["position_rows"] = int(pa["rows"])
        flips["positions"] = pnxt
        stage_tables.append("positions")

    if tomb is not None:
        tomb.unpersist()
    store.commit_stage(f"compact_v{nxt}", stage_tables, counters, table_flips=flips)
    return counters


def maybe_compact(spark: SparkSession, store: IndexStore, every: int) -> dict | None:
    """Auto-compaction policy: compact when the number of committed
    batches since the last compaction reaches `every`. Reads only the
    manifest; compaction itself is the atomic-swap rewrite above."""
    stages = store.read_manifest()["stages"]
    batches = sum(1 for s in stages if s.startswith("batch_"))
    compactions = sum(1 for s in stages if s.startswith("compact_"))
    if every > 0 and batches - compactions * every >= every:
        return compact_postings(spark, store)
    return None


def incremental_index_stream(
    spark: SparkSession,
    store: IndexStore,
    input_dir: str,
    checkpoint_dir: str,
    pages_schema: str = "url string, warc_ts timestamp, html binary, text string, lang string",
    text_col: str = "text",
    compact_every: int = 0,
    max_files_per_trigger: int = 0,
):
    """Structured Streaming driver: watch input_dir for new page files,
    append each micro-batch to the index. availableNow trigger drains
    what exists and stops (cron-style ingest); swap the trigger for
    continuous tailing. compact_every=N runs postings compaction after
    every N committed batches (0 = never; compaction never affects
    query correctness, only run-count growth)."""
    reader = spark.readStream.schema(pages_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_dir)

    def handle(df, epoch):
        append_batch(spark, store, df, epoch, text_col=text_col)
        if compact_every:
            maybe_compact(spark, store, compact_every)

    return (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
