#!/usr/bin/env python
"""Supplementary measurements for OPTIMIZATION_r06.md (bench.py is
frozen for the driver; this file carries the guide-§1.4 noop-sink
isolation and per-component timings the round report cites).

Usage: python bench_extra.py [what ...]
  what ∈ {df, build, cc, cold, serve}; default: all.

Every DataFrame line is timed with the noop sink
(df.write.format("noop")) so the measurement computes every column of
every row without a driver collect, interleaved best-of-3 with the rep
loop outermost (same storm discipline as bench.py).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from tangent_spark import entry_queries as eq  # noqa: E402
from tangent_spark.session import get_spark  # noqa: E402

REPS = 3


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_df_lines(spark, sf_dir, out):
    """entry_queries DataFrame lines, noop-sink isolated."""
    lines = [
        ("q9_bm25_topk_df", eq.q9_bm25_topk),
        ("q8_dice_topk", eq.q8_dice_topk),
        ("tpch_q1", eq.tpch_q1),
        ("tpch_q3_topk", eq.tpch_q3_topk),
        ("minhash_signature", eq.minhash_signature),
        ("dedup_ngram_jaccard", eq.dedup_ngram_jaccard),
        ("embedding_cosine_topk", eq.embedding_cosine_topk),
        ("text_quality", eq.text_quality),
    ]
    trials = {name: [] for name, _ in lines}
    for _rep in range(REPS):
        for name, fn in lines:
            spark.sparkContext.setJobDescription(f"noop: {name}")
            t0 = time.time()
            noop(fn(spark, sf_dir))
            trials[name].append(round(time.time() - t0, 3))
    out["df_noop"] = {n: min(ts) for n, ts in trials.items()}
    out["df_noop_spreads"] = trials


def bench_build(spark, sf_dir, out):
    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.indexer import build_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    docs.count()
    walls, stages = [], None
    for _rep in range(2):
        idx = os.path.join(tempfile.mkdtemp(prefix="bx_"), "index")
        cfg = IndexConfig(
            n_shards=max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 8),
            block_size=128, store_positions=True, meta_cols=("lang",),
        )
        t0 = time.time()
        store = build_index(spark, docs, idx, cfg)
        walls.append(round(time.time() - t0, 2))
        m = store.read_manifest()
        stages = {
            k: round(v["counters"].get("secs", 0), 2)
            for k, v in m["stages"].items()
        }
        shutil.rmtree(os.path.dirname(idx), ignore_errors=True)
    out["build_walls"] = walls  # [cold-ish, warm]
    out["build_stage_secs"] = stages


def bench_cc(spark, out):
    from scripts.cc_scale_bench import skewed_graph
    from tangent_spark.operators.dedup import connected_components_star

    cc_dir = os.path.join(tempfile.mkdtemp(prefix="bxcc_"), "edges")
    skewed_graph(spark, 150_000, chain_len=10_000).write.mode(
        "overwrite"
    ).parquet(cc_dir)
    g = spark.read.parquet(cc_dir)
    n = g.count()
    walls = []
    for _rep in range(REPS):
        t0 = time.time()
        labels, rounds = connected_components_star(g)
        comps = labels.select("component").distinct().count()
        walls.append(round(time.time() - t0, 2))
    out["cc"] = {
        "edges": int(n), "rounds": int(rounds), "components": int(comps),
        "walls": walls, "best": min(walls),
        "us_per_edge_round": round(1e6 * min(walls) / (n * rounds), 2),
    }
    shutil.rmtree(os.path.dirname(cc_dir), ignore_errors=True)


def bench_cold_serve(spark, sf_dir, out):
    from tangent_spark.config import IndexConfig
    from tangent_spark.plans.indexer import build_index
    from tangent_spark.plans.search import Searcher, bm25_topk_wand

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    idx = os.path.join(tempfile.mkdtemp(prefix="bxs_"), "index")
    cfg = IndexConfig(
        n_shards=max(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), 8),
        block_size=128, store_positions=True, meta_cols=("lang",),
    )
    store = build_index(spark, docs, idx, cfg)
    t0 = time.time()
    bm25_topk_wand(spark, store, "data query spark index", 10).collect()
    out["cold_first_ms"] = round(1000 * (time.time() - t0), 1)
    colds = []
    for q in ["table scan filter join", "fast slow value hash", "key value table"]:
        t0 = time.time()
        bm25_topk_wand(spark, store, q, 10).collect()
        colds.append(round(1000 * (time.time() - t0), 1))
    out["cold_repeat_ms"] = colds

    s = Searcher(spark, store)
    out["query_tasks"] = s.query_tasks
    qs = ["data query spark index", "table scan filter join", "key value table"]
    s.topk(qs[0], 10).collect()
    lat = []
    for _rep in range(REPS):
        for q in qs * 2:
            t0 = time.time()
            s.topk(q, 10).collect()
            lat.append(round(1000 * (time.time() - t0), 1))
    lat.sort()
    out["warm_min_ms"] = lat[0]
    out["warm_p50_ms"] = lat[len(lat) // 2]
    s.close()
    shutil.rmtree(os.path.dirname(idx), ignore_errors=True)


def main() -> None:
    what = set(sys.argv[1:]) or {"df", "build", "cc", "cold", "serve"}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="tangent_bench_extra", cpus=cpus)
    spark.range(1000).select(F.sum("id")).collect()
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}
    if "df" in what:
        bench_df_lines(spark, sf_dir, out)
    if "build" in what:
        bench_build(spark, sf_dir, out)
    if "cc" in what:
        bench_cc(spark, out)
    if "cold" in what or "serve" in what:
        bench_cold_serve(spark, sf_dir, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
