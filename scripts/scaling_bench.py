#!/usr/bin/env python
"""One scaling-run worker: build the full unified index (text extract +
word terms + formula pair-tuple terms) from a pages parquet at a given
parallelism level, serve BM25 queries, print one JSON line.

Run via scripts/run_scaling.py, which executes this twice (local[8] and
local[32]) on the SAME input — the sandbox stand-in for N vs 4N
executors (no real cluster available here; the job is expressed purely
as DataFrame partitioning, so the same code runs under spark-submit on
a multi-executor cluster unchanged)."""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from tangent_spark.config import IndexConfig  # noqa: E402
from tangent_spark.operators.pairs import formula_terms_df  # noqa: E402
from tangent_spark.plans.indexer import build_index  # noqa: E402
from tangent_spark.plans.search import Searcher  # noqa: E402
from tangent_spark.session import get_spark  # noqa: E402

QUERIES = [
    "matrix theorem proof convergence",
    "spark shuffle partition throughput",
    "gradient descent entropy kernel",
    "the of and is",
    "index posting compress block",
    "crawl web page document corpus",
    "algebra tensor manifold operator",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--pages", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    spark = get_spark(app=f"scaling_{args.cpus}", cpus=args.cpus)
    spark.range(1000).count()  # JVM warm-up outside the measurement

    pages = spark.read.parquet(args.pages)
    n_docs = pages.count()

    idx_dir = os.path.join(tempfile.mkdtemp(prefix=f"scale_{args.cpus}_"), "idx")
    # n_shards constant across parallelism levels: the JOB must be
    # identical; only the executor count differs.
    cfg = IndexConfig(n_shards=64, block_size=128)

    t0 = time.time()
    fterms = formula_terms_df(pages, cfg)
    store = build_index(
        spark, pages, idx_dir, cfg, url_col="url", extra_terms=fterms
    )
    build_secs = time.time() - t0

    searcher = Searcher(spark, store)
    searcher.topk(QUERIES[0], 10).collect()  # warm-up (cache + codegen)
    lat = []
    for q in QUERIES:
        t0 = time.time()
        searcher.topk(q, 10).collect()
        lat.append(time.time() - t0)
    lat.sort()

    out = {
        "cpus": args.cpus,
        "n_docs": n_docs,
        "build_secs": round(build_secs, 2),
        "docs_per_sec": round(n_docs / build_secs, 1),
        "query_p50_ms": round(1000 * lat[len(lat) // 2], 1),
        "query_max_ms": round(1000 * lat[-1], 1),
        "postings": store.counters()["postings"]["postings"],
        "postings_bytes": store.counters()["postings"]["postings_bytes"],
    }
    shutil.rmtree(os.path.dirname(idx_dir), ignore_errors=True)
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
