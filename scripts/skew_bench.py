#!/usr/bin/env python
"""Head-term skew demonstration (VERDICT task: evidence that the
postings shuffle stays balanced under a pathological head term).

Claim under test (plans/indexer.py docstring): the postings shuffle is
keyed on (term, shard=doc_id % n_shards), so a term that appears in
EVERY document — the worst head-term skew possible — spreads over
n_shards reducers by construction; "sharding by document IS the salt".

Method: synthesize a Zipf-ish corpus where the token 'the' occurs ~60
times in every document (plus a Zipf tail), run EXACTLY the indexer's
postings stage (same repartition + sortWithinPartitions), and measure
per-task wall time and row count inside the encode kernel. Balanced
task times across partitions = no skewed reducer. Output: one JSON line
with the per-task histogram, appended context for BENCH.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Iterator

import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from tangent_spark.config import IndexConfig  # noqa: E402
from tangent_spark.functions.tokenize import terms_df  # noqa: E402
from tangent_spark.plans.indexer import _encode_runs  # noqa: E402
from tangent_spark.session import get_spark  # noqa: E402

N_DOCS = 60_000
CPUS = 8


def zipf_docs(spark, n_docs: int):
    """Every doc: 60x 'the' (worst-case head term) + 240 Zipf-tail words."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit(("the " * 60).strip() + " "),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(240)),
                    # Zipf-ish: word rank grows with hash mod k for varying k
                    lambda i: F.concat(
                        F.lit("w"),
                        (F.xxhash64(F.col("id") * 1000 + i) % (i * i + 10)).cast("string"),
                    ),
                ),
            ),
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark(app="skew_bench", cpus=CPUS)
    cfg = IndexConfig(n_shards=64, block_size=128, tokenizer="simple")
    docs = zipf_docs(spark, N_DOCS).repartition(CPUS * 2).persist()
    docs.count()

    terms = terms_df(docs, "doc_id", "text", cfg.tokenizer)
    shard_parts = max(cfg.n_shards, spark.sparkContext.defaultParallelism)
    encode = _encode_runs(cfg)

    def timed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t0 = time.time()
        rows = runs = 0
        for out in encode(batches):
            rows += int(out["df"].sum())
            runs += len(out)
        yield pd.DataFrame(
            {"rows": [rows], "runs": [runs], "secs": [time.time() - t0]}
        )

    t0 = time.time()
    stats = (
        terms.withColumn("shard", (F.col("doc_id") % cfg.n_shards).cast("int"))
        .repartition(shard_parts, "term", "shard")
        .sortWithinPartitions("term", "shard", "doc_id")
        .mapInPandas(timed, schema="rows long, runs long, secs double")
        .collect()
    )
    wall = time.time() - t0
    secs = sorted(r["secs"] for r in stats)
    rows = sorted(r["rows"] for r in stats)
    head_df = int(
        terms.filter(F.col("term") == "the").count()
    )
    out = {
        "n_docs": N_DOCS,
        "head_term_df": head_df,  # 'the' occurs in EVERY doc
        "n_tasks": len(stats),
        "task_rows": {"min": rows[0], "p50": rows[len(rows) // 2], "max": rows[-1]},
        "task_secs": {
            "min": round(secs[0], 2),
            "p50": round(secs[len(secs) // 2], 2),
            "max": round(secs[-1], 2),
        },
        "max_over_p50_secs": round(secs[-1] / max(secs[len(secs) // 2], 1e-9), 2),
        "stage_wall_secs": round(wall, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
