#!/usr/bin/env python
"""Star connected-components at bench scale (round-3 review item #5).

Generates a deterministic ~10M-edge skewed graph ENTIRELY cluster-side
(spark.range + hash columns — no driver materialization) and runs
operators/dedup.connected_components_star on it, reporting edges,
rounds, wall seconds, and component-count sanity checks.

Graph shape (the adversarial mix for CC):
  * long chains   — 10 chains of length `chain_len` (diameter stress:
                    plain min-label propagation would need O(chain_len)
                    rounds; large/small-star needs O(log^2 n));
  * skewed random — `n_random` hash edges over `n_nodes` nodes where
                    10% of endpoints collapse onto 1,000 hot nodes
                    (the head-of-zipf shape of near-dup web clusters —
                    stress for the groupBy(min) shuffles);
  * cliques       — 1,000 cliques of 30 nodes (ring+chords, dense
                    local structure).

Usage: python scripts/cc_scale_bench.py [n_random_edges] [cpus]
Prints one JSON line. Used by bench.py (smaller default there) and by
BENCH.md's scale table (10M-edge run).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def skewed_graph(
    spark: SparkSession, n_random: int = 8_000_000, chain_len: int = 100_000
) -> DataFrame:
    """Deterministic (doc_a, doc_b) edge list: n_random hash edges +
    10 chains of chain_len + 1,000 30-cliques."""
    n_nodes = 5_000_000
    # 10 chains of length chain_len in id space [10^9, 10^9 + 10*chain_len)
    chains = (
        spark.range(10 * chain_len)
        .filter((F.col("id") % chain_len) != chain_len - 1)  # last node: no next
        .select(
            (F.lit(1_000_000_000) + F.col("id")).alias("doc_a"),
            (F.lit(1_000_000_001) + F.col("id")).alias("doc_b"),
        )
    )
    # skewed random edges: 10% collapse onto 1,000 hot nodes
    rnd = spark.range(n_random).select(
        (F.abs(F.xxhash64("id", F.lit(1))) % n_nodes).alias("doc_a"),
        F.when(
            F.col("id") % 10 == 0, F.abs(F.xxhash64("id", F.lit(2))) % 1_000
        )
        .otherwise(F.abs(F.xxhash64("id", F.lit(3))) % n_nodes)
        .alias("doc_b"),
    )
    # 1,000 cliques of 30 (ring + 3 chords each) in [2*10^9, ...)
    k, n_cliq = 30, 1_000
    cliq = spark.range(n_cliq * k).select(
        (F.lit(2_000_000_000) + F.col("id")).alias("doc_a"),
        (
            F.lit(2_000_000_000)
            + (F.col("id") / k).cast("long") * k
            + (F.col("id") + 1) % k
        ).alias("doc_b"),
    )
    chords = spark.range(n_cliq * k).select(
        (F.lit(2_000_000_000) + F.col("id")).alias("doc_a"),
        (
            F.lit(2_000_000_000)
            + (F.col("id") / k).cast("long") * k
            + (F.col("id") + 7) % k
        ).alias("doc_b"),
    )
    return chains.union(rnd).union(cliq).union(chords)


def main() -> None:
    from tangent_spark.operators.dedup import connected_components_star
    from tangent_spark.session import get_spark

    n_random = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    spark = get_spark(app="cc_scale_bench", cpus=cpus)
    # stage the generated edges to parquet: generation cost stays outside
    # the timer, and the union-of-ranges lineage is severed (matches the
    # real usage shape, where edges come from a candidate-pair table)
    import shutil
    import tempfile

    stage_dir = tempfile.mkdtemp(prefix="cc_graph_") + "/edges"
    skewed_graph(spark, n_random).write.mode("overwrite").parquet(stage_dir)
    g = spark.read.parquet(stage_dir)
    n_edges = g.count()
    t0 = time.time()
    labels, rounds = connected_components_star(g)
    n_nodes, n_components = labels.agg(
        F.count("*"), F.countDistinct("component")
    ).collect()[0]
    secs = round(time.time() - t0, 2)
    shutil.rmtree(os.path.dirname(stage_dir), ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "star-CC wall seconds (skewed graph)",
                "edges": int(n_edges),
                "nodes": int(n_nodes),
                "components": int(n_components),
                "rounds": int(rounds),
                "secs": secs,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
