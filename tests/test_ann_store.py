"""Persisted ANN index (plans/ann.py): build -> reopen -> serve, resume,
and encode-only appends — the postings durability discipline applied to
IVF/PQ state (round-3 review item #7)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tangent_spark.operators.similarity import cosine_topk_bruteforce
from tangent_spark.plans.ann import (
    ann_append,
    ann_topk_ivf,
    ann_topk_pq,
    build_ann_index,
    load_centroids,
    load_codebooks,
)
from tangent_spark.sources.store import IndexStore


@pytest.fixture(scope="module")
def clustered(spark):
    rng = np.random.default_rng(19)
    centers = rng.standard_normal((12, 16)) * 4.0
    vecs = np.concatenate(
        [c + 0.3 * rng.standard_normal((50, 16)) for c in centers]
    ).astype(np.float64)
    rows = [(int(i), vecs[i].tolist()) for i in range(len(vecs))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").persist()


@pytest.fixture(scope="module")
def ann_store(spark, clustered, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ann") / "idx")
    return build_ann_index(
        spark, clustered, out, n_centroids=16, m=4, n_codes=64, seed=3
    )


def _queries(df):
    return df.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )


def _recall(exact_rows, approx_rows, k):
    exact_sets = {}
    for r in exact_rows:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(1 for r in approx_rows if r["vec_id"] in exact_sets[r["query_id"]])
    return hits / (k * len(exact_sets))


def test_stored_ann_serves_after_reopen(spark, clustered, ann_store):
    """Recall bar met from a FRESH IndexStore handle — no retrain, no
    re-encode, only stored tables."""
    reopened = IndexStore(ann_store.root)
    qs = _queries(clustered)
    exact = cosine_topk_bruteforce(clustered, qs, k=10).collect()
    ivf = ann_topk_ivf(spark, reopened, qs, k=10, n_probe=4).collect()
    assert _recall(exact, ivf, 10) >= 0.9
    pq = ann_topk_pq(spark, reopened, qs, k=10, refine=50).collect()
    assert _recall(exact, pq, 10) >= 0.9


def test_pq_refined_scores_exactly_match_bruteforce(spark, clustered, ann_store):
    """The stored-codes path re-ranks with EXACT cosines: every returned
    (query, vec) score equals the brute-force cosine bit-for-bit."""
    qs = _queries(clustered)
    exact = {
        (r["query_id"], r["vec_id"]): r["cos"]
        for r in cosine_topk_bruteforce(clustered, qs, k=600).collect()
    }
    for r in ann_topk_pq(spark, ann_store, qs, k=10, refine=50).collect():
        assert exact[(r["query_id"], r["vec_id"])] == r["cos"]


def test_build_resumes_from_manifest(spark, clustered, ann_store):
    """A second build call over the same dir must skip every stage
    (counters and stored artifacts unchanged)."""
    import os

    before = ann_store.counters()
    mtime = os.path.getmtime(ann_store.path("ann_codes") + "/_SUCCESS")
    again = build_ann_index(
        spark, clustered, ann_store.root, n_centroids=16, m=4, n_codes=64, seed=3
    )
    assert again.counters() == before
    assert os.path.getmtime(again.path("ann_codes") + "/_SUCCESS") == mtime


def test_stored_quantizers_deterministic(spark, clustered, tmp_path):
    s2 = build_ann_index(
        spark, clustered, str(tmp_path / "ann2"), n_centroids=16, m=4, n_codes=64, seed=3
    )
    c1 = load_centroids(spark, s2)
    b1 = load_codebooks(spark, s2)
    # rebuild in a fresh dir -> identical artifacts (seeded sample)
    s3 = build_ann_index(
        spark, clustered, str(tmp_path / "ann3"), n_centroids=16, m=4, n_codes=64, seed=3
    )
    assert np.array_equal(c1, load_centroids(spark, s3))
    assert np.array_equal(b1, load_codebooks(spark, s3))


def test_append_is_encode_only_and_idempotent(spark, clustered, tmp_path):
    """New vectors become searchable after an append; quantizers are
    untouched; a replayed batch is a no-op."""
    base = clustered.filter(F.col("vec_id") < 500)
    extra = clustered.filter(F.col("vec_id") >= 500)
    store = build_ann_index(
        spark, base, str(tmp_path / "annap"), n_centroids=16, m=4, n_codes=64, seed=3
    )
    c_before = load_centroids(spark, store)
    c = ann_append(spark, store, extra, batch_id=1)
    assert c["new_vectors"] == extra.count()
    assert np.array_equal(c_before, load_centroids(spark, store))
    # idempotent replay
    n_rows = spark.read.parquet(store.path("ann_vectors")).count()
    ann_append(spark, store, extra, batch_id=1)
    assert spark.read.parquet(store.path("ann_vectors")).count() == n_rows
    # an appended vector is findable: query = itself -> top hits include
    # its cluster-mates; full recall check vs brute force over the union
    qs = _queries(clustered)
    exact = cosine_topk_bruteforce(clustered, qs, k=10).collect()
    ivf = ann_topk_ivf(spark, store, qs, k=10, n_probe=4).collect()
    assert _recall(exact, ivf, 10) >= 0.9
    appended_ids = {int(r["vec_id"]) for r in extra.select("vec_id").collect()}
    assert any(int(r["vec_id"]) in appended_ids for r in ivf)


def test_ivf_empty_queries(spark, clustered, ann_store):
    empty = clustered.filter(F.col("vec_id") < 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    assert ann_topk_ivf(spark, ann_store, empty, k=5).count() == 0


def test_append_cleans_foreign_orphans(spark, clustered, tmp_path):
    """A batch that crashed between its two copy_tagged calls must not
    poison later appends: the orphan sweep removes its files before the
    dedup reads the live tables (otherwise its vec_ids would stay
    IVF-visible but PQ-invisible forever)."""
    import glob
    import os

    base = clustered.filter(F.col("vec_id") < 400)
    mid = clustered.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 500))
    last = clustered.filter(F.col("vec_id") >= 500)
    store = build_ann_index(
        spark, base, str(tmp_path / "annorph"), n_centroids=16, m=4, n_codes=64, seed=3
    )
    # simulate batch 7 crashing after ann_vectors copy but before
    # ann_codes copy and before commit
    from tangent_spark.operators.similarity import ivf_assign
    from tangent_spark.plans.ann import load_centroids as _lc

    staging = str(tmp_path / "crash_staging")
    ivf_assign(mid, _lc(spark, store)).write.mode("overwrite").parquet(staging)
    store.copy_tagged(staging, "ann_vectors", "ab7")
    spark.catalog.refreshByPath(store.path("ann_vectors"))
    assert glob.glob(os.path.join(store.path("ann_vectors"), "ab7-*.parquet"))

    # a later append must sweep the orphans, then index its own batch
    ann_append(spark, store, last, batch_id=8)
    assert not glob.glob(os.path.join(store.path("ann_vectors"), "ab7-*.parquet"))
    vec_ids = {
        int(r["vec_id"])
        for r in spark.read.parquet(store.path("ann_vectors")).collect()
    }
    code_ids = {
        int(r["vec_id"])
        for r in spark.read.parquet(store.path("ann_codes")).collect()
    }
    assert vec_ids == code_ids  # never IVF-visible but PQ-invisible
    assert 450 not in vec_ids and 550 in vec_ids
    # the crashed batch can now replay cleanly
    ann_append(spark, store, mid, batch_id=7)
    vec_ids2 = {
        int(r["vec_id"])
        for r in spark.read.parquet(store.path("ann_vectors")).collect()
    }
    assert 450 in vec_ids2


def test_ann_vectors_partitioned_probe_prunes_files(spark, clustered, ann_store):
    """Round-5 (VERDICT r4 #5): ann_vectors is written PARTITIONED BY
    cluster, so an n_probe=2 query's scan physically touches only the
    probed clusters' files — asserted on the executed plan's partition
    count, not just the layout."""
    import os

    vdir = ann_store.path("ann_vectors")
    part_dirs = sorted(
        d for d in os.listdir(vdir) if d.startswith("cluster=")
    )
    assert len(part_dirs) > 2  # physically partitioned layout

    one_q = _queries(clustered).limit(1)
    out = ann_topk_ivf(spark, ann_store, one_q, k=5, n_probe=2)
    rows = out.collect()
    assert rows
    # the executed scan must carry a static probed-cluster partition
    # filter over EXACTLY the 2 probed clusters (the InMemoryFileIndex
    # applies PartitionFilters at file listing, so unprobed clusters'
    # files are never opened)
    import re

    plan = out._jdf.queryExecution().explainString(
        out._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    m = re.search(r"PartitionFilters: \[cluster#\d+ IN \(([\d,]+)\)", plan)
    assert m is not None, plan[:2000]
    assert len(m.group(1).split(",")) == 2, m.group(1)


def test_ann_append_keeps_partitioned_layout(spark, clustered, ann_store, tmp_path_factory):
    """Appends land INSIDE the cluster=N subdirs (copy_tagged preserves
    hive partitions) and stay probe-visible + dedup-correct."""
    import glob as _glob
    import os
    import shutil

    root = str(tmp_path_factory.mktemp("ann_app") / "idx")
    shutil.copytree(ann_store.root, root)
    store = IndexStore(root)
    rng = np.random.default_rng(77)
    base = clustered.limit(1).collect()[0]["embedding"]
    fresh = spark.createDataFrame(
        [
            (10_000 + i, (np.asarray(base) + 0.01 * rng.standard_normal(16)).tolist())
            for i in range(20)
        ],
        "vec_id long, embedding array<double>",
    )
    n0 = spark.read.parquet(store.path("ann_vectors")).count()
    c = ann_append(spark, store, fresh, batch_id=901)
    assert c["new_vectors"] == 20
    vecs = spark.read.parquet(store.path("ann_vectors"))
    assert vecs.count() == n0 + 20
    # tagged files live under cluster=N subdirs, not at the table root
    tagged = _glob.glob(
        os.path.join(store.path("ann_vectors"), "**", "ab901-*.parquet"),
        recursive=True,
    )
    assert tagged and all(
        os.path.basename(os.path.dirname(f)).startswith("cluster=") for f in tagged
    )
    # appended vectors are probe-visible: query near the appended blob
    qs = spark.createDataFrame(
        [(1, base)], "query_id long, q array<double>"
    )
    got = {r["vec_id"] for r in ann_topk_ivf(spark, store, qs, k=10, n_probe=3).collect()}
    assert got & set(range(10_000, 10_020))
    # idempotent replay
    c2 = ann_append(spark, store, fresh, batch_id=901)
    assert c2 == c and spark.read.parquet(store.path("ann_vectors")).count() == n0 + 20
