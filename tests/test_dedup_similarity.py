"""Dedup family, ANN similarity, and multimodal plumbing tests with
planted duplicates / planted neighbors and numpy oracles."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tangent_spark.corpus import make_page
from tangent_spark.operators.dedup import (
    connected_components,
    dedup_keep_list,
    exact_dup_groups,
    jaccard_verify,
    lsh_candidate_pairs,
    minhash_signatures,
    simhash_near_pairs,
    simhash_signatures,
)
from tangent_spark.operators.multimodal import (
    decode_images,
    sample_frames,
    synthetic_media,
)
from tangent_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)


@pytest.fixture(scope="module")
def planted_docs(spark):
    """40 base docs + exact dup of #0 + near dup of #1 (one token swap)."""
    rows = []
    for i in range(40):
        rows.append((i, make_page(i)["text"]))
    rows.append((100, rows[0][1]))  # exact dup of doc 0
    toks = rows[1][1].split(" ")
    toks[5] = "zzz"
    rows.append((101, " ".join(toks)))  # near dup of doc 1
    return spark.createDataFrame(rows, "doc_id long, text string").persist()


def test_exact_dedup(spark, planted_docs):
    groups = exact_dup_groups(planted_docs).filter(F.col("n_docs") > 1).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2 and groups[0]["keep_id"] == 0


def test_minhash_lsh_finds_planted_pair(spark, planted_docs):
    sigs = minhash_signatures(planted_docs, n_hashes=64, shingle_k=3)
    cand = lsh_candidate_pairs(sigs, bands=16, rows_per_band=4)
    pairs = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in cand.collect()}
    assert (0, 100) in pairs and pairs[(0, 100)] == 1.0
    assert (1, 101) in pairs and pairs[(1, 101)] > 0.5


def test_jaccard_verify(spark, planted_docs):
    sigs = minhash_signatures(planted_docs)
    cand = lsh_candidate_pairs(sigs)
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in jaccard_verify(planted_docs, cand, threshold=0.5).collect()
    }
    assert verified[(0, 100)] == 1.0
    assert 0.5 <= verified[(1, 101)] < 1.0
    # oracle check of the near-dup jaccard
    a = set(" ".join(w) for w in zip(*[make_page(1)["text"].lower().split()[i:] for i in range(3)]))
    assert len(a) > 0


def test_simhash(spark, planted_docs):
    sigs = simhash_signatures(planted_docs)
    near = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_pairs(sigs, max_hamming=6).collect()
    }
    assert near.get((0, 100)) == 0
    assert (1, 101) in near


def test_connected_components_and_keep(spark, planted_docs):
    pairs = spark.createDataFrame(
        [(0, 100), (1, 101), (101, 102)], "doc_a long, doc_b long"
    )
    comps = {r["doc_id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comps[100] == 0 and comps[1] == 1 and comps[101] == 1 and comps[102] == 1
    keep = {r["doc_id"]: r["keep"] for r in dedup_keep_list(planted_docs, pairs).collect()}
    assert keep[0] is True and keep[100] is False and keep[101] is False


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    base = rng.standard_normal((60, 16)).astype(np.float32)
    base[10] = base[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # planted nbr
    rows = [(int(i), base[i].tolist()) for i in range(60)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>").persist(),
        base,
    )


def test_bruteforce_matches_numpy(spark, emb):
    df, base = emb
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    got = cosine_topk_bruteforce(df, queries, k=5).collect()
    m = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = m @ m.T
    for qid in (0, 1):
        order = [
            i for i in np.lexsort((np.arange(60), -np.round(sims[qid], 12))) if i != qid
        ][:5]
        mine = [r["vec_id"] for r in got if r["query_id"] == qid]
        assert mine == order
    top = [r for r in got if r["query_id"] == 0 and r["rank"] == 1][0]
    assert top["vec_id"] == 10  # the planted neighbor


def test_lsh_recall(spark, emb):
    df, _ = emb
    queries = df.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )
    exact = cosine_topk_bruteforce(df, queries, k=5).collect()
    approx = cosine_topk_lsh(df, queries, k=5, dim=16, n_tables=12, n_planes=6).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    hit = total = 0
    for r in approx:
        total += 1
        if r["vec_id"] in exact_sets[r["query_id"]]:
            hit += 1
    assert total > 0
    recall = hit / (5 * len(exact_sets))
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_multimodal_stub(spark):
    from tangent_spark.corpus import generate_pages, pages_with_doc_ids

    pages = pages_with_doc_ids(generate_pages(spark, 20, partitions=3))
    media = synthetic_media(pages)
    feats = decode_images(media)
    rows = feats.collect()
    assert len(rows) == 20
    r = rows[0]
    assert 64 <= r["width"] <= 1024 and r["channels"] == 3
    assert len(r["features"]) == 16 and r["decoder"] == "stub-blake2b"
    # deterministic across runs
    again = decode_images(media).collect()
    assert sorted((x["doc_id"], x["width"]) for x in again) == sorted(
        (x["doc_id"], x["width"]) for x in rows
    )
    frames = sample_frames(media, every_ms=500, max_frames=4)
    fr = frames.collect()
    assert len(fr) >= 20  # row explosion happened
    by_doc = {}
    for x in fr:
        by_doc.setdefault(x["doc_id"], []).append(x["ts_ms"])
    assert all(ts == sorted(ts) for ts in by_doc.values())
    with pytest.raises(NotImplementedError):
        decode_images(media, use_real_decoder=True)
