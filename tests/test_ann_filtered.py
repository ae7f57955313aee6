"""Filtered vector search (plans/ann.ann_topk_ivf_filtered) vs a numpy
exact oracle: ES 8 knn-with-filter semantics — pre-filter, k-result
guarantee via selectivity-scaled over-probe + exact escalation, and the
brute-force route for highly selective filters."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tangent_spark.plans.ann import (
    ann_topk_ivf,
    ann_topk_ivf_filtered,
    build_ann_index,
)

N, DIM = 400, 16


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((8, DIM)) * 3.0
    vecs = np.concatenate(
        [c + 0.4 * rng.standard_normal((N // 8, DIM)) for c in centers]
    )
    rows = [
        (int(i), vecs[i].tolist(), int(i % 5), "en" if i % 3 else "de")
        for i in range(N)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int, lang string"
    ).persist()
    emb.count()
    return emb, vecs


@pytest.fixture(scope="module")
def store(spark, corpus, tmp_path_factory):
    emb, _ = corpus
    out = str(tmp_path_factory.mktemp("annf") / "ann")
    return build_ann_index(
        spark, emb.select("vec_id", "embedding"), out, n_centroids=8, n_iter=6
    )


def _cos_matrix(vecs):
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    return n @ n.T


def _exact_filtered(vecs, qids, allowed, k):
    """(query_id -> [(vec_id, cos)]) over `allowed`, self excluded,
    ties broken by vec_id asc — the engine's total order."""
    cos = _cos_matrix(vecs)
    out = {}
    for q in qids:
        cands = [
            (round(round(cos[q, j], 10), 6), j) for j in sorted(allowed) if j != q
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        out[q] = [(j, c) for c, j in cands[:k]]
    return out


def _got(df):
    out = {}
    for r in df.collect():
        out.setdefault(int(r["query_id"]), []).append(
            (int(r["rank"]), int(r["vec_id"]), round(float(r["cos"]), 6))
        )
    return {q: [(v, c) for _, v, c in sorted(rows)] for q, rows in out.items()}


def _queries(spark, corpus, qids):
    emb, _ = corpus
    return emb.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q")
    )


def test_full_probe_filtered_equals_exact_oracle(spark, corpus, store):
    """n_probe == n_centroids restricted to `label = 2` must equal the
    numpy brute force over exactly the label-2 vectors."""
    emb, vecs = corpus
    qids = [0, 7, 123]
    got = _got(
        ann_topk_ivf_filtered(
            spark, store, _queries(spark, corpus, qids), emb, "label = 2",
            k=10, n_probe=8,
        )
    )
    allowed = {i for i in range(N) if i % 5 == 2}
    exp = _exact_filtered(vecs, qids, allowed, 10)
    for q in qids:
        assert [v for v, _ in got[q]] == [v for v, _ in exp[q]], q
        for (gv, gc), (ev, ec) in zip(got[q], exp[q]):
            assert abs(gc - ec) < 1e-5, (q, gv, gc, ec)


def test_low_probe_still_returns_k_rows(spark, corpus, store):
    """A selective filter with n_probe=1 must still fill k per query
    (over-probe + exact escalation), and every returned id passes the
    filter."""
    emb, _ = corpus
    qids = [3, 44]
    res = ann_topk_ivf_filtered(
        spark, store, _queries(spark, corpus, qids), emb,
        "label = 1 AND lang = 'en'", k=10, n_probe=1,
        brute_force_threshold=1,  # force the IVF path
    ).collect()
    allowed = {i for i in range(N) if i % 5 == 1 and i % 3 != 0}
    assert len(allowed) >= 10
    by_q = {}
    for r in res:
        by_q.setdefault(int(r["query_id"]), []).append(int(r["vec_id"]))
    for q in qids:
        assert len(by_q[q]) == 10, (q, len(by_q.get(q, [])))
        assert set(by_q[q]) <= allowed


def test_brute_force_route_for_tiny_filters(spark, corpus, store):
    """|allowed| <= brute_force_threshold skips IVF and is exact."""
    emb, vecs = corpus
    qids = [5]
    got = _got(
        ann_topk_ivf_filtered(
            spark, store, _queries(spark, corpus, qids), emb,
            "vec_id % 37 = 0", k=5, n_probe=1,
        )
    )
    allowed = {i for i in range(N) if i % 37 == 0}
    exp = _exact_filtered(vecs, qids, allowed, 5)
    assert [v for v, _ in got[5]] == [v for v, _ in exp[5]]


def test_fewer_allowed_than_k(spark, corpus, store):
    """min(k, |allowed|-self) rows — never an error, never padding."""
    emb, _ = corpus
    res = ann_topk_ivf_filtered(
        spark, store, _queries(spark, corpus, [0]), emb,
        "vec_id IN (0, 1, 2)", k=10, n_probe=2,
    ).collect()
    assert sorted(int(r["vec_id"]) for r in res) == [1, 2]


def test_empty_filter_returns_empty(spark, corpus, store):
    emb, _ = corpus
    assert (
        ann_topk_ivf_filtered(
            spark, store, _queries(spark, corpus, [0]), emb, "label = 99", k=5
        ).count()
        == 0
    )


def test_where_none_matches_unfiltered(spark, corpus, store):
    emb, _ = corpus
    qdf = _queries(spark, corpus, [1, 2])
    a = _got(ann_topk_ivf_filtered(spark, store, qdf, emb, None, k=5, n_probe=3))
    b = _got(ann_topk_ivf(spark, store, qdf, k=5, n_probe=3))
    assert a == b


def test_distributed_route_matches_driver_route(spark, corpus, store):
    """Forcing the allowed set past the driver cap (join route) must
    not change results vs the broadcast route."""
    emb, _ = corpus
    qdf = _queries(spark, corpus, [9])
    a = _got(
        ann_topk_ivf_filtered(
            spark, store, qdf, emb, "lang = 'en'", k=8, n_probe=8
        )
    )
    b = _got(
        ann_topk_ivf_filtered(
            spark, store, qdf, emb, "lang = 'en'", k=8, n_probe=8,
            max_driver_candidates=10,
        )
    )
    assert a == b
