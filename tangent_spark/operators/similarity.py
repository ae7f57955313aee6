"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline (a full scan — in
Spark that's one pass over the embeddings table per query batch, fully
parallel, no shuffle until the final per-query top-k). The scale path
is random-hyperplane LSH: bucket signatures computed vectorized per
partition, candidates from bucket equi-joins, exact cosine re-scoring
on candidates only.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


_INTEGRAL_TYPES = ("byte", "short", "int", "integer", "long", "bigint")


def _require_integral_id(df: DataFrame, col: str) -> None:
    """Raise instead of letting cast('long') silently NULL non-integral
    ids (e.g. string doc keys) — a silent-empty-result trap."""
    dt = df.schema[col].dataType.simpleString()
    if dt not in _INTEGRAL_TYPES:
        raise TypeError(
            f"id column {col!r} has type {dt}; similarity operators require an "
            "integral id (byte/short/int/long) — map string keys to dense ids "
            "first (tangent_spark.functions.ids.dense_ids)"
        )


def _cos_cols(q: str, v: str):
    dot = F.aggregate(F.zip_with(q, v, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    nq = F.sqrt(F.aggregate(F.transform(q, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    nv = F.sqrt(F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    return dot / (nq * nv)


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast the (small) query set
    against the full embeddings scan; JVM-side zip_with dot products
    (no Python in the hot loop).

    Scale shape: the final per-query window would otherwise move ALL N
    scored rows per query to one reducer. A per-PARTITION top-k
    pre-reduction (same total order: cos desc, vec_id asc — so it keeps a
    superset of the global top-k) runs first, leaving at most
    n_partitions*k rows per query for the window. Ids must be integral
    (validated — a silent cast would turn string ids into NULLs)."""
    _require_integral_id(embeddings, id_col)
    _require_integral_id(queries, query_id_col)
    emb = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    qs = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("q"),
    )
    scored = (
        emb.join(F.broadcast(qs))
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", _cos_cols("q", "v"))
        .select("query_id", "vec_id", "cos")
    )
    return _global_topk(scored, k)


def _partial_topk(k: int):
    """Per-partition top-k pre-reduction (cos desc, vec_id asc): keeps a
    superset of the global top-k so the final window sees at most
    n_partitions*k rows per query instead of N."""

    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        best: pd.DataFrame | None = None
        for pdf in batches:
            cur = pdf if best is None else pd.concat([best, pdf], ignore_index=True)
            cur = cur.sort_values(
                ["query_id", "cos", "vec_id"], ascending=[True, False, True]
            )
            best = cur.groupby("query_id", sort=False).head(k)
        if best is not None and len(best):
            yield best

    return partial_topk


def _global_topk(scored: DataFrame, k: int) -> DataFrame:
    reduced = scored.mapInPandas(
        _partial_topk(k), schema="query_id long, vec_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        reduced.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cos", 6).alias("cos"))
    )


def hyperplane_signatures(
    embeddings: DataFrame,
    dim: int,
    n_tables: int = 8,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table, bucket): sign-bit signature per hash table.
    Planes are seeded numpy normals broadcast in the closure; the
    signature computation is one (batch x dim) @ (dim x tables*planes)
    matmul per Arrow batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_tables * n_planes))
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            bits = (mat @ planes) > 0  # (n, tables*planes)
            bits = bits.reshape(len(pdf), n_tables, n_planes)
            buckets = (bits * weights).sum(axis=2)  # (n, tables)
            out = pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf[id_col].to_numpy(), n_tables),
                    "table": np.tile(np.arange(n_tables), len(pdf)),
                    "bucket": buckets.reshape(-1),
                }
            )
            yield out

    return embeddings.select(id_col, vec_col).mapInPandas(
        kernel, schema="vec_id long, table int, bucket long"
    )


def _norm_rows(mat: np.ndarray) -> np.ndarray:
    return mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)


def kmeans_fit(
    embeddings: DataFrame,
    n_centroids: int = 32,
    n_iter: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means (Lloyd's on the unit sphere) fitted with Spark:
    assignment + per-cluster partial sums are computed map-side per Arrow
    batch (one matmul each), so every iteration is ONE job shipping
    n_partitions x n_centroids tiny partial rows to the driver — no
    shuffle at all, valid at any table size. Init is a deterministic
    xxhash64-ordered sample (seeded), so the fit is reproducible.
    Returns (n_centroids, dim) unit-norm centroids."""
    init = (
        embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_id").cast("string"), F.lit(seed)), F.col("_id"))
        .limit(n_centroids)
        .collect()
    )
    if not init:
        raise ValueError("kmeans_fit: empty embeddings table")
    C = _norm_rows(np.stack([np.asarray(r["_v"], dtype=np.float64) for r in init]))
    vecs = embeddings.select(F.col(vec_col).alias("_v"))
    for _ in range(n_iter):
        bc = C  # rides in the closure (n_centroids x dim — tiny)

        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                nm = _norm_rows(
                    np.stack(pdf["_v"].map(lambda v: np.asarray(v, dtype=np.float64)))
                )
                a = np.argmax(nm @ bc.T, axis=1)
                cs, ns, ss = [], [], []
                for c in np.unique(a):
                    sel = nm[a == c]
                    cs.append(int(c))
                    ns.append(int(sel.shape[0]))
                    ss.append(sel.sum(axis=0).tolist())
                yield pd.DataFrame({"cluster": cs, "n": ns, "s": ss})

        rows = vecs.mapInPandas(
            partials, schema="cluster int, n long, s array<double>"
        ).collect()
        sums = np.zeros_like(C)
        cnt = np.zeros(n_centroids)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["s"], dtype=np.float64)
            cnt[r["cluster"]] += r["n"]
        upd = cnt > 0
        C = C.copy()
        C[upd] = sums[upd] / cnt[upd, None]  # empty clusters keep old centroid
        C = _norm_rows(C)
    return C


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, v): the IVF index — every vector tagged with its
    nearest centroid. At scale this is written bucketed/partitioned BY
    cluster so a probe reads only its buckets; here it flows straight
    into the candidate equi-join."""
    C = centroids

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            a = np.argmax(_norm_rows(mat) @ C.T, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "cluster": a.astype("int32"),
                    "v": [row.tolist() for row in mat],
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        assign, schema="vec_id long, cluster int, v array<double>"
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 32,
    n_probe: int = 8,
    n_iter: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q",
    centroids: np.ndarray | None = None,
    indexed: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse quantizer (spherical k-means) -> each query
    probes its n_probe nearest centroids -> candidates come from a
    broadcast equi-join on cluster id (NO all-pairs anywhere) -> exact
    cosine re-score -> per-partition top-k pre-reduction -> window.

    Recall is CONTROLLABLE via n_probe (n_probe == n_centroids is exact
    brute force, smaller trades recall for a proportional scan cut) —
    unlike hyperplane LSH whose recall is fixed by geometry. Cost ~
    (n_probe / n_centroids) of the full scan per query. Pass a
    precomputed `centroids` (and optionally the matching `indexed`
    (vec_id, cluster, v) assignment table) to reuse a fit across query
    batches — the serve-path shape: fit + assign once at index time,
    probe at query time (plans/ann.py serves off stored tables this
    way)."""
    if indexed is None:
        _require_integral_id(embeddings, id_col)
    _require_integral_id(queries, query_id_col)
    if centroids is None:
        centroids = kmeans_fit(embeddings, n_centroids, n_iter, seed, id_col, vec_col)
    n_centroids = centroids.shape[0]
    n_probe = min(n_probe, n_centroids)
    if indexed is None:
        indexed = ivf_assign(embeddings, centroids, id_col, vec_col)
    # queries are the small broadcast side by contract: probe assignment
    # happens driver-side (n_queries x n_centroids dots)
    qrows = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("q"),
    ).collect()
    probes = []
    for r in qrows:
        qn = _norm_rows(np.asarray(r["q"], dtype=np.float64)[None, :])[0]
        for c in np.argsort(-(centroids @ qn), kind="stable")[:n_probe]:
            probes.append((int(r["query_id"]), int(c)))
    spark = embeddings.sparkSession
    probe_df = spark.createDataFrame(probes, "query_id long, cluster int")
    qs = spark.createDataFrame(
        [(r["query_id"], r["q"]) for r in qrows], "query_id long, q array<double>"
    )
    # static partition filter BEFORE the probe join: the batch's probed
    # clusters are known driver-side, so when the assignment table is
    # written partitioned by cluster (plans/ann.py) this prunes every
    # unprobed cluster's files out of the scan — the broadcast join
    # alone would still list/read them
    probed_clusters = sorted({c for _, c in probes})
    scored = (
        indexed.filter(F.col("cluster").isin(probed_clusters))
        .join(F.broadcast(probe_df), "cluster")
        .filter(F.col("query_id") != F.col("vec_id"))
        .join(F.broadcast(qs), "query_id")
        .withColumn("cos", _cos_cols("q", "v"))
        .select("query_id", "vec_id", "cos")
    )
    return _global_topk(scored, k)


# --- product quantization (the 100-TB memory path) --------------------------
#
# At web scale the embeddings themselves are the bottleneck: 10^12 docs x
# 768 float32 dims = 3 PB that no cluster scans per query. PQ compresses
# each L2-normalized vector into m uint8 codes (one per subspace, 256
# centroids each — m bytes/vector, e.g. 16 B instead of 3 KB) and scores
# queries with ADC (asymmetric distance computation): per query, one
# (m x 256) lookup table of subspace dot products; a candidate's
# approximate cosine is m table lookups + a sum. The scan is a pure
# numpy gather over the codes table — no decompression, no float vectors
# touched — followed by an optional exact re-rank of the top `refine`
# candidates (fetched by id: a semi-join, never a second scan).


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 256,
    n_iter: int = 12,
    sample: int = 10_000,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train PQ codebooks: (m, n_codes, dim//m) — k-means per subspace
    over a deterministic xxhash64-seeded sample of the (L2-normalized)
    vectors, driver-side (the FAISS discipline: codebooks train on a
    sample; only encode/scan touch the full table). dim must be
    divisible by m."""
    rows = (
        embeddings.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(F.xxhash64(F.col("_id").cast("string"), F.lit(seed)), F.col("_id"))
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: empty embeddings table")
    X = _norm_rows(np.stack([np.asarray(r["_v"], dtype=np.float64) for r in rows]))
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.zeros((m, n_codes, dsub))
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        k = min(n_codes, len(sub))
        C = sub[rng.choice(len(sub), size=k, replace=False)]
        for _ in range(n_iter):
            # argmin ||x-c||^2 == argmax (x.c - ||c||^2/2): one matmul,
            # no (sample x n_codes x dsub) difference tensor (~2 GB of
            # float64 temporaries per subspace at dim=768/sample=10k)
            a = np.argmax(sub @ C.T - 0.5 * (C**2).sum(axis=1), axis=1)
            for c in range(k):
                sel = sub[a == c]
                if len(sel):
                    C[c] = sel.mean(axis=0)
        books[s, :k] = C
        if k < n_codes:  # tiny tables: pad with the first centroid
            books[s, k:] = C[0]
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<short>): each L2-normalized vector encoded
    as its per-subspace nearest-centroid indexes. Vectorized per Arrow
    batch (one (batch x n_codes) distance matmul per subspace); at scale
    this table is what gets stored and scanned — m bytes a vector."""
    _require_integral_id(embeddings, id_col)
    B = codebooks
    m, _, dsub = B.shape

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            X = _norm_rows(
                np.stack(pdf[vec_col].map(lambda v: np.asarray(v, dtype=np.float64)))
            )
            codes = np.empty((len(X), m), dtype=np.int16)
            for s in range(m):
                sub = X[:, s * dsub : (s + 1) * dsub]
                # argmin ||x - c||^2 == argmax (x.c - ||c||^2/2)
                scores = sub @ B[s].T - 0.5 * (B[s] ** 2).sum(axis=1)
                codes[:, s] = np.argmax(scores, axis=1).astype(np.int16)
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "codes": [row.tolist() for row in codes],
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        encode, schema="vec_id long, codes array<short>"
    )


def cosine_topk_pq(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    n_codes: int = 256,
    refine: int = 50,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q",
    codebooks: np.ndarray | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ-ADC approximate top-k with exact re-ranking:

      1. ADC scan over the codes table: per partition, approximate
         cosine = sum over subspaces of LUT[s, code] (LUT = query-side
         subspace dot products, (n_queries x m x n_codes), rides in the
         closure) -> per-partition top-`refine` pre-reduction;
      2. global top-`refine` candidates per query (window over
         <= n_partitions x refine rows);
      3. exact cosine on ONLY those candidates via an id semi-join back
         to the float vectors -> final top-k.

    refine >= k controls the recall/cost trade; the float table is
    touched for at most refine rows per query. Pass precomputed
    `codebooks`/`codes` to amortize training+encode across query
    batches (the serve shape: encode at index time, ADC at query
    time)."""
    _require_integral_id(embeddings, id_col)
    _require_integral_id(queries, query_id_col)
    refine = max(refine, k)
    if codebooks is None:
        codebooks = pq_train(
            embeddings, m=m, n_codes=n_codes, seed=seed, id_col=id_col, vec_col=vec_col
        )
    B = codebooks
    m, n_codes, dsub = B.shape
    if codes is None:
        codes = pq_encode(embeddings, B, id_col, vec_col)

    qrows = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("q"),
    ).collect()
    spark = embeddings.sparkSession
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, rank int, vec_id long, cos double"
        )
    qids = np.array([int(r["query_id"]) for r in qrows], dtype=np.int64)
    Q = _norm_rows(np.stack([np.asarray(r["q"], dtype=np.float64) for r in qrows]))
    # LUT[qi, s, c] = dot(q_sub, codebook[s][c]) — approx cos is additive
    lut = np.stack(
        [Q[:, s * dsub : (s + 1) * dsub] @ B[s].T for s in range(m)], axis=1
    )  # (n_queries, m, n_codes)

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf["codes"].map(np.asarray)).astype(np.int64)  # (n, m)
            ids = pdf["vec_id"].to_numpy(np.int64)
            outs = []
            for qi in range(len(qids)):
                approx = lut[qi, np.arange(m)[None, :], C].sum(axis=1)  # (n,)
                mask = ids != qids[qi]
                a, i = approx[mask], ids[mask]
                if not len(a):
                    continue
                # same total order as the global window one step later
                # ((approx desc, vec_id asc)) so a tie on the refine
                # boundary keeps a deterministic candidate set
                top = np.lexsort((i, -a))[:refine]
                outs.append(
                    pd.DataFrame(
                        {"query_id": qids[qi], "vec_id": i[top], "approx": a[top]}
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    scanned = codes.mapInPandas(adc, schema="query_id long, vec_id long, approx double")
    w = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("vec_id"))
    cand = (
        scanned.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= refine)
        .select("query_id", "vec_id")
    )
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    spark = embeddings.sparkSession
    qs = spark.createDataFrame(
        [(int(r["query_id"]), r["q"]) for r in qrows], "query_id long, q array<double>"
    )
    scored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(qs), "query_id")
        .withColumn("cos", _cos_cols("q", "v"))
        .select("query_id", "vec_id", "cos")
    )
    return _global_topk(scored, k)


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_tables: int = 8,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "q",
) -> DataFrame:
    """Approximate top-k: candidates = vectors sharing any LSH bucket
    with the query, re-scored exactly. Recall grows with n_tables;
    cost ~ bucket size x tables instead of the full table.

    Honest caveat: random-hyperplane LSH only retrieves neighbors whose
    cosine is substantially positive (collision prob per plane is
    1 - theta/pi). On near-orthogonal data (e.g. random embeddings where
    the true top-1 is cos~0.35) recall is poor by construction — use
    more tables / fewer planes, or the brute-force path, for such data.
    Real web-scale embedding dedup targets cos >= 0.9, where this
    bucketing is effective."""
    emb_sig = hyperplane_signatures(
        embeddings, dim, n_tables, n_planes, seed, id_col, vec_col
    )
    q_sig = hyperplane_signatures(
        queries, dim, n_tables, n_planes, seed, query_id_col, query_vec_col
    ).withColumnRenamed("vec_id", "query_id")
    cand = (
        emb_sig.join(q_sig, ["table", "bucket"])
        .select("query_id", "vec_id")
        .distinct()
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    qs = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("q"),
    )
    scored = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(qs), "query_id")
        .withColumn("cos", _cos_cols("q", "v"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", F.round("cos", 6).alias("cos"))
    )


def embedding_near_dup_pairs_exact(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT: every (doc_a,
    doc_b, cos) with doc_a < doc_b and cosine >= threshold. This is the
    all-pairs exactness baseline (quadratic — verification, oracles,
    and small refine sets only); embedding_near_dup_pairs below is the
    LSH-bucketed scale path, exactly the brute-force/ANN split the
    cosine top-k stack uses."""
    a = embeddings.select(
        F.col(id_col).alias("doc_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    b = embeddings.select(
        F.col(id_col).alias("doc_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    return (
        a.join(b, F.col("doc_a") < F.col("doc_b"))
        .withColumn("cos", F.round(_cos_cols("va", "vb"), 6))
        .filter(F.col("cos") >= float(threshold))
        .select("doc_a", "doc_b", "cos")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_tables: int = 12,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at scale — the fifth dedup
    family next to exact/minhash/simhash/ngram-jaccard
    (operators/dedup.py): candidate pairs form ONLY inside a hyperplane
    LSH (table, bucket) — never an all-pairs join — and every candidate
    is verified with exact cosine >= threshold, so emitted pairs have
    NO false positives; recall is the LSH collision probability: a
    pair at angle theta collides in one table with p = (1-theta/pi)^
    n_planes and is retrieved with 1 - (1-p)^n_tables. At the default
    8 planes x 12 tables that is ~98% for cos = 0.9 (theta = 26deg,
    p = 0.29) and ~99.9% for cos = 0.95 — tighter duplicates are
    exponentially easier. Raise n_tables for more recall (linear
    cost), raise n_planes for smaller buckets (recall cost).

    `max_bucket` drops degenerate buckets (e.g. a zero-vector pile)
    before the self-join, the same cap discipline as the minhash band
    join; dropped buckets only cost recall, never precision. Output
    (doc_a, doc_b, cos), doc_a < doc_b, ready for
    dedup.connected_components_star clustering."""
    sig = hyperplane_signatures(
        embeddings, dim, n_tables, n_planes, seed, id_col, vec_col
    )
    if max_bucket is not None:
        small = (
            sig.groupBy("table", "bucket")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") <= int(max_bucket))
            .select("table", "bucket")
        )
        sig = sig.join(small, ["table", "bucket"], "left_semi")
    a = sig.select("table", "bucket", F.col("vec_id").alias("doc_a"))
    b = sig.select("table", "bucket", F.col("vec_id").alias("doc_b"))
    cand = (
        a.join(b, ["table", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ea = embeddings.select(
        F.col(id_col).alias("doc_a"),
        F.col(vec_col).cast("array<double>").alias("va"),
    )
    eb = embeddings.select(
        F.col(id_col).alias("doc_b"),
        F.col(vec_col).cast("array<double>").alias("vb"),
    )
    return (
        cand.join(ea, "doc_a")
        .join(eb, "doc_b")
        .withColumn("cos", F.round(_cos_cols("va", "vb"), 6))
        .filter(F.col("cos") >= float(threshold))
        .select("doc_a", "doc_b", "cos")
    )
