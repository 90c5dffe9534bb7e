"""Similarity search over embedding columns (array<float>).

  * cosine_topk_bruteforce — exact: broadcast the (small) query set,
    JVM-side zip_with/aggregate dot products, per-query top-k via a
    ranking window. The baseline and the oracle-parity path.
  * ann_lsh_topk — scale path: random-hyperplane LSH (fixed seeded
    planes), bucket join on hash prefix, exact cosine within buckets,
    per-query top-k. Approximate (recall < 1 when true neighbors land in
    other buckets); multi-probe via ``n_tables`` signed projections.

Everything is deterministic: hyperplanes come from a seeded numpy
Generator materialized once on the driver and broadcast as literals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..functions.parity import duck_round


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b)))
    )


def cosine_topk_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact top-k neighbors per query vector (broadcast nested-loop +
    vectorized JVM arithmetic; deterministic ties: cosine desc, id asc)."""
    j = vectors.crossJoin(F.broadcast(queries))
    j = with_cosine(j, q_vec_col, vec_col)
    # rank on the ROUNDED cosine (the emitted value) so the ordering key is
    # identical to the DuckDB oracle's — ranking on the unrounded value
    # could order two neighbors differing only beyond 6dp oppositely
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc(duck_round("cosine", 6)), F.asc(id_col)
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", F.col(id_col).alias("neighbor_id"), duck_round("cosine", 6).alias("cosine"))
    )


_KNN_METRICS = ("cosine", "dot_product", "l2_norm")


def knn_search(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_candidates: int = 100,
    metric: str = "cosine",
    filter_expr=None,
    similarity: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """ES 8 top-level ``knn`` search semantics over an embedding column:

    * ``filter`` is a PRE-filter (ES applies the kNN filter during graph
      search, so only passing docs are candidates);
    * ``similarity`` is the optional raw-similarity floor in the
      metric's own space (ES ``knn.similarity``) — applied to the raw
      f64 value, BEFORE the score transform;
    * the returned ``_score`` uses the ES dense_vector transforms:
      cosine -> (1 + cos) / 2, dot_product -> (1 + dot) / 2,
      l2_norm -> 1 / (1 + d^2);
    * ``num_candidates`` is validated (must be >= k) but does not change
      results: this exact scorer has no per-segment approximation, so
      the candidate pool is the full filtered set. The determinism
      contract forbids a per-PARTITION candidate cap (partitioning is
      not content) — an approximate pool comes from the LSH/IVF paths
      (ann_lsh_topk / ann_ivf_topk), not from this one.

    Ranking is on the ROUNDED (6dp) transformed score so the ordering
    key matches the DuckDB twin exactly; ties break id asc. Returns
    (q_id, rank, neighbor_id, score6)."""
    if metric not in _KNN_METRICS:
        raise ValueError(f"metric must be one of {_KNN_METRICS}")
    if num_candidates < k:
        raise ValueError("num_candidates must be >= k (ES requires this)")
    if filter_expr is not None:
        vectors = vectors.filter(filter_expr)
    j = vectors.crossJoin(F.broadcast(queries))
    q, v = F.col(q_vec_col), F.col(vec_col)
    if metric == "cosine":
        raw = _dot(q, v) / (_norm(q) * _norm(v))
        score = (F.lit(1.0) + raw) / F.lit(2.0)
    elif metric == "dot_product":
        raw = _dot(q, v)
        score = (F.lit(1.0) + raw) / F.lit(2.0)
    else:  # l2_norm
        raw = F.sqrt(
            F.aggregate(
                F.zip_with(q, v, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda s, x: s + x,
            )
        )
        score = F.lit(1.0) / (F.lit(1.0) + raw * raw)
    j = j.withColumn("_raw", raw).withColumn("_score", score)
    if similarity is not None:
        # ES similarity is a floor for cosine/dot, a distance CEILING
        # for l2_norm (smaller distance = more similar)
        if metric == "l2_norm":
            j = j.filter(F.col("_raw") <= F.lit(float(similarity)))
        else:
            j = j.filter(F.col("_raw") >= F.lit(float(similarity)))
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc(duck_round("_score", 6)), F.asc(id_col)
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            q_id_col,
            "rank",
            F.col(id_col).alias("neighbor_id"),
            duck_round("_score", 6).alias("score6"),
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_col(vec_col, planes: np.ndarray):
    """Signed-projection bucket id: bit b = sign(<v, plane_b>)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(float(x)) for x in planes[b]]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            >= 0,
            F.lit(1 << b),
        ).otherwise(F.lit(0))
        for b in range(len(planes))
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    exact cosine + ranking within candidates. At 100 TB the bucket join
    replaces the full cross join — shuffle bounded by bucket sizes."""
    dim = _require_dim(dim)
    planes = _hyperplanes(dim, n_planes)
    v = vectors.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    q = queries.withColumn("_bucket", lsh_bucket_col(F.col(q_vec_col), planes))
    j = v.join(F.broadcast(q), "_bucket")
    j = with_cosine(j, q_vec_col, vec_col)
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc(duck_round("cosine", 6)), F.asc(id_col)
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", F.col(id_col).alias("neighbor_id"), duck_round("cosine", 6).alias("cosine"))
    )


def _require_dim(dim: int | None) -> int:
    if dim is None:
        raise ValueError(
            "pass dim= (embedding length): inferring it would run an extra "
            "driver job per call — the schema does not carry array length"
        )
    return int(dim)


def _kmeans_centroids(
    sample: np.ndarray, n_centroids: int, n_iter: int = 10, seed: int = 11
) -> np.ndarray:
    """Deterministic spherical k-means on a driver-side sample (FAISS-style
    IVF training: train on a bounded sample, assign at scale). Seeded init,
    fixed iteration count — no runtime nondeterminism."""
    rng = np.random.default_rng(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    init = rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)
    c = x[np.sort(init)].copy()
    for _ in range(n_iter):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            members = x[assign == j]
            if len(members):
                m = members.sum(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return c


def ivf_assign_udf(centroids: np.ndarray, vec_col_name: str):
    """pandas UDF: embedding -> nearest-centroid id (vectorized matmul)."""
    from pyspark.sql.functions import pandas_udf

    c = centroids

    @pandas_udf("int")
    def _assign(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy())
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(x @ c.T, axis=1).astype(np.int32))

    return _assign


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    train_sample: int = 4096,
    seed: int = 11,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the second scale path next
    to LSH. Train coarse centroids on a bounded, deterministic sample
    (lowest ``train_sample`` ids — reproducible across runs/parallelism),
    partition vectors by nearest centroid, and scan only each query's
    ``nprobe`` nearest cells with exact cosine + ranking. At 100 TB the
    candidate set per query is ~nprobe/n_centroids of the corpus, the
    centroid assignment is one Arrow-batched matmul pass, and the probe
    join is a broadcast of (query x nprobe) rows — no all-pairs anywhere."""
    samp = (
        vectors.orderBy(id_col)
        .limit(train_sample)
        .select(vec_col)
        .toPandas()[vec_col]
    )
    centroids = _kmeans_centroids(np.stack(samp.to_numpy()), n_centroids, seed=seed)

    v = vectors.withColumn("_cell", ivf_assign_udf(centroids, vec_col)(F.col(vec_col)))

    # driver-side probe list per query (queries are the small side)
    qp = queries.toPandas()
    qx = np.stack(qp[q_vec_col].to_numpy())
    qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    sims = qx @ centroids.T
    nprobe = min(nprobe, centroids.shape[0])
    probe_rows = [
        (int(qp[q_id_col].iloc[i]), [float(x) for x in qp[q_vec_col].iloc[i]], int(c))
        for i in range(len(qp))
        for c in np.argsort(-sims[i], kind="stable")[:nprobe]
    ]
    spark = vectors.sparkSession
    probes = spark.createDataFrame(
        probe_rows, f"{q_id_col} long, {q_vec_col} array<double>, _cell int"
    )
    j = v.join(F.broadcast(probes), "_cell")
    j = with_cosine(j, q_vec_col, vec_col)
    w = Window.partitionBy(q_id_col).orderBy(
        F.desc(duck_round("cosine", 6)), F.asc(id_col)
    )
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(q_id_col, "rank", F.col(id_col).alias("neighbor_id"), duck_round("cosine", 6).alias("cosine"))
    )


def embedding_cosine_dedup(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    max_bucket: int = 10_000,
    metrics_out: dict | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) via LSH-bucketed
    self-join + exact verification. ``max_bucket`` is the skew guard: a
    degenerate bucket (e.g. all-zero vectors) would otherwise go quadratic
    in one task — buckets over the cap are dropped, matching the
    minhash_lsh_pairs contract; pass ``metrics_out={}`` to observe
    dropped_buckets / dropped_bucket_rows."""
    from .dedup import _record_drops

    dim = _require_dim(dim)
    planes = _hyperplanes(dim, n_planes)
    v = vectors.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes)).select(
        "_bucket", F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    bsizes = v.groupBy("_bucket").agg(F.count("*").alias("_n"))
    _record_drops(bsizes, "_n", max_bucket, metrics_out)
    ok = bsizes.filter((F.col("_n") > 1) & (F.col("_n") <= max_bucket)).select("_bucket")
    v = v.join(F.broadcast(ok), "_bucket")
    v2 = v.select("_bucket", F.col("id_a").alias("id_b"), F.col("va").alias("vb"))
    pairs = v.join(v2, "_bucket").filter(F.col("id_a") < F.col("id_b"))
    pairs = with_cosine(pairs, "va", "vb")
    return (
        pairs.filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", duck_round("cosine", 6).alias("cosine"))
        .distinct()
    )
