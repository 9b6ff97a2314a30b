"""Similarity search over embedding columns (array<float>).

* brute_force_topk — exact cosine top-k: broadcast the query vector, JVM-side
  zip_with/aggregate dot product, TakeOrderedAndProject. The correctness
  baseline.
* ivf_topk — IVF-style scale path: k-means-ish coarse centroids (sampled,
  driver-side numpy — centroid count is tiny), assign each vector to its
  nearest centroid at index time (one pandas-UDF pass), probe only the nearest
  `nprobe` centroid buckets at query time. Partition pruning on the centroid
  id replaces the full scan — at 100 TB the scan cost drops by
  n_centroids/nprobe.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot_col(vec_col: str, qvec: list[float]):
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return F.aggregate(
        F.zip_with(vec_col, q, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm_col(vec_col: str):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x))


def cosine_scores(
    emb: DataFrame, qvec: list[float], id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, cosine) for every row — no cut; callers apply their own top-k
    (possibly on a rounded value for cross-engine-stable k-boundaries)."""
    qn = float(np.linalg.norm(np.asarray(qvec, dtype=np.float64)))
    return emb.select(
        F.col(id_col),
        (_dot_col(vec_col, qvec) / (_norm_col(vec_col) * F.lit(qn))).alias("cosine"),
    )


def brute_force_topk(
    emb: DataFrame, qvec: list[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k (score desc, id asc)."""
    scored = cosine_scores(emb, qvec, id_col=id_col, vec_col=vec_col)
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)


def train_centroids(
    emb: DataFrame, n_centroids: int = 16, vec_col: str = "embedding",
    sample: int = 4096, iters: int = 10, seed: int = 42,
) -> np.ndarray:
    """Tiny k-means on a driver-side sample (Lloyd's, numpy). Centroids are a
    broadcast-sized artifact (n_centroids × dim floats) by construction."""
    pdf = emb.select(vec_col).limit(sample).toPandas()
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        sims = X @ C.T
        assign = sims.argmax(axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def train_centroids_deterministic(
    emb: DataFrame, k: int = 8, iters: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic Lloyd's over row-normalized vectors, built for
    cross-engine parity (the gate's oracle unrolls the SAME iterations into
    SQL): init = first k vectors in id order, similarity argmax decisions
    rounded to 9dp (ties → lowest centroid id), empty clusters keep their
    previous centroid, means re-normalized. The training set must be a
    bounded/sampled frame — centroids are a driver-side artifact."""
    pdf = emb.select(id_col, vec_col).orderBy(id_col).toPandas()
    X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    k = min(k, len(X))
    C = X[:k].copy()
    for _ in range(iters):
        sims = np.round(X @ C.T, 9)
        assign = sims.argmax(axis=1)
        for c in range(k):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return C


def assign_centroids(
    emb: DataFrame, centroids: np.ndarray, vec_col: str = "embedding", out_col: str = "centroid"
) -> DataFrame:
    """One vectorized pass: nearest-centroid id per vector (numpy matmul per
    Arrow batch). Decision = argmax of the RAW dot product rounded to 9dp
    (row normalization drops out of the argmax; rounding the raw dot makes
    the decision reproducible by an oracle computing the same quantity)."""
    C = centroids.astype(np.float64)

    @F.pandas_udf(T.IntegerType())
    def nearest(vecs: pd.Series) -> pd.Series:
        X = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(X) == 0:
            return pd.Series([], dtype="int32")
        return pd.Series(np.round(X @ C.T, 9).argmax(axis=1).astype(np.int32))

    return emb.withColumn(out_col, nearest(F.col(vec_col)))


def ivf_candidates(
    assigned: DataFrame,
    centroids: np.ndarray,
    qvec: list[float],
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_col: str = "centroid",
) -> DataFrame:
    """(id, cosine) over the `nprobe` buckets nearest the query — no cut.
    `assigned` should be persisted partitioned-by-centroid for pruning."""
    q = np.asarray(qvec, dtype=np.float64)
    # raw-dot probe selection, 9dp-rounded, stable (lowest cid on ties) —
    # same decision rule as assign_centroids, same oracle-replicable form
    probe = np.argsort(-np.round(centroids @ q, 9), kind="stable")[:nprobe].tolist()
    cand = assigned.filter(F.col(centroid_col).isin([int(c) for c in probe]))
    return cosine_scores(cand, qvec, id_col=id_col, vec_col=vec_col)


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    qvec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_col: str = "centroid",
) -> DataFrame:
    """Approximate top-k: scan only the `nprobe` buckets nearest the query."""
    scored = ivf_candidates(
        assigned, centroids, qvec, nprobe=nprobe,
        id_col=id_col, vec_col=vec_col, centroid_col=centroid_col,
    )
    return scored.orderBy(F.desc("cosine"), id_col).limit(k)
