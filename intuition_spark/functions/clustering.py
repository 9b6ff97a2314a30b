"""Q19 result clustering — the Carrot2 `/clustering` handler analogue
(`SolrClientTool.findClustering` util/SolrClientTool.java:235-268,
`Carrot2Util` util/Carrot2Util.java:53-74).

Like the reference (which clusters only the top-200 result docs client-side),
clustering is a POST-RETRIEVAL op over the top-k hit set, never a corpus scan:
TF-IDF vectors are built distributed (explode → groupBy), the tiny k×dim
centroid state is trained driver-side (Lloyd's on ≤ top-k docs) and broadcast
back for the assignment pass. Deterministic: fixed init (first k docs in
doc_id order), fixed iteration count, stable argmin tie-break.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tfidf_matrix(hits_toks: DataFrame, id_col: str = "doc_id", term_col: str = "term"):
    """(ids, vocab, dense tf-idf matrix) for a SMALL hit set (top-k docs).

    hits_toks: (doc_id, term) one row per token occurrence, already restricted
    to the hit docs. Returns driver-side numpy — this is the reference's
    client-side Carrot2 input shape.
    """
    tf = hits_toks.groupBy(id_col, term_col).agg(F.count("*").alias("tf"))
    pdf = tf.toPandas()
    # vectorized scatter fill — searchsorted maps each row to its (doc, term)
    # cell in one shot (was the clustering path's only per-row Python loop)
    ids = np.sort(pdf[id_col].unique())
    vocab = np.sort(pdf[term_col].unique())
    M = np.zeros((len(ids), len(vocab)), dtype=np.float64)
    row_ix = np.searchsorted(ids, pdf[id_col].to_numpy())
    col_ix = np.searchsorted(vocab, pdf[term_col].to_numpy())
    M[row_ix, col_ix] = pdf["tf"].to_numpy()
    df_t = (M > 0).sum(axis=0)
    idf = np.log(1.0 + len(ids) / np.maximum(df_t, 1))
    X = M * idf
    norms = np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    return ids, vocab, X / norms


def kmeans_deterministic(X: np.ndarray, k: int = 4, iters: int = 10) -> np.ndarray:
    """Lloyd's with deterministic init (first k rows) and stable tie-break.

    Similarities are rounded to 9dp BEFORE each argmax so the assignment
    decision is reproducible across engines (an unordered-summation oracle —
    DuckDB hash-agg SUM — can differ from numpy's fold in the last ulp; the
    decision points must quantize, like the cosine k-boundaries elsewhere)."""
    k = min(k, len(X))
    C = X[:k].copy()
    assign = np.zeros(len(X), dtype=np.int32)
    for _ in range(iters):
        sims = np.round(X @ C.T, 9)
        assign = sims.argmax(axis=1).astype(np.int32)  # argmax = first max (stable)
        for c in range(k):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                C[c] = v / max(np.linalg.norm(v), 1e-12)
    return assign


def cluster_labels(vocab: np.ndarray, X: np.ndarray, assign: np.ndarray, top_terms: int = 3):
    """Top TF-IDF terms per cluster — the Carrot2-style cluster label.
    Mean weights are rounded to 9dp before ranking (cross-engine-stable
    term order; ties break by vocab order, i.e. lexicographically)."""
    labels = {}
    for c in np.unique(assign):
        centroid = np.round(X[assign == c].mean(axis=0), 9)
        top = np.argsort(-centroid, kind="stable")[:top_terms]
        labels[int(c)] = " ".join(vocab[top])
    return labels
