"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline: the query matrix is broadcast once
(``ray.put``), every batch computes a blocked matmul against it and emits only its
per-query top-k partials; a tiny ``groupby(query_id)`` reduces partials to the
global top-k. The shuffle carries k×Q rows per batch, never the corpus.

IVF variant for the scale path: deterministic Lloyd k-means (seeded, fixed iters)
builds a centroid codebook; vectors are bucketed by nearest centroid; queries probe
the ``nprobe`` nearest buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def knn_cosine(ds: rd.Dataset, queries: np.ndarray, query_ids: list, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               exclude_self: bool = True, int_exact: bool = False) -> rd.Dataset:
    """Exact top-k cosine neighbors for each query vector.
    Output: (query_id, neighbor_id, rank) — rank 1..k, ties broken by neighbor_id
    (deterministic under any parallel schedule).

    ``int_exact``: for INTEGER-VALUED vectors (e.g. hashing-trick features),
    compute cosine as exact-integer dot / (sqrt(exact) * sqrt(exact)) instead
    of normalizing rows first — every partial sum is exactly representable, so
    the similarity is bit-identical to an engine that sums in any other order
    (the DuckDB mirror) and the ranking is cross-engine stable."""
    q = np.asarray(queries, dtype=np.float64)
    if not int_exact:
        q = _normalize(q)
    qids = list(query_ids)
    ref = ray.put((q, qids))

    def partial_topk(batch: pa.Table) -> pa.Table:
        from ..core.vecops import ids_and_matrix

        qm, qid = ray.get(ref)
        ids, mat = ids_and_matrix(batch, id_col, vec_col,
                                  normalize=not int_exact)  # zero-copy flat child
        if int_exact:
            num = mat @ qm.T  # exact: integer-valued operands
            dn = np.maximum(np.sqrt((mat * mat).sum(axis=1)), 1e-12)
            qn = np.maximum(np.sqrt((qm * qm).sum(axis=1)), 1e-12)
            sims = num / (dn[:, None] * qn[None, :])
        else:
            sims = mat @ qm.T  # (n, Q)
        out_q, out_n, out_s = [], [], []
        for c in range(sims.shape[1]):
            col = sims[:, c]
            if exclude_self:
                mask = ids != qid[c]
            else:
                mask = np.ones(len(ids), dtype=bool)
            cand_ids, cand_s = ids[mask], col[mask]
            if len(cand_ids) > k:
                # top-k by (-sim, id): stable deterministic order
                idx = np.lexsort((cand_ids, -cand_s))[:k]
            else:
                idx = np.lexsort((cand_ids, -cand_s))
            out_q.extend([qid[c]] * len(idx))
            out_n.extend(cand_ids[idx].tolist())
            out_s.extend(cand_s[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(reduce_topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# IVF (inverted-file) variant — the 100 TB path
# ---------------------------------------------------------------------------


def kmeans_codebook(ds: rd.Dataset, n_centroids: int = 16, iters: int = 5,
                    vec_col: str = "embedding", sample: int = 4096,
                    seed: int = 7) -> np.ndarray:
    """Deterministic seeded Lloyd iterations on a driver-side sample (the codebook
    is tiny; training it on a bounded sample is the standard IVF recipe)."""
    rows = ds.select_columns([vec_col]).limit(sample).take_all()
    mat = _normalize(np.array([r[vec_col] for r in rows], dtype=np.float64))
    rng = np.random.RandomState(seed)
    cent = mat[rng.choice(len(mat), size=min(n_centroids, len(mat)), replace=False)]
    for _ in range(iters):
        assign = (mat @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    return cent


def knn_cosine_ivf(ds: rd.Dataset, queries: np.ndarray, query_ids: list,
                   k: int = 10, n_centroids: int = 16, nprobe: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   centroids: np.ndarray | None = None) -> rd.Dataset:
    """Approximate top-k: per batch, score only vectors whose nearest centroid is
    among each query's ``nprobe`` closest centroids.

    ``centroids`` overrides the sampled-Lloyd codebook with a caller-supplied
    one (e.g. ``cluster.lowest_id_vectors`` — deterministic, which makes the
    whole probe-then-rank algorithm SQL-mirrorable; see ``SQL_KNN_IVF``).
    Probe selection and all ranking tie-break to the lower centroid / neighbor
    id, so the output is schedule- and engine-independent."""
    if centroids is None:
        cent = kmeans_codebook(ds, n_centroids, vec_col=vec_col)
    else:
        cent = _normalize(np.asarray(centroids, dtype=np.float64))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    sims_qc = q @ cent.T
    # stable per-query centroid ranking: sim DESC, centroid index ASC
    probes = np.argsort(-sims_qc, axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
    ref = ray.put((q, list(query_ids), cent, probes))

    def partial(batch: pa.Table) -> pa.Table:
        from ..core.vecops import ids_and_matrix

        qm, qid, cb, prb = ray.get(ref)
        ids, mat = ids_and_matrix(batch, id_col, vec_col)  # zero-copy flat child
        assign = (mat @ cb.T).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for c in range(qm.shape[0]):
            mask = np.isin(assign, prb[c]) & (ids != qid[c])
            if not mask.any():
                continue
            cand_ids, col = ids[mask], mat[mask] @ qm[c]
            idx = np.lexsort((cand_ids, -col))[:k]
            out_q.extend([qid[c]] * len(idx))
            out_n.extend(cand_ids[idx].tolist())
            out_s.extend(col[idx].tolist())
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64()),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(reduce_topk, batch_format="pandas")
