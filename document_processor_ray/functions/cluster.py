"""Distributed spherical k-means over an embedding column.

The missing companion to the dedup/ANN families (``functions/dedup.py``,
``functions/similarity.py``): corpus bucketing by embedding similarity —
domain/topic clustering for mixture balancing, cluster-based dedup sharding,
or IVF codebook training (``similarity.knn_cosine_ivf`` trains its own
per-query codebook; this is the standalone, resumable version of that step).

Scale shape (the part that matters at 100 TB):

- The dataset is materialized ONCE into the object store and every Lloyd
  iteration re-streams those blocks — no re-read of the source parquet per
  iteration, no driver-side copy of the vectors.
- Centroids are tiny (k x d floats) and are broadcast via ``ray.put`` each
  iteration; every batch probes them zero-copy.
- The update step never ships vectors: each batch emits LONG-FORM partials
  ``(cluster, dim, s)`` — k x d rows of float sums plus k count rows — and one
  small ``groupby(cluster, dim).sum`` reduces them; the driver only ever sees
  k x (d + 1) numbers per iteration.
- Assignment is a single argmax over a (batch x k) matmul on the zero-copy
  flat child buffer (``core/vecops.ids_and_matrix``).

Determinism: init = the embeddings of the k lowest ids (scale-safe partial
bottom-k selection), fixed iteration count, first-max (lowest cluster id) tie
break, float64 throughout. Empty clusters keep their previous centroid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from ..core.vecops import ids_and_matrix


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def lowest_id_vectors(ds: rd.Dataset, k: int, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> np.ndarray:
    """The k lowest-id vectors as a float64 (k, d) matrix, selected scale-safe:
    per-batch partial bottom-k, then sort+limit over the partials (the
    `_first_queries` pattern — the table never lands on the driver)."""

    def bottom(b: pa.Table) -> pa.Table:
        return b.take(pc.sort_indices(b[id_col])[:k])

    rows = (ds.map_batches(bottom, batch_format="pyarrow")
            .sort(id_col).limit(k).take_all())
    return np.array([r[vec_col] for r in rows], dtype=np.float64)


def assign(ds: rd.Dataset, centroids: np.ndarray, id_col: str = "vec_id",
           vec_col: str = "embedding", out_col: str = "cluster",
           labels: np.ndarray | None = None) -> rd.Dataset:
    """Nearest-centroid (cosine) assignment: one shuffle-free map_batches pass.
    ``labels[j]`` names cluster j in the output (defaults to 0..k-1). Ties
    resolve to the lowest cluster index (np.argmax first-max)."""
    cent = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))
    lab = np.arange(len(centroids), dtype=np.int64) if labels is None \
        else np.asarray(labels, dtype=np.int64)

    def f(b: pa.Table) -> pa.Table:
        c = ray.get(cent)
        ids, mat = ids_and_matrix(b, id_col, vec_col)
        a = np.argmax(mat @ c.T, axis=1) if len(ids) else np.zeros(0, np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         out_col: pa.array(lab[a])})

    return ds.map_batches(f, batch_format="pyarrow")


def kmeans_fit(ds: rd.Dataset, k: int, n_iter: int = 5,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> np.ndarray:
    """Lloyd's iterations (spherical): returns the final (k, d) unit-norm
    centroid matrix. ``ds`` is materialized once; each iteration is one
    streamed pass emitting long-form (cluster, dim, s) sum partials reduced by
    a bounded groupby — dim -1 carries the member count."""
    ds = ds.materialize()
    cent = _normalize(lowest_id_vectors(ds, k, id_col, vec_col))
    d = cent.shape[1]

    for _ in range(n_iter):
        ref = ray.put(cent)

        def partial(b: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            _, mat = ids_and_matrix(b, id_col, vec_col)
            if not len(mat):
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.float64())})
            a = np.argmax(mat @ c.T, axis=1)
            sums = np.zeros((k, d))
            np.add.at(sums, a, mat)
            counts = np.bincount(a, minlength=k).astype(np.float64)
            cl = np.repeat(np.arange(k, dtype=np.int64), d + 1)
            dim = np.tile(np.arange(-1, d, dtype=np.int64), k)
            s = np.concatenate([counts[:, None], sums], axis=1).ravel()
            return pa.table({"cluster": pa.array(cl), "dim": pa.array(dim),
                             "s": pa.array(s)})

        rows = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(["cluster", "dim"]).aggregate(Sum("s", alias_name="s"))
                .take_all())
        sums = np.zeros((k, d))
        counts = np.zeros(k)
        for r in rows:
            if r["dim"] < 0:
                counts[r["cluster"]] = r["s"]
            else:
                sums[r["cluster"], r["dim"]] = r["s"]
        nonempty = counts > 0
        mean = sums / np.maximum(counts, 1.0)[:, None]
        cent = np.where(nonempty[:, None], _normalize(mean), cent)
    return cent


def kmeans(ds: rd.Dataset, k: int, n_iter: int = 5, id_col: str = "vec_id",
           vec_col: str = "embedding") -> rd.Dataset:
    """Fit + final assignment: (id_col, cluster) with cluster in 0..k-1."""
    ds = ds.materialize()
    return assign(ds, kmeans_fit(ds, k, n_iter, id_col, vec_col),
                  id_col, vec_col)
