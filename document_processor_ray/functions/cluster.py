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


def _quantize(mat: np.ndarray, scale: int) -> np.ndarray:
    """Half-up integer quantization, identical to SQL
    ``floor(CAST(x AS DOUBLE) * scale + 0.5)`` (float32 -> float64 is exact,
    so both engines quantize the same bits)."""
    return np.floor(mat * scale + 0.5).astype(np.int64)


def kmeans_fit_int(ds: rd.Dataset, k: int = 8, n_iter: int = 4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   scale: int = 1000) -> np.ndarray:
    """INTEGER-EXACT euclidean Lloyd fit — the determinism-first variant of
    ``kmeans_fit``: embeddings quantize half-up to ``scale`` units, every
    distance/argmin/centroid-update is integer arithmetic, and new centroids
    floor-divide their member sums — so the ITERATED fixpoint (not just one
    assignment step) is bit-reproducible across engines, schedules, and
    machines, and a DuckDB mirror unrolling the same iterations hash-matches
    (``SQL_KMEANS_ITER_ASSIGN``). Same scale shape as ``kmeans_fit``: one
    materialization, per-iteration streamed long-form (cluster, dim, sum)
    partials, bounded groupby, k x (d+1) numbers to the driver. Exactness
    bound: per-(cluster, dim) sums stay exact through the float64 aggregate
    while |sum| < 2^53 — at scale=1000 that is ~3e13 member rows per cluster.
    Empty clusters keep their previous centroid. Returns the (k, d) int64
    centroid matrix in quantized units."""
    ds = ds.materialize()
    cent = _quantize(
        np.asarray(lowest_id_vectors(ds, k, id_col, vec_col), np.float64),
        scale)
    d = cent.shape[1]

    for _ in range(n_iter):
        ref = ray.put(cent)

        def partial(b: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            _, mat = ids_and_matrix(b, id_col, vec_col, normalize=False)
            if not len(mat):
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64())})
            q = _quantize(mat, scale)
            d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)               # ties -> lowest cluster id
            sums = np.zeros((k, d), np.int64)
            np.add.at(sums, a, q)
            counts = np.bincount(a, minlength=k).astype(np.int64)
            cl = np.repeat(np.arange(k, dtype=np.int64), d + 1)
            dim = np.tile(np.arange(-1, d, dtype=np.int64), k)
            s = np.concatenate([counts[:, None], sums], axis=1).ravel()
            return pa.table({"cluster": pa.array(cl), "dim": pa.array(dim),
                             "s": pa.array(s)})

        rows = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby(["cluster", "dim"]).aggregate(Sum("s", alias_name="s"))
                .take_all())
        sums = np.zeros((k, d), np.int64)
        counts = np.zeros(k, np.int64)
        for r in rows:
            if r["dim"] < 0:
                counts[r["cluster"]] = int(r["s"])
            else:
                sums[r["cluster"], r["dim"]] = int(r["s"])
        nonempty = counts > 0
        upd = np.floor_divide(sums, np.maximum(counts, 1)[:, None])
        cent = np.where(nonempty[:, None], upd, cent)
    return cent


def kmeans_int_assign(ds: rd.Dataset, k: int = 8, n_iter: int = 4,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      scale: int = 1000) -> rd.Dataset:
    """Fit (integer-exact, ``kmeans_fit_int``) + final assignment:
    ``n_iter`` assignment passes with ``n_iter - 1`` centroid updates between
    them (Lloyd's canonical unroll, matching SQL_KMEANS_ITER_ASSIGN's layer
    count). One extra shuffle-free pass for the output assignment."""
    ds = ds.materialize()
    cent = ray.put(kmeans_fit_int(ds, k, max(n_iter - 1, 0), id_col, vec_col,
                                  scale))

    def f(b: pa.Table) -> pa.Table:
        c = ray.get(cent)
        ids, mat = ids_and_matrix(b, id_col, vec_col, normalize=False)
        if not len(ids):
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64())})
        q = _quantize(mat, scale)
        d2 = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "cluster": pa.array(d2.argmin(axis=1))})

    return ds.map_batches(f, batch_format="pyarrow")


def semdedup_pairs(ds: rd.Dataset, k: int = 10, threshold: float = 0.4,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_parts: int = 32, block: int = 4096,
                   centroids: np.ndarray | None = None) -> rd.Dataset:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    arXiv 2303.09540): pairwise cosine is computed only WITHIN each k-means
    cluster — the O(n²/k) scale path that replaces the all-pairs O(n²) of
    ``dedup.embedding_dup_pairs`` once a codebook exists.

    Shape at 100 TB: one shuffle-free assignment pass (centroids broadcast via
    ``ray.put``), then ONE co-partition exchange on the cluster id
    (``grouped_reduce``); inside a reducer the per-cluster compare runs
    blockwise ((block x block) tiles, only the upper triangle scored) so a hot
    cluster bounds memory, not correctness. Emits ``(a, b, cluster)`` with
    ``a < b`` and cosine >= threshold. Caveat (documented, same as the LSH
    families): a single giant cluster still costs O(|c|²/2) work — raise k or
    pre-split hot clusters upstream when the codebook is known-skewed.

    ``centroids=None`` uses the deterministic lowest-id seed codebook, making
    the whole operator SQL-mirrorable (see ``SQL_SEMDEDUP_PAIRS``).

    Cross-engine boundary sensitivity (documented, accepted): BOTH the pair
    inclusion test (``sim >= threshold``) and the argmax cluster tie-break
    compare raw float64 cosines, so a vector whose similarity lands within a
    few ULPs of the threshold (or equidistant from two centroids) can flip
    membership between this engine and DuckDB's ``list_cosine_similarity``
    if their summation orders differ. The gate corpora hash-check; for a
    corpus with adversarially near-boundary values, nano-quantize the cosine
    (the LM/bm25 ``round(sim * 1e9)`` pattern) on both engines before the
    compare, at the cost of a documented deviation from the paper's exact
    threshold semantics."""
    from ..core.groupops import grouped_reduce

    if centroids is None:
        centroids = lowest_id_vectors(ds, k, id_col, vec_col)
    cent = ray.put(_normalize(np.asarray(centroids, dtype=np.float64)))

    def tag(b: pa.Table) -> pa.Table:
        c = ray.get(cent)
        ids, mat = ids_and_matrix(b, id_col, vec_col)
        a = np.argmax(mat @ c.T, axis=1) if len(ids) else np.zeros(0, np.int64)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "cluster": pa.array(a, pa.int64()),
                         vec_col: b[vec_col].combine_chunks()})

    def verify(t: pa.Table) -> pa.Table:
        ids_all, mat_all = ids_and_matrix(t, id_col, vec_col)  # L2-normalized
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        out_a, out_b, out_c = [], [], []
        order = np.argsort(cl, kind="stable")
        bounds = np.flatnonzero(np.diff(cl[order], prepend=-1, append=-1))
        for s, e in zip(bounds[:-1], bounds[1:]):
            sel = order[s:e]
            ids, mat = ids_all[sel], mat_all[sel]
            # lowest id first inside the cluster so emitted pairs are a < b
            o = np.argsort(ids)
            ids, mat = ids[o], mat[o]
            for i0 in range(0, len(ids), block):
                ai = mat[i0 : i0 + block]
                for j0 in range(i0, len(ids), block):
                    sim = ai @ mat[j0 : j0 + block].T
                    ii, jj = np.nonzero(sim >= threshold)
                    if i0 == j0:  # strict upper triangle of the diagonal tile
                        keep = jj > ii
                        ii, jj = ii[keep], jj[keep]
                    out_a.extend(ids[i0 + ii].tolist())
                    out_b.extend(ids[j0 + jj].tolist())
                    out_c.extend([int(cl[sel[0]])] * len(ii))
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "cluster": pa.array(out_c, pa.int64())})

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    return grouped_reduce(tagged, ["cluster"], verify, n_parts=n_parts,
                          batch_format="pyarrow")
