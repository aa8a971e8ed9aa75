"""Feature hashing (the "hashing trick", Weinberger et al. 2009,
arXiv 0902.2206): fixed-dimension signed bag-of-words vectors from raw text
with NO vocabulary — bucket = token_hash % dim, sign = parity bit of the hash.

This is the featurizer that precedes kNN / k-means / dedup when no learned
embeddings exist: stateless, shuffle-free, vocabulary-free (nothing to
broadcast or fit), so at 100 TB it is a pure ``map_batches`` pass whose output
feeds ``similarity.knn_cosine`` / ``cluster.kmeans`` / ``semdedup_pairs``
unchanged (they ingest any FixedSizeList/list float column zero-copy).

Vectorized: one Arrow tokenize + dictionary-encode per batch (each UNIQUE
token hashed once, cross-batch cache — ``dedup._flat_token_hashes``), then a
single ``np.add.at`` scatter over (doc row, bucket).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from .dedup import _flat_token_hashes


class HashFeaturizer:
    """Actor-pool stage: ``(id_col passthrough, vec: FixedSizeList<float32>)``.
    The token-hash cache lives per actor (built lazily, shared across
    batches)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 dim: int = 64, out_col: str = "vec", hasher: str = "blake2b"):
        self.id_col, self.text_col = id_col, text_col
        self.dim, self.out_col = dim, out_col
        self.hasher = hasher  # "md5" = DuckDB md5_number_lower-compatible
        self._cache: dict[str, int] = {}

    def __call__(self, b: pa.Table) -> pa.Table:
        th, counts = _flat_token_hashes(b[self.text_col], self._cache,
                                        hasher=self.hasher)
        n = len(counts)
        rows = np.repeat(np.arange(n, dtype=np.int64), counts)
        bucket = (th % np.uint64(self.dim)).astype(np.int64)
        sign = np.where((th >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
        mat = np.zeros((n, self.dim), dtype=np.float64)
        np.add.at(mat, (rows, bucket), sign)
        flat = mat.astype(np.float32).reshape(-1)
        vec = pa.FixedSizeListArray.from_arrays(pa.array(flat), self.dim)
        return pa.table({self.id_col: b[self.id_col], self.out_col: vec})


def hash_features(ds: rd.Dataset, id_col: str = "doc_id",
                  text_col: str = "text", dim: int = 64,
                  hasher: str = "blake2b",
                  concurrency: int | tuple[int, int] = (1, 4)) -> rd.Dataset:
    return ds.map_batches(HashFeaturizer, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs={"id_col": id_col,
                                                 "text_col": text_col,
                                                 "dim": dim,
                                                 "hasher": hasher})
