"""Zero-copy ingestion of embedding columns (``list<float>``) from Arrow blocks.

The list column's flat child values are already a contiguous buffer in the
object store; ``flatten().to_numpy()`` + ``reshape`` reads it without the
per-row ``to_pylist`` boxing that costs ~10x on wide vectors. Assumes
fixed-length vectors (enforced by the reshape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def ids_and_matrix(tbl: pa.Table, id_col: str, vec_col: str,
                   normalize: bool = True,
                   dtype=np.float64) -> tuple[np.ndarray, np.ndarray]:
    """(ids, (n, d) matrix) from one Arrow block — vectorized via the list
    column's flat child values; rows L2-normalized when ``normalize``."""
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    if len(ids) == 0:
        return ids, np.zeros((0, 1), dtype=dtype)
    arr = tbl[vec_col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    mat = flat.reshape(len(ids), -1)
    if normalize:
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return ids, mat
