"""Partitioned-reduce helper: the scalable replacement for
``groupby(high_cardinality_key).map_groups(fn)``.

Ray's ``map_groups`` pays per-group scheduling/Python overhead — catastrophic for
millions of tiny groups (LSH buckets, content hashes). Instead: bucket keys into
``n_parts`` coarse partitions by a stable hash, shuffle once on the small int
partition key, and run a vectorized pandas reduction over *all* keys of a
partition inside one function call. Same exactness, O(n_parts) groups.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

PART_COL = "__part"


def _stable_part(batch: pa.Table, key_cols: list[str], n_parts: int) -> np.ndarray:
    """Vectorized process-independent partition ids: pandas' stable row hash
    (fixed-key siphash, cython) over the key columns — no per-row Python loop."""
    df = pd.DataFrame({c: batch[c].to_pandas() for c in key_cols})
    h = pd.util.hash_pandas_object(df, index=False).to_numpy()
    return (h % np.uint64(n_parts)).astype(np.int32)


def grouped_reduce(ds: rd.Dataset, key_cols: list[str], fn, n_parts: int = 64,
                   batch_format: str = "pandas") -> rd.Dataset:
    """``fn`` receives one partition (many keys) as a DataFrame and must perform
    its own per-key reduction (e.g. ``df.groupby(keys).agg``). Keys are fully
    contained in exactly one partition."""

    def add_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(PART_COL, pa.array([], pa.int32()))
        return b.append_column(
            PART_COL, pa.array(_stable_part(b, key_cols, n_parts)))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        out = fn(g.drop(columns=[PART_COL]))
        return out

    return ds.map_batches(add_part, batch_format="pyarrow").groupby(PART_COL).map_groups(
        run, batch_format=batch_format
    )
