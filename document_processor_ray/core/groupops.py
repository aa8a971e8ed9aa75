"""Partitioned-reduce helper: the scalable replacement for
``groupby(high_cardinality_key).map_groups(fn)``.

Ray's ``map_groups`` pays per-group scheduling/Python overhead — catastrophic for
millions of tiny groups (LSH buckets, content hashes). Instead: bucket keys into
``n_parts`` coarse partitions by a stable hash, shuffle once on the small int
partition key, and run a vectorized pandas reduction over *all* keys of a
partition inside one function call. Same exactness, O(n_parts) groups.
"""

from __future__ import annotations

import zlib

import pandas as pd
import pyarrow as pa

import ray.data as rd

PART_COL = "__part"


def _stable_part(vals: list, n_parts: int) -> list[int]:
    return [zlib.crc32(str(v).encode()) % n_parts for v in vals]


def grouped_reduce(ds: rd.Dataset, key_cols: list[str], fn, n_parts: int = 64,
                   batch_format: str = "pandas") -> rd.Dataset:
    """``fn`` receives one partition (many keys) as a DataFrame and must perform
    its own per-key reduction (e.g. ``df.groupby(keys).agg``). Keys are fully
    contained in exactly one partition."""

    def add_part(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column(PART_COL, pa.array([], pa.int32()))
        key = b[key_cols[0]].to_pylist()
        if len(key_cols) > 1:
            for c in key_cols[1:]:
                key = [f"{k}\x1f{v}" for k, v in zip(key, b[c].to_pylist())]
        return b.append_column(PART_COL, pa.array(_stable_part(key, n_parts), pa.int32()))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        out = fn(g.drop(columns=[PART_COL]))
        return out

    return ds.map_batches(add_part, batch_format="pyarrow").groupby(PART_COL).map_groups(
        run, batch_format=batch_format
    )
