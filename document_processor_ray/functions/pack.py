"""Sequence packing: concat-and-split assignment of documents to fixed-size
training windows (GPT-style packing — every token stream position belongs to
exactly one pack of ``budget`` tokens; documents may straddle a boundary).

The core primitive is a GLOBAL WEIGHTED PREFIX SUM in id order — the weighted
generalization of zipWithIndex (``functions/shuffle.global_positions``): each
row's ``start`` = sum of weights of all rows with a smaller id. A distributed
sort alone cannot produce it; the scale shape here is

  pass -1: materialize the (id, weight) projection once (16 B/row) so the
          passes below never re-execute the upstream lineage (the tokenize);
  pass 0: one Min/Max aggregate over the id column (bounds for range buckets)
          — a metadata-cheap scan of the materialized projection;
  pass 1: per-batch (bucket, weight-sum) partials -> tiny distributed sum
          (<= N_BUCKETS rows) -> driver prefix-sum = bucket offsets,
          broadcast once via ray.put;
  pass 2: one coarse co-partition on bucket, local sort by id per bucket,
          start = bucket_offset + local exclusive cumsum.

Only (id, weight) ever moves — the text/payload columns stay where they are;
downstream join by id. Buckets are equal RANGES of the id domain, so balance
assumes roughly uniform ids (dense integer doc ids are the common case); a
skewed id distribution degrades balance, never correctness.

SQL mirror (the cross-engine contract)::

    sum(w) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
                 AND 1 PRECEDING)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data.aggregate import Max, Min

from ..core.groupops import grouped_reduce

N_BUCKETS = 4096


def global_prefix_sum(ds: rd.Dataset, id_col: str, weight_col: str,
                      n_parts: int = 64) -> rd.Dataset:
    """(id, weight, start): start = exclusive prefix sum of ``weight_col`` in
    ascending ``id_col`` order. Ids must be unique integers; weights
    non-negative int64."""
    # Materialize the 2-column projection ONCE: the three passes below
    # (bounds, histogram, rank) would otherwise each re-execute the full
    # upstream lineage — for sequence packing that is the corpus tokenize
    # pass, 3×. (id, weight) is 16 B/row (~0.1% of a text corpus), and the
    # object store spills it rather than holding heap.
    slim = ds.select_columns([id_col, weight_col]).materialize()

    # bounds WITHOUT an Aggregate operator (whose reduce is its own
    # exchange): one map emits a single (lo, hi) row per block, the driver
    # merges n_blocks tiny rows — O(corpus/block_size) driver rows, never data
    def mm(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"lo": pa.array([], pa.int64()),
                             "hi": pa.array([], pa.int64())})
        import pyarrow.compute as pc
        return pa.table({"lo": [pc.min(b[id_col]).as_py()],
                         "hi": [pc.max(b[id_col]).as_py()]})

    parts = slim.map_batches(mm, batch_format="pyarrow",
                             batch_size=None).take_all()
    lo = min(r["lo"] for r in parts)
    hi = max(r["hi"] for r in parts)
    span = max(hi - lo + 1, 1)

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return ((ids.astype(np.int64) - lo) * N_BUCKETS // span).astype(np.int32)

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return b.append_column("__bucket", pa.array(bucket_of(ids)))

    keyed = slim.map_batches(add_bucket, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        w = np.bincount(b["__bucket"].to_numpy(zero_copy_only=False),
                        weights=b[weight_col].to_numpy(zero_copy_only=False),
                        minlength=N_BUCKETS).astype(np.int64)
        nz = np.flatnonzero(w)
        return pa.table({"__bucket": pa.array(nz.astype(np.int32)),
                         "w": pa.array(w[nz], pa.int64())})

    totals = grouped_reduce(
        keyed.map_batches(partial, batch_format="pyarrow"),
        ["__bucket"],
        lambda df: df.groupby("__bucket", as_index=False)["w"].sum(),
        n_parts=16,
    ).take_all()
    sums = np.zeros(N_BUCKETS, dtype=np.int64)
    for r in totals:
        sums[r["__bucket"]] = r["w"]
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]])
    off_ref = ray.put(offsets)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        out = []
        for bkt, g in df.groupby("__bucket", sort=False):
            g = g.sort_values(id_col, kind="mergesort")
            w = g[weight_col].to_numpy().astype(np.int64)
            start = off[bkt] + np.concatenate([[0], np.cumsum(w)[:-1]])
            out.append(pd.DataFrame({id_col: g[id_col].to_numpy(),
                                     weight_col: w, "start": start}))
        if not out:
            return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                 weight_col: pd.Series([], dtype="int64"),
                                 "start": pd.Series([], dtype="int64")})
        return pd.concat(out, ignore_index=True)

    return grouped_reduce(keyed, ["__bucket"], rank, n_parts=n_parts)


def pack_assign(ds: rd.Dataset, id_col: str, weight_col: str,
                budget: int, n_parts: int = 64) -> rd.Dataset:
    """Concat-and-split packing: (id, n_toks, start_tok, end_tok, first_pack,
    last_pack) with pack k covering token positions [k*budget, (k+1)*budget).
    A zero-weight row gets first_pack == last_pack == start // budget."""
    pos = global_prefix_sum(ds, id_col, weight_col, n_parts=n_parts)

    def packs(b: pa.Table) -> pa.Table:
        start = b["start"].to_numpy(zero_copy_only=False)
        w = b[weight_col].to_numpy(zero_copy_only=False)
        end = start + w
        first = start // budget
        last = np.where(w > 0, (end - 1) // budget, first)
        return pa.table({id_col: b[id_col],
                         "n_toks": pa.array(w, pa.int64()),
                         "start_tok": pa.array(start, pa.int64()),
                         "end_tok": pa.array(end, pa.int64()),
                         "first_pack": pa.array(first, pa.int64()),
                         "last_pack": pa.array(last, pa.int64())})

    return pos.map_batches(packs, batch_format="pyarrow")
