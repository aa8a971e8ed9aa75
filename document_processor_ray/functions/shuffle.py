"""Deterministic epoch shuffle with global position assignment (zipWithIndex).

Training pipelines need a different pseudo-random document order per epoch. A
true ``random_shuffle`` at 100 TB is an all-to-all exchange of the full
payload with non-deterministic placement; the scale answer is ORDER BY a
uniform hash of ``(id, epoch)`` — deterministic, reproducible across engines,
and the heavy columns never move (downstream consumers join/take by the
emitted position or read shard-by-shard).

Assigning the 0-based global position of each row in that order is the
classic zipWithIndex problem: a distributed sort alone does not yield global
ranks. Because the md5 sort key is UNIFORM, bucket boundaries are analytic —
the first 3 hex chars split the keyspace into 4096 equal ranges, so:

  pass 1: per-batch bucket histograms -> tiny distributed sum (4096 rows) ->
          driver prefix-sum = each bucket's global offset (broadcast once);
  pass 2: one coarse co-partition on bucket, local sort per bucket,
          pos = bucket_offset + local_rank.

No driver materialization of row data; both passes stream (keys are
recomputed in pass 2 rather than materializing an id->key projection — two
md5 evaluations per row beat holding ~50 B/row of the whole corpus in the
object store at 10^12 rows).

SQL mirror (the cross-engine determinism contract, same md5-hex trick as
``sampling.py``)::

    ROW_NUMBER() OVER (ORDER BY md5(CAST(id AS VARCHAR) || '|<epoch>'), id) - 1
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..core.groupops import grouped_reduce

N_BUCKETS = 4096  # first 3 hex chars of the md5 key — analytic equal ranges


def _epoch_keys(col: pa.ChunkedArray | pa.Array, epoch: int) -> list[str]:
    """md5 hex of ``str(id) + '|' + epoch`` per row (lowercase, matching
    DuckDB ``md5(CAST(id AS VARCHAR) || '|<epoch>')``). Integer/string ids
    only — same rationale as sampling._key_bytes."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if not (pa.types.is_integer(t) or pa.types.is_string(t)
            or pa.types.is_large_string(t)):
        raise TypeError(f"epoch shuffle id must be integer or string, got {t}")
    suffix = f"|{epoch}".encode()
    return [hashlib.md5(str(v).encode() + suffix).hexdigest()
            for v in col.to_pylist()]


def global_positions(ds: rd.Dataset, id_col: str = "doc_id", *, epoch: int = 0,
                     n_shards: int | None = None,
                     n_parts: int = 64) -> rd.Dataset:
    """(id, pos[, shard]): pos = 0-based rank of the row in the epoch's
    pseudo-random order (md5 of id salted by epoch, id as tiebreak); shard =
    pos % n_shards when requested. Deterministic across runs, partitionings
    and engines; ids must be unique."""

    def add_key(b: pa.Table) -> pa.Table:
        ids = b[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        keys = _epoch_keys(ids, epoch)
        bucket = np.array([int(k[:3], 16) for k in keys], dtype=np.int32)
        return pa.table({id_col: ids, "__key": pa.array(keys, pa.string()),
                         "__bucket": pa.array(bucket)})

    # materialize once: the histogram pass AND the rank pass both consume
    # `keyed`; without this the per-row md5 keying executes twice. The
    # materialized projection is (id, 32-hex key, bucket) ≈ 50 B/row.
    keyed = ds.select_columns([id_col]).map_batches(
        add_key, batch_format="pyarrow").materialize()

    # pass 1: bucket histogram — per-batch bincount partials, distributed sum
    # (≤ N_BUCKETS rows reach the driver, never row data)
    def partial_counts(b: pa.Table) -> pa.Table:
        c = np.bincount(b["__bucket"].to_numpy(zero_copy_only=False),
                        minlength=N_BUCKETS)
        nz = np.flatnonzero(c)
        return pa.table({"__bucket": pa.array(nz.astype(np.int32)),
                         "n": pa.array(c[nz], pa.int64())})

    totals = grouped_reduce(
        keyed.map_batches(partial_counts, batch_format="pyarrow"),
        ["__bucket"],
        lambda df: df.groupby("__bucket", as_index=False)["n"].sum(),
        n_parts=16,
    ).take_all()
    counts = np.zeros(N_BUCKETS, dtype=np.int64)
    for r in totals:
        counts[r["__bucket"]] = r["n"]
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    off_ref = ray.put(offsets)

    # pass 2: co-partition complete buckets, local sort, offset + local rank
    def rank(df: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(off_ref)
        out_id, out_pos = [], []
        for bkt, g in df.groupby("__bucket", sort=False):
            g = g.sort_values(["__key", id_col], kind="mergesort")
            out_id.append(g[id_col].to_numpy())
            out_pos.append(off[bkt] + np.arange(len(g), dtype=np.int64))
        ids = (np.concatenate(out_id) if out_id
               else np.array([], dtype=df[id_col].to_numpy().dtype))
        pos = np.concatenate(out_pos) if out_pos else np.array([], np.int64)
        res = pd.DataFrame({id_col: ids, "pos": pos})
        if n_shards:
            res["shard"] = res["pos"].to_numpy() % np.int64(n_shards)
        return res

    return grouped_reduce(keyed, ["__bucket"], rank, n_parts=n_parts)
