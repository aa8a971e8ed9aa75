"""Analytic (SQL window-function) operators: row_number / lag / running sum
over ``PARTITION BY key ORDER BY cols`` semantics, Ray-Data-first.

Reference parity note: the reference engine has no relational surface; these
operators come from the LLM-pipeline brief (windowed analytics over event /
order streams). Semantics mirror ANSI window functions, checked against DuckDB
``ROW_NUMBER() / LAG() / SUM() OVER`` by the driver gate.

Scale design (the part that matters at 100 TB):
- ONE coarse shuffle: the partition key is hashed into ``n_parts`` buckets via
  ``core.groupops.grouped_reduce`` — the exchange carries a small int key, and
  millions of tiny window partitions never become millions of Ray groups.
- Inside a bucket, ALL partitions are ordered at once with a single
  ``np.lexsort`` (partition key = primary key, order columns after), then every
  window function is computed segment-vectorized: boundaries from one shifted
  comparison, row numbers / lags / cumulative sums from ``np.maximum.accumulate``
  and ``np.cumsum`` — no per-group Python, no per-row loop.
- Skew caveat: one window partition lands in one bucket, so a single
  pathological key (one user with 10% of all events) bounds that bucket's size;
  salt the partition key upstream if a window key is known-hot (same caveat as
  every PARTITION BY in any engine).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..core.groupops import grouped_reduce


def _sort_segments(t: pa.Table, part_col: str, order_cols: list[str]):
    """Sort a many-partition bucket by (part_col, *order_cols) in ONE lexsort
    and return (sorted_table, first_of_segment_mask, segment_start_index).

    ``seg_start[i]`` is the row index (in the sorted table) where row i's
    window partition begins — the anchor every window function derives from.
    """
    cols = [part_col] + order_cols
    keys = [t[c].to_numpy(zero_copy_only=False) for c in cols]
    # np.lexsort sorts by the LAST key first -> reverse so part_col is primary
    order = np.lexsort(keys[::-1])
    st = t.take(pa.array(order))
    p = st[part_col].to_numpy(zero_copy_only=False)
    n = len(p)
    first = np.empty(n, dtype=bool)
    if n:
        first[0] = True
        first[1:] = p[1:] != p[:-1]
    idx = np.arange(n, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(first, idx, 0))
    return st, first, seg_start


def row_number(first: np.ndarray, seg_start: np.ndarray) -> np.ndarray:
    """1-based ROW_NUMBER() within each segment (int64)."""
    return np.arange(len(first), dtype=np.int64) - seg_start + 1


def lag(values: np.ndarray, first: np.ndarray, fill) -> np.ndarray:
    """LAG(values, 1) within each segment; segment-first rows get ``fill``."""
    prev = np.empty_like(values)
    if len(values):
        prev[1:] = values[:-1]
        prev[0] = fill
    return np.where(first, fill, prev)


def running_sum(values: np.ndarray, seg_start: np.ndarray) -> np.ndarray:
    """SUM(values) OVER (... ROWS UNBOUNDED PRECEDING) within each segment:
    global cumsum re-based at each segment start (vectorized, no loop)."""
    cs = np.cumsum(values, dtype=np.int64)
    return cs - cs[seg_start] + values[seg_start]


def peer_first_mask(st: pa.Table, first: np.ndarray,
                    order_cols: list[str]) -> np.ndarray:
    """First-row mask of each PEER group (segment first, or any ORDER BY
    column changed) — ANSI windows treat ORDER BY ties as one frame unit."""
    fp = first.copy()
    for c in order_cols:
        v = st[c].to_numpy(zero_copy_only=False)
        if len(v):
            fp[1:] |= v[1:] != v[:-1]
    return fp


def peer_first_mask_arrays(arrays: list[np.ndarray],
                           first: np.ndarray) -> np.ndarray:
    """peer_first_mask over computed ORDER BY expressions (plain arrays)
    instead of table columns."""
    fp = first.copy()
    for v in arrays:
        if len(v):
            fp[1:] |= v[1:] != v[:-1]
    return fp


def running_sum_range(values: np.ndarray, seg_start: np.ndarray,
                      first_peer: np.ndarray) -> np.ndarray:
    """SUM(values) OVER (PARTITION ... ORDER BY ...) with the ANSI-default
    RANGE frame: every row of a peer group (ORDER BY ties) gets the cumulative
    sum through the END of its peer group. Vectorized: within-partition ROWS
    cumsum, then each row takes the cumsum at its peer group's last row."""
    n = len(values)
    if n == 0:
        return values.astype(np.int64)
    rows_cum = running_sum(values, seg_start)
    peer_id = np.cumsum(first_peer) - 1
    last_of_peer = np.append(first_peer[1:], True)
    return rows_cum[np.flatnonzero(last_of_peer)][peer_id]


def seg_length(first: np.ndarray) -> np.ndarray:
    """Per-row length of the row's window partition (int64)."""
    n = len(first)
    if n == 0:
        return np.zeros(0, np.int64)
    starts = np.flatnonzero(first)
    lengths = np.diff(np.append(starts, n))
    return lengths[np.cumsum(first) - 1]


def ntile(n_tiles: int, first: np.ndarray,
          seg_start: np.ndarray) -> np.ndarray:
    """1-based NTILE(n): ANSI semantics — the first ``cnt % n`` tiles get
    ``cnt // n + 1`` rows, the rest ``cnt // n`` (vectorized per row from the
    0-based row number and the partition length)."""
    rn0 = np.arange(len(first), dtype=np.int64) - seg_start
    cnt = seg_length(first)
    q, r = cnt // n_tiles, cnt % n_tiles
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
    return np.where(rn0 < big, rn0 // np.maximum(q + 1, 1),
                    r + (rn0 - big) // np.maximum(q, 1)) + 1


def dense_rank(first_peer: np.ndarray, seg_start: np.ndarray) -> np.ndarray:
    """1-based DENSE_RANK(): cumulative peer-group count re-based at each
    partition start (``first_peer`` from ``peer_first_mask``)."""
    c = np.cumsum(first_peer)
    return (c - c[seg_start] + 1).astype(np.int64)


def rank(first_peer: np.ndarray, seg_start: np.ndarray) -> np.ndarray:
    """1-based RANK() (gaps on ties): every row takes the row number of its
    peer group's FIRST row — the peer-start index re-based at the partition
    start, fully vectorized."""
    n = len(first_peer)
    idx = np.arange(n, dtype=np.int64)
    peer_start = np.maximum.accumulate(np.where(first_peer, idx, 0))
    return peer_start - seg_start + 1


def percent_rank(first_peer: np.ndarray, first: np.ndarray,
                 seg_start: np.ndarray) -> np.ndarray:
    """PERCENT_RANK() = (rank - 1) / (partition rows - 1), 0.0 for 1-row
    partitions (ANSI). Exact IEEE division of two small int64s — bit-identical
    to any engine computing the same expression, so hash-checkable."""
    r = rank(first_peer, seg_start)
    cnt = seg_length(first)
    return np.where(cnt > 1, (r - 1) / np.maximum(cnt - 1, 1), 0.0)


def cume_dist(first_peer: np.ndarray, first: np.ndarray,
              seg_start: np.ndarray) -> np.ndarray:
    """CUME_DIST() = (rows up through the END of the row's peer group) /
    (partition rows): peer-group last-row index via the shifted peer mask,
    same single-pass shape as ``running_sum_range``."""
    n = len(first_peer)
    if n == 0:
        return np.zeros(0, np.float64)
    idx = np.arange(n, dtype=np.int64)
    peer_id = np.cumsum(first_peer) - 1
    last_of_peer = np.append(first_peer[1:], True)
    peer_end = idx[np.flatnonzero(last_of_peer)][peer_id]
    return (peer_end - seg_start + 1) / seg_length(first)


def windowed(ds: rd.Dataset, part_col: str, order_cols: list[str], make_cols,
             n_parts: int = 64) -> rd.Dataset:
    """Append window-function columns to ``ds``.

    ``make_cols(sorted_tbl, first_mask, seg_start) -> dict[str, pa.Array]`` is
    called once per coarse bucket (many window partitions at a time) and must
    be fully vectorized; its outputs are appended to the sorted bucket.
    """

    def bucket(t: pa.Table) -> pa.Table:
        if part_col not in t.column_names:
            return t  # schema-less empty block: nothing to sort or type
        # NOTE: empty-but-typed groups flow through the normal path so they
        # still get every make_cols output column (zero-length, typed) — an
        # empty group with a DIFFERENT schema than its siblings triggers Ray's
        # 'RefBundle with a different schema' hazard downstream
        st, first, seg_start = _sort_segments(t, part_col, order_cols)
        for name, arr in make_cols(st, first, seg_start).items():
            st = st.append_column(name, arr)
        return st

    return grouped_reduce(ds, [part_col], bucket, n_parts=n_parts,
                          batch_format="pyarrow")
