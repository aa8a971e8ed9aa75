"""Windowed aggregates over an event stream table (events: event_id, ts, user_id,
event_type, value, props).

Ray Data is a batch engine with no event-time watermarks (ray_guide "Streaming-
shaped workloads"); windows are expressed as groupbys over window keys:

- tumbling: window_start = floor(epoch / size) — a plain groupby, SQL-checkable
  via date_trunc/epoch arithmetic.
- sliding: one input row contributes to size/step windows → flat-map style
  explode inside map_batches, then groupby.
- session: coarse-partitioned gap-split (``core.groupops.grouped_reduce``) —
  every key's events land in exactly one partition, sorted there, not globally.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Min


def add_tumbling_window(batch: pa.Table, size_s: int, ts_col: str = "ts") -> pa.Table:
    """Append window_start (epoch seconds, floored to the window) as int64.
    Integer arithmetic in numpy — pyarrow's divide is true division."""
    ts_us = pc.cast(batch[ts_col], pa.timestamp("us"))  # ns inputs (pandas) → us
    epoch_us = pc.cast(ts_us, pa.int64()).to_numpy(zero_copy_only=False)
    wstart = (epoch_us // (size_s * 1_000_000)) * size_s
    return batch.append_column("window_start", pa.array(wstart, pa.int64()))


def tumbling_counts(events: rd.Dataset, size_s: int = 3600,
                    key: str = "event_type") -> rd.Dataset:
    """(key, window_start) → n_events, min/max value. min/max are exact under any
    float summation order (unlike sums), keeping the oracle comparison bit-exact."""
    with_w = events.map_batches(
        lambda b: add_tumbling_window(b, size_s), batch_format="pyarrow"
    ).select_columns([key, "window_start", "value"])
    return with_w.groupby([key, "window_start"]).aggregate(
        Count(alias_name="n_events"),
        Min("value", alias_name="min_value"),
        Max("value", alias_name="max_value"),
    )


def sliding_counts(events: rd.Dataset, size_s: int, step_s: int,
                   key: str = "event_type") -> rd.Dataset:
    """Sliding windows: each event explodes into the ceil(size/step) candidate
    windows containing it; then one groupby. Output: (key, window_start,
    n_events). Fully vectorized explode (np.repeat/tile + containment mask +
    Arrow take — same pattern as dedup._explode_bands); the mask discards the
    extra candidate when size is not a multiple of step."""
    n_win = -(-size_s // step_s)  # ceil: an event belongs to up to this many windows

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        epoch_s = (
            pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
            .to_numpy(zero_copy_only=False) // 1_000_000
        )
        key_col = batch[key]
        if isinstance(key_col, pa.ChunkedArray):
            key_col = key_col.combine_chunks()
        base = (epoch_s // step_s) * step_s
        # candidate window j for event i starts at base[i] - j*step; the lower
        # containment bound (ev >= w) always holds since w <= base <= ev
        w = np.repeat(base, n_win) - np.tile(
            np.arange(n_win, dtype=np.int64) * step_s, n)
        mask = w + size_s > np.repeat(epoch_s, n_win)
        idx = np.repeat(np.arange(n), n_win)[mask]
        return pa.table({key: key_col.take(pa.array(idx)),
                         "window_start": pa.array(w[mask], pa.int64())})

    return (events.map_batches(explode, batch_format="pyarrow")
            .groupby([key, "window_start"]).aggregate(Count(alias_name="n_events")))


def session_counts(events: rd.Dataset, gap_s: int = 1800,
                   key: str = "user_id") -> rd.Dataset:
    """Per-key session count: sessions split where the sorted inter-event gap
    exceeds ``gap_s``. Output: (user_id, n_sessions, n_events).

    Scale path: user_id is high-cardinality, so this routes through
    ``core.groupops.grouped_reduce`` (coarse hash partitions, ONE shuffle, a
    vectorized sort+diff over all keys of a partition) rather than
    ``groupby(user_id).map_groups`` which pays per-group scheduling for
    millions of tiny groups."""
    from ..core.groupops import grouped_reduce

    def part_sessions(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({key: [], "n_sessions": [], "n_events": []})
        g = g.sort_values([key, "ts"], kind="mergesort")
        ts = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        new_key = (g[key] != g[key].shift()).to_numpy()
        gap = np.empty(len(g), dtype=bool)
        gap[0] = True
        gap[1:] = (ts[1:] - ts[:-1]) > gap_s * 1_000_000
        starts = new_key | gap  # first row of each key always starts a session
        out = (pd.DataFrame({key: g[key].values, "_s": starts})
               .groupby(key, sort=False)
               .agg(n_sessions=("_s", "sum"), n_events=("_s", "size"))
               .reset_index())
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return grouped_reduce(events.select_columns([key, "ts"]), [key], part_sessions)
