"""Funnel (ordered event-sequence) analysis over an event stream.

Per user: how far through an ordered step sequence (e.g. view → click →
purchase) did they get, where step k+1 must occur STRICTLY AFTER the earliest
valid completion of step k (the greedy-minimal matching — ``t1 = min ts of
step1``, ``t2 = min ts of step2 with ts > t1``, …). This is the standard
product-analytics funnel and the same shape as sessionized conversion
attribution.

Scale: ONE coarse co-partition on the user key (``grouped_reduce``) puts every
user's events in one reducer; inside the reducer ALL users are processed at
once — per-step masked ``np.minimum.at`` over dense local user ids, no
per-user Python. Skew: one user's events bound one bucket (same caveat as any
PARTITION BY); the step loop is O(len(steps)) passes over the bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..core.groupops import grouped_reduce

_NEG_INF = np.int64(-(2**62))


def funnel_stages(ds: rd.Dataset, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type",
                  n_parts: int = 64) -> rd.Dataset:
    """``(user_col, stage)`` for every user present in ``ds``: stage = number
    of funnel steps completed in order (0..len(steps))."""
    steps = list(steps)

    def bucket(t: pa.Table) -> pa.Table:
        u = t[user_col].to_numpy(zero_copy_only=False)
        ts_col_arr = pc.cast(t[ts_col], pa.int64())
        if isinstance(ts_col_arr, pa.ChunkedArray):
            ts_col_arr = ts_col_arr.combine_chunks()
        ts = ts_col_arr.to_numpy(zero_copy_only=False)
        et = t[type_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(u, return_inverse=True)
        if not len(uniq):
            return pa.table({user_col: pa.array([], t[user_col].type),
                             "stage": pa.array([], pa.int64())})
        INF = np.iinfo(np.int64).max
        prev = np.full(len(uniq), _NEG_INF, np.int64)
        stage = np.zeros(len(uniq), np.int64)
        alive = np.ones(len(uniq), bool)
        for s in steps:
            cand = (et == s) & (ts > prev[inv]) & alive[inv]
            cur = np.full(len(uniq), INF, np.int64)
            np.minimum.at(cur, inv[cand], ts[cand])
            hit = cur < INF
            alive &= hit
            stage += alive.astype(np.int64)
            prev = np.where(alive, cur, prev)
        return pa.table({user_col: pa.array(uniq, t[user_col].type),
                         "stage": pa.array(stage)})

    return grouped_reduce(ds, [user_col], bucket, n_parts=n_parts,
                          batch_format="pyarrow")
