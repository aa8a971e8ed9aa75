"""Broadcast Bloom-filter semi-join — the 100 TB shuffle-avoidance pattern.

A semi-join (``fact WHERE key IN dim``) has three classic executions:

1. broadcast the exact key set (only if the dim side is small),
2. co-partition both sides and probe per partition (one all-to-all over the
   FULL fact table — the expensive default at scale),
3. **Bloom prefilter + exact verify**: build a compact bitmap over the dim
   keys once (one pass over the small side, a few MB regardless of key
   count), broadcast it via ``ray.put``, drop ~all non-matching fact rows
   with a vectorized bit probe inside ``map_batches`` — then run the exact
   co-partitioned semi-join ONLY over the survivors. The all-to-all exchange
   now carries ``|matches| + fp_rate * |non-matches|`` rows instead of the
   whole fact table; at selectivity 1% and fp 1% that is a ~50x shuffle-volume
   cut for a ~1 MB broadcast.

The Bloom probe alone is approximate (false positives); the verify phase makes
the OPERATOR exact — results are bit-identical to a plain semi-join, which is
what the SQL oracle checks.

Hashing is the Kirsch-Mitzenmacher double-hashing scheme (index_i = h1 + i*h2
mod n_bits) over pandas' stable fixed-key siphash — process-independent, the
same property ``core.groupops`` relies on — with a splitmix64 remix for the
second hash. All probes are vectorized uint64 numpy; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

from ..core.groupops import grouped_reduce


def _key_hashes(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable uint64 hash per key (pandas fixed-key siphash — identical in
    every process, so build and probe agree across the cluster)."""
    s = pd.Series(arr.to_pandas())
    return pd.util.hash_pandas_object(s, index=False).to_numpy()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants) — derives the
    second, independent hash for double hashing."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return (z ^ (z >> np.uint64(31))).astype(np.uint64)


def _bit_positions(h: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(h), n_hashes) bit indices via double hashing. ``h2 | 1`` keeps the
    stride odd so a power-of-two ``n_bits`` never degenerates to one index."""
    h1, h2 = h, _splitmix64(h) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) %
            np.uint64(n_bits)).astype(np.uint64)


def build_bloom(keys: rd.Dataset, key_col: str, n_bits: int = 1 << 20,
                n_hashes: int = 4) -> np.ndarray:
    """One pass over the key dataset → a ``n_bits/64``-word uint64 bitmap.
    Per-block partial bitmaps OR-merge associatively (Bloom filters are
    mergeable sketches), so the build is a tree reduce, never a shuffle:
    each block contributes one bitmap row, OR-ed down on the driver (bitmaps
    are a few hundred KB — #blocks x words is trivially driver-safe; at
    extreme block counts an intermediate OR level bounds it)."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    n_words = n_bits // 64

    def partial(b: pa.Table) -> pa.Table:
        words = np.zeros(n_words, dtype=np.uint64)
        if b.num_rows:
            pos = _bit_positions(_key_hashes(b[key_col]), n_bits,
                                 n_hashes).ravel()
            np.bitwise_or.at(words, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bm": pa.array([words.tobytes()], pa.large_binary())})

    parts = keys.map_batches(partial, batch_format="pyarrow",
                             batch_size=65536).take_all()
    out = np.zeros(n_words, dtype=np.uint64)
    for row in parts:
        out |= np.frombuffer(row["bm"], dtype=np.uint64)
    return out


def bloom_probe_mask(words: np.ndarray, arr, n_hashes: int = 4) -> np.ndarray:
    """Vectorized membership probe: bool mask, True = maybe-present (all
    ``n_hashes`` bits set), False = definitely absent."""
    n_bits = len(words) * 64
    if len(arr) == 0:
        return np.zeros(0, dtype=bool)
    pos = _bit_positions(_key_hashes(arr), n_bits, n_hashes)
    bits = (words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=1)


def bloom_semi_join(fact: rd.Dataset, key_col: str, keys: rd.Dataset,
                    keys_col: str, n_bits: int = 1 << 20, n_hashes: int = 4,
                    n_parts: int = 64) -> rd.Dataset:
    """Exact distributed semi-join (rows of ``fact`` whose ``key_col`` appears
    in ``keys``), executed as Bloom prefilter + co-partitioned verify.

    The verify phase reuses the tagged-union co-partition probe
    (``grouped_reduce``): survivors and the key set shuffle ONCE on the key —
    but by then the fact side is already down to matches + false positives,
    which is the entire point at 100 TB. ``keys`` need not be unique."""
    words = build_bloom(keys, keys_col, n_bits=n_bits, n_hashes=n_hashes)
    ref = ray.put(words)

    def prefilter(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return b.filter(pa.array(
            bloom_probe_mask(ray.get(ref), b[key_col], n_hashes=n_hashes)))

    survivors = fact.map_batches(prefilter, batch_format="pyarrow")

    names = list(fact.schema().names)
    types = dict(zip(fact.schema().names, fact.schema().types))
    SRC, JKEY = "__src", "__jkey"

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in names}
        cols[JKEY] = pc.cast(b[key_col], pa.string())
        cols[SRC] = pa.array(["l"] * b.num_rows)
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {c: pa.nulls(b.num_rows, types[c]) for c in names}
        cols[JKEY] = pc.cast(b[keys_col], pa.string())
        cols[SRC] = pa.array(["r"] * b.num_rows)
        return pa.table(cols)

    tagged = survivors.map_batches(tag_left, batch_format="pyarrow").union(
        keys.map_batches(tag_right, batch_format="pyarrow"))

    def part_semi(t: pa.Table) -> pa.Table:
        src = t[SRC]
        left = t.filter(pc.equal(src, "l"))
        right = t.filter(pc.equal(src, "r"))
        keep = pc.is_in(left[JKEY], value_set=right[JKEY].combine_chunks())
        return pa.table({c: left[c] for c in names}).filter(keep)

    return grouped_reduce(tagged, [JKEY], part_semi, n_parts=n_parts,
                          batch_format="pyarrow")
