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

    if batch_format == "pyarrow":
        def run(g: pa.Table) -> pa.Table:
            return fn(g.drop_columns([PART_COL]))
    else:
        def run(g: pd.DataFrame) -> pd.DataFrame:
            return fn(g.drop(columns=[PART_COL]))

    return ds.map_batches(add_part, batch_format="pyarrow").groupby(PART_COL).map_groups(
        run, batch_format=batch_format
    )


def lookup_join(ds: rd.Dataset, kv: rd.Dataset, key_col: str, kv_key: str,
                kv_val: str, out_col: str | None = None,
                n_parts: int = 64, schema: pa.Schema | None = None,
                kv_schema: pa.Schema | None = None,
                how: str = "inner") -> rd.Dataset:
    """Distributed lookup join: append ``kv``'s value column to every row
    of ``ds`` whose key matches. ``how="inner"`` (default) drops rows without
    a match; ``how="left"`` keeps them with a NULL value (LEFT OUTER — fill
    downstream with ``pc.fill_null``). Both sides
    co-partition on the key via ONE coarse shuffle (tagged union); the
    per-partition probe is Arrow-native ``pc.index_in`` + ``take``, so payload
    columns of any type (binary, lists) survive without a pandas round-trip.
    ``kv`` keys must be unique (first match wins otherwise).

    Pass ``schema``/``kv_schema`` when known: probing them from the Dataset
    executes enough of the upstream plan to produce one block, which for an
    input with an all-to-all upstream (e.g. the output of a previous
    lookup_join) means running that whole shuffle a second time."""
    import pyarrow.compute as pc

    out_col = out_col or kv_val
    sch = schema if schema is not None else ds.map_batches(
        lambda t: t, batch_format="pyarrow").schema()
    names = list(sch.names)
    types = dict(zip(sch.names, sch.types))
    kv_sch = kv_schema if kv_schema is not None else kv.map_batches(
        lambda t: t, batch_format="pyarrow").schema()
    val_type = dict(zip(kv_sch.names, kv_sch.types))[kv_val]
    SRC, JKEY, VAL = "__src", "__jkey", "__val"

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in names}
        cols[JKEY] = pc.cast(b[key_col], pa.string())
        cols[VAL] = pa.nulls(b.num_rows, val_type)
        cols[SRC] = pa.array(["l"] * len(b))
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {c: pa.nulls(b.num_rows, types[c]) for c in names}
        cols[JKEY] = pc.cast(b[kv_key], pa.string())
        cols[VAL] = b[kv_val]
        cols[SRC] = pa.array(["r"] * len(b))
        return pa.table(cols)

    tagged = ds.map_batches(tag_left, batch_format="pyarrow").union(
        kv.map_batches(tag_right, batch_format="pyarrow"))

    def part_probe(t: pa.Table) -> pa.Table:
        src = t[SRC]
        left = t.filter(pc.equal(src, "l"))
        right = t.filter(pc.equal(src, "r"))
        idx = pc.index_in(left[JKEY], value_set=right[JKEY].combine_chunks())
        vals = right[VAL].combine_chunks().take(idx)
        out = pa.table({c: left[c] for c in names}).append_column(out_col, vals)
        if how == "left":
            return out
        return out.filter(pc.is_valid(idx))

    return grouped_reduce(tagged, [JKEY], part_probe, n_parts=n_parts,
                          batch_format="pyarrow")


def anti_join_ids(ds: rd.Dataset, ids: rd.Dataset, id_col: str,
                  ids_col: str = "id", n_parts: int = 64) -> rd.Dataset:
    """Distributed anti-join: rows of ``ds`` whose ``id_col`` does NOT appear in
    ``ids`` — the scale path when the exclusion set is too large to broadcast.
    Both sides co-partition on the key (tagged union + one coarse shuffle); the
    per-partition filter is Arrow-native (``pc.is_in``), so arbitrary payload
    column types (lists, binaries) survive untouched — no pandas round-trip."""
    import pyarrow.compute as pc

    sch = ds.map_batches(lambda t: t, batch_format="pyarrow").schema()
    names = list(sch.names)
    types = dict(zip(sch.names, sch.types))
    SRC, JKEY = "__src", "__jkey"

    def tag_left(b: pa.Table) -> pa.Table:
        cols = {c: b[c] for c in names}
        cols[JKEY] = pc.cast(b[id_col], pa.string())
        cols[SRC] = pa.array(["l"] * len(b))
        return pa.table(cols)

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {c: pa.nulls(b.num_rows, types[c]) for c in names}
        cols[JKEY] = pc.cast(b[ids_col], pa.string())
        cols[SRC] = pa.array(["r"] * len(b))
        return pa.table(cols)

    tagged = ds.map_batches(tag_left, batch_format="pyarrow").union(
        ids.map_batches(tag_right, batch_format="pyarrow"))

    def part_filter(t: pa.Table) -> pa.Table:
        src = t[SRC]
        left = t.filter(pc.equal(src, "l"))
        right_keys = t.filter(pc.equal(src, "r"))[JKEY].combine_chunks()
        keep = pc.invert(pc.is_in(left[JKEY], value_set=right_keys))
        return left.filter(keep).drop_columns([JKEY, SRC])

    return grouped_reduce(tagged, [JKEY], part_filter, n_parts=n_parts,
                          batch_format="pyarrow")
