"""Incremental exact dedup against a PERSISTED fingerprint index — the
streaming-ingest pattern: when a new crawl increment arrives, dedup it against
a 100 TB corpus WITHOUT re-shuffling (or even fully re-reading) the corpus.

Build once: one pass over the corpus writes distinct text-sha fingerprints
hash-partitioned into ``part=N/`` parquet dirs (same layout + stable hash as
``functions/index.py`` — the partition id is recomputable at probe time).

Probe per increment: the increment co-partitions on the SAME hash, and each
reducer reads exactly its own ``part=N`` fingerprint files from shared
storage — index I/O per increment is proportional to the increment's
partition coverage, and the corpus-sized index never moves through the object
store. Append the surviving increment's fingerprints to keep the index
current (idempotent per part).

The partition count is a property of the INDEX, not the probe: build writes a
``_MANIFEST.json`` recording ``n_parts`` and probes read it back, so a probe
can never recompute partition ids with a mismatched modulus (which would
silently report known duplicates as novel).
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..core.groupops import _stable_part
from .dedup import add_text_sha

_MANIFEST = "_MANIFEST.json"


def _add_sha_part(b: pa.Table, text_col: str, n_parts: int) -> pa.Table:
    b = add_text_sha(b, text_col)
    if b.num_rows == 0:
        return b.append_column("part", pa.array([], pa.int32()))
    return b.append_column(
        "part", pa.array(_stable_part(b, ["text_sha"], n_parts)))


def index_n_parts(index_dir: str) -> int:
    """The partition modulus the index was BUILT with (from its manifest)."""
    with open(os.path.join(index_dir, _MANIFEST)) as f:
        return int(json.load(f)["n_parts"])


def build_fingerprint_index(ds: rd.Dataset, out_dir: str,
                            text_col: str = "text",
                            n_parts: int = 32) -> str:
    """Distinct text fingerprints, hash-partitioned under ``out_dir/part=N/``.
    One pass + one coarse shuffle of (sha) strings — no payload moves.
    Records ``n_parts`` in ``_MANIFEST.json`` for probes to read back."""

    def hashed(b: pa.Table) -> pa.Table:
        t = _add_sha_part(b, text_col, n_parts)
        # batch-local dedupe first: the shuffle ships distinct shas per batch
        g = t.select(["text_sha", "part"]).group_by(["text_sha", "part"])
        return g.aggregate([])

    def distinct(g: pa.Table) -> pa.Table:
        return g.group_by(["text_sha", "part"]).aggregate([])

    (ds.map_batches(hashed, batch_format="pyarrow")
     .groupby("part").map_groups(distinct, batch_format="pyarrow")
     .write_parquet(out_dir, partition_cols=["part"]))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"n_parts": n_parts, "text_col": text_col}, f)
    return out_dir


def novel_against_index(ds: rd.Dataset, index_dir: str,
                        text_col: str = "text") -> rd.Dataset:
    """Rows of the increment whose text fingerprint is NOT in the index.
    The index is probed in place: each reducer reads only its own part=N
    fingerprint files (pruned local/shared-storage read, no index shuffle).
    The partition modulus comes from the index's own manifest — a probe
    cannot disagree with the build about which part a sha lives in."""
    n_parts = index_n_parts(index_dir)

    def probe(g: pa.Table) -> pa.Table:
        part = g["part"][0].as_py()
        paths = sorted(glob.glob(
            os.path.join(index_dir, f"part={part}", "*.parquet")))
        if paths:
            known = pq.read_table(paths, columns=["text_sha"])["text_sha"]
            keep = pc.invert(pc.is_in(g["text_sha"],
                                      value_set=known.combine_chunks()))
            g = g.filter(keep)
        return g.drop_columns(["text_sha", "part"])

    return (ds.map_batches(lambda b: _add_sha_part(b, text_col, n_parts),
                           batch_format="pyarrow")
            .groupby("part").map_groups(probe, batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# Incremental NEAR-dup: persisted banded-MinHash index (the witness family)
# ---------------------------------------------------------------------------


def build_band_index(ds: rd.Dataset, out_dir: str, text_col: str = "text",
                     id_col: str = "doc_id", n_parts: int = 32) -> str:
    """Banded mod-M MinHash witness rows ``(band, key, doc_id, sig)``
    hash-partitioned on (band, key) under ``out_dir/part=N/`` — the near-dup
    companion of ``build_fingerprint_index``: when a crawl increment arrives,
    its banded rows co-partition on the SAME hash and each reducer reads only
    its own part files, so the corpus's signatures never move through the
    object store again. ``_MANIFEST.json`` records the partition modulus
    (probes read it back — same contract as the exact index). Appending a
    deduped increment's rows keeps the index current (idempotent per part)."""
    from .dedup_witness import _BandedWitness

    banded = ds.map_batches(
        _BandedWitness,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 8))

    def addp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("part", pa.array([], pa.int32()))
        return b.append_column(
            "part", pa.array(_stable_part(b, ["band", "key"], n_parts)))

    banded.map_batches(addp, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["part"])
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump({"n_parts": n_parts, "text_col": text_col,
                   "kind": "band"}, f)
    return out_dir


def near_dup_against_index(ds: rd.Dataset, index_dir: str,
                           min_agree: int = 8, text_col: str = "text",
                           id_col: str = "doc_id") -> rd.Dataset:
    """Near-dup candidates of the increment AGAINST the indexed corpus:
    ``(doc_id, corpus_id, n_agree)`` with >= ``min_agree`` of 16 signature
    positions equal (the `minhash_band_pairs` rule, increment x corpus
    instead of corpus x corpus). The corpus side is probed in place — each
    reducer reads only its own part=N band rows; index I/O per increment is
    proportional to the increment's partition coverage. The partition modulus
    comes from the index manifest, so probe and build can never disagree."""
    import numpy as np
    import pandas as pd

    from ..core.groupops import grouped_reduce
    from .dedup_witness import _BandedWitness

    n_parts = index_n_parts(index_dir)

    banded = ds.map_batches(
        _BandedWitness,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 8))

    def addp(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("part", pa.array([], pa.int32()))
        return b.append_column(
            "part", pa.array(_stable_part(b, ["band", "key"], n_parts)))

    def probe(g: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "corpus_id": pa.array([], pa.int64()),
                          "n_agree": pa.array([], pa.int64())})
        if g.num_rows == 0:
            return empty
        part = g["part"][0].as_py()
        paths = sorted(glob.glob(
            os.path.join(index_dir, f"part={part}", "*.parquet")))
        if not paths:
            return empty
        idx = pq.read_table(paths, columns=["band", "key", "doc_id", "sig"])
        left = pd.DataFrame({
            "band": g["band"].to_numpy(zero_copy_only=False),
            "key": g["key"].to_pylist(),
            "doc_id": g["doc_id"].to_numpy(zero_copy_only=False),
            "sig": g["sig"].to_pylist()})
        right = pd.DataFrame({
            "band": idx["band"].to_numpy(zero_copy_only=False),
            "key": idx["key"].to_pylist(),
            "corpus_id": idx["doc_id"].to_numpy(zero_copy_only=False),
            "csig": idx["sig"].to_pylist()})
        m = left.merge(right, on=["band", "key"], how="inner")
        m = m[m["doc_id"] != m["corpus_id"]]
        if not len(m):
            return empty
        a = np.stack([np.frombuffer(s, dtype=np.uint64) for s in m["sig"]])
        b = np.stack([np.frombuffer(s, dtype=np.uint64) for s in m["csig"]])
        agree = (a == b).sum(axis=1).astype(np.int64)
        keep = agree >= min_agree
        return pa.table({
            "doc_id": pa.array(m["doc_id"].to_numpy()[keep], pa.int64()),
            "corpus_id": pa.array(m["corpus_id"].to_numpy()[keep], pa.int64()),
            "n_agree": pa.array(agree[keep])})

    cands = (banded.map_batches(addp, batch_format="pyarrow")
             .groupby("part").map_groups(probe, batch_format="pyarrow"))
    # a pair can surface from several bands -> one record per (doc, corpus)
    return grouped_reduce(
        cands, ["doc_id", "corpus_id"],
        lambda g: g.drop_duplicates(["doc_id", "corpus_id"]))
