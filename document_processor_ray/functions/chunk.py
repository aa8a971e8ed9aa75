"""Sliding-window token chunking — the standard LLM-training-data shaping op
(split each document into overlapping fixed-token windows for context packing).

Fully vectorized per batch: one Arrow tokenize, then the overlapping windows
are materialized with a single ``take`` over the flat token stream driven by
numpy index arithmetic (overlap means offsets alone can't express the slices —
values must be gathered), reassembled as a ListArray and joined with
``pc.binary_join``. No Python loop over rows or chunks; a chunk never crosses
documents; row order inside a batch is preserved so the op is
shuffle-free and embarrassingly parallel at any scale.

Chunk convention (mirrored exactly by the DuckDB oracle in
``pipelines/queries.py::SQL_CHUNK_WINDOWS``): for a doc with n > 0 tokens,
windows start at 0, stride, 2·stride, … < n; each chunk is
``tokens[start : start+window]`` (the final chunks may be shorter than
``window``). Empty/whitespace-only docs emit no chunks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_PAT = r"[ \t\n\r\f]+"


def chunk_batch(b: pa.Table, id_col: str = "doc_id", text_col: str = "text",
                window: int = 32, stride: int = 24) -> pa.Table:
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    t = b[text_col]
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    toks = pc.split_pattern_regex(pc.fill_null(t, ""), pattern=TOKEN_PAT)
    flat = pc.list_flatten(toks)
    par = pc.list_parent_indices(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat, par = flat.combine_chunks(), par.combine_chunks()
    keep = pc.not_equal(flat, "")
    flat, par = flat.filter(keep), par.filter(keep)
    empty = pa.table({"doc_id": pa.array([], b[id_col].type),
                      "chunk_id": pa.array([], pa.int64()),
                      "n_tokens": pa.array([], pa.int64()),
                      "chunk": pa.array([], pa.string())})
    if len(flat) == 0:
        return empty
    par_np = par.to_numpy(zero_copy_only=False).astype(np.int64)
    lengths = np.bincount(par_np, minlength=b.num_rows)       # tokens per doc
    row_off = np.concatenate(([0], np.cumsum(lengths)))       # doc start in flat
    n_chunks = -(-lengths // stride)                          # ceil; 0 for empty
    total = int(n_chunks.sum())
    if total == 0:
        return empty
    doc_idx = np.repeat(np.arange(b.num_rows), n_chunks)
    chunk_off = np.concatenate(([0], np.cumsum(n_chunks)))[:-1]
    chunk_id = np.arange(total) - np.repeat(chunk_off, n_chunks)
    start = chunk_id * stride
    clen = np.minimum(window, lengths[doc_idx] - start)
    # gather indices: for chunk c, row_off[doc] + start + (0..clen-1)
    coff = np.concatenate(([0], np.cumsum(clen)))
    idx = (np.arange(int(coff[-1])) - np.repeat(coff[:-1], clen)
           + np.repeat(row_off[doc_idx] + start, clen))
    taken = flat.take(pa.array(idx))
    la = pa.ListArray.from_arrays(pa.array(coff, pa.int32()), taken)
    return pa.table({
        "doc_id": b[id_col].combine_chunks().take(pa.array(doc_idx))
        if isinstance(b[id_col], pa.ChunkedArray)
        else b[id_col].take(pa.array(doc_idx)),
        "chunk_id": pa.array(chunk_id.astype(np.int64)),
        "n_tokens": pa.array(clen.astype(np.int64)),
        "chunk": pc.binary_join(la, " ")})
