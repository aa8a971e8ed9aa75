"""Training-data decontamination: token n-gram overlap of every corpus
document against a benchmark (held-out eval) document set.

This is the standard published recipe (GPT-3 appendix C, Dolma, FineWeb all
decontaminate by n-gram collision against benchmark text): a training doc is
"contaminated" if any of its token n-grams appears verbatim in a benchmark
document. Checked against a DuckDB mirror (same tokenizer, same gram
construction, string equality) by the driver gate.

Scale design:
- The benchmark side is SMALL by nature (eval sets are thousands of docs, not
  terabytes) — its unique gram set is built once and broadcast via ``ray.put``,
  read zero-copy from the object store by every task. The 100 TB corpus side
  streams through ONE ``map_batches`` pass; there is no shuffle at all.
- The per-batch kernel is fully vectorized: one RE2 tokenizer split over the
  batch, empty-token drop on the flat child (Arrow filter), gram strings from
  eight shifted slices joined in C (``pc.binary_join_element_wise``),
  membership via Arrow's hash-set ``pc.is_in``, and per-doc counts via
  ``np.bincount`` on the list-parent indices. No Python per row, token or gram.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Whitespace tokenizer shared with token_freq / doc_stats (SQL mirror:
# regexp_split_to_array(text, '[ \t\n\r\f]+') + empty drop).
_SEP_PAT = r"[ \t\n\r\f]+"


def doc_grams(texts: pa.Array, n: int = 8):
    """(flat_grams, parent_idx): every n-token gram of every doc, with the
    local row index each gram belongs to. Vectorized end to end."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.fill_null(texts, ""), pattern=_SEP_PAT)
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    parent = parent[keep.to_numpy(zero_copy_only=False)]
    total = len(flat)
    if total < n:
        return pa.array([], pa.string()), np.array([], dtype=np.int64)
    m = total - n + 1  # candidate gram starts
    shifted = [flat.slice(i, m) for i in range(n)]
    grams = pc.binary_join_element_wise(*shifted, " ")
    # a start is valid iff all n tokens come from the same doc
    valid = parent[: m] == parent[n - 1:]
    return grams.filter(pa.array(valid)), parent[:m][valid]


def build_benchmark_grams(texts: pa.Array, n: int = 8) -> pa.Array:
    """Unique gram set of the (small) benchmark docs — the broadcast side."""
    grams, _ = doc_grams(texts, n=n)
    return pc.unique(grams)


def overlap_batch(batch: pa.Table, bench_grams: pa.Array, n: int = 8,
                  id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc gram totals + benchmark-overlap counts for one corpus batch.
    Docs with fewer than ``n`` tokens emit no row (they have no grams),
    matching the SQL mirror's inner gram expansion."""
    grams, parent = doc_grams(batch[text_col], n=n)
    nrows = batch.num_rows
    n_grams = np.bincount(parent, minlength=nrows).astype(np.int64)
    member = pc.is_in(grams, value_set=bench_grams).to_numpy(zero_copy_only=False)
    n_overlap = np.bincount(parent[member], minlength=nrows).astype(np.int64)
    has = n_grams > 0
    ids = batch[id_col].combine_chunks() if isinstance(batch[id_col], pa.ChunkedArray) \
        else batch[id_col]
    mask = pa.array(has)
    return pa.table({
        id_col: ids.filter(mask),
        "n_grams": pa.array(n_grams[has]),
        "n_overlap": pa.array(n_overlap[has]),
        "contaminated": pa.array((n_overlap[has] > 0).astype(np.int64)),
    })
