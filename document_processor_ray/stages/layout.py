"""Layout geometry + hierarchy pass (SPEC.md §6b) — the T2/T7 fidelity analog.

The reference emits one ``Position`` (page_no + 2-decimal bbox) per provenance
item (``app/services/content_extractor/slice_extractor.py:18-54,181-192``,
``app/services/model_adapters.py:125-156``) and a ``ref``/``parent_ref``
parent-pointer tree with ``level`` (``slice_extractor.py:87-103``,
``page_extractor.py:87-96``). Interleaved-span inputs carry no geometry, so this
stage runs a deterministic synthetic layout engine — a pure function of the
final output span sequence — appending a ``spans_meta`` side column aligned 1:1
with output spans. Stateless ``map_batches`` transform; heights are vectorized
over the flattened span child array, only the inherently sequential per-doc
page-cursor scan is a Python loop over precomputed ints.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.schema import MEDIA_KINDS, SPANS_META_TYPE
from .sniff import list_offsets

PAGE_TOP = 72.0
PAGE_BOTTOM = 720.0
LINE_H = 14
CHARS_PER_LINE = 80
CONTENT_L = 72.0
CONTENT_R = 540.0
_MEDIA_H = {"picture": 240, "table": 160, "code": 120, "formula": 80}
ROOT_REF = "#/"


def _span_heights(kinds: pa.Array, texts: pa.Array) -> np.ndarray:
    """Vectorized render heights per SPEC §6b (ints; rounding is trivial)."""
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False).astype(np.int64)
    h = LINE_H * np.maximum(1, -(-n_chars // CHARS_PER_LINE))
    kind_list = kinds.to_pylist()
    for i, k in enumerate(kind_list):
        if k in MEDIA_KINDS:
            h[i] = _MEDIA_H[k]
    return h


def add_layout_batch(batch: pa.Table) -> pa.Table:
    """Append ``spans_meta`` (list<struct ref/parent_ref/level/page_no/l/t/r/b>)
    aligned with the output ``spans`` column."""
    from ..core import limit_arrow_threads

    limit_arrow_threads(1)
    spans_col = batch["spans"]
    if isinstance(spans_col, pa.ChunkedArray):
        spans_col = spans_col.combine_chunks()
    values, offs = list_offsets(spans_col)
    n_child = len(values)
    if n_child:
        heights = _span_heights(values.field("kind"), values.field("text"))
        kinds = values.field("kind").to_pylist()
    else:
        heights, kinds = np.zeros(0, np.int64), []

    refs: list[str] = [""] * n_child
    parents: list[str] = [""] * n_child
    levels = np.zeros(n_child, dtype=np.int32)
    pages = np.zeros(n_child, dtype=np.int32)
    tops = np.zeros(n_child, dtype=np.float64)
    bots = np.zeros(n_child, dtype=np.float64)

    for d in range(len(offs) - 1):
        lo, hi = int(offs[d]), int(offs[d + 1])
        page, y = 1, PAGE_TOP
        cur_title = cur_section = None  # (ref, level)
        for j in range(lo, hi):
            h = int(heights[j])
            if y + h > PAGE_BOTTOM and y > PAGE_TOP:
                page += 1
                y = PAGE_TOP
            pages[j], tops[j], bots[j] = page, y, y + h
            y += h
            ref = f"#/spans/{j - lo}"
            refs[j] = ref
            kind = kinds[j]
            if kind == "title":
                parents[j], levels[j] = ROOT_REF, 1
                cur_title, cur_section = (ref, 1), None
            elif kind == "section_header":
                p = cur_title or (ROOT_REF, 0)
                parents[j], levels[j] = p[0], p[1] + 1
                cur_section = (ref, p[1] + 1)
            else:
                p = cur_section or cur_title or (ROOT_REF, 0)
                parents[j], levels[j] = p[0], p[1] + 1

    meta = pa.StructArray.from_arrays(
        [pa.array(refs, pa.string()), pa.array(parents, pa.string()),
         pa.array(levels, type=pa.int32()), pa.array(pages, type=pa.int32()),
         pa.array(np.full(n_child, CONTENT_L)), pa.array(np.round(tops, 2)),
         pa.array(np.full(n_child, CONTENT_R)), pa.array(np.round(bots, 2))],
        fields=list(SPANS_META_TYPE))
    meta_col = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), meta)
    return batch.append_column("spans_meta", meta_col)
