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

from ..core.schema import MEDIA_KINDS, POSITION_TYPE, SPANS_META_TYPE
from .sniff import list_offsets

PAGE_TOP = 72.0
PAGE_BOTTOM = 720.0
LINE_H = 14
CHARS_PER_LINE = 80
LINES_PER_PAGE = 46          # most 14pt lines fitting 648pt of content height
PAGE_FRAG_H = LINES_PER_PAGE * LINE_H  # 644
CONTENT_L = 72.0
CONTENT_R = 540.0
COORD_ORIGIN = "TOPLEFT"
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
    """Append ``spans_meta`` (list<struct ref/parent_ref/level/positions>) with
    one position per page fragment, aligned with the output ``spans`` column."""
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
    pos_counts = np.zeros(n_child, dtype=np.int32)
    # flat per-position accumulators (most spans carry exactly one position)
    p_pages: list[int] = []
    p_tops: list[float] = []
    p_bots: list[float] = []

    for d in range(len(offs) - 1):
        lo, hi = int(offs[d]), int(offs[d + 1])
        page, y = 1, PAGE_TOP
        cur_title = cur_section = None  # (ref, level)
        for j in range(lo, hi):
            h = int(heights[j])
            if y + h > PAGE_BOTTOM and y > PAGE_TOP:
                page += 1
                y = PAGE_TOP
            if y + h <= PAGE_BOTTOM:
                p_pages.append(page); p_tops.append(y); p_bots.append(y + h)
                pos_counts[j] = 1
                y += h
            else:  # taller than a fresh page (y == PAGE_TOP): page fragments
                rem, npos = h, 0
                while rem > PAGE_FRAG_H:
                    p_pages.append(page); p_tops.append(PAGE_TOP)
                    p_bots.append(PAGE_TOP + PAGE_FRAG_H)
                    page, rem, npos = page + 1, rem - PAGE_FRAG_H, npos + 1
                p_pages.append(page); p_tops.append(PAGE_TOP)
                p_bots.append(PAGE_TOP + rem)
                pos_counts[j] = npos + 1
                y = PAGE_TOP + rem
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

    # caption fidelity field (SPEC §6b; reference content_text vs caption_text,
    # models.py:51-53): media spans' text IS the cleaned caption — surface it;
    # null for every other kind
    if n_child:
        media_mask = pc.is_in(values.field("kind"),
                              value_set=pa.array(sorted(MEDIA_KINDS)))
        captions = pc.if_else(media_mask, values.field("text"),
                              pa.scalar(None, pa.string()))
    else:
        captions = pa.array([], pa.string())

    n_pos = len(p_pages)
    pos_struct = pa.StructArray.from_arrays(
        [pa.array(p_pages, pa.int32()),
         pa.array(np.full(n_pos, CONTENT_L)),
         pa.array(np.round(np.asarray(p_tops, dtype=np.float64), 2)),
         pa.array(np.full(n_pos, CONTENT_R)),
         pa.array(np.round(np.asarray(p_bots, dtype=np.float64), 2)),
         pa.array([COORD_ORIGIN] * n_pos, pa.string())],
        fields=list(POSITION_TYPE))
    pos_offs = pa.array(
        np.concatenate([[0], np.cumsum(pos_counts)]).astype(np.int32))
    positions_col = pa.ListArray.from_arrays(pos_offs, pos_struct)
    meta = pa.StructArray.from_arrays(
        [pa.array(refs, pa.string()), pa.array(parents, pa.string()),
         pa.array(levels, type=pa.int32()), captions, positions_col],
        fields=list(SPANS_META_TYPE))
    meta_col = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), meta)
    return batch.append_column("spans_meta", meta_col)


def make_page_range_batch(first_page: int | None, last_page: int | None):
    """F3 page-granularity analog (SPEC §6d; reference ``first_page`` /
    ``last_page``, ``content_extractor.py:64-72``): keep only output spans with
    at least one §6b position on a page in the inclusive range. Runs AFTER
    layout (pages are an output construct of the synthetic layout engine);
    ``spans``/``spans_meta`` are filtered in lockstep, kept spans keep their
    original positions/refs, and a doc whose spans all fall outside the range
    keeps an empty span list. Fully vectorized: per-position range test →
    per-span any() via one bincount → one ``take`` per flat child array."""
    lo = 1 if first_page is None else int(first_page)
    hi = (1 << 31) - 1 if last_page is None else int(last_page)

    def f(batch: pa.Table) -> pa.Table:
        spans_col = batch["spans"]
        meta_col = batch["spans_meta"]
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        if isinstance(meta_col, pa.ChunkedArray):
            meta_col = meta_col.combine_chunks()
        sv, s_offs = list_offsets(spans_col)
        mv, _ = list_offsets(meta_col)
        n_spans = len(mv)
        pos = mv.field("positions")
        pages = pos.flatten().field("page_no").to_numpy(zero_copy_only=False)
        in_rng = (pages >= lo) & (pages <= hi)
        pos_parent = pc.list_parent_indices(pos).to_numpy(zero_copy_only=False)
        keep = np.bincount(pos_parent[in_rng], minlength=n_spans) > 0
        keep_idx = pa.array(np.flatnonzero(keep))
        span_doc = np.repeat(np.arange(len(s_offs) - 1), np.diff(s_offs))
        kept_per_doc = (np.bincount(span_doc[keep], minlength=len(s_offs) - 1)
                        if n_spans else np.zeros(len(s_offs) - 1, np.int64))
        new_offs = pa.array(
            np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32))
        new_spans = pa.ListArray.from_arrays(new_offs, sv.take(keep_idx))
        new_meta = pa.ListArray.from_arrays(new_offs, mv.take(keep_idx))
        out = batch.set_column(
            batch.schema.get_field_index("spans"), "spans", new_spans)
        return out.set_column(
            out.schema.get_field_index("spans_meta"), "spans_meta", new_meta)

    return f
