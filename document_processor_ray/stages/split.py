"""Cost-based giant-document splitter (SURVEY §4.3).

A 10k-span document must not serialize through one actor call: slice it into
contiguous span chunks (each with only the payloads its spans reference), parse the
chunks independently, then regroup by ``doc_id`` — the pipeline's only shuffle.
Chunk boundaries are deterministic (fixed ``chunk_size`` in input-span order) so
output is schedule-independent.
"""

from __future__ import annotations

import pyarrow as pa

from ..core.schema import MEDIA_KINDS, PAYLOAD_TYPE, SPAN_TYPE

SPLIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part_idx", pa.int32()),
        ("n_parts", pa.int32()),
        ("doc_class", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("payloads", pa.list_(PAYLOAD_TYPE)),
    ]
)


def make_span_range_batch(first_span: int | None, last_span: int | None):
    """F3 analog (reference content_extractor.py:64-72 first_page/last_page):
    keep only input spans with offset in the inclusive [first_span, last_span]
    range, BEFORE classification (SPEC §6c) — the document *is* its selected
    spans. Vectorized: one mask over the flattened span child, list offsets
    rebuilt from the mask prefix sum; n_spans metadata recomputed."""
    import numpy as np
    import pyarrow.compute as pc

    from .sniff import list_offsets

    lo = 0 if first_span is None else first_span
    hi = (1 << 31) - 1 if last_span is None else last_span

    def span_range_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        spans_col = batch["spans"]
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        values, offs = list_offsets(spans_col)
        in_off = values.field("offset")
        mask = pc.and_(pc.greater_equal(in_off, lo), pc.less_equal(in_off, hi))
        kept = values.filter(mask)
        csum = np.concatenate([[0], np.cumsum(
            mask.to_numpy(zero_copy_only=False).astype(np.int64))])
        new_offs = csum[offs]
        new_spans = pa.ListArray.from_arrays(
            pa.array(new_offs - new_offs[0], pa.int32()),
            kept.slice(int(new_offs[0]), int(new_offs[-1] - new_offs[0])))
        n_spans = pa.array((new_offs[1:] - new_offs[:-1]).astype("int32"))
        out = batch.set_column(batch.schema.get_field_index("spans"), "spans",
                               new_spans)
        return out.set_column(out.schema.get_field_index("n_spans"), "n_spans",
                              n_spans)

    return span_range_batch


def make_split_batch(chunk_size: int):
    def split_batch(batch: pa.Table) -> pa.Table:
        rows = []
        doc_ids = batch["doc_id"].to_pylist()
        classes = batch["doc_class"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        payloads_col = batch["payloads"].to_pylist()
        for did, cls, spans, payloads in zip(doc_ids, classes, spans_col, payloads_col):
            spans = spans or []
            # spans are stored in document order; keep slices contiguous in input
            # offset order so reassembly is a concat
            spans = sorted(spans, key=lambda s: s["offset"])
            n_parts = max(1, (len(spans) + chunk_size - 1) // chunk_size)
            pmap = {p["media_ref"]: p for p in (payloads or [])}
            for part in range(n_parts):
                sl = spans[part * chunk_size : (part + 1) * chunk_size]
                refs = {
                    s["media_ref"]
                    for s in sl
                    if s["kind"] in MEDIA_KINDS and s["media_ref"]
                }
                rows.append(
                    {
                        "doc_id": did,
                        "part_idx": part,
                        "n_parts": n_parts,
                        "doc_class": cls,
                        "spans": sl,
                        "payloads": [pmap[r] for r in sorted(refs) if r in pmap],
                    }
                )
        return pa.Table.from_pylist(rows, schema=SPLIT_SCHEMA)

    return split_batch
