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
