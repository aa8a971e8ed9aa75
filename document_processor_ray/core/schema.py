"""Arrow schemas for the interleaved-document tables (SPEC.md §1, §7).

Input shape is verbatim from BASELINE.json input_hint:
``(doc_id:string, spans:array<struct<kind,text,media_ref,offset:int32>>)``
plus the interleaved media payload column and cost-pushdown metadata columns.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

PAYLOAD_TYPE = pa.struct(
    [
        ("media_ref", pa.string()),
        ("data", pa.large_binary()),
    ]
)

# §6b layout/hierarchy side column: one element per OUTPUT span, carrying one
# position PER PAGE FRAGMENT (2-decimal bbox + coord_origin like the
# reference's Position, models.py:31-44; ref/parent_ref/level parent-pointer
# tree)
POSITION_TYPE = pa.struct(
    [
        ("page_no", pa.int32()),
        ("l", pa.float64()),
        ("t", pa.float64()),
        ("r", pa.float64()),
        ("b", pa.float64()),
        ("coord_origin", pa.string()),
    ]
)

SPANS_META_TYPE = pa.struct(
    [
        ("ref", pa.string()),
        ("parent_ref", pa.string()),
        ("level", pa.int32()),
        # reference keeps content_text and caption_text distinct
        # (models.py:51-53); span text folds the caption in for media kinds,
        # and this field restores the distinction: cleaned caption for media
        # spans, null otherwise (SPEC §6b)
        ("caption", pa.string()),
        ("positions", pa.list_(POSITION_TYPE)),
    ]
)

METRICS_TYPE = pa.struct(
    [
        ("doc_class", pa.string()),
        ("ocr_path", pa.string()),
        ("n_spans_in", pa.int32()),
        ("n_spans_out", pa.int32()),
        ("n_errors", pa.int32()),
        ("error", pa.string()),
    ]
)

INPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("payloads", pa.list_(PAYLOAD_TYPE)),
        ("n_spans", pa.int32()),
        ("payload_bytes", pa.int64()),
    ]
)

OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("metrics", METRICS_TYPE),
    ]
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("content_type", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        # cleaned cell matrix for tables (reference table_data,
        # slice_extractor.py:147-179), JSON-encoded so str|int|null cell types
        # survive; null for images — queryable without re-decoding the blob
        ("cells_json", pa.string()),
        # table shape stats (tables only, else null), materialized at build
        # time so shape queries are pure projections (no json.loads)
        ("n_rows", pa.int32()),
        ("n_cols", pa.int32()),
        ("n_null_cells", pa.int32()),
        ("data", pa.large_binary()),
    ]
)

MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("status", pa.string()),
        ("rows", pa.int64()),
        ("spans", pa.int64()),
        ("ocr_fast", pa.int64()),
        ("ocr_full", pa.int64()),
        ("errors", pa.int64()),
        ("wall_s", pa.float64()),
        ("content_hash", pa.string()),
    ]
)

# Span kind taxonomy (SPEC.md §1; mirrors the reference's DocItemLabel filter at
# /root/reference/app/services/content_extractor/page_extractor.py:87-96 and the
# screenshot-bearing kinds at slice_extractor.py:202).
TEXT_KINDS = frozenset(
    {
        "title",
        "section_header",
        "paragraph",
        "text",
        "list_item",
        "caption",
        "footnote",
        "page_header",
        "page_footer",
    }
)
MEDIA_KINDS = frozenset({"table", "picture", "formula", "code"})
BOILERPLATE_KIND = "boilerplate"
