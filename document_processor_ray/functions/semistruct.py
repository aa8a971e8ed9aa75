"""Semi-structured metadata extraction: pull typed fields out of a JSON /
key-value string column with ONE vectorized Arrow regex kernel per field —
no per-row Python, no JSON parser in the hot path.

Web-pipeline shape: crawl sidecars (WARC headers, page metadata, provenance
blobs) ride along as a flat JSON string column next to the payload; training
pipelines need one or two scalar fields from it per row (fetch status, score,
timestamp) at full-corpus scale. For FLAT schemas, field access is exactly a
``pc.extract_regex`` pass — zero-copy in, one string scan per batch,
shuffle-free, and bit-identical to a SQL ``regexp_extract`` mirror. Nested /
escaped JSON needs a real parser (duckdb/json at the edges, or an actor-pool
stage wrapping a C parser) — out of scope for this kernel and asserted in its
docstring rather than silently mis-parsed: the regex matches only unescaped
``"key": <int>`` shapes.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def extract_int_field(col: pa.Array | pa.ChunkedArray,
                      key: str) -> pa.Array:
    """``int64`` value of ``"key": <int>`` inside a flat JSON string column.
    Rows without the key (or with a non-integer value) come back null —
    the same semantics as SQL ``CAST(regexp_extract(col, ...) AS BIGINT)``
    with DuckDB's empty-match → NULL cast."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    pat = f'"{key}"\\s*:\\s*(?P<v>-?\\d+)'
    st = pc.extract_regex(col, pattern=pat)
    return pc.cast(pc.struct_field(st, "v"), pa.int64())
