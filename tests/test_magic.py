"""Byte-level magic sniffing (F1 analog): crafted prefixes route correctly
before any text-based classification (reference api.py:86-90 upload gate)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from document_processor_ray.core import codec
from document_processor_ray.stages.sniff import sniff_magic, sniff_magic_batch


CASES = [
    (b"%PDF-1.7\n%\xe2\xe3\xcf\xd3", "application/pdf"),
    (b"\x89PNG\r\n\x1a\n" + b"\x00" * 20, "image/png"),
    (b"\xff\xd8\xff\xe0\x00\x10JFIF", "image/jpeg"),
    (b"GIF89a\x10\x00", "image/gif"),
    (b"PK\x03\x04mimetype", "application/zip"),
    (b"<!DOCTYPE html><html><body>x</body></html>", "text/html"),
    (b"  \n\t <HTML><head></head>", "text/html"),
    (b"<div class='a'>hi</div>", "text/html"),
    (b"just some plain ascii text\nwith lines", "text/plain"),
    (b"", "application/x-empty"),
    (None, "application/x-empty"),
    (b"\x00\x01\x02\x03\xff\xfe\xfd" * 10, "application/octet-stream"),
    (codec.encode_image(4, 4, "t"), "image/x-synth"),
    (codec.encode_table([["h"], ["v"]]), "table/x-synth"),
    # pathological: PDF magic wins over an HTML-looking tail
    (b"%PDF-1.4 <html>", "application/pdf"),
    # angle bracket but no marker: not html
    (b"<not-a-known-tag>stuff", "text/plain"),
]


@pytest.mark.parametrize("data,want", CASES)
def test_sniff_magic_prefixes(data, want):
    assert sniff_magic(data) == want


def test_sniff_magic_batch_gate():
    data = [d for d, _ in CASES if d is not None]
    batch = pa.table({"doc_id": [f"u{i}" for i in range(len(data))],
                      "data": pa.array(data, pa.large_binary())})
    out = sniff_magic_batch(batch)
    got = dict(zip(out["doc_id"].to_pylist(), out["content_type"].to_pylist()))
    want = {f"u{i}": w for i, (d, w) in enumerate(c for c in CASES if c[0] is not None)}
    assert got == want
    acc = dict(zip(out["doc_id"].to_pylist(), out["accepted"].to_pylist()))
    for i, (d, w) in enumerate(c for c in CASES if c[0] is not None):
        assert acc[f"u{i}"] == (w in ("application/pdf", "text/html"))
