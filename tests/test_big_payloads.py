"""Memory-aware handling of very wide rows (SURVEY §7.3 item 5): multi-megabyte
media payloads flow through the actor pool with small batches, produce correct
content-hash refs, and never inline payloads into the docs output."""

from __future__ import annotations

import pyarrow as pa
import pytest

from document_processor_ray.core import codec
from document_processor_ray.core.schema import INPUT_SCHEMA
from document_processor_ray.pipelines.extract import (ExtractConfig,
                                                      build_extraction,
                                                      build_media_table)

import oracle


def _wide_corpus(n_docs=12, mb=3):
    rows = []
    big_text = "scan " * (mb * 200_000 // 5)  # ~mb MB embedded text per payload
    for i in range(n_docs):
        data = codec.encode_image(4000, 3000, big_text + str(i))
        ref = f"media://in-{i:016x}"
        rows.append({
            "doc_id": f"wide-{i:04d}",
            "spans": [
                {"kind": "paragraph", "text": "", "media_ref": "", "offset": 0},
                {"kind": "picture", "text": f"figure {i}", "media_ref": ref,
                 "offset": 1},
            ],
            "payloads": [{"media_ref": ref, "data": data}],
            "n_spans": 2,
            "payload_bytes": len(data),
        })
    return pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)


@pytest.mark.usefixtures("ray_session")
def test_wide_rows_stream_through_small_batches(tmp_path):
    corpus = _wide_corpus()
    cfg = ExtractConfig(batch_size=2, parse_concurrency=(1, 2))
    rows = build_extraction(corpus, cfg).take_all()
    want = oracle.extract_corpus(corpus.to_pylist())
    got = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
           for r in rows}
    exp = {d: [(s["kind"], s["text"], s["media_ref"]) for s in w["spans"]]
           for d, w in want.items()}
    assert got == exp
    # scanned docs (no text): full-OCR path recovered the embedded text spans
    assert all(m["metrics"]["ocr_path"] == "full" for m in rows)
    # docs output carries refs only — no payload bytes inline
    for r in rows:
        for s in r["spans"]:
            assert len(s["text"]) < 20_000_000
            assert s["media_ref"] == "" or s["media_ref"].startswith("media://")
    media = build_media_table(corpus, cfg).take_all()
    assert len(media) == 12 and all(m["width"] == 4000 for m in media)
