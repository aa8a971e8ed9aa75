"""SPEC §6b layout/hierarchy parity: pipeline spans_meta vs the oracle's
independent layout over the oracle's own output spans (both branches: whole-doc
and chunk-split giants)."""

from __future__ import annotations

import pytest

import sys

sys.path.insert(0, "/root/repo")

from document_processor_ray.data.synth import gen_corpus
from document_processor_ray.pipelines.extract import ExtractConfig, build_extraction
from tests import oracle


def _meta_tuples(metas):
    return [(m["ref"], m["parent_ref"], m["level"], m["page_no"],
             m["l"], m["t"], m["r"], m["b"]) for m in metas]


@pytest.mark.usefixtures("ray_session")
def test_layout_parity_with_oracle():
    corpus = gen_corpus(250, seed=77, giant_rate=0.03)
    expected = {r["doc_id"]: oracle.extract_doc(r) for r in corpus.to_pylist()}

    out = build_extraction(
        corpus, ExtractConfig(split_threshold=120, chunk_size=40)
    ).take_all()
    assert len(out) == len(expected)
    checked_pages = 0
    for row in out:
        exp = expected[row["doc_id"]]
        got = _meta_tuples(row["spans_meta"])
        want = _meta_tuples(oracle.layout_of(exp["spans"]))
        assert got == want, row["doc_id"]
        checked_pages += max((m["page_no"] for m in row["spans_meta"]), default=0)
    # the corpus must actually exercise multi-page layout
    assert checked_pages > len(out)


def test_layout_rules_unit():
    # page wrap: spans of height 240 (picture) fill 720-72=648pt pages 2-per-page
    spans = [{"kind": "picture", "text": "", "media_ref": "", "offset": i}
             for i in range(5)]
    metas = oracle.layout_of(spans)
    assert [m["page_no"] for m in metas] == [1, 1, 2, 2, 3]
    assert metas[2]["t"] == 72.0 and metas[1]["b"] == 552.0

    # hierarchy: title -> section_header -> paragraph chain
    spans = [
        {"kind": "title", "text": "t", "media_ref": "", "offset": 0},
        {"kind": "paragraph", "text": "p", "media_ref": "", "offset": 1},
        {"kind": "section_header", "text": "s", "media_ref": "", "offset": 2},
        {"kind": "paragraph", "text": "q", "media_ref": "", "offset": 3},
        {"kind": "title", "text": "t2", "media_ref": "", "offset": 4},
        {"kind": "paragraph", "text": "r", "media_ref": "", "offset": 5},
    ]
    metas = oracle.layout_of(spans)
    assert [(m["parent_ref"], m["level"]) for m in metas] == [
        ("#/", 1), ("#/spans/0", 2), ("#/spans/0", 2), ("#/spans/2", 3),
        ("#/", 1), ("#/spans/4", 2),
    ]

    # long text wraps lines: 200 chars = 3 lines = 42pt
    spans = [{"kind": "text", "text": "x" * 200, "media_ref": "", "offset": 0}]
    m = oracle.layout_of(spans)[0]
    assert m["b"] - m["t"] == 42.0
