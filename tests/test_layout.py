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


from hypothesis import given, settings
from hypothesis import strategies as st

_KINDS = ["title", "section_header", "paragraph", "text", "list_item",
          "picture", "table", "formula", "code", "weird_kind"]
_span_seq = st.lists(
    st.tuples(st.sampled_from(_KINDS), st.integers(0, 400)), max_size=60
).map(lambda ts: [{"kind": k, "text": "x" * n, "media_ref": "", "offset": i}
                  for i, (k, n) in enumerate(ts)])


@settings(max_examples=200, deadline=None)
@given(_span_seq)
def test_layout_invariants(spans):
    """SPEC §6b invariants under arbitrary span sequences (pipeline parity with
    the oracle is covered above; this fuzzes the oracle's own rules)."""
    metas = oracle.layout_of(spans)
    assert len(metas) == len(spans)
    by_ref = {m["ref"]: m for m in metas}
    prev_page, seen = 1, set()
    for s, m in zip(spans, metas):
        assert m["b"] > m["t"] >= 72.0 and m["l"] == 72.0 and m["r"] == 540.0
        assert m["page_no"] >= prev_page  # pages never go backwards
        prev_page = m["page_no"]
        # a span starting below the top must have fit the page when placed,
        # unless it is taller than a full page (then it overflows in place)
        if m["t"] > 72.0:
            assert m["b"] <= 720.0 or (m["b"] - m["t"]) > 648.0
        # hierarchy: parent is root or an earlier span; level = parent+1
        if m["parent_ref"] == "#/":
            assert m["level"] == 1 if s["kind"] == "title" else m["level"] >= 1
        else:
            assert m["parent_ref"] in seen
            assert m["level"] == by_ref[m["parent_ref"]]["level"] + 1
        seen.add(m["ref"])
