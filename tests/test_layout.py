"""SPEC §6b layout/hierarchy parity: pipeline spans_meta vs the oracle's
independent layout over the oracle's own output spans (both branches: whole-doc
and chunk-split giants), with one position per page fragment."""

from __future__ import annotations

import pytest

import sys

sys.path.insert(0, "/root/repo")

from document_processor_ray.data.synth import gen_corpus
from document_processor_ray.pipelines.extract import ExtractConfig, build_extraction
from tests import oracle


def _pos_tuples(positions):
    return tuple((p["page_no"], p["l"], p["t"], p["r"], p["b"], p["coord_origin"])
                 for p in positions)


def _meta_tuples(metas):
    return [(m["ref"], m["parent_ref"], m["level"], m["caption"],
             _pos_tuples(m["positions"]))
            for m in metas]


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
        checked_pages += max((p["page_no"] for m in row["spans_meta"]
                              for p in m["positions"]), default=0)
    # the corpus must actually exercise multi-page layout
    assert checked_pages > len(out)


def test_layout_rules_unit():
    # page wrap: spans of height 240 (picture) fill 720-72=648pt pages 2-per-page
    spans = [{"kind": "picture", "text": "", "media_ref": "", "offset": i}
             for i in range(5)]
    metas = oracle.layout_of(spans)
    assert [m["positions"][0]["page_no"] for m in metas] == [1, 1, 2, 2, 3]
    assert all(len(m["positions"]) == 1 for m in metas)  # media never splits
    assert metas[2]["positions"][0]["t"] == 72.0
    assert metas[1]["positions"][0]["b"] == 552.0

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

    # long text wraps lines: 200 chars = 3 lines = 42pt, one position
    spans = [{"kind": "text", "text": "x" * 200, "media_ref": "", "offset": 0}]
    (p,) = oracle.layout_of(spans)[0]["positions"]
    assert p["b"] - p["t"] == 42.0 and p["coord_origin"] == "TOPLEFT"


def test_layout_page_fragments_unit():
    # 100 lines = 8000 chars: ceil(100/46) = 3 fragments; full ones carry 46
    # lines (644pt, b=716), the last the 8-line remainder
    spans = [{"kind": "text", "text": "x" * 8000, "media_ref": "", "offset": 0},
             {"kind": "text", "text": "y", "media_ref": "", "offset": 1}]
    metas = oracle.layout_of(spans)
    pos = metas[0]["positions"]
    assert [p["page_no"] for p in pos] == [1, 2, 3]
    assert [(p["t"], p["b"]) for p in pos[:2]] == [(72.0, 716.0), (72.0, 716.0)]
    assert pos[2]["b"] == 72.0 + 14 * (100 - 92)
    # the next span continues below the last fragment on its page
    nxt = metas[1]["positions"][0]
    assert nxt["page_no"] == 3 and nxt["t"] == pos[2]["b"]

    # a giant span NOT at page top first breaks to a fresh page, then splits
    spans = [{"kind": "text", "text": "z" * 100, "media_ref": "", "offset": 0},
             {"kind": "text", "text": "x" * 8000, "media_ref": "", "offset": 1}]
    metas = oracle.layout_of(spans)
    assert metas[0]["positions"][0]["page_no"] == 1
    assert [p["page_no"] for p in metas[1]["positions"]] == [2, 3, 4]


from hypothesis import given, settings
from hypothesis import strategies as st

_KINDS = ["title", "section_header", "paragraph", "text", "list_item",
          "picture", "table", "formula", "code", "weird_kind"]
_span_seq = st.lists(
    st.tuples(st.sampled_from(_KINDS), st.integers(0, 9000)), max_size=60
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
        pos = m["positions"]
        assert len(pos) >= 1
        for p in pos:
            # every fragment fits its page and uses the full content width
            assert 720.0 >= p["b"] > p["t"] >= 72.0
            assert p["l"] == 72.0 and p["r"] == 540.0
            assert p["coord_origin"] == "TOPLEFT"
        assert pos[0]["page_no"] >= prev_page  # pages never go backwards
        # fragments advance one page at a time, non-final ones are full
        for q, p in zip(pos, pos[1:]):
            assert p["page_no"] == q["page_no"] + 1
            assert (q["t"], q["b"]) == (72.0, 72.0 + 46 * 14)
        # multi-position only for spans taller than a fresh page
        if len(pos) > 1:
            assert s["kind"] not in oracle.MEDIA_KINDS
            assert sum(p["b"] - p["t"] for p in pos) > 648.0
        prev_page = pos[-1]["page_no"]
        # hierarchy: parent is root or an earlier span; level = parent+1
        if m["parent_ref"] == "#/":
            assert m["level"] == 1 if s["kind"] == "title" else m["level"] >= 1
        else:
            assert m["parent_ref"] in seen
            assert m["level"] == by_ref[m["parent_ref"]]["level"] + 1
        seen.add(m["ref"])


@pytest.mark.usefixtures("ray_session")
def test_page_range_selection_matches_oracle():
    """SPEC §6d: pipeline first_page/last_page keeps exactly the spans the
    oracle's independent page_range_filter keeps, spans_meta stays aligned
    with ORIGINAL positions, and out-of-range docs keep empty span lists."""
    corpus = gen_corpus(150, seed=31, giant_rate=0.03)
    expected = {r["doc_id"]: oracle.extract_doc(r) for r in corpus.to_pylist()}

    out = build_extraction(
        corpus, ExtractConfig(split_threshold=120, chunk_size=40,
                              first_page=2, last_page=3)).take_all()
    assert len(out) == len(expected)
    n_nonempty = n_filtered = 0
    for row in out:
        exp = expected[row["doc_id"]]["spans"]
        want = oracle.page_range_filter(exp, 2, 3)
        got = [(s["kind"], s["text"], s["media_ref"]) for s in row["spans"]]
        assert got == [(s["kind"], s["text"], s["media_ref"]) for s in want]
        metas_full = oracle.layout_of(exp)
        want_meta = [m for s, m in zip(exp, metas_full)
                     if any(2 <= p["page_no"] <= 3 for p in m["positions"])]
        assert _meta_tuples(row["spans_meta"]) == _meta_tuples(want_meta)
        n_nonempty += bool(row["spans"])
        n_filtered += len(exp) != len(want)
    # the range must actually select on this corpus: some docs keep spans,
    # some docs lose spans
    assert n_nonempty > 10 and n_filtered > 10


@pytest.mark.usefixtures("ray_session")
def test_page_range_requires_layout():
    import pytest as pt

    from document_processor_ray.data.synth import gen_corpus as gc

    with pt.raises(ValueError):
        build_extraction(gc(5, seed=1),
                         ExtractConfig(emit_layout=False, first_page=2))
