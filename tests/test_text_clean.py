"""Unit tests for N1 glyph cleaner + HTML helpers (SPEC §2; reference
slice_extractor.py:62,212-225)."""

import pyarrow as pa

from document_processor_ray.functions import text_clean as tc


def test_glyph_clean_cases():
    cases = [
        ("glyph<c=3,font=/AAAAAA+Arial>", ""),
        ("a glyph<123> b", "a b"),
        ("a GLYPH<C=9,FONT=/BBBBBB+Times-Roman> b", "a b"),  # case-insensitive
        ("x glyph<c=1,font=/CCCCCC+Courier>y", "x y"),
        ("  a \t b  ", "a b"),
        ("a\nb", "a\nb"),  # newlines NOT collapsed (reference semantics)
        ("\ta  glyph<77>  b\t", "a b"),
        ("glyph<>", "glyph<>"),  # malformed: not matched
        ("glyph<c=,font=/AAAAAA+Arial>", "glyph<c=,font=/AAAAAA+Arial>"),
    ]
    for raw, want in cases:
        assert tc.clean_text(raw) == want, raw
    # vectorized variant agrees
    arr = pa.array([c[0] for c in cases])
    assert tc.clean_text_arr(arr).to_pylist() == [c[1] for c in cases]


def test_visible_text_and_entities():
    s = '<div class="x">a &amp; b &lt;c&gt; <b>d</b>&nbsp;e</div>'
    vis = tc.visible_text(s)
    assert "<div" not in vis and "&amp;" not in vis
    assert tc.clean_text(vis) == "a & b <c> d e"
    arr = pa.array([s])
    assert tc.clean_text_arr(tc.visible_text_arr(arr)).to_pylist() == ["a & b <c> d e"]


def test_amp_decoded_last():
    # &amp;lt; must become '&lt;' literal, not '<'
    assert tc.visible_text("&amp;lt;") == "&lt;"


def test_word_count_and_anchors():
    s = '<nav><a href="/a">Home</a> | <a href="/b">About us</a></nav>'
    vis = tc.visible_text(s)
    assert tc.word_count(vis) == 4  # Home | About us
    stripped = tc.visible_text(tc.strip_anchors(s))
    assert tc.word_count(stripped) == 1  # just the separator
    arr = pa.array([s])
    assert tc.word_count_arr(tc.visible_text_arr(arr)).to_pylist() == [4]
    assert tc.word_count_arr(
        tc.visible_text_arr(tc.strip_anchors_arr(arr))
    ).to_pylist() == [1]


def test_html_detect():
    assert tc.looks_like_html("<!DOCTYPE html><html>")
    assert tc.looks_like_html("x <div>y</div>")
    assert tc.looks_like_html('<A HREF="/x">y</A>')
    assert not tc.looks_like_html("a < b and c > d")
    assert not tc.looks_like_html("plain text")
    assert not tc.looks_like_html("%PDF-1.7 stream")
