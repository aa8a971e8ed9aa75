"""F3 span-range selection and I3 media format/quality config knobs."""

from __future__ import annotations

import pytest

from document_processor_ray.core import codec
from document_processor_ray.data.synth import gen_corpus
from document_processor_ray.pipelines.extract import (ExtractConfig,
                                                      build_extraction,
                                                      build_media_table)

import oracle


def _seqs(rows):
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in r["spans"]] for r in rows}


@pytest.mark.usefixtures("ray_session")
def test_span_range_matches_oracle():
    corpus = gen_corpus(150, seed=21, giant_rate=0.03)
    rng = (2, 7)
    out = build_extraction(
        corpus, ExtractConfig(split_threshold=80, chunk_size=30,
                              first_span=rng[0], last_span=rng[1])
    ).take_all()
    got = _seqs(out)
    want = _seqs([oracle.extract_doc(r, span_range=rng)
                  for r in corpus.to_pylist()])
    assert got == want
    # the range genuinely truncates: every doc has at most 6 input spans now
    assert all(r["metrics"]["n_spans_in"] <= 6 for r in out)
    # open-ended range: first_span only
    out2 = build_extraction(
        corpus, ExtractConfig(split_threshold=80, chunk_size=30, first_span=5)
    ).take_all()
    want2 = _seqs([oracle.extract_doc(r, span_range=(5, None))
                   for r in corpus.to_pylist()])
    assert _seqs(out2) == want2


def test_media_format_quality_knobs():
    img = codec.DecodedImage(64, 32, "some  glyph<123> text")
    clean = oracle.clean
    default = codec.reencode(img, clean)
    raw = codec.reencode(img, clean, fmt="synth-raw")
    fast = codec.reencode(img, clean, quality=1)
    assert default[:6] == codec.ENC_IMG_MAGIC
    assert raw[:6] == codec.ENC_IMG_RAW_MAGIC
    # all three decode back to identical content (lossless format/quality)
    for blob in (default, raw, fast):
        dec = codec.decode_canonical(blob)
        assert (dec.width, dec.height, dec.text) == (64, 32, clean(img.text))
    # content addressing: different bytes → different refs, deterministically
    assert codec.media_ref_of(raw) != codec.media_ref_of(default)
    assert codec.reencode(img, clean, fmt="synth-raw") == raw
    with pytest.raises(ValueError):
        codec.reencode(img, clean, fmt="webp")

    tbl = codec.DecodedTable([["h", "i"], ["a", 1], [None, "glyph<9>"]])
    t_default = codec.reencode(tbl, clean)
    t_fast = codec.reencode(tbl, clean, quality=0)
    assert codec.decode_canonical(t_fast).rows == codec.decode_canonical(t_default).rows


@pytest.mark.usefixtures("ray_session")
def test_media_table_honors_format_config():
    corpus = gen_corpus(40, seed=22, media_rate=0.6)
    default = build_media_table(corpus, ExtractConfig()).take_all()
    raw = build_media_table(
        corpus, ExtractConfig(media_format="synth-raw", media_quality=1)
    ).take_all()
    d_imgs = {m["media_ref"] for m in default if m["content_type"] == "image/x-synth"}
    r_imgs = {m["media_ref"] for m in raw if m["content_type"] == "image/x-synth"}
    assert len(d_imgs) == len(r_imgs) and d_imgs.isdisjoint(r_imgs)
    for m in raw:
        if m["content_type"] == "image/x-synth":
            assert bytes(m["data"][:6]) == codec.ENC_IMG_RAW_MAGIC
        dec = codec.decode_canonical(m["data"])  # every blob round-trips
        assert dec is not None


@pytest.mark.usefixtures("ray_session")
def test_ocr_pipeline_modes_match_oracle():
    """SPEC §6a: fast/full/hybrid each match the oracle arm, including over the
    chunked giant-doc path, and the metrics ocr_path distribution follows the
    forced mode."""
    corpus = gen_corpus(150, seed=33, giant_rate=0.04)
    rows = corpus.to_pylist()
    for mode in ("fast", "full", "hybrid"):
        out = build_extraction(
            corpus, ExtractConfig(split_threshold=80, chunk_size=30,
                                  ocr_pipeline=mode)).take_all()
        got = _seqs(out)
        want = _seqs([oracle.extract_doc(r, ocr_pipeline=mode) for r in rows])
        assert got == want, mode
        paths = {r["metrics"]["ocr_path"] for r in out
                 if r["metrics"]["doc_class"] != "empty"}
        if mode in ("fast", "full"):
            assert paths <= {mode}, (mode, paths)
        else:
            assert paths == {"fast", "full"}  # the corpus exercises both arms
    # forced modes genuinely diverge from hybrid on scanned docs
    full = _seqs([oracle.extract_doc(r, ocr_pipeline="full") for r in rows])
    fast = _seqs([oracle.extract_doc(r, ocr_pipeline="fast") for r in rows])
    assert full != fast


def test_media_scale_knob():
    """I3 image_scale analog: scaled dims in the re-encoded blob, tables
    unaffected, invalid scale rejected."""
    img = codec.DecodedImage(64, 32, "some text")
    base = codec.reencode(img, oracle.clean)
    s2 = codec.reencode(img, oracle.clean, scale=2)
    dec = codec.decode_canonical(s2)
    assert (dec.width, dec.height, dec.text) == (128, 64, "some text")
    assert codec.media_ref_of(s2) != codec.media_ref_of(base)
    assert codec.reencode(img, oracle.clean, scale=2) == s2  # deterministic
    tbl = codec.DecodedTable([["a", 1, None]])
    assert codec.reencode(tbl, oracle.clean, scale=3) == codec.reencode(tbl, oracle.clean)
    with pytest.raises(ValueError):
        codec.reencode(img, oracle.clean, scale=0)


@pytest.mark.usefixtures("ray_session")
def test_page_screenshots_match_oracle():
    """SPEC §7 page screenshot records: one per laid-out page, blob and ref
    reconstructed independently from the oracle's layout."""
    import hashlib
    import struct
    import zlib

    from document_processor_ray.pipelines.extract import build_page_screenshots

    corpus = gen_corpus(120, seed=55, giant_rate=0.03)
    out = build_extraction(
        corpus, ExtractConfig(split_threshold=80, chunk_size=30))
    got: dict[str, list] = {}
    for r in build_page_screenshots(out).take_all():
        got.setdefault(r["doc_id"], []).append(r)
    total = 0
    for row in corpus.to_pylist():
        exp = oracle.extract_doc(row)
        metas = oracle.layout_of(exp["spans"])
        n_pages = max((p["page_no"] for m in metas for p in m["positions"]),
                      default=0)
        mine = sorted(got.get(row["doc_id"], []), key=lambda r: r["page_no"])
        assert [r["page_no"] for r in mine] == list(range(1, n_pages + 1))
        for r in mine:
            blob = (b"EPAG1\0" + struct.pack("<II", 612, 792)
                    + zlib.compress(f"{row['doc_id']}\0{r['page_no']}".encode(), 9))
            assert r["data"] == blob
            assert r["media_ref"] == "media://" + hashlib.sha256(blob).hexdigest()[:16]
            assert (r["width"], r["height"], r["content_type"]) == (612, 792, "page/x-synth")
        total += n_pages
    assert total > 120  # corpus exercises multi-page docs
