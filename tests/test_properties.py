"""Property-based checks (SURVEY §5.4): hypothesis fuzzing of the scalar kernels
against the oracle's independent implementations, output determinism across runs
and parallelism levels, and conservation invariants."""

from __future__ import annotations

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import oracle
from document_processor_ray.core import codec
from document_processor_ray.functions import text_clean as tc

# text strategy biased toward the interesting alphabet: glyph fragments, tags,
# entities, whitespace runs, unicode
_fragments = list("abcZ19 \t\n<>/=&;#+,-.") + [
    "glyph<", "glyph<123>", "glyph<c=3,font=/AAAAAA+Arial>", "font=/", "&amp;",
    "<a href=\"/x\">", "</a>", "<div>", "</div>", "&lt;", "&nbsp;", "é", "ß", "  ",
]
_texty = st.lists(st.sampled_from(_fragments), max_size=40).map("".join)


@settings(max_examples=300, deadline=None)
@given(_texty)
def test_clean_matches_oracle(s):
    assert tc.clean_text(s) == oracle.clean(s)


@settings(max_examples=300, deadline=None)
@given(_texty)
def test_visible_matches_oracle(s):
    assert tc.visible_text(s) == oracle.visible(s)
    assert tc.word_count(tc.visible_text(s)) == oracle.nwords(oracle.visible(s))


@settings(max_examples=150, deadline=None)
@given(_texty)
def test_vectorized_clean_matches_scalar(s):
    arr = pa.array([s])
    assert tc.clean_text_arr(arr).to_pylist() == [tc.clean_text(s)]
    assert tc.clean_text_arr(tc.visible_text_arr(arr)).to_pylist() == [
        tc.clean_text(tc.visible_text(s))
    ]


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 4096), st.integers(1, 4096), _texty)
def test_codec_image_roundtrip_and_ref_determinism(w, h, text):
    data = codec.encode_image(w, h, text)
    dec = codec.decode_payload(data)
    assert (dec.width, dec.height, dec.text) == (w, h, text)
    r1 = codec.media_ref_of(codec.reencode(dec, tc.clean_text))
    r2 = codec.media_ref_of(codec.reencode(codec.decode_payload(data), tc.clean_text))
    assert r1 == r2 and r1.startswith("media://")
    # oracle computes the same ref independently
    assert r1 == oracle.canonical_ref(("img", w, h, text))


@settings(max_examples=80, deadline=None)
@given(st.lists(st.lists(st.one_of(st.none(), st.integers(-9999, 9999), _texty),
                         min_size=1, max_size=4), min_size=1, max_size=5))
def test_codec_table_roundtrip(rows):
    data = codec.encode_table(rows)
    dec = codec.decode_payload(data)
    assert dec.rows == rows
    assert codec.media_ref_of(codec.reencode(dec, tc.clean_text)) == \
        oracle.canonical_ref(("tbl", rows))
    assert codec.ocr_text(dec) == oracle.ocr_of(("tbl", rows))


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=64))
def test_codec_garbage_rejected(data):
    if data[:6] in (codec.IMG_MAGIC, codec.TBL_MAGIC):
        return
    with pytest.raises(codec.CodecError):
        codec.decode_payload(data)


@pytest.mark.usefixtures("ray_session")
def test_pipeline_deterministic_and_schedule_invariant():
    """Same corpus through different chunking/threshold schedules and repeated
    runs → identical span sequences (offset monotonic, counts conserved)."""
    from document_processor_ray.data.synth import gen_corpus
    from document_processor_ray.pipelines.extract import ExtractConfig, build_extraction

    corpus = gen_corpus(120, seed=21, giant_rate=0.05, mean_spans=18)

    def seqs(cfg):
        rows = build_extraction(corpus, cfg).take_all()
        return {
            r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                          for s in r["spans"]]
            for r in rows
        }

    a = seqs(ExtractConfig(split_threshold=30, chunk_size=7, parse_concurrency=(1, 2)))
    b = seqs(ExtractConfig(split_threshold=60, chunk_size=25, parse_concurrency=(1, 3)))
    c = seqs(ExtractConfig(split_threshold=10_000_000, parse_concurrency=(1, 2)))
    assert a == b == c
    for spans in a.values():
        assert [s[3] for s in spans] == list(range(len(spans)))  # offsets 0..n-1


@given(st.lists(st.text(alphabet="abcxyz0189 ", max_size=12), max_size=6),
       st.lists(st.text(alphabet="abcxyz0189 ", max_size=12), max_size=6))
@settings(max_examples=40, deadline=None)
def test_classifier_score_additive_over_concat(ta, tb):
    """Bag-of-words linearity: score(a ⊕ " " ⊕ b) == score(a) + score(b) for
    any whitespace-joined texts — the invariant that makes the distributed
    per-batch segmented sum correct regardless of how docs are chunked."""
    from document_processor_ray.functions.classify import LinearScorer, synth_weights

    sc = LinearScorer(synth_weights(32))
    a, b = " ".join(ta), " ".join(tb)

    def score(texts):
        t = sc(pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                         "text": pa.array(texts, pa.string())}))
        return t["clf_score"].to_pylist()

    sa, sb, sab = score([a]), score([b]), score([a + " " + b])
    assert sab[0] == sa[0] + sb[0]


@given(st.integers(min_value=-10**17, max_value=10**17),
       st.sampled_from(["k", "key", "n_9", "Z"]))
@settings(max_examples=60, deadline=None)
def test_extract_int_field_roundtrip(v, key):
    from document_processor_ray.functions.semistruct import extract_int_field

    col = pa.array([f'{{"{key}": {v}}}', f'{{"other": 1, "{key}":{v}}}'])
    assert extract_int_field(col, key).to_pylist() == [v, v]
