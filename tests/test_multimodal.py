"""Multimodal stage tests: real Ray plumbing, synthetic codec engine."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from document_processor_ray.core import codec
from document_processor_ray.data.synth import gen_corpus
from document_processor_ray.stages import multimodal as mm


def _media_items():
    return [
        {"media_ref": "m1", "data": codec.encode_image(640, 480, "hello ocr")},
        {"media_ref": "m2", "data": codec.encode_image(100, 2000, "tall")},
        {"media_ref": "m3", "data": codec.encode_table([["h1", "h2"], ["a", 1], ["b", None]])},
        {"media_ref": "m4", "data": b"CORRUPT-BYTES"},
    ]


@pytest.mark.usefixtures("ray_session")
def test_media_decode_stage():
    ds = rd.from_items(_media_items())
    out = ds.map_batches(mm.MediaDecode, batch_format="pyarrow",
                         concurrency=(1, 2), batch_size=2).to_pandas()
    out = out.set_index("media_ref")
    assert out.loc["m1"].content_type == "image/x-synth"
    assert (out.loc["m1"].width, out.loc["m1"].height) == (640, 480)
    assert out.loc["m3"].content_type == "table/x-synth"
    assert not out.loc["m4"].ok and out.loc["m4"].content_type == ""


@pytest.mark.usefixtures("ray_session")
def test_image_resize_stage():
    ds = rd.from_items(_media_items())
    out = ds.map_batches(mm.ImageResize, fn_constructor_kwargs={"max_w": 320, "max_h": 320},
                         batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    out = out.set_index("media_ref")
    assert len(out) == 2  # tables/corrupt rows dropped
    assert (out.loc["m1"].width, out.loc["m1"].height) == (320, 240)
    assert out.loc["m2"].height == 320 and out.loc["m2"].width == 16
    # output payload decodes with the new dims and same embedded text
    dec = codec.decode_payload(out.loc["m1"].data)
    assert (dec.width, dec.height, dec.text) == (320, 240, "hello ocr")


@pytest.mark.usefixtures("ray_session")
def test_media_features_deterministic():
    ds = rd.from_items(_media_items()[:3])
    f1 = ds.map_batches(mm.MediaFeatures, batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    f2 = ds.map_batches(mm.MediaFeatures, batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    # actor-pool output block order is not guaranteed across runs — compare
    # per media_ref, not positionally
    f2_by_ref = dict(zip(f2.media_ref, f2.feature))
    assert set(f1.media_ref) == set(f2_by_ref)
    for ref, a in zip(f1.media_ref, f1.feature):
        assert np.allclose(a, f2_by_ref[ref])
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-5 for v in f1.feature)
    assert len(f1.feature.iloc[0]) == 64


@pytest.mark.usefixtures("ray_session")
def test_frame_sample():
    ds = rd.from_items([_media_items()[2]])
    out = ds.map_batches(mm.FrameSample, fn_constructor_kwargs={"every": 2},
                         batch_format="pyarrow", concurrency=(1, 2)).to_pandas()
    assert out.frame_idx.tolist() == [0, 2]
    assert all(f.startswith("frame://") for f in out.frame_ref)


def test_real_engine_gated():
    with pytest.raises(NotImplementedError):
        mm.MediaDecode(engine="real")
    with pytest.raises(NotImplementedError):
        mm.ImageResize(engine="pil")


@pytest.mark.usefixtures("ray_session")
def test_media_table_from_corpus():
    corpus = gen_corpus(40, seed=6, media_rate=0.5)
    ds = rd.from_arrow(corpus)
    meta = mm.media_table_from_corpus(ds).to_pandas()
    n_payloads = sum(len(p) for p in corpus["payloads"].to_pylist())
    assert len(meta) == n_payloads
    assert meta.ok.mean() > 0.8  # corrupt_rate is small
