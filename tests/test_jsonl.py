"""JSONL source/sink round-trips: corpus ingest reconstructs the exact parquet
INPUT_SCHEMA (S2 alternate source format), and the base64 JSONL export (I4
analog — the reference returns base64 media in its JSON response) round-trips
the docs + media tables losslessly."""

from __future__ import annotations

import base64
import glob
import json
import os

import pytest

import sys

sys.path.insert(0, "/root/repo")

from document_processor_ray.data.synth import gen_corpus, write_corpus
from document_processor_ray.pipelines.extract import (
    ExtractConfig, build_extraction, build_media_table)
from document_processor_ray.sources import jsonl as jl


def _span_seqs(rows):
    return {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
            for r in rows}


@pytest.mark.usefixtures("ray_session")
def test_corpus_jsonl_roundtrip_extraction_equal(tmp_path):
    """parquet corpus → JSONL → read_corpus_jsonl → extraction == extraction
    over the original parquet (schema and spans identical)."""
    pq_dir = str(tmp_path / "pq")
    write_corpus(pq_dir, 80, seed=23, n_files=3, giant_rate=0.05)
    jl_dir = jl.write_corpus_jsonl(pq_dir, str(tmp_path / "jl"))

    ds = jl.read_corpus_jsonl(jl_dir)
    # split_threshold below this corpus's max n_spans (66 at this seed) so the
    # giant-doc chunk path genuinely runs off the reconstructed n_spans column
    cfg = ExtractConfig(split_threshold=40, chunk_size=16,
                        parse_concurrency=(1, 3))
    got = build_extraction(ds, cfg).take_all()
    want = build_extraction(pq_dir, cfg).take_all()
    assert _span_seqs(got) == _span_seqs(want)
    # metadata columns were reconstructed, giants took the chunk path
    assert any(r["metrics"]["n_spans_in"] > 40 for r in got)


@pytest.mark.usefixtures("ray_session")
def test_corpus_jsonl_schema_exact(tmp_path):
    from document_processor_ray.core.schema import INPUT_SCHEMA

    corpus = gen_corpus(30, seed=5, media_rate=0.5)
    out = jl.write_corpus_jsonl(corpus, str(tmp_path / "jl"))
    tbl = jl.read_corpus_jsonl(out).take_all()
    assert len(tbl) == 30
    import ray.data as rd

    sch = jl.read_corpus_jsonl(out).schema()
    assert sch.names == INPUT_SCHEMA.names
    # payload bytes survive base64 round-trip exactly
    orig = {p["media_ref"]: p["data"] for row in corpus.to_pylist()
            for p in row["payloads"]}
    for row in tbl:
        for p in row["payloads"]:
            assert p["data"] == orig[p["media_ref"]]


@pytest.mark.usefixtures("ray_session")
def test_docs_and_media_jsonl_export(tmp_path):
    corpus = gen_corpus(40, seed=9, media_rate=0.6)
    cfg = ExtractConfig()
    out = build_extraction(corpus, cfg)
    docs_dir = jl.write_docs_jsonl(out, str(tmp_path / "docs"))
    rows = [json.loads(l) for p in sorted(glob.glob(os.path.join(docs_dir, "*.jsonl")))
            for l in open(p).read().splitlines()]
    assert len(rows) == 40
    want = _span_seqs(build_extraction(corpus, cfg).take_all())
    assert _span_seqs(rows) == want
    assert all("metrics" in r and "spans_meta" in r for r in rows)

    media_dir = jl.write_media_jsonl(build_media_table(corpus, cfg),
                                     str(tmp_path / "media"))
    media = [json.loads(l) for p in sorted(glob.glob(os.path.join(media_dir, "*.jsonl")))
             for l in open(p).read().splitlines()]
    assert media and all("data_b64" in m and "media_ref" in m for m in media)
    # base64 decodes back to the canonical blob whose hash is the ref
    from document_processor_ray.core.codec import media_ref_of

    for m in media[:20]:
        assert media_ref_of(base64.b64decode(m["data_b64"])) == m["media_ref"]
