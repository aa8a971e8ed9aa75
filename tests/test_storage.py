"""Storage seam round-trip (Lance-or-parquet, SURVEY §7.0)."""

from __future__ import annotations

import pytest

from document_processor_ray.data.synth import gen_corpus, write_corpus
from document_processor_ray.sources import storage


@pytest.mark.usefixtures("ray_session")
def test_parquet_roundtrip(tmp_path):
    write_corpus(str(tmp_path / "t"), 30, seed=5, n_files=3)
    ds = storage.read_docs(str(tmp_path / "t"))
    assert ds.count() == 30
    out = str(tmp_path / "o")
    storage.write_docs(ds, out)
    back = storage.read_docs(out)
    assert back.count() == 30
    assert {f.name for f in back.schema().base_schema} >= {"doc_id", "spans", "payloads"}


@pytest.mark.usefixtures("ray_session")
def test_column_pruned_read(tmp_path):
    write_corpus(str(tmp_path / "t"), 10, seed=6, n_files=1)
    ds = storage.read_docs(str(tmp_path / "t"), columns=["doc_id", "n_spans"])
    assert set(ds.schema().names) == {"doc_id", "n_spans"}


def test_lance_flag_is_exercised():
    # lance is absent in this sandbox; the seam must report that and fall back
    assert storage.HAVE_LANCE is False
    assert storage.is_lance_uri("/data/corpus.lance")
    assert not storage.is_lance_uri("/data/corpus_parquet")
