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


@pytest.mark.skipif(not storage.HAVE_LANCE,
                    reason="lance not installed in this sandbox")
@pytest.mark.usefixtures("ray_session")
def test_lance_roundtrip_matches_parquet_schema(tmp_path):
    """Where ``lance`` exists, write_docs/read_docs on a .lance uri must
    round-trip with a schema identical to the parquet path — keeps the seam
    from rotting (skip-marked in the sandbox, runs in lance-equipped CI)."""
    write_corpus(str(tmp_path / "t"), 20, seed=7, n_files=2)
    ds = storage.read_docs(str(tmp_path / "t"))

    pq_out = str(tmp_path / "o_pq")
    storage.write_docs(ds, pq_out)
    pq_back = storage.read_docs(pq_out)

    lance_out = str(tmp_path / "o.lance")
    storage.write_docs(ds, lance_out)
    assert storage.is_lance_uri(lance_out)
    lance_back = storage.read_docs(lance_out)

    assert lance_back.count() == pq_back.count() == 20
    assert lance_back.schema().base_schema == pq_back.schema().base_schema
    # column-pruned read parity on the Lance path
    pruned = storage.read_docs(lance_out, columns=["doc_id", "n_spans"])
    assert set(pruned.schema().names) == {"doc_id", "n_spans"}
