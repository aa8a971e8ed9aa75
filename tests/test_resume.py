"""Resume-equals-fresh and manifest/lineage tests (SURVEY §5.4)."""

from __future__ import annotations

import glob
import json
import os

import pytest

from document_processor_ray.data.synth import write_corpus
from document_processor_ray.pipelines.extract import ExtractConfig
from document_processor_ray.state.manifest import read_output, run_resumable


def _doc_map(out_dir):
    ds = read_output(out_dir)
    rows = ds.take_all()
    return {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]]
        for r in rows
    }


@pytest.mark.usefixtures("ray_session")
def test_resume_equals_fresh(tmp_path):
    in_dir = str(tmp_path / "in")
    write_corpus(in_dir, 120, seed=9, n_files=8)
    cfg = ExtractConfig(parse_concurrency=(1, 2))

    # fresh full run
    fresh = str(tmp_path / "fresh")
    s1 = run_resumable(in_dir, fresh, cfg, n_waves=4, compute_hash=True)
    assert s1["waves_run"] == 4 and s1["waves_skipped"] == 0
    assert s1["rows"] == 120

    # interrupted run: only first 2 waves committed (simulate crash by dropping
    # manifest + output of waves 2,3 from a full run, plus a partial garbage dir)
    resumed = str(tmp_path / "resumed")
    run_resumable(in_dir, resumed, cfg, n_waves=4, compute_hash=True)
    for k in (2, 3):
        os.remove(os.path.join(resumed, "manifest", f"wave-{k:05d}.json"))
    # wave 2 left as partial garbage (no manifest), wave 3 fully gone
    import shutil

    shutil.rmtree(os.path.join(resumed, "waves", "wave-00003"))
    with open(os.path.join(resumed, "waves", "wave-00002", "docs", "garbage.parquet"),
              "ab") as f:
        f.write(b"JUNK")

    s2 = run_resumable(in_dir, resumed, cfg, n_waves=4, compute_hash=True)
    assert s2["waves_run"] == 2 and s2["waves_skipped"] == 2
    assert _doc_map(resumed) == _doc_map(fresh)

    # manifests carry lineage + metrics + matching content hashes
    recs_f = {
        json.load(open(p))["partition_id"]: json.load(open(p))
        for p in glob.glob(os.path.join(fresh, "manifest", "*.json"))
    }
    recs_r = {
        json.load(open(p))["partition_id"]: json.load(open(p))
        for p in glob.glob(os.path.join(resumed, "manifest", "*.json"))
    }
    assert set(recs_f) == set(recs_r) == {0, 1, 2, 3}
    for k in recs_f:
        assert recs_f[k]["input_fragments"] == recs_r[k]["input_fragments"]
        mf, mr = recs_f[k]["metrics"], recs_r[k]["metrics"]
        assert mf["content_hash"] == mr["content_hash"]
        assert mf["rows"] == mr["rows"] and mf["spans"] == mr["spans"]
        assert mf["wall_s"] > 0


@pytest.mark.usefixtures("ray_session")
def test_noop_resume(tmp_path):
    in_dir = str(tmp_path / "in")
    write_corpus(in_dir, 30, seed=2, n_files=3)
    out = str(tmp_path / "out")
    cfg = ExtractConfig(parse_concurrency=(1, 2))
    run_resumable(in_dir, out, cfg, n_waves=3)
    s = run_resumable(in_dir, out, cfg, n_waves=3)
    assert s["waves_run"] == 0 and s["waves_skipped"] == 3 and s["rows"] == 30
