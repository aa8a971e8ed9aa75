"""t2-scale golden test (FIXTURES §1: correctness ≈ 2000 docs) and parallelism
invariance: the same corpus processed under a different Ray session size yields
byte-identical span sequences (SURVEY §5.5)."""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys

import pytest

import oracle
from document_processor_ray.data.synth import gen_corpus, write_corpus
from document_processor_ray.pipelines.extract import ExtractConfig, build_extraction


def _corpus_digest(rows) -> str:
    doc_hashes = []
    for r in rows:
        h = hashlib.sha256(r["doc_id"].encode())
        for s in r["spans"]:
            h.update(f"|{s['kind']}\x00{s['text']}\x00{s['media_ref']}".encode())
        doc_hashes.append(h.hexdigest())
    return hashlib.sha256("".join(sorted(doc_hashes)).encode()).hexdigest()


@pytest.mark.usefixtures("ray_session")
def test_t2_golden_2000_docs():
    corpus = gen_corpus(2000, seed=42)
    rows = build_extraction(corpus, ExtractConfig(split_threshold=200, chunk_size=64,
                                                  parse_concurrency=(1, 3))).take_all()
    want = oracle.extract_corpus(corpus.to_pylist())
    assert len(rows) == 2000
    got = {r["doc_id"]: [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
           for r in rows}
    exp = {d: [(s["kind"], s["text"], s["media_ref"]) for s in w["spans"]]
           for d, w in want.items()}
    assert got == exp


_SUBPROC = r"""
import sys, json, hashlib
import ray
ray.init(address="local", num_cpus=3, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from document_processor_ray.pipelines.extract import ExtractConfig, build_extraction
rows = build_extraction(sys.argv[1], ExtractConfig(split_threshold=40, chunk_size=16,
                                                   parse_concurrency=(1, 2))).take_all()
doc_hashes = []
for r in rows:
    h = hashlib.sha256(r["doc_id"].encode())
    for s in r["spans"]:
        h.update(f"|{s['kind']}\x00{s['text']}\x00{s['media_ref']}".encode())
    doc_hashes.append(h.hexdigest())
print(json.dumps({"n": len(rows),
                  "digest": hashlib.sha256("".join(sorted(doc_hashes)).encode()).hexdigest()}))
ray.shutdown()
"""


@pytest.mark.usefixtures("ray_session")
def test_parallelism_invariance_across_sessions(tmp_path):
    """num_cpus=4 (this session) vs num_cpus=3 (fresh process) → identical output.

    (A 2-CPU session wedges: the union plan holds two actor pools of min 1 each,
    leaving no task CPUs — documented floor is pools + 1.)"""
    in_dir = str(tmp_path / "in")
    write_corpus(in_dir, 150, seed=33, giant_rate=0.04, mean_spans=16, n_files=4)
    rows = build_extraction(in_dir, ExtractConfig(split_threshold=40, chunk_size=16,
                                                  parse_concurrency=(1, 2))).take_all()
    here = {"n": len(rows), "digest": _corpus_digest(rows)}
    out = subprocess.run([sys.executable, "-c", _SUBPROC, in_dir],
                         capture_output=True, text=True, cwd="/root/repo", timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    there = json.loads(out.stdout.strip().splitlines()[-1])
    assert here == there
