"""Inverted index: build + partition-pruned conjunctive search vs a direct
scan oracle (no library code in the oracle path)."""

from __future__ import annotations

import os
import re

import numpy as np
import pytest

import ray.data as rd

from document_processor_ray.functions.index import (
    build_inverted_index,
    search_index,
    term_partitions,
)


def _docs():
    rng = np.random.RandomState(7)
    vocab = [f"w{j}" for j in range(40)] + ["spark", "window", "needle"]
    rows = []
    for i in range(120):
        rows.append({"doc_id": i,
                     "text": " ".join(rng.choice(vocab, size=rng.randint(3, 60)))})
    rows.append({"doc_id": 120, "text": "   "})       # whitespace-only
    rows.append({"doc_id": 121, "text": "needle"})    # single rare term
    return rows


def _scan_oracle(rows, terms):
    out = set()
    for r in rows:
        toks = set(t for t in re.split(r"[ \t\n\r\f]+", r["text"]) if t)
        if all(t in toks for t in terms):
            out.add(r["doc_id"])
    return out


@pytest.mark.usefixtures("ray_session")
def test_index_search_matches_scan(tmp_path):
    rows = _docs()
    idx = build_inverted_index(rd.from_items(rows), str(tmp_path / "idx"),
                               n_parts=8)
    for terms in (["spark"], ["spark", "window"], ["needle"],
                  ["spark", "window", "needle"], ["absent-term"]):
        df = search_index(idx, terms, n_parts=8).to_pandas()
        got = set(df["doc_id"]) if len(df) else set()
        assert got == _scan_oracle(rows, terms), terms


@pytest.mark.usefixtures("ray_session")
def test_index_layout_and_pruning(tmp_path):
    rows = _docs()
    idx = build_inverted_index(rd.from_items(rows), str(tmp_path / "idx"),
                               n_parts=8)
    parts = sorted(d for d in os.listdir(idx) if d.startswith("part="))
    assert parts and len(parts) <= 8
    # the term's recomputed partition actually contains its posting row —
    # the property the pruned read depends on
    import pyarrow.parquet as pq

    tp = term_partitions(["needle"], n_parts=8)["needle"]
    part_dir = os.path.join(idx, f"part={tp}")
    assert os.path.exists(part_dir)
    found = []
    for f in os.listdir(part_dir):
        t = pq.read_table(os.path.join(part_dir, f), columns=["tok", "postings", "df"])
        found += [
            (tok, post) for tok, post in zip(t["tok"].to_pylist(),
                                             t["postings"].to_pylist())
            if tok == "needle"
        ]
    assert len(found) == 1
    assert found[0][1] == sorted(found[0][1])  # postings sorted
    # duplicate terms dedupe; a query never reads more part dirs than terms
    got = set(search_index(idx, ["needle", "needle"], n_parts=8)
              .to_pandas()["doc_id"])
    assert got == _scan_oracle(rows, ["needle"])


def _bm25_oracle(rows, terms, k1=1.2, b=0.75, top_k=10):
    """Independent BM25 (no library code): same tokenizer, Lucene k1/b form,
    N/avgdl over docs with >=1 token (empty docs emit no postings)."""
    import collections
    import math

    docs = {r["doc_id"]: [t for t in re.split(r"[ \t\n\r\f]+", r["text"]) if t]
            for r in rows}
    nonempty = {d: t for d, t in docs.items() if t}
    n = len(nonempty)
    avgdl = sum(len(t) for t in nonempty.values()) / n
    df = collections.Counter()
    for toks in nonempty.values():
        df.update(set(toks))
    scores = {}
    for d, toks in nonempty.items():
        tf = collections.Counter(toks)
        s = 0.0
        for term in sorted(set(terms)):
            if tf[term]:
                idf = math.log((n - df[term] + 0.5) / (df[term] + 0.5) + 1.0)
                s += (idf * tf[term] * (k1 + 1)
                      / (tf[term] + k1 * (1 - b + b * len(toks) / avgdl)))
        if s > 0.0:
            scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:top_k]


@pytest.mark.usefixtures("ray_session")
def test_bm25_matches_oracle(tmp_path):
    from document_processor_ray.functions.index import bm25_search

    rows = _docs()
    idx = build_inverted_index(rd.from_items(rows), str(tmp_path / "idx"),
                               n_parts=8)
    for terms in (["spark"], ["spark", "window"], ["needle", "w3", "w17"],
                  ["absent-term"], ["absent-term", "needle"]):
        got = bm25_search(idx, terms, n_parts=8, top_k=10).to_pandas()
        want = _bm25_oracle(rows, terms, top_k=10)
        assert list(got["doc_id"]) == [d for d, _ in want], terms
        assert list(got["rank"]) == list(range(1, len(want) + 1))
        for g, (_, w) in zip(got["score"], want):
            assert abs(g - w) < 1e-8, terms


@pytest.mark.usefixtures("ray_session")
def test_index_meta_stats(tmp_path):
    import json

    rows = _docs()
    idx = build_inverted_index(rd.from_items(rows), str(tmp_path / "idx"),
                               n_parts=8)
    meta = json.load(open(os.path.join(idx, "meta.json")))
    toks = [[t for t in re.split(r"[ \t\n\r\f]+", r["text"]) if t] for r in rows]
    nonempty = [t for t in toks if t]
    assert meta["n_docs"] == len(nonempty)
    assert meta["n_tokens"] == sum(len(t) for t in nonempty)
    assert abs(meta["avgdl"] - meta["n_tokens"] / meta["n_docs"]) < 1e-12
