"""Sliding-window chunking: pure-function edge cases vs a naive oracle (the
corpus-level equality is the SQL-hash-checked `chunk_windows` query)."""

from __future__ import annotations

import re

import pyarrow as pa

from document_processor_ray.functions.chunk import chunk_batch


def _oracle(rows, window, stride):
    out = []
    for r in rows:
        toks = [t for t in re.split(r"[ \t\n\r\f]+", r["text"]) if t]
        for ci, s in enumerate(range(0, len(toks), stride)):
            w = toks[s:s + window]
            out.append((r["doc_id"], ci, len(w), " ".join(w)))
    return out


def _run(rows, window=4, stride=3):
    b = pa.table({"doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
                  "text": pa.array([r["text"] for r in rows])})
    t = chunk_batch(b, window=window, stride=stride)
    return list(zip(t["doc_id"].to_pylist(), t["chunk_id"].to_pylist(),
                    t["n_tokens"].to_pylist(), t["chunk"].to_pylist()))


def test_chunk_edge_cases():
    rows = [
        {"doc_id": 0, "text": ""},                       # empty -> no chunks
        {"doc_id": 1, "text": "   \t\n "},               # ws-only -> no chunks
        {"doc_id": 2, "text": "a b"},                    # shorter than window
        {"doc_id": 3, "text": "a b c d e f"},            # n == 2*stride exactly
        {"doc_id": 4, "text": "a  b\tc\nd e f g"},       # runs of whitespace
        {"doc_id": 5, "text": " ".join(f"t{i}" for i in range(11))},
    ]
    assert _run(rows) == _oracle(rows, 4, 3)


def test_chunk_overlap_and_coverage():
    rows = [{"doc_id": 7, "text": " ".join(str(i) for i in range(100))}]
    got = _run(rows, window=16, stride=10)
    assert got == _oracle(rows, 16, 10)
    # consecutive windows overlap by window - stride tokens
    first = got[0][3].split()
    second = got[1][3].split()
    assert first[10:] == second[:6]
    # every token of the doc appears in at least one chunk
    seen = set(t for _, _, _, c in got for t in c.split())
    assert seen == {str(i) for i in range(100)}


def test_chunk_batch_equals_per_row():
    rows = [{"doc_id": i, "text": " ".join(f"w{(i*j) % 13}" for j in range(i))}
            for i in range(20)]
    whole = _run(rows, window=5, stride=4)
    per_row = [c for r in rows for c in _run([r], window=5, stride=4)]
    assert whole == per_row
