"""C4-style duplicate-chunk removal: naive-oracle parity + invariances."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd


def _naive(texts: dict[int, str], width: int = 8):
    """Reference keep-first chunk dedup, row-at-a-time Python."""
    occ: list[tuple[str, int, int, int]] = []  # (chunk, doc_id, chunk_no, n_words)
    for doc_id, text in texts.items():
        toks = [t for t in text.split() if t]
        for j in range(0, (len(toks) + width - 1) // width):
            ch = toks[j * width:(j + 1) * width]
            occ.append((" ".join(ch), doc_id, j, len(ch)))
    first = {}
    for ch, d, j, _ in sorted(occ, key=lambda o: (o[1], o[2])):
        first.setdefault(ch, (d, j))
    out: dict[int, list[int]] = {}
    for ch, d, j, w in occ:
        st = out.setdefault(d, [0, 0, 0])
        st[0] += 1
        if first[ch] == (d, j):
            st[1] += 1
            st[2] += w
    return {d: tuple(v) for d, v in out.items()}


def _corpus():
    # doc 3 repeats doc 1's first chunk; doc 2 repeats its own chunk twice;
    # doc 4 is shorter than one chunk; doc 5 is empty (emits no row)
    base = "a b c d e f g h"
    return {
        1: base + " i j k l m n o p",
        2: "x y " + base,          # offset breaks alignment: distinct chunks
        3: base + " q r",
        4: "z w",
        5: "",
        6: base + " " + base,      # chunk 0 == chunk 1 within one doc
    }


def test_chunk_dedup_matches_naive(ray_session):
    from document_processor_ray.functions.dedup import chunk_dedup_stats

    texts = _corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(texts), pa.int64()),
        "text": pa.array(list(texts.values()), pa.string())}))
    got = {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_words"])
           for r in chunk_dedup_stats(ds, width=8).take_all()}
    want = _naive(texts, width=8)
    assert got == want
    assert 5 not in got                      # empty doc emits no row
    assert got[4] == (1, 1, 2)               # short doc: one partial chunk
    # doc 6 = doc 1's first chunk twice: keeper is doc 1 (smaller doc_id),
    # so both of doc 6's chunks drop — intra- and cross-doc repeats together
    assert got[6] == (2, 0, 0)


def test_chunk_dedup_repartition_invariant(ray_session):
    from document_processor_ray.functions.dedup import chunk_dedup_stats

    rng = np.random.default_rng(5)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = {i: " ".join(rng.choice(vocab, rng.integers(0, 40)))
             for i in range(80)}
    tbl = pa.table({"doc_id": pa.array(list(texts), pa.int64()),
                    "text": pa.array(list(texts.values()), pa.string())})
    a = {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_words"])
         for r in chunk_dedup_stats(rd.from_arrow(tbl), width=4).take_all()}
    b = {r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_words"])
         for r in chunk_dedup_stats(
             rd.from_arrow(tbl).repartition(13), width=4, n_parts=7).take_all()}
    assert a == b == _naive(texts, width=4)


def test_doc_chunks_kernel_edges():
    from document_processor_ray.functions.dedup import doc_chunks

    texts = pa.array(["a b c", "", "  x   y  ", None, "p q r s t"])
    chunks, parent, chunk_no, n_words = doc_chunks(texts, width=2)
    assert chunks.to_pylist() == ["a b", "c", "x y", "p q", "r s", "t"]
    assert parent.tolist() == [0, 0, 2, 4, 4, 4]
    assert chunk_no.tolist() == [0, 1, 0, 0, 1, 2]
    assert n_words.tolist() == [2, 1, 2, 2, 2, 1]

    empty = doc_chunks(pa.array([], pa.string()), width=4)
    assert len(empty[0]) == 0 and len(empty[1]) == 0
