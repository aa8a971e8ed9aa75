"""BPE tokenizer TRAINING at corpus scale (Sennrich et al. 2016,
arXiv 1508.07909): learn the first k merge rules from corpus word-type
frequencies — the "train the tokenizer on the corpus you just curated" stage
that follows dedup/filter in every LLM data pipeline.

Scale shape (the real BPE trick): the CORPUS is touched exactly once — one
vectorized tokenize + value_counts pass producing (word-type, count) partials
collapsed by a vocabulary-scale groupby. Every merge iteration then runs over
the TYPE table (vocabulary-scale, not corpus-scale): one adjacent-pair count
(map_batches partials → tiny groupby → bounded top-1) and one vectorized merge
application (`pc.replace_substring`, an Arrow kernel). k iterations cost k
vocabulary-scale exchanges — the iterated-kmeans shape, never a corpus pass.

Cross-engine determinism: word symbol sequences are encoded as
DOUBLED-separator strings ``SS c1 SS c2 SS`` (S = U+001F, never in
whitespace-split tokens), so applying merge (a, b) is literally
``replace(sym, S+a+SS+b+S, S+a+b+S)`` — and left-to-right non-overlapping
`replace` on this encoding reproduces greedy BPE pair merging exactly, with
identical semantics in Arrow `replace_substring`, Python `str.replace`, and
DuckDB `replace` (each occurrence consumes one private separator from each
side, so chains like [a,b,a,b] merge fully in one pass while [a,a,a] merges
once, exactly as greedy BPE does). Ties on pair count break (a ASC, b ASC).
All counts are int64 ⇒ the merge table is SQL-hash-checkable.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

SEP = "\x1f"
SEP2 = SEP * 2


def _to_sym(tok_col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Word type → doubled-separator symbol string over its codepoints.
    Per-unique-type Python loop — TYPE-scale (vocabulary), never corpus-scale
    (the dedup unique-token-hash precedent)."""
    if isinstance(tok_col, pa.ChunkedArray):
        tok_col = tok_col.combine_chunks()
    return pa.array([SEP2 + SEP2.join(t) + SEP2 for t in tok_col.to_pylist()],
                    pa.string())


def _pair_partials(b: pa.Table) -> pa.Table:
    """(sym, n) batch → (a, b, c) adjacent-symbol-pair count partials, one
    Arrow split + numpy shift, no per-row loop."""
    sym = b["sym"]
    if isinstance(sym, pa.ChunkedArray):
        sym = sym.combine_chunks()
    ls = pc.split_pattern(sym, pattern=SEP2)  # ['', c1, .., ck, ''] per word
    flat = pc.list_flatten(ls)
    parent = pc.list_parent_indices(ls).to_numpy(zero_copy_only=False)
    valid = pc.not_equal(flat, "").to_numpy(zero_copy_only=False).astype(bool)
    n = b["n"].to_numpy(zero_copy_only=False)
    idx = np.arange(len(parent) - 1) if len(parent) else np.arange(0)
    m = (parent[idx] == parent[idx + 1]) & valid[idx] & valid[idx + 1] \
        if len(parent) > 1 else np.zeros(0, bool)
    left = flat.take(pa.array(idx[m]))
    right = flat.take(pa.array(idx[m] + 1))
    cnt = n[parent[idx[m]]] if len(parent) > 1 else np.zeros(0, np.int64)
    return pa.table({"a": left, "b": right,
                     "c": pa.array(cnt.astype(np.int64), pa.int64())})


def bpe_merges(types: rd.Dataset, n_merges: int) -> pa.Table:
    """Learn ``n_merges`` BPE merge rules from a (tok, n) word-type table.
    Returns the merge table (it, a, b, merged, cnt) — it = 1-based iteration.
    Raises if the type table runs out of pairs before ``n_merges`` (loud
    divergence beats a silently short table)."""
    from ray.data.aggregate import Sum

    def enc(b: pa.Table) -> pa.Table:
        return pa.table({"sym": _to_sym(b["tok"]), "n": b["n"]})

    cur = types.map_batches(enc, batch_format="pyarrow").materialize()
    rows = []
    for it in range(1, n_merges + 1):
        top = (cur.map_batches(_pair_partials, batch_format="pyarrow")
               .groupby(["a", "b"]).aggregate(Sum("c", alias_name="c"))
               .sort(["c", "a", "b"], descending=[True, False, False])
               .limit(1).take_all())
        if not top:
            raise ValueError(f"type table exhausted after {it - 1} merges")
        a, b_, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        rows.append({"it": it, "a": a, "b": b_, "merged": a + b_, "cnt": c})
        pat, rep = SEP + a + SEP2 + b_ + SEP, SEP + a + b_ + SEP

        def apply(t: pa.Table, pat=pat, rep=rep) -> pa.Table:
            s = t["sym"]
            if isinstance(s, pa.ChunkedArray):
                s = s.combine_chunks()
            return pa.table({"sym": pc.replace_substring(
                s, pattern=pat, replacement=rep), "n": t["n"]})

        cur = cur.map_batches(apply, batch_format="pyarrow").materialize()
    return pa.table({
        "it": pa.array([r["it"] for r in rows], pa.int64()),
        "a": pa.array([r["a"] for r in rows], pa.string()),
        "b": pa.array([r["b"] for r in rows], pa.string()),
        "merged": pa.array([r["merged"] for r in rows], pa.string()),
        "cnt": pa.array([r["cnt"] for r in rows], pa.int64())})


def bpe_symbol_counts(types: rd.Dataset, merges: pa.Table) -> rd.Dataset:
    """ENCODE side: apply a learned merge table to the word-type table and
    return (tok, k) — the BPE symbol count of every type. k sequential
    vectorized `replace_substring` passes over the TYPE table (never the
    corpus); per-doc BPE lengths then come from a broadcast tok→k lookup
    inside a corpus `map_batches` pass (the production tokenizer-apply
    shape: the merge table ships to workers, the corpus never shuffles)."""
    pairs = list(zip(merges["a"].to_pylist(), merges["b"].to_pylist()))

    def enc(b: pa.Table) -> pa.Table:
        sym = _to_sym(b["tok"])
        for a, b_ in pairs:
            sym = pc.replace_substring(sym, pattern=SEP + a + SEP2 + b_ + SEP,
                                       replacement=SEP + a + b_ + SEP)
        k = pc.subtract(pc.count_substring(sym, SEP2), 1)
        return pa.table({"tok": b["tok"], "k": pc.cast(k, pa.int64())})

    return types.map_batches(enc, batch_format="pyarrow")
