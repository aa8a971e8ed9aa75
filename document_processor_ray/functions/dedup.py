"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB (SURVEY §4.3, ray_guide "Aggregation at scale"):

- exact: content hash computed batch-side (vectorized), then ONE shuffle
  ``groupby(text_sha)`` over (hash, doc_id) pairs only — never the text bodies.
- MinHash-LSH: shingle→signature per batch (numpy, one pass), explode to
  (band, band_hash, doc_id, sig) rows, ``groupby(band, band_hash)`` → candidate
  pairs verified by signature agreement — the shuffle carries 512-byte signatures,
  not documents.
- SimHash: 64-bit signatures, banded by 4×16-bit chunks (pigeonhole: hamming ≤ 3
  ⇒ some band equal), verified by popcount.
- embedding cosine: guarded hybrid — exact streaming block-pair matmul (object
  store blocks, never the driver) below a row bound, hyperplane-LSH bucketing
  above it where N² is infeasible.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd

_MERSENNE = np.uint64((1 << 61) - 1)

# Hot-bucket guard (hamming/LSH families): a (band, key) bucket with more than
# this many members switches from all-pairs verification to adjacent-chain
# linking (sorted by id, compare consecutive members only). On a real crawl,
# thousands of byte-identical docs share every band — all-pairs would emit
# O(n^2) rows from ONE reducer. Chain linking keeps the bucket's members
# connected (identical/near-identical docs still collapse to one cluster via
# dedup_clusters) with O(n) pairs. Contract: run exact_dedup FIRST so
# byte-identical mass never reaches LSH; the cap is the backstop when that
# ordering is violated. Overflows are counted on a named actor — see
# ``bucket_overflow_stats``.
MAX_BUCKET = 256


@ray.remote(num_cpus=0)
class _OverflowCounter:
    def __init__(self):
        self.buckets = 0
        self.members = 0
        self.by_kind: dict[str, int] = {}

    def add(self, kind: str, size: int) -> None:
        self.buckets += 1
        self.members += size
        self.by_kind[kind] = self.by_kind.get(kind, 0) + 1

    def get(self) -> dict:
        return {"buckets": self.buckets, "members": self.members,
                "by_kind": dict(self.by_kind)}

    def reset(self) -> None:
        self.buckets = 0
        self.members = 0
        self.by_kind = {}


_OVERFLOW_ACTOR = "dedup_bucket_overflow"


def _note_overflow(kind: str, size: int) -> None:
    """Record a hot-bucket overflow on the named counter actor. Created lazily
    (zero cost on corpora with no oversized buckets); failures are swallowed —
    the metric must never fail the pipeline."""
    try:
        actor = _OverflowCounter.options(
            name=_OVERFLOW_ACTOR, get_if_exists=True,
            lifetime="detached").remote()
        actor.add.remote(kind, size)
    except Exception:
        pass


def bucket_overflow_stats(reset: bool = False) -> dict:
    """Read (and optionally reset) the hot-bucket overflow metric. Returns {}
    if no bucket has ever overflowed in this cluster."""
    try:
        actor = ray.get_actor(_OVERFLOW_ACTOR)
    except ValueError:
        return {}
    out = ray.get(actor.get.remote())
    if reset:
        ray.get(actor.reset.remote())
    return out


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a u64 array (numpy 1.26 lacks bitwise_count)."""
    return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                         axis=1).sum(axis=1).astype(np.int64)


def _bucket_pair_index(m: int, cap: int, kind: str) -> tuple[np.ndarray, np.ndarray]:
    """(i, j) pair indices for one bucket of ``m`` sorted members: all pairs
    (np.triu_indices) within the cap, adjacent-chain above it (see MAX_BUCKET)."""
    if m > cap:
        _note_overflow(kind, m)
        ii = np.arange(m - 1)
        return ii, ii + 1
    return np.triu_indices(m, k=1)


def _stable_u64(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit hashes (blake2b) — process-independent, unlike hash()."""
    return np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
         for t in tokens],
        dtype=np.uint64,
    )


def add_text_sha(batch: pa.Table, text_col: str = "text") -> pa.Table:
    shas = [hashlib.sha256((t or "").encode()).hexdigest()
            for t in batch[text_col].to_pylist()]
    return batch.append_column("text_sha", pa.array(shas, pa.string()))


def exact_dedup(ds: rd.Dataset, id_col: str = "doc_id",
                text_col: str = "text") -> rd.Dataset:
    """Keep the min-id representative per identical text. Returns
    (text_sha, doc_id, n_dupes); the shuffle carries only (sha, id) pairs,
    partitioned coarsely (groupops) — never one Ray group per hash."""
    from ..core.groupops import grouped_reduce

    hashed = ds.map_batches(
        lambda b: add_text_sha(b, text_col).select(["text_sha", id_col]),
        batch_format="pyarrow",
    )

    def reduce_part(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby("text_sha")[id_col].agg(["min", "size"]).reset_index()
        return agg.rename(columns={"min": "doc_id", "size": "n_dupes"})

    return grouped_reduce(hashed, ["text_sha"], reduce_part)


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _flat_token_hashes(texts: pa.Array | pa.ChunkedArray,
                       cache: dict[str, int],
                       hasher: str = "blake2b") -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize a whole batch (one RE-free Arrow kernel, identical
    semantics to Python ``str.split()``) and hash each token to u64 —
    hashing each UNIQUE token once per batch (dictionary-encode) with a
    persistent cross-batch cache. Returns (flat doc-major token hashes,
    per-doc token counts). This replaces the per-token Python dict probe that
    was the hottest dedup kernel.

    ``hasher``: ``blake2b`` (default, the dedup/MinHash hash) or ``md5`` —
    bytes 8..16 of the digest little-endian, bit-identical to DuckDB's
    ``md5_number_lower``, which makes downstream consumers (the hashing-trick
    featurizer) SQL-mirrorable."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, "")  # edge whitespace yields "" elements
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    mask = nonempty.to_numpy(zero_copy_only=False).astype(bool)
    counts = np.bincount(parent[mask], minlength=n).astype(np.int64)
    denc = flat.filter(nonempty).dictionary_encode()
    uniq = denc.dictionary.to_pylist()
    uh = np.empty(len(uniq), dtype=np.uint64)
    for i, t in enumerate(uniq):
        h = cache.get(t)
        if h is None:
            if hasher == "md5":
                h = int.from_bytes(hashlib.md5(t.encode()).digest()[8:],
                                   "little")
            else:
                h = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(),
                    "little")
            if len(cache) < 1_000_000:
                cache[t] = h
        uh[i] = h
    idx = denc.indices.to_numpy(zero_copy_only=False)
    return uh[idx], counts


class MinHashSigner:
    """Actor-pool stage: word-shingle MinHash signatures. Permutation parameters
    and the token-hash cache are built once per actor (deterministic seed, so
    signatures are identical across the cluster). The whole batch is processed
    vectorized: one Arrow tokenize+dictionary-encode, flat shingle polynomial
    mixing over the doc-major token-hash array, and the per-permutation minima
    via ``np.minimum.reduceat`` over doc segments — no per-doc or per-token
    Python in the hot loop."""

    _C1 = np.uint64(0x9E3779B97F4A7C15)
    _C2 = np.uint64(0xBF58476D1CE4E5B9)
    _C3 = np.uint64(0x94D049BB133111EB)
    _PERM_CHUNK = 8  # bounds the (chunk, n_shingles) u64 temp to a few MB

    def __init__(self, k: int = 64, shingle: int = 3, text_col: str = "text",
                 id_col: str = "doc_id", seed: int = 1234):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=k, dtype=np.uint64) | np.uint64(1)
        self.b = rng.randint(0, (1 << 61) - 1, size=k, dtype=np.uint64)
        self.k, self.shingle = k, shingle
        self.text_col, self.id_col = text_col, id_col
        self._tok_cache: dict[str, int] = {}

    def _tok_hashes(self, toks: list[str]) -> np.ndarray:
        cache = self._tok_cache
        out = np.empty(len(toks), dtype=np.uint64)
        for i, t in enumerate(toks):
            h = cache.get(t)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
                if len(cache) < 1_000_000:
                    cache[t] = h
            out[i] = h
        return out

    def signature(self, text: str) -> np.ndarray:
        """Scalar reference path (kept for tests/verification; __call__ does not
        use it). Must stay output-identical to the batch path."""
        toks = (text or "").split()
        n = self.shingle
        if not toks:
            h = np.zeros(1, dtype=np.uint64)
        else:
            th = self._tok_hashes(toks)
            if len(th) < n:
                h = th[:1].copy()
                for x in th[1:]:
                    h = h * self._C1 + x
            else:
                # vectorized 3-token polynomial shingle hash (wraps mod 2^64)
                h = th[: len(th) - n + 1] * self._C1
                for j in range(1, n):
                    h = h + th[j : len(th) - n + 1 + j] * (self._C2 if j == 1 else self._C3)
                h = np.unique(h)
        # sig[i] = min over shingles of (a_i * h + b_i) mod 2^61-1
        vals = (h[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def _signatures(self, th: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """(n_docs, k) signature matrix from flat doc-major token hashes.
        Duplicate shingles are NOT deduped (the scalar path's np.unique) — the
        min over a multiset equals the min over its support, so outputs match
        bit-for-bit."""
        n = self.shingle
        n_docs = len(counts)
        tok_offs = np.concatenate([[0], np.cumsum(counts)])
        sig = np.empty((n_docs, self.k), dtype=np.uint64)
        reg = counts >= n
        reg_idx = np.flatnonzero(reg)
        if len(reg_idx):
            par = np.repeat(np.arange(n_docs), counts)
            pos = np.arange(len(th)) - tok_offs[par]
            vidx = np.flatnonzero(pos <= counts[par] - n)  # shingle start positions
            h = th[vidx] * self._C1
            for j in range(1, n):
                h = h + th[vidx + j] * (self._C2 if j == 1 else self._C3)
            offs = np.concatenate(
                [[0], np.cumsum(counts[reg_idx] - n + 1)])[:-1].astype(np.intp)
            for c0 in range(0, self.k, self._PERM_CHUNK):
                a = self.a[c0 : c0 + self._PERM_CHUNK][:, None]
                b = self.b[c0 : c0 + self._PERM_CHUNK][:, None]
                vals = (h[None, :] * a + b) % _MERSENNE
                sig[reg_idx, c0 : c0 + self._PERM_CHUNK] = np.minimum.reduceat(
                    vals, offs, axis=1).T
        for i in np.flatnonzero(~reg):  # short/empty docs: rare tail
            lo, hi = int(tok_offs[i]), int(tok_offs[i + 1])
            if hi == lo:
                hh = np.zeros(1, dtype=np.uint64)
            else:
                hh = th[lo : lo + 1].copy()  # 1-elem array: wraps silently
                for x in th[lo + 1 : hi]:
                    hh = hh * self._C1 + x
            sig[i] = ((hh[None, :] * self.a[:, None] + self.b[:, None])
                      % _MERSENNE).min(axis=1)
        return sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"doc_id": ids, "sig": pa.array([], pa.binary())})
        th, counts = _flat_token_hashes(batch[self.text_col], self._tok_cache)
        sig = self._signatures(th, counts)
        return pa.table({
            "doc_id": ids,
            "sig": pa.array([sig[i].tobytes() for i in range(len(counts))],
                            pa.binary()),
        })


def _explode_bands(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """Vectorized band explode: per-band bucket keys from a polynomial mix +
    splitmix64 finalizer over the signature rows (numpy, no per-row Python, no
    cryptographic hashing) — equal band chunks map to equal keys always, so
    LSH bucketing semantics are identical to a crypto hash (collisions only
    ever ADD candidates, which the signature-agreement filter then scores).
    Keys ship as int64 (8 B) instead of hex strings (16 B) on the shuffle."""
    n = batch.num_rows
    if n == 0:
        return pa.table({"doc_id": pa.array([], pa.string()),
                         "band": pa.array([], pa.int32()),
                         "band_hash": pa.array([], pa.int64()),
                         "sig": pa.array([], pa.binary())})
    doc_col = batch["doc_id"]
    sig_col = batch["sig"]
    if isinstance(doc_col, pa.ChunkedArray):
        doc_col = doc_col.combine_chunks()
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    mat = np.stack([np.frombuffer(s, dtype=np.uint64) for s in sig_col.to_pylist()])
    chunks = mat.reshape(n, bands, rows)
    acc = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rows):
        acc = acc * MinHashSigner._C1 + chunks[:, :, r]
    acc ^= acc >> np.uint64(30)
    acc *= np.uint64(0xBF58476D1CE4E5B9)
    acc ^= acc >> np.uint64(27)
    acc *= np.uint64(0x94D049BB133111EB)
    acc ^= acc >> np.uint64(31)
    idx = pa.array(np.repeat(np.arange(n), bands))
    return pa.table({
        "doc_id": doc_col.take(idx),
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
        "band_hash": pa.array(acc.reshape(-1).view(np.int64)),
        "sig": sig_col.take(idx),
    })


def minhash_lsh_pairs(ds: rd.Dataset, *, k: int = 64, bands: int = 16,
                      threshold: float = 0.7, text_col: str = "text",
                      id_col: str = "doc_id", concurrency=None,
                      max_bucket: int = MAX_BUCKET) -> rd.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.
    Output: (a, b, est_jaccard) with a < b, deduplicated across bands.
    Buckets larger than ``max_bucket`` degrade to adjacent-chain linking
    (connectivity preserved, O(n) pairs) and count on the overflow metric."""
    rows = k // bands
    sigs = ds.map_batches(
        MinHashSigner,
        fn_constructor_kwargs={"k": k, "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
    )
    banded = sigs.map_batches(
        lambda b: _explode_bands(b, bands, rows), batch_format="pyarrow"
    )

    from ..core.groupops import grouped_reduce

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """One coarse partition holds many complete buckets: vectorized prefilter
        to multi-member buckets, then one triu-indexed signature-agreement
        computation per bucket (no per-row Python loop), capped per bucket."""
        g = g.drop_duplicates(["band", "band_hash", "doc_id"])
        multi = g[g.duplicated(["band", "band_hash"], keep=False)]
        out_a, out_b, out_j = [], [], []
        for _, grp in multi.groupby(["band", "band_hash"], sort=False):
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            sigs_np = np.stack([np.frombuffer(s, dtype=np.uint64) for s in grp["sig"]])
            ii, jj = _bucket_pair_index(len(ids), max_bucket, "minhash")
            eq = (sigs_np[ii] == sigs_np[jj]).mean(axis=1)
            keep = np.flatnonzero(eq >= threshold)
            out_a.extend(ids[ii[keep]].tolist())
            out_b.extend(ids[jj[keep]].tolist())
            out_j.extend(np.round(eq[keep], 6).tolist())
        return pd.DataFrame({"a": out_a, "b": out_b, "est_jaccard": out_j})

    pairs = grouped_reduce(banded, ["band_hash"], part_pairs)

    # a pair can surface from several bands → keep one record per (a, b)
    def dedupe_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])

    return grouped_reduce(pairs, ["a", "b"], dedupe_pairs)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash signatures (Charikar'02) from word-frequency vectors.

    Batch path is fully vectorized: one Arrow tokenize + unique-token hashing
    (``_flat_token_hashes`` — blake2b-8, identical to ``_stable_u64``), then
    per-(doc, token) multiplicities via one lexsort-free ``np.unique`` over
    (parent, dict-index) pairs and a scatter-add of signed bit contributions —
    sum order never matters (integer adds), so output is bit-identical to the
    scalar reference path."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.bit_cols = np.arange(64, dtype=np.uint64)
        self._tok_cache: dict[str, int] = {}

    def simhash(self, text: str) -> int:
        """Scalar reference path (kept for tests; __call__ does not use it)."""
        toks = (text or "").split()
        if not toks:
            return 0
        uniq, counts = np.unique(np.array(toks), return_counts=True)
        h = _stable_u64(list(uniq))
        bits = ((h[:, None] >> self.bit_cols[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << self.bit_cols).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": ids, "simhash": pa.array([], pa.uint64())})
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.utf8_split_whitespace(pc.fill_null(texts, ""))
        flat = pc.list_flatten(toks)
        nonempty = pc.not_equal(flat, "")
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)[
            nonempty.to_numpy(zero_copy_only=False).astype(bool)]
        denc = flat.filter(nonempty).dictionary_encode()
        uniq = denc.dictionary.to_pylist()
        cache = self._tok_cache
        uh = np.empty(len(uniq), dtype=np.uint64)
        for i, t in enumerate(uniq):
            hv = cache.get(t)
            if hv is None:
                hv = int.from_bytes(
                    hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
                if len(cache) < 1_000_000:
                    cache[t] = hv
            uh[i] = hv
        didx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # per-(doc, token) multiplicities in one pass
        pairs, counts = np.unique(par * (len(uniq) + 1) + didx, return_counts=True)
        p_doc = pairs // (len(uniq) + 1)
        p_tok = pairs % (len(uniq) + 1)
        bits = ((uh[p_tok][:, None] >> self.bit_cols[None, :]) & np.uint64(1)
                ).astype(np.int64)
        contrib = (bits * 2 - 1) * counts[:, None].astype(np.int64)
        acc = np.zeros((n, 64), dtype=np.int64)
        np.add.at(acc, p_doc, contrib)
        sims = ((acc > 0).astype(np.uint64) << self.bit_cols[None, :]).sum(axis=1)
        # empty docs: their acc row stays all-zero -> simhash 0, like the scalar path
        return pa.table({"doc_id": ids, "simhash": pa.array(sims, pa.uint64())})


def simhash_pairs(ds: rd.Dataset, *, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", concurrency=None,
                  max_bucket: int = MAX_BUCKET) -> rd.Dataset:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Banding: 4 × 16-bit
    chunks — any pair within hamming 3 shares ≥ 1 exact chunk (pigeonhole)."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency or (1, 8))

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.string()),
                             "band": pa.array([], pa.int32()),
                             "key": pa.array([], pa.int32()),
                             "simhash": pa.array([], pa.uint64())})
        doc_col = batch["doc_id"]
        if isinstance(doc_col, pa.ChunkedArray):
            doc_col = doc_col.combine_chunks()
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        shifts = np.uint64(16) * np.arange(4, dtype=np.uint64)
        keys = ((h[:, None] >> shifts[None, :]) & np.uint64(0xFFFF)).astype(np.int32)
        idx = pa.array(np.repeat(np.arange(n), 4))
        return pa.table({"doc_id": doc_col.take(idx),
                         "band": pa.array(np.tile(np.arange(4, dtype=np.int32), n)),
                         "key": pa.array(keys.reshape(-1)),
                         "simhash": pa.array(np.repeat(h, 4))})

    from ..core.groupops import grouped_reduce

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["band", "key", "doc_id"])
        multi = g[g.duplicated(["band", "key"], keep=False)]
        a, b, d = [], [], []
        for _, grp in multi.groupby(["band", "key"], sort=False):
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            hs = grp["simhash"].to_numpy().astype(np.uint64)
            ii, jj = _bucket_pair_index(len(ids), max_bucket, "simhash")
            ham = _popcount64(hs[ii] ^ hs[jj]) if len(ii) else np.array([], np.int64)
            keep = np.flatnonzero(ham <= max_hamming)
            a.extend(ids[ii[keep]].tolist())
            b.extend(ids[jj[keep]].tolist())
            d.extend(ham[keep].tolist())
        return pd.DataFrame({"a": a, "b": b, "hamming": d})

    pairs = grouped_reduce(
        sigs.map_batches(explode, batch_format="pyarrow"), ["band", "key"], part_pairs)
    return grouped_reduce(pairs, ["a", "b"],
                          lambda g: g.drop_duplicates(["a", "b"]))


# ---------------------------------------------------------------------------
# Cluster resolution: connected components over duplicate pairs
# ---------------------------------------------------------------------------


def dedup_clusters(pairs: rd.Dataset, n_iters: int = 64,
                   driver_threshold: int = 1_000_000) -> rd.Dataset:
    """(a, b) duplicate pairs → (node, cluster) where cluster = min node id of
    the connected component.

    Hybrid (ray_guide: union-find on the driver only if the candidate set is
    provably small): below ``driver_threshold`` pairs, an exact driver-side
    union-find (duplicate pairs are a tiny fraction of any corpus); above it,
    distributed min-label propagation — each round every node takes the min
    label over itself and its neighbors (one coarse-partition shuffle per
    round). Propagation iterates to a FIXPOINT (stop when no label changes
    between rounds, detected by an order-insensitive distributed label
    signature — labels are monotone non-increasing, so an unchanged signature
    means converged); ``n_iters`` is only a runaway cap, and exceeding it
    raises rather than silently under-deduplicating long chains. Both paths
    are deterministic and produce identical clusters."""
    from ..core.groupops import grouped_reduce

    # size probe that REUSES its rows: limit(threshold+1) executes the pair
    # pipeline once and stops early; if the result fits under the threshold we
    # already hold exactly the rows the driver path needs (a bare count() +
    # take_all() would execute the whole upstream pipeline twice)
    probe = pairs.select_columns(["a", "b"]).limit(driver_threshold + 1).take_all()
    if len(probe) <= driver_threshold:
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:
                parent[x], x = root, parent[x]
            return root

        rows_ab = probe
        for r in rows_ab:
            ra, rb = find(r["a"]), find(r["b"])
            if ra != rb:
                # union by min so the representative is the min node id
                lo, hi = (ra, rb) if str(ra) <= str(rb) else (rb, ra)
                if isinstance(ra, int):
                    lo, hi = (ra, rb) if ra <= rb else (rb, ra)
                parent[hi] = lo
        out = sorted({n: find(n) for n in parent.keys() | set()}.items() |
                     {(n, find(n)) for r in rows_ab for n in (r["a"], r["b"])})
        import pyarrow as _pa

        nodes = [n for n, _ in out]
        clusters = [c for _, c in out]
        return rd.from_arrow(_pa.table({"node": nodes, "cluster": clusters}))

    sch = pairs.schema()
    a_type = dict(zip(sch.names, sch.types))["a"]
    int_ids = (pa.types.is_integer(a_type) if isinstance(a_type, pa.DataType)
               else np.issubdtype(np.dtype(a_type), np.integer))

    def enc(v):
        # sortable string encoding: lexicographic min == numeric min for ints,
        # natural for string doc_ids. Avoids the int→float NaN coercion that
        # pandas merges inflict on tagged-null join columns (2 vs 2.0 would
        # silently become distinct group keys).
        return f"{v:020d}" if int_ids else str(v)

    def enc_arr(col) -> pa.Array:
        # vectorized enc(): cast + zero-lpad (C kernels). Negative ids would
        # zero-pad differently than f"{v:020d}", so that (never-seen) case
        # keeps the scalar path.
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if not int_ids:
            return pc.cast(arr, pa.string())
        mn = pc.min(arr).as_py() if len(arr) else 0
        if mn is not None and mn < 0:
            return pa.array([enc(v) for v in arr.to_pylist()], pa.string())
        return pc.utf8_lpad(pc.cast(arr, pa.string()), width=20, padding="0")

    def to_edges(b: pa.Table) -> pa.Table:
        a, c = enc_arr(b["a"]), enc_arr(b["b"])
        return pa.table({"node": pa.concat_arrays([a, c]),
                         "nbr": pa.concat_arrays([c, a])})

    edges = pairs.map_batches(to_edges, batch_format="pyarrow").materialize()
    labels = edges.map_batches(
        lambda b: pa.table({"node": b["node"], "label": b["node"]}),
        batch_format="pyarrow",
    )

    def min_label(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False)["label"].min()

    def _label_sig(lab: rd.Dataset) -> int:
        """Order-insensitive signature of the (node, label) multiset: sum of
        per-row 64-bit hashes, computed distributed (one tiny aggregate — no
        driver materialization of the label table). The per-row hash is
        ``pd.util.hash_pandas_object`` (vectorized, process-independent with
        the default hash key — same recipe as groupops._stable_part), not
        per-row Python blake2b: the label table scales with the corpus at high
        duplicate rates, so the convergence check itself must be vectorized."""

        def row_hashes(b: pa.Table) -> pa.Table:
            s = (pd.Series(b["node"].to_pandas(), dtype="string") + "\x1f"
                 + pd.Series(b["label"].to_pandas(), dtype="string"))
            h = pd.util.hash_pandas_object(s, index=False).to_numpy()
            return pa.table({"h": pa.array((h >> 1).astype(np.int64))})

        return lab.map_batches(row_hashes, batch_format="pyarrow").sum("h") or 0

    labels = grouped_reduce(labels, ["node"], min_label).materialize()
    sig = _label_sig(labels)
    converged = False
    # n_iters + 1 rounds: a component whose propagation finishes exactly at
    # round n_iters needs one extra quiescent round to OBSERVE the unchanged
    # signature — the cap bounds rounds that still change labels, not the
    # final observation (and n_iters=0 on already-converged input succeeds).
    for _ in range(n_iters + 1):
        # neighbor labels via an explicit partitioned hash join (ray_guide
        # 'Joins and lookups'): tag both sides, co-partition on the join key,
        # pandas-merge inside each partition. (Dataset.join in ray 2.49 fails on
        # empty hash partitions: 'No match ... on right side of the join'.)
        tagged_edges = edges.map_batches(
            lambda b: pa.table({"jkey": b["nbr"], "node": b["node"],
                                "label": pa.array([""] * len(b)),
                                "src": pa.array(["e"] * len(b))}),
            batch_format="pyarrow",
        )
        tagged_labels = labels.map_batches(
            lambda b: pa.table({"jkey": b["node"],
                                "node": pa.array([""] * len(b)),
                                "label": b["label"],
                                "src": pa.array(["l"] * len(b))}),
            batch_format="pyarrow",
        )

        def part_join(g: pd.DataFrame) -> pd.DataFrame:
            lab = g[g.src == "l"][["jkey", "label"]]
            ed = g[g.src == "e"][["jkey", "node"]]
            m = ed.merge(lab, on="jkey")
            return m[["node", "label"]]

        nbr_labels = grouped_reduce(tagged_edges.union(tagged_labels),
                                    ["jkey"], part_join)
        labels = grouped_reduce(labels.union(nbr_labels), ["node"], min_label)
        labels = labels.materialize()  # small: one row per node in any dup pair
        new_sig = _label_sig(labels)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        raise RuntimeError(
            f"dedup_clusters: min-label propagation did not converge within "
            f"{n_iters} rounds (component diameter > cap); raising instead of "
            f"returning silently under-merged clusters")

    def decode(b: pa.Table) -> pa.Table:
        if int_ids:
            return pa.table({
                "node": pa.array([int(v) for v in b["node"].to_pylist()], pa.int64()),
                "cluster": pa.array([int(v) for v in b["label"].to_pylist()], pa.int64()),
            })
        return pa.table({"node": b["node"], "cluster": b["label"]})

    return labels.map_batches(decode, batch_format="pyarrow")


def _drop_nodes(clusters: rd.Dataset) -> rd.Dataset:
    """(node, cluster) → the non-representative nodes (node != cluster)."""
    import pyarrow.compute as pc

    def f(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(pc.cast(b["node"], pa.string()),
                                  pc.cast(b["cluster"], pa.string())))
        return pa.table({"node": b["node"]}).filter(keep)

    return clusters.map_batches(f, batch_format="pyarrow")


def dedup_resolve(ds: rd.Dataset, pairs: rd.Dataset, id_col: str = "doc_id",
                  n_iters: int = 64) -> rd.Dataset:
    """End-to-end near-dedup: keep one representative (min id) per cluster.
    The (small) drop-set is broadcast; the corpus streams through a vectorized
    ``pc.is_in`` filter. Use ``dedup_resolve_bucketed`` when the drop-set
    itself is too large to broadcast (very high duplicate rates at corpus
    scale)."""
    import pyarrow.compute as pc

    clusters = dedup_clusters(pairs, n_iters)
    drop = [row["node"] for row in _drop_nodes(clusters).take_all()]
    ref = ray.put(pa.array(sorted(map(str, drop))))

    def keep(b: pa.Table) -> pa.Table:
        d = ray.get(ref)
        mask = pc.invert(pc.is_in(pc.cast(b[id_col], pa.string()), value_set=d))
        return b.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def dedup_resolve_bucketed(ds: rd.Dataset, pairs: rd.Dataset,
                           id_col: str = "doc_id", n_iters: int = 64,
                           n_parts: int = 64) -> rd.Dataset:
    """Scale path of ``dedup_resolve``: the drop-set stays distributed and the
    corpus anti-joins against it by co-partitioned key (one coarse shuffle,
    Arrow-native per-partition ``is_in`` — list/binary payload columns survive
    untouched). Identical rows to the broadcast variant."""
    from ..core.groupops import anti_join_ids

    clusters = dedup_clusters(pairs, n_iters)
    return anti_join_ids(ds, _drop_nodes(clusters), id_col, ids_col="node",
                         n_parts=n_parts)


# ---------------------------------------------------------------------------
# n-gram Jaccard verification & embedding cosine near-dup
# ---------------------------------------------------------------------------


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact word n-gram Jaccard similarity."""
    def grams(t):
        toks = (t or "").split()
        if len(toks) < n:
            return {" ".join(toks)} if toks else set()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    ga, gb = grams(text_a), grams(text_b)
    if not ga and not gb:
        return 1.0
    return len(ga & gb) / max(1, len(ga | gb))


def verify_pairs_exact_bucketed(pairs: rd.Dataset, docs: rd.Dataset, *, n: int = 3,
                                threshold: float = 0.6, id_col: str = "doc_id",
                                text_col: str = "text",
                                emit_counts: bool = False,
                                broadcast_ids_max: int = 2_000_000) -> rd.Dataset:
    """Scale path for exact n-gram Jaccard verification: no text broadcast, no
    full texts on the wire. Docs are reduced once to n-gram *hash sets* (u64
    blake2b mix, ~8 B/token); pairs pick up each side's gram set through two
    co-partitioned hash joins (tagged-union + grouped_reduce — ray 2.49's
    Dataset.join chokes on empty partitions), then Jaccard is computed from the
    two u64 sets. Output: (a, b, jaccard) with jaccard ≥ threshold.

    Semi-join prefilter (the measured win — the shuffles dominated this
    operator, not the scoring): only docs that APPEAR in a candidate pair need
    gram sets, and candidate sets are small by construction (the output of an
    LSH prefilter), so the pair id-set is broadcast (ids only, ≤16 MB at the
    default bound) and the corpus streams through a vectorized ``is_in``
    before gram computation — the exchanges then carry only candidate docs'
    gram sets. Above ``broadcast_ids_max`` the prefilter is skipped and the
    full corpus co-partitions as before (still correct, just heavier)."""
    from ..core.groupops import grouped_reduce

    # the probe REUSES its rows (same pattern as dedup_clusters): if the pair
    # set fits the bound we already hold the rows and avoid re-executing the
    # upstream pair pipeline for the joins below
    probe = pairs.select_columns(["a", "b"]).limit(broadcast_ids_max + 1).take_all()
    if probe and len(probe) <= broadcast_ids_max:
        ids = sorted({r["a"] for r in probe} | {r["b"] for r in probe})
        id_ref = ray.put(pa.array(ids))
        pairs = rd.from_arrow(pa.table({"a": [r["a"] for r in probe],
                                        "b": [r["b"] for r in probe]}))

        def prefilter(b: pa.Table) -> pa.Table:
            vs = pc.cast(ray.get(id_ref), b[id_col].type)
            return b.filter(pc.is_in(b[id_col], value_set=vs))

        docs = docs.map_batches(prefilter, batch_format="pyarrow")

    signer = MinHashSigner(shingle=n)  # reuse its cached token→u64 shingle mixing

    def gramset(b: pa.Table) -> pa.Table:
        th_flat, counts = _flat_token_hashes(b[text_col], signer._tok_cache)
        tok_offs = np.concatenate([[0], np.cumsum(counts)])
        blobs = []
        for i in range(len(counts)):
            th = th_flat[tok_offs[i] : tok_offs[i + 1]]
            if len(th) < n:
                h = th[:1].copy() if len(th) else np.zeros(1, np.uint64)
                for x in th[1:]:
                    h = h * signer._C1 + x
            else:
                h = th[: len(th) - n + 1] * signer._C1
                for j in range(1, n):
                    h = h + th[j : len(th) - n + 1 + j] * (
                        signer._C2 if j == 1 else signer._C3)
                h = np.unique(h)
            blobs.append(h.tobytes())
        return pa.table({"gid": b[id_col], "grams": pa.array(blobs, pa.binary())})

    from ..core.groupops import lookup_join

    grams = docs.map_batches(gramset, batch_format="pyarrow").materialize()

    # two co-partitioned Arrow-native lookup joins pick up each side's gram
    # set; original id dtypes pass through untouched (the join key is
    # string-cast only inside lookup_join — no sortable-string round-trip).
    # Schemas are passed explicitly: letting the second join probe its input
    # schema would re-execute the first join's whole shuffle for one block.
    grams_schema = grams.schema()
    gs = pa.schema(list(zip(grams_schema.names, grams_schema.types)))
    id_type = dict(zip(gs.names, gs.types))["gid"]
    pairs_ab = pa.schema([("a", id_type), ("b", id_type)])
    with_a = lookup_join(pairs.select_columns(["a", "b"]), grams,
                         key_col="a", kv_key="gid", kv_val="grams",
                         out_col="grams_a", schema=pairs_ab, kv_schema=gs)
    with_ab = lookup_join(with_a, grams, key_col="b", kv_key="gid",
                          kv_val="grams", out_col="grams_b",
                          schema=pairs_ab.append(pa.field("grams_a",
                                                          pa.binary())),
                          kv_schema=gs)

    def score(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        js, ni, nu = [], [], []
        for ga, gb in zip(b["grams_a"].to_pylist(), b["grams_b"].to_pylist()):
            # gram blobs are unique u64 by construction (np.unique upstream, or
            # a single element for short docs), so |∩| is one C-level merge —
            # no Python set materialization per pair (VERDICT r3 #4)
            sa = np.frombuffer(ga, dtype=np.uint64)
            sb = np.frombuffer(gb, dtype=np.uint64)
            inter = int(np.intersect1d(sa, sb, assume_unique=True).size)
            union = int(sa.size + sb.size) - inter
            ni.append(inter)
            nu.append(union)
            js.append(1.0 if not union else round(inter / union, 6))
        cols = {"a": b["a"], "b": b["b"],
                "jaccard": pa.array(js, pa.float64())}
        if emit_counts:
            # integer |∩| / |∪| — exact cross-engine hash parity, no float
            # repr risk (CLAUDE.md dtype-parity rule)
            cols["n_inter"] = pa.array(ni, pa.int64())
            cols["n_union"] = pa.array(nu, pa.int64())
        out = pa.table(cols)
        return out.filter(pc2.greater_equal(out["jaccard"], threshold))

    return with_ab.map_batches(score, batch_format="pyarrow")


def verify_pairs_exact(pairs: rd.Dataset, docs: rd.Dataset, *, n: int = 3,
                       threshold: float = 0.6, id_col: str = "doc_id",
                       text_col: str = "text",
                       broadcast_pairs_max: int = 2_000_000) -> rd.Dataset:
    """Exact n-gram Jaccard over candidate pairs. The doc texts are broadcast via
    ``ray.put`` when the candidate id-set is small (semi-join pattern); above
    ``broadcast_pairs_max`` candidate pairs the call dispatches to
    ``verify_pairs_exact_bucketed`` (gram-set co-partition, no text broadcast)
    instead of materializing an unbounded id-set on the driver — same guarded
    shape as ``dedup_resolve``'s ``broadcast_ids_max`` probe. NOTE: the
    bucketed path emits exactly (a, b, jaccard); extra pair columns survive
    only on the broadcast path."""
    probe = pairs.select_columns(["a", "b"]).limit(broadcast_pairs_max + 1) \
        .take_all()
    if len(probe) > broadcast_pairs_max:
        return verify_pairs_exact_bucketed(pairs, docs, n=n,
                                           threshold=threshold, id_col=id_col,
                                           text_col=text_col)
    need = set()
    for row in probe:
        need.add(row["a"]); need.add(row["b"])
    texts = {}
    for b in docs.select_columns([id_col, text_col]).iter_batches(
            batch_size=8192, batch_format="pyarrow"):
        for did, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            if did in need:
                texts[did] = t
    ref = ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(ref)
        js = [round(ngram_jaccard(lookup.get(a, ""), lookup.get(b, ""), n), 6)
              for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist())]
        out = batch.append_column("jaccard", pa.array(js, pa.float64()))
        import pyarrow.compute as pc
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pairs.map_batches(verify, batch_format="pyarrow")


def embedding_dup_pairs_lsh(ds: rd.Dataset, *, threshold: float = 0.9,
                            n_planes: int = 12, n_tables: int = 8, seed: int = 99,
                            id_col: str = "vec_id", vec_col: str = "embedding",
                            max_bucket: int = MAX_BUCKET) -> rd.Dataset:
    """Hyperplane-LSH near-dup pairs — the 100 TB path for embedding dedup.

    Per batch: sign-pattern codes under ``n_tables`` independent sets of
    ``n_planes`` random hyperplanes (seeded → identical across the cluster);
    explode to (table, code, vec_id, vector) rows; candidates = bucket
    cohabitants (coarse-partition reduce, core/groupops.py); verify exact cosine
    inside the bucket. Recall follows P(same code) = (1 - θ/π)^n_planes per
    table; n_tables tables union. The shuffle carries d-dim vectors per bucket
    row, never the full N×N comparison."""
    from ..core.groupops import grouped_reduce

    rng = np.random.RandomState(seed)
    dim_probe = ds.limit(1).take_all()
    if not dim_probe:
        return rd.from_items([])
    dim = len(dim_probe[0][vec_col])
    planes = rng.randn(n_tables, n_planes, dim)
    ref = ray.put(planes)

    def code_batch(b: pa.Table) -> pa.Table:
        from ..core.vecops import ids_and_matrix

        pl = ray.get(ref)
        ids, mat_n = ids_and_matrix(b, id_col, vec_col)  # zero-copy flat child
        n = len(ids)
        if n == 0:
            return pa.table({
                "table": pa.array([], pa.int32()),
                "code": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "vec": pa.array([], pa.list_(pa.float32(), dim)),
            })
        # all tables in ONE GEMM: (n, dim) @ (dim, n_tables*n_planes)
        proj = mat_n @ pl.reshape(n_tables * n_planes, dim).T
        bits = (proj > 0).reshape(n, n_tables, n_planes)
        codes = (bits.astype(np.uint32)
                 << np.arange(n_planes, dtype=np.uint32)).sum(axis=2)  # (n, T)
        # vec column built once, zero-copy FixedSizeList from the flat float32
        # buffer (VERDICT r3 #6 — no n_tables× .tolist() materialization);
        # the n_tables repetitions are a vectorized take over that one array
        flat = np.ascontiguousarray(mat_n, dtype=np.float32).reshape(-1)
        vec = pa.FixedSizeListArray.from_arrays(pa.array(flat), dim)
        tile = pa.array(np.tile(np.arange(n, dtype=np.int64), n_tables))
        return pa.table({
            "table": pa.array(np.repeat(np.arange(n_tables, dtype=np.int32), n)),
            "code": pa.array(codes.T.reshape(-1).astype(np.int64)),
            "vec_id": pa.array(np.tile(np.asarray(ids, dtype=np.int64), n_tables)),
            "vec": vec.take(tile),
        })

    coded = ds.map_batches(code_batch, batch_format="pyarrow")

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["table", "code", "vec_id"])
        multi = g[g.duplicated(["table", "code"], keep=False)]
        a_out, b_out, c_out = [], [], []
        for _, grp in multi.groupby(["table", "code"], sort=False):
            grp = grp.sort_values("vec_id")
            ids = grp["vec_id"].to_numpy()
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in grp["vec"]])
            if len(ids) > max_bucket:
                # hot-bucket guard: adjacent-chain cosine only (see MAX_BUCKET)
                _note_overflow("embedding_lsh", len(ids))
                sims = np.einsum("ij,ij->i", mat[:-1], mat[1:])
                keep = np.flatnonzero(sims >= threshold)
                a_out.extend(ids[keep].tolist())
                b_out.extend(ids[keep + 1].tolist())
                c_out.extend(np.round(sims[keep], 6).tolist())
                continue
            sims = mat @ mat.T
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            a_out.extend(ids[ii].tolist())
            b_out.extend(ids[jj].tolist())
            c_out.extend(np.round(sims[ii, jj], 6).tolist())
        return pd.DataFrame({"a": a_out, "b": b_out, "cosine": c_out})

    pairs = grouped_reduce(coded, ["table", "code"], bucket_verify)
    return grouped_reduce(pairs, ["a", "b"], lambda g: g.drop_duplicates(["a", "b"]))


def _block_ids_mat(tbl: pa.Table, id_col: str, vec_col: str):
    """(ids, row-normalized float64 matrix) from one Arrow block — zero-copy
    flat-child reshape (core/vecops)."""
    from ..core.vecops import ids_and_matrix

    return ids_and_matrix(tbl, id_col, vec_col)


def embedding_dup_pairs_exact(ds: rd.Dataset, *, threshold: float = 0.98,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> rd.Dataset:
    """Exact all-pairs cosine near-dup (a < b, cosine ≥ threshold) with NO
    driver materialization: the (id, vec) projection is materialized into the
    *object store* (stays distributed as blocks), the tiny block-pair index
    (i ≤ j) fans out as a Dataset, and each task fetches exactly two blocks
    zero-copy and matmuls them. Peak task memory = 2 blocks; the N²/B² task
    count is inherent to exactness — ``embedding_dup_pairs`` guards on row
    count and routes large inputs to the LSH path instead."""
    from ray.data.dataset import MaterializedDataset

    if isinstance(ds, MaterializedDataset) and set(ds.schema().names) == {id_col, vec_col}:
        blocks = ds  # already the materialized (id, vec) projection — reuse it
    else:
        blocks = ds.select_columns([id_col, vec_col]).materialize()
    nonempty = blocks.to_arrow_refs()
    nb = len(nonempty)
    if nb == 0:
        return rd.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64()),
                                       "cosine": pa.array([], pa.float64())}))
    idx_tbl = pa.table({
        "i": pa.array([i for i in range(nb) for _ in range(i, nb)], pa.int32()),
        "j": pa.array([j for i in range(nb) for j in range(i, nb)], pa.int32()),
    })

    def compare(b: pa.Table) -> pa.Table:
        out_a: list[int] = []
        out_b: list[int] = []
        out_c: list[float] = []
        for i, j in zip(b["i"].to_pylist(), b["j"].to_pylist()):
            ids_a, mat_a = _block_ids_mat(ray.get(nonempty[i]), id_col, vec_col)
            if len(ids_a) == 0:
                continue
            if i == j:
                ids_b, mat_b = ids_a, mat_a
            else:
                ids_b, mat_b = _block_ids_mat(ray.get(nonempty[j]), id_col, vec_col)
                if len(ids_b) == 0:
                    continue
            sims = mat_a @ mat_b.T
            ii, jj = np.nonzero(sims >= threshold)
            ia, ib = ids_a[ii], ids_b[jj]
            keep = ia != ib  # kills the i==j diagonal; ids are unique
            if i == j:
                keep &= ia < ib  # i==j sees both orientations; keep one
            lo = np.minimum(ia[keep], ib[keep])
            hi = np.maximum(ia[keep], ib[keep])
            out_a.extend(lo.tolist())
            out_b.extend(hi.tolist())
            out_c.extend(np.round(sims[ii, jj][keep], 6).tolist())
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "cosine": pa.array(out_c, pa.float64())})

    return rd.from_arrow(idx_tbl).map_batches(compare, batch_format="pyarrow",
                                              batch_size=2)


def embedding_dup_pairs(ds: rd.Dataset, *, threshold: float = 0.98,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        exact_max_rows: int = 200_000,
                        lsh_kwargs: dict | None = None) -> rd.Dataset:
    """Embedding-cosine near-dup pairs — guarded hybrid. Small inputs
    (≤ ``exact_max_rows``) run the exact streaming block-pair matmul
    (``embedding_dup_pairs_exact``); larger inputs route to hyperplane LSH
    (``embedding_dup_pairs_lsh``), whose recall/threshold knobs can be tuned
    via ``lsh_kwargs``. Nothing in either path materializes the table on the
    driver; the (id, vec) projection is materialized into the OBJECT STORE
    exactly once — the row-count guard reads it from metadata and whichever
    path is chosen reuses the same blocks (no double execution of a derived
    upstream pipeline)."""
    proj = ds.select_columns([id_col, vec_col]).materialize()
    if proj.count() > exact_max_rows:  # metadata-cheap on a materialized ds
        return embedding_dup_pairs_lsh(proj, threshold=threshold, id_col=id_col,
                                       vec_col=vec_col, **(lsh_kwargs or {}))
    return embedding_dup_pairs_exact(proj, threshold=threshold, id_col=id_col,
                                     vec_col=vec_col)


# ---------------------------------------------------------------------------
# C4-style duplicate-chunk removal (Raffel et al. 2020, §2.2: drop every
# repeated occurrence of a repeated span, keeping exactly one corpus-wide)
# ---------------------------------------------------------------------------


def doc_chunks(texts: pa.Array, width: int = 8):
    """Every NON-OVERLAPPING ``width``-token chunk of every doc, vectorized
    end to end (the fixed-width analog of ``decontam.doc_grams``'s sliding
    grams): returns ``(chunk_strings, parent_idx, chunk_no, n_words)``. The
    last chunk of a doc may be shorter than ``width``; docs with no tokens
    emit no chunks."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.split_pattern_regex(pc.fill_null(texts, ""),
                                  pattern=r"[ \t\n\r\f]+")
    flat = toks.values
    off = np.asarray(toks.offsets, dtype=np.int64)
    keep = pc.not_equal(flat, "")
    km = keep.to_numpy(zero_copy_only=False)
    flat = flat.filter(keep)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    cum = np.concatenate([[0], np.cumsum(km, dtype=np.int64)])
    off = cum[off]                       # per-doc offsets into filtered tokens
    n_tok = np.diff(off)
    n_chunk = -(-n_tok // width)         # ceil division
    total = int(n_chunk.sum())
    empty = (pa.array([], pa.string()), np.array([], np.int64),
             np.array([], np.int64), np.array([], np.int64))
    if total == 0:
        return empty
    parent = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_chunk)
    first_of_doc = np.concatenate([[0], np.cumsum(n_chunk)])[:-1]
    chunk_no = np.arange(total, dtype=np.int64) - first_of_doc[parent]
    start = off[parent] + chunk_no * width
    end = np.minimum(start + width, off[parent + 1])
    offsets = np.concatenate([start, off[-1:]])
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    return (pc.binary_join(la, " "), parent, chunk_no,
            (end - start).astype(np.int64))


def chunk_dedup_stats(ds: rd.Dataset, *, width: int = 8, id_col: str = "doc_id",
                      text_col: str = "text", n_parts: int = 64) -> rd.Dataset:
    """Corpus-wide duplicate-chunk removal stats, C4 rule: every occurrence of
    a repeated fixed-width token chunk is dropped EXCEPT the one with the
    lexicographically smallest ``(doc_id, chunk_no)`` — a deterministic,
    partitioning-invariant keeper. Returns one row per doc with chunks:
    ``(doc_id, n_chunks, n_kept, kept_words)``.

    Scale shape (the ``cross_doc_grams`` pattern): per-batch vectorized chunk
    expansion, then ONE co-partition on the chunk string makes the global
    keep-first decision partition-local (no vocabulary broadcast, no window
    over the corpus), then a bounded ``groupby(doc_id)`` sums flags. The
    exchange carries (chunk, doc_id, chunk_no, n_words) rows — at 100 TB the
    chunk strings would ride as u64 hashes (``_stable_u64``) at negligible
    collision risk; strings are kept here for exact cross-engine parity."""
    from ray.data.aggregate import Count, Sum

    from ..core.groupops import grouped_reduce

    def explode(b: pa.Table) -> pa.Table:
        chunks, parent, chunk_no, n_words = doc_chunks(b[text_col], width)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return pa.table({"chunk": chunks,
                         id_col: pa.array(ids[parent], pa.int64()),
                         "chunk_no": pa.array(chunk_no, pa.int64()),
                         "n_words": pa.array(n_words, pa.int64())})

    def keep_first(df: pd.DataFrame) -> pd.DataFrame:
        # co-partitioned on chunk: the corpus-wide min (doc_id, chunk_no) per
        # chunk is partition-local; stable sort + first-seen flag computes it
        # segment-wise without per-key groups. Collapse to per-doc partials
        # BEFORE leaving the partition so the final exchange carries at most
        # (n_parts x docs) summary rows, never the chunk-count-sized stream.
        srt = df.sort_values(["chunk", id_col, "chunk_no"], kind="mergesort")
        kept = (~srt["chunk"].duplicated()).to_numpy().astype("int64")
        part = pd.DataFrame({id_col: srt[id_col].to_numpy(),
                             "n_chunks": np.ones(len(srt), dtype="int64"),
                             "kept": kept,
                             "kept_words": kept * srt["n_words"].to_numpy()})
        return part.groupby(id_col, sort=False, as_index=False).sum()

    exploded = ds.map_batches(explode, batch_format="pyarrow")
    flagged = grouped_reduce(exploded, ["chunk"], keep_first, n_parts=n_parts)
    return flagged.groupby(id_col).aggregate(
        Sum("n_chunks", alias_name="n_chunks"),
        Sum("kept", alias_name="n_kept"),
        Sum("kept_words", alias_name="kept_words"))
