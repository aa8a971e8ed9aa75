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
- embedding cosine: small side broadcast via ``ray.put`` (no shuffle); the
  documented scale path is hyperplane-LSH bucketing when N² is infeasible.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

_MERSENNE = np.uint64((1 << 61) - 1)


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
    (text_sha, doc_id, n_dupes); shuffle carries only (sha, id) pairs."""
    hashed = ds.map_batches(
        lambda b: add_text_sha(b, text_col).select(["text_sha", id_col]),
        batch_format="pyarrow",
    )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        return pd.DataFrame(
            {"text_sha": [g["text_sha"].iloc[0]], "doc_id": [g[id_col].iloc[0]],
             "n_dupes": [len(g)]}
        )

    return hashed.groupby("text_sha").map_groups(keep_first, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHashSigner:
    """Actor-pool stage: word-shingle MinHash signatures. Permutation parameters
    are generated once per actor from a fixed seed (deterministic across the
    cluster)."""

    def __init__(self, k: int = 64, shingle: int = 3, text_col: str = "text",
                 id_col: str = "doc_id", seed: int = 1234):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, (1 << 61) - 1, size=k, dtype=np.uint64) | np.uint64(1)
        self.b = rng.randint(0, (1 << 61) - 1, size=k, dtype=np.uint64)
        self.k, self.shingle = k, shingle
        self.text_col, self.id_col = text_col, id_col

    def signature(self, text: str) -> np.ndarray:
        toks = (text or "").split()
        if len(toks) < self.shingle:
            shingles = [" ".join(toks)] if toks else [""]
        else:
            shingles = [" ".join(toks[i : i + self.shingle])
                        for i in range(len(toks) - self.shingle + 1)]
        h = np.unique(_stable_u64(shingles))
        # sig[i] = min over shingles of (a_i * h + b_i) mod 2^61-1
        vals = (h[None, :] * self.a[:, None] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        sigs = [self.signature(t) for t in batch[self.text_col].to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids),
            "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
        })


def _explode_bands(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    out_id, out_band, out_bh, out_sig = [], [], [], []
    for did, sig in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
        s = np.frombuffer(sig, dtype=np.uint64)
        for b in range(bands):
            chunk = s[b * rows : (b + 1) * rows].tobytes()
            out_id.append(did)
            out_band.append(b)
            out_bh.append(hashlib.blake2b(chunk, digest_size=8).hexdigest())
            out_sig.append(sig)
    return pa.table({
        "doc_id": pa.array(out_id), "band": pa.array(out_band, pa.int32()),
        "band_hash": pa.array(out_bh, pa.string()), "sig": pa.array(out_sig, pa.binary()),
    })


def minhash_lsh_pairs(ds: rd.Dataset, *, k: int = 64, bands: int = 16,
                      threshold: float = 0.7, text_col: str = "text",
                      id_col: str = "doc_id", concurrency=None) -> rd.Dataset:
    """Near-duplicate candidate pairs with estimated Jaccard ≥ threshold.
    Output: (a, b, est_jaccard) with a < b, deduplicated across bands."""
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

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        if len(g) < 2:
            return pd.DataFrame({"a": [], "b": [], "est_jaccard": []})
        ids = g["doc_id"].tolist()
        sigs_np = [np.frombuffer(s, dtype=np.uint64) for s in g["sig"]]
        out_a, out_b, out_j = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                est = float(np.mean(sigs_np[i] == sigs_np[j]))
                if est >= threshold:
                    out_a.append(ids[i]); out_b.append(ids[j]); out_j.append(round(est, 6))
        return pd.DataFrame({"a": out_a, "b": out_b, "est_jaccard": out_j})

    pairs = banded.groupby(["band", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )

    # a pair can surface from several bands → keep one record per (a, b)
    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["a", "b"]).map_groups(first, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash signatures (Charikar'02) from word-frequency vectors."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.bit_cols = np.arange(64, dtype=np.uint64)

    def simhash(self, text: str) -> int:
        toks = (text or "").split()
        if not toks:
            return 0
        uniq, counts = np.unique(np.array(toks), return_counts=True)
        h = _stable_u64(list(uniq))
        bits = ((h[:, None] >> self.bit_cols[None, :]) & np.uint64(1)).astype(np.int64)
        acc = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
        return int(((acc > 0).astype(np.uint64) << self.bit_cols).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch[self.id_col],
            "simhash": pa.array(
                [self.simhash(t) for t in batch[self.text_col].to_pylist()],
                pa.uint64()),
        })


def simhash_pairs(ds: rd.Dataset, *, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", concurrency=None) -> rd.Dataset:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Banding: 4 × 16-bit
    chunks — any pair within hamming 3 shares ≥ 1 exact chunk (pigeonhole)."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency or (1, 8))

    def explode(batch: pa.Table) -> pa.Table:
        ids, bands, keys, hs = [], [], [], []
        for did, h in zip(batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()):
            for b in range(4):
                ids.append(did); bands.append(b)
                keys.append((h >> (16 * b)) & 0xFFFF); hs.append(h)
        return pa.table({"doc_id": pa.array(ids), "band": pa.array(bands, pa.int32()),
                         "key": pa.array(keys, pa.int32()),
                         "simhash": pa.array(hs, pa.uint64())})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        ids, hs = g["doc_id"].tolist(), g["simhash"].tolist()
        a, b, d = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                ham = bin(int(hs[i]) ^ int(hs[j])).count("1")
                if ham <= max_hamming:
                    a.append(ids[i]); b.append(ids[j]); d.append(ham)
        return pd.DataFrame({"a": a, "b": b, "hamming": d})

    pairs = (sigs.map_batches(explode, batch_format="pyarrow")
             .groupby(["band", "key"]).map_groups(bucket_pairs, batch_format="pandas"))
    return pairs.groupby(["a", "b"]).map_groups(lambda g: g.head(1),
                                                batch_format="pandas")


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


def verify_pairs_exact(pairs: rd.Dataset, docs: rd.Dataset, *, n: int = 3,
                       threshold: float = 0.6, id_col: str = "doc_id",
                       text_col: str = "text") -> rd.Dataset:
    """Exact n-gram Jaccard over candidate pairs. The doc texts are broadcast via
    ``ray.put`` when the candidate id-set is small (semi-join pattern); the scale
    path for huge candidate sets is a bucketed hash join on doc_id (ray_guide
    'Joins and lookups')."""
    need = set()
    for row in pairs.select_columns(["a", "b"]).take_all():
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


def embedding_dup_pairs(ds: rd.Dataset, *, threshold: float = 0.98,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> rd.Dataset:
    """Embedding-cosine near-dup pairs (a < b, cosine ≥ threshold). Broadcast the
    normalized matrix once (ray.put), blocked matmul per batch — no shuffle."""
    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows])
    mat = np.array([r[vec_col] for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    ref = ray.put((ids, mat))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        bids = np.array(batch[id_col].to_pylist())
        bmat = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
        sims = bmat @ all_mat.T
        ii, jj = np.nonzero(sims >= threshold)
        keep = bids[ii] < all_ids[jj]
        return pa.table({
            "a": pa.array(bids[ii][keep].tolist(), pa.int64()),
            "b": pa.array(all_ids[jj][keep].tolist(), pa.int64()),
            "cosine": pa.array(np.round(sims[ii, jj][keep], 6).tolist(), pa.float64()),
        })

    return ds.map_batches(block, batch_format="pyarrow")
