"""SQL-mirrorable witnesses for the near-dup signature families.

The production MinHash/SimHash (``functions/dedup.py``) hash with blake2b and
mix mod 2^64 — fast, but DuckDB cannot reproduce either (no blake2b; u64
multiplication overflows HUGEINT at 2^127). These witnesses re-express the
SAME signature semantics in arithmetic both engines share bit-for-bit, so the
numerically hard core of each family gets a value-hash oracle:

- tokens hash with md5 (bytes 8..16 little-endian == DuckDB
  ``md5_number_lower``), tokenized by the ``[ \\t\\n\\r\\f]+`` regex class the
  existing token oracles pin;
- MinHash runs entirely mod M = 2^61-1: token hashes reduce mod M, the
  3-token shingle polynomial and the k=16 permutations are mod-M products —
  HUGEINT-safe (operands < 2^61 keep every product < 2^122 < 2^127);
- SimHash is already integer-exact (signed multiplicity sums per bit); only
  the hash/tokenizer change.

numpy has no 128-bit ints, so the mod-M product uses the classic Mersenne
split: a*b = a_hi*b_hi*2^64 + (a_hi*b_lo + a_lo*b_hi)*2^32 + a_lo*b_lo with
2^61 === 1 (mod M), every partial folded below 2^63 — vectorized, no Python
per-row work. All constants are pinned literals mirrored verbatim in the SQL
oracles (``pipelines/queries.py::SQL_MINHASH_SIGS`` / ``SQL_SIMHASH_SIGS``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

M61 = np.uint64((1 << 61) - 1)

# 3-token shingle polynomial constants: the splitmix64 constants used by the
# production signer, reduced mod M (pinned literals, mirrored in SQL)
C1 = np.uint64(2177342782468422681)
C2 = np.uint64(2258633747088074174)
C3 = np.uint64(1499779743744070127)

# k=16 permutation parameters from RandomState(20250819), reduced into [1, M)
# / [0, M) — pinned literals, mirrored in the SQL VALUES list
PERM_A = np.array([
    161783044969865361, 1253037630038414346, 1211691016609570074,
    112487526851420348, 1147494184003706799, 341655084064371734,
    1682263752012145498, 582533385370489606, 1918770616093810682,
    919077091889351839, 2011408697998162808, 1079365583683518842,
    320630544007800531, 993455726057165935, 1053813949153199038,
    29507949709329712], dtype=np.uint64)
PERM_B = np.array([
    616059259915317539, 294708338141792757, 963279562875064661,
    416790898057187056, 1885484957211360197, 2068438985766178347,
    112368096118177428, 1662039512607195119, 97970066371827807,
    176139585570932298, 1578416310055072854, 2166721399582613053,
    45263012668960698, 2304943031768533190, 1314145847639288079,
    156299750599766892], dtype=np.uint64)

_MASK32 = np.uint64(0xFFFFFFFF)
_MASK29 = np.uint64((1 << 29) - 1)


def _fold61(x: np.ndarray) -> np.ndarray:
    """x (< 2^63) reduced to canonical [0, M)."""
    x = (x & M61) + (x >> np.uint64(61))
    x = (x & M61) + (x >> np.uint64(61))
    return np.where(x >= M61, x - M61, x)


def mulmod61(a: np.ndarray, b: np.ndarray | np.uint64) -> np.ndarray:
    """(a * b) mod 2^61-1 for operands < 2^61, vectorized without 128-bit
    ints: split at 32/29 bits and fold exponents with 2^61 === 1."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    a_hi, a_lo = a >> np.uint64(32), a & _MASK32
    b_hi, b_lo = b >> np.uint64(32), b & _MASK32
    hi = a_hi * b_hi                       # < 2^58; *2^64 === *8 (mod M)
    mid = a_hi * b_lo + a_lo * b_hi        # < 2^62
    lo = a_lo * b_lo                       # < 2^64, exact in u64
    mid_hi = mid >> np.uint64(29)          # mid*2^32 = mid_hi*2^61 + mid_lo*2^32
    mid_lo = mid & _MASK29
    lo_fold = (lo & M61) + (lo >> np.uint64(61))
    s = hi * np.uint64(8) + mid_hi + (mid_lo << np.uint64(32)) + lo_fold
    return _fold61(s)


def addmod61(a: np.ndarray, b: np.ndarray | np.uint64) -> np.ndarray:
    return _fold61(np.asarray(a, np.uint64) + np.asarray(b, np.uint64))


def _regex_tokens_md5_m61(texts, cache: dict[str, int]):
    """Whitespace-class tokenize (SQL-parity regex) + md5-low-64 mod M per
    unique token. Returns (flat doc-major token values < M, per-doc counts)."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    toks = pc.split_pattern_regex(pc.fill_null(texts, ""),
                                  pattern=r"[ \t\n\r\f]+")
    flat = pc.list_flatten(toks)
    nonempty = pc.not_equal(flat, "")
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    mask = nonempty.to_numpy(zero_copy_only=False).astype(bool)
    counts = np.bincount(parent[mask], minlength=n).astype(np.int64)
    denc = flat.filter(nonempty).dictionary_encode()
    uniq = denc.dictionary.to_pylist()
    uh = np.empty(len(uniq), dtype=np.uint64)
    big_m = int(M61)
    for i, t in enumerate(uniq):
        h = cache.get(t)
        if h is None:
            h = int.from_bytes(hashlib.md5(t.encode()).digest()[8:],
                               "little") % big_m
            if len(cache) < 1_000_000:
                cache[t] = h
        uh[i] = h
    idx = denc.indices.to_numpy(zero_copy_only=False)
    return uh[idx], counts


def _witness_sig_matrix(texts, cache: dict[str, int]) -> np.ndarray:
    """(n_docs, 16) mod-M signature matrix — the shared kernel behind the
    long-form witness query and the banded-pair witness. Shingle rule
    (mirrored in SQL): docs with n>=3 tokens emit n-2 3-token windows; n=2
    one 2-term window; n=1 one 1-term window; n=0 one zero shingle — every
    doc emits exactly max(n-2, 1) shingles."""
    th, counts = _regex_tokens_md5_m61(texts, cache)
    k = len(PERM_A)
    n_docs = len(counts)
    n_sh = np.maximum(counts - 2, 1)
    sh_offs = np.concatenate([[0], np.cumsum(n_sh)])
    tok_offs = np.concatenate([[0], np.cumsum(counts)])
    total = int(sh_offs[-1])
    par = np.repeat(np.arange(n_docs), n_sh)
    pos = np.arange(total) - sh_offs[par]          # 0-based window start
    tpos = tok_offs[par] + pos
    width = np.minimum(counts[par] - pos, 3)       # 0 only for empty docs
    h = np.zeros(total, dtype=np.uint64)
    m1 = width >= 1
    h[m1] = mulmod61(th[tpos[m1]], C1)
    m2 = width >= 2
    h[m2] = addmod61(h[m2], mulmod61(th[tpos[m2] + 1], C2))
    m3 = width >= 3
    h[m3] = addmod61(h[m3], mulmod61(th[tpos[m3] + 2], C3))
    sig = np.empty((n_docs, k), dtype=np.uint64)
    starts = sh_offs[:-1].astype(np.intp)
    for j in range(k):
        v = addmod61(mulmod61(h, PERM_A[j]), PERM_B[j])
        sig[:, j] = np.minimum.reduceat(v, starts)
    return sig


class MinHashWitness:
    """Actor-pool stage: (doc_id, perm, sig) mod-M MinHash signatures in long
    form (see ``_witness_sig_matrix`` for the shingle rule)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        k = len(PERM_A)
        if batch.num_rows == 0:
            return pa.table({"doc_id": ids.take(pa.array([], pa.int64())),
                             "perm": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.int64())})
        sig = _witness_sig_matrix(batch[self.text_col], self._cache)
        n_docs = batch.num_rows
        idx = pa.array(np.repeat(np.arange(n_docs), k))
        return pa.table({
            "doc_id": ids.take(idx),
            "perm": pa.array(np.tile(np.arange(k, dtype=np.int64), n_docs)),
            "sig": pa.array(sig.reshape(-1).view(np.int64)),
        })


def minhash_sigs_m61(ds: rd.Dataset, text_col: str = "text",
                     id_col: str = "doc_id", concurrency=None) -> rd.Dataset:
    """Long-form (doc_id, perm, sig) mod-M MinHash signatures — one
    shuffle-free actor-pool pass; the SQL-hash-checked witness for the
    MinHash family (production pairs stay ``minhash_lsh_pairs``)."""
    return ds.map_batches(
        MinHashWitness,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency or (1, 8))


class _BandedWitness:
    """Actor-pool stage for ``minhash_band_pairs``: per doc, 4 banded rows
    (band id, exact band key = the 4 sig values joined as decimal text, full
    16-sig blob for the agreement count)."""

    BANDS, ROWS = 4, 4

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if batch.num_rows == 0:
            return pa.table({"doc_id": ids.take(pa.array([], pa.int64())),
                             "band": pa.array([], pa.int32()),
                             "key": pa.array([], pa.string()),
                             "sig": pa.array([], pa.binary())})
        sig = _witness_sig_matrix(batch[self.text_col], self._cache)
        n = batch.num_rows
        blobs = [sig[i].tobytes() for i in range(n)]
        keys = ["-".join(str(int(v)) for v in sig[i, b * 4:b * 4 + 4])
                for i in range(n) for b in range(self.BANDS)]
        idx = pa.array(np.repeat(np.arange(n), self.BANDS))
        return pa.table({
            "doc_id": ids.take(idx),
            "band": pa.array(np.tile(np.arange(self.BANDS, dtype=np.int32), n)),
            "key": pa.array(keys, pa.string()),
            "sig": pa.array([blobs[i // self.BANDS]
                             for i in range(n * self.BANDS)], pa.binary()),
        })


def minhash_band_pairs(ds: rd.Dataset, min_agree: int = 8,
                       text_col: str = "text", id_col: str = "doc_id",
                       max_bucket: int = 512,
                       concurrency=None) -> rd.Dataset:
    """Fully SQL-hash-checkable LSH PAIR pipeline over the mod-M witness
    signatures: candidates = doc pairs whose 4-row band signatures are EQUAL
    in some band (exact tuple equality, no hash-key collisions to diverge
    on), kept when >= ``min_agree`` of the 16 signature positions agree — an
    integer est-Jaccard of min_agree/16. One signature pass + ONE
    co-partition on (band, key); output (a, b, n_agree) with a < b.

    Unlike production ``minhash_lsh_pairs`` there is NO hot-bucket
    degrade-to-chain cap: SQL parity requires the full in-bucket pair set, so
    an oversized bucket (> ``max_bucket``) raises loudly instead of silently
    diverging — run exact_dedup first (the production contract) or raise the
    bound for corpora with huge identical-text groups."""
    import pandas as pd

    from ..core.groupops import grouped_reduce

    banded = ds.map_batches(
        _BandedWitness,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency or (1, 8))

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["band", "key", "doc_id"])
        multi = g[g.duplicated(["band", "key"], keep=False)]
        out_a, out_b, out_n = [], [], []
        for _, grp in multi.groupby(["band", "key"], sort=False):
            if len(grp) > max_bucket:
                raise ValueError(
                    f"minhash_band_pairs: bucket of {len(grp)} members "
                    f"exceeds max_bucket={max_bucket}; dedup exact "
                    "duplicates first or raise the bound")
            grp = grp.sort_values("doc_id")
            ids = grp["doc_id"].to_numpy()
            sigs = np.stack([np.frombuffer(s, dtype=np.uint64)
                             for s in grp["sig"]])
            ii, jj = np.triu_indices(len(ids), k=1)
            agree = (sigs[ii] == sigs[jj]).sum(axis=1).astype(np.int64)
            keep = np.flatnonzero(agree >= min_agree)
            out_a.extend(ids[ii[keep]].tolist())
            out_b.extend(ids[jj[keep]].tolist())
            out_n.extend(agree[keep].tolist())
        return pd.DataFrame({"a": out_a, "b": out_b, "n_agree": out_n})

    pairs = grouped_reduce(banded, ["band", "key"], part_pairs)
    return grouped_reduce(pairs, ["a", "b"],
                          lambda g: g.drop_duplicates(["a", "b"]))


class SimHashWitness:
    """Actor-pool stage: (doc_id, simhash int64) with md5 token hashes and the
    SQL-parity regex tokenizer. Bit rule (integer-exact on both engines):
    bit j set iff the multiplicity-weighted sum of (+-1 per token's md5 bit j)
    is > 0; empty docs hash to 0."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col, self.id_col = text_col, id_col
        self.bit_cols = np.arange(64, dtype=np.uint64)
        self._cache: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": ids, "simhash": pa.array([], pa.int64())})
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        toks = pc.split_pattern_regex(pc.fill_null(texts, ""),
                                      pattern=r"[ \t\n\r\f]+")
        flat = pc.list_flatten(toks)
        nonempty = pc.not_equal(flat, "")
        par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)[
            nonempty.to_numpy(zero_copy_only=False).astype(bool)]
        denc = flat.filter(nonempty).dictionary_encode()
        uniq = denc.dictionary.to_pylist()
        cache = self._cache
        uh = np.empty(len(uniq), dtype=np.uint64)
        for i, t in enumerate(uniq):
            hv = cache.get(t)
            if hv is None:
                hv = int.from_bytes(hashlib.md5(t.encode()).digest()[8:],
                                    "little")
                if len(cache) < 1_000_000:
                    cache[t] = hv
            uh[i] = hv
        didx = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pairs, cnts = np.unique(par * (len(uniq) + 1) + didx, return_counts=True)
        p_doc = pairs // (len(uniq) + 1)
        p_tok = pairs % (len(uniq) + 1)
        bits = ((uh[p_tok][:, None] >> self.bit_cols[None, :]) & np.uint64(1)
                ).astype(np.int64)
        contrib = (bits * 2 - 1) * cnts[:, None].astype(np.int64)
        acc = np.zeros((n, 64), dtype=np.int64)
        np.add.at(acc, p_doc, contrib)
        sims = ((acc > 0).astype(np.uint64) << self.bit_cols[None, :]).sum(axis=1)
        return pa.table({"doc_id": ids,
                         "simhash": pa.array(sims.view(np.int64))})


def simhash_band_pairs(ds: rd.Dataset, max_hamming: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       max_bucket: int = 512, concurrency=None) -> rd.Dataset:
    """Fully SQL-hash-checkable SimHash PAIR pipeline over the md5 witness
    signatures: 4 x 16-bit pigeonhole bands (any pair within hamming
    ``max_hamming`` <= 3 shares >= 1 exact band), candidates verified with an
    exact 64-bit popcount — DuckDB mirrors the verify as
    ``bit_count(xor(a, b))`` (two's-complement BIGINT popcount == u64
    popcount). One signature pass + ONE (band, key) co-partition + a pair
    dedup; output (a, b, hamming) with a < b.

    Like ``minhash_band_pairs`` there is NO hot-bucket degrade cap: SQL
    parity requires the full in-bucket pair set, so a bucket over
    ``max_bucket`` raises loudly (run exact_dedup first — the production
    contract — or raise the bound)."""
    import pandas as pd

    from ..core.groupops import grouped_reduce
    from .dedup import _popcount64

    sigs = ds.map_batches(
        SimHashWitness,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency or (1, 8))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": ids,
                             "band": pa.array([], pa.int32()),
                             "key": pa.array([], pa.int32()),
                             "simhash": pa.array([], pa.int64())})
        sims = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        bands = np.tile(np.arange(4, dtype=np.int32), n)
        shifts = (bands.astype(np.uint64)) * np.uint64(16)
        rep = np.repeat(sims, 4)
        keys = ((rep >> shifts) & np.uint64(0xFFFF)).astype(np.int32)
        idx = pa.array(np.repeat(np.arange(n), 4))
        return pa.table({"doc_id": ids.take(idx),
                         "band": pa.array(bands),
                         "key": pa.array(keys),
                         "simhash": pa.array(rep.view(np.int64))})

    exploded = sigs.map_batches(explode, batch_format="pyarrow")

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["band", "key", "doc_id"])
        multi = g[g.duplicated(["band", "key"], keep=False)]
        out_a, out_b, out_h = [], [], []
        for _, grp in multi.groupby(["band", "key"], sort=False):
            if len(grp) > max_bucket:
                raise ValueError(
                    f"simhash_band_pairs: bucket of {len(grp)} members "
                    f"exceeds max_bucket={max_bucket}; dedup exact "
                    "duplicates first or raise the bound")
            grp = grp.sort_values("doc_id")
            ids_np = grp["doc_id"].to_numpy()
            hs = grp["simhash"].to_numpy().astype(np.int64).view(np.uint64)
            ii, jj = np.triu_indices(len(ids_np), k=1)
            ham = (_popcount64(hs[ii] ^ hs[jj]) if len(ii)
                   else np.array([], np.int64))
            keep = np.flatnonzero(ham <= max_hamming)
            out_a.extend(ids_np[ii[keep]].tolist())
            out_b.extend(ids_np[jj[keep]].tolist())
            out_h.extend(ham[keep].astype(np.int64).tolist())
        return pd.DataFrame({"a": out_a, "b": out_b, "hamming": out_h})

    pairs = grouped_reduce(exploded, ["band", "key"], part_pairs)
    return grouped_reduce(pairs, ["a", "b"],
                          lambda g: g.drop_duplicates(["a", "b"]))


def simhash_md5(ds: rd.Dataset, text_col: str = "text",
                id_col: str = "doc_id", concurrency=None) -> rd.Dataset:
    """(doc_id, simhash) witness signatures — the SQL-hash-checked mirror of
    the SimHash family (production pairs stay ``simhash_pairs``)."""
    return ds.map_batches(
        SimHashWitness,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=concurrency or (1, 8))


# --- pure-Python references for pytest (never used by the pipeline) --------

def minhash_sig_ref(text: str) -> list[int]:
    """Arbitrary-precision reimplementation of MinHashWitness for one doc."""
    m = int(M61)
    toks = [t for t in __import__("re").split(r"[ \t\n\r\f]+", text or "")
            if t != ""]
    th = [int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little") % m
          for t in toks]
    c1, c2, c3 = int(C1), int(C2), int(C3)
    n = len(th)
    if n == 0:
        hs = [0]
    elif n == 1:
        hs = [(th[0] * c1) % m]
    elif n == 2:
        hs = [(th[0] * c1 + th[1] * c2) % m]
    else:
        hs = [(th[i] * c1 + th[i + 1] * c2 + th[i + 2] * c3) % m
              for i in range(n - 2)]
    return [min((int(a) * h + int(b)) % m for h in hs)
            for a, b in zip(PERM_A, PERM_B)]


def simhash_ref(text: str) -> int:
    """Arbitrary-precision reimplementation of SimHashWitness for one doc."""
    toks = [t for t in __import__("re").split(r"[ \t\n\r\f]+", text or "")
            if t != ""]
    if not toks:
        return 0
    acc = [0] * 64
    from collections import Counter
    for t, c in Counter(toks).items():
        h = int.from_bytes(hashlib.md5(t.encode()).digest()[8:], "little")
        for j in range(64):
            acc[j] += c if (h >> j) & 1 else -c
    v = sum(1 << j for j in range(64) if acc[j] > 0)
    return v - (1 << 64) if v >= (1 << 63) else v
