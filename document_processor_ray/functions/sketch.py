"""Mergeable sketches for distributed approximate aggregates.

HyperLogLog (Flajolet et al. '07) count-distinct: each batch emits one serialized
register array; registers merge by elementwise max in a tiny reduce — the
canonical sketch pattern for 100 TB streams (ray_guide "Aggregation at scale":
emit one sketch per batch, merge in a second, tiny stage).

KLL (Karnin-Lang-Liberty, FOCS'16) quantiles: the high-cardinality companion to
the exact bounded-domain histogram quantiles (pipelines.queries
``quantity_quantiles``) — when the value domain is unbounded (prices, floats),
the exact (value, count) shuffle degenerates to one row per distinct value; KLL
keeps a fixed-size mergeable summary per batch with rank error O(1/k) instead.
Same pattern: one sketch per batch, tiny driver-side merge of serialized
sketches (bytes per batch, never the values).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd


class HLL:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = (h << np.uint64(self.p)) | np.uint64((1 << self.p) - 1)
        # rank = leading zeros of rest + 1, vectorized via bit tricks
        lz = np.zeros(len(h), dtype=np.uint8)
        mask = np.uint64(1) << np.uint64(63)
        cur = rest.copy()
        done = np.zeros(len(h), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            top = (cur & mask) != 0
            newly = top & ~done
            lz[newly] = r
            done |= top
            if done.all():
                break
            cur = cur << np.uint64(1)
        np.maximum.at(self.registers, idx, lz)

    def merge(self, other: "HLL") -> "HLL":
        self.registers = np.maximum(self.registers, other.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)  # small-range correction
        return float(e)

    def estimate_ppm(self) -> int:
        """Integer-exact estimate in ppm (estimate * 1e6), bit-reproducible
        across engines: the harmonic sum runs in arbitrary-precision Python
        ints (S = sum of 2^(64-M_j), exact), the raw estimate is one integer
        division, and the p=6 linear-counting regime reads a pinned literal
        table — so a DuckDB mirror computing the same integers hash-matches
        (see SQL_APPROX_DISTINCT_USERS). float `estimate()` stays the general
        API; this is the cross-engine-checkable one (p=6 pinned; other p fall
        back to runtime floor(m*ln(m/z)*1e6) for the linear regime)."""
        m = self.m
        regs = self.registers
        s = int(sum((1 << (64 - int(r))) for r in regs))
        if self.p == 6:
            alpha_ppm = _ALPHA_PPM_P6
        else:
            alpha_ppm = int(round(0.7213 / (1 + 1.079 / m) * 1e6))
        raw = (alpha_ppm * m * m * (1 << 64)) // s
        zeros = int((regs == 0).sum())
        if raw <= 25 * m * 100_000 and zeros:  # e <= 2.5 m, in ppm
            if self.p == 6:
                return _LINEAR_PPM_P6[zeros - 1]
            import math
            return int(math.floor(m * math.log(m / zeros) * 1e6))
        return raw

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


def _hash_col(vals: list, hasher: str = "blake2b") -> np.ndarray:
    if hasher == "md5":
        # bytes 8..16 of the md5 digest little-endian == DuckDB's
        # md5_number_lower — the cross-engine-mirrorable hash choice
        return np.array(
            [int.from_bytes(hashlib.md5(str(v).encode()).digest()[8:], "little")
             for v in vals],
            dtype=np.uint64,
        )
    return np.array(
        [int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                        "little") for v in vals],
        dtype=np.uint64,
    )


# Integer-exact HLL estimate constants for p=6 (m=64), pinned as literals so
# the engine and the DuckDB mirror can never drift (no runtime libm anywhere):
# alpha_ppm = round(0.7213 / (1 + 1.079/m) * 1e6); linear-counting table
# entry z (1-based) = floor(m * ln(m / z) * 1e6).
_ALPHA_PPM_P6 = 709341
_LINEAR_PPM_P6 = [
    266168517, 221807097, 195857330, 177445678, 163164490, 151495911,
    141630267, 133084258, 125546144, 118803071, 112703219, 107134491,
    102011758, 97268848, 92853304, 88722839, 84842863, 81184724, 77724422,
    74441651, 71319081, 68341800, 65496887, 62773072, 60160464, 57650338,
    55234957, 52907428, 50661584, 48491884, 46393336, 44361419, 42392033,
    40481443, 38626241, 36823305, 35069770, 33363003, 31700571, 30080232,
    28499905, 26957661, 25451709, 23980380, 22542117, 21135467, 19759070,
    18411652, 17092018, 15799044, 14531676, 13288919, 12069834, 10873538,
    9699193, 8546009, 7413236, 6300164, 5206120, 4130465, 3072590, 2031916,
    1007894, 0,
]


class KLL:
    """KLL quantile sketch over float64 values (Karnin-Lang-Liberty '16).

    Level ``i`` holds items of weight ``2**i``. A level past its capacity
    compacts: sort, promote every other item to the next level (the start
    offset comes from a deterministic splitmix64 counter — reproducible across
    runs and machines, unlike process-random coins), leaving one item behind
    when the level size is odd so total weight is conserved exactly. Capacity
    decays by (2/3)^depth below the top level, giving the standard O(1/k)
    rank-error profile with ~3k retained items regardless of stream size."""

    C = 2.0 / 3.0

    def __init__(self, k: int = 200, seed: int = 7):
        self.k = int(k)
        self.n = 0
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self._state = np.uint64(seed)

    def _coin(self) -> int:
        self._state = self._state + np.uint64(0x9E3779B97F4A7C15)
        z = self._state
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return int(z & np.uint64(1))

    def _cap(self, h: int, n_levels: int) -> int:
        return max(2, int(np.ceil(self.k * self.C ** (n_levels - 1 - h))))

    def add(self, vals: np.ndarray) -> None:
        vals = np.asarray(vals, np.float64)
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            return
        self.n += len(vals)
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self._compress()

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self._cap(h, len(self.levels)):
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                lvl = np.sort(self.levels[h])
                leftover = np.empty(0, np.float64)
                if len(lvl) % 2:
                    # odd size: one item stays behind (weight conservation);
                    # alternate min/max by coin so neither tail is biased
                    if self._coin():
                        leftover, lvl = lvl[:1], lvl[1:]
                    else:
                        leftover, lvl = lvl[-1:], lvl[:-1]
                promoted = lvl[self._coin()::2]
                self.levels[h] = leftover
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], promoted])
            h += 1

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for i, lvl in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lvl])
        self.n += other.n
        self._compress()
        return self

    def _items(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate(self.levels)
        wts = np.concatenate([np.full(len(l), 1 << i, np.int64)
                              for i, l in enumerate(self.levels)])
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        vals, wts = self._items()
        cum = np.cumsum(wts)
        idx = min(int(np.searchsorted(cum, q * self.n, side="left")),
                  len(vals) - 1)
        return float(vals[idx])

    def n_retained(self) -> int:
        return int(sum(len(l) for l in self.levels))

    def to_bytes(self) -> bytes:
        head = np.array([self.k, self.n, int(self._state), len(self.levels)],
                        dtype=np.uint64).tobytes()
        lens = np.array([len(l) for l in self.levels], np.uint64).tobytes()
        return head + lens + np.concatenate(self.levels).tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "KLL":
        head = np.frombuffer(data[:32], np.uint64)
        s = cls(k=int(head[0]))
        s.n = int(head[1])
        s._state = np.uint64(head[2])
        nlv = int(head[3])
        lens = np.frombuffer(data[32 : 32 + 8 * nlv], np.uint64).astype(np.int64)
        flat = np.frombuffer(data[32 + 8 * nlv :], np.float64)
        offs = np.concatenate([[0], np.cumsum(lens)])
        s.levels = [flat[offs[i] : offs[i + 1]].copy() for i in range(nlv)]
        return s


def approx_quantiles(ds: rd.Dataset, col: str, qs: list[float],
                     k: int = 200) -> list[float]:
    """Distributed KLL quantiles over an unbounded-domain numeric column: one
    fixed-size sketch per batch (map_batches — the column never leaves the
    workers), merged on the driver from ~3k-float payloads per batch. Rank
    error is O(1/k) (tolerance-tested vs exact quantiles); use the exact
    (value, count) histogram path for small bounded domains."""

    def sketch_batch(b: pa.Table) -> pa.Table:
        s = KLL(k)
        s.add(b[col].to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"sketch": pa.array([s.to_bytes()], pa.binary())})

    merged = KLL(k)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        merged.merge(KLL.from_bytes(row["sketch"]))
    return [merged.quantile(q) for q in qs]


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12,
                    hasher: str = "blake2b", ppm: bool = False) -> int:
    """Distributed HLL count-distinct: one sketch per batch, merged on the driver
    (merge payload = m bytes per batch, never the values).

    ``hasher="md5"`` + ``ppm=True`` selects the cross-engine-mirrorable mode:
    md5-low-64 hashing (DuckDB ``md5_number_lower``) and the integer-exact
    ``estimate_ppm`` — the result then hash-matches a pure-SQL HLL."""

    def sketch_batch(b: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_hashes(_hash_col(b[col].to_pylist(), hasher))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HLL(p)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        merged.merge(HLL.from_bytes(row["sketch"], p))
    return merged.estimate_ppm() if ppm else int(round(merged.estimate()))


def approx_quantiles_by(ds: rd.Dataset, group_col: str, col: str,
                        qs: list[float], k: int = 200,
                        n_parts: int = 32) -> rd.Dataset:
    """GROUPED KLL quantiles: ``(group_col, q, value)`` — the sketch path for
    percentile-per-group on unbounded/float domains (the exact grouped
    order-statistic path sorts each group; this ships one ~k-float summary
    per (batch, group) and merges under ONE coarse co-partition)."""
    from ..core.groupops import grouped_reduce

    def _segments(gv: np.ndarray):
        order = np.argsort(gv, kind="stable")
        so = gv[order]
        if not len(so):
            return order, np.array([0], dtype=np.int64)
        first = np.empty(len(so), dtype=bool)
        first[0] = True
        first[1:] = so[1:] != so[:-1]
        return order, np.append(np.flatnonzero(first), len(so))

    def sketch_batch(b: pa.Table) -> pa.Table:
        gv = b[group_col].to_numpy(zero_copy_only=False)
        vv = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        order, bounds = _segments(gv)
        groups, sketches = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            sel = order[s:e]
            sk = KLL(k)
            sk.add(vv[sel])
            groups.append(gv[sel[0]])
            sketches.append(sk.to_bytes())
        return pa.table({group_col: pa.array(groups, b[group_col].type),
                         "sketch": pa.array(sketches, pa.binary())})

    def merge_part(t: pa.Table) -> pa.Table:
        gv = t[group_col].to_numpy(zero_copy_only=False)
        sk = t["sketch"].to_pylist()
        order, bounds = _segments(gv)
        groups, qouts, vals = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            sel = order[s:e]
            m = KLL.from_bytes(sk[sel[0]])
            for i in sel[1:]:
                m.merge(KLL.from_bytes(sk[i]))
            for q in qs:
                groups.append(gv[sel[0]])
                qouts.append(q)
                vals.append(float(m.quantile(q)))
        return pa.table({group_col: pa.array(groups, t[group_col].type),
                         "q": pa.array(qouts, pa.float64()),
                         "value": pa.array(vals, pa.float64())})

    sketched = ds.map_batches(sketch_batch, batch_format="pyarrow")
    return grouped_reduce(sketched, [group_col], merge_part, n_parts=n_parts,
                          batch_format="pyarrow")


def approx_distinct_by(ds: rd.Dataset, group_col: str, col: str,
                       p: int = 10, n_parts: int = 32,
                       hasher: str = "blake2b", ppm: bool = False) -> rd.Dataset:
    """GROUPED HLL count-distinct: ``(group_col, approx_distinct)`` — the
    sketch path for COUNT(DISTINCT x) GROUP BY g when x is high-cardinality
    (exact `distinct_users` shuffles every (g, x) pair; this ships one
    2^p-byte register array per (batch, group) instead, merged under ONE
    coarse co-partition on the group key). Registers max-combine, so the
    merge is associative/commutative — partitioning-invariant by
    construction."""
    from ..core.groupops import grouped_reduce

    def _segments(gv: np.ndarray):
        """(order, segment bounds) for a possibly-string group key."""
        order = np.argsort(gv, kind="stable")
        so = gv[order]
        if not len(so):
            return order, np.array([0], dtype=np.int64)
        first = np.empty(len(so), dtype=bool)
        first[0] = True
        first[1:] = so[1:] != so[:-1]
        return order, np.append(np.flatnonzero(first), len(so))

    def sketch_batch(b: pa.Table) -> pa.Table:
        gv = b[group_col].to_numpy(zero_copy_only=False)
        vv = b[col].to_pylist()
        order, bounds = _segments(gv)
        groups, sketches = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            sel = order[s:e]
            h = HLL(p)
            h.add_hashes(_hash_col([vv[i] for i in sel], hasher))
            groups.append(gv[sel[0]])
            sketches.append(h.to_bytes())
        return pa.table({group_col: pa.array(groups, b[group_col].type),
                         "sketch": pa.array(sketches, pa.binary())})

    def merge_part(t: pa.Table) -> pa.Table:
        gv = t[group_col].to_numpy(zero_copy_only=False)
        sk = t["sketch"].to_pylist()
        order, bounds = _segments(gv)
        groups, ests = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            sel = order[s:e]
            h = HLL.from_bytes(sk[sel[0]], p)
            for i in sel[1:]:
                h.merge(HLL.from_bytes(sk[i], p))
            groups.append(gv[sel[0]])
            ests.append(h.estimate_ppm() if ppm else int(round(h.estimate())))
        out_name = "est_ppm" if ppm else "approx_distinct"
        return pa.table({group_col: pa.array(groups, t[group_col].type),
                         out_name: pa.array(ests, pa.int64())})

    sketched = ds.map_batches(sketch_batch, batch_format="pyarrow")
    return grouped_reduce(sketched, [group_col], merge_part, n_parts=n_parts,
                          batch_format="pyarrow")


class MisraGries:
    """Misra-Gries heavy-hitters summary (Misra & Gries '82): at most ``m``
    counters; every stored count is a LOWER bound on the true frequency, and
    ``self.err`` bounds the undercount of any key (stored or evicted), so
    true_count(key) <= lower_bound(key) + err for every key in the stream.

    Mergeable (Agarwal et al., "Mergeable Summaries", PODS'12): summing two
    summaries' counters then decrementing all by the (m+1)-largest count and
    dropping <=0 keeps the bound err = err_a + err_b + decrement. This is the
    TOP-K member of the sketch trio here (HLL distinct / KLL quantiles /
    MG heavy hitters) — the scale path when even (token, count) partials are
    too wide for an exact groupby, e.g. open-vocabulary n-grams."""

    def __init__(self, m: int):
        self.m = m
        self.counts: dict = {}
        self.err = 0

    def add_counts(self, keys, counts) -> None:
        """Bulk-add exact (key, count) pairs (e.g. one batch's value_counts)."""
        for k, c in zip(keys, counts):
            self.counts[k] = self.counts.get(k, 0) + int(c)
        self._trim()

    def merge(self, other: "MisraGries") -> None:
        for k, c in other.counts.items():
            self.counts[k] = self.counts.get(k, 0) + c
        self.err += other.err
        self._trim()

    def _trim(self) -> None:
        if len(self.counts) <= self.m:
            return
        vals = np.sort(np.fromiter(self.counts.values(), dtype=np.int64))
        dec = int(vals[-(self.m + 1)])  # (m+1)-largest count
        self.counts = {k: c - dec for k, c in self.counts.items() if c > dec}
        self.err += dec

    def topk(self, k: int) -> list[tuple]:
        """(key, lower_bound) for the k largest lower bounds; count desc, key
        asc tie order. A key is a GUARANTEED top-k member when its lower bound
        exceeds the (k+1)-th upper bound."""
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))
        return items[:k]

    def to_table(self) -> pa.Table:
        keys = list(self.counts.keys())
        return pa.table({
            "key": pa.array([str(x) for x in keys], pa.string()),
            "n_min": pa.array([self.counts[x] for x in keys], pa.int64()),
            "err": pa.array([self.err] * len(keys), pa.int64())})


def approx_topk(ds: rd.Dataset, col: str, k: int = 10,
                m: int = 512) -> pa.Table:
    """Distributed approximate top-k: per-batch exact value_counts fold into
    an m-counter Misra-Gries summary (one summary per batch — the shuffle
    payload is <= m (key, count) pairs per batch regardless of cardinality),
    merged in a tiny driver reduce. Returns (key, n_min, err): n_min is a
    per-key lower bound, n_min + err an upper bound; with m >> k and Zipfian
    data the returned set equals the exact top-k (tested)."""
    import pyarrow.compute as pc

    def sketch_batch(b: pa.Table) -> pa.Table:
        v = b[col]
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        vc = pc.value_counts(v)
        mg = MisraGries(m)
        mg.add_counts(vc.field("values").to_pylist(),
                      vc.field("counts").to_pylist())
        t = mg.to_table()
        return pa.table({"keys": pa.array([t["key"].to_pylist()]),
                         "ns": pa.array([t["n_min"].to_pylist()]),
                         "err": pa.array([mg.err], pa.int64())})

    merged = MisraGries(m)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        part = MisraGries(m)
        part.counts = dict(zip(row["keys"], (int(x) for x in row["ns"])))
        part.err = int(row["err"])
        merged.merge(part)
    top = merged.topk(k)
    return pa.table({"key": pa.array([str(x) for x, _ in top], pa.string()),
                     "n_min": pa.array([c for _, c in top], pa.int64()),
                     "err": pa.array([merged.err] * len(top), pa.int64())})
