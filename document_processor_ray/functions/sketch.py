"""Mergeable sketches for distributed approximate aggregates.

HyperLogLog (Flajolet et al. '07) count-distinct: each batch emits one serialized
register array; registers merge by elementwise max in a tiny reduce — the
canonical sketch pattern for 100 TB streams (ray_guide "Aggregation at scale":
emit one sketch per batch, merge in a second, tiny stage).
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

    def to_bytes(self) -> bytes:
        return self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, p: int = 12) -> "HLL":
        h = cls(p)
        h.registers = np.frombuffer(data, dtype=np.uint8).copy()
        return h


def _hash_col(vals: list) -> np.ndarray:
    return np.array(
        [int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=8).digest(),
                        "little") for v in vals],
        dtype=np.uint64,
    )


def approx_distinct(ds: rd.Dataset, col: str, p: int = 12) -> int:
    """Distributed HLL count-distinct: one sketch per batch, merged on the driver
    (merge payload = m bytes per batch, never the values)."""

    def sketch_batch(b: pa.Table) -> pa.Table:
        h = HLL(p)
        h.add_hashes(_hash_col(b[col].to_pylist()))
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.binary())})

    merged = HLL(p)
    for row in ds.map_batches(sketch_batch, batch_format="pyarrow").take_all():
        merged.merge(HLL.from_bytes(row["sketch"], p))
    return int(round(merged.estimate()))
