"""Count-min sketch — mergeable frequency sketch (Cormode & Muthukrishnan
2005).  Companion sketch per the north rule.

Published bound: with width w and depth d, the estimate overshoots the true
count by at most eps*N (eps = e/w) with probability >= 1 - e^-d, and never
undershoots.

Hash family: row j uses the portable 60-bit hash with salt ``"cms{j}:"`` and
column ``h % w`` — identical in the python core, the Catalyst path and the
DuckDB oracle.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketches_go_spark.core.hashing import portable_hash64_np


def cms_salt(j: int) -> str:
    return f"cms{j}:"


class CountMinSketch:
    def __init__(self, depth: int = 4, width: int = 512):
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.float64)

    def add_hashed(self, cols_by_row: np.ndarray, counts: np.ndarray | None = None) -> "CountMinSketch":
        """cols_by_row: int array (depth, n) of precomputed columns h_j % w."""
        n = cols_by_row.shape[1]
        c = np.ones(n) if counts is None else np.asarray(counts, dtype=np.float64)
        for j in range(self.depth):
            np.add.at(self.table[j], cols_by_row[j], c)
        return self

    def add(self, items, counts=None) -> "CountMinSketch":
        cols = np.stack(
            [portable_hash64_np(items, cms_salt(j)) % self.width for j in range(self.depth)]
        )
        return self.add_hashed(cols, counts)

    def estimate(self, items) -> np.ndarray:
        cols = np.stack(
            [portable_hash64_np(items, cms_salt(j)) % self.width for j in range(self.depth)]
        )
        return np.min(
            np.stack([self.table[j][cols[j]] for j in range(self.depth)]), axis=0
        )

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("cannot merge CMS with different shapes")
        self.table += other.table
        return self

    @property
    def epsilon(self) -> float:
        return math.e / self.width

    @property
    def delta(self) -> float:
        return math.exp(-self.depth)

    def to_bytes(self) -> bytes:
        return struct.pack("<II", self.depth, self.width) + self.table.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMinSketch":
        d, w = struct.unpack_from("<II", b, 0)
        out = cls(d, w)
        out.table = np.frombuffer(b, dtype=np.float64, offset=8).reshape(d, w).copy()
        return out
