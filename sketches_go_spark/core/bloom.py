"""Bloom filter — mergeable set-membership sketch (Bloom 1970).  Companion
sketch per the north rule.

Published bound: false-positive rate ≈ (1 - e^{-k n / m})^k for m bits,
k hash functions, n inserted items; no false negatives.

Hash family: position j = portable_hash64("bloom{j}:" + x) % m — identical in
the python core, the Catalyst path and the DuckDB oracle.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketches_go_spark.core.hashing import portable_hash64_np


def bloom_salt(j: int) -> str:
    return f"bloom{j}:"


def optimal_k(m_bits: int, n_items: int) -> int:
    if n_items <= 0:
        return 1
    return max(1, round(m_bits / n_items * math.log(2)))


class BloomFilter:
    def __init__(self, m_bits: int = 4096, k: int = 5):
        self.m = m_bits
        self.k = k
        self.bits = np.zeros(m_bits, dtype=bool)

    def _positions(self, items) -> np.ndarray:
        return np.stack(
            [portable_hash64_np(items, bloom_salt(j)) % self.m for j in range(self.k)]
        )

    def add(self, items) -> "BloomFilter":
        self.bits[self._positions(items).ravel()] = True
        return self

    def might_contain(self, items) -> np.ndarray:
        pos = self._positions(items)
        return np.all(self.bits[pos], axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("cannot merge Bloom filters with different shapes")
        self.bits |= other.bits
        return self

    def expected_fpr(self, n_items: int) -> float:
        return (1 - math.exp(-self.k * n_items / self.m)) ** self.k

    def to_bytes(self) -> bytes:
        return struct.pack("<II", self.m, self.k) + np.packbits(self.bits).tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "BloomFilter":
        m, k = struct.unpack_from("<II", b, 0)
        out = cls(m, k)
        out.bits = np.unpackbits(
            np.frombuffer(b, dtype=np.uint8, offset=8), count=m
        ).astype(bool)
        return out
