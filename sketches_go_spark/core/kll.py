"""KLL — mergeable rank/quantile sketch (Karnin, Lang, Liberty, FOCS 2016).
Companion sketch per the north rule (uniform rank-error guarantee,
complementing DDSketch's relative-value guarantee).

Published bound: additive rank error eps*N with eps ≈ O(1/k) using O(k)
space; this implementation uses the standard two-thirds capacity decay
(c = 2/3) and deterministic alternating compaction offsets, so results are
reproducible for a fixed input order.  Like every KLL, results depend on
arrival order; merge associativity holds at the accuracy level (rank-error
bound), not bit-for-bit — tests assert the bound, mirroring how the reference
treats collapsing stores (SURVEY.md §5 note on order-dependent state).
"""

from __future__ import annotations

import struct

import numpy as np

_C = 2.0 / 3.0
_MIN_CAP = 2


class KLLSketch:
    def __init__(self, k: int = 200):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.min_value = np.inf
        self.max_value = -np.inf
        self._compact_flip = 0  # deterministic alternating offset

    # ------------------------------------------------------------------ sizes
    def _capacity(self, level: int) -> int:
        height = len(self.levels)
        return max(_MIN_CAP, int(np.ceil(self.k * _C ** (height - 1 - level))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.levels)))

    def _size(self) -> int:
        return sum(a.size for a in self.levels)

    # ------------------------------------------------------------------- add
    def add(self, values) -> "KLLSketch":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.n += v.size
        self.min_value = min(self.min_value, float(v.min()))
        self.max_value = max(self.max_value, float(v.max()))
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()
        return self

    def _compress(self) -> None:
        while self._size() > self._total_capacity():
            for i, arr in enumerate(self.levels):
                if arr.size > self._capacity(i):
                    self._compact_level(i)
                    break
            else:
                break

    def _compact_level(self, i: int) -> None:
        arr = np.sort(self.levels[i], kind="mergesort")
        offset = self._compact_flip & 1
        self._compact_flip += 1
        kept = arr[offset::2]
        self.levels[i] = np.empty(0, dtype=np.float64)
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], kept])

    # ----------------------------------------------------------------- merge
    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if self.k != other.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, arr in enumerate(other.levels):
            if arr.size:
                self.levels[i] = np.concatenate([self.levels[i], arr])
        self.n += other.n
        self.min_value = min(self.min_value, other.min_value)
        self.max_value = max(self.max_value, other.max_value)
        self._compress()
        return self

    # --------------------------------------------------------------- queries
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, arr in enumerate(self.levels):
            if arr.size:
                items.append(arr)
                weights.append(np.full(arr.size, float(1 << i)))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="mergesort")
        return it[order], wt[order]

    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        if self.n == 0:
            raise ValueError("empty sketch")
        items, weights = self._weighted_items()
        cum = np.cumsum(weights)
        total = cum[-1]
        qs = np.asarray(qs, dtype=np.float64)
        ranks = qs * (total - 1)
        idx = np.minimum(np.searchsorted(cum, ranks, side="right"), items.size - 1)
        out = items[idx]
        return np.clip(out, self.min_value, self.max_value)

    def rank(self, value: float) -> float:
        """Estimated fraction of items <= value."""
        if self.n == 0:
            raise ValueError("empty sketch")
        items, weights = self._weighted_items()
        total = weights.sum()
        return float(weights[items <= value].sum() / total)

    @property
    def epsilon(self) -> float:
        """Approximate additive rank-error bound for the 2/3-decay scheme."""
        return 2.0 / self.k

    # ----------------------------------------------------------------- serde
    def to_bytes(self) -> bytes:
        head = struct.pack("<IQddI", self.k, self.n, self.min_value, self.max_value,
                           len(self.levels))
        parts = [head]
        for arr in self.levels:
            parts.append(struct.pack("<I", arr.size))
            parts.append(arr.tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLLSketch":
        k, n, mn, mx, n_levels = struct.unpack_from("<IQddI", b, 0)
        out = cls(k)
        out.n = n
        out.min_value = mn
        out.max_value = mx
        out.levels = []
        pos = struct.calcsize("<IQddI")
        for _ in range(n_levels):
            (sz,) = struct.unpack_from("<I", b, pos)
            pos += 4
            out.levels.append(np.frombuffer(b, dtype=np.float64, count=sz, offset=pos).copy())
            pos += 8 * sz
        return out
