"""t-digest — mergeable quantile sketch with tail-accurate clustering
(Dunning & Ertl, 2019).  Companion sketch per the north rule.

Merging-digest variant with the k1 scale function
k(q) = (delta / 2pi) * asin(2q - 1): cluster sizes shrink toward q=0 and q=1,
giving sub-1e-3 rank error at the tails for delta ~ 100-200.

Deterministic for a fixed input order; merge associativity holds at the
accuracy level (clustering is order-sensitive like every t-digest).
"""

from __future__ import annotations

import struct

import numpy as np


class TDigest:
    def __init__(self, delta: float = 200.0):
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.n = 0.0
        self.min_value = np.inf
        self.max_value = -np.inf
        self._buffer: list[np.ndarray] = []
        self._buffered = 0

    # ------------------------------------------------------------------- add
    def add(self, values, weights=None) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        keep = ~np.isnan(v)
        v = v[keep]
        if v.size == 0:
            return self
        w = (
            np.ones(v.size)
            if weights is None
            else np.asarray(weights, dtype=np.float64)[keep]
        )
        self.min_value = min(self.min_value, float(v.min()))
        self.max_value = max(self.max_value, float(v.max()))
        self._buffer.append(np.stack([v, w]))
        self._buffered += v.size
        if self._buffered > 10 * self.delta:
            self._flush()
        return self

    def _flush(self) -> None:
        if not self._buffer:
            return
        buf = np.concatenate(self._buffer, axis=1)
        self._buffer, self._buffered = [], 0
        means = np.concatenate([self.means, buf[0]])
        weights = np.concatenate([self.weights, buf[1]])
        self.means, self.weights = _cluster(means, weights, self.delta)
        self.n = float(self.weights.sum())

    # ----------------------------------------------------------------- merge
    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("cannot merge t-digests with different compression")
        other._flush()
        self._flush()
        means = np.concatenate([self.means, other.means])
        weights = np.concatenate([self.weights, other.weights])
        self.means, self.weights = _cluster(means, weights, self.delta)
        self.n = float(self.weights.sum())
        self.min_value = min(self.min_value, other.min_value)
        self.max_value = max(self.max_value, other.max_value)
        return self

    # --------------------------------------------------------------- queries
    def quantile(self, q: float) -> float:
        return float(self.quantiles([q])[0])

    def quantiles(self, qs) -> np.ndarray:
        self._flush()
        if self.n == 0:
            raise ValueError("empty sketch")
        qs = np.asarray(qs, dtype=np.float64)
        m, w = self.means, self.weights
        if m.size == 1:
            return np.full(qs.shape, m[0])
        # centroid midpoints in cumulative-weight space, anchored by the
        # exact tracked min/max so q=0 / q=1 are exact
        cum = np.concatenate([[0.0], np.cumsum(w) - w / 2.0, [self.n]])
        vals = np.concatenate([[self.min_value], m, [self.max_value]])
        targets = qs * self.n
        out = np.interp(targets, cum, vals)
        return np.clip(out, self.min_value, self.max_value)

    def rank(self, value: float) -> float:
        self._flush()
        if self.n == 0:
            raise ValueError("empty sketch")
        cum = np.cumsum(self.weights) - self.weights / 2.0
        return float(np.interp(value, self.means, cum) / self.n)

    @property
    def n_centroids(self) -> int:
        self._flush()
        return self.means.size

    # ----------------------------------------------------------------- serde
    def to_bytes(self) -> bytes:
        self._flush()
        head = struct.pack(
            "<dddI", self.delta, self.min_value, self.max_value, self.means.size
        )
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta, mn, mx, size = struct.unpack_from("<dddI", b, 0)
        out = cls(delta)
        pos = struct.calcsize("<dddI")
        out.means = np.frombuffer(b, dtype=np.float64, count=size, offset=pos).copy()
        pos += 8 * size
        out.weights = np.frombuffer(b, dtype=np.float64, count=size, offset=pos).copy()
        out.n = float(out.weights.sum())
        out.min_value = mn
        out.max_value = mx
        return out


def _k_fn(q: np.ndarray, delta: float) -> np.ndarray:
    return delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)


def _k_inv(k: np.ndarray, delta: float) -> np.ndarray:
    return (np.sin(np.clip(2 * np.pi * k / delta, -np.pi / 2, np.pi / 2)) + 1) / 2


def _cluster(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """One merging pass: sort by mean, greedily fuse neighbors while the k1
    scale budget allows."""
    if means.size == 0:
        return means, weights
    order = np.argsort(means, kind="mergesort")
    means, weights = means[order], weights[order]
    total = weights.sum()

    out_means: list[float] = []
    out_weights: list[float] = []
    acc = 0.0  # cumulative weight of emitted clusters
    cur_sum = means[0] * weights[0]
    cur_w = weights[0]
    q_limit = _k_inv(_k_fn(np.asarray(0.0), delta) + 1.0, delta) * total
    for i in range(1, means.size):
        w = weights[i]
        if acc + cur_w + w <= q_limit:
            cur_sum += means[i] * w
            cur_w += w
        else:
            out_means.append(cur_sum / cur_w)
            out_weights.append(cur_w)
            acc += cur_w
            q_limit = _k_inv(_k_fn(np.asarray(acc / total), delta) + 1.0, delta) * total
            cur_sum = means[i] * w
            cur_w = w
    out_means.append(cur_sum / cur_w)
    out_weights.append(cur_w)
    return np.asarray(out_means), np.asarray(out_weights)
