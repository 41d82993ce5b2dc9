"""HyperLogLog — mergeable distinct-count sketch (Flajolet et al. 2007).

Not present in the reference repo; required by the north rule as a companion
sketch following the same mergeable partial→shuffle→merge template as
DDSketch.  Published error bound: sigma ≈ 1.04/sqrt(m) relative standard
error for m registers.

The register derivation is EXACTLY the SQL-expressible form used by the
relational path and the DuckDB oracle (functions.sketch_fns / oracles):

    h   = portable 60-bit hash           (core.hashing)
    idx = h % m          (low p bits)
    w   = h >> p         (remaining 60-p bits)
    rho = (60 - p) + 1 - bit_length(w)   (1-based leading-zero count + 1)

so the python core, the Catalyst expression and the oracle agree register-
for-register.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketches_go_spark.core.hashing import HASH_BITS, bit_length_u64


def hll_alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


class HyperLogLog:
    """Dense-register HLL over pre-hashed 60-bit values."""

    def __init__(self, p: int = 12):
        if not (4 <= p <= 18):
            raise ValueError("precision p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        h = np.asarray(h, dtype=np.int64)
        idx = (h % self.m).astype(np.int64)
        w = h >> self.p
        rho = (HASH_BITS - self.p) + 1 - bit_length_u64(w)
        np.maximum.at(self.registers, idx, rho.astype(np.uint8))
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if self.p != other.p:
            raise ValueError("cannot merge HLLs with different precisions")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        """Raw estimator with the standard small-range (linear counting)
        correction; no 32-bit large-range correction is needed at 60 bits."""
        r = self.registers.astype(np.float64)
        s = float(np.sum(np.exp2(-r)))
        e = hll_alpha(self.m) * self.m * self.m / s
        v = int(np.count_nonzero(self.registers == 0))
        if e <= 2.5 * self.m and v > 0:
            return self.m * math.log(self.m / v)
        return e

    # serde: 1 byte precision + registers
    def to_bytes(self) -> bytes:
        return struct.pack("B", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        p = struct.unpack_from("B", b, 0)[0]
        out = cls(p)
        regs = np.frombuffer(b, dtype=np.uint8, offset=1)
        if regs.size != out.m:
            raise ValueError("corrupt HLL blob")
        out.registers = regs.copy()
        return out

    @staticmethod
    def relative_standard_error(p: int) -> float:
        return 1.04 / math.sqrt(1 << p)
