"""Portable hashing shared by the python cores, the Catalyst expressions and
the DuckDB oracles.

``portable_hash64`` = int(md5(salt + str(x))[:15 hex], 16) — a 60-bit value
computable bit-for-bit in Spark SQL (conv/substr/md5) and DuckDB
(cast '0x..' to bigint).  60 bits keeps every intermediate inside a signed
int64 under ANSI arithmetic.

Production jobs that never need cross-engine replay can switch the hash_fn to
xxhash64 (JVM intrinsic) in every Spark-facing function; the python cores
accept pre-hashed int64 arrays so the hash choice stays a caller concern.
"""

from __future__ import annotations

import hashlib

import numpy as np

HASH_BITS = 60
HASH_MASK = (1 << HASH_BITS) - 1


def portable_hash64_py(value, salt: str = "") -> int:
    """Scalar twin of functions.expressions.portable_hash64."""
    s = f"{salt}{value}".encode("utf-8")
    return int(hashlib.md5(s).hexdigest()[:15], 16)


def portable_hash64_np(values, salt: str = "") -> np.ndarray:
    """Vector form (per-row hashlib — test/driver-side convenience; the hot
    path hashes JVM-side and hands int64 arrays to the cores)."""
    return np.fromiter(
        (portable_hash64_py(v, salt) for v in values), dtype=np.int64, count=len(values)
    )


def bit_length_u64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of non-negative int64 values.

    log2-based with an exact fix-up (float log2 can land a hair under/over an
    integer at power-of-two boundaries).
    """
    w = np.asarray(w, dtype=np.int64)
    out = np.zeros(w.shape, dtype=np.int64)
    pos = w > 0
    if pos.any():
        bl = np.floor(np.log2(w[pos].astype(np.float64))).astype(np.int64) + 1
        # fix-up: ensure 2^(bl-1) <= w < 2^bl
        too_high = (np.int64(1) << (bl - 1)) > w[pos]
        bl = bl - too_high.astype(np.int64)
        too_low = w[pos] >> bl > 0
        bl = bl + too_low.astype(np.int64)
        out[pos] = bl
    return out
