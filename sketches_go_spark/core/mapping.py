"""Value <-> bucket-index mappings for DDSketch, numpy-vectorized.

Behavioral parity with the reference mappings (cited for parity checking, not
copied):

- logarithmic:            /root/reference/ddsketch/mapping/logarithmic_mapping.go:30-96
- linearly interpolated:  /root/reference/ddsketch/mapping/linearly_interpolated_mapping.go:30-111
- cubically interpolated: /root/reference/ddsketch/mapping/cubically_interpolated_mapping.go:38-124
- IEEE-754 helpers:       /root/reference/ddsketch/mapping/bit_operation_helper.go:21-35
- shared constants:       /root/reference/ddsketch/mapping/index_mapping.go:16-19

All mappings satisfy the round-trip contract
``|value(index(v)) - v| <= alpha * v`` for ``v`` in
``[min_indexable, max_indexable]``.

Every mapping exposes BOTH a numpy vectorized form (``index(np.ndarray)``)
and, for the logarithmic default, a pure-Catalyst column expression
(see sketches_go_spark.functions.expressions) — the two must agree on bucket
indexes bit-for-bit at any given float input (same log/floor semantics up to
libm ulps; tests assert the alpha accuracy envelope, never golden indexes,
exactly like the reference test suite does across architectures).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

# The value at which exp() overflows / smallest normal float64
# (reference: ddsketch/mapping/index_mapping.go:16-19).
EXP_OVERFLOW = 7.094361393031e02
MIN_NORMAL_FLOAT64 = 2.2250738585072014e-308

INT32_MIN = -2147483648
INT32_MAX = 2147483647

_REL_TOL = 1e-12

LOGARITHMIC = "logarithmic"
LINEAR = "linear"
CUBIC = "cubic"


def _safe_exp(x: float) -> float:
    """exp() that saturates to +inf/0 instead of raising (Go math.Exp behavior)."""
    try:
        return math.exp(x)
    except OverflowError:
        return math.inf


def _safe_exp2(x: float) -> float:
    try:
        return 2.0**x
    except OverflowError:
        return math.inf


def _within_tolerance(x: float, y: float, tol: float = _REL_TOL) -> bool:
    """Relative tolerance compare (reference: linearly_interpolated_mapping.go:140-146)."""
    if x == 0 or y == 0:
        return abs(x) <= tol and abs(y) <= tol
    return abs(x - y) <= tol * max(abs(x), abs(y))


def _floor_index(raw: np.ndarray) -> np.ndarray:
    """floor() of the raw (float) index, returned as int64.

    The reference uses ``int(x)`` / ``int(x)-1`` branchless truncation
    (logarithmic_mapping.go:69-76), which equals floor() everywhere except at
    *exactly integral negative* raw indexes — an unreachable case for finite
    inputs because bucket boundaries are irrational (gamma powers).  We use
    true floor(), which is the documented semantic.
    """
    return np.floor(raw).astype(np.int64)


@dataclass(frozen=True)
class _BaseMapping:
    gamma: float
    index_offset: float
    # derived, filled by __post_init__ of subclasses
    multiplier: float = field(init=False, default=0.0)
    min_indexable: float = field(init=False, default=0.0)
    max_indexable: float = field(init=False, default=0.0)

    interpolation = "?"

    # -- shared helpers ----------------------------------------------------
    def _set(self, name: str, value: float) -> None:
        object.__setattr__(self, name, value)

    def relative_accuracy(self) -> float:
        raise NotImplementedError

    def index(self, values: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def lower_bound(self, indexes: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def value(self, indexes: np.ndarray) -> np.ndarray:
        """Representative value of a bucket = lower_bound * (1 + alpha)."""
        return self.lower_bound(indexes) * (1.0 + self.relative_accuracy())

    def equals(self, other: "_BaseMapping") -> bool:
        return (
            type(self) is type(other)
            and _within_tolerance(self.gamma, other.gamma)
            and _within_tolerance(self.index_offset, other.index_offset)
        )

    def index_scalar(self, v: float) -> int:
        return int(self.index(np.asarray([v], dtype=np.float64))[0])

    def value_scalar(self, i: int) -> float:
        return float(self.value(np.asarray([i], dtype=np.int64))[0])


@dataclass(frozen=True)
class LogarithmicMapping(_BaseMapping):
    """index = floor(ln(v) * multiplier + index_offset); multiplier = 1/ln(gamma).

    Memory-optimal mapping; parity: logarithmic_mapping.go:30-96.
    """

    interpolation = LOGARITHMIC

    def __post_init__(self) -> None:
        if self.gamma <= 1:
            raise ValueError("gamma must be > 1")
        mult = 1.0 / math.log(self.gamma)
        self._set("multiplier", mult)
        self._set(
            "min_indexable",
            max(
                _safe_exp((INT32_MIN - self.index_offset) / mult + 1),
                MIN_NORMAL_FLOAT64 * self.gamma,
            ),
        )
        self._set(
            "max_indexable",
            min(
                _safe_exp((INT32_MAX - self.index_offset) / mult - 1),
                _safe_exp(EXP_OVERFLOW) / (2 * self.gamma) * (self.gamma + 1),
            ),
        )

    @classmethod
    def from_relative_accuracy(cls, alpha: float) -> "LogarithmicMapping":
        if not (0 < alpha < 1):
            raise ValueError("relative accuracy must be in (0, 1)")
        return cls(gamma=(1 + alpha) / (1 - alpha), index_offset=0.0)

    def relative_accuracy(self) -> float:
        return 1 - 2 / (1 + self.gamma)

    def index(self, values: np.ndarray) -> np.ndarray:
        v = np.asarray(values, dtype=np.float64)
        return _floor_index(np.log(v) * self.multiplier + self.index_offset)

    def lower_bound(self, indexes: np.ndarray) -> np.ndarray:
        i = np.asarray(indexes, dtype=np.float64)
        # indexes beyond the indexable range saturate to inf — the correct
        # semantics for a decoded out-of-range bucket, not a numerical error
        with np.errstate(over="ignore"):
            return np.exp((i - self.index_offset) / self.multiplier)


def _approx_log2_linear(v: np.ndarray) -> np.ndarray:
    """exponent + (significand+1) - 1 via IEEE-754 decomposition.

    np.frexp gives v = m * 2**e with m in [0.5, 1); the reference's
    (exponent, significandPlusOne) is (e-1, 2m), so the approximation is
    (e - 1) + 2m - 1.  Parity: linearly_interpolated_mapping.go:89-92.
    """
    m, e = np.frexp(v)
    return (e.astype(np.float64) - 1.0) + 2.0 * m - 1.0


def _build_float64(exponent: np.ndarray, significand_plus_one: np.ndarray) -> np.ndarray:
    """significand_plus_one * 2**exponent (bit_operation_helper.go:28-35)."""
    return np.ldexp(significand_plus_one, exponent.astype(np.int64))


@dataclass(frozen=True)
class LinearlyInterpolatedMapping(_BaseMapping):
    """Approximates log2 by linear interpolation of the significand.

    Parity: linearly_interpolated_mapping.go:30-111.
    """

    interpolation = LINEAR

    def __post_init__(self) -> None:
        if self.gamma <= 1:
            raise ValueError("gamma must be > 1")
        mult = 1.0 / math.log2(self.gamma)
        adjusted_gamma = self.gamma ** (1.0 / math.log(2))
        self._set("multiplier", mult)
        self._set(
            "min_indexable",
            max(
                _safe_exp2((INT32_MIN - self.index_offset) / mult + 1),
                MIN_NORMAL_FLOAT64 * adjusted_gamma,
            ),
        )
        self._set(
            "max_indexable",
            min(
                _safe_exp2((INT32_MAX - self.index_offset) / mult - 1),
                _safe_exp(EXP_OVERFLOW) / (2 * adjusted_gamma) * (adjusted_gamma + 1),
            ),
        )

    @classmethod
    def from_relative_accuracy(cls, alpha: float) -> "LinearlyInterpolatedMapping":
        if not (0 < alpha < 1):
            raise ValueError("relative accuracy must be in (0, 1)")
        gamma = ((1 + alpha) / (1 - alpha)) ** math.log(2)
        # index offset of 1/log2(gamma) kept for reference compatibility
        return cls(gamma=gamma, index_offset=1.0 / math.log2(gamma))

    def relative_accuracy(self) -> float:
        return 1 - 2 / (1 + math.exp(math.log2(self.gamma)))

    def index(self, values: np.ndarray) -> np.ndarray:
        v = np.asarray(values, dtype=np.float64)
        return _floor_index(_approx_log2_linear(v) * self.multiplier + self.index_offset)

    def lower_bound(self, indexes: np.ndarray) -> np.ndarray:
        x = (np.asarray(indexes, dtype=np.float64) - self.index_offset) / self.multiplier
        exponent = np.floor(x)
        significand_plus_one = x - exponent + 1.0
        return _build_float64(exponent, significand_plus_one)


# cubic interpolation coefficients (cubically_interpolated_mapping.go:18-22)
_A = 6.0 / 35.0
_B = -3.0 / 5.0
_C = 10.0 / 7.0


@dataclass(frozen=True)
class CubicallyInterpolatedMapping(_BaseMapping):
    """Approximates log2 by a cubic polynomial of the significand; inverse via
    Cardano's formula.  Parity: cubically_interpolated_mapping.go:38-124.
    """

    interpolation = CUBIC

    def __post_init__(self) -> None:
        if self.gamma <= 1:
            raise ValueError("gamma must be > 1")
        mult = 1.0 / math.log2(self.gamma)
        adjusted_gamma = self.gamma ** (7.0 / (10 * math.log(2)))
        self._set("multiplier", mult)
        self._set(
            "min_indexable",
            max(
                _safe_exp2((INT32_MIN - self.index_offset) / mult + 1),
                MIN_NORMAL_FLOAT64 * adjusted_gamma,
            ),
        )
        self._set(
            "max_indexable",
            min(
                _safe_exp2((INT32_MAX - self.index_offset) / mult - 1),
                _safe_exp(EXP_OVERFLOW) / (2 * adjusted_gamma) * (adjusted_gamma + 1),
            ),
        )

    @classmethod
    def from_relative_accuracy(cls, alpha: float) -> "CubicallyInterpolatedMapping":
        if not (0 < alpha < 1):
            raise ValueError("relative accuracy must be in (0, 1)")
        gamma = ((1 + alpha) / (1 - alpha)) ** (10 * math.log(2) / 7)
        return cls(gamma=gamma, index_offset=0.0)

    def relative_accuracy(self) -> float:
        return 1 - 2 / (1 + math.exp(7.0 / 10 * math.log2(self.gamma)))

    def _approx_log2(self, v: np.ndarray) -> np.ndarray:
        m, e = np.frexp(v)
        s = 2.0 * m - 1.0  # significand in [0, 1)
        return ((_A * s + _B) * s + _C) * s + (e.astype(np.float64) - 1.0)

    def _approx_inverse_log2(self, x: np.ndarray) -> np.ndarray:
        exponent = np.floor(x)
        frac = x - exponent
        d0 = _B * _B - 3 * _A * _C
        d1 = 2 * _B**3 - 9 * _A * _B * _C - 27 * _A * _A * frac
        p = np.cbrt((d1 - np.sqrt(d1 * d1 - 4 * d0**3)) / 2)
        significand_plus_one = -(_B + p + d0 / p) / (3 * _A) + 1.0
        return _build_float64(exponent, significand_plus_one)

    def index(self, values: np.ndarray) -> np.ndarray:
        v = np.asarray(values, dtype=np.float64)
        return _floor_index(self._approx_log2(v) * self.multiplier + self.index_offset)

    def lower_bound(self, indexes: np.ndarray) -> np.ndarray:
        x = (np.asarray(indexes, dtype=np.float64) - self.index_offset) / self.multiplier
        return self._approx_inverse_log2(x)


_CLASSES = {
    LOGARITHMIC: LogarithmicMapping,
    LINEAR: LinearlyInterpolatedMapping,
    CUBIC: CubicallyInterpolatedMapping,
}


def mapping_from_params(interpolation: str, gamma: float, index_offset: float) -> _BaseMapping:
    """Reconstruct a mapping from its serialized parameters
    (reference dispatch: index_mapping.go:42-96)."""
    try:
        cls = _CLASSES[interpolation]
    except KeyError:
        raise ValueError(f"interpolation not supported: {interpolation!r}") from None
    return cls(gamma=gamma, index_offset=index_offset)


def mapping_from_alpha(alpha: float, interpolation: str = LOGARITHMIC) -> _BaseMapping:
    return _CLASSES[interpolation].from_relative_accuracy(alpha)
