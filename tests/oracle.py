"""Exact-quantile oracle used by the accuracy tests.

Rank convention matches the reference test oracle
(/root/reference/dataset/dataset.go:34-52): sort ascending,
rank = q*(n-1), lower = values[floor(rank)], upper = values[ceil(rank)].
Assertion envelope: estimate in [lower*(1-a), upper*(1+a)] +- 1e-11
(ddsketch_test.go:28-30, 191-196).
"""

from __future__ import annotations

import math

import numpy as np

ABS_TOL = 1e-11


def lower_quantile(values: np.ndarray, q: float) -> float:
    v = np.sort(np.asarray(values, dtype=np.float64))
    rank = q * (v.size - 1)
    return float(v[int(math.floor(rank))])


def upper_quantile(values: np.ndarray, q: float) -> float:
    v = np.sort(np.asarray(values, dtype=np.float64))
    rank = q * (v.size - 1)
    return float(v[int(math.ceil(rank))])


def assert_relatively_accurate(values, estimate: float, q: float, alpha: float) -> None:
    lo = lower_quantile(values, q)
    hi = upper_quantile(values, q)
    min_expected = lo - abs(lo) * alpha - ABS_TOL
    max_expected = hi + abs(hi) * alpha + ABS_TOL
    assert min_expected <= estimate <= max_expected, (
        f"q={q} alpha={alpha}: estimate {estimate} outside "
        f"[{min_expected}, {max_expected}] (exact lower={lo}, upper={hi})"
    )


# the reference grid (ddsketch_test.go:43-44)
TEST_QUANTILES = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999, 1.0]
TEST_SIZES = [3, 5, 10, 21, 100, 1000]
TEST_ALPHAS = [0.1, 0.01]


def generators(rng: np.random.Generator) -> dict:
    """The reference's test distributions (dataset/generator.go:17-85)."""
    return {
        "constant": lambda n: np.full(n, float(rng.integers(1, 100))),
        "linear": lambda n: np.arange(n, dtype=np.float64),
        "linear_with_zeroes": lambda n: np.where(
            np.arange(n) % 2 == 0, 0.0, np.arange(n, dtype=np.float64)
        ),
        "normal_35_1": lambda n: rng.normal(35, 1, n),
        "lognormal_0_2": lambda n: rng.lognormal(0, 2, n),
        "exponential_1_5": lambda n: rng.exponential(1 / 1.5, n),
    }
