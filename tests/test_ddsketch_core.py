"""Core DDSketch accuracy / merge / collapsing tests.

Ports the reference test strategy (SURVEY.md §5):
- distribution x size accuracy grid vs the exact oracle
  (ddsketch/ddsketch_test.go:101-196)
- merge identities, cross-distribution merges, merge-doesn't-mutate
  (ddsketch_test.go:252-391)
- quantile idempotence (ddsketch_test.go:346-365)
- collapsing invariants + golden fixture (store_test.go:561-685)
- weighted adds / edge point sets (ddsketch_test.go:575-726)
"""

import math

import numpy as np
import pytest

from sketches_go_spark.core.ddsketch import (
    COLLAPSE_HIGHEST,
    COLLAPSE_LOWEST,
    DDSketch,
    DDSketchConfig,
    UntrackableValueError,
)
from tests.oracle import (
    TEST_ALPHAS,
    TEST_QUANTILES,
    TEST_SIZES,
    assert_relatively_accurate,
    generators,
)

RNG = np.random.default_rng(42)


def _check_sketch(values: np.ndarray, alpha: float) -> None:
    s = DDSketch.from_values(values, config=DDSketchConfig(alpha=alpha))
    assert s.count == pytest.approx(values.size)
    assert s.exact_min == values.min()
    assert s.exact_max == values.max()
    assert s.sum == pytest.approx(values.sum(), rel=1e-9, abs=1e-9)
    for q in TEST_QUANTILES:
        assert_relatively_accurate(values, s.quantile(q), q, alpha)
        # the exact-stats clamped variant is at least as accurate
        assert_relatively_accurate(values, s.quantile(q, clamp_exact=True), q, alpha)


@pytest.mark.parametrize("alpha", TEST_ALPHAS)
def test_accuracy_grid(alpha):
    gens = generators(np.random.default_rng(42))
    for name, gen in gens.items():
        for n in TEST_SIZES:
            values = np.asarray(gen(n), dtype=np.float64)
            _check_sketch(values, alpha)
            # negative mirror pass (ddsketch_test.go:110-115)
            _check_sketch(np.concatenate([values, -values]), alpha)


def test_quantile_idempotent():
    values = RNG.lognormal(0, 2, 500)
    s = DDSketch.from_values(values)
    for q in TEST_QUANTILES:
        assert s.quantile(q) == s.quantile(q)


def test_merge_matches_union():
    """Merging sketches equals sketching the union (ddsketch_test.go:252-343)."""
    gens = [RNG.normal(35, 1, 300), RNG.normal(-10, 2, 200), RNG.normal(40, 0.5, 500)]
    union = np.concatenate(gens)
    merged = DDSketch.from_values(gens[0])
    for g in gens[1:]:
        merged.merge(DDSketch.from_values(g))
    direct = DDSketch.from_values(union)
    assert np.array_equal(merged.pos_idx, direct.pos_idx)
    assert np.allclose(merged.pos_cnt, direct.pos_cnt)
    assert np.array_equal(merged.neg_idx, direct.neg_idx)
    for q in TEST_QUANTILES:
        assert_relatively_accurate(union, merged.quantile(q), q, 0.01)


def test_merge_empty_identity():
    values = RNG.exponential(1 / 1.5, 100)
    s = DDSketch.from_values(values)
    e = DDSketch()
    # empty.merge(s) == s ; s.merge(empty) == s (ddsketch_test.go:285-309)
    e2 = DDSketch().merge(s)
    for q in TEST_QUANTILES:
        assert e2.quantile(q) == s.quantile(q)
    s2 = s.copy().merge(DDSketch())
    for q in TEST_QUANTILES:
        assert s2.quantile(q) == s.quantile(q)
    assert e.is_empty
    with pytest.raises(ValueError):
        e.quantile(0.5)


def test_merge_does_not_mutate_argument():
    """TestConsistentMerge (ddsketch_test.go:368-391)."""
    a = DDSketch.from_values(RNG.normal(50, 1, 200))
    b = DDSketch.from_values(RNG.normal(100, 1, 300))
    before = b.quantiles(TEST_QUANTILES).copy()
    a.merge(b)
    assert np.array_equal(b.quantiles(TEST_QUANTILES), before)


def test_merge_associative_commutative():
    """North-rule merge contract: any merge tree gives identical bins for
    non-collapsing sketches."""
    parts = [RNG.lognormal(1, 1, n) for n in (50, 200, 1, 999)]
    orderings = [(0, 1, 2, 3), (3, 2, 1, 0), (2, 0, 3, 1)]
    results = []
    for order in orderings:
        acc = DDSketch()
        for i in order:
            acc.merge(DDSketch.from_values(parts[i]))
        results.append(acc)
    # also a balanced tree
    ab = DDSketch.from_values(parts[0]).merge(DDSketch.from_values(parts[1]))
    cd = DDSketch.from_values(parts[2]).merge(DDSketch.from_values(parts[3]))
    results.append(ab.merge(cd))
    base = results[0]
    for r in results[1:]:
        assert np.array_equal(r.pos_idx, base.pos_idx)
        assert np.allclose(r.pos_cnt, base.pos_cnt)
        assert r.count == pytest.approx(base.count)
        assert np.array_equal(r.quantiles(TEST_QUANTILES), base.quantiles(TEST_QUANTILES))


def test_mapping_mismatch_merge_rejected():
    a = DDSketch.from_values([1.0], config=DDSketchConfig(alpha=0.01))
    b = DDSketch.from_values([1.0], config=DDSketchConfig(alpha=0.02))
    with pytest.raises(ValueError):
        a.merge(b)


def test_weighted_adds():
    """AddWithCount incl. non-integer weights (ddsketch_test.go:575-625)."""
    s = DDSketch()
    s.add([0.0, 2.0, 28.0, -3.0], [0.1, 1.2, 8.66, 2.33])
    assert s.count == pytest.approx(0.1 + 1.2 + 8.66 + 2.33)
    assert s.zero_count == pytest.approx(0.1)
    # weighted median sits in the heavy 28 bucket
    assert s.quantile(0.5) == pytest.approx(28, rel=0.011)
    # far-apart magnitudes
    s2 = DDSketch()
    s2.add([1.0, 1e20], [0.1, 1.2])
    assert s2.quantile(1.0) == pytest.approx(1e20, rel=0.011)
    # huge weight
    s3 = DDSketch()
    s3.add([34654677.3676], [86676635552.8783786])
    assert s3.count == pytest.approx(86676635552.8783786)
    assert s3.quantile(0.5) == pytest.approx(34654677.3676, rel=0.011)


def test_untrackable_values():
    s = DDSketch()
    with pytest.raises(UntrackableValueError):
        s.add([float("nan")])
    with pytest.raises(UntrackableValueError):
        s.add([float("inf")])
    with pytest.raises(UntrackableValueError):
        s.add([-float("inf")])
    with pytest.raises(UntrackableValueError):
        s.add([1.0], [-1.0])
    # ignore policy drops them and counts the rest
    s.add([1.0, float("nan"), float("inf")], on_untrackable="ignore")
    assert s.count == 1.0
    # tiny values land in the zero bucket (ddsketch.go:212-217)
    s.add([1e-310])
    assert s.zero_count == 1.0


def test_zero_and_sign_routing():
    values = np.asarray([-5.0, -1.0, 0.0, 0.0, 3.0, 7.0])
    s = DDSketch.from_values(values)
    assert s.zero_count == 2.0
    assert s.neg_cnt.sum() == 2.0
    assert s.pos_cnt.sum() == 2.0
    assert s.quantile(0.0) == pytest.approx(-5, rel=0.011)
    assert s.quantile(1.0) == pytest.approx(7, rel=0.011)
    # rank in the zero region returns exactly 0
    assert s.quantile(0.5) == 0.0


@pytest.mark.parametrize("m", [8, 128, 1024])
def test_collapsing_golden(m):
    """Golden fixture (store_test.go:597-625): after adding bucket indexes
    0..2m-1, a lowest-collapsing store holds exactly m bins spanning
    [m, 2m-1]; highest-collapsing spans [0, m-1]."""
    cfg_l = DDSketchConfig(alpha=0.01, max_bins=m, collapse=COLLAPSE_LOWEST)
    mp = cfg_l.mapping()
    # values whose buckets are exactly 0..2m-1
    values = mp.value(np.arange(2 * m, dtype=np.int64))
    s = DDSketch.from_values(values, config=cfg_l)
    assert s.pos_idx.size == m
    assert s.pos_idx[0] == m
    assert s.pos_idx[-1] == 2 * m - 1
    assert s.count == pytest.approx(2 * m)

    cfg_h = DDSketchConfig(alpha=0.01, max_bins=m, collapse=COLLAPSE_HIGHEST)
    s2 = DDSketch.from_values(values, config=cfg_h)
    assert s2.pos_idx.size == m
    assert s2.pos_idx[0] == 0
    assert s2.pos_idx[-1] == m - 1
    assert s2.count == pytest.approx(2 * m)


def test_collapsing_invariants_under_merge():
    """Invariants for collapsed sketches under any partition order:
    exact total count, <= m bins, preserved max (lowest) / min (highest)
    (store_test.go:561-685)."""
    m = 64
    cfg = DDSketchConfig(alpha=0.01, max_bins=m, collapse=COLLAPSE_LOWEST)
    parts = [RNG.lognormal(0, 3, 500) for _ in range(4)]
    union = np.concatenate(parts)
    for order in [(0, 1, 2, 3), (2, 3, 0, 1), (3, 1, 0, 2)]:
        acc = DDSketch(config=cfg)
        for i in order:
            acc.merge(DDSketch.from_values(parts[i], config=cfg))
        assert acc.pos_idx.size <= m
        # the collapse contract (store_test.go:627-641): exact total count and
        # preserved max (lowest-collapse); low quantiles lose the guarantee
        assert acc.count == pytest.approx(union.size)
        assert acc.quantile(1.0) == pytest.approx(union.max(), rel=0.011)
        # quantiles within the kept bucket range keep the alpha guarantee
        kept_lo = acc.mapping.value_scalar(int(acc.pos_idx[0]))
        covered_q = float((union <= kept_lo).mean())
        for q in (0.99, 0.999):
            if q > covered_q:
                assert_relatively_accurate(union, acc.quantile(q), q, 0.01)


def test_reweight_preserves_distribution():
    """TestReweight (ddsketch_test.go:421-444)."""
    values = RNG.normal(35, 1, 300)
    s = DDSketch.from_values(values)
    before = s.quantiles(TEST_QUANTILES).copy()
    s.reweight(3.0)
    assert s.count == pytest.approx(3 * values.size)
    assert np.allclose(s.quantiles(TEST_QUANTILES), before)
    with pytest.raises(ValueError):
        s.reweight(0.0)


def test_change_mapping():
    """Re-bucketing onto a coarser mapping keeps the coarser guarantee
    (ddsketch.go:483-510)."""
    values = RNG.lognormal(0, 2, 2000)
    s = DDSketch.from_values(values, config=DDSketchConfig(alpha=0.005))
    coarse = DDSketchConfig(alpha=0.02).mapping()
    s2 = s.change_mapping(coarse)
    assert s2.count == pytest.approx(s.count)
    for q in TEST_QUANTILES:
        # envelope: alpha of the new mapping plus the old quantization
        assert_relatively_accurate(values, s2.quantile(q), q, 0.03)
    # with a scale factor the distribution scales
    s3 = s.change_mapping(coarse, scale_factor=10.0)
    assert s3.quantile(0.5) == pytest.approx(10 * s.quantile(0.5), rel=0.05)


def test_min_max_sum_approximations():
    values = RNG.normal(35, 1, 500)
    s = DDSketch.from_values(values)
    assert s.min_approx() == pytest.approx(values.min(), rel=0.011)
    assert s.max_approx() == pytest.approx(values.max(), rel=0.011)
    assert s.sum_approx() == pytest.approx(values.sum(), rel=0.011)
    assert s.exact_count == values.size


def test_roundtrip_dict():
    values = np.concatenate([RNG.normal(35, 1, 100), -RNG.exponential(1, 50), [0.0] * 5])
    s = DDSketch.from_values(values)
    s2 = DDSketch.from_dict(s.to_dict())
    assert np.array_equal(s2.quantiles(TEST_QUANTILES), s.quantiles(TEST_QUANTILES))
    assert s2.count == pytest.approx(s.count)
    assert s2.exact_min == s.exact_min
    assert s2.exact_max == s.exact_max
    assert s2.mapping.equals(s.mapping)
