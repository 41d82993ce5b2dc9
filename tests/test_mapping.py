"""Mapping round-trip / boundary tests.

Ports the reference's accuracy-sweep methodology
(/root/reference/ddsketch/mapping/index_mapping_test.go:69-136): assert the
alpha envelope over the full indexable range, never golden bucket indexes
(libm implementations may differ by 1 ulp at bucket edges).
"""

import math

import numpy as np
import pytest

from sketches_go_spark.core.mapping import (
    CubicallyInterpolatedMapping,
    LinearlyInterpolatedMapping,
    LogarithmicMapping,
    mapping_from_alpha,
    mapping_from_params,
)

MAPPING_CLASSES = [
    LogarithmicMapping,
    LinearlyInterpolatedMapping,
    CubicallyInterpolatedMapping,
]

ALPHAS = [1e-1, 1e-2, 1e-3, 1e-4, 0.5 - 1e-3]


@pytest.mark.parametrize("cls", MAPPING_CLASSES)
@pytest.mark.parametrize("alpha", ALPHAS)
def test_round_trip_accuracy_sweep(cls, alpha):
    m = cls.from_relative_accuracy(alpha)
    assert m.relative_accuracy() == pytest.approx(alpha, rel=1e-9)
    # multiplicative sweep across the full indexable range
    # (index_mapping_test.go:69-88 uses step 1 + sqrt(2)*100)
    step = 1 + math.sqrt(2) * 100
    n = int(
        (math.log(m.max_indexable) - math.log(m.min_indexable)) / math.log(step)
    )
    with np.errstate(over="ignore"):
        v = m.min_indexable * step ** np.arange(n + 1)
    v = np.clip(v, m.min_indexable, m.max_indexable)
    rt = m.value(m.index(v))
    rel_err = np.abs(rt - v) / v
    assert rel_err.max() <= alpha * (1 + 1e-9)


@pytest.mark.parametrize("cls", MAPPING_CLASSES)
def test_index_monotone_and_value_in_bucket(cls):
    m = cls.from_relative_accuracy(0.01)
    v = np.logspace(-30, 30, 20001)
    idx = m.index(v)
    assert np.all(np.diff(idx) >= 0)
    # the representative value of a bucket maps back to the same bucket
    uniq = np.unique(idx)
    assert np.array_equal(m.index(m.value(uniq)), uniq)


# reference sweep range (mapping/index_mapping_test.go:118-136): alpha from
# 1e-7 up to 1 - 1e-3, every mapping family, serialized and deserialized
SERDE_ALPHAS = [1e-7, 1e-6, 1e-5, 1e-4, 1e-3, 1e-2, 1e-1, 0.25, 1 - 1e-3]
INTERPOLATIONS = ["logarithmic", "linear", "cubic"]


@pytest.mark.parametrize("interpolation", INTERPOLATIONS)
@pytest.mark.parametrize("alpha", SERDE_ALPHAS)
def test_mapping_survives_both_codecs(interpolation, alpha):
    """Mapping serde equality sweep, through BOTH wire formats (the custom
    flag-grammar codec and protobuf): decode(encode(sketch)) must carry a
    mapping `equals` to the original — gamma and index_offset are stored as
    exact float64 in both codecs, so this holds across the reference's full
    alpha range for every interpolation family
    (mapping/index_mapping_test.go:118-136)."""
    from sketches_go_spark.core import encoding as enc
    from sketches_go_spark.core import protobuf as pb
    from sketches_go_spark.core.ddsketch import DDSketch, DDSketchConfig

    cfg = DDSketchConfig(alpha=alpha, interpolation=interpolation)
    s = DDSketch(cfg)
    for v in (1e-3, 1.0, 3.14, 1e6):
        s.add(v)
    m = s.mapping

    s_custom = enc.decode_sketch(enc.encode_sketch(s))
    assert s_custom.mapping.equals(m)
    assert s_custom.mapping.interpolation == interpolation

    s_proto = pb.decode_proto(pb.encode_proto(s))
    assert s_proto.mapping.equals(m)
    assert s_proto.mapping.interpolation == interpolation

    # and the decoded sketches answer quantiles identically to the original
    for q in (0.0, 0.5, 0.99, 1.0):
        assert s_custom.quantile(q) == s.quantile(q)
        assert s_proto.quantile(q) == s.quantile(q)


def test_min_max_indexable_bounds():
    for cls in MAPPING_CLASSES:
        m = cls.from_relative_accuracy(0.01)
        for v in (m.min_indexable, m.max_indexable):
            i = m.index_scalar(v)
            assert -(2**31) <= i <= 2**31 - 1
            assert math.isfinite(m.value_scalar(i))


def test_equals_tolerance():
    a = LogarithmicMapping.from_relative_accuracy(0.01)
    b = mapping_from_params("logarithmic", a.gamma * (1 + 1e-13), a.index_offset)
    c = mapping_from_params("logarithmic", a.gamma * (1 + 1e-9), a.index_offset)
    assert a.equals(b)
    assert not a.equals(c)
    lin = LinearlyInterpolatedMapping.from_relative_accuracy(0.01)
    assert not a.equals(lin)


def test_bad_params_rejected():
    with pytest.raises(ValueError):
        LogarithmicMapping.from_relative_accuracy(0.0)
    with pytest.raises(ValueError):
        LogarithmicMapping.from_relative_accuracy(1.0)
    with pytest.raises(ValueError):
        mapping_from_params("logarithmic", 0.5, 0.0)
    with pytest.raises(ValueError):
        mapping_from_params("quartic", 2.0, 0.0)


def test_interpolated_close_to_logarithmic():
    """Interpolated mappings approximate log2 within their (coarser) gamma —
    same value, nearby bucket count over a wide range."""
    log_m = LogarithmicMapping.from_relative_accuracy(0.01)
    for cls in (LinearlyInterpolatedMapping, CubicallyInterpolatedMapping):
        m = cls.from_relative_accuracy(0.01)
        v = np.logspace(-5, 10, 5000)
        # same relative-accuracy guarantee even though bucket boundaries differ
        assert np.max(np.abs(m.value(m.index(v)) - v) / v) <= 0.01 * (1 + 1e-9)
        # bucket count within 2x of the optimal logarithmic mapping
        n_log = len(np.unique(log_m.index(v)))
        n_m = len(np.unique(m.index(v)))
        assert n_m <= 2 * n_log
