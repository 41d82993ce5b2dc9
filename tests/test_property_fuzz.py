"""Property/fuzz layer (hypothesis) — the analogue of the reference's gofuzz
tests (store_test.go:219-318, ddsketch_test.go:346-391): random adds vs a
multiset-union reference, codec round-trips over arbitrary sketches, mapping
round-trips over the full range."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from sketches_go_spark.core import encoding as enc
from sketches_go_spark.core.ddsketch import DDSketch, DDSketchConfig
from sketches_go_spark.core.mapping import LogarithmicMapping
from tests.oracle import assert_relatively_accurate

finite_values = st.lists(
    st.floats(
        min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=200,
)


@settings(max_examples=60, deadline=None)
@given(finite_values)
def test_sketch_accuracy_fuzz(values):
    v = np.asarray(values)
    s = DDSketch.from_values(v, config=DDSketchConfig(alpha=0.02))
    assert s.count == len(values)
    for q in (0.0, 0.5, 1.0):
        assert_relatively_accurate(v, s.quantile(q), q, 0.02)


@settings(max_examples=60, deadline=None)
@given(finite_values, finite_values)
def test_merge_equals_union_fuzz(a, b):
    cfg = DDSketchConfig(alpha=0.02)
    merged = DDSketch.from_values(np.asarray(a), config=cfg).merge(
        DDSketch.from_values(np.asarray(b), config=cfg)
    )
    direct = DDSketch.from_values(np.asarray(a + b), config=cfg)
    assert np.array_equal(merged.pos_idx, direct.pos_idx)
    assert np.allclose(merged.pos_cnt, direct.pos_cnt)
    assert np.array_equal(merged.neg_idx, direct.neg_idx)
    assert merged.zero_count == direct.zero_count


@settings(max_examples=60, deadline=None)
@given(finite_values)
def test_codec_roundtrip_fuzz(values):
    s = DDSketch.from_values(np.asarray(values))
    s2 = enc.decode_sketch(enc.encode_sketch(s))
    assert np.array_equal(s2.pos_idx, s.pos_idx)
    # counts survive the varfloat transform: integer counts are exact
    assert np.array_equal(s2.pos_cnt, s.pos_cnt)
    assert s2.zero_count == s.zero_count
    assert s2.exact_min == s.exact_min and s2.exact_max == s.exact_max


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_uvarint_roundtrip_fuzz(v):
    out = bytearray()
    enc.encode_uvarint64(out, v)
    decoded, pos = enc.decode_uvarint64(memoryview(bytes(out)), 0)
    assert decoded == v and pos == len(out) == enc.uvarint64_size(v)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_varint_roundtrip_fuzz(v):
    out = bytearray()
    enc.encode_varint64(out, v)
    decoded, _ = enc.decode_varint64(memoryview(bytes(out)), 0)
    assert decoded == v


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=1e-300, max_value=1e300, allow_nan=False),
    st.floats(min_value=1e-4, max_value=0.3),
)
def test_mapping_roundtrip_fuzz(value, alpha):
    m = LogarithmicMapping.from_relative_accuracy(alpha)
    if not (m.min_indexable <= value <= m.max_indexable):
        return
    rt = m.value_scalar(m.index_scalar(value))
    assert abs(rt - value) <= alpha * value * (1 + 1e-9)


@settings(max_examples=100, deadline=None)
@given(
    st.floats(min_value=1e-280, max_value=1e280, allow_nan=False),
    st.floats(min_value=1e-4, max_value=0.3),
    st.sampled_from(["linear", "cubic"]),
)
def test_interpolated_mapping_roundtrip_fuzz(value, alpha, interp):
    """The alpha contract must hold for the interpolated mappings too —
    value(index(v)) within relative alpha of v across the full range."""
    from sketches_go_spark.core.mapping import (
        CubicallyInterpolatedMapping,
        LinearlyInterpolatedMapping,
    )

    cls = (
        LinearlyInterpolatedMapping if interp == "linear"
        else CubicallyInterpolatedMapping
    )
    m = cls.from_relative_accuracy(alpha)
    if not (m.min_indexable <= value <= m.max_indexable):
        return
    rt = m.value_scalar(m.index_scalar(value))
    assert abs(rt - value) <= alpha * value * (1 + 1e-9)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(min_value=1e-3, max_value=1e9, allow_nan=False),
        min_size=1,
        max_size=80,
    ),
    st.sampled_from(["linear", "cubic"]),
)
def test_interpolated_sketch_accuracy_fuzz(values, interp):
    """End-to-end alpha envelope under interpolated configs: every estimated
    quantile within relative alpha of some data value's bucket (exact-rank
    replay bound via the oracle convention)."""
    from sketches_go_spark.core.ddsketch import DDSketchConfig

    cfg = DDSketchConfig(alpha=0.02, interpolation=interp)
    arr = np.asarray(values)
    s = DDSketch.from_values(arr, config=cfg)
    for q in (0.0, 0.5, 0.99, 1.0):
        est = s.quantile(q)
        exact = np.sort(arr)[int(np.floor(q * (len(arr) - 1)))]
        assert abs(est - exact) <= 0.02 * abs(exact) * (1 + 1e-9) + 1e-12


@settings(max_examples=50, deadline=None)
@given(st.lists(st.floats(min_value=0.1, max_value=1e6, allow_nan=False), min_size=1, max_size=100))
def test_quantile_monotone_fuzz(values):
    s = DDSketch.from_values(np.asarray(values))
    qs = np.linspace(0, 1, 11)
    ests = s.quantiles(qs)
    assert np.all(np.diff(ests) >= 0)
