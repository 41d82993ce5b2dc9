"""Binary codec tests: golden byte vectors + round-trips + error paths.

Golden vectors are the reference's own
(/root/reference/ddsketch/encoding/encoding_test.go:21-271), asserting exact
wire compatibility with sketches-go's custom format.  Round-trip / error-path
methodology per ddsketch_test.go:486-535,869-894.
"""

import numpy as np
import pytest

from sketches_go_spark.core.ddsketch import DDSketch, DDSketchConfig
from sketches_go_spark.core import encoding as enc
from tests.oracle import TEST_QUANTILES

RNG = np.random.default_rng(7)

UVARINT_CASES = [
    (0, b"\x00"),
    (1, b"\x01"),
    (127, b"\x7f"),
    (128, b"\x80\x01"),
    (129, b"\x81\x01"),
    (255, b"\xff\x01"),
    (256, b"\x80\x02"),
    (16383, b"\xff\x7f"),
    (16384, b"\x80\x80\x01"),
    (16385, b"\x81\x80\x01"),
    (2**64 - 2, b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff"),
    (2**64 - 1, b"\xff\xff\xff\xff\xff\xff\xff\xff\xff"),
]

VARINT_CASES = [
    (0, b"\x00"),
    (1, b"\x02"),
    (63, b"\x7e"),
    (64, b"\x80\x01"),
    (127, b"\xfe\x01"),
    (8192, b"\x80\x80\x01"),
    (2**63 - 1, b"\xfe\xff\xff\xff\xff\xff\xff\xff\xff"),
    (-1, b"\x01"),
    (-63, b"\x7d"),
    (-64, b"\x7f"),
    (-65, b"\x81\x01"),
    (-8192, b"\xff\x7f"),
    (-(2**63), b"\xff\xff\xff\xff\xff\xff\xff\xff\xff"),
]

VARFLOAT_CASES = [
    (0.0, b"\x00"),
    (1.0, b"\x02"),
    (2.0, b"\x03"),
    (3.0, b"\x04"),
    (4.0, b"\x84\x40"),
    (5.0, b"\x05"),
    (6.0, b"\x85\x40"),
    (7.0, b"\x06"),
    (8.0, b"\x86\x20"),
    (9.0, b"\x86\x40"),
    (float(2**52 - 1), b"\x68"),
    (float(2**53 - 1), b"\x6a"),
    (-1.0, b"\x82\x80\x80\x80\x80\x80\x80\x80\x30"),
    (-0.5, b"\xfe\x80\x80\x80\x80\x80\x80\x80\x3f"),
]


@pytest.mark.parametrize("value,encoded", UVARINT_CASES)
def test_uvarint_golden(value, encoded):
    out = bytearray()
    enc.encode_uvarint64(out, value)
    assert bytes(out) == encoded
    decoded, pos = enc.decode_uvarint64(memoryview(encoded), 0)
    assert decoded == value and pos == len(encoded)
    assert enc.uvarint64_size(value) == len(encoded)


@pytest.mark.parametrize("value,encoded", VARINT_CASES)
def test_varint_golden(value, encoded):
    out = bytearray()
    enc.encode_varint64(out, value)
    assert bytes(out) == encoded
    decoded, pos = enc.decode_varint64(memoryview(encoded), 0)
    assert decoded == value and pos == len(encoded)
    assert enc.varint64_size(value) == len(encoded)


@pytest.mark.parametrize("value,encoded", VARFLOAT_CASES)
def test_varfloat_golden(value, encoded):
    out = bytearray()
    enc.encode_varfloat64(out, value)
    assert bytes(out) == encoded
    decoded, pos = enc.decode_varfloat64(memoryview(encoded), 0)
    assert decoded == value and pos == len(encoded)


def test_varint_eof():
    with pytest.raises(enc.DecodingError):
        enc.decode_uvarint64(memoryview(b""), 0)
    with pytest.raises(enc.DecodingError):
        enc.decode_uvarint64(memoryview(b"\x80"), 0)
    with pytest.raises(enc.DecodingError):
        enc.decode_varfloat64(memoryview(b"\x80"), 1)


def test_varfloat_roundtrip_fuzz():
    vals = np.concatenate(
        [
            RNG.normal(0, 1e6, 200),
            RNG.lognormal(0, 30, 200),
            np.arange(100, dtype=np.float64),
        ]
    )
    for v in vals:
        out = bytearray()
        enc.encode_varfloat64(out, float(v))
        decoded, _ = enc.decode_varfloat64(memoryview(bytes(out)), 0)
        # the wire contract (matching the reference transform) is
        # decode(encode(v)) == (v+1)-1 in float64: exact whenever v+1 is
        # exactly representable (all integer counts < 2^52), and within one
        # ulp-of-(v+1) otherwise
        assert decoded == (float(v) + 1.0) - 1.0


DATASETS = [
    RNG.normal(35, 1, 1000),
    RNG.lognormal(0, 2, 500),
    np.concatenate([RNG.normal(35, 1, 100), -RNG.exponential(1, 100), [0.0] * 7]),
    np.asarray([1.0]),
    np.asarray([34654677.3676]),
    np.arange(1, 200, dtype=np.float64),
]


@pytest.mark.parametrize("i", range(len(DATASETS)))
@pytest.mark.parametrize("omit_mapping", [False, True])
def test_sketch_roundtrip(i, omit_mapping):
    values = DATASETS[i]
    s = DDSketch.from_values(values)
    blob = enc.encode_sketch(s, omit_index_mapping=omit_mapping)
    s2 = enc.decode_sketch(blob, mapping=s.mapping if omit_mapping else None)
    assert np.array_equal(s2.quantiles(TEST_QUANTILES), s.quantiles(TEST_QUANTILES))
    assert s2.count == pytest.approx(s.count)
    assert s2.exact_min == s.exact_min
    assert s2.exact_max == s.exact_max
    assert s2.exact_sum == pytest.approx(s.sum)


def test_decode_is_merge():
    """Accumulating blobs by merge equals sketching the union
    (decode-is-merge shape, ddsketch.go:400-429)."""
    parts = [RNG.normal(35, 1, 200), RNG.normal(40, 0.5, 300)]
    blobs = [enc.encode_sketch(DDSketch.from_values(p)) for p in parts]
    acc = DDSketch()
    for blob in blobs:
        acc.merge(enc.decode_sketch(blob))
    direct = DDSketch.from_values(np.concatenate(parts))
    assert np.array_equal(acc.pos_idx, direct.pos_idx)
    assert np.allclose(acc.pos_cnt, direct.pos_cnt)


def test_empty_sketch_roundtrip():
    s = DDSketch()
    blob = enc.encode_sketch(s)
    s2 = enc.decode_sketch(blob)
    assert s2.is_empty


def test_decode_errors():
    s = DDSketch.from_values([1.0, 2.0])
    with pytest.raises(enc.DecodingError):
        enc.decode_sketch(enc.encode_sketch(s, omit_index_mapping=True))  # missing mapping
    with pytest.raises(enc.DecodingError):
        enc.decode_sketch(b"\xfb")  # unknown feature flag
    # mapping mismatch
    other = DDSketchConfig(alpha=0.1).mapping()
    with pytest.raises(enc.DecodingError):
        enc.decode_sketch(enc.encode_sketch(s), mapping=other)
    # truncated payload
    with pytest.raises(enc.DecodingError):
        enc.decode_sketch(enc.encode_sketch(s)[:-1])


def test_dense_vs_sparse_choice():
    """Contiguous data should pick the dense frame; scattered data sparse —
    and both must decode identically (dense_store.go:278-311)."""
    contiguous = DDSketch.from_values(np.arange(1, 5000, dtype=np.float64))
    scattered = DDSketch.from_values(np.logspace(-30, 30, 20))
    for s in (contiguous, scattered):
        blob = enc.encode_sketch(s)
        s2 = enc.decode_sketch(blob)
        assert np.array_equal(s2.pos_idx, s.pos_idx)
        assert np.allclose(s2.pos_cnt, s.pos_cnt)
    # sanity: the scattered encoding is far smaller than a dense frame would be
    assert len(enc.encode_sketch(scattered)) < 400
