"""Protobuf interop: round-trips, hand-assembled golden wire bytes, proto3
merge semantics, the streamed builder, and the Spark column converters.

Golden bytes are assembled by hand from the public proto3 wire format against
the reference schema (pb/ddsketch.proto:17-68) — NOT produced by our encoder,
so decode compatibility is not self-certified."""

import struct

import numpy as np
import pytest

from sketches_go_spark.core import protobuf as pb
from sketches_go_spark.core.ddsketch import DDSketch, DDSketchConfig
from sketches_go_spark.core.encoding import decode_sketch, encode_sketch

RNG = np.random.default_rng(11)


def _f64(x):
    return struct.pack("<d", x)


@pytest.mark.parametrize("i", range(4))
def test_proto_roundtrip(i):
    dists = [
        RNG.lognormal(1, 2, 5000),
        np.concatenate([-RNG.exponential(5, 2000), RNG.exponential(5, 2000), [0.0] * 37]),
        RNG.uniform(1e-9, 1e9, 3000),
        np.array([42.0]),
    ]
    s = DDSketch.from_values(dists[i], config=DDSketchConfig(alpha=0.01))
    s2 = pb.decode_proto(pb.encode_proto(s))
    assert np.array_equal(s2.pos_idx, s.pos_idx)
    assert np.allclose(s2.pos_cnt, s.pos_cnt)
    assert np.array_equal(s2.neg_idx, s.neg_idx)
    assert np.allclose(s2.neg_cnt, s.neg_cnt)
    assert s2.zero_count == pytest.approx(s.zero_count)
    assert s2.mapping.equals(s.mapping)
    for q in (0.01, 0.5, 0.99):
        assert s2.quantile(q) == pytest.approx(s.quantile(q))


def test_proto_golden_hand_assembled():
    """Wire bytes written by hand per the proto3 spec: a sketch with
    gamma=2.0, a sparse positive map {3: 2.0, -1: 1.5}, a contiguous
    negative store [1.0, 0.0, 4.0] at offset -2, and zeroCount 5.0."""
    mapping = b"\x09" + _f64(2.0)  # field 1 fixed64 gamma (offset/interp omitted)
    entry1 = b"\x08\x06\x11" + _f64(2.0)   # key zigzag(3)=6, value 2.0
    entry2 = b"\x08\x01\x11" + _f64(1.5)   # key zigzag(-1)=1, value 1.5
    pos_store = (
        b"\x0a" + bytes([len(entry1)]) + entry1
        + b"\x0a" + bytes([len(entry2)]) + entry2
    )
    packed = _f64(1.0) + _f64(0.0) + _f64(4.0)
    neg_store = (
        b"\x12" + bytes([len(packed)]) + packed  # field 2 packed doubles
        + b"\x18\x03"                            # field 3 offset zigzag(-2)=3
    )
    blob = (
        b"\x0a" + bytes([len(mapping)]) + mapping
        + b"\x12" + bytes([len(pos_store)]) + pos_store
        + b"\x1a" + bytes([len(neg_store)]) + neg_store
        + b"\x21" + _f64(5.0)                    # field 4 zeroCount
    )
    s = pb.decode_proto(bytes(blob))
    assert s.mapping.gamma == 2.0
    assert np.array_equal(s.pos_idx, [-1, 3])
    assert np.allclose(s.pos_cnt, [1.5, 2.0])
    assert np.array_equal(s.neg_idx, [-2, 0])  # zero-count middle bin dropped
    assert np.allclose(s.neg_cnt, [1.0, 4.0])
    assert s.zero_count == 5.0
    assert s.count == pytest.approx(1.5 + 2.0 + 1.0 + 4.0 + 5.0)


def test_proto_merge_semantics_and_unknown_fields():
    """Repeated store fields merge; sparse + contiguous overlap sums; unknown
    fields are skipped by wire type."""
    mapping = b"\x09" + _f64(2.0)
    entry = b"\x08\x02\x11" + _f64(1.0)  # key zigzag(1)=2, value 1.0
    sparse = b"\x0a" + bytes([len(entry)]) + entry
    packed = _f64(2.5)
    dense = b"\x12" + bytes([len(packed)]) + packed + b"\x18\x02"  # offset 1
    blob = (
        b"\x0a" + bytes([len(mapping)]) + mapping
        + b"\x12" + bytes([len(sparse)]) + sparse
        + b"\x12" + bytes([len(dense)]) + dense   # second positive store
        + b"\x28\x07"                             # unknown field 5, varint
        + b"\x3a\x03abc"                          # unknown field 7, bytes
        + b"\x21" + _f64(1.0)
        + b"\x21" + _f64(2.0)  # repeated scalar: proto3 merge = last wins
    )
    s = pb.decode_proto(bytes(blob))
    assert np.array_equal(s.pos_idx, [1])  # message fields merge: 1.0 + 2.5
    assert np.allclose(s.pos_cnt, [3.5])
    assert s.zero_count == pytest.approx(2.0)


def test_proto_builder_streams_equal():
    s = DDSketch.from_values(
        np.concatenate([RNG.exponential(3, 4000), [0.0] * 11]),
        config=DDSketchConfig(alpha=0.02),
    )
    b = pb.DDSketchProtoBuilder(
        s.mapping.gamma, s.mapping.index_offset, s.mapping.interpolation
    )
    for i, c in zip(s.pos_idx, s.pos_cnt):
        b.add_positive_bin(int(i), float(c))
    for i, c in zip(s.neg_idx, s.neg_cnt):
        b.add_negative_bin(int(i), float(c))
    b.add_zero_count(s.zero_count)
    s2 = pb.decode_proto(b.build())
    assert np.array_equal(s2.pos_idx, s.pos_idx)
    assert np.allclose(s2.pos_cnt, s.pos_cnt)
    assert s2.zero_count == pytest.approx(s.zero_count)
    assert s2.quantile(0.95) == pytest.approx(s.quantile(0.95))


def test_proto_errors():
    with pytest.raises(pb.ProtoDecodingError):
        pb.decode_proto(b"")  # no mapping
    with pytest.raises(pb.ProtoDecodingError):
        # interpolation enum 2 (QUADRATIC) unsupported, as in the reference
        mapping = b"\x09" + _f64(2.0) + b"\x18\x02"
        pb.decode_proto(b"\x0a" + bytes([len(mapping)]) + mapping)
    with pytest.raises(pb.ProtoDecodingError):
        pb.decode_proto(b"\x0a\xff")  # truncated length


def test_proto_spark_column_roundtrip(spark):
    from pyspark.sql import functions as F

    from sketches_go_spark.functions import proto_fns
    from sketches_go_spark.functions.ddsketch_fns import ddsketch_agg, with_quantiles

    sdf = spark.range(20000).select(
        (F.pmod("id", F.lit(4))).cast("string").alias("g"),
        (F.col("id") % 1000 + 1).cast("double").alias("v"),
    )
    sketches = ddsketch_agg(sdf, "v", ["g"])
    converted = sketches.withColumn("proto", proto_fns.to_proto(F.col("sketch")))
    back = converted.withColumn("native2", proto_fns.from_proto(F.col("proto")))
    rows = back.collect()
    assert len(rows) == 4
    for r in rows:
        a = decode_sketch(bytes(r["sketch"]))
        b = decode_sketch(bytes(r["native2"]))
        assert np.array_equal(a.pos_idx, b.pos_idx)
        assert np.allclose(a.pos_cnt, b.pos_cnt)
        assert b.count == pytest.approx(a.count)
    # quantile extraction works identically on the converted column
    q1 = {r["g"]: r["p95"] for r in with_quantiles(sketches, [0.95]).collect()}
    q2 = {
        r["g"]: r["p95"]
        for r in with_quantiles(
            back.select("g", F.col("native2").alias("sketch")), [0.95]
        ).collect()
    }
    assert q1 == q2


@pytest.mark.parametrize("seed", range(10))
def test_proto_decode_mutation_fuzz(seed):
    """Random byte mutations of a valid pb.DDSketch must either decode to
    SOME sketch or raise ProtoDecodingError/ValueError — never crash with a
    raw struct error, hang, or return garbage types."""
    rng = np.random.default_rng(seed)
    s = DDSketch.from_values(
        rng.exponential(2.0, 500), config=DDSketchConfig(alpha=0.02)
    )
    blob = bytearray(pb.encode_proto(s))
    for _ in range(40):
        b2 = bytearray(blob)
        for _ in range(int(rng.integers(1, 4))):
            b2[int(rng.integers(0, len(b2)))] = int(rng.integers(0, 256))
        # also try random truncation
        if rng.random() < 0.3:
            b2 = b2[: int(rng.integers(0, len(b2)))]
        try:
            out = pb.decode_proto(bytes(b2))
        except ValueError:
            continue  # ProtoDecodingError and mapping validation errors
        assert isinstance(out, DDSketch)
        assert out.count >= 0


def test_proto_sint32_overflow_guard():
    b = pb.DDSketchProtoBuilder(2.0)
    with pytest.raises(ValueError, match="sint32"):
        b.add_positive_bin(1 << 31, 1.0)
    b.add_positive_bin((1 << 31) - 1, 1.0)  # boundary fits
    s = pb.decode_proto(b.build())
    assert s.pos_idx[0] == (1 << 31) - 1
