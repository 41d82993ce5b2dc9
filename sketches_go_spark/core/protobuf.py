"""Protobuf interop for DDSketch — the cross-language wire contract that
DataDog-ecosystem consumers (Go/Java/Python agents) actually speak.

Pure-python proto3 codec (no protobuf dependency ships in this environment)
hand-rolled from the public protobuf wire format, implementing exactly the
reference schema (/root/reference/ddsketch/pb/ddsketch.proto:17-68):

    message DDSketch     { IndexMapping mapping = 1; Store positiveValues = 2;
                           Store negativeValues = 3; double zeroCount = 4; }
    message IndexMapping { double gamma = 1; double indexOffset = 2;
                           Interpolation interpolation = 3; }  // NONE/LINEAR/QUADRATIC/CUBIC
    message Store        { map<sint32, double> binCounts = 1;
                           repeated double contiguousBinCounts = 2 [packed];
                           sint32 contiguousBinIndexOffset = 3; }

and the ToProto/FromProto surface of ddsketch.go:313-364 plus the streamed
builder of pb/sketchpb/ddsketch.proto_builder.go (here:
:class:`DDSketchProtoBuilder`).  Interpolation mapping follows the
reference's mapping conversions: logarithmic <-> NONE, linear <-> LINEAR,
cubic <-> CUBIC (QUADRATIC is unsupported by both).

proto3 semantics honored: zero-valued scalar fields are omitted on encode
and defaulted on decode; repeated occurrences of a singular message field
merge; a bin present in both the sparse map and the contiguous array sums
(per the Store doc comment); unknown fields are skipped by wire type
(forward compatibility).

NOTE: the protobuf format carries no exact-summary-statistics blocks (the
reference exposes ToProto only on the plain DDSketch); converting drops the
exact stats decorator — decode falls back to sketch-derived stats, exactly
like decoding a plain blob in core.encoding.
"""

from __future__ import annotations

import struct

import numpy as np

from sketches_go_spark.core.ddsketch import DDSketch, DDSketchConfig
from sketches_go_spark.core.mapping import (
    CUBIC,
    LINEAR,
    LOGARITHMIC,
    mapping_from_params,
)

_WT_VARINT = 0
_WT_FIXED64 = 1
_WT_LEN = 2
_WT_FIXED32 = 5

_INTERP_TO_ENUM = {LOGARITHMIC: 0, LINEAR: 1, CUBIC: 3}
_ENUM_TO_INTERP = {v: k for k, v in _INTERP_TO_ENUM.items()}


class ProtoDecodingError(ValueError):
    pass


# ------------------------------------------------------------- wire primitives
def _w_varint(out: bytearray, v: int) -> None:
    v &= (1 << 64) - 1
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _r_varint(b: memoryview, pos: int) -> tuple[int, int]:
    x = 0
    s = 0
    while True:
        if pos >= len(b):
            raise ProtoDecodingError("EOF in varint")
        n = b[pos]
        pos += 1
        x |= (n & 0x7F) << s
        if n < 0x80:
            return x, pos
        s += 7
        if s >= 70:
            raise ProtoDecodingError("varint too long")


def _need(b: memoryview, pos: int, n: int) -> None:
    if pos + n > len(b):
        raise ProtoDecodingError("truncated message")


def _zigzag32(v: int) -> int:
    if not (-(1 << 31) <= v < (1 << 31)):
        # bin indexes are sint32 on the wire (pb/ddsketch.proto:62,67); a
        # silent wrap would corrupt the sketch
        raise ValueError(f"index {v} does not fit protobuf sint32")
    return ((v << 1) ^ (v >> 31)) & 0xFFFFFFFF


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def _w_tag(out: bytearray, field: int, wtype: int) -> None:
    _w_varint(out, (field << 3) | wtype)


def _w_len_field(out: bytearray, field: int, payload: bytes) -> None:
    _w_tag(out, field, _WT_LEN)
    _w_varint(out, len(payload))
    out += payload


def _w_double_field(out: bytearray, field: int, x: float) -> None:
    if x != 0.0:  # proto3 omits zero-valued scalars
        _w_tag(out, field, _WT_FIXED64)
        out += struct.pack("<d", x)


def _skip(b: memoryview, pos: int, wtype: int) -> int:
    if wtype == _WT_VARINT:
        _, pos = _r_varint(b, pos)
        return pos
    if wtype == _WT_FIXED64:
        _need(b, pos, 8)
        return pos + 8
    if wtype == _WT_LEN:
        n, pos = _r_varint(b, pos)
        _need(b, pos, n)
        return pos + n
    if wtype == _WT_FIXED32:
        _need(b, pos, 4)
        return pos + 4
    raise ProtoDecodingError(f"unknown wire type {wtype}")


# ------------------------------------------------------------------- encoding
def _encode_mapping(gamma: float, index_offset: float, interpolation: str) -> bytes:
    out = bytearray()
    _w_double_field(out, 1, gamma)
    _w_double_field(out, 2, index_offset)
    enum = _INTERP_TO_ENUM[interpolation]
    if enum != 0:
        _w_tag(out, 3, _WT_VARINT)
        _w_varint(out, enum)
    return bytes(out)


def _map_entry(index: int, count: float) -> bytes:
    entry = bytearray()
    if index != 0:  # proto3 map entries omit zero keys/values too
        _w_tag(entry, 1, _WT_VARINT)
        _w_varint(entry, _zigzag32(int(index)))
    if count != 0.0:
        _w_tag(entry, 2, _WT_FIXED64)
        entry += struct.pack("<d", float(count))
    return bytes(entry)


def _encode_store(idx: np.ndarray, cnt: np.ndarray) -> bytes:
    """Contiguous when the span is close to the bin count (the reference's
    dense stores emit contiguousBinCounts), sparse map otherwise."""
    if idx.size == 0:
        return b""
    out = bytearray()
    lo, hi = int(idx[0]), int(idx[-1])
    span = hi - lo + 1
    if span <= 2 * idx.size + 16:
        dense = np.zeros(span, dtype=np.float64)
        dense[idx - lo] = cnt
        _w_tag(out, 2, _WT_LEN)  # packed repeated double
        _w_varint(out, 8 * span)
        out += dense.astype("<f8").tobytes()
        if lo != 0:
            _w_tag(out, 3, _WT_VARINT)
            _w_varint(out, _zigzag32(lo))
    else:
        for i in range(idx.size):
            _w_len_field(out, 1, _map_entry(int(idx[i]), float(cnt[i])))
    return bytes(out)


def encode_proto(s: DDSketch) -> bytes:
    """ToProto (ddsketch.go:313-330): sketch -> pb.DDSketch bytes."""
    out = bytearray()
    _w_len_field(
        out,
        1,
        _encode_mapping(s.mapping.gamma, s.mapping.index_offset, s.mapping.interpolation),
    )
    pos_store = _encode_store(s.pos_idx, s.pos_cnt)
    if pos_store:
        _w_len_field(out, 2, pos_store)
    neg_store = _encode_store(s.neg_idx, s.neg_cnt)
    if neg_store:
        _w_len_field(out, 3, neg_store)
    _w_double_field(out, 4, s.zero_count)
    return bytes(out)


# ------------------------------------------------------------------- decoding
def _parse_mapping(b: memoryview) -> tuple[float, float, int]:
    gamma = 0.0
    offset = 0.0
    interp = 0
    pos = 0
    while pos < len(b):
        tag, pos = _r_varint(b, pos)
        field, wtype = tag >> 3, tag & 7
        if field == 1 and wtype == _WT_FIXED64:
            _need(b, pos, 8)
            gamma = struct.unpack_from("<d", b, pos)[0]
            pos += 8
        elif field == 2 and wtype == _WT_FIXED64:
            _need(b, pos, 8)
            offset = struct.unpack_from("<d", b, pos)[0]
            pos += 8
        elif field == 3 and wtype == _WT_VARINT:
            interp, pos = _r_varint(b, pos)
        else:
            pos = _skip(b, pos, wtype)
    return gamma, offset, interp


def _parse_store_into(bins: dict[int, float], b: memoryview) -> None:
    pos = 0
    contiguous: list[float] = []
    contiguous_offset = 0
    while pos < len(b):
        tag, pos = _r_varint(b, pos)
        field, wtype = tag >> 3, tag & 7
        if field == 1 and wtype == _WT_LEN:  # one map entry
            n, pos = _r_varint(b, pos)
            _need(b, pos, n)
            entry = b[pos : pos + n]
            pos += n
            key = 0
            val = 0.0
            ep = 0
            while ep < len(entry):
                etag, ep = _r_varint(entry, ep)
                ef, ew = etag >> 3, etag & 7
                if ef == 1 and ew == _WT_VARINT:
                    u, ep = _r_varint(entry, ep)
                    key = _unzigzag(u)
                elif ef == 2 and ew == _WT_FIXED64:
                    _need(entry, ep, 8)
                    val = struct.unpack_from("<d", entry, ep)[0]
                    ep += 8
                else:
                    ep = _skip(entry, ep, ew)
            if val != 0.0:
                bins[key] = bins.get(key, 0.0) + val
        elif field == 2 and wtype == _WT_LEN:  # packed doubles
            n, pos = _r_varint(b, pos)
            _need(b, pos, n)
            if n % 8:
                raise ProtoDecodingError("packed double payload not 8-aligned")
            contiguous.extend(
                struct.unpack_from(f"<{n // 8}d", b, pos)
            )
            pos += n
        elif field == 2 and wtype == _WT_FIXED64:  # unpacked repeated double
            _need(b, pos, 8)
            contiguous.append(struct.unpack_from("<d", b, pos)[0])
            pos += 8
        elif field == 3 and wtype == _WT_VARINT:
            u, pos = _r_varint(b, pos)
            contiguous_offset = _unzigzag(u)
        else:
            pos = _skip(b, pos, wtype)
    for i, c in enumerate(contiguous):
        if c != 0.0:
            k = contiguous_offset + i
            bins[k] = bins.get(k, 0.0) + c


def decode_proto(data: bytes, config: DDSketchConfig | None = None) -> DDSketch:
    """FromProto (ddsketch.go:333-364): pb.DDSketch bytes -> sketch.
    Repeated store fields merge additively; sparse + contiguous overlap sums."""
    b = memoryview(data)
    pos = 0
    gamma = offset = None
    interp_enum = 0
    pos_bins: dict[int, float] = {}
    neg_bins: dict[int, float] = {}
    zero_count = 0.0
    while pos < len(b):
        tag, pos = _r_varint(b, pos)
        field, wtype = tag >> 3, tag & 7
        if field == 1 and wtype == _WT_LEN:
            n, pos = _r_varint(b, pos)
            _need(b, pos, n)
            gamma, offset, interp_enum = _parse_mapping(b[pos : pos + n])
            pos += n
        elif field == 2 and wtype == _WT_LEN:
            n, pos = _r_varint(b, pos)
            _need(b, pos, n)
            _parse_store_into(pos_bins, b[pos : pos + n])
            pos += n
        elif field == 3 and wtype == _WT_LEN:
            n, pos = _r_varint(b, pos)
            _need(b, pos, n)
            _parse_store_into(neg_bins, b[pos : pos + n])
            pos += n
        elif field == 4 and wtype == _WT_FIXED64:
            # proto3 scalar merge: last occurrence wins (what any protobuf
            # library parser would produce), unlike the additive binary codec
            _need(b, pos, 8)
            zero_count = struct.unpack_from("<d", b, pos)[0]
            pos += 8
        else:
            pos = _skip(b, pos, wtype)

    import math

    if gamma is None or not (gamma > 1.0) or not math.isfinite(gamma):
        raise ProtoDecodingError("missing or invalid index mapping")
    if offset is not None and not math.isfinite(offset):
        raise ProtoDecodingError("non-finite index offset")
    if interp_enum not in _ENUM_TO_INTERP:
        raise ProtoDecodingError(f"unsupported interpolation enum {interp_enum}")
    # semantic validation mirroring the reference's AddBin/zero-count checks:
    # counts must be finite and non-negative (negative counts are rejected by
    # store.AddBin in sketches-go)
    if not math.isfinite(zero_count) or zero_count < 0:
        raise ProtoDecodingError("invalid zero count")
    for bins in (pos_bins, neg_bins):
        for k, c in bins.items():
            if not math.isfinite(c) or c < 0:
                raise ProtoDecodingError(f"invalid bin count {c} at index {k}")
    m = mapping_from_params(_ENUM_TO_INTERP[interp_enum], gamma, offset or 0.0)

    cfg = config or DDSketchConfig(
        alpha=m.relative_accuracy(), interpolation=m.interpolation
    )
    s = DDSketch(config=cfg, mapping=m)
    if pos_bins:
        items = sorted(pos_bins.items())
        s.pos_idx = np.asarray([i for i, _ in items], dtype=np.int64)
        s.pos_cnt = np.asarray([c for _, c in items], dtype=np.float64)
    if neg_bins:
        items = sorted(neg_bins.items())
        s.neg_idx = np.asarray([i for i, _ in items], dtype=np.int64)
        s.neg_cnt = np.asarray([c for _, c in items], dtype=np.float64)
    s.zero_count = zero_count
    s._apply_collapse()
    # proto carries no exact-stats blocks: fall back to sketch-derived
    s.exact_count = s.count
    if not s.is_empty:
        s.exact_sum = s.sum_approx()
        s.exact_min = s.min_approx()
        s.exact_max = s.max_approx()
    return s


# ------------------------------------------------------------ streamed builder
class DDSketchProtoBuilder:
    """Streamed pb.DDSketch writer (pb/sketchpb/ddsketch.proto_builder.go):
    bins are appended as encoded sparse map entries as they arrive — memory
    is the output bytes, never a bin collection.  The use case is emitting a
    proto sketch from an iterator (e.g. walking a bins relation partition)
    without materializing a DDSketch object."""

    def __init__(self, gamma: float, index_offset: float = 0.0,
                 interpolation: str = LOGARITHMIC):
        self._mapping = _encode_mapping(gamma, index_offset, interpolation)
        self._pos = bytearray()
        self._neg = bytearray()
        self._zero = 0.0

    def add_positive_bin(self, index: int, count: float) -> "DDSketchProtoBuilder":
        _w_len_field(self._pos, 1, _map_entry(index, count))
        return self

    def add_negative_bin(self, index: int, count: float) -> "DDSketchProtoBuilder":
        _w_len_field(self._neg, 1, _map_entry(index, count))
        return self

    def add_zero_count(self, count: float) -> "DDSketchProtoBuilder":
        self._zero += count
        return self

    def build(self) -> bytes:
        out = bytearray()
        _w_len_field(out, 1, self._mapping)
        if self._pos:
            _w_len_field(out, 2, bytes(self._pos))
        if self._neg:
            _w_len_field(out, 3, bytes(self._neg))
        _w_double_field(out, 4, self._zero)
        return bytes(out)
