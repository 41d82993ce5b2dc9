"""Compact binary codec for DDSketch — flag-prefixed blocks with
uvarint / zigzag-varint / varfloat payloads.

Wire-format parity with the reference encoding (format re-implemented from its
documented grammar, no code copied):

- flag grammar (2-bit type + 6-bit subflag) and block layout:
  /root/reference/ddsketch/encoding/flag.go:32-128
- uvarint64 (LEB128, <=9 bytes, last byte carries 8 bits), zigzag varint64,
  float64LE, varfloat64 (rotate-by-6 MSB-first):
  /root/reference/ddsketch/encoding/encoding.go:36-208
- store encoding picks the cheaper of dense (contiguous counts) and sparse
  (index-deltas + counts): /root/reference/ddsketch/store/dense_store.go:278-311
- sketch framing and decode-is-merge loop: /root/reference/ddsketch/ddsketch.go:366-475
- exact-summary-statistics blocks: ddsketch.go:705-791

The codec is used for checkpoint files and compact shuffle of partial
sketches; it is byte-compatible with sketches-go's non-protobuf format.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketches_go_spark.core.ddsketch import DDSketch, DDSketchConfig
from sketches_go_spark.core.mapping import (
    CUBIC,
    LINEAR,
    LOGARITHMIC,
    _BaseMapping,
    mapping_from_params,
)

_MASK64 = (1 << 64) - 1
_MAX_VARLEN = 9
_VARFLOAT_ROTATE = 6
_ONE_BITS = struct.unpack("<Q", struct.pack("<d", 1.0))[0]

# ---------------------------------------------------------------------- flags
# flag byte = type (2 LSBs) | subflag (6 MSBs, stored shifted left by 2)
FLAG_TYPE_SKETCH_FEATURES = 0b00
FLAG_TYPE_POSITIVE_STORE = 0b01
FLAG_TYPE_INDEX_MAPPING = 0b10
FLAG_TYPE_NEGATIVE_STORE = 0b11


def _flag(ftype: int, subflag: int) -> int:
    return ftype | (subflag << 2)


FLAG_ZERO_COUNT = _flag(FLAG_TYPE_SKETCH_FEATURES, 1)
FLAG_COUNT = _flag(FLAG_TYPE_SKETCH_FEATURES, 0x28)
FLAG_SUM = _flag(FLAG_TYPE_SKETCH_FEATURES, 0x21)
FLAG_MIN = _flag(FLAG_TYPE_SKETCH_FEATURES, 0x22)
FLAG_MAX = _flag(FLAG_TYPE_SKETCH_FEATURES, 0x23)

_MAPPING_SUBFLAGS = {LOGARITHMIC: 0, LINEAR: 1, CUBIC: 3}
_MAPPING_BY_SUBFLAG = {v: k for k, v in _MAPPING_SUBFLAGS.items()}

BIN_ENCODING_INDEX_DELTAS_AND_COUNTS = 1
BIN_ENCODING_INDEX_DELTAS = 2
BIN_ENCODING_CONTIGUOUS_COUNTS = 3


class DecodingError(ValueError):
    pass


# ------------------------------------------------------------------ varint IO
def encode_uvarint64(out: bytearray, v: int) -> None:
    v &= _MASK64
    for _ in range(_MAX_VARLEN - 1):
        if v < 0x80:
            break
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    else:
        out.append(v & 0xFF)
        return
    out.append(v)


def decode_uvarint64(b: memoryview, pos: int) -> tuple[int, int]:
    x = 0
    s = 0
    i = 0
    while True:
        if pos + i >= len(b):
            raise DecodingError("EOF in uvarint")
        n = b[pos + i]
        if n < 0x80 or i == _MAX_VARLEN - 1:
            return (x | (n << s)) & _MASK64, pos + i + 1
        x |= (n & 0x7F) << s
        s += 7
        i += 1


def encode_varint64(out: bytearray, v: int) -> None:
    # zigzag: (v >> 63) ^ (v << 1), arithmetic shift on the signed value
    encode_uvarint64(out, ((v >> 63) ^ (v << 1)) & _MASK64)


def decode_varint64(b: memoryview, pos: int) -> tuple[int, int]:
    u, pos = decode_uvarint64(b, pos)
    return (u >> 1) ^ -(u & 1), pos


def encode_float64le(out: bytearray, v: float) -> None:
    out += struct.pack("<d", v)


def decode_float64le(b: memoryview, pos: int) -> tuple[float, int]:
    if pos + 8 > len(b):
        raise DecodingError("EOF in float64")
    return struct.unpack_from("<d", b, pos)[0], pos + 8


def _rotl64(x: int, k: int) -> int:
    k %= 64
    return ((x << k) | (x >> (64 - k))) & _MASK64


def _float_bits(v: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", v))[0]


def _bits_float(x: int) -> float:
    return struct.unpack("<d", struct.pack("<Q", x & _MASK64))[0]


def encode_varfloat64(out: bytearray, v: float) -> None:
    """Space-efficient for small non-negative integer-valued floats
    (encoding.go:137-163): shift by +1 as float, subtract bits(1.0), rotate
    left 6, then emit 7 bits at a time starting from the MSB."""
    x = _rotl64((_float_bits(v + 1) - _ONE_BITS) & _MASK64, _VARFLOAT_ROTATE)
    for _ in range(_MAX_VARLEN - 1):
        n = (x >> (64 - 7)) & 0x7F
        x = (x << 7) & _MASK64
        if x == 0:
            out.append(n)
            return
        out.append(n | 0x80)
    out.append((x >> (64 - 8)) & 0xFF)


def decode_varfloat64(b: memoryview, pos: int) -> tuple[float, int]:
    x = 0
    i = 0
    s = 64 - 7
    while True:
        if pos + i >= len(b):
            raise DecodingError("EOF in varfloat")
        n = b[pos + i]
        if i == _MAX_VARLEN - 1:
            x |= n
            break
        if n < 0x80:
            x |= n << s
            break
        x |= (n & 0x7F) << s
        i += 1
        s -= 7
    v = _bits_float((_rotl64(x & _MASK64, 64 - _VARFLOAT_ROTATE) + _ONE_BITS) & _MASK64) - 1
    return v, pos + i + 1


def uvarint64_size(v: int) -> int:
    v &= _MASK64
    n = 1
    while v >= 0x80 and n < _MAX_VARLEN:
        v >>= 7
        n += 1
    return n


def varint64_size(v: int) -> int:
    return uvarint64_size(((v >> 63) ^ (v << 1)) & _MASK64)


def varfloat64_size(v: float) -> int:
    scratch = bytearray()
    encode_varfloat64(scratch, v)
    return len(scratch)


# -------------------------------------------------------------- store framing
def _encode_store(out: bytearray, ftype: int, idx: np.ndarray, cnt: np.ndarray) -> None:
    """Pick the cheapest of the three bin encodings (flag.go:88-127): sparse
    deltas+counts, dense contiguous counts (dense_store.go:278-311 size
    heuristic), or pure index-deltas — one varint per unit occurrence, the
    winner for the common all-counts-1 sketch."""
    if idx.size == 0:
        return
    lo, hi = int(idx[0]), int(idx[-1])
    span = hi - lo + 1

    sparse_size = uvarint64_size(idx.size)
    prev = lo
    for j in range(idx.size):
        sparse_size += varint64_size(int(idx[j]) - prev) + varfloat64_size(float(cnt[j]))
        prev = int(idx[j])

    # a dense frame spends >=1 byte per bucket in the span; don't even price
    # it when the span dwarfs the bin count
    dense_size = None
    dense = None
    if span <= 4 * idx.size + 64:
        dense = np.zeros(span, dtype=np.float64)
        dense[idx - lo] = cnt
        dense_size = (
            uvarint64_size(span) + varint64_size(lo) + varint64_size(1)
            + sum(varfloat64_size(float(c)) for c in dense)
        )

    # index-deltas: only valid for exactly-integral counts; each repeat of a
    # bucket beyond the first costs 1 byte (a zero delta), so only price it
    # when the total count stays close to the bin count
    deltas_size = None
    total = float(cnt.sum())
    if (
        total <= 2 * idx.size + 64
        and np.all(cnt == np.rint(cnt))
        and np.all(cnt >= 1)
    ):
        deltas_size = uvarint64_size(int(total))
        prev = 0
        for j in range(idx.size):
            deltas_size += varint64_size(int(idx[j]) - prev) + (int(cnt[j]) - 1)
            prev = int(idx[j])

    use_dense = dense_size is not None and dense_size <= sparse_size
    best = min(dense_size if use_dense else sparse_size, sparse_size)
    if deltas_size is not None and deltas_size < best:
        out.append(_flag(ftype, BIN_ENCODING_INDEX_DELTAS))
        encode_uvarint64(out, int(total))
        prev = 0
        for j in range(idx.size):
            encode_varint64(out, int(idx[j]) - prev)
            for _ in range(int(cnt[j]) - 1):
                encode_varint64(out, 0)
            prev = int(idx[j])
    elif use_dense:
        out.append(_flag(ftype, BIN_ENCODING_CONTIGUOUS_COUNTS))
        encode_uvarint64(out, span)
        encode_varint64(out, lo)
        encode_varint64(out, 1)
        for c in dense:
            encode_varfloat64(out, float(c))
    else:
        out.append(_flag(ftype, BIN_ENCODING_INDEX_DELTAS_AND_COUNTS))
        encode_uvarint64(out, idx.size)
        prev = 0
        for j in range(idx.size):
            encode_varint64(out, int(idx[j]) - prev)
            encode_varfloat64(out, float(cnt[j]))
            prev = int(idx[j])


def _decode_store_into(
    bins: dict[int, float], b: memoryview, pos: int, sub: int
) -> int:
    """Decode one store block, merging into ``bins``
    (store.go:90-153 three bin-encoding modes)."""
    if sub == BIN_ENCODING_INDEX_DELTAS_AND_COUNTS:
        n, pos = decode_uvarint64(b, pos)
        index = 0
        for _ in range(n):
            d, pos = decode_varint64(b, pos)
            c, pos = decode_varfloat64(b, pos)
            index += d
            bins[index] = bins.get(index, 0.0) + c
    elif sub == BIN_ENCODING_INDEX_DELTAS:
        n, pos = decode_uvarint64(b, pos)
        index = 0
        for _ in range(n):
            d, pos = decode_varint64(b, pos)
            index += d
            bins[index] = bins.get(index, 0.0) + 1.0
    elif sub == BIN_ENCODING_CONTIGUOUS_COUNTS:
        n, pos = decode_uvarint64(b, pos)
        index, pos = decode_varint64(b, pos)
        delta, pos = decode_varint64(b, pos)
        for _ in range(n):
            c, pos = decode_varfloat64(b, pos)
            if c != 0:
                bins[index] = bins.get(index, 0.0) + c
            index += delta
    else:
        raise DecodingError(f"unknown bin encoding {sub}")
    return pos


# ------------------------------------------------------------- sketch framing
def encode_sketch(
    s: DDSketch, omit_index_mapping: bool = False, include_exact_stats: bool = True
) -> bytes:
    """Serialize a sketch (framing per ddsketch.go:370-382 + exact-stats
    blocks per ddsketch.go:705-760)."""
    out = bytearray()
    if s.zero_count != 0:
        out.append(FLAG_ZERO_COUNT)
        encode_varfloat64(out, s.zero_count)
    if not omit_index_mapping:
        out.append(_flag(FLAG_TYPE_INDEX_MAPPING, _MAPPING_SUBFLAGS[s.mapping.interpolation]))
        encode_float64le(out, s.mapping.gamma)
        encode_float64le(out, s.mapping.index_offset)
    if include_exact_stats:
        out.append(FLAG_COUNT)
        encode_varfloat64(out, s.exact_count)
        out.append(FLAG_SUM)
        encode_float64le(out, s.sum)
        out.append(FLAG_MIN)
        encode_float64le(out, s.exact_min)
        out.append(FLAG_MAX)
        encode_float64le(out, s.exact_max)
    _encode_store(out, FLAG_TYPE_POSITIVE_STORE, s.pos_idx, s.pos_cnt)
    _encode_store(out, FLAG_TYPE_NEGATIVE_STORE, s.neg_idx, s.neg_cnt)
    return bytes(out)


def decode_sketch(
    data: bytes,
    mapping: _BaseMapping | None = None,
    config: DDSketchConfig | None = None,
) -> DDSketch:
    """Decode a sketch blob. ``decode_and_merge`` semantics are obtained by
    merging the returned sketch (the flag loop itself is additive, matching
    ddsketch.go:415-475)."""
    pos_bins: dict[int, float] = {}
    neg_bins: dict[int, float] = {}
    zero_count = 0.0
    xcount = None
    xsum = None
    xmin = None
    xmax = None
    decoded_mapping = mapping

    b = memoryview(data)
    pos = 0
    while pos < len(b):
        flag = b[pos]
        pos += 1
        ftype = flag & 0b11
        sub = flag >> 2
        if ftype == FLAG_TYPE_POSITIVE_STORE:
            pos = _decode_store_into(pos_bins, b, pos, sub)
        elif ftype == FLAG_TYPE_NEGATIVE_STORE:
            pos = _decode_store_into(neg_bins, b, pos, sub)
        elif ftype == FLAG_TYPE_INDEX_MAPPING:
            if sub not in _MAPPING_BY_SUBFLAG:
                raise DecodingError(f"unsupported index mapping subflag {sub}")
            gamma, pos = decode_float64le(b, pos)
            offset, pos = decode_float64le(b, pos)
            m = mapping_from_params(_MAPPING_BY_SUBFLAG[sub], gamma, offset)
            if decoded_mapping is not None and not decoded_mapping.equals(m):
                raise DecodingError("index mapping mismatch")
            decoded_mapping = m
        elif flag == FLAG_ZERO_COUNT:
            z, pos = decode_varfloat64(b, pos)
            zero_count += z
        elif flag == FLAG_COUNT:
            v, pos = decode_varfloat64(b, pos)
            xcount = (xcount or 0.0) + v
        elif flag == FLAG_SUM:
            v, pos = decode_float64le(b, pos)
            xsum = (xsum or 0.0) + v
        elif flag == FLAG_MIN:
            v, pos = decode_float64le(b, pos)
            xmin = v if xmin is None else min(xmin, v)
        elif flag == FLAG_MAX:
            v, pos = decode_float64le(b, pos)
            xmax = v if xmax is None else max(xmax, v)
        else:
            raise DecodingError(f"unknown flag 0x{flag:02x}")

    if decoded_mapping is None:
        raise DecodingError("missing index mapping")

    cfg = config or DDSketchConfig(
        alpha=decoded_mapping.relative_accuracy(),
        interpolation=decoded_mapping.interpolation,
    )
    s = DDSketch(config=cfg, mapping=decoded_mapping)
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

    if xcount is not None:
        s.exact_count = xcount
        s.exact_sum = xsum if xsum is not None else s.sum_approx()
        s.exact_min = xmin if xmin is not None else (
            s.min_approx() if not s.is_empty else math.inf
        )
        s.exact_max = xmax if xmax is not None else (
            s.max_approx() if not s.is_empty else -math.inf
        )
    else:
        # blob without exact stats (plain reference DDSketch): fall back to
        # sketch-derived stats so the always-on summary stays usable
        s.exact_count = s.count
        if not s.is_empty:
            s.exact_sum = s.sum_approx()
            s.exact_min = s.min_approx()
            s.exact_max = s.max_approx()
    return s
