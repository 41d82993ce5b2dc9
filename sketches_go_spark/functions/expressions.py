"""Pure-Catalyst column expressions shared across the library.

Everything here compiles to JVM-side whole-stage-codegen expressions — zero
Python in the hot path.  The bucket-index expression is the Catalyst twin of
``LogarithmicMapping.index`` (parity:
/root/reference/ddsketch/mapping/logarithmic_mapping.go:69-84); the two forms
must agree on bucket indexes for any double input (same floor(log(v)*m+o)
formula; libm vs JVM Math.log may differ by 1 ulp at bucket edges, which the
alpha accuracy contract absorbs — tests never assert golden indexes).

``portable_hash64`` is a 60-bit MD5-derived hash whose exact value is
reproducible in ANSI SQL on any engine (used so DuckDB oracles can replay
hash-dependent operators bit-for-bit).  Production jobs that don't need
cross-engine replay should prefer ``F.xxhash64`` (cheaper, JVM-intrinsic);
every operator that hashes takes a ``hash_fn`` switch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from sketches_go_spark.core.mapping import LogarithmicMapping


def bucket_index(value: Column, mapping: LogarithmicMapping) -> Column:
    """floor(ln(v) * multiplier + index_offset) as INT — the DDSketch bucket
    of a positive value.  Callers handle the sign/zero 3-way split."""
    raw = F.log(value) * F.lit(mapping.multiplier) + F.lit(mapping.index_offset)
    return F.floor(raw).cast("int")


def bucket_value(bucket: Column, mapping: LogarithmicMapping) -> Column:
    """Representative value of a bucket: exp((i-offset)/multiplier)*(1+alpha)."""
    lower = F.exp(
        (bucket.cast("double") - F.lit(mapping.index_offset)) / F.lit(mapping.multiplier)
    )
    return lower * F.lit(1.0 + mapping.relative_accuracy())


def sign_bucket(value: Column, mapping: LogarithmicMapping) -> tuple[Column, Column]:
    """3-way value routing (ddsketch.go:124-145): returns (sign, bucket) where
    sign is +1 / -1 / 0 and bucket is the index within that sign's store
    (0 for the zero region).  NaN and out-of-range values map to sign NULL so
    they can be counted as rejected rather than silently dropped."""
    v = value.cast("double")
    min_i = F.lit(mapping.min_indexable)
    max_i = F.lit(mapping.max_indexable)
    sign = (
        F.when(v.isNull() | F.isnan(v) | (v > max_i) | (v < -max_i), F.lit(None).cast("int"))
        .when(v > min_i, F.lit(1))
        .when(v < -min_i, F.lit(-1))
        .otherwise(F.lit(0))
    )
    bucket = (
        F.when(sign == 1, bucket_index(v, mapping))
        .when(sign == -1, bucket_index(-v, mapping))
        .otherwise(F.lit(0))
    )
    return sign, bucket


def portable_hash64(col: Column, salt: str = "") -> Column:
    """Deterministic 60-bit hash reproducible in DuckDB:
    ``cast(conv(substr(md5(concat(salt, s)), 1, 15), 16, 10) as bigint)``.
    Value range [0, 2^60) — safe under ANSI-mode bigint arithmetic."""
    s = F.concat(F.lit(salt), col.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def portable_hash64_sql_duckdb(expr: str, salt: str = "") -> str:
    """The DuckDB-dialect twin of :func:`portable_hash64` for oracle SQL."""
    inner = f"concat('{salt}', cast({expr} as string))"
    return f"cast(concat('0x', substr(md5({inner}), 1, 15)) as bigint)"
