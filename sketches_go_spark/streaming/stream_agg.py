"""Structured Streaming sketch aggregation (axis B).

Two designs, matching the two batch paths:

1. **Relational streaming bins**: the bins build is an ordinary streaming
   aggregation — ``withWatermark`` + ``groupBy(window, keys, sign, bucket)
   .sum(weight)``.  Spark's state store maintains the bin counts
   incrementally; DDSketch's mergeability is exactly why this works (bins
   are a sum-monoid).  Quantile extraction happens per micro-batch in
   ``foreachBatch`` (chained aggregations aren't allowed inside one
   streaming query), writing final quantiles to any sink.

2. **Stateful sketch values**: ``applyInPandasWithState`` keeps one encoded
   DDSketch blob per group in the state store, decode-merge-encodes it on
   every micro-batch, and emits the group's current quantiles — the custom
   stateful operator form for when the sketch itself (not bins) must be the
   state (e.g. bounded-memory collapsing under unbounded key ranges).
"""

from __future__ import annotations

from typing import Iterable, Sequence, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StructField,
    StructType,
)

from sketches_go_spark.core.ddsketch import DDSketch, DDSketchConfig
from sketches_go_spark.core.encoding import decode_sketch, encode_sketch
from sketches_go_spark.functions.ddsketch_fns import quantiles_from_bins
from sketches_go_spark.functions.expressions import sign_bucket


def streaming_bins(
    stream: DataFrame,
    value_col: str,
    keys: Sequence[str],
    config: DDSketchConfig | None = None,
    time_col: str | None = None,
    window: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming bins aggregation: returns a streaming DataFrame of
    (window?, keys..., sign, bucket, count).  Attach watermark + event-time
    window for late-data-bounded state."""
    config = config or DDSketchConfig()
    sign, bucket = sign_bucket(F.col(value_col), config.mapping())
    src = stream
    group_cols: list = list(keys)
    if time_col and watermark:
        src = src.withWatermark(time_col, watermark)
    if time_col and window:
        group_cols = [F.window(F.col(time_col), window).alias("window"), *keys]
    binned = src.select(
        *( [F.col(time_col)] if time_col else [] ),
        *keys,
        sign.alias("sign"),
        bucket.alias("bucket"),
    ).where(F.col("sign").isNotNull())
    return binned.groupBy(*group_cols, "sign", "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("count")
    )


def foreach_batch_quantiles(
    keys: Sequence[str],
    quantiles: Iterable[float],
    config: DDSketchConfig,
    sink,
):
    """foreachBatch hook: finish the quantile extraction on each micro-batch
    of bins and hand the RESULT DATAFRAME to ``sink``.

    ``sink`` is either a callable ``(quantiles_df, batch_id) -> None`` — the
    production shape, e.g. ``lambda df, bid: df.write.mode("append")
    .parquet(path)``, which stays fully executor-side — or a plain list, in
    which case rows are collected into it (tests/notebooks only)."""

    if callable(sink):
        write = sink
    else:

        def write(out: DataFrame, batch_id: int) -> None:
            sink.extend([(batch_id, *r) for r in out.collect()])

    def _inner(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = quantiles_from_bins(batch_df, keys, quantiles, config)
        write(out, batch_id)

    return _inner


# ---------------------------------------------------------------- stateful
def stateful_blob_stream(
    stream: DataFrame,
    value_col: str,
    keys: Sequence[str],
    make,
    decode_fn,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
):
    """Generic sketch-as-state streaming operator: any sketch object exposing
    ``add(ndarray)`` / ``quantiles(list)`` / ``to_bytes()`` and an ``n`` or
    ``count`` size attribute (KLL, t-digest — the rank sketches whose state
    is genuinely non-relational, so this applyInPandasWithState path is
    their ONLY streaming form) is kept encoded in the state store, one blob
    per group, and per-group quantiles re-emit after every micro-batch.
    ``make()`` builds an empty sketch; ``decode_fn(bytes)`` revives one."""
    qs = [float(q) for q in quantiles]
    key_fields = [stream.schema[k] for k in keys]
    out_fields = list(key_fields) + [StructField("n", DoubleType())]
    for q in qs:
        pct = q * 100
        name = f"p{int(pct)}" if float(pct).is_integer() else f"p{pct}".replace(".", "_")
        out_fields.append(StructField(name, DoubleType()))
    out_schema = StructType(out_fields)
    state_schema = StructType([StructField("blob", BinaryType())])

    def update(key, pdfs, state: GroupState):
        if state.exists:
            (blob,) = state.get
            sk = decode_fn(bytes(blob))
        else:
            sk = make()
        for pdf in pdfs:
            v = pdf[value_col].to_numpy(dtype="float64", na_value=float("nan"))
            v = v[~np.isnan(v)]
            if v.size:
                sk.add(v)
        state.update((sk.to_bytes(),))
        n = getattr(sk, "n", None)
        if n is None:
            n = sk.count
        row = list(key) + [float(n)] + [float(x) for x in sk.quantiles(qs)]
        yield pd.DataFrame([row], columns=[f.name for f in out_fields])

    return stream.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_sketch_stream(
    stream: DataFrame,
    value_col: str,
    keys: Sequence[str],
    config: DDSketchConfig | None = None,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
):
    """applyInPandasWithState: one encoded DDSketch per group as state,
    emitting (keys..., n, p<q>...) after every micro-batch update.

    State = the sketch blob (compact: the reference binary format), so state
    store size is O(bins) per group regardless of stream length — the whole
    point of sketching the stream."""
    config = config or DDSketchConfig()
    qs = [float(q) for q in quantiles]

    key_fields = [stream.schema[k] for k in keys]
    out_fields = list(key_fields) + [StructField("n", DoubleType())]
    for q in qs:
        pct = q * 100
        name = f"p{int(pct)}" if float(pct).is_integer() else f"p{pct}".replace(".", "_")
        out_fields.append(StructField(name, DoubleType()))
    out_schema = StructType(out_fields)
    state_schema = StructType([StructField("blob", BinaryType())])

    def update(
        key: Tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ):
        if state.exists:
            (blob,) = state.get
            sk = decode_sketch(bytes(blob), config=config)
        else:
            sk = DDSketch(config=config)
        for pdf in pdfs:
            sk.add(
                pdf[value_col].to_numpy(dtype="float64", na_value=float("nan")),
                on_untrackable="ignore",
            )
        state.update((encode_sketch(sk),))
        row = list(key) + [sk.count] + [
            float(x) for x in sk.quantiles(qs)
        ]
        yield pd.DataFrame([row], columns=[f.name for f in out_fields])

    return stream.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_minhash_buckets(
    stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_perm: int = 16,
    band_size: int = 4,
    hash_fn=None,
) -> DataFrame:
    """Streaming MinHash-LSH band-bucket state: (band, bucket, canonical_id,
    n_docs) — the near-dup index maintained incrementally as documents
    arrive.

    The key design point: a document's MinHash signature is computed
    ENTIRELY WITHIN its own row (dedup.minhash_signatures_rowwise — array
    minima over the doc's shingle array, no cross-row dependency), so the
    only streaming aggregation is the bucket summary itself, and min/count
    are order-free monoids the state store maintains natively.  The
    availableNow result therefore equals the batch replay EXACTLY (the
    batch-equality oracle), and state is one row per occupied (band,
    bucket) — the same index a batch LSH pass would build, kept fresh.

    An arriving doc that lands in a bucket with n_docs >= 2 has a near-dup
    candidate; candidate verification (exact Jaccard) stays a batch join
    against the corpus — verification needs both texts and is not
    meaningfully streamable state."""
    from sketches_go_spark.operators.dedup import (
        band_buckets_expr,
        minhash_signatures_rowwise,
    )

    sigs = minhash_signatures_rowwise(
        stream, id_col, text_col, n=n, num_perm=num_perm, hash_fn=hash_fn
    )
    bands = band_buckets_expr(num_perm, band_size, hash_fn)
    buckets = sigs.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col,
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
    )
    return buckets.groupBy("band", "bucket").agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def streaming_hll_registers(
    stream: DataFrame,
    item_col: str,
    keys: Sequence[str],
    p: int = 12,
    time_col: str | None = None,
    window: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming HLL register relation: (window?, keys..., reg, rho).

    Registers are a MAX-monoid, so the state store maintains them natively —
    the streaming result equals the batch register relation exactly, and the
    estimate is computed per micro-batch (or from the final state) with the
    same relational estimator as the batch path.  State size per group is
    bounded by m = 2^p rows regardless of stream length."""
    from sketches_go_spark.functions.sketch_fns import hll_register_exprs

    idx, rho = hll_register_exprs(F.col(item_col), p)
    src = stream.where(F.col(item_col).isNotNull())
    group_cols: list = list(keys)
    if time_col and watermark:
        src = src.withWatermark(time_col, watermark)
        group_cols = [F.window(F.col(time_col), window or "1 minute")] + group_cols
    return (
        src.select(*([time_col] if time_col and watermark else []), *keys,
                   idx.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def streaming_cms_counters(
    stream: DataFrame,
    item_col: str,
    keys: Sequence[str],
    depth: int = 4,
    width: int = 512,
    time_col: str | None = None,
    window: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Streaming count-min counter relation: (window?, keys..., row, col,
    cnt) — a SUM-monoid like the DDSketch bins, bounded at depth*width state
    rows per group."""
    from sketches_go_spark.core.cms import cms_salt
    from sketches_go_spark.functions.expressions import portable_hash64

    item = F.col(item_col)
    cols = F.array(
        *[
            F.pmod(portable_hash64(item, cms_salt(j)), F.lit(width)).cast("int")
            for j in range(depth)
        ]
    )
    src = stream.where(item.isNotNull())
    group_cols: list = list(keys)
    if time_col and watermark:
        src = src.withWatermark(time_col, watermark)
        group_cols = [F.window(F.col(time_col), window or "1 minute")] + group_cols
    return (
        src.select(*([time_col] if time_col and watermark else []), *keys,
                   F.posexplode(cols).alias("row", "col"))
        .groupBy(*group_cols, "row", "col")
        .agg(F.count(F.lit(1)).cast("double").alias("cnt"))
    )
