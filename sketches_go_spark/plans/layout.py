"""Storage layout for shuffle-free windowed derivations at 100 TB.

The dominant shuffle in the transcript workload is NOT the sketch build (that
shuffles only (keys, sign, bucket) bin rows after map-side combine) — it is
the inter-turn latency derivation, whose ``lag(ts) OVER (PARTITION BY conv_id
ORDER BY turn_idx)`` window repartitions every raw row by conv_id before a
single sketch bucket is computed.

The fix is layout, not code: store the transcript table hash-bucketed by
``conv_id`` and sorted by ``(conv_id, turn_idx)``.  A bucketed scan reports
``HashPartitioning(conv_id, n_buckets)``, which satisfies the window's
clustered-distribution requirement, so Catalyst elides the Exchange entirely
— the window (and everything downstream, including the ddsketch groupBy when
keyed on conv_id) runs directly on the scan output.  In production this is an
Iceberg table with ``bucket(N, conv_id)`` partitioning and a sort order of
(conv_id, turn_idx); in this sandbox the equivalent is a Spark bucketed
table, which exercises the identical planner path
(``spark.sql.sources.bucketing.enabled``).

Sizing at 10^12 turns: buckets should be a multiple of the executor-core
count with ~128-512 MB of parquet per bucket file — e.g. 16384 buckets for
~4 TB of compressed transcript parquet.  Writes must also be sorted WITHIN
buckets (sortBy) so per-file ordering lets the window's Sort collapse to a
cheap in-partition merge.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    sort_cols: Sequence[str],
    n_buckets: int,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed + sorted table (the co-location contract
    later reads rely on).  ``path`` overrides the warehouse location."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols).sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (scan reports HashPartitioning on the bucket
    columns — co-located joins/windows/groupBys on those columns skip their
    Exchange)."""
    return spark.table(table)


def sketch_range_boundaries(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    config=None,
) -> DataFrame:
    """Balanced range-partition boundaries from ONE DDSketch pass: the
    (n_buckets-1) interior quantiles of ``value_col``, as a single-row
    DataFrame carrying a sorted ``_bs`` array.  This is the classic
    sample-sort primitive done sketch-side — at 100 TB a range partitioner
    needs split points, and a mergeable sketch gets them in one map-side
    combinable aggregation instead of a sampling pass + driver sort
    (cf. Spark's RangePartitioner reservoir sampling).  Accuracy: each split
    lands within the sketch's relative-accuracy alpha of the true quantile,
    so bucket sizes are balanced to ~(1 ± 2*alpha)."""
    from pyspark.sql import functions as F

    from sketches_go_spark.functions import ddsketch_fns as dd

    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    src = df.select(
        F.lit("all").alias("_g"), F.col(value_col).cast("double").alias("_v")
    )
    bins = dd.build_bins(src, "_v", ["_g"], config)
    qs = [k / n_buckets for k in range(1, n_buckets)]
    qdf = dd.quantiles_from_bins(bins, ["_g"], qs, config)
    return qdf.groupBy("_g").agg(
        F.array_sort(F.collect_list("est")).alias("_bs")
    ).select("_bs")


def range_bucket_by_sketch(
    df: DataFrame,
    value_col: str,
    n_buckets: int,
    config=None,
    bucket_name: str = "range_bucket",
) -> DataFrame:
    """Tag every row with its sketch-derived range bucket: ``bucket =
    #boundaries <= value`` (ties go up), in 0..n_buckets-1.  The boundary
    row is BROADCAST onto the data (a 1-row array — no shuffle on the data
    rows beyond the tiny bins aggregation that built it); downstream code
    can ``repartition(n, bucket_name)`` / ``sortWithinPartitions`` to get a
    balanced global range layout without Spark's sampling pass.

    Repeated boundaries (a value mass heavier than 1/n_buckets) leave the
    intermediate buckets empty rather than splitting the tie — determinism
    over balance, same rule as every hash threshold here."""
    from pyspark.sql import functions as F

    reserved = {"_g", "_bs", bucket_name} & set(df.columns)
    if reserved:
        raise ValueError(
            "df must not carry columns named "
            + ", ".join(sorted(reserved))
            + " (reserved for range_bucket_by_sketch)"
        )
    bounds = sketch_range_boundaries(df, value_col, n_buckets, config)
    v = F.col(value_col).cast("double")
    bucket = F.size(F.filter(F.col("_bs"), lambda b: b <= v)).cast("int")
    return (
        df.join(F.broadcast(bounds), how="cross")
        .withColumn(bucket_name, bucket)
        .drop("_bs")
    )
