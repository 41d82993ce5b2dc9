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
