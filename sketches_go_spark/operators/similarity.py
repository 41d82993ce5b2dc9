"""Similarity search over embedding columns (array<float>).

- **brute-force cosine top-k**: exact baseline.  Query set broadcast; the dot
  product runs JVM-side (``F.aggregate``/``zip_with`` fold — no Python);
  per-query top-k via a window over (rounded similarity, id) so ranking is
  deterministic and engine-portable.
- **random-hyperplane LSH (ANN)**: b sign-bits of projections onto
  deterministic pseudo-random hyperplanes form a bucket key; candidates share
  a bucket (multi-probe: exact bucket only here), refined by exact cosine.
  The hyperplanes are derived from the portable hash, so the DuckDB oracle
  reproduces them bit-for-bit.
- **embedding cosine near-dup**: all pairs with cosine >= threshold within
  LSH buckets.

At 100 TB the scale path is the LSH variant: the bucket key turns the
quadratic cross join into a per-bucket self-join, and the projection loop is
a fixed-size literal array (Catalyst constant-folds the hyperplanes).
"""

from __future__ import annotations

import hashlib
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hyperplane(j: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component — identical formula
    in the DuckDB oracle: (md5-hash('rp{j}:{d}') % 2001)/1000 - 1."""
    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"rp{j}:{d}".encode()).hexdigest()[:15], 16)
        out.append((h % 2001) / 1000.0 - 1.0)
    return out


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product in double precision (JVM-side).
    The explicit fold order makes the result reproducible in any engine that
    folds left-to-right."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    sim_decimals: int = 4,
) -> DataFrame:
    """(query_id, rank, vec_id, sim): exact top-k by cosine.

    ``queries``: (query_id, embedding).  Queries are broadcast (small side);
    similarity is computed JVM-side in one pass over the vectors; top-k via a
    rank window partitioned by query.  Ties broken by vec_id — combined with
    similarity rounding this makes the ranking deterministic cross-engine."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    sims = vectors.join(F.broadcast(q)).select(
        query_id_col,
        id_col,
        F.round(cosine_expr(F.col(vec_col), F.col("_qvec")), sim_decimals).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "sim")
    )


def lsh_bucket_expr(vec: Column, planes: Sequence[Sequence[float]]) -> Column:
    """Bucket id = integer of sign bits of the hyperplane projections."""
    acc = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        proj = dot_expr(vec, F.array(*[F.lit(float(x)) for x in plane]))
        acc = acc + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc


def lsh_ann_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    sim_decimals: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    refined by exact cosine.  Recall < 1 by design; the accuracy/scale
    trade-off is tested against the brute-force baseline."""
    planes = [hyperplane(j, dim) for j in range(n_planes)]
    vb = vectors.withColumn("_bkt", lsh_bucket_expr(F.col(vec_col), planes))
    qb = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("_bkt"),
    )
    sims = vb.join(F.broadcast(qb), "_bkt").select(
        query_id_col,
        id_col,
        F.round(cosine_expr(F.col(vec_col), F.col("_qvec")), sim_decimals).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim").desc(), F.col(id_col).asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "sim")
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_decimals: int = 4,
) -> DataFrame:
    """(id_a, id_b, sim): embedding near-duplicates with cosine >= threshold,
    candidates blocked by LSH bucket (near-identical vectors share all sign
    bits with high probability)."""
    planes = [hyperplane(j, dim) for j in range(n_planes)]
    vb = vectors.select(
        F.col(id_col), F.col(vec_col), lsh_bucket_expr(F.col(vec_col), planes).alias("_bkt")
    )
    a = vb.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "_bkt"
    )
    b = vb.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "_bkt"
    )
    return (
        a.join(b, "_bkt")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_expr(F.col("_va"), F.col("_vb")), sim_decimals).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )
