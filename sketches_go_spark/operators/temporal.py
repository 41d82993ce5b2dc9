"""Temporal relational operators over event / transcript streams:
gap-based sessionization and as-of (most-recent-prior) joins.

Spark has no built-in for either; both are expressed as single-shuffle
window compositions (no per-key Python, no iterative driver loops), so they
inherit whole-stage codegen and scale with ordinary hash partitioning on the
entity key:

- **sessionize**: the classic lag-gap-cumsum — a session boundary is a gap
  greater than the threshold; the running sum of boundary flags IS the
  session index.  One shuffle on the entity key.
- **asof_join**: the union trick — tag both sides, sort by (key, ts, side)
  and carry the right side's payload forward with ``last(..., ignorenulls)``
  over an unbounded-preceding row frame.  One shuffle TOTAL for both inputs
  (vs the naive per-left-row subquery, which is a quadratic disaster), ties
  resolve as at-or-before (right row at the same timestamp matches), which
  is exactly DuckDB/pandas ``ASOF JOIN``/``merge_asof`` backward semantics.

Determinism: callers supply a total-order tiebreak column (an id) so window
orders are unique — required for the cross-engine oracle replays."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap: float,
) -> DataFrame:
    """Adds ``session_idx`` (0-based per key, in time order): a new session
    starts at the first event and whenever the gap since the previous event
    exceeds ``gap`` (in the ts column's unit — pass unix micros + a micros
    gap for exact integer arithmetic).  One shuffle, on ``key_col``."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    prev_ts = F.lag(F.col(ts_col)).over(w)
    gap_c = F.col(ts_col).cast("double") - prev_ts.cast("double")
    new_sess = F.when(
        prev_ts.isNull() | (gap_c > F.lit(float(gap))), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_idx", (F.sum(new_sess).over(run) - F.lit(1)).cast("int")
    )


def funnel(
    df: DataFrame,
    key_col: str,
    type_col: str,
    ts_col: str,
    steps: Sequence[str],
    within: float | None = None,
) -> DataFrame:
    """(step:int, step_name, users:bigint, conversion:double): classic funnel
    — an entity converts step i when its earliest step-i event AT OR AFTER
    its step-(i-1) conversion time exists (optionally within ``within`` time
    units of the FIRST step's time).  conversion = users_i / users_1
    (rounded to 6; step 1 conversion is 1.0 by construction).

    Single-job formulation: ONE aggregation per entity collects each step's
    timestamps (events of other types are dropped before the shuffle), the
    chained stage times t1..tk are then pure column expressions —
    ``t_i = array_min(filter(ts_i, x -> x >= t_{i-1}))`` — and a final
    global aggregation counts non-null t_i per step.  One shuffle on the
    entity key, one tiny all-to-one exchange, one Spark job (the previous
    formulation ran len(steps)+1 serial ``count()`` jobs).  Per-entity
    state is the entity's own step-event timestamps only — bounded by
    events per entity, never by table size."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    ts_d = F.col(ts_col).cast("double")
    per_entity = (
        df.where(F.col(type_col).isin(list(steps)))
        .groupBy(key_col)
        .agg(
            *[
                F.collect_list(F.when(F.col(type_col) == s, ts_d)).alias(f"_a{i}")
                for i, s in enumerate(steps, start=1)
            ]
        )
    )
    # chained conditional minima: a NULL t_{i-1} makes the lambda predicate
    # NULL for every element -> empty filter -> NULL t_i (non-conversion
    # cascades without special-casing)
    # the lambda must take exactly ONE parameter: F.filter inspects arity
    # and would feed the array INDEX to any second parameter
    def _stage_pred(prev, hi):
        if hi is None:
            return lambda x: x >= prev
        return lambda x: (x >= prev) & (x <= hi)

    per_entity = per_entity.withColumn("t1", F.array_min("_a1"))
    hi = None if within is None else F.col("t1") + F.lit(float(within))
    for i in range(2, len(steps) + 1):
        pred = _stage_pred(F.col(f"t{i - 1}"), hi)
        per_entity = per_entity.withColumn(
            f"t{i}", F.array_min(F.filter(f"_a{i}", pred))
        )
    totals = per_entity.agg(
        *[F.count(f"t{i}").alias(f"n{i}") for i in range(1, len(steps) + 1)]
    ).collect()[0]
    counts = [int(totals[f"n{i}"]) for i in range(1, len(steps) + 1)]
    spark = df.sparkSession
    rows = [
        (i + 1, steps[i], counts[i], round(counts[i] / counts[0], 6) if counts[0] else 0.0)
        for i in range(len(steps))
    ]
    return spark.createDataFrame(
        rows, "step int, step_name string, users bigint, conversion double"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    payload_cols: Sequence[str],
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval of the same key containing its
    timestamp (``start <= ts <= end``), surfacing interval payloads as
    ``ivl_<name>``.

    Spark has no native interval join — a raw inequality join degrades to a
    nested loop.  The scale formulation: quantize time into buckets of
    ``bucket_width`` (same unit as the ts columns), explode each interval
    into the buckets it covers, equi-join on (key, bucket), then filter the
    exact containment.  A point lives in exactly ONE bucket, so a contained
    pair meets exactly once — no dedup stage.  The explode factor is
    interval_length/bucket_width + 1: pick the width near the typical
    interval length (one extra row per interval, and each point probes one
    bucket)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if "_pb" in points.columns:
        raise ValueError(
            "points must not carry a column named '_pb' (reserved for the "
            "internal bucket index; rename it before calling interval_join)"
        )
    w = F.lit(int(bucket_width))
    pt = points.withColumn("_pb", F.floor(F.col(ts_col).cast("bigint") / w))
    iv = intervals.select(
        F.col(key_col).alias("_ik"),
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_ipay"),
    ).withColumn(
        "_pb",
        F.explode(
            F.sequence(
                F.floor(F.col("_s").cast("bigint") / w),
                F.floor(F.col("_e").cast("bigint") / w),
            )
        ),
    )
    joined = pt.join(
        iv,
        (pt["_pb"] == iv["_pb"])
        & (pt[key_col] == iv["_ik"])
        & (pt[ts_col] >= iv["_s"])
        & (pt[ts_col] <= iv["_e"]),
        how="left" if how == "left" else "inner",
    )
    return joined.select(
        *[pt[c] for c in points.columns],
        *[F.col(f"_ipay.{c}").alias(f"ivl_{c}") for c in payload_cols],
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    left_tb: str,
    right_tb: str,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts <= left_ts`` for the same key (``direction=
    'backward'``, inclusive — the default), or the smallest ``right_ts >=
    left_ts`` (``'forward'``, implemented by negating the time axis; both
    match pandas merge_asof).  Payload columns surface as ``asof_<name>``;
    ``how='left'`` keeps unmatched left rows with null payloads.

    Implementation is the union trick (module docstring): both inputs are
    tagged and unioned, ONE window pass carries the latest right payload
    forward, then left rows are filtered back out.  Right rows sort before
    left rows at an equal timestamp, which yields the inclusive tie rule.

    ``left_tb``/``right_tb`` are per-side id columns making the window order
    total (equal-timestamp right rows would otherwise resolve arbitrarily —
    the deterministic rule is: highest tiebreak id wins among equal-ts right
    rows, matching the oracle replay).

    At 100-TB scale the single exchange is on ``key_col``; skew in the key
    (one hot entity) serializes that entity's timeline — inherent to as-of
    semantics, mitigated upstream by time-bucketing the key if needed."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    sgn = F.lit(1.0) if direction == "backward" else F.lit(-1.0)
    lt = left.select(
        F.col(key_col).alias("_k"),
        (sgn * F.col(left_ts).cast("double")).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(left_tb).cast("bigint").alias("_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(
                F.struct(*[F.col(c) for c in payload_cols]).alias("s")
            ).schema["s"].dataType
        ).alias("_payload"),
    )
    rt = right.select(
        F.col(key_col).alias("_k"),
        (sgn * F.col(right_ts).cast("double")).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_tb).cast("bigint").alias("_tb"),
        F.lit(None).cast(
            left.select(
                F.struct(*[F.col(c) for c in left.columns]).alias("s")
            ).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    )
    u = lt.unionByName(rt)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_asof", F.last("_payload", ignorenulls=True).over(w)
    ).where(F.col("_side") == 1)
    if how == "inner":
        carried = carried.where(F.col("_asof").isNotNull())
    return carried.select(
        "_lrow.*",
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in payload_cols],
    )


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    left_tb: str,
    right_tb: str,
    how: str = "inner",
) -> DataFrame:
    """As-of join, ``direction='nearest'``: attach the right row whose
    timestamp is CLOSEST to the left row's, either side.  Tie rules
    (deterministic, oracle-replayed): equal distance -> the backward
    (at-or-before) match wins, matching pandas merge_asof; among equal
    backward timestamps the highest tiebreak id wins (same as
    :func:`asof_join` backward); among equal forward timestamps the lowest
    tiebreak id wins.  A right row AT the left timestamp is a backward
    match at distance 0.

    One-pass formulation: the same union trick as :func:`asof_join`, but
    with TWO frame windows over ONE sort — the running last-right payload
    ([unbounded preceding, current]) and the first following right payload
    ([current, unbounded following]).  Still a single Exchange on the key;
    the second window reuses the sort (frame change only).  A two-call
    backward+forward composition would cost two exchanges plus a join."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    pay_t = right.select(
        F.struct(*[F.col(c) for c in payload_cols]).alias("s")
    ).schema["s"].dataType
    lrow_t = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("s")
    ).schema["s"].dataType
    lt = left.select(
        F.col(key_col).alias("_k"),
        F.col(left_ts).cast("double").alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(left_tb).cast("bigint").alias("_tb"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(pay_t).alias("_payload"),
    )
    rt = right.select(
        F.col(key_col).alias("_k"),
        F.col(right_ts).cast("double").alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(right_tb).cast("bigint").alias("_tb"),
        F.lit(None).cast(lrow_t).alias("_lrow"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    )
    u = lt.unionByName(rt)
    order = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc())
    )
    w_prev = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    r_ts = F.when(F.col("_side") == 0, F.col("_ts"))
    carried = (
        u.withColumn("_prev", F.last("_payload", ignorenulls=True).over(w_prev))
        .withColumn("_prev_ts", F.last(r_ts, ignorenulls=True).over(w_prev))
        .withColumn("_next", F.first("_payload", ignorenulls=True).over(w_next))
        .withColumn("_next_ts", F.first(r_ts, ignorenulls=True).over(w_next))
        .where(F.col("_side") == 1)
    )
    prev_d = F.col("_ts") - F.col("_prev_ts")
    next_d = F.col("_next_ts") - F.col("_ts")
    use_prev = F.col("_prev").isNotNull() & (
        F.col("_next").isNull() | (prev_d <= next_d)
    )
    picked = carried.withColumn(
        "_asof", F.when(use_prev, F.col("_prev")).otherwise(F.col("_next"))
    ).withColumn(
        "_asof_d",
        F.when(use_prev, prev_d).otherwise(next_d),
    )
    if how == "inner":
        picked = picked.where(F.col("_asof").isNotNull())
    return picked.select(
        "_lrow.*",
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in payload_cols],
        F.col("_asof_d").alias("asof_distance"),
    )
