"""Deterministic sampling / splitting operators for training-data pipelines.

Every operator keys off the portable 60-bit content/id hash rather than an
RNG, which buys three properties a 100-TB pipeline needs and
``df.sample()``/``randomSplit()`` do not give:

- **Reproducible**: the same row lands in the same split/sample on every
  run, every cluster size, every partitioning — no seed plumbing, no
  dependence on partition iteration order (Spark's ``randomSplit`` is only
  stable for a fixed partitioning).
- **Joinable**: two tables sampled on the same key sample the SAME entities,
  so feature tables stay aligned with their labels.
- **Oracle-replayable**: the hash is plain md5 arithmetic, so any engine
  (the DuckDB correctness oracle included) reproduces the exact row set.

All pure Catalyst — one projection, no shuffle for split/sample; stratified
top-k is one window shuffle on the strata keys."""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sketches_go_spark.functions.expressions import portable_hash64

#: denominator of the split thresholds: hash buckets per unit weight
SPLIT_BUCKETS = 1_000_000


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def split_thresholds(weights: Mapping[str, float]) -> list[tuple[str, int]]:
    """[(name, exclusive_upper_bucket)] cumulative integer thresholds.
    Weights are normalized; the last split absorbs rounding residue so the
    thresholds always cover all SPLIT_BUCKETS buckets."""
    if any(w < 0 for w in weights.values()):
        raise ValueError("split weights must be non-negative")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum > 0")
    out: list[tuple[str, int]] = []
    acc = 0.0
    items = list(weights.items())
    for i, (name, w) in enumerate(items):
        acc += w / total
        hi = SPLIT_BUCKETS if i == len(items) - 1 else int(round(acc * SPLIT_BUCKETS))
        out.append((name, hi))
    return out


def hash_split(
    df: DataFrame,
    id_col: str | Column = "doc_id",
    weights: Mapping[str, float] | None = None,
    salt: str = "split:",
    hash_fn=None,
) -> DataFrame:
    """Adds a ``split`` column: deterministic train/val/test assignment by
    hash bucket ``h % SPLIT_BUCKETS`` against cumulative thresholds.  A row's
    split depends only on (salt, id) — stable across runs and re-partitions,
    and disjoint from any other salt's sampling decisions."""
    weights = weights or {"train": 0.98, "val": 0.01, "test": 0.01}
    hash_fn = hash_fn or portable_hash64
    bucket = F.pmod(hash_fn(_col(id_col), salt), F.lit(SPLIT_BUCKETS))
    thresholds = split_thresholds(weights)
    expr: Column | None = None
    for name, hi in thresholds[:-1]:
        cond = bucket < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = thresholds[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def deterministic_sample(
    df: DataFrame,
    id_col: str | Column = "doc_id",
    rate: float = 0.01,
    salt: str = "sample:",
    hash_fn=None,
) -> DataFrame:
    """Keep ~``rate`` of rows: filter ``h % SPLIT_BUCKETS < rate * buckets``.
    A pure pushdown-friendly filter — no shuffle, no RNG state; nested
    samples compose (rate 0.1 then 0.01 with the same salt is exactly the
    0.01 sample, because the bucket sets nest)."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError("rate must be in [0, 1]")
    thr = int(round(rate * SPLIT_BUCKETS))
    hash_fn = hash_fn or portable_hash64
    bucket = F.pmod(hash_fn(_col(id_col), salt), F.lit(SPLIT_BUCKETS))
    return df.where(bucket < F.lit(thr))


def stratified_topk_sample(
    df: DataFrame,
    keys: Sequence[str],
    id_col: str = "doc_id",
    k: int = 5,
    salt: str = "strat:",
    hash_fn=None,
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per key group, chosen by hash rank
    (ties broken by id — total order, so the selection is unique).  The
    hash rank of a fixed id is uniform, so this is a deterministic uniform
    without-replacement sample per stratum.  One window shuffle on the
    strata keys; at 100 TB prefer high-cardinality strata or pre-aggregate —
    a single giant stratum serializes into one reducer like any global
    top-k."""
    hash_fn = hash_fn or portable_hash64
    h = hash_fn(F.col(id_col), salt)
    w = Window.partitionBy(*keys).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= k)
    )


def rebalanced_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    id_col: str | Column = "doc_id",
    target: int | None = None,
    salt: str = "rebal:",
    hash_fn=None,
) -> DataFrame:
    """Deterministic GROUP-REBALANCING sample: per-group keep-rate
    ``rate_g = min(1, target / n_g)`` (``target`` defaults to the smallest
    group's size), applied as the same hash-threshold filter as
    :func:`deterministic_sample` — the corpus-balancing op (e.g. equalize
    languages) every mixture-training pipeline needs.

    Scale shape: one tiny per-group count aggregation broadcast back onto
    the rows; the filter itself is a pure projection — ZERO shuffles on the
    data rows, and the kept set is reproducible, nested (smaller targets
    keep subsets), and entity-aligned across tables like all hash sampling.
    Integer thresholds use floor (not round) so every engine agrees at the
    boundary."""
    reserved = {"_n", "_tgt", "_thr"} & set(df.columns)
    if reserved:
        raise ValueError(
            "df must not carry columns named "
            + ", ".join(sorted(reserved))
            + " (reserved for rebalanced_sample's per-group threshold join)"
        )
    hash_fn = hash_fn or portable_hash64
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    if target is None:
        tgt = counts.agg(F.min("_n").alias("_tgt"))
        counts = counts.join(F.broadcast(tgt), how="cross")
    else:
        if target <= 0:
            raise ValueError("target must be positive")
        counts = counts.withColumn("_tgt", F.lit(int(target)))
    thr = F.floor(
        F.least(F.lit(1.0), F.col("_tgt").cast("double") / F.col("_n"))
        * F.lit(SPLIT_BUCKETS)
    )
    counts = counts.select(*group_cols, thr.alias("_thr"))
    bucket = F.pmod(hash_fn(_col(id_col), salt), F.lit(SPLIT_BUCKETS))
    return (
        df.join(F.broadcast(counts), list(group_cols))
        .where(bucket < F.col("_thr"))
        .drop("_thr")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str | Column,
    k: int = 5,
    group_cols: Sequence[str] = (),
    id_col: str | Column = "doc_id",
    salt: str = "wsample:",
    hash_fn=None,
    decimals: int = 9,
) -> DataFrame:
    """Deterministic WEIGHTED sampling without replacement (Efraimidis-
    Spirakis A-Res): each row gets the key ``ln(u) / w`` where ``u`` is its
    id's deterministic hash uniform in (0, 1] and ``w`` its weight; the
    ``k`` largest keys per group are exactly a weighted
    without-replacement draw (ranking by ``ln(u)/w`` is order-equivalent to
    the classic ``u^(1/w)``, but numerically stabler for tiny weights).

    Same contract as every sampler here: reproducible under any
    partitioning/engine (the "randomness" is the id hash), entity-aligned
    across tables, and oracle-replayable.  Rows with ``w <= 0`` or null are
    excluded (zero-weight items are never drawn).  The emitted ``wkey`` is
    rounded so cross-engine libm ulp differences can't reorder the ranking
    (ties broken by id).

    Scale shape: one projection + one top-k window per group — identical to
    :func:`stratified_topk`; a single giant group serializes into one
    reducer like any global top-k (shard first if k is huge)."""
    reserved = {"wkey", "rk"} & set(df.columns)
    if reserved:
        raise ValueError(
            "df must not carry columns named "
            + ", ".join(sorted(reserved))
            + " (reserved for weighted_sample)"
        )
    hash_fn = hash_fn or portable_hash64
    w = _col(weight_col).cast("double")
    u = (hash_fn(_col(id_col), salt) + F.lit(1)).cast("double") / F.lit(
        float(1 << 60)
    )
    key = F.round(F.log(u) / w, decimals)
    d = df.where(w.isNotNull() & (w > 0)).withColumn("wkey", key)
    win = Window.partitionBy(*group_cols).orderBy(
        F.col("wkey").desc(), _col(id_col).asc()
    )
    return (
        d.withColumn("rk", F.row_number().over(win).cast("int"))
        .where(F.col("rk") <= k)
    )


def token_budget_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    token_col: str | Column,
    budget: int,
    id_col: str | Column = "doc_id",
    salt: str = "tokbudget:",
    hash_fn=None,
) -> DataFrame:
    """Deterministic greedy TOKEN-BUDGET fill per group: walk each group's
    rows in hash order and keep a row while the tokens accumulated BEFORE it
    are still under ``budget`` — the "hit N tokens of src X in the training
    mixture" op (budgets are over tokens, not document counts, which is what
    mixture specs are written in; :func:`rebalanced_sample` is the
    count-based sibling).  The kept set overshoots by at most one document
    per group, is reproducible under any partitioning/engine (ordering is
    the id hash, ties broken by id), and is NESTED: a larger budget keeps a
    superset of a smaller one, because the hash order is budget-independent.

    Adds ``n_tokens`` (the row's token count) and ``tokens_before`` (group
    tokens accumulated before it in hash order) for auditability.

    Scale shape: ONE window shuffle partitioned on the group keys — the
    running sum is a per-group sorted prefix scan, so like any per-group
    ordered scan a single giant group serializes into one reducer; at
    100 TB shard hot groups first (e.g. split a dominant source into
    ``(source, h % n_shards)`` subgroups with ``budget / n_shards`` each —
    hash-order nesting makes the union exactly the unsharded fill per
    shard)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    reserved = {"n_tokens", "tokens_before", "_tbh"} & set(df.columns)
    if reserved:
        raise ValueError(
            "df must not carry columns named "
            + ", ".join(sorted(reserved))
            + " (reserved for token_budget_sample's prefix scan)"
        )
    hash_fn = hash_fn or portable_hash64
    h = hash_fn(_col(id_col), salt)
    d = df.withColumn("n_tokens", _col(token_col).cast("bigint")).withColumn(
        "_tbh", h
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("_tbh").asc(), _col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.withColumn(
            "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .where(F.col("tokens_before") < F.lit(int(budget)))
        .drop("_tbh")
    )


def token_budget_sample_sql(
    src_sql: str,
    group_cols: Sequence[str],
    token_expr: str,
    budget: int,
    id_col: str = "doc_id",
    salt: str = "tokbudget:",
    select_cols: str = "* EXCLUDE (_tbh)",
) -> str:
    """DuckDB replay of :func:`token_budget_sample` over ``src_sql`` (a
    SELECT yielding the id, group and token-count columns).  The window sum
    is cast to bigint (DuckDB widens sum(bigint) to HUGEINT); the default
    projection EXCLUDEs the internal hash column the Spark side drops."""
    from sketches_go_spark.functions.expressions import (
        portable_hash64_sql_duckdb,
    )

    h = portable_hash64_sql_duckdb(id_col, salt)
    part = ", ".join(group_cols)
    return f"""WITH sgs_tb AS (
  SELECT *, cast({token_expr} AS bigint) AS n_tokens, {h} AS _tbh
  FROM ({src_sql})
),
sgs_pre AS (
  SELECT *, cast(coalesce(sum(n_tokens) OVER (
    PARTITION BY {part} ORDER BY _tbh ASC, {id_col} ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
    AS tokens_before
  FROM sgs_tb
)
SELECT {select_cols} FROM sgs_pre WHERE tokens_before < {int(budget)}"""


def weighted_sample_sql(
    src_sql: str,
    weight_expr: str,
    k: int = 5,
    group_cols: Sequence[str] = (),
    id_col: str = "doc_id",
    salt: str = "wsample:",
    decimals: int = 9,
    select_cols: str = "*",
) -> str:
    """DuckDB replay of :func:`weighted_sample` over ``src_sql`` (a SELECT
    yielding at least the id, group and weight columns)."""
    h = (
        f"cast(concat('0x', substr(md5(concat('{salt}', "
        f"cast({id_col} AS string))), 1, 15)) AS bigint)"
    )
    part = (
        f"PARTITION BY {', '.join(group_cols)} " if group_cols else ""
    )
    return f"""WITH sgs_w AS (
  SELECT *, round(ln(cast({h} + 1 AS double) / {float(1 << 60)})
                  / cast({weight_expr} AS double), {decimals}) AS wkey
  FROM ({src_sql})
  WHERE {weight_expr} IS NOT NULL AND cast({weight_expr} AS double) > 0
),
sgs_rk AS (
  SELECT *, cast(row_number() OVER (
    {part}ORDER BY wkey DESC, {id_col} ASC) AS int) AS rk
  FROM sgs_w
)
SELECT {select_cols} FROM sgs_rk WHERE rk <= {k}"""


#: fixed-point bits for the n^alpha scores in temperature_sample — makes the
#: cross-group normalizing sum INTEGER (order-free, exact) instead of a
#: float reduction whose result depends on aggregation order
TEMP_SCALE_BITS = 20


def _alpha_score(n: Column, alpha: float) -> Column:
    """n^alpha as a Column for the dyadic alphas whose result is BIT-EXACT
    on every IEEE-754 engine: sqrt is correctly rounded by the standard
    (pow is not), so 0.5 = sqrt, 0.25 = sqrt∘sqrt, and 0.75 = their product
    (one more correctly-rounded multiply) agree double-for-double between
    Spark's JVM and the DuckDB oracle."""
    d = n.cast("double")
    if alpha == 0.5:
        return F.sqrt(d)
    if alpha == 0.25:
        return F.sqrt(F.sqrt(d))
    if alpha == 0.75:
        return F.sqrt(d) * F.sqrt(F.sqrt(d))
    raise ValueError(
        "temperature_sample supports alpha in {0.25, 0.5, 0.75} (sqrt-chain "
        "exact cross-engine); general pow(n, alpha) is not correctly "
        f"rounded portably — got {alpha}"
    )


def _alpha_score_sql(expr: str, alpha: float) -> str:
    if alpha == 0.5:
        return f"sqrt(cast({expr} AS double))"
    if alpha == 0.25:
        return f"sqrt(sqrt(cast({expr} AS double)))"
    if alpha == 0.75:
        return f"sqrt(cast({expr} AS double)) * sqrt(sqrt(cast({expr} AS double)))"
    raise ValueError(f"unsupported alpha {alpha}")


def temperature_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    alpha: float = 0.5,
    id_col: str | Column = "doc_id",
    salt: str = "temp:",
    hash_fn=None,
) -> DataFrame:
    """Temperature mixture sampling: reshape the per-group row counts toward
    ``n_g^alpha`` (the standard multilingual/multi-source LLM-training rule —
    alpha=1 keeps the natural mixture, alpha->0 approaches uniform) by
    keeping each group at rate ``min(1, T * n_g^alpha / sum_h n_h^alpha / n_g)``
    where ``T`` is the corpus size — i.e. redistribute the SAME total budget
    toward the flattened mixture, downsample-only (no replacement).

    Cross-engine exactness: ``n^alpha`` uses sqrt chains (correctly rounded
    by IEEE-754, unlike pow), the score is fixed-pointed to an integer
    (``floor(score * 2^TEMP_SCALE_BITS)``) so the cross-group normalizing
    SUM is exact and order-free, and the final rate is a fixed-order chain
    of individually correctly-rounded double ops — the DuckDB oracle
    reproduces the kept set row-for-row.

    Scale shape: identical to :func:`rebalanced_sample` — one tiny per-group
    count aggregation, thresholds broadcast back onto the rows, the filter a
    pure projection; ZERO shuffles on the data rows."""
    reserved = {"_n", "_s", "_ts", "_tn", "_thr"} & set(df.columns)
    if reserved:
        raise ValueError(
            "df must not carry columns named "
            + ", ".join(sorted(reserved))
            + " (reserved for temperature_sample's threshold join)"
        )
    hash_fn = hash_fn or portable_hash64
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    score = F.floor(
        _alpha_score(F.col("_n"), alpha) * F.lit(float(1 << TEMP_SCALE_BITS))
    ).cast("bigint")
    counts = counts.withColumn("_s", score)
    totals = counts.agg(
        F.sum("_s").alias("_ts"), F.sum("_n").alias("_tn")
    )
    counts = counts.join(F.broadcast(totals), how="cross")
    # fixed-order double chain: ((T * s) / total_s) / n  — every operand is
    # an exactly-representable integer, every op correctly rounded once
    rate = (
        F.col("_tn").cast("double") * F.col("_s").cast("double")
        / F.col("_ts").cast("double")
        / F.col("_n").cast("double")
    )
    thr = F.floor(F.least(F.lit(1.0), rate) * F.lit(SPLIT_BUCKETS))
    counts = counts.select(*group_cols, thr.alias("_thr"))
    bucket = F.pmod(hash_fn(_col(id_col), salt), F.lit(SPLIT_BUCKETS))
    return (
        df.join(F.broadcast(counts), list(group_cols))
        .where(bucket < F.col("_thr"))
        .drop("_thr")
    )


def temperature_sample_sql(
    src_sql: str,
    group_cols: Sequence[str],
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "temp:",
) -> str:
    """DuckDB replay of :func:`temperature_sample` over ``src_sql``."""
    from sketches_go_spark.functions.expressions import (
        portable_hash64_sql_duckdb,
    )

    gcols = ", ".join(group_cols)
    h = portable_hash64_sql_duckdb(f"d.{id_col}", salt)
    return f"""WITH sgs_tmp_cnt AS (
  SELECT {gcols}, count(*) AS n FROM ({src_sql}) GROUP BY {gcols}
),
sgs_tmp_sc AS (
  SELECT {gcols}, n,
         cast(floor({_alpha_score_sql('n', alpha)} * {float(1 << TEMP_SCALE_BITS)})
              AS bigint) AS s
  FROM sgs_tmp_cnt
),
sgs_tmp_tot AS (
  SELECT cast(sum(s) AS bigint) AS ts, cast(sum(n) AS bigint) AS tn
  FROM sgs_tmp_sc
),
sgs_tmp_thr AS (
  SELECT {gcols},
         cast(floor(least(1.0,
             cast(tn AS double) * cast(s AS double)
             / cast(ts AS double) / cast(n AS double)) * {SPLIT_BUCKETS})
           AS bigint) AS thr
  FROM sgs_tmp_sc CROSS JOIN sgs_tmp_tot
)
SELECT d.* EXCLUDE (thr)
FROM (SELECT src.*, t.thr
      FROM ({src_sql}) src JOIN sgs_tmp_thr t USING ({gcols})) d
WHERE {h} % {SPLIT_BUCKETS} < d.thr"""


def temperature_resample(
    df: DataFrame,
    group_cols: Sequence[str],
    alpha: float = 0.5,
    id_col: str | Column = "doc_id",
    salt: str = "temp:",
    hash_fn=None,
) -> DataFrame:
    """Temperature mixture RESAMPLING — the with-replacement twin of
    :func:`temperature_sample`: every group is brought to ``T * n^alpha /
    sum(n^alpha)`` rows by REPLICATION as well as decimation (the
    low-resource-language upsampling rule).  Each row emits
    ``floor(rate)`` copies plus one more iff its id hash clears the
    fractional-part threshold; output rows carry ``copy_idx`` so downstream
    shuffles/dedup can tell copies apart.

    Same exactness contract as temperature_sample (sqrt-chain scores,
    integer normalizing sum, fixed-order double chain); the copy count is a
    pure per-row function of (group counts, id hash), so the multiset is
    reproducible under any partitioning and engine.

    Scale shape: thresholds broadcast; the fan-out is ``posexplode`` over an
    ``array_repeat`` — bounded by ceil(rate), no joins on the data rows.
    Upsampled groups are small by definition, so the replication factor is
    bounded by T/n_min in the worst case — cap alpha-flattening (or
    pre-filter microscopic groups) if that bound matters."""
    reserved = {
        "_n", "_s", "_ts", "_tn", "_base", "_fthr", "_copies", "copy_idx"
    } & set(df.columns)
    if reserved:
        raise ValueError(
            "df must not carry columns named "
            + ", ".join(sorted(reserved))
            + " (reserved for temperature_resample)"
        )
    hash_fn = hash_fn or portable_hash64
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_n"))
    score = F.floor(
        _alpha_score(F.col("_n"), alpha) * F.lit(float(1 << TEMP_SCALE_BITS))
    ).cast("bigint")
    counts = counts.withColumn("_s", score)
    totals = counts.agg(F.sum("_s").alias("_ts"), F.sum("_n").alias("_tn"))
    counts = counts.join(F.broadcast(totals), how="cross")
    rate = (
        F.col("_tn").cast("double") * F.col("_s").cast("double")
        / F.col("_ts").cast("double")
        / F.col("_n").cast("double")
    )
    base = F.floor(rate).cast("int")
    fthr = F.floor((rate - F.floor(rate)) * F.lit(SPLIT_BUCKETS)).cast(
        "bigint"
    )
    counts = counts.select(
        *group_cols, base.alias("_base"), fthr.alias("_fthr")
    )
    bucket = F.pmod(hash_fn(_col(id_col), salt), F.lit(SPLIT_BUCKETS))
    copies = F.col("_base") + (bucket < F.col("_fthr")).cast("int")
    tagged = df.join(F.broadcast(counts), list(group_cols)).withColumn(
        "_copies", copies
    )
    out_cols = [c for c in df.columns]
    return (
        tagged.where(F.col("_copies") > 0)
        .select(
            *out_cols,
            F.posexplode(
                F.array_repeat(F.lit(1), F.col("_copies"))
            ).alias("copy_idx", "_one"),
        )
        .drop("_one")
    )


def temperature_resample_sql(
    src_sql: str,
    group_cols: Sequence[str],
    alpha: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "temp:",
) -> str:
    """DuckDB replay of :func:`temperature_resample` over ``src_sql``."""
    from sketches_go_spark.functions.expressions import (
        portable_hash64_sql_duckdb,
    )

    gcols = ", ".join(group_cols)
    h = portable_hash64_sql_duckdb(f"d.{id_col}", salt)
    return f"""WITH sgs_tr_cnt AS (
  SELECT {gcols}, count(*) AS n FROM ({src_sql}) GROUP BY {gcols}
),
sgs_tr_sc AS (
  SELECT {gcols}, n,
         cast(floor({_alpha_score_sql('n', alpha)} * {float(1 << TEMP_SCALE_BITS)})
              AS bigint) AS s
  FROM sgs_tr_cnt
),
sgs_tr_tot AS (
  SELECT cast(sum(s) AS bigint) AS ts, cast(sum(n) AS bigint) AS tn
  FROM sgs_tr_sc
),
sgs_tr_thr AS (
  SELECT {gcols},
         cast(floor(rate) AS int) AS base,
         cast(floor((rate - floor(rate)) * {SPLIT_BUCKETS}) AS bigint) AS fthr
  FROM (
    SELECT {gcols},
           cast(tn AS double) * cast(s AS double)
           / cast(ts AS double) / cast(n AS double) AS rate
    FROM sgs_tr_sc CROSS JOIN sgs_tr_tot
  )
),
sgs_tr_tagged AS (
  SELECT d.*,
         d.base + CASE WHEN {h} % {SPLIT_BUCKETS} < d.fthr
                       THEN 1 ELSE 0 END AS copies
  FROM (SELECT src.*, t.base, t.fthr
        FROM ({src_sql}) src JOIN sgs_tr_thr t USING ({gcols})) d
)
SELECT * EXCLUDE (base, fthr, copies, copy_idx),
       cast(copy_idx AS int) AS copy_idx
FROM (
  SELECT g.*, u.copy_idx
  FROM sgs_tr_tagged g
  CROSS JOIN LATERAL (
    SELECT unnest(range(g.copies)) AS copy_idx
  ) u
  WHERE g.copies > 0
)"""
