"""DuckDB oracle-SQL generators.

For every sketch operator the library implements, these functions emit an
ANSI-SQL (DuckDB-dialect) query computing the IDENTICAL algorithm over the
same parquet tables.  Because both engines execute the same deterministic
arithmetic (same literals, same operation order, window cumsums over the same
total order, integer counts), results match value-for-value — estimates are
rounded to 6 decimals on both sides to absorb the last-ulp libm differences.

This is the strongest possible correctness gate for an approximate-query
engine: the oracle is not "the exact answer" (which an approximation can't
hash-match) but an independent re-execution of the algorithm's definition in
a different engine.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from sketches_go_spark.core.ddsketch import (
    COLLAPSE_LOWEST,
    COLLAPSE_NONE,
    DDSketchConfig,
)


def _lit(x: float) -> str:
    """Full-precision float literal: shortest repr round-trips to the same
    IEEE double in any correct parser."""
    return repr(float(x))


def _keys_csv(keys: Sequence[str]) -> str:
    return ", ".join(keys)


# ------------------------------------------------------------- mapping SQL
def _exact_exponent_sql(v: str) -> str:
    """Exact IEEE exponent of a positive double in SQL: floor(log2(v))
    corrected by comparing against the exact power 2**e0 (log2 alone is only
    faithfully rounded, so it can be off by one at powers of two).  The SQL
    twin of functions.expressions.exact_frexp."""
    e0 = f"floor(log2({v}))"
    p0 = f"power(2.0, {e0})"
    return (
        f"({e0} + (CASE WHEN {v} >= 2.0 * {p0} THEN 1.0 "
        f"WHEN {v} < {p0} THEN -1.0 ELSE 0.0 END))"
    )


def index_sql(mapping, v: str) -> str:
    """Scalar SQL expression for the mapping's raw (un-floored) index of a
    positive value expression ``v``.  Same IEEE operation order as both the
    numpy core and the Catalyst twin, so for the interpolated mappings the
    floored result is bit-identical across all three engines; for the log
    mapping the last-ulp libm difference at bucket edges is absorbed by the
    alpha contract."""
    mult, off = _lit(mapping.multiplier), _lit(mapping.index_offset)
    kind = type(mapping).__name__
    if kind == "LogarithmicMapping":
        approx = f"ln({v})"
    elif kind == "LinearlyInterpolatedMapping":
        e = _exact_exponent_sql(v)
        s = f"({v} / power(2.0, {e}))"
        approx = f"(({e} + {s}) - 1.0)"
    elif kind == "CubicallyInterpolatedMapping":
        from sketches_go_spark.core.mapping import _A, _B, _C

        e = _exact_exponent_sql(v)
        s1 = f"(({v} / power(2.0, {e})) - 1.0)"
        approx = (
            f"(((({_lit(_A)} * {s1} + {_lit(_B)}) * {s1} + {_lit(_C)}) * {s1}) + {e})"
        )
    else:
        raise NotImplementedError(f"no oracle SQL for mapping {kind}")
    return f"({approx} * {mult} + {off})"


def bucket_index_sql(mapping, v: str) -> str:
    return f"cast(floor({index_sql(mapping, v)}) AS int)"


def lower_bound_sql(mapping, bucket: str) -> str:
    """Scalar SQL for mapping.lower_bound(bucket) — inverse of index_sql."""
    mult, off = _lit(mapping.multiplier), _lit(mapping.index_offset)
    x = f"(({bucket} - {off}) / {mult})"
    kind = type(mapping).__name__
    if kind == "LogarithmicMapping":
        return f"exp({x})"
    if kind == "LinearlyInterpolatedMapping":
        e = f"floor({x})"
        spo = f"({x} - {e} + 1.0)"
        return f"({spo} * power(2.0, {e}))"
    if kind == "CubicallyInterpolatedMapping":
        from sketches_go_spark.functions.expressions import (
            _D0,
            _K_3A,
            _K_4D03,
            _K_D1_CONST,
            _K_D1_FRAC,
        )
        from sketches_go_spark.core.mapping import _B

        e = f"floor({x})"
        frac = f"({x} - {e})"
        d1 = f"({_lit(_K_D1_CONST)} - {_lit(_K_D1_FRAC)} * {frac})"
        p = f"cbrt(({d1} - sqrt({d1} * {d1} - {_lit(_K_4D03)})) / 2.0)"
        spo = (
            f"((-(({_lit(_B)} + {p}) + {_lit(_D0)} / {p})) / {_lit(_K_3A)} + 1.0)"
        )
        return f"({spo} * power(2.0, {e}))"
    raise NotImplementedError(f"no oracle SQL for mapping {kind}")


def bucket_value_sql(mapping, bucket: str) -> str:
    """Representative bucket value: lower_bound * (1 + alpha)."""
    factor = _lit(1.0 + mapping.relative_accuracy())
    return f"({lower_bound_sql(mapping, bucket)} * {factor})"


def ddsketch_bins_sql(
    measure_sql: str,
    keys: Sequence[str],
    config: DDSketchConfig | None = None,
    weight_expr: str | None = None,
) -> str:
    """CTE chain producing (keys..., sign, bucket, count) from a measure
    relation ``measure_sql`` (must yield columns keys... and ``v``).

    Mirrors functions.ddsketch_fns.build_bins (incl. the relational collapse).
    """
    config = config or DDSketchConfig()
    m = config.mapping()
    k = _keys_csv(keys)
    min_i, max_i = _lit(m.min_indexable), _lit(m.max_indexable)
    w = weight_expr or "1.0"
    sql = f"""
sgs_measures AS ({measure_sql}),
sgs_routed AS (
  SELECT {k},
         CASE WHEN v > {min_i} THEN 1 WHEN v < -{min_i} THEN -1 ELSE 0 END AS sign,
         CASE WHEN v > {min_i} THEN {bucket_index_sql(m, "v")}
              WHEN v < -{min_i} THEN {bucket_index_sql(m, "(-v)")}
              ELSE 0 END AS bucket,
         cast({w} AS double) AS wgt
  FROM sgs_measures
  WHERE v IS NOT NULL AND NOT isnan(v) AND v <= {max_i} AND v >= -{max_i}
),
sgs_bins_raw AS (
  SELECT {k}, sign, bucket, cast(sum(wgt) AS double) AS count
  FROM sgs_routed GROUP BY {k}, sign, bucket
)"""
    if config.collapse == COLLAPSE_NONE or config.max_bins <= 0:
        return sql + ",\nsgs_bins AS (SELECT * FROM sgs_bins_raw)"
    mb = config.max_bins
    if config.collapse == COLLAPSE_LOWEST:
        clamp = (
            f"CASE WHEN sign != 0 THEN greatest(bucket, "
            f"max(bucket) OVER (PARTITION BY {k}, sign) - {mb} + 1) ELSE bucket END"
        )
    else:
        clamp = (
            f"CASE WHEN sign != 0 THEN least(bucket, "
            f"min(bucket) OVER (PARTITION BY {k}, sign) + {mb} - 1) ELSE bucket END"
        )
    return sql + f""",
sgs_clamped AS (SELECT {k}, sign, {clamp} AS bucket, count FROM sgs_bins_raw),
sgs_bins AS (
  SELECT {k}, sign, bucket, cast(sum(count) AS double) AS count
  FROM sgs_clamped GROUP BY {k}, sign, bucket
)"""


def ddsketch_quantiles_sql(
    measure_sql: str,
    keys: Sequence[str],
    quantiles: Iterable[float],
    config: DDSketchConfig | None = None,
    weight_expr: str | None = None,
    pivot: dict[str, float] | None = None,
    order_by: str | None = None,
) -> str:
    """Full oracle query mirroring ddsketch_fns.quantiles_from_bins.

    Long output (keys..., q, est) by default; pass ``pivot`` as
    {column_name: q} (plus an implicit exact-ish count) for the wide shape.
    """
    config = config or DDSketchConfig()
    m = config.mapping()
    k = _keys_csv(keys)
    qlist = ", ".join(_lit(q) for q in quantiles)
    bins_cte = ddsketch_bins_sql(measure_sql, keys, config, weight_expr)
    neg_val = bucket_value_sql(m, "coalesce(neg_key, max_neg_bucket)")
    pos_val = bucket_value_sql(m, "coalesce(pos_key, max_pos_bucket)")

    body = f"""WITH {bins_cte},
sgs_cum AS (
  SELECT *, sum(count) OVER (
    PARTITION BY {k}, sign ORDER BY bucket
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM sgs_bins
),
sgs_totals AS (
  SELECT {k},
         coalesce(sum(CASE WHEN sign = -1 THEN count END), 0.0) AS neg_total,
         coalesce(sum(CASE WHEN sign = 0 THEN count END), 0.0) AS zero_count,
         sum(count) AS total,
         max(CASE WHEN sign = 1 THEN bucket END) AS max_pos_bucket,
         max(CASE WHEN sign = -1 THEN bucket END) AS max_neg_bucket
  FROM sgs_bins GROUP BY {k}
),
sgs_qs AS (SELECT unnest([{qlist}]) AS q),
sgs_j AS (
  SELECT c.*, t.neg_total, t.zero_count, t.total, t.max_pos_bucket,
         t.max_neg_bucket, sgs_qs.q
  FROM sgs_cum c JOIN sgs_totals t USING ({k}) CROSS JOIN sgs_qs
),
sgs_picked AS (
  SELECT {k}, q, neg_total, zero_count, total, max_pos_bucket, max_neg_bucket,
         min(CASE WHEN sign = 1
                  AND cum > greatest(q * (total - 1) - zero_count - neg_total, 0.0)
             THEN bucket END) AS pos_key,
         min(CASE WHEN sign = -1
                  AND cum > greatest(neg_total - 1 - q * (total - 1), 0.0)
             THEN bucket END) AS neg_key
  FROM sgs_j
  GROUP BY {k}, q, neg_total, zero_count, total, max_pos_bucket, max_neg_bucket
),
sgs_est AS (
  SELECT {k}, q,
         round(CASE
           WHEN q * (total - 1) < neg_total THEN -{neg_val}
           WHEN q * (total - 1) < neg_total + zero_count THEN 0.0
           ELSE {pos_val}
         END, 6) AS est,
         total
  FROM sgs_picked
)"""
    if pivot is None:
        sql = body + f"\nSELECT {k}, q, est FROM sgs_est"
        if order_by:
            sql += f" ORDER BY {order_by}"
        return sql
    cols = ", ".join(
        f"max(CASE WHEN q = {_lit(q)} THEN est END) AS {name}"
        for name, q in pivot.items()
    )
    sql = body + f"""
SELECT {k}, any_value(total) AS cnt, {cols} FROM sgs_est GROUP BY {k}"""
    if order_by:
        sql += f" ORDER BY {order_by}"
    return sql


def ddsketch_summary_sql(
    measure_sql: str,
    keys: Sequence[str],
    config: DDSketchConfig | None = None,
) -> str:
    """Oracle for summary_from_bins: count / approximate sum / min / max."""
    config = config or DDSketchConfig()
    m = config.mapping()
    k = _keys_csv(keys)
    bins_cte = ddsketch_bins_sql(measure_sql, keys, config)
    val = bucket_value_sql(m, "bucket")
    max_neg = bucket_value_sql(m, "max(CASE WHEN sign = -1 THEN bucket END)")
    min_pos = bucket_value_sql(m, "min(CASE WHEN sign = 1 THEN bucket END)")
    max_pos = bucket_value_sql(m, "max(CASE WHEN sign = 1 THEN bucket END)")
    min_neg = bucket_value_sql(m, "min(CASE WHEN sign = -1 THEN bucket END)")
    return f"""WITH {bins_cte}
SELECT {k},
       sum(count) AS count,
       round(sum((CASE WHEN sign = 1 THEN {val}
                       WHEN sign = -1 THEN -{val}
                       ELSE 0.0 END) * count), 6) AS sum_approx,
       round(coalesce(-{max_neg},
                      CASE WHEN sum(CASE WHEN sign = 0 THEN count END) > 0 THEN 0.0 END,
                      {min_pos}),
             6) AS min_approx,
       round(coalesce({max_pos},
                      CASE WHEN sum(CASE WHEN sign = 0 THEN count END) > 0 THEN 0.0 END,
                      -{min_neg}),
             6) AS max_approx
FROM sgs_bins GROUP BY {k}"""


# =====================================================================
# companion-sketch oracles (HLL / CMS / Bloom) — exact hash replay
# =====================================================================
def _hash_sql(expr: str, salt: str = "") -> str:
    inner = f"concat('{salt}', cast({expr} as string))"
    return f"cast(concat('0x', substr(md5({inner}), 1, 15)) as bigint)"


_HASH_BITS = 60


def hll_registers_sql(src_sql: str, keys, p: int = 12) -> str:
    """(keys..., reg, rho) register relation — mirrors
    sketch_fns.hll_registers.  ``src_sql`` must yield keys... and ``item``."""
    k = _keys_csv(keys)
    kc = f"{k}, " if k else ""
    m = 1 << p
    maxrho = _HASH_BITS - p + 1
    return f"""WITH sgs_src AS ({src_sql}),
sgs_h AS (
  SELECT {kc}cast(h % {m} AS int) AS reg,
         cast({maxrho} - (CASE WHEN (h >> {p}) = 0 THEN 0
                               ELSE length(bin(h >> {p})) END) AS int) AS rho
  FROM (SELECT {kc}{_hash_sql('item')} AS h FROM sgs_src WHERE item IS NOT NULL)
),
sgs_regs AS (
  SELECT {kc}reg, cast(max(rho) AS int) AS rho FROM sgs_h GROUP BY {kc}reg
)
SELECT * FROM sgs_regs"""


def hll_estimate_sql(src_sql: str, keys, p: int = 12, est_decimals: int = 4) -> str:
    """(keys..., est) — mirrors sketch_fns.hll_estimate_relational (same
    alpha*m^2 literal, same linear-counting branch)."""
    from sketches_go_spark.core.hll import hll_alpha

    k = _keys_csv(keys)
    kc = f"{k}, " if k else ""
    m = 1 << p
    amm = _lit(hll_alpha(m) * m * m)
    regs = hll_registers_sql(src_sql, keys, p)
    return f"""WITH sgs_all AS ({regs})
SELECT {kc}round(CASE WHEN raw <= {_lit(2.5 * m)} AND v > 0
                 THEN {m} * ln({m} / v) ELSE raw END, {est_decimals}) AS est
FROM (
  SELECT {kc}{amm} / (sum(power(2.0, -rho)) + ({m} - count(*))) AS raw,
         {m} - count(*) AS v
  FROM sgs_all GROUP BY {k if k else "1=1"}
)"""


def _union_hash_rows(src: str, item_expr: str, n: int, salt_prefix: str, mod: int,
                     extra_cols: str = "") -> str:
    """UNION ALL of n hash branches: (extra_cols..., row, col)."""
    ec = f"{extra_cols}, " if extra_cols else ""
    branches = [
        f"SELECT {ec}{j} AS row, "
        f"cast({_hash_sql(item_expr, f'{salt_prefix}{j}:')} % {mod} AS int) AS col "
        f"FROM {src}"
        for j in range(n)
    ]
    return "\nUNION ALL\n".join(branches)


def cms_estimate_sql(
    src_sql: str, depth: int = 4, width: int = 512, est_decimals: int = 1
) -> str:
    """(item, est_cnt, true_cnt) for every distinct item — mirrors
    sketch_fns.cms_counters + cms_estimate.  ``src_sql`` must yield ``item``."""
    return f"""WITH sgs_src AS ({src_sql}),
sgs_exploded AS ({_union_hash_rows('sgs_src', 'item', depth, 'cms', width)}),
sgs_counters AS (
  SELECT row, col, cast(count(*) AS double) AS cnt
  FROM sgs_exploded GROUP BY row, col
),
sgs_items AS (SELECT DISTINCT item FROM sgs_src),
sgs_probe AS ({_union_hash_rows('sgs_items', 'item', depth, 'cms', width,
                                extra_cols='item')}),
sgs_est AS (
  SELECT p.item, min(coalesce(c.cnt, 0.0)) AS est_cnt
  FROM sgs_probe p LEFT JOIN sgs_counters c ON p.row = c.row AND p.col = c.col
  GROUP BY p.item
),
sgs_true AS (SELECT item, cast(count(*) AS bigint) AS true_cnt FROM sgs_src GROUP BY item)
SELECT e.item, e.est_cnt, t.true_cnt
FROM sgs_est e JOIN sgs_true t USING (item)"""


def cms_counters_sql(
    src_sql: str, keys: Sequence[str], depth: int = 4, width: int = 512
) -> str:
    """(keys..., row, col, cnt) counter relation per group — mirrors
    streaming.stream_agg.streaming_cms_counters (the counters are a
    SUM-monoid, so the streaming result equals this batch replay exactly).
    ``src_sql`` must yield keys... and ``item``."""
    k = _keys_csv(keys)
    kc = f"{k}, " if k else ""
    return f"""WITH sgs_src AS (
  SELECT * FROM ({src_sql}) WHERE item IS NOT NULL
),
sgs_exploded AS ({_union_hash_rows('sgs_src', 'item', depth, 'cms', width,
                                   extra_cols=k)})
SELECT {kc}row, col, cast(count(*) AS double) AS cnt
FROM sgs_exploded GROUP BY {kc}row, col"""


def bloom_probe_sql(
    build_sql: str, probe_items: list[str], m_bits: int = 4096, k: int = 5
) -> str:
    """(item, might_contain) for the literal probe list — mirrors
    sketch_fns.bloom_bits + bloom_probe.  ``build_sql`` must yield ``item``."""
    probes = ", ".join("'" + it.replace("'", "''") + "'" for it in probe_items)
    return f"""WITH sgs_build AS ({build_sql}),
sgs_bits AS (
  SELECT DISTINCT col AS pos
  FROM ({_union_hash_rows('sgs_build', 'item', k, 'bloom', m_bits)})
),
sgs_probes AS (SELECT unnest([{probes}]) AS item),
sgs_ppos AS ({_union_hash_rows('sgs_probes', 'item', k, 'bloom', m_bits,
                               extra_cols='item')})
SELECT p.item, count(b.pos) = {k} AS might_contain
FROM sgs_ppos p LEFT JOIN sgs_bits b ON p.col = b.pos
GROUP BY p.item"""


def ddsketch_rollup_sql(
    measure_sql: str,
    fine_keys: Sequence[str],
    coarse_keys: Sequence[str],
    config: DDSketchConfig | None = None,
) -> str:
    """Oracle for rollup_bins: coarse bins == bins built directly at the
    coarse granularity (mergeability makes them identical)."""
    bins_cte = ddsketch_bins_sql(measure_sql, fine_keys, config)
    ck = _keys_csv(coarse_keys)
    return f"""WITH {bins_cte}
SELECT {ck}, sign, bucket, cast(sum(count) AS double) AS cnt
FROM sgs_bins GROUP BY {ck}, sign, bucket"""


def ddsketch_reweight_sql(
    measure_sql: str,
    keys: Sequence[str],
    w: float,
    config: DDSketchConfig | None = None,
) -> str:
    bins_cte = ddsketch_bins_sql(measure_sql, keys, config)
    k = _keys_csv(keys)
    return f"""WITH {bins_cte}
SELECT {k}, sign, bucket, count * {_lit(w)} AS cnt FROM sgs_bins"""


def ddsketch_change_mapping_sql(
    measure_sql: str,
    keys: Sequence[str],
    old_config: DDSketchConfig,
    new_config: DDSketchConfig,
    scale_factor: float = 1.0,
    count_decimals: int = 6,
) -> str:
    """Oracle for change_mapping_bins: proportional-overlap re-bucketing
    (ChangeMapping, ddsketch.go:483-510) replayed in SQL."""
    mo = old_config.mapping()
    mn = new_config.mapping()
    k = _keys_csv(keys)
    s = _lit(scale_factor)
    moff, mmult = _lit(mo.index_offset), _lit(mo.multiplier)
    noff, nmult = _lit(mn.index_offset), _lit(mn.multiplier)
    bins_cte = ddsketch_bins_sql(measure_sql, keys, old_config)
    nb_lo = f"exp((bucket - {noff}) / {nmult})"
    nb_hi = f"exp((bucket + 1 - {noff}) / {nmult})"
    ov = f"(least({nb_hi}, hi) - greatest({nb_lo}, lo))"
    return f"""WITH {bins_cte},
sgs_nz AS (
  SELECT {k}, sign, count,
         exp((bucket - {moff}) / {mmult}) * {s} AS lo,
         exp((bucket + 1 - {moff}) / {mmult}) * {s} AS hi
  FROM sgs_bins WHERE sign != 0
),
sgs_fan AS (
  SELECT {k}, sign, count, lo, hi,
         unnest(range(cast(floor(ln(lo) * {nmult} + {noff}) AS int),
                      cast(floor(ln(hi) * {nmult} + {noff}) AS int) + 1)) AS bucket
  FROM sgs_nz
),
sgs_split AS (
  SELECT {k}, sign, bucket, count * {ov} / (hi - lo) AS cnt
  FROM sgs_fan WHERE {ov} > 0
),
sgs_zero AS (SELECT {k}, sign, bucket, count AS cnt FROM sgs_bins WHERE sign = 0)
SELECT {k}, sign, bucket, round(sum(cnt), {count_decimals}) AS cnt
FROM (SELECT * FROM sgs_split UNION ALL SELECT * FROM sgs_zero)
GROUP BY {k}, sign, bucket"""


def cms_heavy_hitters_sql(
    src_sql: str,
    keys,
    k: int = 10,
    depth: int = 4,
    width: int = 512,
) -> str:
    """(keys..., rank, item, est_cnt) top-k per group by CMS estimate —
    mirrors sketch_fns.cms_heavy_hitters.  ``src_sql`` must yield keys...
    and ``item``."""
    kcsv = _keys_csv(keys)
    kc = f"{kcsv}, " if kcsv else ""
    part = f"PARTITION BY {kcsv} " if kcsv else ""
    return f"""WITH sgs_src AS ({src_sql}),
sgs_exploded AS ({_union_hash_rows('sgs_src', 'item', depth, 'cms', width,
                                   extra_cols=kcsv)}),
sgs_counters AS (
  SELECT {kc}row, col, cast(count(*) AS double) AS cnt
  FROM sgs_exploded GROUP BY {kc}row, col
),
sgs_items AS (SELECT DISTINCT {kc}item FROM sgs_src),
sgs_probe AS ({_union_hash_rows('sgs_items', 'item', depth, 'cms', width,
                                extra_cols=(kc + 'item'))}),
sgs_est AS (
  SELECT {'p.' + ', p.'.join(keys) + ',' if keys else ''} p.item,
         min(coalesce(c.cnt, 0.0)) AS est_cnt
  FROM sgs_probe p LEFT JOIN sgs_counters c
    ON p.row = c.row AND p.col = c.col
       {' '.join(f'AND p.{kk} = c.{kk}' for kk in keys)}
  GROUP BY {'p.' + ', p.'.join(keys) + ',' if keys else ''} p.item
),
sgs_ranked AS (
  SELECT {kc}item, est_cnt,
         cast(row_number() OVER ({part}ORDER BY est_cnt DESC, item ASC) AS int) AS rank
  FROM sgs_est
)
SELECT {kc}rank, item, est_cnt FROM sgs_ranked WHERE rank <= {k}"""


def kmv_overlap_sql(
    src_sql: str, key: str, k: int = 128, est_decimals: int = 4
) -> str:
    """Pairwise KMV set-overlap estimates — mirrors sketch_fns.kmv_sketch +
    kmv_pairwise_overlap (same hash, same rank cut, same float op order:
    per-group est is ((k-1)*S)/kth, pairwise uses (k-1)*(S/kth))."""
    S = _lit(float(1 << _HASH_BITS))
    km1 = _lit(float(k - 1))
    d = est_decimals
    return f"""WITH sgs_src AS ({src_sql}),
sgs_hv AS (
  SELECT DISTINCT {key} AS g, {_hash_sql('item')} AS hv
  FROM sgs_src WHERE item IS NOT NULL
),
sgs_sk AS (
  SELECT g, hv FROM (
    SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv ASC) AS rn
    FROM sgs_hv
  ) WHERE rn <= {k}
),
sgs_names AS (SELECT DISTINCT g FROM sgs_sk),
sgs_pairs AS (
  SELECT a.g AS ka, b.g AS kb FROM sgs_names a JOIN sgs_names b ON a.g < b.g
),
sgs_u AS (
  SELECT ka, kb, hv, max(ia) AS ia, max(ib) AS ib FROM (
    SELECT p.ka, p.kb, s.hv, 1 AS ia, 0 AS ib
    FROM sgs_pairs p JOIN sgs_sk s ON s.g = p.ka
    UNION ALL
    SELECT p.ka, p.kb, s.hv, 0 AS ia, 1 AS ib
    FROM sgs_pairs p JOIN sgs_sk s ON s.g = p.kb
  ) GROUP BY ka, kb, hv
),
sgs_kept AS (
  SELECT * FROM (
    SELECT ka, kb, hv, ia, ib,
           row_number() OVER (PARTITION BY ka, kb ORDER BY hv ASC) AS rn
    FROM sgs_u
  ) WHERE rn <= {k}
),
sgs_agg AS (
  SELECT ka, kb, count(*) AS n, max(hv) AS kth, sum(ia * ib) AS c
  FROM sgs_kept GROUP BY ka, kb
),
sgs_est AS (
  SELECT g, round(CASE WHEN count(*) < {k} THEN cast(count(*) AS double)
                       ELSE ({km1} * {S}) / cast(max(hv) AS double) END,
                  {d}) AS est
  FROM sgs_sk GROUP BY g
)
SELECT ka AS key_a, kb AS key_b, ea.est AS est_a, eb.est AS est_b,
  round(CASE WHEN n >= {k} THEN {km1} * ({S} / cast(kth AS double))
             ELSE cast(n AS double) END, {d}) AS est_union,
  round(least(
    CASE WHEN n >= {k} THEN cast(c AS double) * ({S} / cast(kth AS double))
         ELSE cast(c AS double) END,
    CASE WHEN n >= {k} THEN {km1} * ({S} / cast(kth AS double))
         ELSE cast(n AS double) END), {d}) AS est_intersection,
  round(cast(c AS double) / cast(least({k}, n) AS double), {d}) AS jaccard_est
FROM sgs_agg
JOIN sgs_est ea ON ea.g = ka
JOIN sgs_est eb ON eb.g = kb
ORDER BY key_a, key_b"""


def ddsketch_quantile_rank_sql(
    measure_sql: str,
    keys: Sequence[str],
    passthrough: Sequence[str],
    config: DDSketchConfig | None = None,
    out_col: str = "qrank",
) -> str:
    """Oracle for functions.ddsketch_fns.with_quantile_rank: the measure
    relation must yield columns ``passthrough... keys... v``; every surviving
    row comes back with its group's cumulative-mass estimate at its own
    (sign, bucket), rounded to 6 decimals."""
    config = config or DDSketchConfig()
    m = config.mapping()
    k = _keys_csv(keys)
    p = ", ".join(passthrough)
    min_i, max_i = _lit(m.min_indexable), _lit(m.max_indexable)
    bins_cte = ddsketch_bins_sql(measure_sql, keys, config)
    return f"""WITH {bins_cte},
sgs_qr_cdf AS (
  SELECT {k}, sign AS _sg, bucket AS _bk,
         round(
           sum(count) OVER (PARTITION BY {k}
                            ORDER BY sign, sign * bucket
                            ROWS UNBOUNDED PRECEDING)
           / sum(count) OVER (PARTITION BY {k}), 6) AS {out_col}
  FROM sgs_bins
),
sgs_qr_rows AS (
  SELECT {p}, {k}, v,
         CASE WHEN v > {min_i} THEN 1 WHEN v < -{min_i} THEN -1 ELSE 0 END AS _sg,
         CASE WHEN v > {min_i} THEN {bucket_index_sql(m, "v")}
              WHEN v < -{min_i} THEN {bucket_index_sql(m, "(-v)")}
              ELSE 0 END AS _bk
  FROM sgs_measures
  WHERE v IS NOT NULL AND NOT isnan(v) AND v <= {max_i} AND v >= -{max_i}
)
SELECT {p}, {k}, v, {out_col}
FROM sgs_qr_rows JOIN sgs_qr_cdf USING ({k}, _sg, _bk)"""
