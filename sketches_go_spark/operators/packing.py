"""Sequence packing for LM-training pipelines: lay documents end-to-end into
fixed-capacity token windows ("packs"), the concat-then-chunk strategy every
pretraining data loader needs.

A doc occupies the half-open token interval [start, end) of its shard's
concatenated stream; pack boundaries sit at multiples of ``capacity``; a doc
spans every pack its interval overlaps.  All arithmetic is integer and the
shard streams are independent, so the layout is deterministic under any
partitioning and exactly replayable in SQL.

Scale shape: packing is inherently sequential WITHIN a stream, so the
operator shards the corpus into ``n_shards`` independent streams by portable
hash of the doc id — each shard is one window partition (one shuffle, sort
within shard only), and n_shards is the parallelism knob: at 100 TB set it
to a few x the executor-core count so each stream's cumulative sum fits one
task.  The explode emits ceil(len/capacity)+1 rows per doc at most — bounded
fan-out, no joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from sketches_go_spark.functions.expressions import portable_hash64


def _col(c: str | Column) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str | Column = "n_tokens",
    capacity: int = 2048,
    n_shards: int = 32,
    hash_fn=None,
) -> DataFrame:
    """(doc, shard, pack_id, tokens_in_pack, n_tokens): the pack layout.

    ``pack_id`` is global across shards (shard * ceil-free interleave is
    avoided by namespacing: pack_id = shard * 2^40 + local pack index — 2^40
    packs per shard bounds a shard at ~2^51 tokens at capacity 2048, far
    beyond any single stream).  Zero-token docs are excluded (they occupy no
    window).
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    hash_fn = hash_fn or portable_hash64
    shard = F.pmod(
        hash_fn(_col(id_col).cast("string"), "pk:"), F.lit(n_shards)
    ).cast("int")
    base = df.select(
        _col(id_col).alias(id_col),
        shard.alias("shard"),
        _col(tokens_col).cast("bigint").alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    w = Window.partitionBy("shard").orderBy(id_col)
    end = F.sum("n_tokens").over(w)
    spans = base.select(
        id_col,
        "shard",
        "n_tokens",
        (end - F.col("n_tokens")).alias("_start"),
        end.alias("_end"),
    )
    cap = F.lit(int(capacity))
    first = F.floor(F.col("_start") / cap)
    last = F.floor((F.col("_end") - 1) / cap)
    out = spans.select(
        id_col,
        "shard",
        "n_tokens",
        "_start",
        "_end",
        F.explode(F.sequence(first, last)).alias("_p"),
    )
    return out.select(
        id_col,
        "shard",
        (F.col("shard").cast("bigint") * F.lit(1 << 40) + F.col("_p")).alias(
            "pack_id"
        ),
        (
            F.least(F.col("_end"), (F.col("_p") + 1) * cap)
            - F.greatest(F.col("_start"), F.col("_p") * cap)
        ).alias("tokens_in_pack"),
        "n_tokens",
    )


def pack_sequences_sql(
    src_sql: str,
    id_col: str = "doc_id",
    tokens_expr: str = "n_tokens",
    capacity: int = 2048,
    n_shards: int = 32,
) -> str:
    """DuckDB replay of :func:`pack_sequences` over ``src_sql`` (a SELECT
    yielding at least (id, token-count)) — same portable hash, same window
    frame, same interval arithmetic."""
    h = f"concat('pk:', cast({id_col} as string))"
    shard = (
        f"cast(cast(concat('0x', substr(md5({h}), 1, 15)) as bigint)"
        f" % {n_shards} AS int)"
    )
    return f"""WITH sgs_base AS (
  SELECT {id_col}, {shard} AS shard, cast({tokens_expr} AS bigint) AS n_tokens
  FROM ({src_sql}) WHERE cast({tokens_expr} AS bigint) > 0
),
sgs_span AS (
  -- DuckDB sum(bigint) returns HUGEINT; cast back so output types match
  -- Spark's bigint schema
  SELECT {id_col}, shard, n_tokens,
         cast(sum(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col})
           - n_tokens AS bigint) AS s_start,
         cast(sum(n_tokens) OVER (PARTITION BY shard ORDER BY {id_col}) AS bigint) AS s_end
  FROM sgs_base
)
SELECT {id_col}, shard,
       cast(cast(shard AS bigint) * {1 << 40} + p.p AS bigint) AS pack_id,
       cast(least(s_end, (p.p + 1) * {capacity})
         - greatest(s_start, p.p * {capacity}) AS bigint) AS tokens_in_pack,
       n_tokens
FROM sgs_span
CROSS JOIN LATERAL (
  SELECT unnest(generate_series(
    cast(floor(s_start / {capacity}) AS bigint),
    cast(floor((s_end - 1) / {capacity}) AS bigint))) AS p
) p"""


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """(doc, chunk_idx, start_tok, n_tok, chunk_text): overlapping
    fixed-size token windows per document — the retrieval/RAG chunking op
    (the intra-document complement of :func:`pack_sequences`).  Windows
    start every ``stride`` tokens; the final window is the remainder (no
    padding); overlap = chunk_tokens - stride.

    Pure per-row Catalyst: tokenize once with split, emit window starts
    with sequence, slice + rejoin per window — zero shuffles, the whole
    chunker runs inside the scan's codegen and fans out
    ~n_tokens/stride rows per doc.

    Coverage rule: starts are 1, 1+stride, ... bounded by
    ``min(max(n - chunk, 0) + stride, n)`` — the first start at-or-past
    ``n - chunk + 1`` is the last window, so every token lands in at least
    one chunk when ``stride <= chunk_tokens``, the tail window is the
    remainder (no padding), and no fully-redundant trailing window is
    emitted."""
    if chunk_tokens <= 0 or stride <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.lower(F.trim(_col(text_col))), " ")
    # split("") returns [""], so size(_t) > 0 alone never skips empty docs;
    # gate on trimmed text length (mirrored in chunk_documents_sql).
    d = df.where(F.length(F.trim(_col(text_col))) > 0).select(
        _col(id_col).alias(id_col), toks.alias("_t")
    )
    n = F.size("_t")
    bound = F.least(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) + F.lit(stride), n
    )
    starts = F.sequence(F.lit(1), bound, F.lit(stride))
    d = d.select(
        id_col, "_t", F.posexplode(starts).alias("chunk_idx", "_start")
    )
    piece = F.slice(F.col("_t"), F.col("_start"), F.lit(chunk_tokens))
    return d.select(
        id_col,
        "chunk_idx",
        (F.col("_start") - 1).alias("start_tok"),
        F.size(piece).alias("n_tok"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_documents_sql(
    src: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> str:
    """DuckDB replay of :func:`chunk_documents` (same tokenization, same
    window grid, same remainder semantics)."""
    return f"""WITH sgs_tok AS (
  SELECT {id_col}, string_split(lower(trim({text_col})), ' ') AS t
  FROM {src}
  WHERE len(trim({text_col})) > 0
),
sgs_starts AS (
  SELECT {id_col}, t,
         u.s AS start_1b,
         cast(row_number() OVER (PARTITION BY {id_col} ORDER BY u.s) - 1
              AS int) AS chunk_idx
  FROM sgs_tok
  CROSS JOIN LATERAL (
    SELECT unnest(range(1,
      least(greatest(len(t) - {chunk_tokens}, 0) + {stride}, len(t)) + 1,
      {stride})) AS s
  ) u
  WHERE len(t) > 0
)
SELECT {id_col}, chunk_idx,
       cast(start_1b - 1 AS int) AS start_tok,
       cast(len(list_slice(t, start_1b, start_1b + {chunk_tokens} - 1))
            AS int) AS n_tok,
       array_to_string(list_slice(t, start_1b, start_1b + {chunk_tokens} - 1),
                       ' ') AS chunk_text
FROM sgs_starts"""
