"""Transcript assembly: turns -> training examples.

The last mile of a conversation-data pipeline: collapse each multi-turn
transcript (conv_id, turn_idx, role, text, tool, ts) into ONE training
example — the role-tagged rendered conversation string plus the example-level
features every SFT data loader filters and buckets on (turn count, tool-call
count, wall-clock duration, rendered length).

Rendering rule (deterministic, pure function of the sorted turns):

    <|role|>text            for turns without a tool
    <|role:tool|>text       for tool turns

joined by a single newline, turns ordered by ``turn_idx``.

Scale shape: ONE shuffle keyed by conv_id (the aggregation); per-group state
is one conversation — bounded by the longest transcript, not the corpus — so
1000 executors each assemble their hash range independently.  The sort that
fixes turn order runs INSIDE each group's collected array (``array_sort`` on
the turn struct, turn_idx leading and unique within a conversation), never as
a global exchange.  Rendered-text skew mirrors conversation-length skew;
``max_turns`` caps the pathological mega-conversation (head-truncate, the
standard SFT rule) so no single group's render exceeds a known bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sketches_go_spark.functions.expressions import (
    portable_hash64,
    portable_hash64_sql_duckdb,
)


def _render(t: Column) -> Column:
    # concat is null-propagating on Spark (NULL tool would null the whole
    # render) and null-skipping on DuckDB — coalesce the tool suffix to ''
    # explicitly so both engines agree byte-for-byte.
    tool_sfx = F.coalesce(F.concat(F.lit(":"), t["tool"]), F.lit(""))
    return F.concat(
        F.lit("<|"), t["role"], tool_sfx, F.lit("|>"), F.coalesce(t["text"], F.lit(""))
    )


def assemble_conversations(
    df: DataFrame,
    max_turns: int | None = None,
) -> DataFrame:
    """(conv_id, n_turns, n_tool_turns, duration_us, sft_chars, sft_text).

    ``n_turns`` counts the turns RENDERED (post-cap); ``n_tool_turns`` and
    ``duration_us`` describe the full conversation (they are cheap monoid
    aggregates and the cap is a render-size guard, not a data filter).
    """
    if max_turns is not None and max_turns <= 0:
        raise ValueError("max_turns must be positive when given")
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    grouped = df.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "text", "tool"))
        ).alias("_turns"),
        F.count("tool").alias("n_tool_turns"),
        (F.max(tsu) - F.min(tsu)).alias("duration_us"),
    )
    turns = F.col("_turns")
    if max_turns is not None:
        turns = F.slice(turns, 1, max_turns)
    sft = F.array_join(F.transform(turns, _render), "\n")
    return grouped.select(
        "conv_id",
        F.size(turns).alias("n_turns"),
        "n_tool_turns",
        "duration_us",
        F.length(sft).alias("sft_chars"),
        sft.alias("sft_text"),
    )


_TURN_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def plant_neardup_conversations(
    df: DataFrame,
    every: int = 5,
    salt: str = "convdup:",
) -> DataFrame:
    """Test-fixture planter: union the transcripts with a near-duplicate
    clone of every hash-picked conversation (``conv_id || '~dup'``, final
    turn dropped) so conversation-level near-dup detection has known
    positives in a synthetic corpus that contains none.

    Hash-picked (portable 60-bit hash % ``every``), never RNG — the DuckDB
    oracle replays the exact same planted set.  The max-turn join shuffles
    on conv_id only (one bigint per conversation), same key as the assembly
    aggregation that always follows.
    """
    if every <= 0:
        raise ValueError("every must be positive")
    base = df.select(*_TURN_COLS)
    mx = base.groupBy("conv_id").agg(F.max("turn_idx").alias("_mx"))
    clones = (
        base.join(mx, "conv_id")
        .where(
            (portable_hash64(F.col("conv_id"), salt) % every == 0)
            & (F.col("turn_idx") < F.col("_mx"))
        )
        .select(
            F.concat("conv_id", F.lit("~dup")).alias("conv_id"),
            *_TURN_COLS[1:],
        )
    )
    return base.unionByName(clones)


def plant_neardup_conversations_sql(
    transcripts_sql: str,
    every: int = 5,
    salt: str = "convdup:",
) -> str:
    """DuckDB replay of :func:`plant_neardup_conversations` (same hash pick,
    same clone rule) — returns a transcripts-shaped SELECT."""
    pick = portable_hash64_sql_duckdb("t.conv_id", salt)
    return f"""SELECT conv_id, turn_idx, role, text, tool, ts FROM ({transcripts_sql})
UNION ALL
SELECT concat(t.conv_id, '~dup') AS conv_id, t.turn_idx, t.role, t.text, t.tool, t.ts
FROM ({transcripts_sql}) t
JOIN (SELECT conv_id, max(turn_idx) AS mx FROM ({transcripts_sql}) GROUP BY conv_id) m
  USING (conv_id)
WHERE {pick} % {int(every)} = 0 AND t.turn_idx < m.mx"""


def assemble_conversations_sql(
    transcripts_sql: str,
    max_turns: int | None = None,
) -> str:
    """DuckDB replay of :func:`assemble_conversations` over a transcripts
    SELECT (same render rule, same newline join, same cap semantics)."""
    cap_pred = "" if max_turns is None else f"WHERE rn <= {int(max_turns)}"
    return f"""WITH sga_t AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM ({transcripts_sql})
),
sga_full AS (
  SELECT conv_id,
         cast(count(tool) AS bigint) AS n_tool_turns,
         cast(max(epoch_us(ts)) - min(epoch_us(ts)) AS bigint) AS duration_us
  FROM sga_t GROUP BY conv_id
),
sga_render AS (
  SELECT conv_id,
         cast(count(*) AS int) AS n_turns,
         string_agg(
           concat('<|', role,
                  CASE WHEN tool IS NOT NULL THEN concat(':', tool) ELSE '' END,
                  '|>', coalesce(text, '')),
           chr(10) ORDER BY turn_idx) AS sft_text
  FROM sga_t {cap_pred} GROUP BY conv_id
)
SELECT r.conv_id, r.n_turns, f.n_tool_turns, f.duration_us,
       cast(length(r.sft_text) AS int) AS sft_chars, r.sft_text
FROM sga_render r JOIN sga_full f USING (conv_id)"""
