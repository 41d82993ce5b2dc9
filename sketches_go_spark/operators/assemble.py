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
from pyspark.sql.window import Window

from sketches_go_spark.functions.expressions import (
    portable_hash64,
    portable_hash64_sql_duckdb,
)
from sketches_go_spark.operators.text import token_count, token_count_sql


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


_SFT_JSON_FIELDS = (
    "conv_id",
    "n_turns",
    "n_tool_turns",
    "duration_us",
    "sft_chars",
    "sft_text",
)


def sft_jsonl(conv: DataFrame) -> DataFrame:
    """Render assembled examples (:func:`assemble_conversations` output) as
    JSONL — the SFT interchange format data loaders actually consume.
    Returns ``(conv_id, line)``; write with ``df.select("line").write.text``
    (one file per partition, no further shuffle).  Spark's ``to_json`` and
    DuckDB's ``to_json(struct_pack(...))`` agree byte-for-byte on compact
    separators, field order and string escaping (quote/backslash/control
    chars), which is what makes the export oracle-checkable."""
    return conv.select(
        "conv_id",
        F.to_json(F.struct(*_SFT_JSON_FIELDS)).alias("line"),
    )


def sft_jsonl_sql(assembled_sql: str) -> str:
    """DuckDB replay of :func:`sft_jsonl` over an assembled-conversations
    SELECT."""
    pack = ", ".join(f"{f} := {f}" for f in _SFT_JSON_FIELDS)
    return (
        f"SELECT conv_id, to_json(struct_pack({pack}))::varchar AS line "
        f"FROM ({assembled_sql})"
    )


def sft_examples(df: DataFrame, context_turns: int = 8) -> DataFrame:
    """Turn-level training-example extraction — the other SFT last mile:
    every assistant turn becomes one ``(prompt, completion)`` example whose
    prompt is the render of up to ``context_turns`` immediately preceding
    turns (any role, joined by newline) and whose completion is the rendered
    assistant turn itself.  Assistant turns with no preceding context are
    dropped (nothing to condition on).

    Returns ``(conv_id, turn_idx, n_context, prompt_chars, prompt,
    completion)``.

    Scale shape: the SAME single conv_id-keyed exchange as
    :func:`assemble_conversations` (group, in-array sort), then a
    zero-shuffle ``posexplode`` — per-group state stays one conversation.
    Output bytes are inherently ~``context_turns``× the corpus (each turn is
    re-materialized in up to k prompts); ``context_turns`` is the knob, and
    at 100 TB you write this straight to the training store rather than
    re-shuffling it.
    """
    if context_turns <= 0:
        raise ValueError("context_turns must be positive")
    grouped = df.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct("turn_idx", "role", "text", "tool"))
        ).alias("_turns")
    )
    i = F.col("_i")  # 0-based position of the completion turn
    n_ctx = F.least(F.lit(context_turns), i)
    # 1-based slice start of the context window [i - n_ctx, i - 1]
    start = i - n_ctx + F.lit(1)
    prompt = F.array_join(
        F.transform(F.slice(F.col("_turns"), start, n_ctx), _render), "\n"
    )
    t = F.col("_t")
    return (
        grouped.select(
            "conv_id",
            F.col("_turns"),
            F.posexplode("_turns").alias("_i", "_t"),
        )
        .where((t["role"] == "assistant") & (i > 0))
        .select(
            "conv_id",
            t["turn_idx"].alias("turn_idx"),
            n_ctx.cast("int").alias("n_context"),
            F.length(prompt).alias("prompt_chars"),
            prompt.alias("prompt"),
            _render(t).alias("completion"),
        )
    )


def sft_examples_sql(transcripts_sql: str, context_turns: int = 8) -> str:
    """DuckDB replay of :func:`sft_examples` — windowed ``string_agg`` over
    a ``ROWS BETWEEN k PRECEDING AND 1 PRECEDING`` frame (frame order ==
    turn order, verified), same render rule."""
    k = int(context_turns)
    return f"""WITH sgx_t AS (
  SELECT conv_id, turn_idx, role,
         concat('<|', role,
                CASE WHEN tool IS NOT NULL THEN concat(':', tool) ELSE '' END,
                '|>', coalesce(text, '')) AS rt
  FROM ({transcripts_sql})
),
sgx_w AS (
  SELECT conv_id, turn_idx, role, rt,
         string_agg(rt, chr(10)) OVER w AS prompt,
         cast(count(*) OVER w AS int) AS n_context
  FROM sgx_t
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
               ROWS BETWEEN {k} PRECEDING AND 1 PRECEDING)
)
SELECT conv_id, turn_idx, n_context,
       cast(length(prompt) AS int) AS prompt_chars, prompt,
       rt AS completion
FROM sgx_w WHERE role = 'assistant' AND n_context >= 1"""


def validate_conversations(df: DataFrame) -> DataFrame:
    """Per-conversation transcript-integrity report — the schema checks an
    SFT loader runs before training on a conversation:

    - ``dense_idx``: turn_idx values are exactly ``0..n-1`` (no gaps, dupes);
    - ``first_role`` / ``starts_ok``: conversations open with ``user`` or
      ``system``;
    - ``n_role_repeats``: count of adjacent same-role turn pairs (reported,
      not fatal — tool/assistant runs are legal in agent traces);
    - ``ts_monotone``: timestamps never decrease in turn order;
    - ``n_empty_turns``: turns whose text is NULL/whitespace-only;
    - ``valid``: dense AND starts_ok AND ts_monotone AND no empty turns.

    Scale shape: ONE shuffle keyed by conv_id; the turn ordering that every
    adjacency check needs runs INSIDE each group's collected array
    (``array_sort`` on (turn_idx, role, tsu) — fully deterministic even
    under duplicate turn_idx), never as a global sort.  Per-group state is
    one conversation's (int, role, ts) triples — text stays out of the
    sorted array entirely (the empty-turn count is a plain conditional
    aggregate), so the shuffled bytes are bounded by turn COUNT, not text
    size.
    """
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    empty = F.when(
        F.length(F.trim(F.coalesce(F.col("text"), F.lit("")))) == 0, 1
    ).otherwise(0)
    g = df.groupBy("conv_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("turn_idx"), F.col("role"), tsu.alias("tsu")))
        ).alias("_a"),
        F.sum(empty).cast("int").alias("n_empty_turns"),
    )
    a = F.col("_a")
    n = F.size(a)
    # sequence(lo, hi) DESCENDS when lo > hi — guard the n < 2 case to an
    # empty adjacency list explicitly.
    adj = F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
        F.array().cast("array<int>")
    )
    dense = F.forall(
        F.sequence(F.lit(1), n), lambda i: F.element_at(a, i)["turn_idx"] == i - 1
    )
    repeats = F.size(
        F.filter(
            adj, lambda i: F.element_at(a, i)["role"] == F.element_at(a, i - 1)["role"]
        )
    )
    monotone = F.forall(
        adj, lambda i: F.element_at(a, i)["tsu"] >= F.element_at(a, i - 1)["tsu"]
    )
    first_role = F.element_at(a, 1)["role"]
    starts_ok = first_role.isin("user", "system")
    return g.select(
        "conv_id",
        n.alias("n_turns"),
        first_role.alias("first_role"),
        dense.alias("dense_idx"),
        starts_ok.alias("starts_ok"),
        repeats.alias("n_role_repeats"),
        monotone.alias("ts_monotone"),
        "n_empty_turns",
        (dense & starts_ok & monotone & (F.col("n_empty_turns") == 0)).alias("valid"),
    )


def validate_conversations_sql(transcripts_sql: str) -> str:
    """DuckDB replay of :func:`validate_conversations` (lag-window form —
    same deterministic (turn_idx, role, tsu) adjacency order, same flags)."""
    return f"""WITH sgv_t AS (
  SELECT conv_id, turn_idx, role, text, epoch_us(ts) AS tsu,
         row_number() OVER w - 1 AS rn0,
         lag(role) OVER w AS prev_role,
         lag(epoch_us(ts)) OVER w AS prev_tsu
  FROM ({transcripts_sql})
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, role, epoch_us(ts))
),
sgv_g AS (
  SELECT conv_id,
         cast(count(*) AS int) AS n_turns,
         min(CASE WHEN rn0 = 0 THEN role END) AS first_role,
         bool_and(turn_idx = rn0) AS dense_idx,
         cast(count(CASE WHEN role = prev_role THEN 1 END) AS int)
           AS n_role_repeats,
         bool_and(prev_tsu IS NULL OR tsu >= prev_tsu) AS ts_monotone,
         cast(count(CASE WHEN length(trim(coalesce(text, ''))) = 0 THEN 1 END)
              AS int) AS n_empty_turns
  FROM sgv_t GROUP BY conv_id
)
SELECT conv_id, n_turns, first_role, dense_idx,
       first_role IN ('user', 'system') AS starts_ok,
       n_role_repeats, ts_monotone, n_empty_turns,
       (dense_idx AND first_role IN ('user', 'system') AND ts_monotone
        AND n_empty_turns = 0) AS valid
FROM sgv_g"""


def truncate_conversations(
    df: DataFrame,
    token_budget: int,
) -> DataFrame:
    """Head-truncate each conversation to a whitespace-token budget: keep a
    turn iff the tokens accumulated BEFORE it (in turn order) are still under
    ``token_budget`` — the same keep rule as
    :func:`~sketches_go_spark.operators.sampling.token_budget_sample`, so at
    least the first turn always survives and the overshoot is at most one
    turn.  Returns the transcripts shape plus ``n_tokens`` /
    ``tokens_before`` audit columns; chain into
    :func:`assemble_conversations` for the budgeted render.

    Scale shape: one window shuffle partitioned on conv_id — a per-group
    prefix scan bounded by the longest conversation, the identical shape to
    the assembly aggregation downstream (same key, so AQE/reuse keeps the
    turns co-located between the two).
    """
    if token_budget <= 0:
        raise ValueError("token_budget must be positive")
    reserved = {"n_tokens", "tokens_before"} & set(df.columns)
    if reserved:
        raise ValueError(
            "df must not carry columns named "
            + ", ".join(sorted(reserved))
            + " (reserved for truncate_conversations' prefix scan)"
        )
    d = df.withColumn("n_tokens", token_count(F.col("text")).cast("bigint"))
    w = (
        Window.partitionBy("conv_id")
        .orderBy(F.col("turn_idx").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return d.withColumn(
        "tokens_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).where(F.col("tokens_before") < F.lit(int(token_budget)))


def truncate_conversations_sql(
    transcripts_sql: str,
    token_budget: int,
) -> str:
    """DuckDB replay of :func:`truncate_conversations` — returns a
    transcripts-shaped SELECT (plus the audit columns), window sum cast to
    bigint (DuckDB widens sum(bigint) to HUGEINT)."""
    ntok = token_count_sql("text")
    return f"""SELECT * FROM (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         cast({ntok} AS bigint) AS n_tokens,
         cast(coalesce(sum(cast({ntok} AS bigint)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bigint)
           AS tokens_before
  FROM ({transcripts_sql})
) WHERE tokens_before < {int(token_budget)}"""


def collapse_retries(df: DataFrame) -> DataFrame:
    """Collapse retry runs: drop a turn when (role, text, tool) exactly
    equals the previous turn of the same conversation (agent-trace retries,
    double-submits, duplicated tool outputs), keeping the FIRST turn of each
    run (its ts), then re-index ``turn_idx`` densely over the survivors so
    downstream assembly/truncation see a gapless transcript.

    Scale shape: one conv_id-keyed window shuffle; both the lag comparison
    and the dense re-rank run over the same (conv_id, turn_idx) sort, so
    Catalyst plans a single Exchange.  NULL-safe equality (``eqNullSafe``)
    so NULL tool == NULL tool counts as a repeat, matching the SQL twin's
    ``IS NOT DISTINCT FROM``.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    same = (
        F.col("role").eqNullSafe(F.lag("role").over(w))
        & F.col("text").eqNullSafe(F.lag("text").over(w))
        & F.col("tool").eqNullSafe(F.lag("tool").over(w))
    )
    kept = df.withColumn("_rep", F.coalesce(same, F.lit(False))).where(~F.col("_rep"))
    return kept.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
    )


def collapse_retries_sql(transcripts_sql: str) -> str:
    """DuckDB replay of :func:`collapse_retries` — returns a
    transcripts-shaped SELECT with densely re-indexed turn_idx."""
    return f"""SELECT conv_id,
       cast(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1
            AS int) AS turn_idx,
       role, text, tool, ts
FROM (
  SELECT *,
         (role IS NOT DISTINCT FROM lag(role) OVER w
          AND text IS NOT DISTINCT FROM lag(text) OVER w
          AND tool IS NOT DISTINCT FROM lag(tool) OVER w) AS _rep
  FROM ({transcripts_sql})
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
WHERE NOT coalesce(_rep, false)"""


def common_turns(
    df: DataFrame,
    min_convs: int = 2,
) -> DataFrame:
    """Boilerplate-turn detection: normalized turn texts (lower+trim) that
    appear in at least ``min_convs`` distinct conversations — shared system
    prompts, templated tool output, injected headers.  Returns
    ``(text_norm, n_convs, n_occurrences)``.

    Scale shape: one aggregation keyed by the normalized text with a
    count-distinct on conv_id (Catalyst expands to a two-phase
    distinct-then-count — both phases map-side combined).  Boilerplate keys
    are few and hot by definition, which is exactly the shape partial
    aggregation collapses before the shuffle; the output is bounded by the
    ``min_convs`` filter, never the corpus.
    """
    if min_convs <= 0:
        raise ValueError("min_convs must be positive")
    norm = F.lower(F.trim(F.coalesce(F.col("text"), F.lit(""))))
    return (
        df.groupBy(norm.alias("text_norm"))
        .agg(
            F.countDistinct("conv_id").cast("bigint").alias("n_convs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .where(F.col("n_convs") >= min_convs)
    )


def common_turns_sql(transcripts_sql: str, min_convs: int = 2) -> str:
    """DuckDB replay of :func:`common_turns`."""
    return f"""SELECT lower(trim(coalesce(text, ''))) AS text_norm,
       cast(count(DISTINCT conv_id) AS bigint) AS n_convs,
       cast(count(*) AS bigint) AS n_occurrences
FROM ({transcripts_sql})
GROUP BY 1 HAVING count(DISTINCT conv_id) >= {int(min_convs)}"""


def strip_boilerplate(df: DataFrame, min_convs: int = 2) -> DataFrame:
    """Drop boilerplate turns — turns whose normalized text
    :func:`common_turns` flags as shared across >= ``min_convs``
    conversations (system prompts, templated tool output) — then re-index
    ``turn_idx`` densely so downstream assembly sees gapless transcripts.

    Scale shape: the boilerplate side is the *output* of common_turns —
    bounded by the min_convs filter, tiny relative to the corpus — so it is
    broadcast and the strip is a map-side anti-join; the only wide exchange
    is the re-rank's conv_id window.  ``min_convs`` is the knob: raising it
    shrinks the broadcast set (at 100 TB you'd also cap it with a
    ``LIMIT``-by-frequency if a pathological corpus made the set large).
    Empty-normalized turns count as boilerplate like any other repeated
    text.
    """
    boiler = common_turns(df, min_convs).select("text_norm")
    norm = F.lower(F.trim(F.coalesce(F.col("text"), F.lit(""))))
    kept = df.join(
        F.broadcast(boiler), norm == boiler["text_norm"], "left_anti"
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return kept.select(
        "conv_id",
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        "role",
        "text",
        "tool",
        "ts",
    )


def strip_boilerplate_sql(transcripts_sql: str, min_convs: int = 2) -> str:
    """DuckDB replay of :func:`strip_boilerplate` — returns a
    transcripts-shaped SELECT."""
    return f"""SELECT conv_id,
       cast(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1
            AS int) AS turn_idx,
       role, text, tool, ts
FROM ({transcripts_sql})
WHERE lower(trim(coalesce(text, ''))) NOT IN (
  SELECT text_norm FROM ({common_turns_sql(transcripts_sql, min_convs)})
)"""


def split_conversations(df: DataFrame, gap_us: int) -> DataFrame:
    """Episode split: start a new conversation episode whenever the
    inter-turn gap exceeds ``gap_us`` microseconds — the transcript twin of
    event sessionization, for agent traces where one conv_id spans days of
    intermittent activity.  Episodes are re-keyed ``conv_id#<episode>`` with
    ``turn_idx`` re-indexed densely inside each episode, so every downstream
    assembly/validation/truncation operator works unchanged on the output.

    Scale shape: one conv_id-keyed window shuffle shared by the lag-gap
    test, the running episode counter (a cumulative sum over the same sort)
    and the re-rank — a single Exchange, per-group state one conversation.
    Ties/ordering: the walk is ordered by turn_idx (unique per conv), never
    by ts, so out-of-order timestamps split deterministically.
    """
    if gap_us <= 0:
        raise ValueError("gap_us must be positive")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    tsu = F.unix_micros(F.col("ts").cast("timestamp"))
    is_new = (tsu - F.lag(tsu).over(w) > F.lit(int(gap_us))).cast("int")
    ep = F.sum(F.coalesce(is_new, F.lit(0))).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    we = Window.partitionBy("conv_id", "_ep").orderBy("turn_idx")
    return (
        df.withColumn("_ep", ep)
        .select(
            F.concat(
                "conv_id", F.lit("#"), F.col("_ep").cast("string")
            ).alias("conv_id"),
            (F.row_number().over(we) - 1).cast("int").alias("turn_idx"),
            "role",
            "text",
            "tool",
            "ts",
        )
    )


def split_conversations_sql(transcripts_sql: str, gap_us: int) -> str:
    """DuckDB replay of :func:`split_conversations` — returns a
    transcripts-shaped SELECT with episode-suffixed conv_id."""
    return f"""SELECT concat(conv_id, '#', cast(_ep AS varchar)) AS conv_id,
       cast(row_number() OVER (PARTITION BY conv_id, _ep ORDER BY turn_idx) - 1
            AS int) AS turn_idx,
       role, text, tool, ts
FROM (
  SELECT *,
         sum(_new) OVER (PARTITION BY conv_id ORDER BY turn_idx
                         ROWS UNBOUNDED PRECEDING) AS _ep
  FROM (
    SELECT *,
           coalesce(cast(epoch_us(ts) - lag(epoch_us(ts))
                           OVER (PARTITION BY conv_id ORDER BY turn_idx)
                         > {int(gap_us)} AS int), 0) AS _new
    FROM ({transcripts_sql})
  )
)"""


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


def role_transitions(df: DataFrame) -> DataFrame:
    """Dialogue-structure matrix: how often each role follows each other
    role across the corpus — ``(from_role, to_role, n, frac)`` where
    ``frac`` is the share of ALL transitions.  This is the grammar check a
    transcript corpus gets before training (user→assistant should dominate;
    assistant→assistant runs flag retry storms; tool→user flags broken
    traces) and the input to any Markov-order sanity model.

    Scale shape: the lag pairing is one conv_id window Exchange (the same
    partitioning every other transcript op uses), immediately collapsed by a
    map-side-combinable count into a ≤ |roles|² relation; the global share
    comes from a broadcast cross join of the 1-row total onto that tiny
    matrix (same pattern as rebalanced_sample), never a corpus-wide window."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = df.select(
        F.lag("role").over(w).alias("from_role"),
        F.col("role").alias("to_role"),
    ).where(F.col("from_role").isNotNull())
    out = pairs.groupBy("from_role", "to_role").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = out.agg(F.sum("n").alias("_total"))
    return out.join(F.broadcast(total), how="cross").select(
        "from_role",
        "to_role",
        "n",
        (F.col("n").cast("double") / F.col("_total").cast("double")).alias(
            "frac"
        ),
    )


def role_transitions_sql(transcripts_sql: str) -> str:
    """DuckDB replay of :func:`role_transitions` (bigint/bigint double
    division is correctly rounded on both engines, so ``frac`` is
    bit-identical)."""
    return f"""SELECT from_role, to_role, n,
       cast(n AS double) / cast(sum(n) OVER () AS double) AS frac
FROM (
  SELECT from_role, to_role, count(*) AS n
  FROM (
    SELECT lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS from_role,
           role AS to_role
    FROM ({transcripts_sql})
  )
  WHERE from_role IS NOT NULL
  GROUP BY from_role, to_role
)"""


def tool_cooccurrence(
    df: DataFrame, basket: str | Column = "conv_id"
) -> DataFrame:
    """Tool-affinity matrix over agent traces: for every unordered pair of
    tools, in how many BASKETS both fired, plus the Jaccard affinity
    ``n_ab / (n_a + n_b - n_ab)`` — the market-basket screen for tool-use
    corpora (which capabilities co-fire, which are islands).  ``basket``
    defaults to the conversation; pass e.g. ``F.to_date("ts")`` for
    "which tools fail together on the same day" ops analysis.

    Scale shape: ONE basket-keyed aggregation (``collect_set`` dedupes
    in-group, so there is no separate DISTINCT shuffle); pairs are generated
    INSIDE each basket's sorted tool array (index-driven transform — bounded
    by tools-per-basket squared), and the per-tool totals relation is tiny
    and broadcast.  No self-join of the raw turns.
    """
    b = F.col(basket) if isinstance(basket, str) else basket
    per_conv = df.where(F.col("tool").isNotNull()).groupBy(
        b.alias("_bk")
    ).agg(
        F.array_sort(F.collect_set("tool")).alias("_ts")
    )
    ts = F.col("_ts")

    def _pairs_for(t: Column, i: Column) -> Column:
        # deliberate 2-param transform: the second argument IS the element
        # index — pair t with every LATER element of the sorted array
        rest = F.slice(ts, i + F.lit(2), F.size(ts))
        return F.transform(
            rest, lambda u: F.struct(t.alias("tool_a"), u.alias("tool_b"))
        )

    pairs = per_conv.select(
        F.explode(F.flatten(F.transform(ts, _pairs_for))).alias("_p")
    ).select("_p.tool_a", "_p.tool_b")
    n_ab = pairs.groupBy("tool_a", "tool_b").agg(F.count(F.lit(1)).alias("n"))
    totals = per_conv.select(F.explode(ts).alias("tool")).groupBy("tool").agg(
        F.count(F.lit(1)).alias("_nt")
    )
    return (
        n_ab.join(
            F.broadcast(totals.withColumnRenamed("tool", "tool_a")), "tool_a"
        )
        .withColumnRenamed("_nt", "_na")
        .join(
            F.broadcast(totals.withColumnRenamed("tool", "tool_b")), "tool_b"
        )
        .withColumnRenamed("_nt", "_nb")
        .select(
            "tool_a",
            "tool_b",
            "n",
            (
                F.col("n").cast("double")
                / (F.col("_na") + F.col("_nb") - F.col("n")).cast("double")
            ).alias("affinity"),
        )
    )


def tool_cooccurrence_sql(
    transcripts_sql: str, basket_expr: str = "conv_id"
) -> str:
    """DuckDB replay of :func:`tool_cooccurrence` (self-join formulation —
    provably the same pair multiset as the in-array generation, and the
    affinity arithmetic is one exact-int subtraction + one double divide)."""
    return f"""WITH sgs_pc AS (
  SELECT DISTINCT {basket_expr} AS conv_id, tool
  FROM ({transcripts_sql}) WHERE tool IS NOT NULL
),
sgs_pairs AS (
  SELECT a.tool AS tool_a, b.tool AS tool_b, count(*) AS n
  FROM sgs_pc a JOIN sgs_pc b
    ON a.conv_id = b.conv_id AND a.tool < b.tool
  GROUP BY a.tool, b.tool
),
sgs_tc AS (SELECT tool, count(*) AS nt FROM sgs_pc GROUP BY tool)
SELECT p.tool_a, p.tool_b, p.n,
       cast(p.n AS double) / cast(ta.nt + tb.nt - p.n AS double) AS affinity
FROM sgs_pairs p
JOIN sgs_tc ta ON ta.tool = p.tool_a
JOIN sgs_tc tb ON tb.tool = p.tool_b"""
