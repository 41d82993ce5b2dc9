"""The transcripts table — the engine's primary input shape.

Schema (BASELINE.json input_hint):
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``.

Two deterministic constructions:

1. :func:`transcripts_from_events` — an ANSI-SQL derivation of the transcript
   shape from the driver's ``events`` table.  The SAME SQL body runs on Spark
   and on DuckDB, which lets every transcript query be checked against a
   DuckDB oracle value-for-value (the driver's correctness gate).

2. :func:`synth_transcripts` — a pure-Catalyst synthetic generator over
   ``spark.range`` for benchmarks and streaming tests: arbitrary scale, fully
   deterministic (hash-derived uniforms; no Python RNG), with the FIXTURES.md
   distributions (lognormal text lengths, exponential inter-turn gaps, skewed
   conversation sizes).  Text is a pure function of (conv_id, turn_idx) —
   the per-turn text-equality invariant under stable ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Shared ANSI-SQL derivation: runs verbatim on Spark and DuckDB (dialect
# intersection: concat/lpad/cast-as-string/row_number/case/%).
# `value` (positive double) is carried as an extra measure column; callers
# wanting the strict input_hint schema drop it.
TRANSCRIPTS_SQL_BODY = """
SELECT
  concat('conv-', lpad(cast(user_id AS string), 8, '0')) AS conv_id,
  cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS int)
                                                         AS turn_idx,
  CASE event_type
    WHEN 'click'    THEN 'user'
    WHEN 'view'     THEN 'user'
    WHEN 'signup'   THEN 'system'
    WHEN 'purchase' THEN 'assistant'
    ELSE 'tool' END                                      AS role,
  props                                                  AS text,
  CASE WHEN event_type = 'error'
       THEN concat('tool-', cast(user_id % 7 AS string))
       ELSE NULL END                                     AS tool,
  ts                                                     AS ts,
  value                                                  AS value
FROM {events}
"""


def transcripts_sql(events_relation: str = "events") -> str:
    """The derivation with the events relation name spliced in — pass
    ``events`` for DuckDB (pre-registered view) or a Spark temp-view name."""
    return TRANSCRIPTS_SQL_BODY.format(events=events_relation)


def transcripts_from_events(
    spark: SparkSession, sf_dir: str, keep_value: bool = False
) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("sgs_events_src")
    df = spark.sql(transcripts_sql("sgs_events_src"))
    if not keep_value:
        df = df.drop("value")
    return df


# --------------------------------------------------------------------- synth
def _u01(col, salt: str):
    """Deterministic uniform(0,1) from a column — xxhash64 folded to [0,1).

    Stays JVM-side; `& MaxLong` avoids the sign without overflow (ANSI-safe).
    """
    h = F.xxhash64(F.concat(F.lit(salt), col.cast("string")))
    return (F.abs(h) % F.lit(2**53)).cast("double") / F.lit(float(2**53))


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    avg_turns_per_conv: int = 10,
    seed: str = "42",
    n_tools: int = 20,
    skew_head_frac: float = 0.02,
    with_text: bool = True,
) -> DataFrame:
    """Deterministic synthetic transcripts at any scale, all Catalyst.

    - conversation sizes: most convs have ~``avg_turns_per_conv`` turns, but a
      Zipf-like head (``skew_head_frac`` of the id space redirected onto a few
      conv_ids) creates the skewed keys the north rule requires handling;
    - ``length(text)`` ~ lognormal(mu=5, sigma=1) clipped to [1, 64k]
      (FIXTURES.md §1) via Box-Muller over hash-uniforms;
    - inter-turn gap ~ Exponential(rate=1.5) seconds; ``ts`` is the running
      sum within the conversation (windowed cumsum);
    - ``text`` is a pure function of (conv_id, turn_idx): the deterministic
      per-turn invariant.
    """
    df = spark.range(n_turns)  # id
    base_conv = F.floor(F.col("id") / avg_turns_per_conv)
    # redirect a slice of conversations onto 3 hot ids -> skewed keys
    hot = _u01(base_conv, seed + "hot") < F.lit(skew_head_frac)
    conv_num = F.when(hot, base_conv % 3).otherwise(base_conv + 1000)
    df = df.withColumn("conv_num", conv_num)
    w = Window.partitionBy("conv_num").orderBy("id")
    df = df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))

    u1 = _u01(F.col("id"), seed + "l1")
    u2 = _u01(F.col("id"), seed + "l2")
    # Box-Muller: z ~ N(0,1); text length ~ clip(exp(5 + z), 1, 65536)
    z = F.sqrt(-2.0 * F.log(u1 + F.lit(1e-12))) * F.cos(F.lit(6.283185307179586) * u2)
    length = F.least(
        F.greatest(F.round(F.exp(F.lit(5.0) + z)).cast("int"), F.lit(1)), F.lit(65536)
    )
    # exponential(1.5) inter-turn gap in seconds
    gap = -F.log(F.lit(1.0) - _u01(F.col("id"), seed + "g") + F.lit(1e-12)) / F.lit(1.5)
    ts = (
        F.lit(1704067200.0)  # 2024-01-01 UTC
        + F.sum(gap).over(w.rowsBetween(Window.unboundedPreceding, 0))
        + F.col("conv_num") * F.lit(0.001)
    )

    roles = F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool"))
    role = F.element_at(roles, (F.col("turn_idx") % 4 + 1).cast("int"))
    tool_num = (
        F.abs(F.xxhash64(F.concat(F.lit(seed + "t"), F.col("conv_num").cast("string")))) % n_tools
    )
    tool = F.when(role == "tool", F.concat(F.lit("tool-"), tool_num.cast("string")))

    out = df.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("conv_num").cast("string"), 8, "0")).alias(
            "conv_id"
        ),
        F.col("turn_idx"),
        role.alias("role"),
        (
            # deterministic text of the target length: seed token from
            # (conv_id, turn_idx) + repeat-pad.  Pure function of the key.
            F.rpad(
                F.concat(
                    F.lit("t:"),
                    F.col("conv_num").cast("string"),
                    F.lit(":"),
                    F.col("turn_idx").cast("string"),
                    F.lit(" "),
                ),
                length,
                "loremipsum dolorsit ",
            )
            if with_text
            else F.lit("")
        ).alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(ts).alias("ts"),
    )
    return out
