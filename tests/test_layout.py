"""Storage-layout plan tests: a conv_id-bucketed, (conv_id, turn_idx)-sorted
table must let Catalyst elide the Exchange under the latency window — the
dominant shuffle of the transcript workload at scale (plans/layout.py)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sketches_go_spark.core.ddsketch import DDSketchConfig
from sketches_go_spark.functions import ddsketch_fns as dd
from sketches_go_spark.plans import layout
from sketches_go_spark.sources.transcripts import transcripts_from_events
from tests.conftest import SF_SMOKE

CFG = DDSketchConfig(alpha=0.01)


def _latency(df):
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    v = (micros - F.lag(micros).over(w)).cast("double") / F.lit(1e6)
    return df.select("tool", v.alias("v")).where(
        F.col("tool").isNotNull() & F.col("v").isNotNull()
    )


def _window_subtree(plan: str) -> str:
    """The plan text between the conv_id lag window (the latency derivation —
    other Window nodes exist for the bins cumsum) and its FileScan leaf."""
    i = plan.index("windowspecdefinition(conv_id")
    return plan[i : plan.index("FileScan", i)]


def test_bucketed_layout_elides_window_shuffle(spark, tmp_path):
    t = transcripts_from_events(spark, SF_SMOKE)
    layout.write_bucketed(
        t, "sgs_test_bucketed", ["conv_id"], ["conv_id", "turn_idx"], 8,
        path=str(tmp_path / "bucketed"),
    )
    try:
        bt = layout.read_bucketed(spark, "sgs_test_bucketed")
        q_bucketed = dd.ddsketch_quantiles_relational(
            _latency(bt), "v", ["tool"], (0.5, 0.95), CFG
        )
        q_plain = dd.ddsketch_quantiles_relational(
            _latency(t), "v", ["tool"], (0.5, 0.95), CFG
        )
        plan_b = q_bucketed._jdf.queryExecution().executedPlan().toString()
        plan_u = q_plain._jdf.queryExecution().executedPlan().toString()
        # the unbucketed plan shuffles every raw row by conv_id to feed the
        # window; the bucketed scan already provides that distribution
        assert "Exchange" in _window_subtree(plan_u)
        assert "Exchange" not in _window_subtree(plan_b)
        assert plan_b.count("Exchange") < plan_u.count("Exchange")
        # layout must never change the answer
        rb = sorted(map(tuple, q_bucketed.collect()))
        ru = sorted(map(tuple, q_plain.collect()))
        assert rb == ru
    finally:
        spark.sql("DROP TABLE IF EXISTS sgs_test_bucketed")


def test_range_bucket_by_sketch_balance_and_plan(spark):
    """Sketch-derived range buckets: counts balanced within the sketch's
    accuracy on a continuous distribution, bucket ids dense in
    [0, n_buckets), boundaries broadcast (no SortMergeJoin / extra
    data-row Exchange on the tagging side), reserved-column guard."""
    import numpy as np
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from sketches_go_spark.core.ddsketch import DDSketchConfig

    rng = np.random.default_rng(7)
    n, k = 50_000, 16
    pdf = pd.DataFrame({"v": rng.lognormal(2.0, 1.0, n)})
    df = spark.createDataFrame(pdf)
    out = layout.range_bucket_by_sketch(df, "v", k, DDSketchConfig(alpha=0.01))
    counts = (
        out.groupBy("range_bucket").count().orderBy("range_bucket").toPandas()
    )
    assert list(counts["range_bucket"]) == list(range(k))
    # each bucket within ~15% of n/k (alpha=0.01 sketch + 50k-sample noise)
    assert (abs(counts["count"] - n / k) < 0.15 * n / k).all()
    # ordering invariant: bucket is monotone in v
    two = out.select("v", "range_bucket").orderBy("v").toPandas()
    assert two["range_bucket"].is_monotonic_increasing
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    with pytest.raises(ValueError):
        layout.range_bucket_by_sketch(df.withColumn("_bs", F.lit(1)), "v", k)
    with pytest.raises(ValueError):
        layout.range_bucket_by_sketch(df, "v", 1)
