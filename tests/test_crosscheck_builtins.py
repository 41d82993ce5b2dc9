"""Secondary oracles: Spark's own sketch built-ins (hll_sketch_agg,
approx_percentile) as loose cross-checks of our from-scratch implementations
(SURVEY.md §2.9 — they validate, they are not the implementation), plus
physical-plan assertions: column pruning + filter pushdown must reach the
parquet scan."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketches_go_spark.core.ddsketch import DDSketchConfig
from sketches_go_spark.functions import ddsketch_fns as dd
from sketches_go_spark.functions import sketch_fns as sk
from tests.conftest import SF_ORACLE

CFG = DDSketchConfig(alpha=0.01)


def test_hll_vs_spark_builtin(spark):
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    ours = (
        sk.hll_estimate_relational(ev, "user_id", ["event_type"], p=12)
        .toPandas()
        .set_index("event_type")["est"]
    )
    theirs = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
        .toPandas()
        .set_index("event_type")["est"]
    )
    exact = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .toPandas()
        .set_index("event_type")["d"]
    )
    for et in exact.index:
        # both estimators within their published error of the truth
        assert abs(ours[et] - exact[et]) / exact[et] <= 5 * 1.04 / 64
        assert abs(theirs[et] - exact[et]) / exact[et] <= 5 * 1.04 / 64


def test_ddsketch_vs_percentile_approx(spark):
    ev = spark.read.parquet(f"{SF_ORACLE}/events.parquet")
    src = ev.select("event_type", F.col("value").cast("double").alias("v"))
    ours = (
        dd.ddsketch_quantiles_relational(src, "v", ["event_type"], [0.5, 0.95], CFG)
        .toPandas()
        .set_index(["event_type", "q"])["est"]
    )
    exact = (
        ev.groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .toPandas()
        .set_index("event_type")
    )
    for et in exact.index:
        assert ours[(et, 0.5)] == pytest.approx(exact.loc[et, "p50"], rel=0.011)
        assert ours[(et, 0.95)] == pytest.approx(exact.loc[et, "p95"], rel=0.011)


def test_scan_pruning_and_pushdown(spark):
    """The documents quality query must read only the columns it needs, and
    a metadata filter must reach the parquet scan as a pushed filter."""
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    from sketches_go_spark.operators.text import quality_features

    q = quality_features(docs.where(F.col("lang") == "en")).select(
        "doc_id", "quality_score"
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # binary/embedding-style wide columns are not in ReadSchema
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "source" not in read_schema and "n_chars" not in read_schema


def test_udaf_collapsing_invariants(spark):
    """Collapsing through the two-phase UDAF topology keeps the collapse
    contract: <= max_bins, exact count, preserved max."""
    rng = np.random.default_rng(3)
    n = 20000
    pdf = pd.DataFrame({"g": ["x"] * n, "v": rng.lognormal(0, 4, n)})
    sdf = spark.createDataFrame(pdf).repartition(8)
    cfg = DDSketchConfig(alpha=0.01, max_bins=64, collapse="lowest")
    from sketches_go_spark.core.encoding import decode_sketch

    row = dd.ddsketch_agg(sdf, "v", ["g"], cfg).collect()[0]
    s = decode_sketch(bytes(row["sketch"]), config=cfg)
    assert s.pos_idx.size <= 64
    assert s.count == pytest.approx(n)
    assert s.quantile(1.0) == pytest.approx(pdf["v"].max(), rel=0.011)
