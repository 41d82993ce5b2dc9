"""SQL-registered sketch aggregates (functions/sql_api.py): callable from
plain spark.sql text, estimates equal to the core sketches."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketches_go_spark.functions.sql_api import register_sql_functions


@pytest.fixture(scope="module")
def registered(spark):
    names = register_sql_functions(spark, alpha=0.01)
    return names


def test_register_returns_names(registered):
    assert "sgs_ddsketch_p50" in registered
    assert "sgs_hll_distinct" in registered


def test_sql_quantile_matches_core(spark, registered):
    from sketches_go_spark.core.ddsketch import DDSketch, DDSketchConfig

    rng = np.random.default_rng(5)
    vals = rng.lognormal(3.0, 1.0, 5000)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    df.createOrReplaceTempView("sgs_sqlapi_t")
    got = spark.sql(
        "SELECT sgs_ddsketch_p95(v) AS p95, sgs_ddsketch_quantile(v, 0.25) AS p25 "
        "FROM sgs_sqlapi_t"
    ).collect()[0]
    core = DDSketch(DDSketchConfig(alpha=0.01)).add(vals)
    assert got["p95"] == pytest.approx(float(core.quantile(0.95)), abs=0.0)
    assert got["p25"] == pytest.approx(float(core.quantile(0.25)), abs=0.0)


def test_sql_hll_and_kll(spark, registered):
    df = spark.range(0, 3000).select(
        (F.col("id") % 500).cast("string").alias("item"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    df.createOrReplaceTempView("sgs_sqlapi_u")
    row = spark.sql(
        "SELECT sgs_hll_distinct(item) AS d, sgs_kll_median(v) AS med "
        "FROM sgs_sqlapi_u"
    ).collect()[0]
    assert abs(row["d"] - 500) / 500 < 0.1
    assert 300 <= row["med"] <= 700
