"""Parametric cross-engine grid: the relational DDSketch pipeline vs the
DuckDB replay across alphas x quantile sets on data with negatives, zeros
and weights — the 74 driver oracles pin ONE configuration each; this pins
the algorithm across the parameter space."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from sketches_go_spark.core.ddsketch import DDSketchConfig
from sketches_go_spark.functions import ddsketch_fns as dd
from sketches_go_spark.functions import oracles


@pytest.fixture(scope="module")
def grid_data(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("grid") / "t.parquet")
    rng = np.random.default_rng(97)
    vals = np.concatenate([
        rng.lognormal(2.0, 1.5, 4000),          # heavy positive tail
        -rng.lognormal(1.0, 1.0, 2000),         # negatives
        np.zeros(500),                          # zero region
        rng.uniform(-1e-10, 1e-10, 100),        # sub-min_indexable
    ])
    rng.shuffle(vals)
    g = rng.integers(0, 5, vals.size)
    spark.createDataFrame(
        [(f"g{int(a)}", float(v)) for a, v in zip(g, vals)], "g string, v double"
    ).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return path, con


@pytest.mark.parametrize("alpha", [0.02, 0.005])
@pytest.mark.parametrize(
    "qs", [(0.01, 0.5, 0.99), (0.1, 0.25, 0.75, 0.9)]
)
def test_cross_engine_quantiles_grid(spark, grid_data, alpha, qs):
    path, con = grid_data
    cfg = DDSketchConfig(alpha=alpha)
    df = spark.read.parquet(path)
    got = [
        (r["g"], float(r["q"]), r["est"])
        for r in dd.ddsketch_quantiles_relational(df, "v", ["g"], qs, cfg)
        .orderBy("g", "q")
        .collect()
    ]
    sql = oracles.ddsketch_quantiles_sql(
        "SELECT g, v FROM t", ["g"], qs, cfg, order_by="g, q"
    )
    exp = [(r[0], float(r[1]), r[2]) for r in con.execute(sql).fetchall()]
    assert got == exp
    assert len(got) == 5 * len(qs)
