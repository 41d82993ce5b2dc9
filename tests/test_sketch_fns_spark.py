"""Companion sketches on Spark: relational <-> UDAF <-> python-core parity,
and accuracy of the rank sketches through the two-phase topology."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketches_go_spark.core.hashing import portable_hash64_np
from sketches_go_spark.core.hll import HyperLogLog
from sketches_go_spark.core.kll import KLLSketch
from sketches_go_spark.core.tdigest import TDigest
from sketches_go_spark.functions import sketch_fns as sk

RNG = np.random.default_rng(23)


@pytest.fixture(scope="module")
def items_df(spark):
    n = 8000
    pdf = pd.DataFrame(
        {
            "g": RNG.choice(["x", "y"], n),
            "item": [f"it-{i % 3000}" for i in range(n)],
        }
    )
    return spark.createDataFrame(pdf).repartition(6), pdf


def test_hll_relational_matches_core(spark, items_df):
    sdf, pdf = items_df
    p = 10
    regs = sk.hll_registers(sdf, "item", ["g"], p=p).toPandas()
    for g, sub in pdf.groupby("g"):
        core = HyperLogLog(p).add_hashes(portable_hash64_np(sub["item"].tolist()))
        mine = regs[regs["g"] == g]
        expect = {
            (i, int(r)) for i, r in enumerate(core.registers) if r > 0
        }
        got = {(int(r.reg), int(r.rho)) for r in mine.itertuples()}
        assert got == expect
    # relational estimate == core estimate
    est = (
        sk.hll_estimate_relational(sdf, "item", ["g"], p=p)
        .toPandas()
        .set_index("g")["est"]
    )
    for g, sub in pdf.groupby("g"):
        core = HyperLogLog(p).add_hashes(portable_hash64_np(sub["item"].tolist()))
        assert est[g] == pytest.approx(core.estimate(), abs=1e-3)


def test_hll_udaf_matches_relational(spark, items_df):
    sdf, _ = items_df
    p = 10
    rel = (
        sk.hll_estimate_relational(sdf, "item", ["g"], p=p)
        .toPandas()
        .set_index("g")["est"]
    )
    udaf = (
        sk.hll_agg(sdf, "item", ["g"], p=p)
        .select("g", sk.hll_estimate_udf(F.col("sketch")).alias("est"))
        .toPandas()
        .set_index("g")["est"]
    )
    pd.testing.assert_series_equal(rel.sort_index(), udaf.sort_index())


def test_cms_udaf_matches_relational(spark, items_df):
    sdf, pdf = items_df
    counters_rel = sk.cms_counters(sdf, "item", ["g"], depth=4, width=256).toPandas()
    blobs = sk.cms_agg(sdf, "item", ["g"], depth=4, width=256).collect()
    from sketches_go_spark.core.cms import CountMinSketch

    for row in blobs:
        cms = CountMinSketch.from_bytes(bytes(row["sketch"]))
        sub = counters_rel[counters_rel["g"] == row["g"]]
        table = np.zeros((4, 256))
        for r in sub.itertuples():
            table[int(r.row), int(r.col)] = r.cnt
        assert np.array_equal(cms.table, table)


def test_bloom_udaf_matches_relational(spark, items_df):
    sdf, _ = items_df
    bits_rel = sk.bloom_bits(sdf, "item", ["g"], m_bits=2048, k=4).toPandas()
    blobs = sk.bloom_agg(sdf, "item", ["g"], m_bits=2048, k=4).collect()
    from sketches_go_spark.core.bloom import BloomFilter

    for row in blobs:
        bf = BloomFilter.from_bytes(bytes(row["sketch"]))
        expect = set(bits_rel[bits_rel["g"] == row["g"]]["pos"])
        assert set(np.flatnonzero(bf.bits)) == expect


def test_kll_tdigest_spark_accuracy(spark):
    n = 60000
    values = RNG.lognormal(2, 1.5, n)
    pdf = pd.DataFrame({"g": ["all"] * n, "v": values})
    sdf = spark.createDataFrame(pdf).repartition(8)
    sv = np.sort(values)

    kll = sk.kll_agg(sdf, "v", ["g"], k=200).collect()[0]
    ks = KLLSketch.from_bytes(bytes(kll["sketch"]))
    assert ks.n == n
    for q in (0.1, 0.5, 0.9, 0.99):
        rank = np.searchsorted(sv, ks.quantile(q)) / n
        assert abs(rank - q) <= 4 * ks.epsilon

    td_row = sk.tdigest_agg(sdf, "v", ["g"], delta=200.0).collect()[0]
    td = TDigest.from_bytes(bytes(td_row["sketch"]))
    assert td.n == n
    for q, tol in ((0.01, 0.005), (0.5, 0.02), (0.99, 0.005), (0.999, 0.002)):
        rank = np.searchsorted(sv, td.quantile(q)) / n
        assert abs(rank - q) <= tol


def test_two_phase_high_cardinality_bounded_memory(spark):
    """10^5 distinct group keys through the streaming merge topology with a
    small flush threshold (forces multiple partial flushes per task): results
    must be identical to the unflushed run, and per-group estimates exact for
    single-item groups.  Also exercises strategy='repartition'."""
    n_groups = 100_000
    df = (
        spark.range(n_groups)
        .select(
            F.concat(F.lit("conv-"), F.col("id").cast("string")).alias("conv_id"),
            F.concat(F.lit("u-"), F.pmod("id", F.lit(7)).cast("string")).alias("item"),
        )
        .repartition(8)
    )
    p = 6
    flushed = sk.hll_agg(df, "item", ["conv_id"], p=p, flush_groups=2_000).toPandas()
    assert len(flushed) == n_groups
    # flushing must not change the result: HLL register-max merge is
    # order-insensitive, so the encoded sketches are byte-identical
    plain = sk.hll_agg(df, "item", ["conv_id"], p=p, flush_groups=10**9).toPandas()
    l = flushed.sort_values("conv_id").reset_index(drop=True)
    r = plain.sort_values("conv_id").reset_index(drop=True)
    assert (l["conv_id"] == r["conv_id"]).all()
    assert all(bytes(a) == bytes(b) for a, b in zip(l["sketch"], r["sketch"]))
    # repartition strategy: same bytes again (single item per group)
    rep = (
        sk.hll_agg(df, "item", ["conv_id"], p=p, strategy="repartition",
                   flush_groups=2_000)
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert all(bytes(a) == bytes(b) for a, b in zip(l["sketch"], rep["sketch"]))
    # every group holds exactly 1 distinct item -> estimate 1.0
    samp = l.iloc[:: n_groups // 50]
    for blob in samp["sketch"]:
        assert HyperLogLog.from_bytes(bytes(blob)).estimate() == pytest.approx(
            1.0, abs=0.01
        )


def test_null_group_key_merges_to_one_row(spark):
    """A NULL group key must produce exactly ONE merged sketch row through
    the streaming merge (NaN never equals itself — the run comparison must
    normalize it), matching groupBy null semantics."""
    import pandas as pd

    from sketches_go_spark.functions import ddsketch_fns as dd

    pdf = pd.DataFrame(
        {
            "g": ["a", None, None, "a", None, "b"] * 50,
            "v": [float(i % 7 + 1) for i in range(300)],
        }
    )
    sdf = spark.createDataFrame(pdf).repartition(6)
    out = dd.ddsketch_agg(sdf, "v", ["g"]).toPandas()
    assert len(out) == 3  # a, b, NULL — one row each
    hll = sk.hll_agg(
        sdf.withColumn("item", F.col("v").cast("string")), "item", ["g"], p=6
    ).toPandas()
    assert len(hll) == 3


def test_with_quantile_rank_transform(spark):
    """Per-row quantile normalization: max of a group ranks 1.0, ranks are
    monotone in value within a group, the rank of the p-th percentile value
    is ~p (alpha-accurate), the broadcast plan never shuffles the data rows
    through a SortMergeJoin, and collapsing configs are rejected."""
    import numpy as np
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from sketches_go_spark.core.ddsketch import DDSketchConfig
    from sketches_go_spark.functions import ddsketch_fns as dd

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "id": np.arange(20_000),
            "g": np.where(np.arange(20_000) % 2 == 0, "a", "b"),
            "v": rng.lognormal(1.0, 1.5, 20_000),
        }
    )
    df = spark.createDataFrame(pdf)
    cfg = DDSketchConfig(alpha=0.01)
    out = dd.with_quantile_rank(df, "v", ["g"], cfg)
    got = out.toPandas()
    assert len(got) == len(pdf)
    for g, grp in got.groupby("g"):
        s = grp.sort_values("v")
        assert s["qrank"].is_monotonic_increasing
        assert s["qrank"].iloc[-1] == 1.0
        assert s["qrank"].iloc[0] > 0.0
        # empirical rank vs sketch rank: within alpha-ish tolerance
        emp = np.arange(1, len(s) + 1) / len(s)
        assert np.abs(s["qrank"].to_numpy() - emp).max() < 0.05
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    with pytest.raises(ValueError):
        dd.with_quantile_rank(
            df, "v", ["g"], DDSketchConfig(alpha=0.01, max_bins=64)
        )
    with pytest.raises(ValueError):
        dd.with_quantile_rank(df.withColumn("qrank", F.lit(0)), "v", ["g"], cfg)
