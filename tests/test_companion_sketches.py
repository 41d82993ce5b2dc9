"""Companion sketches: error bounds per published formulas, merge semantics,
serde round-trips.  HLL: sigma=1.04/sqrt(m); CMS: overshoot <= eps*N w.h.p.,
never undershoot; Bloom: no false negatives, FPR near (1-e^{-kn/m})^k;
KLL: additive rank error; t-digest: tail-accurate rank error."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketches_go_spark.core.bloom import BloomFilter, optimal_k
from sketches_go_spark.core.cms import CountMinSketch
from sketches_go_spark.core.hashing import bit_length_u64, portable_hash64_np
from sketches_go_spark.core.hll import HyperLogLog
from sketches_go_spark.core.kll import KLLSketch
from sketches_go_spark.core.tdigest import TDigest

RNG = np.random.default_rng(5)


def test_bit_length_exact():
    vals = np.concatenate(
        [
            np.asarray([0, 1, 2, 3, 4, 7, 8, 255, 256], dtype=np.int64),
            (np.int64(1) << np.arange(1, 60)),
            (np.int64(1) << np.arange(1, 60)) - 1,
        ]
    )
    expect = np.asarray([int(v).bit_length() for v in vals])
    assert np.array_equal(bit_length_u64(vals), expect)


@pytest.mark.parametrize("true_n", [100, 5000, 200000])
def test_hll_error_bound(true_n):
    p = 12
    items = [f"item-{i}" for i in range(true_n)]
    h = portable_hash64_np(items)
    hll = HyperLogLog(p).add_hashes(h)
    est = hll.estimate()
    sigma = HyperLogLog.relative_standard_error(p)
    assert abs(est - true_n) / true_n <= 4 * sigma  # 4-sigma envelope


def test_hll_merge_equals_union_and_idempotent():
    a_items = portable_hash64_np([f"a{i}" for i in range(3000)])
    b_items = portable_hash64_np([f"b{i}" for i in range(2000)])
    a = HyperLogLog(10).add_hashes(a_items)
    b = HyperLogLog(10).add_hashes(b_items)
    u = HyperLogLog(10).add_hashes(np.concatenate([a_items, b_items]))
    m = HyperLogLog(10).merge(a).merge(b)
    assert np.array_equal(m.registers, u.registers)
    # merging the same sketch twice changes nothing (max is idempotent)
    m2 = HyperLogLog(10).merge(a).merge(a)
    assert np.array_equal(m2.registers, a.registers)
    with pytest.raises(ValueError):
        a.merge(HyperLogLog(12))
    rt = HyperLogLog.from_bytes(m.to_bytes())
    assert np.array_equal(rt.registers, m.registers)


def test_cms_bounds():
    items = RNG.zipf(1.5, 20000).astype(str)
    uniq, true_counts = np.unique(items, return_counts=True)
    cms = CountMinSketch(depth=4, width=512)
    cms.add(items)
    est = cms.estimate(uniq)
    # never undershoots
    assert np.all(est >= true_counts)
    # overshoot bounded by eps*N for the vast majority (w.p. 1-e^-d per item)
    overshoot = est - true_counts
    n = len(items)
    frac_bad = np.mean(overshoot > cms.epsilon * n)
    assert frac_bad <= 0.05
    # merge = add tables
    half1, half2 = items[: n // 2], items[n // 2 :]
    merged = CountMinSketch(4, 512).add(half1).merge(CountMinSketch(4, 512).add(half2))
    assert np.array_equal(merged.table, cms.table)
    rt = CountMinSketch.from_bytes(cms.to_bytes())
    assert np.array_equal(rt.table, cms.table)


def test_bloom_no_false_negatives_and_fpr():
    n = 500
    m = 8192
    k = optimal_k(m, n)
    members = [f"member-{i}" for i in range(n)]
    bf = BloomFilter(m, k).add(members)
    assert bf.might_contain(members).all()
    probes = [f"absent-{i}" for i in range(5000)]
    fpr = bf.might_contain(probes).mean()
    assert fpr <= 3 * bf.expected_fpr(n) + 0.01
    # merge = OR
    b1 = BloomFilter(m, k).add(members[: n // 2])
    b2 = BloomFilter(m, k).add(members[n // 2 :])
    assert np.array_equal(b1.merge(b2).bits, bf.bits)
    rt = BloomFilter.from_bytes(bf.to_bytes())
    assert np.array_equal(rt.bits, bf.bits)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "sorted"])
def test_kll_rank_error(dist):
    n = 50000
    if dist == "uniform":
        values = RNG.uniform(0, 1, n)
    elif dist == "lognormal":
        values = RNG.lognormal(0, 2, n)
    else:
        values = np.arange(n, dtype=np.float64)
    k = 200
    sk = KLLSketch(k)
    for chunk in np.array_split(values, 10):
        sk.add(chunk)
    sv = np.sort(values)
    for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
        est = sk.quantile(q)
        true_rank = np.searchsorted(sv, est) / n
        assert abs(true_rank - q) <= 4 * sk.epsilon
    # extremes exact (tracked min/max)
    assert sk.quantile(0.0) >= values.min()
    assert sk.quantile(1.0) <= values.max()


def test_kll_merge_and_serde():
    parts = [RNG.normal(i * 10, 1, 20000) for i in range(4)]
    merged = KLLSketch(200)
    for p in parts:
        merged.merge(KLLSketch(200).add(p))
    union = np.sort(np.concatenate(parts))
    n = union.size
    for q in [0.1, 0.5, 0.9]:
        est = merged.quantile(q)
        true_rank = np.searchsorted(union, est) / n
        assert abs(true_rank - q) <= 4 * merged.epsilon
    rt = KLLSketch.from_bytes(merged.to_bytes())
    assert np.array_equal(rt.quantiles([0.1, 0.5, 0.9]), merged.quantiles([0.1, 0.5, 0.9]))
    with pytest.raises(ValueError):
        merged.merge(KLLSketch(100))


def test_tdigest_tail_accuracy():
    n = 100000
    values = np.random.default_rng(17).lognormal(0, 2, n)
    td = TDigest(200)
    for chunk in np.array_split(values, 20):
        td.add(chunk)
    sv = np.sort(values)
    for q, tol in [(0.001, 0.002), (0.01, 0.004), (0.5, 0.02), (0.99, 0.004), (0.999, 0.002)]:
        est = td.quantile(q)
        true_rank = np.searchsorted(sv, est) / n
        assert abs(true_rank - q) <= tol, (q, est, true_rank)
    # bounded memory
    assert td.n_centroids <= 2 * 200
    assert td.quantile(0.0) == pytest.approx(values.min())
    assert td.quantile(1.0) == pytest.approx(values.max())


def test_tdigest_merge_and_serde():
    parts = [RNG.exponential(5, 30000) for _ in range(4)]
    merged = TDigest(200)
    for p in parts:
        merged.merge(TDigest(200).add(p))
    union = np.sort(np.concatenate(parts))
    for q in [0.01, 0.5, 0.99]:
        est = merged.quantile(q)
        true_rank = np.searchsorted(union, est) / union.size
        assert abs(true_rank - q) <= 0.01
    rt = TDigest.from_bytes(merged.to_bytes())
    assert np.array_equal(rt.quantiles([0.5, 0.99]), merged.quantiles([0.5, 0.99]))
    with pytest.raises(ValueError):
        merged.merge(TDigest(100))


# ------------------------------------------------------------------------ KMV
def test_kmv_estimate_exact_below_k_and_accurate_above(spark):
    from sketches_go_spark.functions import sketch_fns as sk

    df = spark.range(0, 20000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.concat(F.lit("u"), (F.col("id") / 2).cast("int").cast("string")).alias("item"),
    )
    # group 0 and 1 each see the same 10000 distinct items
    est = {
        r["g"]: r["est"]
        for r in sk.kmv_estimate_from_sketch(
            sk.kmv_sketch(df, "item", ["g"], k=256), ["g"], k=256
        ).collect()
    }
    for g in ("0", "1"):
        assert abs(est[g] - 10000) / 10000 < 0.2, est
    # below k: exact
    small = spark.range(0, 50).select(
        F.lit("s").alias("g"), F.col("id").cast("string").alias("item")
    )
    out = sk.kmv_estimate_from_sketch(
        sk.kmv_sketch(small, "item", ["g"], k=256), ["g"], k=256
    ).collect()
    assert out[0]["est"] == 50.0


def test_kmv_merge_is_union_monoid(spark):
    from sketches_go_spark.functions import sketch_fns as sk

    a = spark.range(0, 3000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("item")
    )
    b = spark.range(2000, 6000).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("item")
    )
    k = 64
    merged = sk.kmv_merge_sketches(
        sk.kmv_sketch(a, "item", ["g"], k=k),
        sk.kmv_sketch(b, "item", ["g"], k=k),
        ["g"], k=k,
    )
    direct = sk.kmv_sketch(a.union(b), "item", ["g"], k=k)
    assert sorted(r["hv"] for r in merged.collect()) == sorted(
        r["hv"] for r in direct.collect()
    )


def test_kmv_overlap_estimates_track_truth(spark):
    from sketches_go_spark.functions import sketch_fns as sk

    # A = [0, 8000), B = [4000, 12000): |A∩B| = 4000, |A∪B| = 12000
    rows = spark.range(0, 8000).select(
        F.lit("A").alias("g"), F.col("id").cast("string").alias("item")
    ).union(
        spark.range(4000, 12000).select(
            F.lit("B").alias("g"), F.col("id").cast("string").alias("item")
        )
    )
    out = sk.kmv_pairwise_overlap(
        sk.kmv_sketch(rows, "item", ["g"], k=512), "g", k=512
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert abs(r["est_union"] - 12000) / 12000 < 0.15, r
    assert abs(r["est_intersection"] - 4000) / 4000 < 0.3, r
    assert abs(r["jaccard_est"] - 4000 / 12000) < 0.1, r
