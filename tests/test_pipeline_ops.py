"""Pipeline operators: semantics beyond the oracle gate — trigram langid on
real multilingual text, ANN recall vs the exact baseline, dedup recovers the
planted near-duplicates, multimodal plumbing shapes."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketches_go_spark.operators import dedup, multimodal, similarity as sim
from sketches_go_spark.operators.text import langid_trigrams, token_count
from tests.conftest import SF_ORACLE


def test_langid_trigrams_real_text(spark):
    samples = [
        (0, "the quick brown fox jumps over the lazy dog and then the end", "en"),
        (1, "der hund und die katze sind nicht im haus aber ich bin da", "de"),
        (2, "le chat et les chiens sont dans la maison avec les enfants", "fr"),
        (3, "el perro que corre por los campos es de la casa", "es"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in samples], "doc_id int, text string"
    )
    out = {r["doc_id"]: r["lang_pred"] for r in langid_trigrams(df).collect()}
    for i, _, lang in samples:
        assert out[i] == lang, (i, out[i], lang)


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("",), ("   ",), ("one",), ("a b c",), (" padded  double  ",)],
        "text string",
    )
    got = [r[0] for r in df.select(token_count(F.col("text"))).collect()]
    # double spaces count as extra separators in the space-counting identity —
    # consistent with the documented (and oracle-mirrored) semantics
    assert got[0] == 0 and got[1] == 0 and got[2] == 1 and got[3] == 3


def test_dedup_finds_planted_neardups(spark):
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.9).toPandas()
    assert len(jac) > 0, "planted near-duplicates not found"
    lsh = dedup.minhash_lsh_pairs(docs, threshold=0.9).toPandas()
    # LSH at 4x4 bands catches essentially all >=0.9 pairs (P ~ 1-(1-s^4)^4)
    jac_pairs = set(map(tuple, jac[["id_a", "id_b"]].to_numpy()))
    lsh_pairs = set(map(tuple, lsh[["id_a", "id_b"]].to_numpy()))
    assert lsh_pairs <= jac_pairs
    assert len(lsh_pairs) >= 0.8 * len(jac_pairs)


def test_ann_recall_vs_bruteforce(spark):
    embs = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    queries = embs.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(embs, queries, k=3).toPandas()
    ann = sim.lsh_ann_topk(
        embs, queries, k=3, n_bands=2, band_bits=4, multi_probe=True
    ).toPandas()
    # every ANN hit must be a real vector with correctly computed similarity;
    # top-1 self-match must always be found (query is in its own bucket)
    self_hits = ann[(ann["rank"] == 1)]
    assert (self_hits["vec_id"] == self_hits["query_id"]).all()
    # recall@3 of the bucketed search vs exact (4 planes -> coarse buckets)
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    ann_sets = ann.groupby("query_id")["vec_id"].apply(set)
    recall = np.mean(
        [len(exact_sets[q] & ann_sets.get(q, set())) / 3 for q in exact_sets.index]
    )
    assert recall >= 0.3  # coarse but useful; scale path trades recall for cost


def test_multimodal_plumbing(spark):
    media = multimodal.synth_media(spark, 50, kind="image")
    feats = multimodal.image_features(media).toPandas()
    assert len(feats) == 50
    assert all(len(f) == 64 for f in feats["feature"])
    assert ((feats["mean"] >= 0) & (feats["mean"] <= 1)).all()

    video = multimodal.synth_media(spark, 10, kind="video")
    frames = multimodal.frame_sample(video, every_ms=2000).toPandas()
    assert len(frames) > 10  # multiple frames per video
    assert frames["frame"].map(lambda b: len(bytes(b))).eq(16).all()

    audio = multimodal.synth_media(spark, 10, kind="audio")
    af = multimodal.audio_features(audio).toPandas()
    assert len(af) == 10 and all(len(f) == 16 for f in af["feature"])


def test_exact_dedup_canonical_flags(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["same text", "Same Text  ", "same text", "other"],
        }
    )
    # note: normalization is lower+trim only; internal double spaces differ
    df = spark.createDataFrame(pdf)
    out = dedup.exact_dedup(df).toPandas().set_index("doc_id")
    assert bool(out.loc[1, "is_canonical"])
    assert not bool(out.loc[3, "is_canonical"])
    assert bool(out.loc[4, "is_canonical"])
    assert out.loc[1, "fingerprint"] == out.loc[3, "fingerprint"]


def test_simhash_pigeonhole_complete_recall(spark):
    """Pigeonhole blocking must find EVERY pair with hamming <= d, including
    pairs differing only in high bits (the failure mode of single-block
    schemes).  Equivalence vs exact all-pairs computed from the fingerprints."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bits, d = 16, 3
    sigs = dedup.simhash(docs, bits=bits).toPandas().set_index("doc_id")["simhash"]
    ids = sorted(sigs.index)
    expect = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(int(sigs[a]) ^ int(sigs[b])).count("1") <= d
    }
    got_df = dedup.simhash_pairs(
        docs, bits=bits, max_hamming=d, block_col=None
    ).toPandas()
    got = {(r.id_a, r.id_b) for r in got_df.itertuples()}
    assert got == expect
    # at least one found pair must differ in a top-8 bit (would be missed by
    # high-byte blocking) for the test to be non-vacuous
    assert any((int(sigs[a]) ^ int(sigs[b])) >> (bits - 8) != 0 for a, b in got)


def test_winnow_fingerprint_overlap(spark):
    """Winnowing guarantees: a document sharing a long substring with another
    shares fingerprints (the whole point vs whole-doc hashing); disjoint
    content shares ~none; a doc is a near-complete fingerprint superset of
    its own prefix."""
    from sketches_go_spark.operators import text as ops_text

    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                base,
                base + " with an extra tail sentence appended here",
                "completely different content about skyscrapers and violins!!",
                base[:40],
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    fps = ops_text.winnow_fingerprints(df, k=8, w=4).toPandas()
    sets = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
    # shared long substring -> high overlap
    assert len(sets[1] & sets[2]) / len(sets[1]) > 0.7
    # disjoint content -> no overlap
    assert not (sets[1] & sets[3])
    # prefix doc's fingerprints mostly contained in the full doc's
    assert len(sets[4] & sets[1]) / len(sets[4]) > 0.6


def test_kmeans_recovers_clusters_and_is_partition_invariant(spark):
    """Lloyd's k-means on well-separated synthetic clusters: assignments
    must (a) be pure (every true cluster maps to one learned cluster),
    (b) be identical under a different input partitioning — the
    determinism the integer-grid arithmetic exists to guarantee."""
    from sketches_go_spark.operators import similarity as sim

    rng = np.random.default_rng(5)
    k, per, dim = 4, 120, 16
    centers = rng.normal(size=(k, dim)) * 2.0
    vecs = np.repeat(centers, per, axis=0) + rng.normal(
        scale=0.05, size=(k * per, dim)
    )
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(k * per),
            "embedding": [r.astype(np.float32).tolist() for r in vecs],
            "true_cl": np.repeat(np.arange(k), per),
        }
    )
    df = spark.createDataFrame(pdf)
    a1, cent = sim.kmeans_fit(df, k=k, iters=5, scale_bits=10)
    got1 = a1.orderBy("vec_id").toPandas()
    # purity: each true cluster lands (almost) wholly in one learned cluster
    merged = got1.merge(pdf[["vec_id", "true_cl"]], on="vec_id")
    purity = (
        merged.groupby("true_cl")["cluster"]
        .agg(lambda s: s.value_counts().iloc[0] / len(s))
        .min()
    )
    assert purity > 0.95
    # partition invariance: identical assignments from a different layout
    a2, _ = sim.kmeans_fit(df.repartition(13), k=k, iters=5, scale_bits=10)
    got2 = a2.orderBy("vec_id").toPandas()
    assert got1["cluster"].tolist() == got2["cluster"].tolist()


def test_kmeans_assignment_plan_has_no_window_or_dist_sort(spark):
    """The per-iteration argmin must compile to a map-side-combinable
    min_by aggregation, NOT a row_number window over the n*k cross-join
    (the round-3 verdict's weak plan): the only Window/Sort allowed in the
    whole fit plan is the k-row seed numbering (keyed on the seed hash),
    and nothing may sort on the distance column."""
    from sketches_go_spark.operators import similarity as sim

    rng = np.random.default_rng(1)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(40),
            "embedding": [r.tolist() for r in rng.normal(size=(40, 8))],
        }
    )
    df = spark.createDataFrame(pdf)
    a, _ = sim.kmeans_fit(df, k=3, iters=3, scale_bits=10)
    plan = a._jdf.queryExecution().optimizedPlan().toString()
    # exactly the one seed window; the old shape added one per iteration
    assert plan.count("windowspecdefinition") == 1
    assert "windowspecdefinition(_id#" not in plan
    hot_lines = [l for l in plan.splitlines() if "Sort " in l or "Window " in l]
    assert not any("_dist" in l for l in hot_lines), hot_lines


def test_ivf_with_trained_codebook_beats_fixed(spark):
    """End-to-end trained-IVF: k-means centroids as the codebook must give
    better (or equal) recall@k at nprobe=1 than the fixed pseudo-random
    codebook on clustered data — the payoff of the training seam."""
    from sketches_go_spark.operators import similarity as sim

    rng = np.random.default_rng(9)
    kc, per, dim = 8, 150, 16
    centers = rng.normal(size=(kc, dim)) * 2.0
    vecs = np.repeat(centers, per, axis=0) + rng.normal(
        scale=0.1, size=(kc * per, dim)
    )
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(kc * per),
            "embedding": [r.astype(np.float32).tolist() for r in vecs],
        }
    )
    df = spark.createDataFrame(pdf)
    queries = df.where(F.col("vec_id") % 150 == 7).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(df, queries, k=5).toPandas()
    truth = {q: set(g["vec_id"]) for q, g in exact.groupby("query_id")}

    _, cent = sim.kmeans_fit(df, k=kc, iters=4, scale_bits=10)
    book = sim.kmeans_centroids(cent, scale_bits=10)

    def recall(res):
        got = {q: set(g["vec_id"]) for q, g in res.groupby("query_id")}
        return np.mean([len(got.get(q, set()) & t) / len(t) for q, t in truth.items()])

    r_trained = recall(
        sim.ivf_topk(df, queries, k=5, n_centroids=kc, nprobe=1, dim=dim,
                     centroids=book).toPandas()
    )
    r_fixed = recall(
        sim.ivf_topk(df, queries, k=5, n_centroids=kc, nprobe=1, dim=dim).toPandas()
    )
    assert r_trained >= r_fixed
    assert r_trained > 0.9

    # the production shape (and the sim_ivf_trained_topk driver query):
    # FIT ON A SAMPLE, index everything — recall must hold
    from sketches_go_spark.functions.expressions import portable_hash64

    train = df.where(
        F.pmod(portable_hash64(F.col("vec_id"), "ivftrain:"), F.lit(4)) < 2
    )
    _, cent_s = sim.kmeans_fit(train, k=kc, iters=4, scale_bits=10)
    book_s = sim.kmeans_centroids(cent_s, scale_bits=10)
    r_sampled = recall(
        sim.ivf_topk(df, queries, k=5, n_centroids=kc, nprobe=1, dim=dim,
                     centroids=book_s).toPandas()
    )
    assert r_sampled > 0.9


def test_image_resize_plumbing(spark):
    """Resize invariants: fit-in-box dims (longest side == box unless the
    source is smaller in that integer math), 16-byte 4x4 thumb, px_sum
    equals the source pixel total, thumb bytes are the 2x2 means."""
    import numpy as np
    from sketches_go_spark.operators import multimodal as mm

    media = mm.synth_media(spark, 24, kind="image")
    out = mm.image_resize(media, box=256).toPandas().set_index("media_id")
    src = media.toPandas().set_index("media_id")
    for mid, r in out.iterrows():
        w, h = int(src.loc[mid, "width"]), int(src.loc[mid, "height"])
        assert r["out_w"] == max(w * 256 // max(w, h), 1)
        assert r["out_h"] == max(h * 256 // max(w, h), 1)
        assert max(r["out_w"], r["out_h"]) <= 256
        img = mm._decode_image_stub(bytes(src.loc[mid, "payload"])).astype(np.int64)
        assert r["px_sum"] == img.sum()
        thumb = np.frombuffer(bytes(r["thumb"]), dtype=np.uint8).reshape(4, 4)
        assert np.array_equal(
            thumb, (img.reshape(4, 2, 4, 2).sum(axis=(1, 3)) // 4).astype(np.uint8)
        )


def test_winnow_plan_is_shuffle_and_python_free(spark):
    """The per-row higher-order-function formulation must compile to a plan
    with NO Exchange (each doc's fingerprints derive from its own row) and
    no Python eval — the property that makes it linear at corpus scale."""
    from sketches_go_spark.operators import text as ops_text

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        ops_text.winnow_fingerprints(docs, k=8, w=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bpe_token_count_examples(spark):
    from sketches_go_spark.operators import text as ops_text

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["hello world", "it's 2024, ok?!", "", "  a  b  "],
        }
    )
    df = spark.createDataFrame(pdf)
    out = (
        df.select("doc_id", ops_text.bpe_token_count(F.col("text")).alias("n"))
        .toPandas()
        .set_index("doc_id")["n"]
    )
    # "hello"," world" -> 2 ; "it","'","s"," 2024",","," ok","?!" -> 7
    assert out[1] == 2
    assert out[2] == 7
    assert out[3] == 0
    assert out[4] == 2


def test_pigeonhole_bounded_buckets_at_scale(spark):
    """10^5 random 60-bit fingerprints + 300 planted near-dups: the
    pigeonhole join must (a) recover every planted pair — losslessness at
    scale — and (b) keep per-segment bucket populations tiny (15-bit segment
    values spread 10^5 docs over 32768 buckets, ~3 docs/bucket), i.e. the
    candidate join stays linear-ish, not quadratic — the round-2 toy-sizing
    finding, fixed by the 60-bit default."""
    rng = np.random.default_rng(19)
    n, planted, bits, d = 100_000, 300, 60, 3
    sigs = rng.integers(0, 1 << bits, n, dtype=np.int64)
    near = sigs[:planted].copy()
    for i in range(planted):
        for bit in rng.choice(bits, rng.integers(1, d + 1), replace=False):
            near[i] ^= np.int64(1) << np.int64(bit)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n + planted),
            "simhash": np.concatenate([sigs, near]),
        }
    )
    sig_df = spark.createDataFrame(pdf).repartition(16).withColumn("_blk", F.lit(0))
    pairs = dedup.pigeonhole_hamming_pairs(sig_df, "doc_id", "simhash", bits, d)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    for i in range(planted):
        if sigs[i] != near[i]:
            assert (i, n + i) in got, f"planted pair {i} missed"
    # bucket-population bound: max docs sharing one (seg, segval) key
    nseg = d + 1
    bounds = [round(i * bits / nseg) for i in range(nseg + 1)]
    all_sigs = np.concatenate([sigs, near]).astype(np.uint64)
    max_bucket = 0
    for i in range(nseg):
        width = bounds[i + 1] - bounds[i]
        vals = (all_sigs >> np.uint64(bounds[i])) & np.uint64((1 << width) - 1)
        _, counts = np.unique(vals, return_counts=True)
        max_bucket = max(max_bucket, int(counts.max()))
    assert max_bucket < 40, f"hot bucket of {max_bucket} docs — blocking degenerated"


def test_banded_lsh_recall_at_scale(spark):
    """10^5 clustered vectors: banded multi-probe LSH with band_bits scaled
    ~log2(n) must recover >= 0.9 of the exact top-k neighbors — the recall
    target the single-fixed-bucket scheme could not meet."""
    rng = np.random.default_rng(7)
    n_clusters, per, dim = 1000, 100, 16
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0) + rng.normal(
        scale=0.08, size=(n_clusters * per, dim)
    )
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n_clusters * per),
            "embedding": [row.astype(np.float32).tolist() for row in vecs],
        }
    )
    embs = spark.createDataFrame(pdf).repartition(8)
    n_q, k = 15, 10
    queries = embs.where(
        (F.col("vec_id") % per == 0) & (F.col("vec_id") < n_q * per)
    ).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = sim.brute_force_topk(embs, queries, k=k).toPandas()
    band_bits = sim.auto_band_bits(n_clusters * per, target_bucket_size=128)
    assert band_bits == 10  # the scale knob actually scaled
    ann = sim.lsh_ann_topk(
        embs, queries, k=k, n_bands=8, band_bits=band_bits, dim=dim,
        multi_probe=True,
    ).toPandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    ann_sets = ann.groupby("query_id")["vec_id"].apply(set)
    recall = np.mean(
        [len(exact_sets[q] & ann_sets.get(q, set())) / k for q in exact_sets.index]
    )
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_ivf_full_probe_equals_bruteforce(spark):
    """With nprobe == n_centroids every cell is probed, so IVF must equal
    the exact brute-force top-k EXACTLY; with a partial probe it must still
    find a decent fraction (clustered data not guaranteed here, so the
    bound is loose)."""
    embs = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    queries = embs.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.brute_force_topk(embs, queries, k=5).toPandas()
    full = sim.ivf_topk(
        embs, queries, k=5, n_centroids=8, nprobe=8
    ).toPandas()
    le = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    lf = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (le["vec_id"] == lf["vec_id"]).all()
    assert (le["sim"] == lf["sim"]).all()
    part = sim.ivf_topk(embs, queries, k=5, n_centroids=8, nprobe=3).toPandas()
    exact_sets = exact.groupby("query_id")["vec_id"].apply(set)
    part_sets = part.groupby("query_id")["vec_id"].apply(set)
    recall = np.mean(
        [len(exact_sets[q] & part_sets.get(q, set())) / 5 for q in exact_sets.index]
    )
    assert recall >= 0.3


def test_connected_components_vs_union_find(spark):
    """Random sparse graph: star-contraction labels == exact union-find,
    including long chains (worst case for naive one-hop propagation) and a
    high-degree hub (the skew case large-star splits)."""
    rng = np.random.default_rng(7)
    n = 400
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (300, 2))]
    edges += [(i, i + 1) for i in range(500, 560)]      # 61-node chain
    edges += [(600, 600 + i) for i in range(1, 80)]      # 80-node hub
    edges += [(700, 700)]                                # self loop only

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    exact = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(df).collect()
    }
    assert got == exact
    # the opt-in pointer-jump path must produce the identical labeling
    # (it composes the relation with its own min-parent map, which
    # preserves components exactly — this pins the claim)
    jumped = {
        r["node"]: r["component"]
        for r in dedup.connected_components(df, pointer_jump=True).collect()
    }
    assert jumped == exact


def test_connected_components_partition_invariance(spark):
    edges = [(i, i + 1) for i in range(0, 40)] + [(100, 101), (101, 102)]
    a = spark.createDataFrame(edges, "id_a bigint, id_b bigint").repartition(1)
    b = spark.createDataFrame(edges[::-1], "id_a bigint, id_b bigint").repartition(13)
    ra = sorted(map(tuple, dedup.connected_components(a).collect()))
    rb = sorted(map(tuple, dedup.connected_components(b).collect()))
    assert ra == rb
    assert all(c == 0 for _, c in ra[:41])


def test_sampling_deterministic_and_nested(spark):
    from sketches_go_spark.operators import sampling

    df = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    s10 = {r[0] for r in sampling.deterministic_sample(df, rate=0.10).collect()}
    s01 = {r[0] for r in sampling.deterministic_sample(df, rate=0.01).collect()}
    assert s01 <= s10, "same-salt samples must nest"
    assert 0.05 < len(s10) / 5000 < 0.15
    # stable under repartitioning
    s10b = {
        r[0]
        for r in sampling.deterministic_sample(df.repartition(17), rate=0.10).collect()
    }
    assert s10 == s10b


def test_hash_split_partitions_every_row_once(spark):
    from sketches_go_spark.operators import sampling

    df = spark.range(0, 3000).withColumnRenamed("id", "doc_id")
    out = sampling.hash_split(df, weights={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 3000
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 2200


def test_stratified_topk_exact_group_sizes(spark):
    from sketches_go_spark.operators import sampling

    rows = [(i, "a" if i % 3 == 0 else "b") for i in range(100)] + [(1000, "tiny")]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = sampling.stratified_topk_sample(df, ["lang"], k=7)
    sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"a": 7, "b": 7, "tiny": 1}


def test_sessionize_gap_boundary(spark):
    from sketches_go_spark.operators import temporal

    # gaps of exactly `gap` do NOT split; strictly greater does
    rows = [(1, 10, 0), (1, 11, 100), (1, 12, 200), (1, 13, 301), (2, 20, 0)]
    df = spark.createDataFrame(rows, "k bigint, eid bigint, ts bigint")
    out = temporal.sessionize(df, "k", "ts", "eid", gap=100)
    got = {r["eid"]: r["session_idx"] for r in out.collect()}
    assert got == {10: 0, 11: 0, 12: 0, 13: 1, 20: 0}


def test_asof_join_matches_pandas_merge_asof(spark):
    from sketches_go_spark.operators import temporal

    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "k": rng.integers(0, 5, 200),
        "ts": rng.integers(0, 1000, 200),
        "lid": np.arange(200),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 5, 300),
        "ts": rng.integers(0, 1000, 300),
        "rid": np.arange(300),
    })
    # pandas merge_asof backward-inclusive needs sorted inputs; equal right
    # ts within a key are disambiguated by taking the LAST row (same rule as
    # the operator's highest-tiebreak-wins), which merge_asof does natively
    lp = left.sort_values(["ts", "lid"], kind="stable")
    rp = right.sort_values(["ts", "rid"], kind="stable")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    exp_map = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in exp.itertuples()
    }

    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    out = temporal.asof_join(
        ldf, rdf, "k", "ts", "ts", ["rid"], "lid", "rid", how="left"
    )
    got = {
        int(r["lid"]): (None if r["asof_rid"] is None else int(r["asof_rid"]))
        for r in out.collect()
    }
    assert got == exp_map
    # inner drops exactly the unmatched
    inner = temporal.asof_join(
        ldf, rdf, "k", "ts", "ts", ["rid"], "lid", "rid", how="inner"
    )
    assert inner.count() == sum(v is not None for v in got.values())


def test_temporal_plans_single_exchange(spark):
    """The scale claim in operators/temporal.py docstrings, asserted on the
    physical plan: sessionize and asof_join each cost exactly ONE Exchange
    (the hash partitioning on the entity key) — no join, no extra shuffle."""
    from sketches_go_spark.operators import temporal

    ev = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 200), (2, 12, 50)], "k bigint, eid bigint, ts bigint"
    )
    plan_s = (
        temporal.sessionize(ev, "k", "ts", "eid", gap=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan_s.count("Exchange") == 1, plan_s
    plan_a = (
        temporal.asof_join(ev, ev, "k", "ts", "ts", ["eid"], "eid", "eid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan_a.count("Exchange") == 1, plan_a


def test_sessionize_vs_native_session_window(spark):
    """The lag-gap-cumsum formulation and Spark's native session_window
    produce identical sessions — including AT the exact-gap boundary, where
    both MERGE (split is strictly-greater for both; this pins the rule the
    streaming_session_stats oracle replays)."""
    from sketches_go_spark.operators import temporal

    rng = np.random.default_rng(3)
    rows = []
    eid = 0
    for k in range(20):
        t = 0
        for _ in range(50):
            # gaps of 1..99 or 101..200 seconds — never exactly 100
            g = int(rng.integers(1, 100)) + (100 if rng.random() < 0.3 else 0)
            g = g if g != 100 else 101
            t += g
            rows.append((k, eid, t))
            eid += 1
    df = spark.createDataFrame(rows, "k bigint, eid bigint, ts bigint")
    mine = (
        temporal.sessionize(df, "k", "ts", "eid", gap=100)
        .groupBy("k", "session_idx")
        .agg(F.min("eid").alias("first"), F.count(F.lit(1)).alias("n"))
    )
    native = (
        df.select(
            "k", "eid", F.timestamp_seconds(F.col("ts")).alias("tsx")
        )
        .groupBy("k", F.session_window("tsx", "100 seconds"))
        .agg(F.min("eid").alias("first"), F.count(F.lit(1)).alias("n"))
    )
    a = sorted((r["k"], r["first"], r["n"]) for r in mine.collect())
    b = sorted((r["k"], r["first"], r["n"]) for r in native.collect())
    assert a == b
    # boundary: exactly gap apart
    bdf = spark.createDataFrame([(1, 0, 0), (1, 1, 100)], "k bigint, eid bigint, ts bigint")
    assert (
        temporal.sessionize(bdf, "k", "ts", "eid", gap=100)
        .agg(F.max("session_idx")).collect()[0][0] == 0
    )
    nb = (
        bdf.select("k", F.timestamp_seconds(F.col("ts")).alias("tsx"))
        .groupBy("k", F.session_window("tsx", "100 seconds")).count()
    )
    assert nb.count() == 1  # exact-gap events merge in session_window too


def test_connected_components_scale_and_rounds(spark):
    """30k-edge graph of long chains + hubs + random noise: labels equal
    union-find and the alternating star contraction converges in far fewer
    rounds than max_iters (the O(log^2 n) claim, observed)."""
    rng = np.random.default_rng(17)
    edges = []
    nid = 0
    for _ in range(200):          # 200 chains of length 60
        base = nid
        edges += [(base + i, base + i + 1) for i in range(59)]
        nid += 60
    for _ in range(50):           # 50 hubs of fanout 120
        base = nid
        edges += [(base, base + 1 + i) for i in range(120)]
        nid += 121
    extra = rng.integers(0, nid, (12000, 2))
    edges += [(int(a), int(b)) for a, b in extra]

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        if a != b:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    exact = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint").repartition(16)
    got = {
        r["node"]: r["component"]
        for r in dedup.connected_components(df, max_iters=12).collect()
    }
    assert got == exact  # max_iters=12 sufficing IS the convergence claim


def test_asof_join_forward_matches_pandas(spark):
    from sketches_go_spark.operators import temporal

    rng = np.random.default_rng(23)
    left = pd.DataFrame({
        "k": rng.integers(0, 4, 150),
        "ts": rng.integers(0, 800, 150),
        "lid": np.arange(150),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 4, 200),
        "ts": rng.integers(0, 800, 200),
        "rid": np.arange(200),
    })
    lp = left.sort_values(["ts", "lid"], kind="stable")
    rp = right.sort_values(["ts", "rid"], kind="stable")
    exp = pd.merge_asof(lp, rp, on="ts", by="k", direction="forward")
    # pandas forward takes the FIRST of equal-ts right rows; our rule is
    # highest-tiebreak-wins symmetric with backward, so only compare rows
    # where the chosen ts is unambiguous OR accept either — instead compare
    # the matched TS value, which is direction-defining and tie-free
    rts = right.set_index("rid")["ts"]
    exp_ts = {
        int(r.lid): (None if pd.isna(r.rid) else int(rts[int(r.rid)]))
        for r in exp.itertuples()
    }
    out = temporal.asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        "k", "ts", "ts", ["rid", "ts"], "lid", "rid",
        how="left", direction="forward",
    )
    got_ts = {
        int(r["lid"]): (None if r["asof_ts"] is None else int(r["asof_ts"]))
        for r in out.collect()
    }
    assert got_ts == exp_ts


def test_connected_components_durable_resume(spark, tmp_path):
    """checkpoint_dir makes the iteration durable: a converged manifest
    returns without running rounds; a truncated manifest (simulated crash)
    resumes mid-iteration and completes to identical labels."""
    import json

    ckpt = str(tmp_path / "cc")
    edges = [(i, i + 1) for i in range(0, 20)] + [(100, 101)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    ref = sorted(map(tuple, dedup.connected_components(df).collect()))

    r1 = sorted(map(tuple, dedup.connected_components(
        df, checkpoint_dir=ckpt).collect()))
    assert r1 == ref
    manifest = f"{ckpt}/manifest.jsonl"
    lines = [json.loads(ln) for ln in open(manifest)]
    assert lines[-1]["converged"]

    # converged fast-path: input ignored, no new rounds appended
    empty = spark.createDataFrame([], "id_a bigint, id_b bigint")
    r2 = sorted(map(tuple, dedup.connected_components(
        empty, checkpoint_dir=ckpt).collect()))
    assert r2 == ref
    assert len(open(manifest).readlines()) == len(lines)

    # crash simulation: manifest truncated to round 1, parquet kept
    keep = [ln for ln in lines if ln["round"] <= 1 and not ln["converged"]]
    with open(manifest, "w") as f:
        for ln in keep:
            f.write(json.dumps(ln) + "\n")
    r3 = sorted(map(tuple, dedup.connected_components(
        empty, checkpoint_dir=ckpt).collect()))
    assert r3 == ref


def test_hash_fn_switch_production_xxhash(spark):
    """Every hashing operator takes hash_fn; the production xxhash64 family
    (JVM-intrinsic, no md5) keeps the semantics: planted near-dups still
    found, identical texts still collide, sample rates still hold, KMV
    estimates still track truth."""
    from sketches_go_spark.functions.expressions import xxhash64_fn
    from sketches_go_spark.functions import sketch_fns as sk
    from sketches_go_spark.operators import sampling

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    lsh = dedup.minhash_lsh_pairs(docs, threshold=0.9, hash_fn=xxhash64_fn)
    jac = dedup.ngram_jaccard_pairs(docs, threshold=0.9)
    lsh_pairs = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    jac_pairs = {(r["id_a"], r["id_b"]) for r in jac.collect()}
    assert lsh_pairs <= jac_pairs and len(lsh_pairs) >= 0.8 * len(jac_pairs)

    dup = spark.createDataFrame(
        [(1, "same text here"), (2, "same text here"), (3, "other words")],
        "doc_id bigint, text string",
    )
    ph = dedup.simhash_pairs(
        dup, bits=60, max_hamming=0, hash_fn=xxhash64_fn
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in ph] == [(1, 2)]

    ids = spark.range(0, 5000).withColumnRenamed("id", "doc_id")
    n = sampling.deterministic_sample(ids, rate=0.1, hash_fn=xxhash64_fn).count()
    assert 0.05 < n / 5000 < 0.15

    g = spark.range(0, 9000).select(
        F.lit("g").alias("g"), (F.col("id") % 3000).cast("string").alias("item")
    )
    est = sk.kmv_estimate_from_sketch(
        sk.kmv_sketch(g, "item", ["g"], k=256, hash_fn=xxhash64_fn), ["g"], k=256
    ).collect()[0]["est"]
    assert abs(est - 3000) / 3000 < 0.2


def test_interval_join_vs_bruteforce(spark):
    """Overlapping intervals, boundary inclusivity, left rows with no match,
    and bucket-width independence — all vs a brute-force cross filter."""
    from sketches_go_spark.operators import temporal

    rng = np.random.default_rng(31)
    # negative timestamps included: floor-division bucketing must align
    # identically for points and intervals below zero
    pts = [(int(k), int(t), i) for i, (k, t) in enumerate(
        zip(rng.integers(0, 3, 120), rng.integers(-250, 250, 120)))]
    ivs = []
    for j in range(40):
        s = int(rng.integers(-250, 230))
        ivs.append((int(rng.integers(0, 3)), s, s + int(rng.integers(0, 80)), j))
    p = spark.createDataFrame(pts, "k bigint, ts bigint, pid bigint")
    v = spark.createDataFrame(ivs, "k bigint, s bigint, e bigint, iid bigint")
    exp = {
        (pid, iid)
        for (pk, pt_, pid) in pts
        for (ik, s, e, iid) in ivs
        if pk == ik and s <= pt_ <= e
    }
    for width in (7, 64, 1000):
        out = temporal.interval_join(
            p, v, "k", "ts", "s", "e", ["iid"], bucket_width=width
        )
        got = {(r["pid"], r["ivl_iid"]) for r in out.collect()}
        assert got == exp, width
    # left keeps unmatched points with null payload
    left = temporal.interval_join(
        p, v, "k", "ts", "s", "e", ["iid"], bucket_width=64, how="left"
    )
    matched_pids = {pid for pid, _ in exp}
    rows = left.collect()
    assert {r["pid"] for r in rows if r["ivl_iid"] is None} == (
        {pid for _, _, pid in pts} - matched_pids
    )


def test_new_relational_queries_are_python_free(spark):
    """KMV overlap, sliding cubes, interval join: pure Catalyst — no Python
    evaluation node anywhere in the physical plan."""
    import __spark_entry__ as e

    for name in (
        "kmv_event_type_user_overlap",
        "ddsketch_sliding_quantiles",
        "hll_sliding_distinct",
        "interval_join_session_events",
        "sessionize_user_events",
        "asof_purchase_last_click",
    ):
        df = e.queries()[name](spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas",
                       "MapInPandas", "AggregateInPandas"):
            assert marker not in plan, (name, marker)


def test_asof_filters_reach_the_scan(spark):
    """Predicate pushdown evidence: the event_type filters land in the
    parquet scan's PushedFilters (each side scans only its slice's
    row groups), not in a post-scan Filter."""
    import __spark_entry__ as e

    df = e.queries()["asof_purchase_last_click"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "EqualTo(event_type,purchase)" in plan
    assert "EqualTo(event_type,click)" in plan


def test_winnow_containment_asymmetry(spark):
    """A short doc pasted inside a long one: containment of the short side
    ~1 while the long side's stays low — the asymmetric signal the operator
    exists for (plain Jaccard would score this pair low)."""
    from sketches_go_spark.operators import text as ops_text

    rng = np.random.default_rng(41)
    vocab = [f"w{c}" for c in rng.integers(10000, 99999, 200)]
    long_doc = " ".join(vocab)  # non-repetitive: distinct k-grams throughout
    short_doc = long_doc[200:650]  # verbatim passage from the middle
    df = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, "entirely different material here xyz")],
        "doc_id bigint, text string",
    )
    rows = ops_text.winnow_containment_pairs(df, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): (r["cont_a"], r["cont_b"]) for r in rows}
    assert (1, 2) in pairs
    ca, cb = pairs[(1, 2)]
    # short side strongly contained; long side clearly not (winnow boundary
    # windows keep cont of an exact passage below 1.0 — asymmetry is the
    # detection signal, not an absolute 1.0)
    assert cb >= 0.7 and cb > ca + 0.3, (ca, cb)
    assert not any(3 in p for p in pairs)


def test_hash_split_entity_alignment_across_tables(spark):
    """The documented joinability promise: two different tables sampled/split
    on the same entity key assign every shared entity identically, so
    feature tables stay aligned with their labels."""
    from sketches_go_spark.operators import sampling

    a = spark.range(0, 2000).select(F.col("id").alias("doc_id"),
                                    (F.col("id") * 2).alias("feat"))
    b = spark.range(500, 2500).select(F.col("id").alias("doc_id"),
                                      (F.col("id") % 7).alias("label"))
    sa = {r["doc_id"]: r["split"] for r in sampling.hash_split(a).collect()}
    sb = {r["doc_id"]: r["split"] for r in sampling.hash_split(b).collect()}
    shared = set(sa) & set(sb)
    assert len(shared) == 1500
    assert all(sa[k] == sb[k] for k in shared)


def test_funnel_ordering_and_within(spark):
    from sketches_go_spark.operators import temporal

    rows = [
        # u1: full ordered funnel
        (1, "A", 10), (1, "B", 20), (1, "C", 30),
        # u2: B BEFORE A -> stops at step 1 (has A, no B after it)
        (2, "B", 5), (2, "A", 10),
        # u3: A then B, C missing
        (3, "A", 10), (3, "B", 15),
        # u4: ordered but slow: B at t1+100
        (4, "A", 0), (4, "B", 100), (4, "C", 101),
    ]
    df = spark.createDataFrame(rows, "u bigint, t string, ts bigint")
    out = {r["step"]: (r["users"], r["conversion"]) for r in
           temporal.funnel(df, "u", "t", "ts", ["A", "B", "C"]).collect()}
    assert out[1] == (4, 1.0)
    assert out[2] == (3, 0.75)   # u2 excluded: its B precedes its A
    assert out[3] == (2, 0.5)
    # within=50 of the FIRST step: u4's B at +100 drops out
    outw = {r["step"]: r["users"] for r in
            temporal.funnel(df, "u", "t", "ts", ["A", "B", "C"], within=50).collect()}
    assert outw[2] == 2 and outw[3] == 1
    with pytest.raises(ValueError):
        temporal.funnel(df, "u", "t", "ts", ["A"])


def test_funnel_is_single_job(spark):
    """The round-4 rewrite computes every per-step count in ONE action (one
    per-entity aggregation + one global count agg) — the previous shape ran
    len(steps)+1 serial ``count()`` jobs.  Pin it with a job-group count
    (AQE off so one action == one job)."""
    from sketches_go_spark.operators import temporal

    rows = [(u, t, ts) for u in range(20)
            for t, ts in (("A", 10), ("B", 20), ("C", 30))]
    df = spark.createDataFrame(rows, "u bigint, t string, ts bigint")
    sc = spark.sparkContext
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sc.setJobGroup("funnel-job-count", "funnel single-job assertion")
        out = temporal.funnel(df, "u", "t", "ts", ["A", "B", "C"])
        jobs = sc.statusTracker().getJobIdsForGroup("funnel-job-count")
        assert len(jobs) == 1, jobs
    finally:
        sc.setJobGroup("", "")
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert {r["step"]: r["users"] for r in out.collect()} == {1: 20, 2: 20, 3: 20}


def test_retention_triangle_invariants(spark):
    """Cohort semantics: activity never precedes the cohort week, and each
    cohort's week-0 row counts exactly its members (everyone is active in
    their first week by definition)."""
    import __spark_entry__ as e

    rows = e.queries()["retention_weekly"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    sizes = {}
    for r in rows:
        assert r["week"] >= r["cohort"]
        if r["week"] == r["cohort"]:
            sizes[r["cohort"]] = r["users"]
    # every cohort has its week-0 row
    assert set(sizes) == {r["cohort"] for r in rows}
    # retention never exceeds the cohort size
    assert all(r["users"] <= sizes[r["cohort"]] for r in rows)


# ------------------------------------------------------- round-4 operators
def test_redact_patterns_and_ordering(spark):
    """Each PII family is replaced with its token and counted; ordering
    (email -> phone -> ip) means an IP-shaped domain inside an email is
    consumed by the email stage, never double-counted."""
    from sketches_go_spark.operators import text as T

    rows = [
        (1, "write to a.b-c_d@sub.example.org or +1 (555) 010-9999 now"),
        (2, "server at 192.168.1.100 and 10.0.0.1"),
        (3, "no pii here, just 12345 and version 1.2"),
        (4, "double john@x.co jane@y.io and +44 20 7946 0958"),
        (5, "edge: user@10.0.0.1.nip.io resolves"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in T.redact(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 1, 0)
    assert out[2]["n_ipv4"] == 2 and out[2]["n_email"] == 0
    # "version 1.2" must not look like an IP; bare numbers are not phones
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 0)
    assert out[4]["n_email"] == 2 and out[4]["n_phone"] == 1
    # the ip-shaped domain is inside the email match -> email eats it
    assert out[5]["n_email"] == 1 and out[5]["n_ipv4"] == 0
    assert "[EMAIL]" in out[1]["text_redacted"]
    assert "[PHONE]" in out[1]["text_redacted"]
    assert "@" not in out[4]["text_redacted"]


def test_tfidf_top_terms_exact_and_tiebreak(spark):
    """Hand-checked tf-idf on a 3-doc corpus: rare terms outrank common
    ones, and equal scores break ties alphabetically by term."""
    import math

    from sketches_go_spark.operators import text as T

    rows = [
        (1, "apple apple banana"),
        (2, "apple cherry"),
        (3, "apple banana banana date"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["doc_id"], r["rank"]): r
    for r in T.tfidf_top_terms(df, k=2).collect()}
    idf = lambda dfreq: math.log(4.0 / (dfreq + 1)) + 1.0
    # doc 1: apple tf=2 df=3 -> 2*idf(3); banana tf=1 df=2 -> idf(2)
    assert got[(1, 1)]["term"] == "apple"
    assert got[(1, 1)]["score"] == round(2 * idf(3), 6)
    assert got[(1, 2)]["term"] == "banana"
    # doc 2: apple and cherry both tf=1; cherry rarer -> first
    assert got[(2, 1)]["term"] == "cherry"
    assert got[(2, 1)]["score"] == round(idf(1), 6)
    assert got[(2, 2)]["term"] == "apple"
    # doc 3: banana tf=2 wins over date (tf=1, rarer)
    assert got[(3, 1)]["term"] == "banana"


def test_pack_sequences_invariants_and_partition_invariance(spark):
    """Packing conservation laws: every doc's tokens_in_pack sum to its
    n_tokens; within a shard every pack except the last holds exactly
    `capacity` tokens; each doc spans contiguous packs; the layout is
    identical under a different input partitioning."""
    from sketches_go_spark.operators.packing import pack_sequences

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {"doc_id": np.arange(300), "n_tokens": rng.integers(1, 90, size=300)}
    )
    df = spark.createDataFrame(pdf)
    out = pack_sequences(df, capacity=64, n_shards=4).toPandas()
    # conservation per doc
    per_doc = out.groupby("doc_id")["tokens_in_pack"].sum()
    exp = pdf.set_index("doc_id")["n_tokens"]
    assert (per_doc == exp.loc[per_doc.index]).all()
    # every pack holds exactly `capacity` tokens except each shard's last
    per_pack = out.groupby(["shard", "pack_id"])["tokens_in_pack"].sum()
    for shard, grp in per_pack.groupby(level=0):
        assert (grp.iloc[:-1] == 64).all()
        assert 0 < grp.iloc[-1] <= 64
    # contiguous span per doc
    for _, g in out.groupby("doc_id"):
        ps = sorted(g["pack_id"])
        assert ps == list(range(ps[0], ps[0] + len(ps)))
    # partition invariance
    out2 = pack_sequences(
        df.repartition(13), capacity=64, n_shards=4
    ).toPandas()
    key = ["doc_id", "pack_id"]
    assert (
        out.sort_values(key).reset_index(drop=True).equals(
            out2.sort_values(key).reset_index(drop=True)
        )
    )


def test_ddsketch_cdf_monotone_and_alpha_accurate(spark):
    """CDF estimates from the bins relation are monotone in the threshold
    and match the exact empirical CDF within the bucket containing each
    threshold (rank error <= mass of one alpha-wide bucket)."""
    from sketches_go_spark.core.ddsketch import DDSketchConfig
    from sketches_go_spark.functions import ddsketch_fns as dd

    cfg = DDSketchConfig(alpha=0.01)
    m = cfg.mapping()
    rng = np.random.default_rng(3)
    vals = rng.lognormal(mean=2.0, sigma=1.0, size=20000)
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["a"] * len(vals), "v": vals})
    )
    bins = dd.build_bins(df, "v", ["g"], cfg)
    total = F.sum("count")
    aggs = []
    ths = (2.0, 8.0, 30.0, 120.0)
    for t in ths:
        it = int(m.index_scalar(float(t)))
        mass = F.sum(
            F.when(
                (F.col("sign") < 1)
                | ((F.col("sign") == 1) & (F.col("bucket") <= F.lit(it))),
                F.col("count"),
            ).otherwise(F.lit(0.0))
        )
        aggs.append((mass / total).alias(f"f{t}"))
    row = bins.groupBy("g").agg(*aggs).collect()[0]
    fr = [row[f"f{t}"] for t in ths]
    assert all(a <= b for a, b in zip(fr, fr[1:]))
    for t, f in zip(ths, fr):
        exact = float(np.mean(vals <= t))
        # estimator counts whole buckets: error bounded by the mass near the
        # threshold's bucket edge (loose 2-alpha-wide value band)
        band = float(
            np.mean((vals > t * (1 - 0.025)) & (vals <= t * (1 + 0.025)))
        )
        assert abs(f - exact) <= band + 1e-9, (t, f, exact, band)


def test_asof_nearest_matches_pandas_and_tie_rules(spark):
    """Distance-to-match equals pandas merge_asof(direction='nearest') on
    random keyed data (distance is tie-rule-independent), and the operator's
    documented tie rules hold on crafted cases: equal distance -> backward
    wins; equal backward ts -> highest id; equal forward ts -> lowest id."""
    from sketches_go_spark.operators import temporal

    rng = np.random.default_rng(23)
    left = pd.DataFrame({
        "k": rng.integers(0, 5, 150),
        "ts": rng.integers(0, 1000, 150),
        "lid": np.arange(150),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 5, 200),
        "ts": rng.integers(0, 1000, 200),
        "rid": np.arange(200),
    })
    lp = left.sort_values(["ts", "lid"], kind="stable")
    rp = right.sort_values(["ts", "rid"], kind="stable")
    exp = pd.merge_asof(lp, rp, on="ts", by="k",
                        direction="nearest", suffixes=("", "_r"))
    # reconstruct the matched right ts to get tie-independent distances
    rts = right.set_index("rid")["ts"]
    exp_d = {
        int(r.lid): (None if pd.isna(r.rid) else abs(int(r.ts) - int(rts[int(r.rid)])))
        for r in exp.itertuples()
    }
    out = temporal.asof_nearest(
        spark.createDataFrame(left), spark.createDataFrame(right),
        "k", "ts", "ts", ["rid"], "lid", "rid", how="left",
    )
    got_d = {
        int(r["lid"]): (None if r["asof_rid"] is None else int(r["asof_distance"]))
        for r in out.collect()
    }
    assert got_d == exp_d

    # crafted tie cases on one key
    lt = spark.createDataFrame([(1, 100, 1), (1, 50, 2)], "k int, ts int, lid int")
    rt = spark.createDataFrame(
        [(1, 90, 10), (1, 90, 11), (1, 110, 20), (1, 110, 21), (1, 40, 30)],
        "k int, ts int, rid int",
    )
    res = {
        r["lid"]: (r["asof_rid"], r["asof_distance"])
        for r in temporal.asof_nearest(
            lt, rt, "k", "ts", "ts", ["rid"], "lid", "rid"
        ).collect()
    }
    # lid 1 at ts=100: prev at 90 (dist 10) vs next at 110 (dist 10) — tie
    # -> backward wins, and among the two ts=90 rows the highest rid (11)
    assert res[1] == (11, 10.0)
    # lid 2 at ts=50: prev at 40 (dist 10) beats next at 90 (dist 40)
    assert res[2] == (30, 10.0)

    # forward-tie rule: only future rows, duplicated ts -> lowest rid
    lt2 = spark.createDataFrame([(1, 10, 1)], "k int, ts int, lid int")
    res2 = temporal.asof_nearest(
        lt2, rt, "k", "ts", "ts", ["rid"], "lid", "rid"
    ).collect()[0]
    assert (res2["asof_rid"], res2["asof_distance"]) == (30, 30.0)
    lt3 = spark.createDataFrame([(1, 120, 1)], "k int, ts int, lid int")
    res3 = temporal.asof_nearest(
        lt3, rt, "k", "ts", "ts", ["rid"], "lid", "rid"
    ).collect()[0]
    # prev: ts=110 dist 10 (highest rid 21) beats nothing forward
    assert (res3["asof_rid"], res3["asof_distance"]) == (21, 10.0)


def test_asof_nearest_and_pack_plans_single_exchange(spark):
    """Scale claims asserted on physical plans: asof_nearest costs ONE
    Exchange (the second frame window reuses the union sort), and
    pack_sequences costs ONE Exchange (the shard window; the explode and
    interval arithmetic are per-row)."""
    from sketches_go_spark.operators import temporal
    from sketches_go_spark.operators.packing import pack_sequences

    ev = spark.createDataFrame(
        [(1, 10, 100), (1, 11, 200), (2, 12, 50)], "k bigint, eid bigint, ts bigint"
    )
    plan_n = (
        temporal.asof_nearest(ev, ev, "k", "ts", "ts", ["eid"], "eid", "eid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan_n.count("Exchange") == 1, plan_n

    toks = spark.createDataFrame(
        [(i, 10 + i % 5) for i in range(50)], "doc_id bigint, n_tokens bigint"
    )
    plan_p = (
        pack_sequences(toks, capacity=16, n_shards=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan_p.count("Exchange") == 1, plan_p


def test_pack_sequences_production_hash_family(spark):
    """The hash-family seam: packing under the JVM-intrinsic xxhash64
    family keeps every invariant (conservation, exact pack fill,
    partition invariance) — only the shard assignment differs from the
    portable-md5 oracle family."""
    from sketches_go_spark.functions.expressions import xxhash64_fn
    from sketches_go_spark.operators.packing import pack_sequences

    rng = np.random.default_rng(17)
    pdf = pd.DataFrame(
        {"doc_id": np.arange(200), "n_tokens": rng.integers(1, 50, size=200)}
    )
    df = spark.createDataFrame(pdf)
    out = pack_sequences(
        df, capacity=64, n_shards=4, hash_fn=xxhash64_fn
    ).toPandas()
    per_doc = out.groupby("doc_id")["tokens_in_pack"].sum()
    assert (per_doc == pdf.set_index("doc_id")["n_tokens"].loc[per_doc.index]).all()
    per_pack = out.groupby(["shard", "pack_id"])["tokens_in_pack"].sum()
    for _, grp in per_pack.groupby(level=0):
        assert (grp.iloc[:-1] == 64).all() and 0 < grp.iloc[-1] <= 64
    out2 = pack_sequences(
        df.repartition(7), capacity=64, n_shards=4, hash_fn=xxhash64_fn
    ).toPandas()
    key = ["doc_id", "pack_id"]
    assert out.sort_values(key).reset_index(drop=True).equals(
        out2.sort_values(key).reset_index(drop=True)
    )


def test_rebalanced_sample_invariants(spark):
    """Group rebalancing: kept counts concentrate near the target, smaller
    targets keep strict subsets (hash-threshold nesting), the smallest
    group is kept whole when target defaults to its size, and membership
    is partition-invariant."""
    from sketches_go_spark.operators.sampling import rebalanced_sample

    rng = np.random.default_rng(31)
    langs = ["en"] * 2000 + ["de"] * 500 + ["zh"] * 100
    pdf = pd.DataFrame({"doc_id": np.arange(len(langs)), "lang": langs})
    df = spark.createDataFrame(pdf)
    out = rebalanced_sample(df, ["lang"]).toPandas()
    sizes = out.groupby("lang").size()
    # smallest group kept whole; larger groups near the 100-target
    assert sizes["zh"] == 100
    assert 60 <= sizes["en"] <= 140 and 60 <= sizes["de"] <= 140
    # nesting: target 50 keeps a subset of target 100's rows
    small = rebalanced_sample(df, ["lang"], target=50).toPandas()
    assert set(small["doc_id"]) <= set(
        rebalanced_sample(df, ["lang"], target=100).toPandas()["doc_id"]
    )
    # partition invariance
    out2 = rebalanced_sample(df.repartition(13), ["lang"]).toPandas()
    assert set(out["doc_id"]) == set(out2["doc_id"])


def test_chunk_documents_grid_and_coverage(spark):
    """Chunk-grid semantics: every token lands in >=1 chunk when
    stride <= chunk; the tail chunk is the remainder; no fully-redundant
    trailing window; exact grids on hand-sized docs."""
    from sketches_go_spark.operators.packing import chunk_documents

    mk = lambda n: " ".join(f"w{i}" for i in range(n))
    df = spark.createDataFrame(
        [(64, mk(64)), (65, mk(65)), (80, mk(80)), (112, mk(112)),
         (113, mk(113)), (10, mk(10))],
        "doc_id bigint, text string",
    )
    out = chunk_documents(df, chunk_tokens=64, stride=48).toPandas()
    grids = {
        d: sorted(zip(g["start_tok"], g["n_tok"]))
        for d, g in out.groupby("doc_id")
    }
    assert grids[10] == [(0, 10)]
    assert grids[64] == [(0, 64)]
    assert grids[65] == [(0, 64), (48, 17)]
    assert grids[80] == [(0, 64), (48, 32)]
    # start 96 would be fully inside [48, 112) -> not emitted
    assert grids[112] == [(0, 64), (48, 64)]
    assert grids[113] == [(0, 64), (48, 64), (96, 17)]
    # coverage: union of [start, start+n_tok) == [0, n)
    for d, g in out.groupby("doc_id"):
        covered = set()
        for r in g.itertuples():
            covered.update(range(r.start_tok, r.start_tok + r.n_tok))
        assert covered == set(range(int(d))), d
    # chunk text round-trips the token slice
    row = out[(out["doc_id"] == 65) & (out["chunk_idx"] == 1)].iloc[0]
    assert row["chunk_text"] == " ".join(f"w{i}" for i in range(48, 65))


def test_incremental_dedup_matches_full_recompute(spark):
    """Corpus-delta dedup: fingerprints for a new shard joined against a
    stored base index + merged into the stored component star must equal
    the full recompute over the union — including the bridge case where one
    shard doc MERGES two base components, and the property that no
    base<->base candidate is ever generated."""
    # hand-built 12-bit fingerprints; the only <=3-hamming pairs are
    # (1,2) (3,4) base, (10,1) (10,2) (10,3) (10,4) bridge, (11,12) shard
    base = {
        1: 0x000,
        2: 0x001,   # ham(1,2)=1 -> base pair {1,2}
        3: 0xF00,
        4: 0xF01,   # ham(3,4)=1 -> base pair {3,4}
        5: 0x0F0,   # base singleton (>=4 from everything)
    }
    shard = {
        10: 0xC01,  # within 3 of ALL of 1,2,3,4 -> BRIDGES {1,2} and {3,4}
        11: 0xAAA,
        12: 0xAAB,  # shard-internal pair {11,12}
        13: 0x555,  # shard singleton
    }
    bits, d = 12, 3
    sig_base = spark.createDataFrame(
        list(base.items()), "doc_id bigint, simhash bigint"
    )
    sig_shard = spark.createDataFrame(
        list(shard.items()), "doc_id bigint, simhash bigint"
    )

    # stored state: base-only pigeonhole pairs -> components
    base_pairs = dedup.pigeonhole_hamming_pairs(
        sig_base.withColumn("_blk", F.lit(0)), "doc_id", "simhash", bits, d
    )
    assignment = dedup.connected_components(base_pairs)

    delta = dedup.simhash_delta_pairs(
        sig_base, sig_shard, bits=bits, max_hamming=d
    )
    dl = delta.collect()
    shard_ids = set(shard)
    assert dl, "delta must find pairs"
    for r in dl:
        assert r["id_a"] in shard_ids or r["id_b"] in shard_ids, (
            "base<->base pair leaked into the delta", r)
        assert r["id_a"] < r["id_b"]
    # no duplicated normalized pairs (shard<->shard double generation)
    assert len({(r["id_a"], r["id_b"]) for r in dl}) == len(dl)

    inc = {
        r["node"]: r["component"]
        for r in dedup.incremental_components(assignment, delta).collect()
    }
    full_pairs = dedup.pigeonhole_hamming_pairs(
        sig_base.union(sig_shard).withColumn("_blk", F.lit(0)),
        "doc_id", "simhash", bits, d,
    )
    full = {
        r["node"]: r["component"]
        for r in dedup.connected_components(full_pairs).collect()
    }
    # incremental may label extra nodes only if the star had them; compare on
    # the union of keys with self-label default (the driver query coalesces)
    keys = set(inc) | set(full) | set(base) | set(shard)
    inc_l = {k: inc.get(k, k) for k in keys}
    full_l = {k: full.get(k, k) for k in keys}
    assert inc_l == full_l
    # the bridge actually merged: 1,2,3,4,10 share one component labeled 1
    assert {inc_l[i] for i in (1, 2, 3, 4, 10)} == {1}
    assert inc_l[11] == inc_l[12] == 11
    assert inc_l[5] == 5 and inc_l[13] == 13


def test_bpe_segment_and_counts(spark):
    """Greedy longest-match invariants: full-word vocab hits are 1 token,
    trained subword splits are exact, OOV falls back to chars, empty is 0;
    the Spark stage sums per-word counts."""
    from sketches_go_spark.operators import bpe

    assert bpe.segment_count("customer") == 1
    assert bpe.segment_count("window") == 3       # wi|nd|ow
    assert bpe.segment_count("query") == 3        # qu|er|y
    assert bpe.segment_count("xz") == 2           # chars (no 'xz' unit)
    assert bpe.segment_count("") == 0
    # longest match wins over shorter prefixes: 'table' is one token even
    # though 'ta' is in the vocab
    assert bpe.segment_count("table") == 1

    df = spark.createDataFrame(
        [(1, "customer window"), (2, ""), (3, "  query   query  "), (4, None)],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["n_bpe_tokens"]
           for r in bpe.bpe_token_counts(df).collect()}
    assert got == {1: 4, 2: 0, 3: 6, 4: 0}


def test_candidate_budget_guard(spark):
    """The budget guard trips on an adversarial corpus (tiny shared
    vocabulary -> near-quadratic candidates below the df_cap) and stays
    silent on a realistic one (distinct texts)."""
    from sketches_go_spark.operators.text import (
        CandidateBudgetExceeded,
        winnow_containment_pairs,
    )

    # adversarial: 80 docs of identical text -> every shingle/fingerprint
    # has docfreq 80, C(80,2)=3160 candidates per key
    bad = spark.createDataFrame(
        [(i, "all work and no play makes a dull corpus forever") for i in range(80)],
        "doc_id bigint, text string",
    )
    with pytest.raises(CandidateBudgetExceeded):
        dedup.ngram_jaccard_pairs(bad, candidate_budget=1000).count()
    with pytest.raises(CandidateBudgetExceeded):
        winnow_containment_pairs(bad, candidate_budget=1000).count()

    # realistic: unique texts -> zero shared keys -> zero candidates
    good = spark.createDataFrame(
        [
            (i, f"a{i} b{i * 3} c{i * 5} d{i * 7} e{i * 11} f{i * 13} g{i * 17}")
            for i in range(80)
        ],
        "doc_id bigint, text string",
    )
    assert dedup.ngram_jaccard_pairs(good, candidate_budget=1000).count() == 0
    winnow_containment_pairs(good, candidate_budget=200000).count()


def test_minhash_rowwise_equals_grouped(spark):
    """The per-row HOF signature (the streaming form) must equal the one-pass
    grouped aggregation signature doc-for-doc — including duplicate-shingle
    docs and sub-n-word docs (absent from both)."""
    rows = [
        (1, "a b c d e f"),
        (2, "a b c a b c a b c"),           # heavy duplicate shingles
        (3, "x y"),                          # < n words: no signature
        (4, "the quick brown fox jumps"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    a = dedup.minhash_signatures(df, num_perm=8).orderBy("doc_id").toPandas()
    b = (
        dedup.minhash_signatures_rowwise(df, num_perm=8)
        .drop("_sz")
        .orderBy("doc_id")
        .toPandas()
    )
    assert list(a["doc_id"]) == [1, 2, 4] and list(b["doc_id"]) == [1, 2, 4]
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False)


def test_round5_plans(spark):
    """Scale claims of the round-5 operators asserted on physical plans:
    repetition_features is shuffle- and Python-free (per-row HOFs only);
    winnow_contamination broadcasts BOTH benchmark-side relations (the
    corpus side is never re-shuffled onto the tiny side); BPE counting is
    exactly one Python (ArrowEvalPython/mapInPandas) stage."""
    from sketches_go_spark.operators.bpe import bpe_token_counts
    from sketches_go_spark.operators.text import (
        repetition_features,
        winnow_contamination,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y z a b c d e f g h") for i in range(40)],
        "doc_id bigint, text string",
    )
    plan_r = (
        repetition_features(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan_r, plan_r
    assert "Python" not in plan_r, plan_r

    bench = docs.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    plan_c = (
        winnow_contamination(docs, bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan_c.count("BroadcastExchange") >= 2, plan_c

    plan_b = (
        bpe_token_counts(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan_b, plan_b


def test_incremental_dedup_chained_shards(spark):
    """The warehouse LIFECYCLE: increments applied repeatedly (wave 1 onto
    the base, wave 2 onto base+wave1, each time merging into the PREVIOUS
    incremental assignment) must still equal the full recompute over
    everything — the stored star stays a faithful contraction across
    generations."""
    rng = np.random.default_rng(42)
    bits, d = 16, 3
    ids = list(range(120))
    sigs = {i: int(v) for i, v in zip(ids, rng.integers(0, 1 << bits, 120))}
    waves = [ids[:60], ids[60:90], ids[90:]]

    def sdf(id_list):
        return spark.createDataFrame(
            [(i, sigs[i]) for i in id_list], "doc_id bigint, simhash bigint"
        )

    # stored state from the base wave
    assignment = dedup.connected_components(
        dedup.pigeonhole_hamming_pairs(
            sdf(waves[0]).withColumn("_blk", F.lit(0)),
            "doc_id", "simhash", bits, d,
        )
    )
    indexed = list(waves[0])
    for wave in waves[1:]:
        delta = dedup.simhash_delta_pairs(
            sdf(indexed), sdf(wave), bits=bits, max_hamming=d
        )
        assignment = dedup.incremental_components(assignment, delta)
        indexed += wave

    inc = {r["node"]: r["component"] for r in assignment.collect()}
    full = {
        r["node"]: r["component"]
        for r in dedup.connected_components(
            dedup.pigeonhole_hamming_pairs(
                sdf(ids).withColumn("_blk", F.lit(0)),
                "doc_id", "simhash", bits, d,
            )
        ).collect()
    }
    keys = set(ids)
    assert {k: inc.get(k, k) for k in keys} == {k: full.get(k, k) for k in keys}
    # sanity: randomness actually produced cross-wave merges to exercise
    n_nontrivial = sum(1 for k in keys if full.get(k, k) != k)
    assert n_nontrivial > 10, n_nontrivial


def test_token_budget_sample_invariants(spark):
    """token_budget_sample: exact pure-Python greedy replay, per-group
    overshoot <= 1 doc, nesting across budgets, partition invariance, and
    the reserved-column guard."""
    import hashlib as _hl

    import pytest as _pytest

    from sketches_go_spark.operators import sampling

    rng = np.random.default_rng(41)
    rows = [
        (i, f"g{i % 3}", int(rng.integers(5, 40))) for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string, nt bigint")

    def replay(budget: int) -> dict[int, int]:
        kept = {}
        for g in ("g0", "g1", "g2"):
            docs = [
                (int(_hl.md5(f"tokbudget:{i}".encode()).hexdigest()[:15], 16), i, t)
                for i, gg, t in rows
                if gg == g
            ]
            docs.sort()
            acc = 0
            for _, i, t in docs:
                if acc < budget:
                    kept[i] = acc
                acc += t
        return kept

    for budget in (1, 60, 200, 10**6):
        got = {
            r["doc_id"]: r["tokens_before"]
            for r in sampling.token_budget_sample(
                df, ["grp"], "nt", budget=budget
            ).collect()
        }
        assert got == replay(budget), budget

    # keep rule: every kept row started strictly under budget, and all but
    # each group's last kept row finished under it too (overshoot <= 1 doc)
    out = sampling.token_budget_sample(df, ["grp"], "nt", budget=200)
    pdf = out.toPandas()
    for g, sub in pdf.groupby("grp"):
        assert sub["tokens_before"].max() < 200
        ends = (sub["tokens_before"] + sub["n_tokens"]).sort_values()
        assert ends.iloc[:-1].lt(200).all()

    # nesting: smaller budget keeps a subset of the larger one's docs
    small = set(
        r["doc_id"]
        for r in sampling.token_budget_sample(df, ["grp"], "nt", budget=60).collect()
    )
    assert small <= set(pdf["doc_id"])

    # partition invariance
    re = {
        r["doc_id"]: r["tokens_before"]
        for r in sampling.token_budget_sample(
            df.repartition(17), ["grp"], "nt", budget=200
        ).collect()
    }
    assert re == {r["doc_id"]: r["tokens_before"] for _, r in pdf.iterrows()}

    with _pytest.raises(ValueError):
        sampling.token_budget_sample(
            df.withColumn("n_tokens", F.lit(1)), ["grp"], "nt", budget=10
        )
    with _pytest.raises(ValueError):
        sampling.token_budget_sample(df, ["grp"], "nt", budget=0)


def test_weighted_sample_exact_replay_and_bias(spark):
    """weighted_sample == the A-Res formula replayed in pure Python
    (hash -> uniform -> ln(u)/w -> top-k), and across many salts the
    heavy-weight item is drawn roughly in proportion to its weight."""
    import hashlib as _hl
    import math

    from sketches_go_spark.operators import sampling

    n = 12
    weights = {i: (10.0 if i == 0 else 1.0) for i in range(n)}
    df = spark.createDataFrame(
        [(i, weights[i]) for i in range(n)], "doc_id bigint, w double"
    )

    def replay(salt: str, k: int) -> list[int]:
        keyed = []
        for i, w in weights.items():
            h = int(_hl.md5(f"{salt}{i}".encode()).hexdigest()[:15], 16)
            u = (h + 1) / float(1 << 60)
            keyed.append((round(math.log(u) / w, 9), -i))
        keyed.sort(reverse=True)
        return [-x for _, x in keyed[:k]]

    got = sorted(
        r["doc_id"]
        for r in sampling.weighted_sample(df, "w", k=4, salt="t0:").collect()
    )
    assert got == sorted(replay("t0:", 4)), (got, replay("t0:", 4))

    # bias: P(heavy drawn at k=1) = 10/21; over 40 salts expect ~19
    hits = sum(1 for s in range(40) if replay(f"s{s}:", 1) == [0])
    assert 8 <= hits <= 32, hits
    # and the Spark path agrees with the replay on a few of those salts
    for s in ("s3:", "s17:"):
        spark_top = [
            r["doc_id"]
            for r in sampling.weighted_sample(df, "w", k=1, salt=s).collect()
        ]
        assert spark_top == replay(s, 1)

    # reserved-column guard: wkey/rk inputs would be silently overwritten
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sampling.weighted_sample(df.withColumn("wkey", F.lit(0.0)), "w", k=1)
    with _pytest.raises(ValueError):
        sampling.weighted_sample(df.withColumn("rk", F.lit(1)), "w", k=1)


def test_assemble_conversations_cap_and_render(spark):
    from sketches_go_spark.operators import assemble

    rows = [
        ("c1", 1, "assistant", "hi there", None, "2024-01-01 00:00:05"),
        ("c1", 0, "user", "hello", None, "2024-01-01 00:00:00"),
        ("c1", 2, "tool", "ran", "tool-3", "2024-01-01 00:01:00"),
        ("c2", 0, "user", "solo", None, "2024-01-02 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    full = {r["conv_id"]: r for r in assemble.assemble_conversations(df).collect()}
    # render is turn_idx-ordered regardless of input order; tool turns carry
    # the :tool suffix
    assert full["c1"]["sft_text"] == (
        "<|user|>hello\n<|assistant|>hi there\n<|tool:tool-3|>ran"
    )
    assert full["c1"]["n_turns"] == 3
    assert full["c1"]["n_tool_turns"] == 1
    assert full["c1"]["duration_us"] == 60_000_000
    assert full["c2"]["sft_text"] == "<|user|>solo"
    assert full["c2"]["duration_us"] == 0

    # the cap truncates the RENDER (head-keep) but not the conversation-level
    # stats: duration still spans all turns
    capped = {
        r["conv_id"]: r
        for r in assemble.assemble_conversations(df, max_turns=2).collect()
    }
    assert capped["c1"]["n_turns"] == 2
    assert capped["c1"]["sft_text"] == "<|user|>hello\n<|assistant|>hi there"
    assert capped["c1"]["n_tool_turns"] == 1
    assert capped["c1"]["duration_us"] == 60_000_000

    with pytest.raises(ValueError):
        assemble.assemble_conversations(df, max_turns=0)


def test_plant_neardup_conversations_recovers_pairs(spark):
    from sketches_go_spark.operators import assemble

    # 10 conversations x 8 turns of distinct-but-overlapping text
    rows = [
        (f"c{c}", i, "user", f"turn {c} {i} alpha beta gamma delta", None,
         f"2024-01-01 00:{i:02d}:00")
        for c in range(10)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    planted = assemble.plant_neardup_conversations(df, every=3)
    base_ids = {r[0] for r in df.select("conv_id").distinct().collect()}
    got = {r[0] for r in planted.select("conv_id").distinct().collect()}
    clones = got - base_ids
    assert clones and all(c.endswith("~dup") for c in clones)
    # each clone is its source minus exactly the final turn
    counts = {
        r["conv_id"]: r["n"]
        for r in planted.groupBy("conv_id").agg(F.count("*").alias("n")).collect()
    }
    for c in clones:
        assert counts[c] == counts[c[: -len("~dup")]] - 1

    # end-to-end: minhash over the rendered conversations recovers EXACTLY
    # the (source, clone) pairs — unrelated conversations stay below threshold
    from sketches_go_spark.operators import dedup

    conv = assemble.assemble_conversations(planted)
    docs = conv.select(
        F.col("conv_id").alias("doc_id"), F.col("sft_text").alias("text")
    )
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {
        (c[: -len("~dup")], c) for c in clones
    }
    assert all(r["jaccard"] > 0.7 for r in pairs)

    with pytest.raises(ValueError):
        assemble.plant_neardup_conversations(df, every=0)


def _turns_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_validate_conversations_flags(spark):
    from sketches_go_spark.operators import assemble

    t0 = "2024-01-01 00:00:0"
    rows = [
        # good: dense, user-first, monotone, non-empty
        ("good", 0, "user", "hi", None, t0 + "0"),
        ("good", 1, "assistant", "hello", None, t0 + "1"),
        # gap in turn_idx
        ("gap", 0, "user", "a", None, t0 + "0"),
        ("gap", 2, "assistant", "b", None, t0 + "1"),
        # opens with assistant
        ("badstart", 0, "assistant", "a", None, t0 + "0"),
        ("badstart", 1, "user", "b", None, t0 + "1"),
        # timestamp regression
        ("tsback", 0, "user", "a", None, t0 + "5"),
        ("tsback", 1, "assistant", "b", None, t0 + "2"),
        # whitespace-only turn + consecutive same-role pair
        ("emptyrep", 0, "user", "a", None, t0 + "0"),
        ("emptyrep", 1, "assistant", "  ", None, t0 + "1"),
        ("emptyrep", 2, "assistant", "c", None, t0 + "2"),
    ]
    out = {
        r["conv_id"]: r.asDict()
        for r in assemble.validate_conversations(_turns_df(spark, rows)).collect()
    }
    g = out["good"]
    assert g["valid"] and g["dense_idx"] and g["starts_ok"] and g["ts_monotone"]
    assert g["n_role_repeats"] == 0 and g["n_empty_turns"] == 0
    assert g["first_role"] == "user" and g["n_turns"] == 2
    assert not out["gap"]["dense_idx"] and not out["gap"]["valid"]
    assert not out["badstart"]["starts_ok"] and not out["badstart"]["valid"]
    assert out["badstart"]["first_role"] == "assistant"
    assert not out["tsback"]["ts_monotone"] and not out["tsback"]["valid"]
    e = out["emptyrep"]
    assert e["n_empty_turns"] == 1 and e["n_role_repeats"] == 1 and not e["valid"]
    # repeats alone are reported, not fatal
    assert e["dense_idx"] and e["starts_ok"] and e["ts_monotone"]


def test_validate_conversations_matches_duckdb(spark, duck):
    from sketches_go_spark.operators import assemble

    rows = [
        (f"c{c}", i, ["user", "assistant", "tool"][i % 3],
         "" if (c + i) % 7 == 0 else f"text {c} {i}", None,
         f"2024-01-01 00:{(i * 3) % 60:02d}:00")
        for c in range(6)
        for i in range(5)
    ]
    df = _turns_df(spark, rows)
    got = {
        tuple(r) for r in assemble.validate_conversations(df).collect()
    }
    duck.register("sgv_pdf", df.toPandas())
    duck.execute(
        "CREATE OR REPLACE VIEW sgv_in AS SELECT conv_id, "
        "cast(turn_idx AS int) AS turn_idx, role, text, tool, "
        "cast(ts AS timestamp) AS ts FROM sgv_pdf"
    )
    want = {
        tuple(r)
        for r in duck.execute(
            assemble.validate_conversations_sql("SELECT * FROM sgv_in")
        ).fetchall()
    }
    assert got == want


def test_strip_boilerplate_and_duckdb(spark, duck):
    from sketches_go_spark.operators import assemble

    sysmsg = "You are a helpful assistant."
    rows = []
    for c in range(4):
        rows.append((f"c{c}", 0, "system", sysmsg, None, "2024-01-01 00:00:00"))
        rows.append((f"c{c}", 1, "user", f"unique q {c}", None,
                     "2024-01-01 00:00:01"))
        rows.append((f"c{c}", 2, "assistant", f"unique a {c}", None,
                     "2024-01-01 00:00:02"))
    df = _turns_df(spark, rows)
    out = assemble.strip_boilerplate(df, min_convs=3).collect()
    # the shared system prompt is gone everywhere, survivors re-ranked 0..1
    assert all(sysmsg not in (r["text"] or "") for r in out)
    by_conv = {}
    for r in out:
        by_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
    assert all(sorted(v) == [0, 1] for v in by_conv.values())
    duck.register("sgs_pdf", df.toPandas())
    duck.execute(
        "CREATE OR REPLACE VIEW sgs_in AS SELECT conv_id, "
        "cast(turn_idx AS int) AS turn_idx, role, text, tool, "
        "cast(ts AS timestamp) AS ts FROM sgs_pdf"
    )
    got = {tuple(r[:5]) for r in out}
    want = {
        tuple(r[:5])
        for r in duck.execute(
            assemble.strip_boilerplate_sql("SELECT * FROM sgs_in", 3)
        ).fetchall()
    }
    assert got == want


def test_split_conversations_episodes(spark, duck):
    from sketches_go_spark.operators import assemble

    rows = [
        # c1: gap of 2h between turn 1 and 2 -> two episodes
        ("c1", 0, "user", "q0", None, "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "a1", None, "2024-01-01 00:00:10"),
        ("c1", 2, "user", "q2", None, "2024-01-01 02:00:10"),
        ("c1", 3, "assistant", "a3", None, "2024-01-01 02:00:20"),
        # c2: no gap -> one episode
        ("c2", 0, "user", "hi", None, "2024-01-01 00:00:00"),
        ("c2", 1, "assistant", "yo", None, "2024-01-01 00:00:01"),
    ]
    df = _turns_df(spark, rows)
    out = sorted(
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in assemble.split_conversations(df, gap_us=3600 * 10**6).collect()
    )
    assert out == [
        ("c1#0", 0, "q0"), ("c1#0", 1, "a1"),
        ("c1#1", 0, "q2"), ("c1#1", 1, "a3"),
        ("c2#0", 0, "hi"), ("c2#0", 1, "yo"),
    ]
    duck.register("sgp_pdf", df.toPandas())
    duck.execute(
        "CREATE OR REPLACE VIEW sgp_in AS SELECT conv_id, "
        "cast(turn_idx AS int) AS turn_idx, role, text, tool, "
        "cast(ts AS timestamp) AS ts FROM sgp_pdf"
    )
    want = sorted(
        (r[0], r[1], r[3])
        for r in duck.execute(
            assemble.split_conversations_sql(
                "SELECT * FROM sgp_in", 3600 * 10**6
            )
        ).fetchall()
    )
    assert out == want
    with pytest.raises(ValueError):
        assemble.split_conversations(df, gap_us=0)


def test_sft_examples_prompt_windows(spark):
    from sketches_go_spark.operators import assemble

    rows = [
        ("c1", 0, "user", "q0", None, "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "a1", None, "2024-01-01 00:00:05"),
        ("c1", 2, "tool", "r2", "t-9", "2024-01-01 00:00:06"),
        ("c1", 3, "assistant", "a3", None, "2024-01-01 00:00:09"),
        ("c1", 4, "user", "q4", None, "2024-01-01 00:00:20"),
        ("c1", 5, "assistant", "a5", None, "2024-01-01 00:00:25"),
        # assistant opener: no context, must be dropped
        ("c2", 0, "assistant", "hello", None, "2024-01-01 01:00:00"),
        ("c2", 1, "user", "hi", None, "2024-01-01 01:00:01"),
    ]
    out = {
        r["turn_idx"]: r
        for r in assemble.sft_examples(
            _turns_df(spark, rows), context_turns=2
        ).collect()
        if r["conv_id"] == "c1"
    }
    assert sorted(out) == [1, 3, 5]
    assert out[1]["prompt"] == "<|user|>q0" and out[1]["n_context"] == 1
    assert out[3]["prompt"] == "<|assistant|>a1\n<|tool:t-9|>r2"
    assert out[3]["completion"] == "<|assistant|>a3"
    assert out[5]["prompt"] == "<|assistant|>a3\n<|user|>q4"
    assert out[5]["n_context"] == 2
    # c2's opening assistant turn produced no example
    all_rows = assemble.sft_examples(
        _turns_df(spark, rows), context_turns=2
    ).collect()
    assert not [r for r in all_rows if r["conv_id"] == "c2"]
    with pytest.raises(ValueError):
        assemble.sft_examples(_turns_df(spark, rows), context_turns=0)


def test_sft_examples_matches_duckdb(spark, duck):
    from sketches_go_spark.operators import assemble

    rows = [
        (f"c{c}", i,
         ["user", "assistant", "tool", "assistant"][i % 4],
         f"text {c} {i}", f"t-{i}" if i % 4 == 2 else None,
         f"2024-01-01 00:{(i * 7) % 60:02d}:00")
        for c in range(5)
        for i in range(9)
    ]
    df = _turns_df(spark, rows)
    got = {tuple(r) for r in assemble.sft_examples(df, 3).collect()}
    duck.register("sgx_pdf", df.toPandas())
    duck.execute(
        "CREATE OR REPLACE VIEW sgx_in AS SELECT conv_id, "
        "cast(turn_idx AS int) AS turn_idx, role, text, tool, "
        "cast(ts AS timestamp) AS ts FROM sgx_pdf"
    )
    want = {
        tuple(r)
        for r in duck.execute(
            assemble.sft_examples_sql("SELECT * FROM sgx_in", 3)
        ).fetchall()
    }
    assert got == want and len(got) == 5 * 4  # 4 assistant turns w/ context


def test_sft_jsonl_matches_duckdb(spark, duck):
    # Byte-for-byte JSON parity across engines, under adversarial strings:
    # quotes, backslashes, tabs/CR inside turn text, unicode (incl. an
    # astral-plane emoji), a control char, and an empty turn.  The rendered
    # sft_text additionally embeds real newlines (the turn join), so the
    # JSON escaping of \n is exercised on every conversation.
    from sketches_go_spark.operators import assemble

    rows = [
        ("cq", 0, "user", 'say "hi" \\ now', None, "2024-01-01 00:00:00"),
        ("cq", 1, "assistant", "ok\tsure\rdone", "t-1", "2024-01-01 00:00:05"),
        ("cu", 0, "user", "café 日本 \U0001f600", None, "2024-01-01 00:01:00"),
        ("cu", 1, "assistant", "a\x01b", None, "2024-01-01 00:01:30"),
        ("ce", 0, "user", "", None, "2024-01-01 00:02:00"),
    ]
    df = _turns_df(spark, rows)
    got = dict(
        assemble.sft_jsonl(assemble.assemble_conversations(df))
        .select("conv_id", "line")
        .collect()
    )
    duck.register("sgj_pdf", df.toPandas())
    duck.execute(
        "CREATE OR REPLACE VIEW sgj_in AS SELECT conv_id, "
        "cast(turn_idx AS int) AS turn_idx, role, text, tool, "
        "cast(ts AS timestamp) AS ts FROM sgj_pdf"
    )
    want = dict(
        duck.execute(
            assemble.sft_jsonl_sql(
                assemble.assemble_conversations_sql("SELECT * FROM sgj_in")
            )
        ).fetchall()
    )
    assert got == want
    # every line is valid JSON whose sft_text round-trips to the render
    import json

    rendered = {
        r["conv_id"]: r["sft_text"]
        for r in assemble.assemble_conversations(df).collect()
    }
    for cid, line in got.items():
        obj = json.loads(line)
        assert obj["conv_id"] == cid
        assert obj["sft_text"] == rendered[cid]
        assert "\n" in obj["sft_text"] or cid == "ce"


def test_truncate_conversations_budget_rule(spark):
    from sketches_go_spark.operators import assemble

    rows = [
        # token counts per turn: 3, 2, 4, 1
        ("c1", 0, "user", "a b c", None, "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "d e", None, "2024-01-01 00:00:01"),
        ("c1", 2, "user", "f g h i", None, "2024-01-01 00:00:02"),
        ("c1", 3, "assistant", "j", None, "2024-01-01 00:00:03"),
        # single huge first turn always survives
        ("c2", 0, "user", " ".join(["w"] * 50), None, "2024-01-01 00:00:00"),
        ("c2", 1, "assistant", "x", None, "2024-01-01 00:00:01"),
    ]
    df = _turns_df(spark, rows)
    kept = assemble.truncate_conversations(df, token_budget=5)
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["tokens_before"]) for r in kept.collect()
    )
    # c1: before = 0, 3, 5(stop), ... -> keeps turns 0,1 ; c2: keeps turn 0 only
    assert got == [("c1", 0, 0), ("c1", 1, 3), ("c2", 0, 0)]

    with pytest.raises(ValueError):
        assemble.truncate_conversations(df, token_budget=0)
    with pytest.raises(ValueError):
        assemble.truncate_conversations(
            df.withColumn("n_tokens", F.lit(1)), token_budget=5
        )


def test_common_turns_threshold(spark):
    from sketches_go_spark.operators import assemble

    rows = (
        [(f"c{c}", 0, "system", "You Are Helpful ", None, "2024-01-01 00:00:00")
         for c in range(4)]
        + [("c0", 1, "user", "unique zero", None, "2024-01-01 00:00:01"),
           ("c1", 1, "user", "you are helpful", None, "2024-01-01 00:00:01"),
           ("c1", 2, "user", "rare", None, "2024-01-01 00:00:02"),
           ("c2", 1, "user", "rare", None, "2024-01-01 00:00:01")]
    )
    out = {
        r["text_norm"]: (r["n_convs"], r["n_occurrences"])
        for r in assemble.common_turns(_turns_df(spark, rows), min_convs=2).collect()
    }
    # normalization folds case + trim; c1 contributes twice but counts once
    assert out["you are helpful"] == (4, 5)
    assert out["rare"] == (2, 2)
    assert "unique zero" not in out

    with pytest.raises(ValueError):
        assemble.common_turns(_turns_df(spark, rows), min_convs=0)


def test_collapse_retries_runs_and_reindex(spark):
    from sketches_go_spark.operators import assemble

    t = [f"2024-01-01 00:00:0{i}" for i in range(8)]
    rows = [
        # run of three identical user turns (NULL tool == NULL tool) -> keep first
        ("c1", 0, "user", "a", None, t[0]),
        ("c1", 1, "user", "a", None, t[1]),
        ("c1", 2, "user", "a", None, t[2]),
        ("c1", 3, "assistant", "b", None, t[3]),
        # same content as the run but NOT consecutive -> kept
        ("c1", 4, "user", "a", None, t[4]),
        # tool turns: same text, different tool -> both kept
        ("c2", 0, "tool", "x", "tool-1", t[0]),
        ("c2", 1, "tool", "x", "tool-2", t[1]),
        # same role+text+tool -> dropped
        ("c2", 2, "tool", "x", "tool-2", t[2]),
    ]
    out = assemble.collapse_retries(_turns_df(spark, rows)).collect()
    got = sorted(
        (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], str(r["ts"]))
        for r in out
    )
    assert got == [
        ("c1", 0, "user", "a", None, "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "b", None, "2024-01-01 00:00:03"),
        ("c1", 2, "user", "a", None, "2024-01-01 00:00:04"),
        ("c2", 0, "tool", "x", "tool-1", "2024-01-01 00:00:00"),
        ("c2", 1, "tool", "x", "tool-2", "2024-01-01 00:00:01"),
    ]


def test_assemble_family_plans_single_conv_exchange(spark):
    """The transcript operators' scale claims, plan-asserted: validation is
    ONE conv_id aggregation exchange; truncation + assembly share ONE
    conv_id exchange (the window's partitioning satisfies the downstream
    aggregation's requirement)."""
    from sketches_go_spark.operators import assemble

    rows = [
        (f"c{c}", i, "user", f"w{c} w{i} alpha", None, f"2024-01-01 00:{i:02d}:00")
        for c in range(4)
        for i in range(6)
    ]
    df = _turns_df(spark, rows)

    plan = (
        assemble.validate_conversations(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "windowspecdefinition" not in plan  # adjacency runs in-group

    kept = assemble.truncate_conversations(df, token_budget=5).drop(
        "n_tokens", "tokens_before"
    )
    plan2 = (
        assemble.assemble_conversations(kept)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # window (prefix scan) and aggregation both key on conv_id -> one exchange
    assert plan2.count("Exchange hashpartitioning") == 1
    assert plan2.count("windowspecdefinition") == 1

    # episode split: lag-gap test, running episode counter, and per-episode
    # re-rank all ride ONE conv_id exchange (hash(conv_id) satisfies the
    # (conv_id, _ep) clustering requirement)
    plan3 = (
        assemble.split_conversations(df, gap_us=10**6)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan3.count("Exchange hashpartitioning") == 1

    # example extraction: group+sort then zero-shuffle explode/render
    plan4 = (
        assemble.sft_examples(df, 4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan4.count("Exchange hashpartitioning") == 1
    assert "Generate posexplode" in plan4

    # boilerplate strip: the boiler side must be BROADCAST (map-side
    # anti-join), never a shuffled join on the raw turns
    plan5 = (
        assemble.strip_boilerplate(df, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan5
    assert "SortMergeJoin" not in plan5


def test_collapse_truncate_invariants_randomized(spark):
    """Seeded randomized invariants: retry collapse is idempotent (adjacent
    survivors always differ, so a second pass is a no-op), and budget
    truncation keeps a non-empty PREFIX of each conversation."""
    import random

    from sketches_go_spark.operators import assemble

    rnd = random.Random(7)
    rows = []
    for c in range(30):
        for i in range(rnd.randint(1, 12)):
            role = rnd.choice(["user", "assistant", "tool"])
            rows.append(
                (
                    f"c{c}",
                    i,
                    role,
                    rnd.choice(["a", "b", "a b c"]),
                    "tool-1" if role == "tool" and rnd.random() < 0.5 else None,
                    f"2024-01-01 00:{i:02d}:{rnd.randint(0, 59):02d}",
                )
            )
    df = _turns_df(spark, rows)
    once = assemble.collapse_retries(df)
    twice = assemble.collapse_retries(once)
    key = lambda r: (r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"])
    assert sorted(map(key, once.collect())) == sorted(map(key, twice.collect()))

    kept = assemble.truncate_conversations(once, token_budget=4)
    per: dict = {}
    for r in kept.collect():
        per.setdefault(r["conv_id"], []).append(r["turn_idx"])
    base: dict = {}
    for r in once.collect():
        base.setdefault(r["conv_id"], []).append(r["turn_idx"])
    for cid, idxs in base.items():
        ks = sorted(per.get(cid, []))
        assert ks, f"{cid} lost every turn"
        assert ks == sorted(idxs)[: len(ks)], f"{cid} kept a non-prefix"


def test_role_transitions_matrix(spark, duck):
    from sketches_go_spark.operators import assemble

    rows = [
        # c1: user->assistant->assistant (retry) ->tool
        ("c1", 0, "user", "q", None, "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "a", None, "2024-01-01 00:00:01"),
        ("c1", 2, "assistant", "a2", None, "2024-01-01 00:00:02"),
        ("c1", 3, "tool", "t", "grep", "2024-01-01 00:00:03"),
        # c2: user->assistant  (first turns never count as a transition)
        ("c2", 0, "user", "hi", None, "2024-01-01 00:00:00"),
        ("c2", 1, "assistant", "yo", None, "2024-01-01 00:00:01"),
    ]
    df = _turns_df(spark, rows)
    got = sorted(
        (r["from_role"], r["to_role"], r["n"], r["frac"])
        for r in assemble.role_transitions(df).collect()
    )
    assert got == [
        ("assistant", "assistant", 1, 0.25),
        ("assistant", "tool", 1, 0.25),
        ("user", "assistant", 2, 0.5),
    ]
    duck.register("sgp_rt_pdf", df.toPandas())
    duck.execute(
        "CREATE OR REPLACE VIEW sgp_rt_in AS SELECT conv_id, "
        "cast(turn_idx AS int) AS turn_idx, role, text, tool, "
        "cast(ts AS timestamp) AS ts FROM sgp_rt_pdf"
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            assemble.role_transitions_sql("SELECT * FROM sgp_rt_in")
        ).fetchall()
    )
    assert got == want


def test_temperature_sample_mixture_and_replay(spark, duck):
    """Temperature mixture sampling: kept counts track T*n^a/sum(n^a),
    the mixture flattens monotonically as alpha drops, membership is
    partition-invariant, and DuckDB replays the exact kept set at every
    supported alpha (sqrt-chain exactness)."""
    from sketches_go_spark.operators.sampling import (
        temperature_sample,
        temperature_sample_sql,
    )

    langs = ["en"] * 3200 + ["de"] * 800 + ["zh"] * 200 + ["sw"] * 50
    pdf = pd.DataFrame({"doc_id": np.arange(len(langs)), "lang": langs})
    df = spark.createDataFrame(pdf)
    duck.register("sgs_temp_pdf", pdf)

    kept = {}
    for alpha in (0.25, 0.5, 0.75):
        out = temperature_sample(df, ["lang"], alpha=alpha).toPandas()
        got = set(out["doc_id"])
        want = {
            r[0]
            for r in duck.execute(
                temperature_sample_sql(
                    "SELECT * FROM sgs_temp_pdf", ["lang"], alpha=alpha
                )
            ).fetchall()
        }
        assert got == want, alpha  # exact cross-engine replay
        kept[alpha] = out.groupby("lang").size()
        # expected rate: min(1, T * n^a / sum(n^a) / n)
        n = pd.Series({"en": 3200, "de": 800, "zh": 200, "sw": 50})
        s = np.floor(np.sqrt(n if alpha == 0.5 else n) ** (alpha / 0.5) * 2**20)
        exp = np.minimum(n, n.sum() * s / s.sum())
        for g in n.index:
            assert abs(kept[alpha][g] - exp[g]) <= 4 * np.sqrt(exp[g]) + 2, (
                alpha, g, kept[alpha][g], exp[g])
    # flattening is monotone in alpha: lower alpha keeps LESS of the biggest
    # group and ALL of the smallest
    assert kept[0.25]["en"] < kept[0.5]["en"] < kept[0.75]["en"]
    assert kept[0.25]["sw"] == 50 and kept[0.75]["sw"] == 50
    # partition invariance
    out2 = temperature_sample(df.repartition(17), ["lang"], alpha=0.5)
    assert set(out2.toPandas()["doc_id"]) == set(
        temperature_sample(df, ["lang"], alpha=0.5).toPandas()["doc_id"]
    )
    # guards
    with pytest.raises(ValueError):
        temperature_sample(df, ["lang"], alpha=0.3)
    with pytest.raises(ValueError):
        temperature_sample(df.withColumn("_thr", F.lit(1)), ["lang"])


def test_temperature_resample_upsamples_and_replays(spark, duck):
    """With-replacement temperature resampling: small groups get REPLICATED
    toward T*n^a/sum(n^a), copy_idx is dense per kept row, the multiset is
    partition-invariant, and DuckDB replays it exactly."""
    from sketches_go_spark.operators.sampling import (
        temperature_resample,
        temperature_resample_sql,
    )

    langs = ["en"] * 3200 + ["sw"] * 50
    pdf = pd.DataFrame({"doc_id": np.arange(len(langs)), "lang": langs})
    df = spark.createDataFrame(pdf)
    duck.register("sgs_tr_pdf", pdf)

    out = temperature_resample(df, ["lang"], alpha=0.5).toPandas()
    got = sorted(map(tuple, out[["doc_id", "lang", "copy_idx"]].values.tolist()))
    want = sorted(
        (r[0], r[1], r[2])
        for r in duck.execute(
            temperature_resample_sql(
                "SELECT * FROM sgs_tr_pdf", ["lang"], alpha=0.5
            )
        ).fetchall()
    )
    assert got == want  # exact multiset replay (copies included)
    sizes = out.groupby("lang").size()
    n = pd.Series({"en": 3200, "sw": 50})
    s = np.floor(np.sqrt(n) * 2**20)
    exp = n.sum() * s / s.sum()
    assert sizes["sw"] > 50  # genuinely upsampled
    for g in n.index:
        assert abs(sizes[g] - exp[g]) <= 4 * np.sqrt(exp[g]) + 2, (g, sizes[g], exp[g])
    # every kept doc's copy_idx is dense 0..copies-1
    dense = out.groupby("doc_id")["copy_idx"].agg(["min", "max", "count"])
    assert (dense["min"] == 0).all()
    assert (dense["max"] + 1 == dense["count"]).all()
    # partition invariance
    out2 = temperature_resample(df.repartition(11), ["lang"], alpha=0.5).toPandas()
    assert sorted(map(tuple, out2[["doc_id", "copy_idx"]].values.tolist())) == sorted(
        map(tuple, out[["doc_id", "copy_idx"]].values.tolist())
    )
    with pytest.raises(ValueError):
        temperature_resample(df.withColumn("copy_idx", F.lit(0)), ["lang"])
    with pytest.raises(ValueError):
        temperature_resample(df.withColumn("_copies", F.lit(0)), ["lang"])


def test_tool_cooccurrence_matrix(spark, duck):
    from sketches_go_spark.operators import assemble

    rows = [
        # c1 uses grep+sed, c2 grep+sed+awk, c3 only grep (no pairs), c4 none
        ("c1", 0, "assistant", "a", "grep", "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "b", "sed", "2024-01-01 00:00:01"),
        ("c1", 2, "assistant", "c", "grep", "2024-01-01 00:00:02"),
        ("c2", 0, "assistant", "d", "sed", "2024-01-01 00:00:00"),
        ("c2", 1, "assistant", "e", "awk", "2024-01-01 00:00:01"),
        ("c2", 2, "assistant", "f", "grep", "2024-01-01 00:00:02"),
        ("c3", 0, "assistant", "g", "grep", "2024-01-01 00:00:00"),
        ("c4", 0, "user", "h", None, "2024-01-01 00:00:00"),
    ]
    df = _turns_df(spark, rows)
    got = sorted(
        map(tuple, assemble.tool_cooccurrence(df).collect())
    )
    # n_grep=3, n_sed=2, n_awk=1
    assert got == [
        ("awk", "grep", 1, 1 / 3),   # 1/(1+3-1)
        ("awk", "sed", 1, 0.5),      # 1/(1+2-1)
        ("grep", "sed", 2, 2 / 3),   # 2/(3+2-2)
    ]
    duck.register("sgs_tco_pdf", df.toPandas())
    duck.execute(
        "CREATE OR REPLACE VIEW sgs_tco_in AS SELECT conv_id, "
        "cast(turn_idx AS int) AS turn_idx, role, text, tool, "
        "cast(ts AS timestamp) AS ts FROM sgs_tco_pdf"
    )
    want = sorted(
        tuple(r)
        for r in duck.execute(
            assemble.tool_cooccurrence_sql("SELECT * FROM sgs_tco_in")
        ).fetchall()
    )
    assert got == want


def test_strip_common_lines_c4_rule(spark, duck):
    """C4-style corpus line dedup: lines in >= min_docs distinct docs are
    stripped (case/whitespace-normalized matching), order and unique lines
    survive, all-boiler docs disappear, empty lines never count as common;
    DuckDB replays exactly."""
    from sketches_go_spark.operators.text import (
        strip_common_lines,
        strip_common_lines_sql,
    )

    boiler = "Subscribe NOW"
    docs = [
        (1, f"{boiler}\nalpha beta\n\ngamma"),
        (2, f"unique two\n  subscribe now \nend two"),
        (3, f"{boiler}\nthree only"),
        (4, "all alone"),
        (5, boiler),  # all-boiler doc: disappears entirely
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    out = {r["doc_id"]: r["text"] for r in strip_common_lines(df, 3).collect()}
    assert out == {
        1: "alpha beta\n\ngamma",
        2: "unique two\nend two",
        3: "three only",
        4: "all alone",
    }
    duck.register("sgs_scl_pdf", pdf)
    want = dict(
        duck.execute(
            strip_common_lines_sql("SELECT * FROM sgs_scl_pdf", 3)
        ).fetchall()
    )
    assert out == want
    with pytest.raises(ValueError):
        strip_common_lines(df, 1)


def test_connected_components_stops_at_true_fixpoint(spark):
    """Round-6 convergence rule: the loop stops when the round's own output
    is structurally the min-star (out-degree 1 everywhere, sources never
    targets).  Pin that the accepted output really is a fixed point: one
    more large-star/small-star application must reproduce the relation
    EXACTLY, on a graph whose edge count stabilizes rounds before the edge
    set does (parallel long chains — the case a count-only gate would
    mis-accept)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    edges = [(c * 100 + i, c * 100 + i + 1) for c in range(6) for i in range(30)]
    df = spark.createDataFrame(edges, "id_a bigint, id_b bigint")
    out = dedup.connected_components(df)
    star = out.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("u"), F.col("component").alias("v")
    )
    wu = Window.partitionBy("u")
    sym = star.union(star.select(F.col("v").alias("u"), F.col("u").alias("v")))
    ls = (
        sym.withColumn("m", F.least(F.min("v").over(wu), F.col("u")))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    ori = ls.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
    withm = ori.withColumn("m", F.min("v").over(wu))
    both = F.array(
        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
    )
    nxt = (
        withm.select(F.explode(both).alias("_e"))
        .select(F.col("_e.u").alias("u"), F.col("_e.v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    assert sorted(map(tuple, nxt.collect())) == sorted(map(tuple, star.collect()))
    # and the labeling is the exact closure: every chain labels to its min
    got = {r["node"]: r["component"] for r in out.collect()}
    assert all(got[c * 100 + i] == c * 100 for c in range(6) for i in range(31))
