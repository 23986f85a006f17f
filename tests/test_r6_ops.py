"""Round-6 operator additions: semantic decontamination, per-dimension
whitening, key-skew diagnostics, exact-bound Z-ordering."""

import math

import pyspark.sql.functions as F

from graphdbetl_spark.etl.maintenance import zorder_rank_exact
from graphdbetl_spark.operators.curation import semantic_decontaminate
from graphdbetl_spark.operators.similarity import standardize_dimensions
from graphdbetl_spark.operators.skew import key_skew_report


def test_semantic_decontaminate_flags_planted_duplicate(spark):
    # corpus vec 1 duplicates eval vec 10 (cosine 1.0, scale-invariant);
    # vec 2 is orthogonal to both eval vectors.
    corpus = spark.createDataFrame(
        [(1, [2.0, 0.0, 4.0]), (2, [0.0, 1.0, 0.0])], ["vec_id", "embedding"]
    )
    ev = spark.createDataFrame(
        [(10, [1.0, 0.0, 2.0]), (11, [3.0, 0.0, 0.0])], ["vec_id", "embedding"]
    )
    rows = {
        r["vec_id"]: r
        for r in semantic_decontaminate(corpus, ev, threshold=0.9).collect()
    }
    assert rows[1]["contaminated"] and rows[1]["max_eval_cosine"] == 1.0
    assert not rows[2]["contaminated"] and rows[2]["max_eval_cosine"] == 0.0


def test_semantic_decontaminate_is_map_only(spark):
    # eval matrix ships in the Arrow-kernel closure: the corpus scan
    # must stay a single map-only stage — no join, no shuffle exchange
    corpus = spark.createDataFrame([(1, [1.0, 0.0])], ["vec_id", "embedding"])
    ev = spark.createDataFrame([(2, [0.0, 1.0])], ["vec_id", "embedding"])
    plan = semantic_decontaminate(corpus, ev)._jdf.queryExecution().toString()
    assert "Join" not in plan
    assert "Exchange hash" not in plan


def test_standardize_dimensions_unit_moments(spark):
    import random

    rng = random.Random(7)
    data = [(i, [rng.uniform(-5, 5) for _ in range(3)]) for i in range(50)]
    out = standardize_dimensions(
        spark.createDataFrame(data, ["vec_id", "embedding"])
    ).collect()
    assert len(out) == 150
    by_dim = {}
    for r in out:
        by_dim.setdefault(r["component"], []).append(r["zvalue"])
    assert sorted(by_dim) == [1, 2, 3]
    for vs in by_dim.values():
        mu = sum(vs) / len(vs)
        sd = math.sqrt(sum((v - mu) ** 2 for v in vs) / len(vs))
        assert abs(mu) < 1e-5 and abs(sd - 1.0) < 1e-5


def test_key_skew_report_values(spark):
    # key 'a' -> 6 rows, 'b' -> 2, 'c' -> 2, 'd' -> 2: n=12, k=4, max=6
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",)] * 2 + [("d",)] * 2
    rep = key_skew_report(spark.createDataFrame(rows, ["k"]), "k").collect()[0]
    assert rep["n_rows"] == 12 and rep["n_keys"] == 4
    assert rep["max_key_rows"] == 6
    assert rep["avg_key_rows"] == 3.0
    assert rep["skew_ratio"] == 2.0
    assert rep["salt_buckets"] == 2
    # only 'a' holds more than 2x the mean (6 > 2*3 fails; strict >)
    assert rep["hot_keys"] == 0
    assert rep["p50_key_rows"] == 2.0


def test_key_skew_report_hot_keys_strictly_above_twice_mean(spark):
    rows = [("a",)] * 7 + [("b",)] * 1 + [("c",)] * 1 + [("d",)] * 1
    rep = key_skew_report(spark.createDataFrame(rows, ["k"]), "k").collect()[0]
    assert rep["hot_keys"] == 1  # 7*4 > 2*10
    assert rep["salt_buckets"] == 3  # ceil(7/2.5)


def test_zorder_rank_exact_locality_and_range(spark):
    # 16x16 integer grid: buckets=4 -> 2 bits per column, zkey in [0, 16)
    grid = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(grid, ["a", "b"])
    z = df.withColumn("z", zorder_rank_exact(df, "a", "b", buckets=4))
    got = {(r["a"], r["b"]): r["z"] for r in z.collect()}
    assert set(got.values()) <= set(range(16))
    # every quadrant cell is one contiguous z value; z respects Morton
    # order: (low,low) quadrant < (high,high) quadrant
    assert got[(0, 0)] < got[(15, 15)]
    # same bucket cell -> same z (type-1 bounds put 3 in the next cell:
    # ceil(256/4)=64 -> first value whose cum count reaches 64 is 3)
    assert got[(0, 0)] == got[(2, 2)]
    assert got[(3, 3)] != got[(0, 0)]
    # uniform grid: all 16 cells hit
    assert len(set(got.values())) == 16


def test_ivf_append_report_counts_and_drift(spark):
    from graphdbetl_spark.operators.similarity import ivf_append_report

    # base: 8 well-spread 2-d vectors; batch: 6 new vectors piled onto
    # one direction -> that cell must exceed 2x the mean and flag.
    base = [(i, [math.cos(i), math.sin(i)]) for i in range(8)]
    new = [(100 + i, [1.0, 0.01 * i]) for i in range(6)]
    df = spark.createDataFrame(base + new, ["vec_id", "embedding"])
    rep = ivf_append_report(
        df, F.col("vec_id") >= 100, "vec_id", "embedding", n_cells=4
    ).collect()
    assert sum(r["n_base"] for r in rep) == 8
    assert sum(r["n_new"] for r in rep) == 6
    for r in rep:
        assert r["n_total"] == r["n_base"] + r["n_new"]
        assert r["rebuild_hint"] == (r["n_total"] * 4 > 2 * 14)
    assert any(r["rebuild_hint"] for r in rep)  # the piled-on cell


def test_importance_resample_prefers_target_like_docs(spark):
    from graphdbetl_spark.operators.curation import importance_resample

    # target docs speak "qq ww"; candidate 10 mimics them, candidate 11
    # uses vocabulary the target never emits -> 10 must outrank 11.
    rows = [
        (1, "qq ww qq ww qq", True),
        (2, "qq ww ww qq", True),
        (10, "qq ww qq", False),
        (11, "zz yy xx zz", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = importance_resample(df, "text", "doc_id", F.col("is_t"), k=10).collect()
    got = {r["doc_id"]: r for r in out}
    assert set(got) == {10, 11}  # target docs are never selected
    assert got[10]["importance_weight"] > got[11]["importance_weight"]
    assert got[10]["rank"] == 1 and got[11]["rank"] == 2


def test_importance_resample_topk_is_take_ordered(spark):
    # the k-cut must compile to TakeOrderedAndProject (per-partition
    # top-k + single merge), never a global sort
    rows = [(i, "aa bb cc", i % 2 == 0) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    from graphdbetl_spark.operators.curation import importance_resample

    plan = importance_resample(
        df, "text", "doc_id", F.col("is_t"), k=5
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_weighted_priority_sample_favors_heavy_rows(spark):
    # 200 rows: ids 0..99 weight 1, ids 100..199 weight 4096 — the
    # heavy half's priorities u^(1/4096) crowd out the light half's u.
    data = [(i, 1 if i < 100 else 4096) for i in range(200)]
    df = spark.createDataFrame(data, ["id", "w"])
    from graphdbetl_spark.operators.sampling import weighted_priority_sample

    out = weighted_priority_sample(df, "id", "w", k=50).collect()
    assert len(out) == 50
    heavy = sum(1 for r in out if r["id"] >= 100)
    assert heavy >= 45  # PPS: heavy rows dominate the sample
    tiers = {r["w2"] for r in out if r["id"] >= 100}
    assert tiers == {4096}  # 4096 = 2^12 is its own quantization tier
    # priorities are valid (0,1) keys, descending with the sort
    ps = [r["priority"] for r in out]
    assert ps == sorted(ps, reverse=True)
    assert all(0.0 < p < 1.0 for p in ps)


def test_weighted_priority_sample_is_take_ordered(spark):
    # key projection in the scan stage + global top-k: the plan must
    # be TakeOrderedAndProject with NO shuffle exchange and the sqrt
    # chain must not explode the expression tree (bounded plan size).
    df = spark.createDataFrame([(i, i + 1) for i in range(20)], ["id", "w"])
    from graphdbetl_spark.operators.sampling import weighted_priority_sample

    plan = weighted_priority_sample(df, "id", "w", k=5)._jdf.queryExecution().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hash" not in plan
    assert len(plan) < 200_000


def test_kmv_jaccard_identical_and_disjoint_sets(spark):
    from graphdbetl_spark.operators.sketch import kmv_jaccard_md5

    # identical sets -> union == each set -> jaccard exactly 1
    same = [(g, f"v{i}") for g in ("a", "b") for i in range(300)]
    r = kmv_jaccard_md5(
        spark.createDataFrame(same, ["grp", "val"]), "grp", "val", k=64
    ).collect()[0]
    assert r["k_a"] == r["k_b"] == r["k_u"] == 64
    assert r["jaccard_est"] == 1.0
    assert r["est_a"] == r["est_union"]
    # disjoint sets -> intersection estimate clamps at >= 0, jaccard ~ 0
    disj = [("a", f"x{i}") for i in range(300)] + [("b", f"y{i}") for i in range(300)]
    r2 = kmv_jaccard_md5(
        spark.createDataFrame(disj, ["grp", "val"]), "grp", "val", k=64
    ).collect()[0]
    assert r2["est_intersection"] >= 0.0
    assert r2["jaccard_est"] < 0.25


def test_kmv_jaccard_small_sets_exact(spark):
    from graphdbetl_spark.operators.sketch import kmv_jaccard_md5

    # below-k sets take the exact-count path: 10 & 10 with 5 shared
    rows = [("a", f"s{i}") for i in range(10)] + [("b", f"s{i}") for i in range(5, 15)]
    r = kmv_jaccard_md5(
        spark.createDataFrame(rows, ["grp", "val"]), "grp", "val", k=64
    ).collect()[0]
    assert (r["est_a"], r["est_b"], r["est_union"]) == (10.0, 10.0, 15.0)
    assert r["est_intersection"] == 5.0
    assert abs(r["jaccard_est"] - 5.0 / 15.0) < 1e-6
