"""Training-data prep operators: chunking, mixture balancing,
embedding centroids. Constructed fixtures pin exact semantics; oracle
parity on the real tables is covered by the driver gate on prep_q."""

import pyspark.sql.functions as F

from graphdbetl_spark.operators.curation import chunk_text
from graphdbetl_spark.operators.sampling import balance_uniform
from graphdbetl_spark.operators.similarity import label_centroids


def test_chunk_text_windows_and_tail(spark):
    text = "abcdefghij" * 35  # 350 chars -> starts at 0,150,300
    df = spark.createDataFrame([(1, text), (2, "short")], "doc_id long, text string")
    out = chunk_text(df, "text", "doc_id", size=200, stride=150)
    rows = {(r["doc_id"], r["chunk_id"]): r["chunk_text"] for r in out.collect()}
    assert len([k for k in rows if k[0] == 1]) == 3
    assert rows[(1, 0)] == text[0:200]
    assert rows[(1, 1)] == text[150:350]  # truncated to remaining 200
    assert rows[(1, 2)] == text[300:350]  # 50-char tail
    # every char is covered and consecutive chunks overlap by size-stride
    assert rows[(1, 0)][150:] == rows[(1, 1)][:50]
    # short doc -> exactly one chunk, whole text
    assert len([k for k in rows if k[0] == 2]) == 1
    assert rows[(2, 0)] == "short"


def test_chunk_text_exact_boundary(spark):
    # length == stride: second start would be at index 150 == len -> no
    # empty chunk emitted (starts go to (len-1) div stride inclusive)
    df = spark.createDataFrame([(1, "x" * 150)], "doc_id long, text string")
    assert chunk_text(df, "text", "doc_id", size=200, stride=150).count() == 1
    df2 = spark.createDataFrame([(1, "x" * 151)], "doc_id long, text string")
    assert chunk_text(df2, "text", "doc_id", size=200, stride=150).count() == 2


def test_balance_uniform_equalizes_and_is_deterministic(spark):
    rows = [(i, "big") for i in range(30)] + [(100 + i, "small") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = balance_uniform(df, "doc_id", "lang")
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 7, "small": 7}
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in balance_uniform(df, "doc_id", "lang").collect())
    assert a == b  # md5-ranked keep set is stable across runs


def test_label_centroids_exact_means(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], 0),
            (2, [3.0, 4.0], 0),
            (3, [10.0, 20.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    out = {
        (r["label"], r["pos"]): (r["centroid_v"], r["n_vecs"])
        for r in label_centroids(df).collect()
    }
    assert out[(0, 0)] == (2.0, 2)
    assert out[(0, 1)] == (3.0, 2)
    assert out[(1, 0)] == (10.0, 1)
    assert out[(1, 1)] == (20.0, 1)


def test_sharded_prefix_sum_equals_global_window(spark):
    """The quantile-sharded distributed prefix-sum must be bit-identical
    to a global running-sum window, for any boundary placement —
    including skewed ids that collapse quantile boundaries."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from graphdbetl_spark.operators.sampling import sharded_running_sum_before

    rows = [(i * 7 % 1000 + (0 if i % 3 else 500), i, (i * 37) % 90 + 1)
            for i in range(400)]
    df = spark.createDataFrame(
        [(gid * 10_000 + i, n) for gid, i, n in rows], "id long, n long"
    )
    p, cum = sharded_running_sum_before(df, ["id"], F.col("n"), n_shards=16)
    got = {r.id: r.c for r in p.select("id", cum.alias("c")).collect()}
    w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = {
        r.id: r.c
        for r in df.select(
            "id", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("c")
        ).collect()
    }
    assert got == want


def test_temperature_sample_rates_and_determinism(spark):
    from graphdbetl_spark.operators.sampling import temperature_sample

    rows = [(i, "a") for i in range(90)] + [(i, "b") for i in range(90, 100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df, "doc_id", "lang", alpha=0.5)
    rates = {r["lang"]: r["rate_micro"] for r in out.select("lang", "rate_micro").distinct().collect()}
    # q_a = sqrt(.9)/(sqrt(.9)+sqrt(.1)) = 3/4 exactly -> rate .75/.9
    assert abs(rates["a"] - 833333) <= 1
    # rare stratum upweighted past 1 -> capped
    assert rates["b"] == 1000000
    kept = {(r["doc_id"], r["lang"]) for r in out.collect()}
    # capped stratum keeps everything
    assert sum(1 for _, l in kept if l == "b") == 10
    # membership is a pure function of the id -> identical on re-run
    kept2 = {(r["doc_id"], r["lang"]) for r in temperature_sample(df, "doc_id", "lang").collect()}
    assert kept == kept2
    # 'a' keeps roughly 83% deterministically (md5-bucket realization)
    n_a = sum(1 for _, l in kept if l == "a")
    assert 60 <= n_a <= 90
