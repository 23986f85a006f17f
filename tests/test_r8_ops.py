"""Round-8 hardening: batched k-center (exact-parity fast path),
zero-norm fail-fast, and compact_plan schema/type consistency."""

import pytest

from graphdbetl_spark.etl.maintenance import compact_plan
from graphdbetl_spark.operators.coreset import kcenter_select


def _toy_corpus(spark, n=48, d=4):
    # Deterministic, norm>0, irregular directions: enough structure
    # that greedy picks are nontrivial, no RNG (replayable).
    rows = [
        (i, [float((i * 7 + j * 3) % 11 + (i * 5 + j * j) % 7 + 1) for j in range(d)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_kcenter_batch_matches_sequential(spark):
    """batch_p collapses passes but must reproduce the sequential
    trajectory BIT-FOR-BIT (same centers, same radii, same order) —
    the provably-safe admission rule, not an approximation."""
    emb = _toy_corpus(spark)
    seq = kcenter_select(emb, k=12).collect()
    for p in (3, 4, 8, 64):
        bat = kcenter_select(emb, k=12, batch_p=p).collect()
        assert [tuple(r) for r in bat] == [tuple(r) for r in seq], f"p={p}"


def test_kcenter_batch_short_list_finishes_driver_side(spark):
    """When a pass returns fewer than p rows the candidate list is the
    whole remaining corpus — the trajectory must finish exactly (and
    end early when k exceeds the corpus), with no bound to respect."""
    emb = _toy_corpus(spark, n=5)
    seq = kcenter_select(emb, k=9).collect()
    bat = kcenter_select(emb, k=9, batch_p=16).collect()
    assert [tuple(r) for r in bat] == [tuple(r) for r in seq]
    assert len(bat) == 5


def test_kcenter_zero_norm_fails_fast(spark):
    """A zero-norm embedding would yield NaN cosine, which orders
    differently across numpy/Spark/DuckDB — fail fast instead of
    silently desyncing the oracle trajectory."""
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 1.0])],
        ["vec_id", "embedding"],
    )
    with pytest.raises(Exception, match="zero-norm"):
        kcenter_select(emb, k=3).collect()
    # zero-norm SEED fails on the driver before any pass
    emb2 = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="zero-norm"):
        kcenter_select(emb2, k=2)


def test_compact_execute_round_trip(spark, tmp_path):
    """Executing the manifest must (a) place every row in its planned
    bin — read-back re-aggregation reproduces the manifest exactly —
    and (b) write exactly ONE file per (part, bin)."""
    import pyspark.sql.functions as F

    from graphdbetl_spark.etl.maintenance import compact_execute, compact_plan

    df = spark.createDataFrame(
        [("a", k, 60) for k in range(1, 8)] + [("b", k, 25) for k in range(1, 5)],
        ["part", "key", "sz"],
    )
    manifest = {
        (r["part"], r["bin"]): (r["n_rows"], r["bin_bytes"], r["min_key"], r["max_key"])
        for r in compact_plan(df, "part", "key", "sz", target_bytes=100).collect()
    }
    out = str(tmp_path / "compacted")
    compact_execute(df, out, "part", "key", "sz", target_bytes=100)
    back = spark.read.parquet(out)
    got = {
        (r["part"], r["bin"]): (r["n_rows"], r["bin_bytes"], r["min_key"], r["max_key"])
        for r in back.groupBy("part", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("sz").cast("long").alias("bin_bytes"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
        )
        .collect()
    }
    assert got == manifest
    files_per_bin = (
        back.withColumn("__f", F.input_file_name())
        .groupBy("part", "bin")
        .agg(F.countDistinct("__f").alias("n_files"))
        .collect()
    )
    assert files_per_bin and all(r["n_files"] == 1 for r in files_per_bin)
    assert back.count() == df.count()  # no row lost or duplicated


def test_compact_plan_empty_schema_matches_nonempty(spark):
    """The empty-input result must carry the SAME schema as the
    non-empty path — including a non-string partition column and a
    non-bigint key — so downstream unions and schema checks hold."""
    df = spark.createDataFrame([(7, 5, 10)], "part int, key int, sz long")
    full = compact_plan(df, "part", "key", "sz", target_bytes=100)
    empty = compact_plan(df.limit(0), "part", "key", "sz", target_bytes=100)
    assert empty.schema == full.schema
    assert empty.count() == 0
    assert full.count() == 1
    # and the two genuinely union (the downstream shape that broke)
    assert empty.unionByName(full).count() == 1
