"""Tests for skew-mitigation helpers and the metrics collector."""

import pyspark.sql.functions as F

from graphdbetl_spark.metrics import MetricsCollector
from graphdbetl_spark.operators.skew import replicated_skew_join, salted_count_sum


def test_salted_count_sum_matches_plain_aggregate(spark):
    # hot key: 0 appears 1000x, others once
    rows = [(0, float(i)) for i in range(1000)] + [(k, 1.0) for k in range(1, 20)]
    df = spark.createDataFrame(rows, "k int, v double")
    got = {r.k: (r.n_rows, r.sum_v) for r in salted_count_sum(df, ["k"], ["v"]).collect()}
    exp = {
        r.k: (r.n, r.s)
        for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")).collect()
    }
    assert got == exp


def test_replicated_skew_join_matches_plain_join(spark):
    fact = spark.createDataFrame([(0, i) for i in range(500)] + [(1, 1)], "k int, payload int")
    dim = spark.createDataFrame([(0, "hot"), (1, "cold"), (2, "unused")], "k int, label string")
    got = sorted(
        (r.k, r.payload, r.label) for r in replicated_skew_join(fact, dim, "k").collect()
    )
    exp = sorted((r.k, r.payload, r.label) for r in fact.join(dim, "k").collect())
    assert got == exp


def test_metrics_collector_records_rows(spark):
    mc = MetricsCollector()
    df = spark.range(123).toDF("x")
    rec = mc.run(df, "count_range")
    assert rec.num_output_rows == 123
    assert rec.duration_ms > 0
    assert mc.records[0].name == "count_range"


# --- r12: direct pins for the r11 size-derived helpers (r11 ADVICE) ---


def test_iterate_partitions_bounds(spark):
    from graphdbetl_spark.operators.skew import iterate_partitions

    df = spark.range(1000).toDF("x")
    # tiny frame, huge bytes-per-task -> floor of 1
    assert iterate_partitions(df, 1 << 40) == 1
    # bytes_per_task=1 -> ceiling of defaultParallelism
    assert iterate_partitions(df, 1) == spark.sparkContext.defaultParallelism


def test_checkpoint_if_scaled_threshold_both_sides(spark):
    from graphdbetl_spark.operators.skew import checkpoint_if_scaled

    df = spark.range(100).toDF("x")
    # below threshold: the SAME DataFrame object comes back untouched
    assert checkpoint_if_scaled(df, size_of=df, threshold_bytes=1 << 40) is df
    # above threshold: a checkpointed frame (lineage cut to an RDD scan)
    cp = checkpoint_if_scaled(df, size_of=df, threshold_bytes=0)
    assert cp is not df
    assert "LogicalRDD" in cp._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(r.x for r in cp.collect()) == list(range(100))


def test_checkpoint_if_scaled_fallback_keeps_scale_behavior(spark):
    # When plan-stats access raises (non-classic session / private-API
    # drift), the helper must fall back to CHECKPOINTING (the scale
    # posture), not to skipping.
    from graphdbetl_spark.operators.skew import checkpoint_if_scaled

    class Boom:
        @property
        def _jdf(self):
            raise RuntimeError("no JVM plan access")

    df = spark.range(10).toDF("x")
    cp = checkpoint_if_scaled(df, size_of=Boom(), threshold_bytes=1 << 40)
    assert cp is not df
    assert "LogicalRDD" in cp._jdf.queryExecution().optimizedPlan().toString()


def test_adaptive_parallelism_directions(spark):
    from graphdbetl_spark.operators.skew import adaptive_parallelism

    cores = spark.sparkContext.defaultParallelism
    one = spark.range(1000).toDF("k").repartition(1)
    # big byte-derived target, few splits -> repartition up to the clamp
    up = adaptive_parallelism(one, "k", bytes_per_task=1)
    assert up.rdd.getNumPartitions() == cores
    # target <= 1 -> plan untouched (same object back)
    assert adaptive_parallelism(one, "k", bytes_per_task=1 << 40) is one
    # many splits already: guarded direction only — splits are kept
    wide = spark.range(1000).toDF("k").repartition(cores)
    assert adaptive_parallelism(wide, "k", bytes_per_task=1 << 40) is wide


def test_arrow_ids_vecs_rejects_ragged_and_null(spark):
    import numpy as np
    import pyarrow as pa
    import pytest

    from graphdbetl_spark.operators.coreset import _arrow_ids_vecs

    def rb(vecs):
        return pa.RecordBatch.from_arrays(
            [pa.array([1, 2], type=pa.int64()),
             pa.array(vecs, type=pa.list_(pa.float64()))],
            names=["vec_id", "__v"],
        )

    ids, v = _arrow_ids_vecs(rb([[1.0, 2.0], [3.0, 4.0]]), "vec_id")
    assert v.shape == (2, 2) and ids.tolist() == [1, 2]
    # ragged widths whose total still divides num_rows: the silent-
    # misalignment case the r11 ADVICE flagged — must raise, not skew
    with pytest.raises(ValueError, match="ragged"):
        _arrow_ids_vecs(rb([[1.0, 2.0, 3.0], [4.0]]), "vec_id")
    with pytest.raises(ValueError, match="null embedding"):
        _arrow_ids_vecs(rb([[1.0, 2.0], None]), "vec_id")
    with pytest.raises(ValueError, match="null elements"):
        _arrow_ids_vecs(rb([[1.0, None], [2.0, 3.0]]), "vec_id")
