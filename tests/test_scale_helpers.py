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
