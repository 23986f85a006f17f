"""Tests: data-quality checks and the bucketized range join."""

import pyspark.sql.functions as F

from graphdbetl_spark.etl.quality import check_constraints, check_referential
from graphdbetl_spark.operators.joins import bucketized_range_join


def test_constraints_count_violations(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0, "A"), (2, "x", -1.0, "B"), (2, "y", 3.0, "Z")],
        "id int, name string, v double, cat string",
    )
    out = {
        r.rule: r.violations
        for r in check_constraints(
            df,
            not_null=["name"],
            unique=["id"],
            ranges={"v": (0, 10)},
            accepted={"cat": ["A", "B"]},
        ).collect()
    }
    assert out == {
        "not_null:name": 1,
        "range:v": 1,
        "accepted:cat": 1,
        "unique:id": 1,
    }


def test_referential_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], "k int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    row = check_referential(child, "k", parent, "k").first()
    assert row.rule == "fk:k" and row.violations == 1


def test_bucketized_range_join_equals_naive(spark):
    left = spark.createDataFrame([(float(x),) for x in range(0, 100, 3)], "pt double")
    right = spark.createDataFrame(
        [(i, float(i * 7), float(i * 7 + 10)) for i in range(12)], "id int, lo double, hi double"
    )
    fast = bucketized_range_join(left, right, "pt", "lo", "hi", bucket_width=10.0)
    naive = left.crossJoin(right).filter((F.col("pt") >= F.col("lo")) & (F.col("pt") <= F.col("hi")))
    assert sorted((r.pt, r.id) for r in fast.collect()) == sorted(
        (r.pt, r.id) for r in naive.collect()
    )
