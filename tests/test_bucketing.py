"""Bucketed co-located join: writing both sides bucketed by the join
key removes the exchange entirely — the 100 TB strategy for repeated
joins on the same key (docs/SCALING.md)."""

import pyspark.sql.functions as F


def test_bucketed_join_has_no_exchange(spark):
    # uses the session's default warehouse dir (spark-warehouse/, gitignored);
    # warehouse.dir is a static conf and can't be set per-test
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").mode("overwrite").saveAsTable("c_bkt")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode("overwrite").saveAsTable("o_bkt")

    joined = (
        spark.table("c_bkt")
        .join(spark.table("o_bkt"), F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "o_orderkey")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # both sides bucket-aligned -> no shuffle exchange in the plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == o.count()  # every order matches its customer

    spark.sql("DROP TABLE IF EXISTS c_bkt")
    spark.sql("DROP TABLE IF EXISTS o_bkt")
