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


def test_two_hop_bucketed_layout_elides_lineitem_exchange_and_sort(spark):
    """The r11 li1000 layout rung's plan contract at test scale
    (tools/two_hop_bucketed_li1000.py): with lineitem's (l_orderkey,
    l_partkey) projection and orders' (o_orderkey, o_custkey)
    projection written bucketed+sorted on the orderkey (one file per
    bucket via repartition-to-bucket-count), the bucket-aligned
    o ⋈ l join plans with NO exchange and NO sort on either side, and
    the broadcast-segment two-hop aggregation over it matches the
    plain-parquet two_hop result exactly."""
    from tools.two_hop_bucketed_li1000 import (
        BUCKETS,
        build_tables,
        two_hop_bkt_v2,
        two_hop_plain,
    )

    sf = "/root/testdata/sf0.001"
    build_tables(spark, sf)
    try:
        o = spark.table("li1000_o_bkt")
        l = spark.table("li1000_li_bkt")
        core = o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = core._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "Sort [" not in plan, plan  # sortBy metadata trusted: no SMJ sort
        assert BUCKETS == 64  # the rung's layout constant, pinned

        got = sorted(two_hop_bkt_v2(spark, sf).collect())
        want = sorted(two_hop_plain(spark, sf).collect())
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS li1000_li_bkt")
        spark.sql("DROP TABLE IF EXISTS li1000_o_bkt")
