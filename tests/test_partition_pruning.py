"""Partitioned-layout pruning: a year-partitioned write plus a year
filter must scan only the matching partition directories (the layout
strategy docs/SCALING.md prescribes for 100 TB node tables)."""

import pyspark.sql.functions as F


def test_partitioned_write_prunes_scan(spark, tmp_path):
    out = str(tmp_path / "orders_by_year")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    (
        orders.withColumn("order_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("order_year")
        .parquet(out)
    )

    df = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "order_year" in plan
    expected = orders.filter(F.year("o_orderdate") == 1997).count()
    assert df.count() == expected > 0

    # files ACTUALLY read (input_file_name at runtime) are only the
    # matching partition's — the full dataset spans 7 year dirs
    read_files = [r[0] for r in df.select(F.input_file_name()).distinct().collect()]
    assert read_files and all("order_year=1997" in f for f in read_files)
