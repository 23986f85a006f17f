"""SCD2 unit tests: change/no-change/new-key/re-change lifecycle."""

import pyspark.sql.functions as F

from graphdbetl_spark.etl.scd2 import scd2_apply, scd2_init


def _ts(s):
    return F.to_timestamp(F.lit(s))


def test_scd2_lifecycle(spark):
    snap1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, attr string")
    table = scd2_init(snap1, "k", ["attr"], _ts("2024-01-01"))

    # apply: key 1 changes, key 2 unchanged, key 3 appears
    snap2 = spark.createDataFrame([(1, "a2"), (2, "b"), (3, "c")], "k int, attr string")
    table = scd2_apply(table, snap2, "k", ["attr"], _ts("2024-02-01"))
    rows = {(r.k, r.attr): (r.valid_from, r.valid_to) for r in table.collect()}
    assert rows[(1, "a")][1] is not None  # closed
    assert rows[(1, "a2")][1] is None  # new open version
    assert rows[(2, "b")][1] is None  # untouched
    assert rows[(3, "c")][1] is None  # inserted

    # second apply: key 1 changes again -> three versions total
    snap3 = spark.createDataFrame([(1, "a3"), (2, "b"), (3, "c")], "k int, attr string")
    table = scd2_apply(table, snap3, "k", ["attr"], _ts("2024-03-01"))
    v1 = table.filter(F.col("k") == 1).orderBy("valid_from").collect()
    assert [r.attr for r in v1] == ["a", "a2", "a3"]
    assert [r.valid_to is None for r in v1] == [False, False, True]


def test_scd2_null_attr_changes_tracked(spark):
    snap1 = spark.createDataFrame([(1, None)], "k int, attr string")
    table = scd2_init(snap1, "k", ["attr"], _ts("2024-01-01"))
    snap2 = spark.createDataFrame([(1, "x")], "k int, attr string")
    table = scd2_apply(table, snap2, "k", ["attr"], _ts("2024-02-01"))
    rows = sorted(table.collect(), key=lambda r: str(r.valid_from))
    assert rows[0].attr is None and rows[0].valid_to is not None
    assert rows[1].attr == "x" and rows[1].valid_to is None
