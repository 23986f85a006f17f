"""Snapshot diff and CDC apply on constructed frames (edge cases the
derived-from-customer oracle queries can't isolate: null-safe compare,
delete of an absent key, update-as-insert)."""

import pyspark.sql.functions as F

from graphdbetl_spark.operators.reconcile import cdc_apply, snapshot_diff


def test_snapshot_diff_classifies_and_is_null_safe(spark):
    a = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, 40.0)], "k long, v double"
    )
    b = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0), (5, 50.0)], "k long, v double"
    )
    out = {r["k"]: r for r in snapshot_diff(a, b, ["k"], ["v"]).collect()}
    # 1 unchanged, 2 unchanged (NULL <=> NULL), 3 changed, 4 removed, 5 added
    assert set(out) == {3, 4, 5}
    assert out[3]["change"] == "changed" and out[3]["new_v"] == 99.0
    assert out[4]["change"] == "removed" and out[4]["new_v"] is None
    assert out[5]["change"] == "added" and out[5]["old_v"] is None


def test_cdc_apply_latest_wins_with_tombstones(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    log = spark.createDataFrame(
        [
            (1, "U", 1, "a2"),
            (1, "D", 2, None),   # delete after update: row 1 gone
            (2, "U", 1, "b2"),   # plain update
            (4, "U", 1, "d"),    # update of absent key -> insert
            (5, "D", 1, None),   # delete of absent key -> no row
        ],
        "k long, op string, seq int, v string",
    )
    out = {r["k"]: (r["v"], r["last_op"]) for r in
           cdc_apply(base, log, "k", "seq", "op", ["v"]).collect()}
    assert out == {2: ("b2", "U"), 3: ("c", "N"), 4: ("d", "U")}
