"""Round-7 operator additions: greedy k-center coreset selection and
the size-binned compaction planner."""

import pyspark.sql.functions as F

from graphdbetl_spark.etl.maintenance import compact_plan
from graphdbetl_spark.operators.coreset import kcenter_select


def test_kcenter_picks_farthest_points(spark):
    # seed = min id (0, pointing +x). The farthest point by cosine is
    # the -x vector (distance 2), then the +y vector (distance 1 to
    # both selected), then the diagonal (distance 1 - 1/sqrt(2)).
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [2.0, 0.0]),       # duplicate direction of the seed
            (2, [0.0, 3.0]),       # orthogonal
            (3, [-1.0, 0.0]),      # antipodal
            (4, [1.0, 1.0]),       # diagonal
        ],
        ["vec_id", "embedding"],
    )
    rows = {r["step"]: r for r in kcenter_select(emb, k=4).collect()}
    assert rows[1]["center_id"] == 0 and rows[1]["radius"] is None
    assert rows[2]["center_id"] == 3 and rows[2]["radius"] == 2.0
    assert rows[3]["center_id"] == 2 and rows[3]["radius"] == 1.0
    assert rows[4]["center_id"] == 4  # 1 - cos(45°) ≈ 0.2929
    assert abs(rows[4]["radius"] - 0.2929) < 1e-9


def test_kcenter_tie_breaks_to_lower_id(spark):
    # vectors 5 and 6 are the same direction: both at max-min distance
    # from the seed — the LOWER id must win the argmin tie.
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (5, [0.0, 1.0]), (6, [0.0, 2.0])],
        ["vec_id", "embedding"],
    )
    rows = {r["step"]: r for r in kcenter_select(emb, k=2).collect()}
    assert rows[2]["center_id"] == 5


def test_compact_plan_bins_by_running_total(spark):
    # partition "a": sizes 60,60,60 with target 100 -> bins at
    # exclusive cum 0,60,120 -> bins 0,0,1. partition "b": one row.
    df = spark.createDataFrame(
        [("a", 1, 60), ("a", 2, 60), ("a", 3, 60), ("b", 9, 10)],
        ["part", "key", "sz"],
    )
    rows = {
        (r["part"], r["bin"]): r
        for r in compact_plan(df, "part", "key", "sz", target_bytes=100).collect()
    }
    assert rows[("a", 0)]["n_rows"] == 2
    assert rows[("a", 0)]["bin_bytes"] == 120
    assert rows[("a", 0)]["min_key"] == 1 and rows[("a", 0)]["max_key"] == 2
    assert rows[("a", 1)]["n_rows"] == 1 and rows[("a", 1)]["min_key"] == 3
    assert rows[("b", 0)]["n_rows"] == 1 and rows[("b", 0)]["bin_bytes"] == 10


def test_compact_plan_prefix_sum_spans_slices(spark):
    # Force many key slices (defaultParallelism >> rows): the offsets
    # join must still stitch the global running total correctly when
    # every row lands in its own slice.
    df = spark.createDataFrame(
        [("a", k, 10) for k in range(1, 21)], ["part", "key", "sz"]
    )
    rows = sorted(
        compact_plan(df, "part", "key", "sz", target_bytes=50).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["n_rows"] for r in rows] == [5, 5, 5, 5]
    assert rows[0]["min_key"] == 1 and rows[-1]["max_key"] == 20


def test_compact_plan_empty_input(spark):
    df = spark.createDataFrame([], "part string, key long, sz long")
    assert compact_plan(df, "part", "key", "sz", target_bytes=100).count() == 0


def test_kcenter_k_exceeding_corpus_ends_early(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], ["vec_id", "embedding"]
    )
    rows = kcenter_select(emb, k=5).collect()
    assert len(rows) == 2
    assert {r["center_id"] for r in rows} == {0, 1}
