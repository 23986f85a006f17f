"""Join compositions Spark lacks as single operators: as-of join and
grouped top-k (SURVEY.md §2B joins table; D2/D3 equi-joins are plain
``df.join`` and live in etl/builder.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``on`` key: the latest with ``right_ts <= left_ts`` (``backward``,
    default) or the earliest with ``right_ts >= left_ts``
    (``forward``). With ``tolerance`` (an INTERVAL string for
    timestamps, e.g. ``'2 hours'``), matches farther than the tolerance
    resolve to NULL — the pandas ``merge_asof`` surface.

    Implemented as the merge-sort composition: union both sides tagged,
    one window sort per key ordered by (ts, side) with right rows
    before left rows on ties (order reversed for ``forward``), then
    ``last(value, ignorenulls=True)`` over the unbounded-preceding
    frame carries the nearest right value across. The matched right
    timestamp is carried alongside so the tolerance check is one
    post-projection. Cost: ONE shuffle on the key + one sort — linear,
    unlike the naive equi-join + filter + row_number which materializes
    every (left, right) pair per key. This is the 100 TB-safe shape.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = [c for c in left.columns]
    carry_cols = list(right_value_cols) + ["__rts"]
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right on ts ties
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(c) for c in right_value_cols],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__rts"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        *[F.col(c) for c in right_value_cols],
        F.col(right_ts).alias("__rts"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    order = (
        [F.col("__ts").asc(), F.col("__side").asc()]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__side").asc()]
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"__carry_{c}") for c in carry_cols]
    )
    if tolerance is None:
        ok = F.lit(True)
    elif direction == "backward":
        ok = F.col("__ts") - F.expr(f"INTERVAL {tolerance}") <= F.col("__carry___rts")
    else:
        ok = F.col("__carry___rts") <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
    out = carried.filter(F.col("__side") == 1).select(
        *[F.col("__l").getField(c).alias(c) for c in lcols],
        *[
            F.when(ok, F.col(f"__carry_{c}")).alias(c)
            for c in right_value_cols
        ],
    )
    return out


def bucketized_range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Point-in-interval join WITHOUT an equi key: ``left.point ∈
    [right.lo, right.hi]``.

    Naively this is a broadcast-nested-loop (every left row × every
    right interval). Bucketizing manufactures the missing equi key:
    each interval explodes to the buckets it overlaps, each point maps
    to its bucket, and the join becomes bucket-equi + residual filter.
    Cost scales with (intervals × avg buckets per interval) instead of
    |left|×|right| — choose ``bucket_width`` ≈ typical interval length
    so each interval lands in O(1) buckets.
    """
    lo_b = F.floor(F.col(right_lo) / bucket_width).cast("long")
    hi_b = F.floor(F.col(right_hi) / bucket_width).cast("long")
    r_exploded = right.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))
    l_bucketed = left.withColumn("__bucket", F.floor(F.col(left_point) / bucket_width).cast("long"))
    joined = l_bucketed.join(r_exploded, "__bucket").filter(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    )
    return joined.drop("__bucket")


def topk_per_group(
    df: DataFrame, group_cols: list[str], order_col: str, k: int, descending: bool = True
) -> DataFrame:
    """Top-k rows per group via row_number over a partitioned window.

    Catalyst inserts a partial top-k (WindowGroupLimit) before the
    shuffle on recent Spark versions, so only ~k rows per group per
    partition move — safe under group skew.
    """
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(*group_cols).orderBy(order, *[F.col(c) for c in df.columns if c != order_col][:1])
    return df.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
