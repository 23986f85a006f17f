"""Data-quality validation: declarative constraint checks over any
DataFrame, reported as one row per rule.

The reference loads blindly (no validation anywhere); an ETL engine at
100 TB needs cheap in-pipeline checks. All rules for one table compile
into a SINGLE aggregation pass (conditional counts) — adding rules does
not add scans. Referential checks are anti-join counts.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def check_constraints(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Run declarative checks; returns (rule, violations, total) rows.

    not_null/ranges/accepted fold into one aggregation; each `unique`
    column adds one distinct-count (same scan, separate shuffle).
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    names: list[str] = []
    for c in not_null or []:
        names.append(f"not_null:{c}")
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(names[-1]))
    for c, (lo, hi) in (ranges or {}).items():
        names.append(f"range:{c}")
        aggs.append(
            F.count(F.when(~F.col(c).between(lo, hi), 1)).alias(names[-1])
        )
    for c, vals in (accepted or {}).items():
        names.append(f"accepted:{c}")
        aggs.append(F.count(F.when(~F.col(c).isin(*vals), 1)).alias(names[-1]))
    for c in unique or []:
        names.append(f"unique:{c}")
        aggs.append(
            (F.count(F.col(c)) - F.countDistinct(F.col(c))).alias(names[-1])
        )

    row = df.agg(*aggs)
    stacked = row.selectExpr(
        "__total",
        "stack({n}, {pairs}) AS (rule, violations)".format(
            n=len(names),
            pairs=", ".join(f"'{r}', `{r}`" for r in names),
        ),
    )
    return stacked.select(
        "rule", F.col("violations").cast("long").alias("violations"),
        F.col("__total").cast("long").alias("total"),
    )


def check_referential(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Orphan count: child keys with no parent (left_anti)."""
    orphans = child.join(
        parent.select(F.col(parent_key).alias(child_key)), child_key, "left_anti"
    )
    return orphans.agg(
        F.lit(f"fk:{child_key}").alias("rule"),
        F.count(F.lit(1)).alias("violations"),
    )
