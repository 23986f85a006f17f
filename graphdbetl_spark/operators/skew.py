"""Skew mitigation primitives (SURVEY.md §4: "salting only if dedup
keys skew").

AQE's skew-join splitting handles most cases at runtime; these helpers
cover the two shapes AQE can't: skewed *aggregation* keys, and skewed
*broadcast-ineligible* joins. Both use the standard two-phase salt:
spread a hot key over N sub-keys, partially aggregate, then combine.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def ensure_scan_parallelism(df: DataFrame, key_col: str) -> DataFrame:
    """Local-scale adapter for compute-bound per-row pipelines (n-gram
    fingerprinting, PQ code assignment: hundreds of expression evals
    per row). Small test files are single-row-group parquet, so the
    scan is ONE task and the whole map side serializes on one core no
    matter how many cores exist. When the incoming plan has materially
    fewer partitions than the session's parallelism, hash-repartition
    on the id column (deterministic, order-insensitive downstream; the
    shuffled bytes are the small raw input, not the exploded
    intermediate). At cluster scale inputs arrive in many splits, the
    guard never fires, and no exchange is added to the hot path."""
    try:
        nparts = df.rdd.getNumPartitions()
        target = df.sparkSession.sparkContext.defaultParallelism
    except Exception:  # non-classic sessions: keep the plan untouched
        return df
    if nparts * 2 <= target:
        return df.repartition(target, F.col(key_col))
    return df


def salted_count_sum(
    df: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """groupBy(keys).agg(count, sums) that survives a hot key.

    Phase 1 groups on (keys, salt) — a hot key's rows spread over
    ``salt_buckets`` reducers; phase 2 combines the per-salt partials.
    count/sum/min/max re-aggregate losslessly (avg = sum/count at the
    end); this is exactly the partial/final split Catalyst does
    map-side, pushed one level further for pathological keys.
    """
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    phase1 = df.select(*keys, salt, *sum_cols).groupBy(*keys, "__salt").agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__sum_{c}") for c in sum_cols],
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__n").alias("n_rows"),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sum_cols],
    )


def replicated_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join resilient to a skewed fact key when the dim side is too
    big to broadcast: fact rows get a random salt, dim rows are
    replicated across all salts, and the join runs on (key, salt) so a
    hot key's rows land on ``salt_buckets`` different reducers.

    Cost: dim side × salt_buckets — use only when AQE's skew split
    isn't available (e.g. the join feeds a co-partitioned downstream
    op that must not be re-split).
    """
    salted_fact = fact.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])).alias("__salt")
    replicated_dim = dim.select("*", salts)
    out = salted_fact.join(replicated_dim, [key, "__salt"])
    return out.drop("__salt")
