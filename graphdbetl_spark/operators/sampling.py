"""Deterministic sampling and sequence packing for training-data
pipelines.

All sampling here is HASH-based, not RNG-based: membership is a pure
function of the row's id (md5 bucket), so splits are reproducible
across runs, engines, partitionings, and cluster sizes — the property
train/test splits must have. (``df.sample``/``sampleBy`` are
partitioning-dependent and can't be replayed by another engine.)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets): first 8 hex chars of md5(id)."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % buckets).cast("int")


def train_test_split(
    df: DataFrame, id_col: str, test_pct: int = 10, buckets: int = 100
) -> DataFrame:
    """Tag each row train/test by hash bucket (test = lowest
    ``test_pct`` buckets)."""
    b = hash_bucket(F.col(id_col), buckets)
    return df.withColumn(
        "split", F.when(b < test_pct, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_hash_sample(
    df: DataFrame, id_col: str, strata_col: str, rates: dict[str, int], buckets: int = 100
) -> DataFrame:
    """Per-stratum deterministic downsampling: keep a row iff its hash
    bucket < the stratum's rate (percent). Mixture re-weighting for
    training corpora, reproducible at any scale."""
    b = hash_bucket(F.col(id_col), buckets)
    rate = F.coalesce(
        *[F.when(F.col(strata_col) == k, F.lit(v)) for k, v in rates.items()],
        F.lit(0),
    )
    return df.filter(b < rate)


def pack_sequences(
    df: DataFrame, id_col: str, size_col: Column, budget: int
) -> DataFrame:
    """Greedy sequential packing: order docs by id, accumulate sizes,
    pack_id = floor(cumulative_size_before / budget).

    The streaming-pack approximation used for LLM sequence packing at
    corpus scale (exact bin packing is NP-hard and order-dependent);
    one global window — at 100 TB, partition by shard first and pack
    within shards.
    """
    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.select(
        F.col(id_col),
        size_col.cast("long").alias("n_tokens"),
        F.floor(cum_before / budget).cast("long").alias("pack_id"),
    )


def balance_uniform(df: DataFrame, id_col: str, strata_col: str) -> DataFrame:
    """Exact uniform mixture balancing: downsample every stratum to the
    size of the smallest one, keeping the deterministically-first rows
    by md5(id) rank (so the kept subset is stable across runs/engines).

    Shape: one count aggregation (tiny — one row per stratum, broadcast
    back) plus one window shuffle partitioned by stratum. Exact-count
    balancing is right when strata are few and bounded (languages,
    sources). At 100 TB with a skew-heavy stratum, prefer the
    shuffle-free hash-threshold form (``stratified_hash_sample`` with
    rate = min_count/n per stratum): approximate counts, zero windows.
    """
    mn = F.broadcast(
        df.groupBy(strata_col).count().agg(F.min("count").alias("__mn"))
    )
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .crossJoin(mn)
        .filter(F.col("__rn") <= F.col("__mn"))
        .select(id_col, strata_col)
    )


def mixture_upsample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    factors_pct: dict[str, int],
    default_pct: int = 100,
) -> DataFrame:
    """Epoch upsampling with FRACTIONAL repeat factors — the mixture
    re-weighting a training run applies to its high-quality sources
    (e.g. 2.5 epochs of wiki against 1 of web): factors are integer
    PERCENTS (250 = 2.5×), each row repeats ``pct // 100`` times plus
    one more iff its md5 bucket falls under ``pct % 100`` — the same
    deterministic hash-membership used by every split/sample here, so
    the realized mixture is exact in expectation, reproducible across
    engines/runs/partitionings, and integer-only (no float fuzz in
    membership).

    Zero shuffles: the repeat count is a projection and the fan-out is
    an in-stage explode of ``sequence(0, n-1)`` — rows multiply inside
    whatever scan is already running, exactly like chunking. Output
    gains an ``epoch`` column (0-based copy index) so downstream
    packing can interleave epochs rather than emit them back to back.
    """
    pct: Column = F.lit(default_pct)
    for k, v in sorted(factors_pct.items()):
        pct = F.when(F.col(strata_col) == k, F.lit(v)).otherwise(pct)
    whole = (pct / 100).cast("int")
    extra = (hash_bucket(F.col(id_col)) < pct % 100).cast("int")
    n = (whole + extra).alias("__n")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("__n") - 1)))
        .drop("__n")
    )
