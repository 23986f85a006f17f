"""Incremental time-bucket rollup (continuous aggregate) — the
"hypertable rollup" operator: a materialized per-bucket aggregate table
maintained incrementally as new events arrive, instead of recomputed
from raw events.

Correctness rests on mergeability: the rollup stores partial states
(count, sum) keyed by (bucket, dims); a new micro-batch's partials
merge by key with ``sum``. Derived metrics (avg) are computed at read
time from the partials — never stored, or they stop being mergeable.
At warehouse scale the merge is a MERGE INTO on the rollup table keyed
by bucket; here it is a keyed re-aggregation + overwrite.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def bucket_partials(events: DataFrame, ts_col: str = "ts", width: str = "1 hour") -> DataFrame:
    """Aggregate raw events into mergeable per-bucket partial states."""
    return (
        events.groupBy(F.window(ts_col, width).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("win.start").alias("bucket"), "event_type", "n_events", "sum_value")
    )


def merge_rollup(existing: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Merge partial states by (bucket, event_type): counts and sums add."""
    if existing is None:
        return delta
    return (
        existing.unionByName(delta)
        .groupBy("bucket", "event_type")
        .agg(F.sum("n_events").alias("n_events"), F.sum("sum_value").alias("sum_value"))
    )


def read_rollup(spark, rollup_path: str) -> DataFrame:
    """Read-time view: derived metrics from the stored partials."""
    r = spark.read.parquet(rollup_path)
    return r.select(
        "bucket",
        "event_type",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
        F.round(F.col("sum_value") / F.col("n_events"), 6).alias("avg_value"),
    )


def start_rollup_maintenance(
    stream: DataFrame,
    rollup_path: str,
    checkpoint: str,
    ts_col: str = "ts",
    width: str = "1 hour",
) -> StreamingQuery:
    """Continuously maintain the rollup from a stream via foreachBatch."""
    spark = stream.sparkSession

    def process(batch: DataFrame, batch_id: int) -> None:
        from graphdbetl_spark.etl.maintenance import recover_dataset, safe_overwrite

        recover_dataset(rollup_path)
        delta = bucket_partials(batch, ts_col, width)
        try:
            existing = spark.read.parquet(rollup_path)
        except Exception:
            existing = None
        merged = merge_rollup(existing, delta)
        # staged write + atomic promote (see streaming/ingest.py): never
        # overwrite the path the merge plan is still reading from
        safe_overwrite(merged, rollup_path)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
