"""Streaming graph ingest: continuous node-table maintenance from an
event stream — the streaming form of the reference's batch node build
(its cursor loop, graph_db_builder.py:516-530, re-expressed as a
Structured Streaming sink).

Each micro-batch upserts into the parquet node table via foreachBatch:
batch rows are deduped (first-wins within the batch), merged against
the existing table (delta wins), and the table is rewritten via a
staged atomic swap (write to staging, move current aside, promote —
no crash point loses both copies). At warehouse scale the rewrite
becomes MERGE INTO on a lakehouse table format; the micro-batch dedup
+ merge logic is identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from graphdbetl_spark.etl.maintenance import recover_dataset, safe_overwrite
from graphdbetl_spark.operators.dedup import dedup_merge_first_wins


def upsert_batch(
    existing: DataFrame | None,
    batch: DataFrame,
    id_col: str,
    order_by: list[str] | None = None,
) -> DataFrame:
    """Merge one micro-batch into the current table state: batch rows
    win per column, unmatched existing rows survive.

    "First-wins" within the batch orders by ``order_by``; when none is
    given, a real arrival-order column is threaded through the dedup
    (``monotonically_increasing_id`` — ascending in source row order
    within the micro-batch), so the winner is the earliest-arriving
    non-null value, not an accidental per-column minimum."""
    if order_by:
        deduped = dedup_merge_first_wins(batch, id_col, order_by=order_by)
    else:
        deduped = dedup_merge_first_wins(
            batch.withColumn("__arrival", F.monotonically_increasing_id()),
            id_col,
            order_by=["__arrival"],
        ).drop("__arrival")
    if existing is None:
        return deduped
    e, d = existing.alias("e"), deduped.alias("d")
    joined = e.join(d, F.col(f"e.{id_col}") == F.col(f"d.{id_col}"), "full")
    cols = [F.coalesce(f"d.{c}", f"e.{c}").alias(c) for c in existing.columns]
    return joined.select(*cols)


def start_node_ingest(
    stream: DataFrame,
    table_path: str,
    id_col: str,
    checkpoint: str,
    trigger_once: bool = True,
) -> StreamingQuery:
    """Start a streaming query that maintains ``table_path`` as the
    deduped node table of everything seen on the stream."""
    spark = stream.sparkSession

    def process(batch: DataFrame, batch_id: int) -> None:
        recover_dataset(table_path)  # heal a crash mid-swap from a prior run
        try:
            existing = spark.read.parquet(table_path)
        except Exception:
            existing = None
        merged = upsert_batch(existing, batch, id_col)
        # staged write + atomic promote: the source table stays intact
        # while the merge plan executes (no cache-then-overwrite — cached
        # blocks aren't durable, and an executor loss mid-overwrite would
        # recompute lineage against a half-deleted source)
        safe_overwrite(merged, table_path)

    writer = stream.writeStream.foreachBatch(process).option("checkpointLocation", checkpoint)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
