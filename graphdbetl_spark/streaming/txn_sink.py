"""Two-phase, exactly-once-EFFECT output commit for foreachBatch.

Structured Streaming replays a micro-batch after failure with the SAME
batchId (at-least-once invocation, per the Structured Streaming
programming guide); end-to-end exactly-once output therefore requires
the sink itself to be idempotent per batchId. The reference has no
durability story at all — its writer appends rows one at a time with
no transaction boundary (``graph_db_builder.py:515-530``), so a crash
mid-build leaves a half-written table indistinguishable from a
finished one. This sink is the two-phase recipe a lakehouse commit
protocol uses, on plain parquet:

  phase 1 (stage):  write the batch under ``_staging/<batchId>`` —
                    invisible to readers, safely re-writable on replay.
  phase 2 (commit): atomic rename to ``batch=<batchId>`` inside the
                    dataset, then an atomic commit marker
                    (tmp + rename) in ``_commits/``.

Replay of a committed batchId short-circuits on the marker. The crash
matrix: die in phase 1 → no marker, stage is overwritten on replay;
die between rename and marker → data dir exists, marker missing —
replay detects the completed move and just re-stamps the marker
(batch content is deterministic for a batchId, so the data is the
same); die after marker → replay is a no-op. Readers see only
committed batches by construction (``_staging``/``_commits`` are
underscore-prefixed, which parquet listing ignores).

CONTRACT: ``out_dir`` is owned by exactly one streaming checkpoint.
BatchIds are only unique within a checkpoint — if the checkpoint is
deleted and a new query restarts at batchId 0 against an out_dir that
still holds ``batch=0`` from the prior run, the re-stamp branch would
mark the stale data committed instead of rewriting it (the
"deterministic content per batchId" premise no longer holds). Pair
the out_dir's lifetime with the checkpoint's: start a fresh out_dir
whenever you start a fresh checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Callable

from pyspark.sql import DataFrame


def _commit_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_commits")


def committed_batches(out_dir: str) -> set[int]:
    """BatchIds with a durable commit marker. Non-numeric ``*.json``
    names (editor droppings, foreign files) are ignored rather than
    crashing recovery."""
    d = _commit_dir(out_dir)
    if not os.path.isdir(d):
        return set()
    return {
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json") and f[:-5].isdigit()
    }


def _stamp(out_dir: str, batch_id: int, n_rows: int | None) -> None:
    d = _commit_dir(out_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{batch_id}.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"batch_id": batch_id, "rows": n_rows, "ts": time.time()}, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(d, f"{batch_id}.json"))  # atomic publish


def write_batch_exactly_once(batch: DataFrame, batch_id: int, out_dir: str) -> bool:
    """Idempotently append one micro-batch as partition
    ``batch=<batchId>`` of ``out_dir``. Returns True if this call
    committed the batch, False if it was already committed (replay)."""
    if batch_id in committed_batches(out_dir):
        return False
    dest = os.path.join(out_dir, f"batch={batch_id}")
    if os.path.exists(dest):
        # phase-2 crash window: the rename happened, the marker didn't.
        # The data move is complete and deterministic — re-stamp only.
        _stamp(out_dir, batch_id, None)
        return True
    stage = os.path.join(out_dir, "_staging", str(batch_id))
    if os.path.exists(stage):
        shutil.rmtree(stage)  # phase-1 crash leftovers: rewrite cleanly
    batch.write.mode("overwrite").parquet(stage)
    os.makedirs(out_dir, exist_ok=True)
    os.rename(stage, dest)  # atomic visibility flip
    _stamp(out_dir, batch_id, batch.count())
    return True


def exactly_once_sink(out_dir: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch callable: ``writeStream.foreachBatch(
    exactly_once_sink(path))`` — replays collapse on the commit
    ledger, so downstream readers of ``path`` see each batch once."""

    def process(batch: DataFrame, batch_id: int) -> None:
        write_batch_exactly_once(batch, batch_id, out_dir)

    return process
