"""Streaming soak harness (r4 verdict #9): run the incremental
near-dup screen and the quality gate for a few hundred micro-batches
and PROVE two properties the unit tests can't see:

1. FLAT STORAGE: executor storage memory holds exactly the corpus
   index (2 cached datasets for the near-dup screen, 0 for the
   stateless gate) no matter how many batches run — the r4 ADVICE
   cache-leak class (one dead cached pair pinned per micro-batch)
   would show as cached-RDD count growing with batch count.
2. EXACTLY-ONCE UNDER CRASHES: a foreachBatch that dies before the
   first sink commit, between the two sink commits, and after both
   commits (before the checkpoint records the batch) must, after
   restart + replay, leave both sinks with exactly the no-crash row
   counts — no loss, no double-append.

Usage: SPARK_GRAFT_CPUS=16 python tools/soak_streaming.py [N_BATCHES]
Writes a summary log to stdout; exit 0 iff every assertion held.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from graphdbetl_spark.session import get_spark

SCHEMA = "doc_id long, text string"


def storage_snapshot(spark):
    """(n_cached_rdds, mem_used_bytes) from the JVM block manager."""
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return len(infos), sum(i.memSize() for i in infos)


def make_batch_files(spark, src: str, stage: str, n_batches: int, per_batch: int = 5):
    """One small parquet file per micro-batch: half near-dups of the
    corpus text family, half novel — deterministic contents."""
    os.makedirs(src, exist_ok=True)
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    for b in range(n_batches):
        rows = []
        for i in range(per_batch):
            doc_id = b * per_batch + i
            if i % 2 == 0:
                rows.append((doc_id, base + f" tail{doc_id % 2}"))
            else:
                rows.append((doc_id, f"novel document {doc_id} with unique words w{doc_id}a w{doc_id}b w{doc_id}c"))
        df = spark.createDataFrame(rows, SCHEMA)
        tmp = os.path.join(stage, f"b{b}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        for f in os.listdir(tmp):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(tmp, f), os.path.join(src, f"b{b:05d}.parquet"))


def run_neardup_soak(spark, root: str, n_batches: int) -> None:
    from graphdbetl_spark.streaming.curation import start_streaming_neardup_screen

    src = os.path.join(root, "nd_src")
    make_batch_files(spark, src, os.path.join(root, "nd_stage"), n_batches)
    base = "the quick brown fox jumps over the lazy dog near the river bank"
    corpus = spark.createDataFrame(
        [(10_000 + i, base + f" tail{i % 2}") for i in range(8)], SCHEMA
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_streaming_neardup_screen(
        stream,
        corpus,
        "text",
        "doc_id",
        os.path.join(root, "nd_unique"),
        os.path.join(root, "nd_dup"),
        os.path.join(root, "nd_ck"),
        trigger_once=False,
    )
    samples = []
    baseline = None
    try:
        while True:
            time.sleep(2.0)
            p = q.lastProgress
            done = int(p["batchId"]) if p else -1
            snap = storage_snapshot(spark)
            samples.append((done, *snap))
            if baseline is None and done >= 1:
                baseline = snap
            if done >= n_batches - 1 and not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()
    ud = spark.read.parquet(os.path.join(root, "nd_unique"))
    dd = spark.read.parquet(os.path.join(root, "nd_dup"))
    n_u, n_d = ud.count(), dd.count()
    # ground truth: the batch-mode incremental screen on the same docs
    from graphdbetl_spark.operators.dedup import minhash_incremental_md5

    all_docs = spark.read.parquet(src)
    flags = {
        r["doc_id"]: r["is_near_dup"]
        for r in minhash_incremental_md5(corpus, all_docs, "text", "doc_id").collect()
    }
    exp_d = sum(flags.values())
    exp_u = len(flags) - exp_d
    print(f"neardup soak: {n_batches} batches, unique={n_u} dup={n_d} "
          f"(batch-mode ground truth {exp_u}/{exp_d})")
    for done, n_rdd, mem in samples[:: max(1, len(samples) // 10)]:
        print(f"  batch={done:5d} cached_rdds={n_rdd} storage_mem={mem}")
    assert (n_u, n_d) == (exp_u, exp_d), "streaming routing != batch screen"
    got_dup_ids = {r["doc_id"] for r in dd.select("doc_id").collect()}
    assert got_dup_ids == {d for d, v in flags.items() if v}
    # 2 corpus-index datasets + at most ONE transient in-flight routed
    # batch (cached in process(), unpersisted in its finally) — growth
    # WITH batch count is the leak signature, a bounded +1 is not
    peak = max(s[1] for s in samples)
    assert peak <= 3, f"cached-RDD count grew to {peak} (index 2 + 1 in-flight)"
    assert samples[-1][1] <= 2, "in-flight cache leaked past the stream's end"
    if baseline:
        final_mem = samples[-1][2]
        assert final_mem <= baseline[1] * 1.05 + 1_000_000, (
            f"storage memory grew {baseline[1]} -> {final_mem}"
        )
    print("  FLAT: storage = 2 corpus-index datasets (+<=1 in-flight), no growth")


def run_quality_soak(spark, root: str, n_batches: int) -> None:
    from graphdbetl_spark.streaming.curation import start_streaming_quality_gate

    # the near-dup phase's corpus-index caches live for ITS stream's
    # lifetime; this phase measures the stateless gate in isolation
    spark.catalog.clearCache()
    src = os.path.join(root, "qg_src")
    make_batch_files(spark, src, os.path.join(root, "qg_stage"), n_batches)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = start_streaming_quality_gate(
        stream,
        "text",
        "doc_id",
        os.path.join(root, "qg_pass"),
        os.path.join(root, "qg_reject"),
        os.path.join(root, "qg_ck"),
        trigger_once=False,
    )
    peak = 0
    try:
        while True:
            time.sleep(2.0)
            p = q.lastProgress
            done = int(p["batchId"]) if p else -1
            peak = max(peak, storage_snapshot(spark)[0])
            if done >= n_batches - 1 and not q.status["isDataAvailable"]:
                break
    finally:
        q.stop()
    n_p = spark.read.parquet(os.path.join(root, "qg_pass")).count()
    n_r = spark.read.parquet(os.path.join(root, "qg_reject")).count()
    final = storage_snapshot(spark)[0]
    print(f"quality soak: {n_batches} batches, pass={n_p} reject={n_r} "
          f"(total {n_batches * 5}), peak cached_rdds={peak}")
    assert n_p + n_r == n_batches * 5
    # no reference state: at most the one transient in-flight routed
    # batch may appear; nothing may survive the stream
    assert peak <= 1, f"stateless gate pinned {peak} datasets"
    assert final == 0, "stateless gate leaked cache past the stream's end"
    print("  FLAT: the stateless gate pinned no storage beyond the in-flight batch")


def run_crash_matrix(spark, root: str) -> None:
    """Kill the near-dup router at each commit point of one batch, then
    restart with the same checkpoint: final counts must equal the
    no-crash ground truth."""
    import graphdbetl_spark.streaming.txn_sink as txn
    from graphdbetl_spark.streaming.curation import start_streaming_neardup_screen

    base = "the quick brown fox jumps over the lazy dog near the river bank"
    corpus = spark.createDataFrame(
        [(10_000 + i, base + f" tail{i % 2}") for i in range(8)], SCHEMA
    )
    real_write = txn.write_batch_exactly_once
    n_batches = 6
    for label, crash_call in (("before_first_sink", 0), ("between_sinks", 1),
                              ("after_both_sinks", 2)):
        root_c = os.path.join(root, f"crash_{label}")
        src = os.path.join(root_c, "src")
        make_batch_files(spark, src, os.path.join(root_c, "stage"), n_batches)
        unique, dup = os.path.join(root_c, "u"), os.path.join(root_c, "d")
        ckpt = os.path.join(root_c, "ck")
        state = {"calls": 0, "armed": True}

        def flaky(batch, batch_id, out_dir, _state=state, _crash=crash_call):
            # crash exactly once at the chosen commit point of batch 3:
            # 0 = before the first sink commits, 1 = between the two
            # commits, 2 = after BOTH commit (before the checkpoint
            # records the batch — the replay-after-success case)
            if batch_id == 3 and _state["armed"]:
                if _state["calls"] == _crash:
                    _state["armed"] = False
                    raise RuntimeError(f"injected crash at call {_crash}")
                _state["calls"] += 1
                ret = real_write(batch, batch_id, out_dir)
                if _state["calls"] == 2 and _crash == 2 and _state["armed"]:
                    _state["armed"] = False
                    raise RuntimeError("injected crash after both sinks")
                return ret
            return real_write(batch, batch_id, out_dir)

        txn.write_batch_exactly_once = flaky
        try:
            stream = (spark.readStream.schema(SCHEMA)
                      .option("maxFilesPerTrigger", "1").parquet(src))
            q = start_streaming_neardup_screen(
                stream, corpus, "text", "doc_id", unique, dup, ckpt,
                trigger_once=False,
            )
            try:
                q.awaitTermination(180)
            except Exception:
                pass  # the injected crash fails the query
            finally:
                if q.isActive:
                    q.stop()
            # restart: checkpoint replays the failed batch, sinks dedup
            stream2 = (spark.readStream.schema(SCHEMA)
                       .option("maxFilesPerTrigger", "1").parquet(src))
            q2 = start_streaming_neardup_screen(
                stream2, corpus, "text", "doc_id", unique, dup, ckpt,
                trigger_once=True,
            )
            q2.awaitTermination(180)
        finally:
            txn.write_batch_exactly_once = real_write
        from graphdbetl_spark.operators.dedup import minhash_incremental_md5

        flags = {
            r["doc_id"]: r["is_near_dup"]
            for r in minhash_incremental_md5(
                corpus, spark.read.parquet(src), "text", "doc_id"
            ).collect()
        }
        exp_d = sum(flags.values())
        exp_u = len(flags) - exp_d
        n_u = spark.read.parquet(unique).count()
        n_d = spark.read.parquet(dup).count()
        ids_u = [r[0] for r in spark.read.parquet(unique).select("doc_id").collect()]
        assert len(ids_u) == len(set(ids_u)), f"{label}: duplicated rows in unique"
        assert (n_u, n_d) == (exp_u, exp_d), (
            f"{label}: counts {n_u}/{n_d} != {exp_u}/{exp_d}"
        )
        print(f"crash matrix [{label}]: exactly-once held ({n_u}/{n_d})")


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    root = tempfile.mkdtemp(prefix="graft_soak_")
    spark = get_spark("streaming-soak")
    try:
        run_neardup_soak(spark, root, n_batches)
        run_quality_soak(spark, root, max(50, n_batches // 4))
        run_crash_matrix(spark, root)
        print("SOAK OK")
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
