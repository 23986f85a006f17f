"""Streaming node-ingest test: two micro-batch replays maintain a
deduped node table (the reference's build loop as a streaming sink)."""

import os
import shutil

import pyspark.sql.functions as F

from graphdbetl_spark.streaming.ingest import start_node_ingest, upsert_batch


def test_upsert_batch_merges_and_creates(spark):
    existing = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "id int, name string, v double")
    batch = spark.createDataFrame([(2, None, 9.0), (3, "c", 3.0)], "id int, name string, v double")
    out = {r.id: (r.name, r.v) for r in upsert_batch(existing, batch, "id").collect()}
    assert out == {1: ("a", 1.0), 2: ("b", 9.0), 3: ("c", 3.0)}  # 2: batch v wins, name kept


def test_streaming_ingest_two_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "node_table")
    ckpt = str(tmp_path / "ck")  # shared: restart resumes from the offset log
    os.makedirs(src)

    def add_file(rows, name):
        df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        for f in os.listdir(str(tmp_path / name)):
            if f.endswith(".parquet"):
                shutil.copy(os.path.join(str(tmp_path / name), f), os.path.join(src, f"{name}.parquet"))

    schema = "user_id long, event_type string, value double"
    add_file([(1, "signup", 1.0), (1, "click", 2.0), (2, "signup", 5.0)], "b1")
    stream = spark.readStream.schema(schema).parquet(src)
    q = start_node_ingest(stream, table, "user_id", ckpt)
    q.awaitTermination(120)

    t1 = {r.user_id for r in spark.read.parquet(table).collect()}
    assert t1 == {1, 2}  # deduped within batch

    add_file([(2, "purchase", 9.0), (3, "signup", 7.0)], "b2")
    # restart with the same checkpoint: only the new file forms batch 2
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = start_node_ingest(stream2, table, "user_id", ckpt)
    q2.awaitTermination(120)

    rows = {r.user_id: r for r in spark.read.parquet(table).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2].value == 9.0  # latest batch won
