"""Dataset maintenance: small-file compaction and Z-order clustering.

At 100 TB the write path's health is as important as the query path:
streaming ingest and per-batch upserts fragment datasets into small
files (each file = scan task + footer fetch + driver memory), and
single-column sort layouts only help predicates on that column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite a parquet dataset into ~target-sized files. Returns the
    new file count. Uses the dataset's actual on-disk size (not row
    counts) to pick the file count; repartition(n) redistributes evenly.
    """
    import os

    total = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, round(total / target_file_bytes))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "__compacting"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (true atomicity needs a table format; this is the
    # filesystem fallback)
    import shutil

    shutil.rmtree(path)
    shutil.move(tmp, path)
    return n_files


def _interleave_bits(a: Column, b: Column, bits: int = 21) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` of two
    non-negative ints — built from literal shifts/masks, JVM-side."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        mask = 1 << i
        z = (
            z.bitwiseOR(F.shiftleft(a.bitwiseAND(F.lit(mask)), i))
            .bitwiseOR(F.shiftleft(b.bitwiseAND(F.lit(mask)), i + 1))
        )
    return z


def zorder_rank(df: DataFrame, col_a: str, col_b: str, buckets: int = 1 << 20) -> Column:
    """Z-order key over two numeric columns, rank-normalized first so
    skew and value range don't break the interleave: each column maps
    to its ntile bucket, then buckets interleave."""
    from pyspark.sql import Window

    ra = F.ntile(1 << 10).over(Window.orderBy(col_a)) - 1
    rb = F.ntile(1 << 10).over(Window.orderBy(col_b)) - 1
    return _interleave_bits(ra.cast("long"), rb.cast("long"), bits=10)


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str, n_files: int = 8
) -> None:
    """Write parquet clustered on the Z-curve of (col_a, col_b): range
    partition + sort by the interleaved key, so every file covers a
    tight rectangle in both dimensions — min/max skipping works for
    predicates on EITHER column (a plain sort only serves its leading
    column)."""
    z = zorder_rank(df, col_a, col_b)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def prune_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep_values: list[str],
) -> list[str]:
    """Retention pruning of a partitioned dataset: drop every
    ``{partition_col}={value}`` directory whose value is not in
    ``keep_values``. Partition-level deletes are metadata-cheap (no
    rewrite of surviving data) — the retention mechanism for
    date-partitioned event/log tables, where row-level deletes would
    rewrite 100 TB to expire a day.

    Returns the list of pruned partition values. Uses Hadoop's
    FileSystem API so it works on any supported storage scheme, not
    just local paths.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = fs_path.getFileSystem(conf)
    keep = {str(v) for v in keep_values}
    pruned: list[str] = []
    for status in fs.listStatus(fs_path):
        name = status.getPath().getName()
        if not status.isDirectory() or "=" not in name:
            continue
        col, _, value = name.partition("=")
        if col == partition_col and value not in keep:
            fs.delete(status.getPath(), True)
            pruned.append(value)
    return sorted(pruned)
