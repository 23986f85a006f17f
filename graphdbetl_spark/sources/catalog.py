"""Testdata catalog: canonical loaders for the driver's parquet tables.

Replaces the reference's schema-peek + full-scan source path
(``graph_db_builder.py:157,173-177`` LIMIT-1 peek; ``:482`` SELECT *):
parquet footers are self-describing, so schema discovery is free, and
column pruning / predicate pushdown happen in the scan once downstream
operators select/filter — never fetch-everything-then-drop.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from graphdbetl_spark.session import configure_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (session-JVM id, sf_dir, table) -> analyzed DataFrame. DataFrames are
# immutable lazy plans, so handing the same object to every query is
# safe and skips the per-load file listing + footer read + analysis —
# measurable across a 140-query correctness sweep. This memoizes the
# *plan only*; it never persists data, so scans keep their pushdown /
# pruning shape (asserted by tests/test_plans.py).
_table_cache: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one catalog table as a DataFrame with engine-canonical types.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it
    as long (nanosAsLong) and we convert to TimestampType at µs
    precision — the same truncation DuckDB applies, so oracles agree.
    """
    key = (id(spark._jsparkSession), os.path.abspath(sf_dir), name)
    cached = _table_cache.get(key)
    if cached is not None:
        return cached
    configure_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer div: float division rounds half-µs up, DuckDB truncates
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Parquet timestamps written without the isAdjustedToUTC annotation
    # read as TIMESTAMP_NTZ, which watermarks / unix_micros / tz
    # functions reject. Session tz is pinned UTC (session.py), so the
    # NTZ -> TIMESTAMP cast is value-exact (DuckDB oracles see the same
    # naive values) and restores the engine-canonical TimestampType.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    _table_cache[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
