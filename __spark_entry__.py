"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in graphdbetl_spark/ (SURVEY.md §2B inventory);
this module just re-exports the query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from graphdbetl_spark.plans.registry import all_oracles, all_queries
from graphdbetl_spark.session import configure_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's core capability end-to-end on sf0.001 —
    two-source node build (customer ∪ supplier → Party) with schema
    harmonization, id-key dedup, uri derivation (SURVEY.md §7 M0)."""
    configure_session(spark)
    from graphdbetl_spark.plans.graph_etl_q import node_build_party

    return node_build_party(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2B."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query; approximate /
    hash-function-specific operators are omitted (rows-only check)."""
    return all_oracles()
