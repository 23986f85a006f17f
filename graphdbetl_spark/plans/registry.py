"""Query registry: every engine operator registers a named
(spark, sf_dir) -> DataFrame callable plus, when SQL-expressible, the
equivalent DuckDB oracle SQL (SURVEY.md §5.1 — this is the correctness
gate's contract with ``__spark_entry__.py``).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import. Registration order is the
# order the correctness driver visits queries, and the driver's budget
# may not cover all of them — so the families whose verdicts matter
# most (LLM-pipeline dedup/similarity, streaming windows, SQL frontend,
# the reference's graph-ETL identity) register first; the relational /
# expression core, fully attested in round 1, registers last.
_FAMILY_MODULES = (
    "graphdbetl_spark.plans.llm_q",
    "graphdbetl_spark.plans.streaming_q",
    "graphdbetl_spark.plans.extra_q",
    "graphdbetl_spark.plans.graph_etl_q",
    "graphdbetl_spark.plans.curation_q",
    "graphdbetl_spark.plans.prep_q",
    "graphdbetl_spark.plans.pipeline_q",
    "graphdbetl_spark.plans.etl_ops_q",
    "graphdbetl_spark.plans.analytics_q",
    "graphdbetl_spark.plans.relational",
    "graphdbetl_spark.plans.expressions",
)


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does a rows-only check


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator query. ``oracle`` is ANSI SQL DuckDB runs on
    the same parquet tables; alias computed columns identically on both
    sides (the driver's compare is column-name sensitive)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle)
        return fn

    return deco


def _load() -> None:
    for mod in _FAMILY_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, QueryFn]:
    _load()
    return {name: qd.fn for name, qd in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {name: qd.oracle for name, qd in REGISTRY.items() if qd.oracle is not None}
