"""Graph-ETL queries: the reference's identity surface as oracle-checked
operators — multi-source node build with schema harmonization + id-key
dedup + uri derivation, and both relationship recipes (D2 foreign_key,
D3 join_table).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from graphdbetl_spark.etl.builder import GraphDBBuilder
from graphdbetl_spark.operators.dedup import dedup_merge_first_wins
from graphdbetl_spark.plans.registry import query
from graphdbetl_spark.sources.catalog import load_table as T


def fixture_config(sf_dir: str) -> dict:
    """The FIXTURES.md §2 config over the driver's testdata."""
    return {
        "Database": {"name": "TestGraph", "version": "0.1", "author": "spark-graft"},
        "Sources": {
            "TPCH": {"source type": "parquet", "path": sf_dir},
            "TPCH2": {"source type": "parquet", "path": sf_dir},
        },
        "Nodes": {
            "Party": {
                "id_key_label": "party_id",
                "sources": {
                    "TPCH": {"table": "customer", "id_key": "c_custkey", "uri_key": "c_name"},
                    "TPCH2": {"table": "supplier", "id_key": "s_suppkey", "uri_key": "s_name"},
                },
            },
            "Nation": {
                "sources": {
                    "TPCH": {"table": "nation", "id_key": "n_nationkey", "uri_key": "n_name"}
                }
            },
            "Order": {
                "sources": {
                    "TPCH": {"table": "orders", "id_key": "o_orderkey", "uri_key": "o_orderkey"}
                }
            },
        },
        "Relationships": {
            "CUSTOMER_FROM_NATION": {
                "sources": {
                    "TPCH": {
                        "type": "foreign_key",
                        "start": {"node": "Party", "table": "customer", "key": "c_nationkey", "id_key": "c_custkey"},
                        "end": {"node": "Nation", "table": "nation", "key": "n_nationkey", "id_key": "n_nationkey"},
                    }
                }
            },
            "ORDER_CONTAINS_PART": {
                "sources": {
                    "TPCH": {
                        "type": "join_table",
                        "table": "lineitem",
                        "from_field": "l_orderkey",
                        "to_field": "l_partkey",
                        "from_table": "orders",
                        "to_table": "part",
                    }
                }
            },
        },
    }


@query(
    "node_build_party",
    oracle="""
    SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS _id,
           concat_ws('/', 'TestGraph', 'Party', c_name) AS _uri,
           'TPCH' AS _source,
           c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           CAST(NULL AS BIGINT) AS s_suppkey, CAST(NULL AS VARCHAR) AS s_name,
           CAST(NULL AS INTEGER) AS s_nationkey, CAST(NULL AS DOUBLE) AS s_acctbal
    FROM customer
    UNION ALL
    SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR) AS _id,
           concat_ws('/', 'TestGraph', 'Party', s_name) AS _uri,
           'TPCH2' AS _source,
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
           CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR),
           s_suppkey, s_name, s_nationkey, s_acctbal
    FROM supplier
    """,
)
def node_build_party(spark: SparkSession, sf: str) -> DataFrame:
    """Two-source node build: customer ∪ supplier → Party (merged schema
    with typed NULL fill, namespaced _id, derived _uri, provenance).
    Exercises the reference's entire implemented node path R2-R10 plus
    declared D1/D9 (SURVEY.md §7 M0)."""
    builder = GraphDBBuilder(spark, fixture_config(sf))
    return builder.build_node("Party")


@query(
    "rel_foreign_key",
    oracle="""
    SELECT 'customer:' || CAST(c.c_custkey AS VARCHAR) AS _start_id,
           'nation:' || CAST(n.n_nationkey AS VARCHAR) AS _end_id,
           'TPCH' AS _source
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
)
def rel_foreign_key(spark: SparkSession, sf: str) -> DataFrame:
    """D2: foreign_key relationship build (config.yml:36-47 recipe) —
    one edge per customer, endpoints namespaced like node ids."""
    builder = GraphDBBuilder(spark, fixture_config(sf))
    return builder.build_relationship("CUSTOMER_FROM_NATION")


@query(
    "rel_join_table",
    oracle="""
    SELECT 'orders:' || CAST(l_orderkey AS VARCHAR) AS _start_id,
           'part:' || CAST(l_partkey AS VARCHAR) AS _end_id,
           'TPCH' AS _source
    FROM lineitem
    """,
)
def rel_join_table(spark: SparkSession, sf: str) -> DataFrame:
    """D3: join_table (bridge) relationship build (config.yml:48-54) —
    one edge per bridge row."""
    builder = GraphDBBuilder(spark, fixture_config(sf))
    return builder.build_relationship("ORDER_CONTAINS_PART")


@query(
    "dedup_merge_by_id",
    oracle="""
    WITH a AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal,
               CAST(NULL AS VARCHAR) AS c_mktsegment, 1 AS src
        FROM customer WHERE c_custkey < 1000
    ), b AS (
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment, 2 AS src
        FROM customer WHERE c_custkey >= 500
    ), u AS (
        SELECT * FROM a UNION ALL SELECT * FROM b
    )
    SELECT c_custkey,
           min(CASE WHEN c_name IS NOT NULL THEN src END) IS NOT NULL AS _has_name,
           arg_min(c_name, CASE WHEN c_name IS NOT NULL THEN src END) AS c_name,
           arg_min(c_acctbal, CASE WHEN c_acctbal IS NOT NULL THEN src END) AS c_acctbal,
           arg_min(c_mktsegment, CASE WHEN c_mktsegment IS NOT NULL THEN src END) AS c_mktsegment
    FROM u GROUP BY c_custkey
    """,
)
def dedup_merge_by_id(spark: SparkSession, sf: str) -> DataFrame:
    """D1 merge semantics on overlapping sources: two customer slices
    (one with nulled-out columns) merge per id, first non-null by
    source order wins — 'merge the node data into an existing record'
    (graph_db_builder.py:463-467, 493-497)."""
    c = T(spark, sf, "customer")
    a = c.filter(F.col("c_custkey") < 1000).select(
        "c_custkey",
        "c_name",
        F.when(F.col("c_custkey") % 2 == 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(1).alias("src"),
    )
    b = c.filter(F.col("c_custkey") >= 500).select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment", F.lit(2).alias("src")
    )
    merged = dedup_merge_first_wins(a.unionByName(b), "c_custkey", order_by=["src"])
    return merged.select(
        "c_custkey",
        F.col("c_name").isNotNull().alias("_has_name"),
        "c_name",
        "c_acctbal",
        "c_mktsegment",
    )
