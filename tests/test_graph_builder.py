"""Golden end-to-end graph build (SURVEY.md §5.2): the FIXTURES.md §2
config over sf0.001 testdata; asserts the declared properties of the
built node/relationship tables."""

import os

import pyspark.sql.functions as F
import pytest

from graphdbetl_spark.etl.builder import GraphDBBuilder
from graphdbetl_spark.plans.graph_etl_q import fixture_config
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def builder(spark):
    return GraphDBBuilder(spark, fixture_config(SF_DIR)).build()


def test_party_union_schema_and_rowcount(builder):
    party = builder.nodes["Party"].dataframe
    cols = set(party.columns)
    # union schema of customer ∪ supplier + canonical columns
    assert {"c_custkey", "c_name", "s_suppkey", "s_name", "_id", "_uri", "_source"} <= cols
    assert party.count() == 160  # 150 customers + 10 suppliers, no id collisions


def test_party_null_fill_for_missing_source_fields(builder):
    party = builder.nodes["Party"].dataframe
    suppliers = party.filter(F.col("_source") == "TPCH2")
    assert suppliers.filter(F.col("c_mktsegment").isNotNull()).count() == 0
    assert suppliers.filter(F.col("s_name").isNull()).count() == 0


def test_ids_namespaced_and_unique(builder):
    party = builder.nodes["Party"].dataframe
    assert party.select("_id").distinct().count() == party.count()
    assert party.filter(~F.col("_id").rlike("^(customer|supplier):")).count() == 0


def test_uri_derived(builder):
    party = builder.nodes["Party"].dataframe
    sample = party.filter(F.col("_source") == "TPCH").select("_uri").first()[0]
    assert sample.startswith("TestGraph/Party/")


def test_fk_relationship_one_edge_per_customer(builder):
    rel = builder.relationships["CUSTOMER_FROM_NATION"].dataframe
    assert rel.count() == 150
    assert set(rel.columns) == {"_start_id", "_end_id", "_source"}


def test_bridge_relationship_one_edge_per_lineitem(builder, spark):
    rel = builder.relationships["ORDER_CONTAINS_PART"].dataframe
    lineitem_rows = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    assert rel.count() == lineitem_rows


def test_write_layout(builder, tmp_path):
    out = str(tmp_path / "graphdb")
    builder.write(out)
    assert os.path.isdir(os.path.join(out, "nodes", "Party"))
    assert os.path.isdir(os.path.join(out, "relationships", "CUSTOMER_FROM_NATION"))
    back = builder.spark.read.parquet(os.path.join(out, "nodes", "Party"))
    assert back.count() == 160


def test_csv_serialization(builder, tmp_path):
    out = str(tmp_path / "graphdb_csv")
    builder.serialize_data(out, to="csv")
    nation_dir = os.path.join(out, "nodes", "Nation")
    assert any(f.endswith(".csv") for f in os.listdir(nation_dir))


def test_unknown_source_raises(spark):
    cfg = fixture_config(SF_DIR)
    cfg["Nodes"]["Party"]["sources"]["MISSING"] = {"table": "x", "id_key": "y"}
    with pytest.raises(KeyError):
        GraphDBBuilder(spark, cfg).build_node("Party")


def test_mixed_format_sources_harmonize(spark, tmp_path):
    """One node type fed by a parquet source AND a csv source (D5): the
    schema-merge/conform/union path is format-agnostic, matching the
    reference's declared multi-DBMS intent (graph_db_builder.py:13-14)."""
    import pyspark.sql.functions as F

    from graphdbetl_spark.etl.builder import GraphDBBuilder
    from graphdbetl_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR

    csv_dir = str(tmp_path / "csv_src")
    load_table(spark, SF_DIR, "supplier").write.option("header", "true").csv(
        csv_dir + "/supplier"
    )
    cfg = {
        "Database": {"name": "Mixed", "version": "0", "author": "t"},
        "Sources": {
            "PQ": {"source type": "parquet", "path": SF_DIR},
            "CS": {"source type": "csv", "path": csv_dir},
        },
        "Nodes": {
            "Party": {
                "sources": {
                    "PQ": {"table": "customer", "id_key": "c_custkey", "uri_key": "c_name"},
                    "CS": {"table": "supplier", "id_key": "s_suppkey", "uri_key": "s_name"},
                }
            }
        },
        "Relationships": {},
    }
    df = GraphDBBuilder(spark, cfg).build_node("Party")
    pq_rows = load_table(spark, SF_DIR, "customer").count()
    cs_rows = load_table(spark, SF_DIR, "supplier").count()
    assert df.count() == pq_rows + cs_rows
    # both sources' uri keys survive harmonization
    assert df.filter(F.col("c_name").isNotNull()).count() == pq_rows
    assert df.filter(F.col("s_name").isNotNull()).count() == cs_rows
