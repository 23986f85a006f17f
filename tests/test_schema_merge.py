"""Unit tests for the harmonization kernel (SURVEY.md §5.3): merge
semantics, conflict rejection, missing-field fill, type-map coverage —
the reference's merge_fields/field_idx_map contract
(graph_db_builder.py:410-426, 253-290)."""

import pytest
from pyspark.sql import types as T

from graphdbetl_spark.etl.schema import SchemaConflictError, conform_to_schema, merge_schemas
from graphdbetl_spark.etl.types import MYSQL_TYPE_MAP, mysql_to_spark_type


def _schema(*fields):
    return T.StructType([T.StructField(n, t) for n, t in fields])


class TestMergeSchemas:
    def test_union_first_seen_order(self):
        a = _schema(("id", T.LongType()), ("name", T.StringType()))
        b = _schema(("name", T.StringType()), ("age", T.IntegerType()))
        merged = merge_schemas([a, b])
        assert [f.name for f in merged.fields] == ["id", "name", "age"]

    def test_conflict_rejected(self):
        a = _schema(("x", T.LongType()))
        b = _schema(("x", T.StringType()))
        with pytest.raises(SchemaConflictError):
            merge_schemas([a, b])

    def test_nullability_widened(self):
        a = T.StructType([T.StructField("x", T.LongType(), nullable=False)])
        b = T.StructType([T.StructField("x", T.LongType(), nullable=True)])
        merged = merge_schemas([a, b])
        assert merged.fields[0].nullable

    def test_permutation_invariant_names(self):
        a = _schema(("id", T.LongType()), ("v", T.DoubleType()))
        b = _schema(("w", T.StringType()))
        m1 = {f.name for f in merge_schemas([a, b]).fields}
        m2 = {f.name for f in merge_schemas([b, a]).fields}
        assert m1 == m2


class TestConform:
    def test_missing_fields_filled_with_typed_nulls(self, spark):
        df = spark.createDataFrame([(1, "a")], ["id", "name"])
        target = _schema(("id", T.LongType()), ("name", T.StringType()), ("age", T.IntegerType()))
        out = conform_to_schema(df, target)
        assert out.schema["age"].dataType == T.IntegerType()
        row = out.collect()[0]
        assert row.age is None and row.id == 1

    def test_cast_applied(self, spark):
        df = spark.createDataFrame([(1,)], ["id"])
        target = _schema(("id", T.StringType()))
        assert conform_to_schema(df, target).collect()[0].id == "1"


class TestTypeMap:
    def test_covers_documented_mysql_universe(self):
        # the 20+ documented connector types (reference dtypes.py:48-72)
        for name in [
            "DECIMAL", "TINY", "SHORT", "LONG", "FLOAT", "DOUBLE", "TIMESTAMP",
            "LONGLONG", "INT24", "DATETIME", "YEAR", "VARCHAR", "BIT",
            "NEWDECIMAL", "ENUM", "BLOB", "VAR_STRING", "STRING",
        ]:
            assert mysql_to_spark_type(name) is not None

    def test_not_lossy(self):
        # the reference's three implemented mappings were lossy
        # (dtypes.py:88-92); ours must not be
        assert MYSQL_TYPE_MAP["LONG"] == T.IntegerType()  # not int16
        assert MYSQL_TYPE_MAP["FLOAT"] == T.FloatType()  # not float16
        assert MYSQL_TYPE_MAP["VAR_STRING"] == T.StringType()  # not char(32)

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            mysql_to_spark_type("NOPE")


def test_parquet_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema drift across dataset generations (the 100 TB reality:
    columns appear over time). mergeSchema unifies the footers on read;
    old files surface typed NULLs for new columns — the read-side
    analogue of merge_schemas/conform_to_schema."""
    old = spark.createDataFrame([(1, "a")], "id long, name string")
    new = spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double")
    old.write.parquet(str(tmp_path / "g=1"))
    new.write.parquet(str(tmp_path / "g=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "g=1"), str(tmp_path / "g=2")
    )
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None  # old generation: typed NULL fill
    assert rows[2]["score"] == 9.5
    assert dict(merged.dtypes)["score"] == "double"
