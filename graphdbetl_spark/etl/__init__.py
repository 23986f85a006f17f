from graphdbetl_spark.etl.schema import merge_schemas, conform_to_schema, SchemaConflictError
from graphdbetl_spark.etl.builder import GraphDBBuilder
from graphdbetl_spark.etl.types import mysql_to_spark_type, MYSQL_TYPE_MAP

__all__ = [
    "merge_schemas",
    "conform_to_schema",
    "SchemaConflictError",
    "GraphDBBuilder",
    "mysql_to_spark_type",
    "MYSQL_TYPE_MAP",
]
