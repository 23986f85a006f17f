from graphdbetl_spark.sources.catalog import TABLES, load_table, load_all
from graphdbetl_spark.sources.readers import read_source

__all__ = ["TABLES", "load_table", "load_all", "read_source"]
