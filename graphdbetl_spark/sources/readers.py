"""Pluggable source readers (reference R1/R12/D5 → SURVEY.md §2A).

The reference hardcodes MySQL (``sql_io.py:4-13``) and raises
NotImplementedError for everything else (``graph_db_builder.py:193-194,
320-321``). Here every source kind is a declarative ``spark.read``:
the format string routes, options pass through, and Catalyst handles
pushdown per connector.

Source spec (what the YAML config's ``Sources:`` section compiles to)::

    {"source type": "parquet"|"csv"|"json"|"orc"|"jdbc",
     "path": dir-or-file,            # file formats
     "url": ..., "dbtable"/"table": ..., "user": ..., ...}  # jdbc
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_source(
    spark: SparkSession,
    source: dict[str, Any],
    table: str,
    schema: StructType | None = None,
) -> DataFrame:
    """Read ``table`` from a declared source.

    File-format sources resolve ``{path}/{table}.{ext}`` (or ``path``
    itself if it is a file). JDBC sources push ``table`` down as
    ``dbtable`` — Spark's JDBC connector does predicate pushdown and
    (with partitionColumn options) parallel range reads, replacing the
    reference's single unbuffered cursor (``graph_db_builder.py:482-486``).
    """
    kind = (source.get("source type") or source.get("type") or "parquet").lower()
    if kind == "mysql":
        # The reference's source kind (config.yml:10-13: 'source type:
        # mysql', 'database name', 'config file'). Spark-side it is JDBC
        # with a MySQL URL; an unreachable server surfaces at load() and
        # GraphDBBuilder.build(skip_bad_sources=True) soft-skips it, the
        # reference's behavior (graph_db_builder.py:317-319).
        host = source.get("host", "localhost")
        port = source.get("port", 3306)
        db = source.get("database name", source.get("database", ""))
        url = source.get("url", f"jdbc:mysql://{host}:{port}/{db}")
        opts = {k: v for k, v in source.items()
                if k in ("user", "password", "driver", "fetchsize",
                         "partitionColumn", "lowerBound", "upperBound", "numPartitions")}
        source = {"source type": "jdbc", "url": url, **opts}
        kind = "jdbc"
    if kind == "jdbc":
        reader = spark.read.format("jdbc")
        for k, v in source.items():
            if k in ("source type", "type"):
                continue
            reader = reader.option(k, v)
        reader = reader.option("dbtable", source.get("dbtable", table))
        return reader.load()

    path = source["path"]
    if os.path.isdir(path):
        ext = "csv" if kind == "csv" else kind
        candidate = os.path.join(path, f"{table}.{ext}")
        path = candidate if os.path.exists(candidate) else os.path.join(path, table)

    if kind == "parquet":
        return spark.read.parquet(path)
    if kind == "orc":
        return spark.read.orc(path)
    if kind == "csv":
        reader = spark.read.option("header", "true")
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(path)
    if kind == "json":
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return reader.json(path)
    raise ValueError(f"unsupported source type: {kind!r}")
