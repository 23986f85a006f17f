"""Multi-source schema harmonization (reference R5/R6/R7).

The reference merges per-source field lists into one unified node
schema with an assert on dtype conflicts and first-seen-dtype-wins
(``graph_db_builder.py:410-426``), then builds a positional
``field_idx_map`` so each source's rows can be remapped into the
merged layout with default fill for missing fields (``:253-290,
474-479``). Its merged column order is nondeterministic (``set()`` at
``:417``) — a defect we fix: first-seen order, deterministic.

Spark-side, the remap is a pure projection (``select`` with
``lit(None).cast(t)`` fill), so harmonization is plan *construction*;
Catalyst still prunes columns into the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType


class SchemaConflictError(ValueError):
    """Same-named field declared with conflicting types across sources
    (the reference rejects this with an assert, graph_db_builder.py:422)."""


def merge_schemas(schemas: list[StructType]) -> StructType:
    """Union of (name, type) across source schemas, first-seen order.

    Conflicting dtypes for a same-named field raise
    :class:`SchemaConflictError`. Nullability is widened (any nullable →
    nullable) — the reference discarded nullability entirely
    (``graph_db_builder.py:436-437``); we keep it.
    """
    merged: dict[str, StructField] = {}
    for schema in schemas:
        for field in schema.fields:
            prev = merged.get(field.name)
            if prev is None:
                merged[field.name] = field
            elif prev.dataType != field.dataType:
                raise SchemaConflictError(
                    f"field {field.name!r}: {prev.dataType.simpleString()} vs "
                    f"{field.dataType.simpleString()}"
                )
            elif field.nullable and not prev.nullable:
                merged[field.name] = StructField(field.name, field.dataType, True)
    return StructType(list(merged.values()))


def conform_to_schema(df: DataFrame, target: StructType) -> DataFrame:
    """Project ``df`` into the merged layout: keep matching columns,
    fill missing ones with typed NULLs (reference field_idx_map=None →
    column default, graph_db_builder.py:474-479)."""
    cols = []
    have = {f.name: f for f in df.schema.fields}
    for field in target.fields:
        if field.name in have:
            col = F.col(field.name)
            if have[field.name].dataType != field.dataType:
                col = col.cast(field.dataType)
            cols.append(col.alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)
