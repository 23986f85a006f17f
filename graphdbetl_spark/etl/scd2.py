"""SCD Type-2 (history-preserving) dimension maintenance, emulated with
joins + unions (no lakehouse MERGE INTO required).

State table: one row per (key, version) with ``valid_from`` and
``valid_to`` (NULL = current). Applying a delta snapshot at time T:

- changed keys: close the open row (valid_to = T) and append a new
  open row with the delta's attributes;
- new keys: append an open row;
- unchanged keys and already-closed history: carried through untouched.

One full-outer join on the key per apply — the same cost profile as a
MERGE INTO, expressed in pure DataFrame algebra.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def scd2_apply(
    current: DataFrame,
    delta: DataFrame,
    key: str,
    attrs: list[str],
    effective: Column,
) -> DataFrame:
    """Apply a delta snapshot to an SCD2 table; returns the new table.

    ``current`` columns: key, *attrs, valid_from, valid_to.
    ``delta`` columns: key, *attrs. ``effective`` is the snapshot time.
    """
    closed_history = current.filter(F.col("valid_to").isNotNull())
    open_rows = current.filter(F.col("valid_to").isNull())

    o, d = open_rows.alias("o"), delta.alias("d")
    joined = o.join(d, F.col(f"o.{key}") == F.col(f"d.{key}"), "full")

    changed = F.col(f"d.{key}").isNotNull() & F.col(f"o.{key}").isNotNull() & ~(
        F.struct(*[F.col(f"o.{a}") for a in attrs]).eqNullSafe(
            F.struct(*[F.col(f"d.{a}") for a in attrs])
        )
    )

    # open rows: keep as-is (unchanged / no delta), or close (changed)
    kept_open = joined.filter(F.col(f"o.{key}").isNotNull()).select(
        F.col(f"o.{key}").alias(key),
        *[F.col(f"o.{a}").alias(a) for a in attrs],
        F.col("o.valid_from").alias("valid_from"),
        F.when(changed, effective).otherwise(F.col("o.valid_to")).alias("valid_to"),
    )
    # new versions: changed keys + brand-new keys
    new_versions = joined.filter(
        changed | (F.col(f"o.{key}").isNull() & F.col(f"d.{key}").isNotNull())
    ).select(
        F.col(f"d.{key}").alias(key),
        *[F.col(f"d.{a}").alias(a) for a in attrs],
        effective.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    return closed_history.unionByName(kept_open).unionByName(new_versions)


def scd2_init(snapshot: DataFrame, key: str, attrs: list[str], effective: Column) -> DataFrame:
    """Bootstrap an SCD2 table from a first snapshot (all rows open)."""
    return snapshot.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        effective.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
