"""Record linkage / entity resolution: blocked fuzzy matching.

The reference merges entities from multiple sources purely by exact id
(``graph_db_builder.py:463-467``); real multi-source graph ETL also
needs approximate matching for dirty feeds (typos, OCR noise, format
drift). The standard shape is two-stage: a cheap BLOCKING key whose
equi-join bounds the candidate space (never all-pairs), then an exact
edit-distance residual on the candidates only — the same
candidate-generation discipline as the MinHash-LSH dedup family
(operators/dedup.py), applied to record linkage.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def default_block(name: Column) -> list[Column]:
    """Default blocking key: (length, last-4 suffix). Works when noise
    hits the middle of the string; swap for phonetic (``F.soundex``) or
    prefix keys per domain — any list of deterministic columns."""
    return [F.length(name), F.substring(name, -4, 4)]


def fuzzy_match_pairs(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    left_name: str,
    right_name: str,
    max_distance: int = 1,
    block: Callable[[Column], list[Column]] = default_block,
) -> DataFrame:
    """Blocked fuzzy join: candidate pairs share every blocking key
    (equi-join — at 100 TB this is one hash-partitioned join, and a
    block is never larger than its key's frequency), then Levenshtein
    distance filters candidates to ``max_distance``. Recall < 1 by
    construction: a pair whose edit lands inside the blocking key is
    never considered — that trade *is* blocking; choose keys the
    expected noise doesn't touch.

    Returns (left_id, right_id, distance).
    """
    from graphdbetl_spark.operators.skew import ensure_scan_parallelism

    # The probe side pays the per-candidate levenshtein; a few-row-group
    # parquet scan would serialize it on a handful of cores (measured
    # 160 -> 41 s at the 100x replica for 1.5M names).
    left = ensure_scan_parallelism(left, left_id)
    lb = block(F.col(left_name))
    rb = block(F.col(right_name))
    l = left.select(
        F.col(left_id),
        F.col(left_name),
        *[c.alias(f"__b{i}") for i, c in enumerate(lb)],
    )
    r = right.select(
        F.col(right_id),
        F.col(right_name),
        *[c.alias(f"__b{i}") for i, c in enumerate(rb)],
    )
    keys = [f"__b{i}" for i in range(len(lb))]
    dist = F.levenshtein(F.col(left_name), F.col(right_name))
    return (
        l.join(r, keys)
        .filter(dist <= max_distance)
        .select(F.col(left_id), F.col(right_id), dist.cast("int").alias("distance"))
    )
