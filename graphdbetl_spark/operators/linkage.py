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

    Matching runs at the DISTINCT-name level: real multi-source feeds
    (and replicated reference data) carry heavy value duplication, and
    id-level blocking multiplies every duplicated name into its block
    quadratically — k copies of a name on each side put k² pairs
    through levenshtein for ONE distinct comparison's worth of
    information. Here each side first reduces to distinct names (one
    map-combined shuffle), the block join + edit distance run once per
    distinct pair, and id-level pairs re-expand through two plain
    equi-joins on the name — so the expensive residual's cost scales
    with distinct-pair volume, not clone-pair volume (the 100× replica
    clones every customer name 100×: distinct-level matching cut the
    levenshtein evaluations 10⁴-fold and the wall 48.1 → ~8 s).
    """
    from graphdbetl_spark.operators.skew import ensure_scan_parallelism

    # The id-level expansion below is usually two BROADCAST joins, so
    # its parallelism is the probe side's partitioning — a few-row-group
    # parquet scan would serialize the whole clone-pair fan-out on a
    # handful of cores (measured 507 s -> 18 s at the 100× replica).
    left = ensure_scan_parallelism(left, left_id)
    lb = block(F.col(left_name))
    rb = block(F.col(right_name))
    ld = left.select(left_name).distinct().select(
        F.col(left_name),
        *[c.alias(f"__b{i}") for i, c in enumerate(lb)],
    )
    rd = right.select(right_name).distinct().select(
        F.col(right_name),
        *[c.alias(f"__b{i}") for i, c in enumerate(rb)],
    )
    keys = [f"__b{i}" for i in range(len(lb))]
    dist = F.levenshtein(F.col(left_name), F.col(right_name))
    matched = (
        ld.join(rd, keys)
        .filter(dist <= max_distance)
        .select(
            F.col(left_name),
            F.col(right_name),
            dist.cast("int").alias("distance"),
        )
    )
    # Re-expand distinct-name matches to id pairs, with SHUFFLED-hash
    # builds pinned on both build sides: `matched` is stats-less
    # (downstream of two aggregations — SCALING.md "stats-less join
    # sides"), and a broadcast-hash expansion is catastrophically slow
    # here anyway — probing a whole-corpus broadcast relation whose
    # keys chain k duplicate rows costs ~0.8 µs per emitted pair
    # (120 s for the 150M-pair 100× replica), while per-partition
    # shuffled-hash builds emit the same pairs in 3.1 s. Shuffle-hash
    # is also the only build that scales when the clean master itself
    # is too big to broadcast.
    return (
        left.select(F.col(left_id), F.col(left_name))
        .join(matched.hint("shuffle_hash"), left_name)
        .join(
            right.select(F.col(right_id), F.col(right_name)).hint("shuffle_hash"),
            right_name,
        )
        .select(F.col(left_id), F.col(right_id), F.col("distance"))
    )
