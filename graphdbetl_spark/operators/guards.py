"""Scale guards for intentionally-quadratic oracle baselines.

A few registry entries exist only as exact recall oracles for their
blocked/banded production siblings (e.g. ``dedup_embedding_cosine_exact``
vs the hyperplane-blocked ``dedup_embedding_cosine``). Their all-pairs
shape is the point — but it must be physically unreachable at corpus
scale, otherwise a 100 TB caller can trigger an O(N²/labels) join by
accident (r4 verdict, "What's wrong" #3). The guard counts the input
(one cheap job over a single projected column) and raises before the
quadratic join is ever constructed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# 20k rows ≈ 20M within-block pairs at the fixture's 10-label blocking:
# seconds of work. The sf0.1 full-registry pass (2k embedding rows) and
# the sf0.01 driver gate (500) stay well under it; the 30×/100× scaled
# campaigns land far over it and fail fast instead of running all-pairs.
QUADRATIC_INPUT_CAP = 20_000


class QuadraticInputError(ValueError):
    """Input too large for an all-pairs oracle baseline."""


def require_bounded_input(
    df: DataFrame, op_name: str, blocked_alternative: str, cap: int = QUADRATIC_INPUT_CAP
) -> DataFrame:
    """Raise ``QuadraticInputError`` if ``df`` exceeds ``cap`` rows.

    Counts only the first column (column-pruned scan). Returns ``df``
    unchanged so the guard composes inline in a plan builder.
    """
    n = df.select(df.columns[0]).count()
    if n > cap:
        raise QuadraticInputError(
            f"{op_name} is an intentionally-quadratic exact baseline gated to "
            f"<={cap} input rows (got {n}); at corpus scale use "
            f"{blocked_alternative} instead"
        )
    return df
