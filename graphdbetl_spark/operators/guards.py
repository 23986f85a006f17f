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

    Known costs, accepted deliberately (r5 ADVICE): (1) the count is an
    EAGER job that runs whenever the guarded plan builder is invoked —
    including explain-only/enumeration paths that never execute the
    query; that extra scan is the price of failing before the quadratic
    join exists at all. (2) The cap bounds TOTAL input rows, a proxy for
    the true per-block quadratic cost — a single-label skewed input
    under the cap can still cost more than a uniform one over it. The
    gated entries are demo oracles whose fixtures are label-uniform by
    construction; a production caller worried about skew should cap
    ``max(count) per block`` instead (one groupBy job) before electing
    an all-pairs baseline.
    """
    n = df.select(df.columns[0]).count()
    if n > cap:
        raise QuadraticInputError(
            f"{op_name} is an intentionally-quadratic exact baseline gated to "
            f"<={cap} input rows (got {n}); at corpus scale use "
            f"{blocked_alternative} instead"
        )
    return df
