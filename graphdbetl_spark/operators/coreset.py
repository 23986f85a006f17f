"""Coreset / diversity selection for training-data curation.

Greedy k-center (farthest-point traversal, Gonzalez 1985) over an
embedding column: pick the point whose distance to the already-selected
set is LARGEST, k times. The dual of importance resampling
(select_importance_resampling matches a target DISTRIBUTION; k-center
maximizes COVERAGE) — the classic coreset recipe for picking a small,
diverse fine-tuning or eval slice out of a large corpus.

Scale shape: each of the k rounds is ONE map-only corpus pass (a
vectorized Arrow kernel scoring every row against the ≤k selected
centers — the PQ codebook-closure pattern: the center matrix lives in
the kernel closure, bounded by construction) feeding a
TakeOrderedAndProject(1) — no shuffle ever carries more than one row
per partition, and the driver receives exactly one (id, vector, score)
row per round.  k sequential jobs total, the same synchronous-trajectory
cost model as train_quality_classifier's gradient rounds.

Determinism / oracle parity (the sim_cosine_topk conventions):
- distance is cosine distance 1 − dot/(‖a‖·‖b‖), the dot and both
  squared norms accumulated dimension-major over raw doubles (TRUE left
  folds, `_np_seq_sum`) and divided by the PRODUCT of the two norms —
  bit-identical to DuckDB's ``list_cosine_similarity``;
- max-over-centers is exact (IEEE max has no rounding);
- the next center is argmin of max-cosine with ties to the LOWER id,
  via a (score ASC, id ASC) total order both engines replay;
- the seed is the minimum id, so the whole trajectory is a pure
  function of the data and unrolls into a DuckDB CTE chain.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from graphdbetl_spark.operators.similarity import _np_seq_sum
from graphdbetl_spark.operators.skew import ensure_scan_parallelism


def kcenter_select(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Greedy k-center selection; returns one row per round:
    (step, center_id, radius) where radius is the selected point's
    cosine distance to the previously-selected set (NULL for the
    seed), rounded to 4 decimals JVM-side (ties-away on both engines;
    np.round would be half-even — SCALING.md r6 invariant)."""
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    src = (
        ensure_scan_parallelism(emb, id_col)
        .select(id_col, F.transform(vec_col, lambda x: x.cast("double")).alias("__v"))
        .persist()
    )
    try:
        seed = src.orderBy(F.col(id_col).asc()).limit(1).collect()[0]
        centers = [(int(seed[id_col]), np.array(seed["__v"], dtype=np.float64))]
        trajectory: list[tuple[int, int, float | None]] = [(1, centers[0][0], None)]

        for rnd in range(2, k + 1):
            cm = np.array([v for _, v in centers], dtype=np.float64)
            cn = np.sqrt(_np_seq_sum(cm * cm, axis=1))
            picked = frozenset(cid for cid, _ in centers)

            def kern(batches, cm=cm, cn=cn, picked=picked):
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    keep = ~pdf[id_col].isin(picked)
                    pdf = pdf[keep]
                    if len(pdf) == 0:
                        continue
                    v = np.array(pdf["__v"].tolist(), dtype=np.float64)
                    vn = np.sqrt(_np_seq_sum(v * v, axis=1))
                    dots = np.zeros((len(pdf), cm.shape[0]))
                    for i in range(cm.shape[1]):  # dim-major: left-fold per pair
                        dots = dots + v[:, i : i + 1] * cm[None, :, i]
                    mc = (dots / (vn[:, None] * cn[None, :])).max(axis=1)
                    # partial cut: only each batch's best candidate
                    # (by the global (mc ASC, id ASC) order) survives
                    # to the TakeOrdered exchange.
                    ids = pdf[id_col].values
                    best = np.lexsort((ids, mc))[0]
                    yield pd.DataFrame(
                        {
                            id_col: [ids[best]],
                            "__v": [list(v[best])],
                            "__mc": [mc[best]],
                        }
                    )

            rows = (
                src.mapInPandas(
                    kern, schema=f"{id_col} bigint, __v array<double>, __mc double"
                )
                .orderBy(F.col("__mc").asc(), F.col(id_col).asc())
                .limit(1)
                .collect()
            )
            if not rows:  # k exceeds the corpus — trajectory ends early
                break
            top = rows[0]
            centers.append((int(top[id_col]), np.array(top["__v"], dtype=np.float64)))
            trajectory.append((rnd, int(top[id_col]), float(top["__mc"])))
    finally:
        src.unpersist()

    out = spark.createDataFrame(
        [(r, cid, mc) for r, cid, mc in trajectory],
        schema="step int, center_id bigint, __mc double",
    )
    return out.select(
        "step",
        "center_id",
        F.round(F.lit(1.0) - F.col("__mc"), 4).alias("radius"),
    )
