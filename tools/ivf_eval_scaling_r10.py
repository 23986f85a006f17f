"""r9 verdict #5 rung evidence: per-train work vs eval size for
semantic decontamination — exact vs IVF n_cells='auto'.

Fixed corpus (hash buckets >= 52 of the replica embeddings), eval set
grown 4x per rung (buckets < 3 / < 12 / < 48). Exact per-train work is
|eval| dots; auto-IVF is ~2*sqrt(n_probe*|eval|) (coarse assignment +
probed-cell candidates), so its wall should stay near-flat where the
exact form grows ~linearly with |eval|.

Usage: SPARK_GRAFT_CPUS=32 python tools/ivf_eval_scaling_r10.py [SF_DIR]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from graphdbetl_spark.operators.curation import (
    semantic_decontaminate,
    semantic_decontaminate_ivf,
)
from graphdbetl_spark.operators.sampling import hash_bucket
from graphdbetl_spark.session import get_spark
from graphdbetl_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10"
    spark = get_spark("ivf-eval-scaling")
    e = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    b = hash_bucket(F.col("vec_id"))
    corpus = e.filter(b >= 52).cache()
    n_corpus = corpus.count()
    print(f"corpus: {n_corpus} vectors ({sf_dir})", flush=True)

    for cut in (3, 12, 48):
        eval_df = e.filter(b < cut)
        n_eval = eval_df.count()
        for label, fn in (
            ("exact", lambda c, v: semantic_decontaminate(
                c, v, "vec_id", "embedding", threshold=0.35)),
            ("ivf_auto", lambda c, v: semantic_decontaminate_ivf(
                c, v, "vec_id", "embedding", threshold=0.35,
                n_cells="auto")),
        ):
            best = float("inf")
            for _ in range(3):  # first run doubles as warmup
                t0 = time.perf_counter()
                fn(corpus, eval_df).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.perf_counter() - t0)
            per_train_us = best / n_corpus * 1e6
            print(
                f"eval={n_eval:>7} {label:>8}: {best:6.2f}s "
                f"({per_train_us:.1f} us/train-vec)",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
