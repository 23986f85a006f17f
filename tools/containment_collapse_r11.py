"""r11 measurement: containment UPSTREAM CLONE COLLAPSE vs bare exact.

The r10 verdict's remaining containment evidence gap: the documented
100 TB mitigation — normalized-exact dedup FIRST (linear), exact
containment on survivors — existed as prose only. This measures the
composition (`ngram_containment_collapsed_pairs`) against bare exact
(`ngram_containment_pairs`) min-of-N (warmup pass first) at shapes that
bracket both regimes:

  testdata_exactclone  30 orig x 150 clones x 2000 grams, PUNCT marker
                       -> clones are normalized-exact dups: collapse
                          folds 150-deep groups to 1 survivor before
                          the Sigma df^2 pair join (the win regime)
  testdata_bigclone    same shape, TOKEN marker -> collapse is a no-op
                       (marker survives normalization): measures the
                       composition's pure overhead (digest pass +
                       survivor semi-join + dup-count joins)
  testdata_sf10        100x replica (marker-token vocab per copy,
                       52-gram docs) -> no-op collapse at corpus scale

Usage: SPARK_GRAFT_CPUS=32 python tools/containment_collapse_r11.py [FIXTURE_DIR ...]
Env:   COLLAPSE_ITERS (default 3)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdbetl_spark.operators.dedup import (
    ngram_containment_collapsed_pairs,
    ngram_containment_pairs,
)
from graphdbetl_spark.session import get_spark

DEFAULT_FIXTURES = ["testdata_exactclone", "testdata_bigclone", "testdata_sf10"]


def main() -> None:
    fixtures = sys.argv[1:] or DEFAULT_FIXTURES
    iters = int(os.environ.get("COLLAPSE_ITERS", "3"))
    spark = get_spark("containment-collapse-r11")
    for fx in fixtures:
        docs = spark.read.parquet(f"{fx}/documents.parquet")
        n_docs = docs.count()
        forms = {
            "exact": lambda d=docs: ngram_containment_pairs(
                d, "text", "doc_id", n=3, threshold=0.5, block_cols=["lang"]
            ),
            "collapsed": lambda d=docs: ngram_containment_collapsed_pairs(
                d, "text", "doc_id", n=3, threshold=0.5, block_cols=["lang"]
            ),
        }
        for name, build in forms.items():
            # warmup (JIT + page cache) doubles as the pair count;
            # timed runs use the noop sink (the r10 protocol)
            rows = build().count()
            best = float("inf")
            for _ in range(iters):
                t0 = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            print(
                f"{fx} ({n_docs} docs) {name}: {best:.2f}s  pairs={rows}",
                flush=True,
            )


if __name__ == "__main__":
    main()
