"""r12 rung (r11 verdict #9): containment collapse in the SHUFFLE
regime — past the broadcast group cap.

r11 measured the collapse composition only in its broadcast regime
(n_groups <= broadcast_cap: semi-join + dup-count joins broadcast).
The >cap branch (shuffle-hash restriction) was argued, not measured.
No local fixture reaches 2M normalized groups, so this rung FORCES the
shuffle branch with broadcast_cap=0 on the clone-heavy exactclone
fixture (30 originals x 150 normalized-exact clones x 2000 grams) and
compares, within ONE session, min-of-N walls of:

  exact       bare ngram_containment_pairs (the Sigma df^2 regime)
  collapsed0  ngram_containment_collapsed_pairs, broadcast_cap=0
              (shuffle-restriction regime — the branch under test)
  collapsed   default cap (broadcast regime, r11's measured form)

Done-criterion: collapsed0 / exact < 1 on the clone-heavy rung.

Usage: SPARK_GRAFT_CPUS=32 python tools/containment_collapse_r12.py [FIXTURE_DIR]
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


def main() -> None:
    fx = sys.argv[1] if len(sys.argv) > 1 else "testdata_exactclone"
    iters = int(os.environ.get("COLLAPSE_ITERS", "3"))
    spark = get_spark("containment-collapse-r12")
    docs = spark.read.parquet(f"{fx}/documents.parquet")
    n_docs = docs.count()
    forms = {
        "exact": lambda d=docs: ngram_containment_pairs(
            d, "text", "doc_id", n=3, threshold=0.5, block_cols=["lang"]
        ),
        "collapsed0": lambda d=docs: ngram_containment_collapsed_pairs(
            d, "text", "doc_id", n=3, threshold=0.5, block_cols=["lang"],
            broadcast_cap=0,
        ),
        "collapsed": lambda d=docs: ngram_containment_collapsed_pairs(
            d, "text", "doc_id", n=3, threshold=0.5, block_cols=["lang"]
        ),
    }
    counts = {name: build().count() for name, build in forms.items()}  # warmup
    for name, build in forms.items():
        best = float("inf")
        for _ in range(iters):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{fx} ({n_docs} docs) {name}: {best:.2f}s  pairs={counts[name]}", flush=True)


if __name__ == "__main__":
    main()
