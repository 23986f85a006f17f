"""1000×-rung wall for the PURE approx two-hop reach (r9 verdict #7).

Measures :func:`two_hop_reach_approx` — one aggregation pass, both
reach counts as HLL++ sketches, no distinct shuffle, no Expand — over
testdata_li1000 (600M lineitem / 150M orders / 15M customers), the
same protocol as the r9 graph_two_hop row (solo, 48 g heap via
SPARK_GRAFT_DRIVER_MEM, warmup + min-of-2): the sketch posture's
answer to the exact form's 326 s single-host spill floor.

Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_DRIVER_MEM=48g \
           python tools/two_hop_approx_li1000.py [SF_DIR]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdbetl_spark.plans.pipeline_q import two_hop_reach_approx
from graphdbetl_spark.session import get_spark
from graphdbetl_spark.sources.catalog import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_li1000"
    spark = get_spark("two-hop-approx-1000x")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")

    best = float("inf")
    for i in range(3):  # first run doubles as warmup
        t0 = time.perf_counter()
        two_hop_reach_approx(c, o, l).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        print(f"run {i}: {wall:.1f}s", flush=True)
        if i > 0:
            best = min(best, wall)
    print(f"two_hop_reach_approx @ {sf_dir}: min-of-2 {best:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
