"""Ad-hoc per-query wall timing: warm each named query once (noop
sink), then report min-of-2. The scale-curve companion to bench.py —
point it at a replica dir (tools/gen_scaled.py) to measure headroom.

Usage: SPARK_GRAFT_CPUS=32 python tools/time_queries.py SF_DIR NAME...
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdbetl_spark.plans.registry import all_queries
from graphdbetl_spark.session import get_spark


def main() -> None:
    sf, names = sys.argv[1], sys.argv[2:]
    spark = get_spark("time-queries")
    qs = all_queries()
    for n in names:  # warmup
        try:
            qs[n](spark, sf).write.format("noop").mode("overwrite").save()
        except Exception as exc:
            print(f"{n}: WARMUP FAIL {exc}", flush=True)
    import os

    iters = int(os.environ.get("SPARK_GRAFT_TIME_ITERS", "2"))
    for n in names:
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            qs[n](spark, sf).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{n}: {best:.2f}s", flush=True)


if __name__ == "__main__":
    main()
