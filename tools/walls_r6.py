"""Spark-side wall clock for the r6 operator additions at a replica
scale dir (noop sink — measures the full projection, not a pruned
count; the r2 lesson). Oracle replay at 100× is covered separately
where DuckDB can hold the pair volume (see BASELINE.md r6 section).

Usage: SPARK_GRAFT_CPUS=32 python tools/walls_r6.py SF_DIR [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdbetl_spark.session import get_spark

DEFAULT = [
    "embedding_whiten",
    "skew_report",
    "maintenance_zorder_key",
    "sim_ivf_append",
    "select_importance_resampling",
]


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("walls_r6")
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        print(f"{name}\t{time.perf_counter() - t0:.1f}s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
