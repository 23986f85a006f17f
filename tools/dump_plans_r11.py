"""Dump .explain("formatted") for headline queries to plans/r11/.

Optimization-round evidence: plans/r11/<query>_<tag>.txt holds the
formatted physical plan for each query at the bench scale factor, so
plan-shape claims in OPTIMIZATION_r11.md can be checked without
running Spark.

Usage: python tools/dump_plans_r11.py TAG [NAME...]   (TAG = before|after)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdbetl_spark.plans.registry import all_queries
from graphdbetl_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r11"
    out_dir.mkdir(parents=True, exist_ok=True)
    import bench

    if not names:
        names = list(bench.HEADLINE)
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("dump-plans-r11")
    qs = all_queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record, keep dumping
            plan = f"EXPLAIN FAILED: {exc}"
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"# {name}: {len(plan)} chars", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
