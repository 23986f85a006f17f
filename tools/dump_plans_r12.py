"""Dump .explain("formatted") for headline queries to plans/r12/.

Optimization-round evidence: plans/r12/<query>_<tag>.txt holds the
formatted physical plan for each query at the bench scale factor, so
plan-shape claims in OPTIMIZATION_r12.md can be checked without
running Spark.

r11 verdict #6: for the ITERATIVE operators (kcenter / mmr / logreg)
the final frame is a driver-built trajectory (Scan ExistingRDD) that
shows nothing about the per-round job the optimizations target — so
for those entries this tool additionally hooks
``coreset.PLAN_PROBE`` and dumps the FIRST round's pre-collect plan to
plans/r12/<query>_round_<tag>.txt.

Usage: python tools/dump_plans_r12.py TAG [NAME...]   (TAG = before|after)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdbetl_spark.operators import coreset
from graphdbetl_spark.plans.registry import all_queries
from graphdbetl_spark.session import get_spark

# entries whose per-round job plan is the real evidence
ITERATIVE = {
    "select_kcenter_coreset",
    "select_kcenter_coreset_batched",
    "select_mmr_diverse",
    "train_quality_classifier",
}


def _fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r12"
    out_dir.mkdir(parents=True, exist_ok=True)
    import bench

    if not names:
        names = list(bench.HEADLINE)
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("dump-plans-r12")
    qs = all_queries()
    for name in names:
        captured: dict[str, str] = {}

        def probe(label: str, df, captured=captured) -> None:
            captured.setdefault(label, _fmt(df))  # first round only

        try:
            if name in ITERATIVE:
                coreset.PLAN_PROBE = probe
            df = qs[name](spark, sf_dir)
            plan = _fmt(df)
            if name in ITERATIVE:
                # iterative operators run their rounds at BUILD time
                # (the query fn drives the loop), so the probe has
                # fired by now; still, force an action for any lazy
                # tail so the dump reflects an executed query.
                df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 - record, keep dumping
            plan = f"EXPLAIN FAILED: {exc}"
        finally:
            coreset.PLAN_PROBE = None
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        for label, rplan in captured.items():
            (out_dir / f"{name}_round_{tag}.txt").write_text(
                f"# per-round job plan ({label}, first round)\n{rplan}"
            )
        print(f"# {name}: {len(plan)} chars", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
