"""1000x rung for the graph family's LINEAR members (r7 verdict #7):
graph_degree_stats, graph_two_hop, graph_kcore over testdata_li1000
(lineitem/orders/customer replicated 1000x from sf0.1 — 600M / 150M /
15M rows; copies never join to each other, so the co-purchase edge
set scales linearly at ~2.4B directed pairs).

Spark-side noop-sink walls, resumable like walls_all.py. Also logs
the edge count (distinct co-purchase pairs) once, because the rung's
claim is walls *per edge volume*.

Usage: SPARK_GRAFT_CPUS=32 python tools/walls_li1000.py [SF_DIR] [LOG]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

QUERIES = ("graph_degree_stats", "graph_two_hop", "graph_kcore")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "testdata_li1000"
    log = Path(sys.argv[2] if len(sys.argv) > 2 else "tools/walls_li1000_r8.log")

    import __spark_entry__ as entrymod

    from graphdbetl_spark.session import get_spark

    qs = entrymod.queries()
    done: set[str] = set()
    if log.exists():
        done = {ln.split("\t")[1] for ln in log.read_text().splitlines() if "\t" in ln}

    spark = get_spark("walls_li1000")
    for name in QUERIES:
        if name in done:
            continue
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            line = f"WALL\t{name}\t{time.time() - t0:.1f}s"
        except Exception as e:  # noqa: BLE001 — campaign must continue
            first = traceback.format_exception_only(type(e), e)[-1].strip()
            line = f"ERR\t{name}\t{time.time() - t0:.1f}s\t{first[:300]}"
        print(line, flush=True)
        with log.open("a") as fh:
            fh.write(line + "\n")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
