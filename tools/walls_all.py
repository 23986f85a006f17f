"""Full-registry SPARK-SIDE wall campaign at a replica scale dir.

Runs every queries() entry through a noop sink (full projection, no
oracle side) at the given dir, appending one line per entry to the
log — resumable (already-logged entries skip), so the campaign
survives restarts and per-entry kills. Complements campaign_30x.py
(which replays oracles): this one exists to catch ENGINE-side scale
defects — OOMs, mis-broadcasts, interpreted hot loops — over the
whole surface, the way the r6-continuation pass caught the
dedup_ngram_jaccard broadcast OOM and the >870 s BPE/brute-force
walls.

Usage: SPARK_GRAFT_CPUS=32 python tools/walls_all.py SF_DIR LOG \
           [--skip name ...]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _session_alive(spark) -> bool:
    try:
        spark.sql("SELECT 1").collect()
        return True
    except Exception:  # noqa: BLE001
        return False


def main() -> int:
    sf_dir, log_path = sys.argv[1], sys.argv[2]
    skips = set()
    if "--skip" in sys.argv:
        skips = set(sys.argv[sys.argv.index("--skip") + 1 :])

    import __spark_entry__ as entrymod

    from graphdbetl_spark.session import get_spark

    qs = entrymod.queries()
    done: set[str] = set()
    log = Path(log_path)
    if log.exists():
        done = {ln.split("\t")[1] for ln in log.read_text().splitlines() if "\t" in ln}

    spark = get_spark("walls_all")
    for name in qs:
        if name in done or name in skips:
            continue
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            line = f"WALL\t{name}\t{time.time() - t0:.1f}s"
        except Exception as e:  # noqa: BLE001 — campaign must continue
            first = traceback.format_exception_only(type(e), e)[-1].strip()
            kind = "GATED" if "QuadraticInputError" in type(e).__name__ else "ERROR"
            line = f"{kind}\t{name}\t{time.time() - t0:.1f}s\t{first[:300]}"
            if "ConnectionRefused" in first or not _session_alive(spark):
                # The JVM/gateway is gone — every further entry would
                # log a spurious error against a dead session. Stop;
                # the campaign is resumable after a restart.
                print(f"ABORT\tsession dead after {name}", flush=True)
                with log.open("a") as fh:
                    fh.write(line + "\n")
                return 1
        with log.open("a") as fh:
            fh.write(line + "\n")
        print(line, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
