"""Full-registry oracle campaign against a replica scale dir.

Runs every oracle-backed queries() entry through the verify_local
compare at the given replica dir, one query at a time, appending a
result line per query to the log — resumable (already-logged queries
are skipped), so the campaign survives process restarts.

Usage: SPARK_GRAFT_CPUS=32 python tools/campaign_30x.py SF_DIR LOG \
           [--skip name ...]
"""

from __future__ import annotations

import sys
import time
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from graphdbetl_spark.session import get_spark
from graphdbetl_spark.sources.catalog import TABLES
from tools.verify_local import table_hash


def main() -> int:
    sf_dir, log_path = sys.argv[1], sys.argv[2]
    skips = set()
    if "--skip" in sys.argv:
        skips = set(sys.argv[sys.argv.index("--skip") + 1 :])

    import __spark_entry__ as entrymod

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    done: set[str] = set()
    log = Path(log_path)
    if log.exists():
        done = {ln.split("\t")[1] for ln in log.read_text().splitlines() if "\t" in ln}

    spark = get_spark("campaign")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    for name in qs:
        if name not in oracles or name in done or name in skips:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            n_s, h_s = table_hash(srows, scols)
            cur = con.execute(oracles[name])
            orows = cur.fetchall()
            ocols = [d[0] for d in cur.description]
            n_o, h_o = table_hash(orows, ocols)
            ok = (n_s == n_o) and (sorted(scols) == sorted(ocols)) and (h_s == h_o)
            status = "PASS" if ok else f"FAIL rows={n_s}/{n_o} hash={h_s}/{h_o}"
        except Exception as exc:  # noqa: BLE001
            status = f"ERROR {type(exc).__name__}: {exc}"
            traceback.print_exc()
        line = f"{status}\t{name}\t{time.time() - t0:.1f}s"
        with open(log, "a") as f:
            f.write(line + "\n")
        print(line, flush=True)
        # queries cache()/localCheckpoint() freely for their own plan;
        # across a 200-query campaign those pin the heap cumulatively
        # (pagerank OOM'd after triangle-count's cached edges) — drop
        # everything between queries
        try:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
