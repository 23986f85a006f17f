"""Graph-build throughput vs the reference's execution shape, at
increasing input multiples.

The reference ingests tuple-at-a-time in one Python thread
(`graph_db_builder.py:516-530`) — its throughput is a flat per-row
cost at any scale (~224k rows/s measured ceiling on this machine, see
BASELINE.md). Spark pays fixed session/planning overhead but scales
with cores; this measures where the crossover lands by replicating the
sf0.1 inputs in-memory REP× (rows get distinct synthetic ids so the
dedup/merge work is honest) and running the same two-source node-build
pipeline as `node_build_party` + a parquet write.

Usage: python tools/throughput.py [REP ...]   (default: 1 10)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdbetl_spark.etl.schema import conform_to_schema, merge_schemas
from graphdbetl_spark.operators.dedup import dedup_merge_first_wins
from graphdbetl_spark.session import get_spark
from graphdbetl_spark.sources.catalog import load_table


def replicate(df, id_col: str, rep: int):
    if rep == 1:
        return df
    # distinct ids per copy: id' = id * rep + copy
    return (
        df.withColumn("_copy", F.explode(F.array(*[F.lit(i) for i in range(rep)])))
        .withColumn(id_col, F.col(id_col) * rep + F.col("_copy"))
        .drop("_copy")
    )


def build_party(cust, supp):
    """The node_build_party pipeline over injected frames: schema merge,
    typed conform, union, namespaced id, first-wins merge-dedup."""
    target = merge_schemas([cust.schema, supp.schema])
    unioned = conform_to_schema(cust, target).unionByName(conform_to_schema(supp, target))
    keyed = unioned.withColumn(
        "_id",
        F.when(F.col("c_custkey").isNotNull(),
               F.concat(F.lit("customer:"), F.col("c_custkey").cast("string")))
        .otherwise(F.concat(F.lit("supplier:"), F.col("s_suppkey").cast("string"))),
    )
    return dedup_merge_first_wins(keyed, "_id", order_by=["_id"])


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("graphdbetl-throughput")
    sf_dir = "/root/testdata/sf0.1"
    out = "/tmp/graphdbetl_throughput_out"

    for rep in reps:
        # materialize replicated inputs OUTSIDE the timed region: the
        # pipeline under test starts at a parquet scan, like the real
        # ingest (the reference starts at a MySQL cursor)
        stage_c, stage_s = f"/tmp/graphdbetl_tp_c_{rep}", f"/tmp/graphdbetl_tp_s_{rep}"
        # repartition: the sf0.1 sources are single files, and a 1-part
        # staged dataset would serialize the scan under test
        replicate(load_table(spark, sf_dir, "customer"), "c_custkey", rep) \
            .repartition(64).write.mode("overwrite").parquet(stage_c)
        replicate(load_table(spark, sf_dir, "supplier"), "s_suppkey", rep) \
            .repartition(64).write.mode("overwrite").parquet(stage_s)
        cust, supp = spark.read.parquet(stage_c), spark.read.parquet(stage_s)
        n_rows = cust.count() + supp.count()

        t0 = time.perf_counter()
        build_party(cust, supp).write.mode("overwrite").parquet(out)
        wall = time.perf_counter() - t0
        print(f"rep={rep:3d}  rows={n_rows:>12,}  wall={wall:6.1f}s  "
              f"rows/s={n_rows / wall:>12,.0f}", flush=True)


if __name__ == "__main__":
    main()
