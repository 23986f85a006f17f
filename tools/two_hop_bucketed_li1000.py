"""Bucketed-LAYOUT rung for graph_two_hop at 1000× (r10 verdict #4).

BASELINE.md records 390 s at li1000 as the single-host join-spill
floor for the exact two-hop: the binding term is the orderkey
sort-merge join externalizing lineitem's 600M (l_orderkey, l_partkey)
rows (~10 GB sorted with ~2× spill traffic). That term is a LAYOUT
cost, not a query cost — write the join inputs bucketed+sorted on the
join key once and every subsequent orderkey join reads them
exchange-free and sort-free (the `tests/test_bucketing.py` contract).
This measures that claim same-day against the plain-parquet form:

  plain    graph_two_hop over testdata_li1000 parquet (the recorded
           390 s floor, re-measured in this run for a valid pair)
  bkt_v1   same join order ((c ⋈ o) ⋈ l) but lineitem read from the
           bucketed table: the 150M (c ⋈ o) stream still exchanges +
           sorts into the 64 bucket partitions, lineitem's 600M side
           needs NO exchange and NO sort (one file per bucket, sortBy
           metadata trusted) — the dominant spill term gone
  bkt_v2   (o_bkt ⋈ li_bkt) bucket-aligned first (BOTH sides 64
           buckets on orderkey: zero exchange, zero sort), then the
           15M-row customer (c_custkey, c_mktsegment) projection
           BROADCAST onto the joined stream — no large exchange
           anywhere in the plan; the only shuffles are the two
           map-side-deduped partial aggregations (5 segments)

The one-time bucket write cost is reported too: the layout
amortization story is write-once / every-orderkey-join-after-free,
exactly how a 100 TB warehouse would keep its fact tables.

Usage: SPARK_GRAFT_CPUS=32 SPARK_GRAFT_DRIVER_MEM=48g \
           python tools/two_hop_bucketed_li1000.py [SF_DIR] [--skip-build]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F

from graphdbetl_spark.session import get_spark
from graphdbetl_spark.sources.catalog import load_table

BUCKETS = 64


def build_tables(spark, sf_dir: str) -> float:
    """Write the bucketed projections; returns the wall for the pair.

    repartition(BUCKETS, key) before bucketBy gives exactly one file
    per bucket — the condition under which Spark trusts sortBy
    metadata and elides the SMJ sort on the scan side."""
    t0 = time.perf_counter()
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    (
        li.repartition(BUCKETS, F.col("l_orderkey"))
        .write.bucketBy(BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li1000_li_bkt")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    (
        o.repartition(BUCKETS, F.col("o_orderkey"))
        .write.bucketBy(BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("li1000_o_bkt")
    )
    return time.perf_counter() - t0


def two_hop_plain(spark, sf_dir: str):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    joined = c.join(o, o.o_custkey == c.c_custkey).join(
        l, l.l_orderkey == o.o_orderkey
    )
    return _seg_agg(joined)


def two_hop_bkt_v1(spark, sf_dir: str):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = spark.table("li1000_li_bkt")
    joined = c.join(o, o.o_custkey == c.c_custkey).join(
        l, F.col("l_orderkey") == o.o_orderkey
    )
    return _seg_agg(joined)


def two_hop_bkt_v2(spark, sf_dir: str):
    seg = F.broadcast(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    )
    o = spark.table("li1000_o_bkt")
    l = spark.table("li1000_li_bkt")
    joined = o.join(l, F.col("l_orderkey") == F.col("o_orderkey")).join(
        seg, F.col("c_custkey") == F.col("o_custkey")
    )
    return _seg_agg(joined)


def _seg_agg(joined):
    # the r9 decomposed-branch shape: two single-distinct aggs joined
    # on the 5-row segment key (one agg with both distincts Expands
    # the joined stream 2x -- the 830 s cliff)
    parts = joined.groupBy("c_mktsegment").agg(
        F.countDistinct("l_partkey").alias("reachable_parts")
    )
    custs = joined.groupBy("c_mktsegment").agg(
        F.countDistinct("c_custkey").alias("n_customers")
    )
    return parts.join(custs, "c_mktsegment")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "testdata_li1000"
    spark = get_spark("two-hop-bucketed-1000x")
    if "--skip-build" not in sys.argv:
        wall = build_tables(spark, sf_dir)
        print(f"bucket build (li 600M + o 150M, {BUCKETS} buckets): {wall:.1f}s", flush=True)

    forms = {
        "plain": two_hop_plain,
        "bkt_v1": two_hop_bkt_v1,
        "bkt_v2": two_hop_bkt_v2,
    }
    for name, fn in forms.items():
        walls = []
        for i in range(3):  # first run doubles as warmup
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            print(f"{name} run {i}: {walls[-1]:.1f}s", flush=True)
        print(f"{name}: min-of-2 {min(walls[1:]):.1f}s (runs {['%.0f' % w for w in walls]})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
