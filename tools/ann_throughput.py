"""ANN throughput: brute-force vs IVF vs PQ-ADC cosine top-k at
increasing corpus multiples.

Replicates the sf0.1 embeddings table REP× (fresh vec_ids; values
unchanged — throughput is value-independent) and measures, for a fixed
8-query batch: brute-force scan latency, IVF index-build time (one-off)
and IVF query latency. The claim under test: IVF query cost scales with
n_probe/n_clusters of the corpus, brute force with all of it — recall
quality is measured separately in tests/ (uniform-random vectors are
IVF's worst case).

Usage: python tools/ann_throughput.py [REP ...]   (default: 25 250)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdbetl_spark.operators.similarity import (
    cosine_topk_bruteforce,
    ivf_build_index,
    ivf_query,
    pq_adc_topk,
    pq_build_codebooks_md5,
)
from graphdbetl_spark.session import get_spark
from graphdbetl_spark.sources.catalog import load_table


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [25, 250]
    spark = get_spark("graphdbetl-ann-throughput")
    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings")
    queries = emb.limit(8).cache()
    queries.count()

    for rep in reps:
        stage = f"/tmp/graft_ann_emb_{rep}"
        (
            emb.withColumn("_c", F.explode(F.array(*[F.lit(i) for i in range(rep)])))
            .withColumn("vec_id", F.col("vec_id") * rep + F.col("_c"))
            .drop("_c")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(stage)
        )
        corpus = spark.read.parquet(stage)
        n = corpus.count()

        t0 = time.perf_counter()
        cosine_topk_bruteforce(corpus, queries, k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        brute = time.perf_counter() - t0

        t0 = time.perf_counter()
        cells, cents = ivf_build_index(corpus, n_clusters=32)
        cells = cells.cache()
        cells.count()  # materialize the index (the persisted-table stand-in)
        build = time.perf_counter() - t0

        t0 = time.perf_counter()
        ivf_query(cells, cents, queries, k=10, n_probe=6).write.format("noop").mode(
            "overwrite"
        ).save()
        ivf_q = time.perf_counter() - t0
        cells.unpersist()

        t0 = time.perf_counter()
        codes, books = pq_build_codebooks_md5(corpus)
        codes = codes.cache()
        codes.count()  # materialize the codes table (8x smaller than floats)
        pq_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        pq_adc_topk(codes, books, queries, k=10).write.format("noop").mode(
            "overwrite"
        ).save()
        pq_q = time.perf_counter() - t0
        codes.unpersist()

        print(
            f"rep={rep:4d} vectors={n:>10,}  brute={brute:6.1f}s "
            f"({8 * n / brute:>12,.0f} scored/s)  ivf_build={build:6.1f}s (one-off)  "
            f"ivf_query={ivf_q:6.1f}s  probe_fraction={6 / 32:.2f}  "
            f"pq_build={pq_build:6.1f}s (one-off)  pq_query={pq_q:6.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
