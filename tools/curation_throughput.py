"""Corpus-curation throughput at increasing input multiples.

The north-star claim is that the curation operators are scan-bound
(shuffle-free or single-shuffle), so their throughput should scale
~linearly once Spark's fixed overhead amortizes — this measures it by
replicating the sf0.1 documents table REP× (fresh doc_ids) and timing
three representative stages:

- scrub+score: pii_scrub + repetition stats fused in one projection
  pass (zero shuffles — pure codegen over the scan);
- chunk: overlapping context-window chunking (fan-out inside the scan
  stage, zero shuffles);
- dedup_exact: sha256 + min-id-per-digest (one shuffle);
- repeated_ngrams: cross-document repeated-5-gram coverage (the
  tf-idf shape: fingerprint, df aggregate, df join, per-doc rollup)
  — measured over a per-copy token-suffixed replica so the VOCABULARY
  grows with the corpus, as it does in reality; identical replicas
  would keep the document-frequency table artificially flat.

Usage: python tools/curation_throughput.py [REP ...]   (default: 20 200)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pyspark.sql.functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from graphdbetl_spark.operators.curation import chunk_text, repetition_stats, scrub_pii
from graphdbetl_spark.operators.dedup import dedup_exact_text
from graphdbetl_spark.session import get_spark
from graphdbetl_spark.sources.catalog import load_table


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [20, 200]
    spark = get_spark("graphdbetl-curation-throughput")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")

    for rep in reps:
        stage = f"/tmp/graft_curation_docs_{rep}"
        (
            docs.withColumn("_c", F.explode(F.array(*[F.lit(i) for i in range(rep)])))
            .withColumn("doc_id", F.col("doc_id") * rep + F.col("_c"))
            .drop("_c")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(stage)
        )
        d = spark.read.parquet(stage)
        n = d.count()
        n_bytes = d.agg(F.sum(F.octet_length("text"))).first()[0]

        # second replica with per-copy vocabulary for the df-join stage
        from graphdbetl_spark.operators.curation import repeated_ngram_coverage

        stage_v = f"/tmp/graft_curation_docsv_{rep}"
        (
            docs.withColumn("_c", F.explode(F.array(*[F.lit(i) for i in range(rep)])))
            .withColumn("doc_id", F.col("doc_id") * rep + F.col("_c"))
            .withColumn(
                "text",
                F.regexp_replace(
                    F.col("text"), F.lit(r"(\S+)"),
                    F.concat(F.lit("$1x"), F.col("_c").cast("string")),
                ),
            )
            .drop("_c")
            .repartition(64)
            .write.mode("overwrite")
            .parquet(stage_v)
        )
        dv = spark.read.parquet(stage_v)

        for name, frame in (
            ("scrub+score", scrub_pii(d, "text", "doc_id").join(
                repetition_stats(d, "text", "doc_id"), "doc_id")),
            ("chunk", chunk_text(d, "text", "doc_id")),
            ("dedup_exact", dedup_exact_text(d, "text", "doc_id")),
            ("repeated_ngrams", repeated_ngram_coverage(dv, "text", "doc_id", n=5)),
        ):
            t0 = time.perf_counter()
            frame.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            print(
                f"rep={rep:4d} {name:12s} rows={n:>12,} text={n_bytes/1e6:8.1f}MB "
                f"wall={wall:6.1f}s rows/s={n/wall:>12,.0f} MB/s={n_bytes/1e6/wall:6.1f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
