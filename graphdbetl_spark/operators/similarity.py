"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k is the correctness baseline (and is exactly
right when the query set is small: broadcast queries × corpus scan =
one pass, no shuffle). The scale path for all-pairs / large query sets
is LSH bucketing (random hyperplane signatures → equi-join on bucket),
which keeps candidate generation linear in corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from graphdbetl_spark.functions.vectors import cosine_similarity, l2_norm


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is expected to be small → broadcast; the corpus streams
    once through a whole-stage-codegen pipeline computing the dot
    product with higher-order array functions (JVM-side, no Python).
    Top-k per query via window row_number (partial top-k pushdown).
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    )
    scored = (
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
        .join(q, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Approximate neighbors via an IVF (inverted-file) index: k-means
    partitions the corpus into cells; each query scores only its
    ``n_probe`` nearest cells.

    Recall depends on how clustered the corpus is: uniform-random
    vectors (the synthetic testdata) are IVF's worst case (~0.6-0.7
    recall@10 at 6/16 probes); real embedding corpora cluster and land
    far higher at the same probe fraction.

    The candidate join is an equi-join on cell id — per query, work is
    (n_probe/n_clusters) of the corpus instead of all of it, and the
    cell assignment is a one-off index build (at 100 TB: persist the
    assignment as a bucketed table and this becomes a co-located join).
    Recall < 1 for vectors whose true neighbors sit in unprobed cells.
    """
    corpus_cells, centroids = ivf_build_index(corpus, id_col, vec_col, n_clusters, seed)
    return ivf_query(corpus_cells, centroids, queries, id_col, vec_col, k, n_probe)


def _unit_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    norm = l2_norm(F.col(vec_col))
    return df.withColumn("__unit", F.transform(vec_col, lambda x: (x / norm).cast("double")))


def ivf_build_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """One-off IVF index build: k-means the unit-normalized corpus into
    cells; returns (corpus_cells, centroids). The build cost amortizes
    over every subsequent query batch — at 100 TB, persist
    ``corpus_cells`` as a table bucketed by cell so ``ivf_query``'s
    candidate join is co-located and exchange-free."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    c = _unit_vectors(corpus, vec_col).withColumn(
        "features", array_to_vector(F.col("__unit"))
    )
    km = KMeans(k=n_clusters, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(c)
    corpus_cells = model.transform(c).select(
        F.col(id_col).alias("neighbor_id"), F.col("__unit").alias("__cv"), "cell"
    )
    # Tiny centroid table (n_clusters × dim) — broadcast; each query
    # ranks cells by cosine to the centroid and keeps the top n_probe.
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        ["cell", "centroid"],
    )
    return corpus_cells, centroids


def ivf_query(
    corpus_cells: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 6,
) -> DataFrame:
    """Query phase against a prebuilt IVF index (see ivf_build_index):
    per query, only n_probe cells of the corpus are scored."""
    q = _unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__unit").alias("__qv")
    )
    cell_rank = Window.partitionBy("query_id").orderBy(F.col("cell_cos").desc(), F.col("cell"))
    probed = (
        q.join(F.broadcast(centroids))
        .withColumn("cell_cos", cosine_similarity(F.col("__qv"), F.col("centroid")))
        .withColumn("cell_rn", F.row_number().over(cell_rank))
        .filter(F.col("cell_rn") <= n_probe)
        .select("query_id", "__qv", "cell")
    )

    scored = probed.join(corpus_cells, "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    # unit vectors: cosine = dot product
    dot_col = F.aggregate(
        F.zip_with("__qv", "__cv", lambda x, y: x * y), F.lit(0.0), lambda a, v: a + v
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("cosine", dot_col)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bucket_length: float = 2.0,
    num_tables: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate neighbors via BucketedRandomProjectionLSH.

    Candidate pairs come from equi-joins on (table, bucket) keys —
    linear candidate generation, the strategy that survives a 100×
    corpus. Returns (query_id, neighbor_id, cosine, rank) like the
    brute-force variant; recall < 1 by construction.
    """
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    def prep(df: DataFrame, alias: str) -> DataFrame:
        norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))
        unit = F.transform(vec_col, lambda x: x / norm)
        return df.select(F.col(id_col).alias(alias), array_to_vector(unit).alias("features"))

    c = prep(corpus, "neighbor_id")
    q = prep(queries, "query_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=bucket_length,
        numHashTables=num_tables, seed=seed,
    )
    model = lsh.fit(c)
    # Euclidean distance on unit vectors ↔ cosine: cos = 1 - d²/2.
    pairs = model.approxSimilarityJoin(q, c, 2.0, distCol="euclid")
    scored = pairs.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col("datasetB.neighbor_id").alias("neighbor_id"),
        (F.lit(1.0) - F.col("euclid") * F.col("euclid") / F.lit(2.0)).alias("cosine"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def label_centroids(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid of an embedding column, exploded to one row
    per (label, dimension) — the building block for IVF coarse
    quantizers, cluster drift monitoring, and class-prototype dedup.

    posexplode → groupBy(label, pos) keeps the aggregation fully
    JVM-side with map-side partial averages; the shuffle key space is
    |labels| × dims, so it stays balanced no matter how skewed the
    label distribution is (vs. collecting whole vectors per label).
    Reassemble into array form downstream with
    ``sort_array(collect_list(struct(pos, v)))`` only when |dims| is
    bounded.
    """
    ex = df.select(F.col(label_col).alias("label"), F.posexplode(vec_col).alias("pos", "__v"))
    return ex.groupBy("label", "pos").agg(
        F.round(F.avg("__v"), 6).alias("centroid_v"),
        F.count("*").cast("long").alias("n_vecs"),
    )
