"""Query registry: every engine operator registers a named
(spark, sf_dir) -> DataFrame callable plus, when SQL-expressible, the
equivalent DuckDB oracle SQL (SURVEY.md §5.1 — this is the correctness
gate's contract with ``__spark_entry__.py``).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import. Registration order is the
# order the correctness driver visits queries, and the driver's budget
# may not cover all of them — so the families whose verdicts matter
# most (LLM-pipeline dedup/similarity, streaming windows, SQL frontend,
# the reference's graph-ETL identity) register first; the relational /
# expression core, fully attested in round 1, registers last.
_FAMILY_MODULES = (
    "graphdbetl_spark.plans.llm_q",
    "graphdbetl_spark.plans.streaming_q",
    "graphdbetl_spark.plans.extra_q",
    "graphdbetl_spark.plans.graph_etl_q",
    "graphdbetl_spark.plans.curation_q",
    "graphdbetl_spark.plans.prep_q",
    "graphdbetl_spark.plans.pipeline_q",
    "graphdbetl_spark.plans.etl_ops_q",
    "graphdbetl_spark.plans.analytics_q",
    "graphdbetl_spark.plans.tpch_q",
    "graphdbetl_spark.plans.relational",
    "graphdbetl_spark.plans.expressions",
)


@dataclass
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver does a rows-only check


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an operator query. ``oracle`` is ANSI SQL DuckDB runs on
    the same parquet tables; alias computed columns identically on both
    sides (the driver's compare is column-name sensitive)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QueryDef(name, fn, oracle)
        return fn

    return deco


def _load() -> None:
    for mod in _FAMILY_MODULES:
        importlib.import_module(mod)


# The correctness driver visits queries in dict order with a ~50-query
# budget per round. Cumulative attestation after r5: 210/210
# oracle-backed entries green across CORRECTNESS_r01-r05; the only
# never-green entries were the 11 oracle-less ones. Round 6 gave every
# one of them a driver-attestable oracle (r5 verdict #1): md5/portable
# re-points (dedup_minhash/dedup_simhash/sketch_kmv_distinct/
# text_tokens), in-plan invariant bounds (agg_approx,
# embedding_pca_project), unrolled trajectories (bpe_learn_merges,
# bpe_tokenize_corpus, + the new batched entry), and md5-seeded ANN
# replays (sim_ivf/lsh/ivfpq_topk). The r6 slate leads with those 12
# never-green entries, then the r5-attested head (re-attestation is
# free within the budget), then everything long-attested.
_PRIORITY: tuple[str, ...] = (
    # r9 additions (never attested): IVF-cell-restricted semantic
    # decontamination (the eval-grows-with-corpus scale path, the
    # restriction itself oracle-replayed) and CCNet perplexity
    # terciles; then the r9 kernel/plan rewrites whose oracles are
    # unchanged but whose engines are new (tiered-precision exact
    # kernels, fused normalize digest, decomposed two_hop, AQE-less
    # GD loop) — cheap re-attestations that pin the rewrites.
    "decontaminate_semantic_ivf", "curation_ccnet_buckets",
    "dedup_containment_screened",
    # r8 additions (never attested): the compaction manifest EXECUTED
    # and proven by read-back; the batched k-center fast path under
    # the sequential trajectory's oracle; MMR diversity selection
    # (sequential + batched, shared unrolled-CTE oracle)
    "maintenance_compact_execute", "select_kcenter_coreset_batched",
    "select_mmr_diverse", "select_mmr_diverse_batched",
    "dedup_containment",
    # r7 additions (attested in r7): diversity coreset selection and
    # the size-binned compaction planner
    "select_kcenter_coreset", "maintenance_compact_plan",
    # never driver-green: oracled this round (r5 verdict #1, #4)
    "embedding_pca_project", "bpe_learn_merges", "bpe_tokenize_corpus",
    "bpe_learn_merges_batched", "dedup_minhash", "dedup_simhash",
    "sim_ivf_topk", "sim_lsh_topk", "sim_ivfpq_topk", "text_tokens",
    "sketch_kmv_distinct", "agg_approx",
    # new operators this round (never attested): semantic-tier
    # decontamination, per-dimension whitening, key-skew diagnostic,
    # Z-order layout attestation
    "decontaminate_semantic", "embedding_whiten", "skew_report",
    "maintenance_zorder_key", "sim_ivf_append",
    "select_importance_resampling",
    # r6 continuation additions (never attested): PPS corpus sampling
    # and the KMV cross-corpus overlap estimate
    "select_weighted_sample", "sketch_kmv_jaccard",
    # r5-attested slate (green in CORRECTNESS_r05)
    "graph_degree_stats", "graph_triangle_count", "graph_two_hop",
    "graph_pagerank", "stream_interval_join",
    "dedup_normalized_exact", "dedup_url_canonical", "text_entropy_gate",
    "curation_gopher_filter", "text_bigram_logprob", "mixture_epochs",
    "train_quality_classifier", "pipeline_quality_report",
    "score_quality_trained", "sim_range_search",
    "agg_decimal",
    # r4-and-earlier attested tail, most recent rotations first
    # previously attested (r1-r4 green), most recent rotations first
    "text_unigram_logprob", "text_winnow_fingerprints",
    "text_quality_classifier", "shard_manifest", "dedup_semantic_clusters",
    "mine_hard_negatives", "embedding_outliers", "curation_c4_filter",
    "dedup_winnow_pairs", "dedup_segments", "decontaminate_bloom",
    "sample_temperature", "dedup_minhash_incremental", "sketch_countmin_md5",
    "graph_bfs_depth", "dedup_image_ahash", "dedup_audio_fingerprint",
    "dedup_video_signature", "dedup_image_hamming", "pipeline_hygiene_report",
    "graph_kcore", "graph_sssp_bounded", "pipeline_multimodal_report",
    "agg_mode", "pipeline_training_order", "dedup_embedding_cosine_exact",
    "udtf_explode_outer", "agg_stats", "agg_percentile_exact",
    "str_funcs2", "date_funcs2", "regex_extract",
    "sink_parquet", "sink_csv", "sink_json", "scan_orc", "scan_text",
    "multimodal_audio_decode", "multimodal_video_frames",
    "sim_ivf_recall_floor", "sim_lsh_recall_floor", "sim_pq_recall_floor",
    "embedding_quantize_int8", "text_feature_hashing", "doc_repetition",
    "doc_repeated_ngrams", "curation_domain_cap", "embedding_centroids",
    "pipeline_chunk_pack",
)


def _ordered() -> dict[str, QueryDef]:
    _load()
    out: dict[str, QueryDef] = {}
    for name in _PRIORITY:
        if name in REGISTRY:
            out[name] = REGISTRY[name]
    for name, qd in REGISTRY.items():
        if name not in out:
            out[name] = qd
    return out


def all_queries() -> dict[str, QueryFn]:
    return {name: qd.fn for name, qd in _ordered().items()}


def all_oracles() -> dict[str, str]:
    return {
        name: qd.oracle for name, qd in _ordered().items() if qd.oracle is not None
    }
