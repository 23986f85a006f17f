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
# budget per round. Rounds 1+2 attested 96 distinct queries; this
# round's slate is rotated (r2 verdict ask #1) to the queries that have
# never appeared in a driver CORRECTNESS file: the r2-added oracles the
# advisor flagged as unexercised, every never-checked TPC-H shape, the
# analytics / etl-ops families, and the join/window core. All entries
# below are oracle-backed (rows-only entries would spend a driver slot
# on a weaker check); the remaining never-attested queries follow
# immediately after the slate so any extra driver budget reaches them
# before the already-attested families, which register last.
_PRIORITY: tuple[str, ...] = (
    # r2-added oracles the advisor flagged as never driver-exercised
    "bpe_pair_counts", "dedup_incremental", "dedup_embedding_lsh_blocked",
    "dedup_embedding_keep_blocked", "split_group_aware", "mixture_upsample",
    "multimodal_audio_chunks", "agg_bitwise", "map_funcs2",
    # TPC-H shapes never driver-checked (q1/q3/q5/q18/recursive/q2 were)
    "sql_frontend_q4", "sql_frontend_q6", "sql_frontend_q7_style",
    "sql_frontend_q8_style", "sql_frontend_q9_style",
    "sql_frontend_q10_style", "sql_frontend_q11_style",
    "sql_frontend_q12_style", "sql_frontend_q13_style",
    "sql_frontend_q14", "sql_frontend_q15_style", "sql_frontend_q16_style",
    "sql_frontend_q17", "sql_frontend_q19_style", "sql_frontend_q20_style",
    "sql_frontend_q21_style", "sql_frontend_q22_style",
    # analytics
    "gapfill_daily", "retention_cohorts", "events_anomaly_zscore",
    "running_distinct_users", "ngram_topk_per_lang",
    # etl ops
    "node_upsert", "scd2_history", "cdc_apply", "dq_checks",
    "snapshot_diff", "profile_table", "histogram_bins", "er_fuzzy_match",
    # join / window / reshape core
    "join_right", "join_asof_forward_tol", "range_join_bucketized",
    "join_skew_salted", "agg_salted", "win_rank_variants",
    "win_range_frame", "pivot_status", "unpivot_metrics", "udaf_grouped",
    "udtf_explode",
    # --- driver budget line (~50): remaining never-attested entries ---
    "udtf_explode_outer", "agg_stats", "agg_percentile_exact",
    "agg_decimal", "str_funcs2", "date_funcs2", "regex_extract",
    "sink_parquet", "sink_csv", "sink_json", "scan_orc", "scan_text",
    "multimodal_audio_decode", "multimodal_video_frames",
    "sim_ivf_recall_floor", "sim_lsh_recall_floor", "sim_pq_recall_floor",
    "embedding_quantize_int8", "text_feature_hashing", "doc_repetition",
    "doc_repeated_ngrams", "curation_domain_cap", "embedding_centroids",
    "pipeline_chunk_pack", "graph_degree_stats", "graph_triangle_count",
    "graph_two_hop", "graph_pagerank", "stream_interval_join",
    # dedup_embedding_cosine changed semantics in r3 (hyperplane-blocked
    # default, r2 verdict ask #2) — re-attest ahead of old greens
    "dedup_embedding_cosine",
    # r3 additions (oracle-backed; next rotation's slate candidates)
    "text_unigram_logprob", "text_winnow_fingerprints",
    "text_quality_classifier", "shard_manifest", "dedup_semantic_clusters",
    "mine_hard_negatives", "embedding_pca_project", "bpe_learn_merges",
    "embedding_outliers", "curation_c4_filter", "dedup_winnow_pairs",
    "bpe_tokenize_corpus", "dedup_segments", "decontaminate_bloom",
    "sample_temperature", "dedup_minhash_incremental", "sketch_countmin_md5",
    "graph_bfs_depth", "dedup_image_ahash", "dedup_audio_fingerprint",
    "dedup_video_signature", "dedup_image_hamming", "pipeline_hygiene_report",
    "graph_kcore", "graph_sssp_bounded", "pipeline_multimodal_report",
    "agg_mode", "pipeline_training_order",
    # rows-only never-attested (weaker check, lowest rotation priority)
    "dedup_minhash", "dedup_simhash", "sim_ivf_topk", "sim_lsh_topk",
    "sim_ivfpq_topk", "text_tokens", "sketch_kmv_distinct",
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
