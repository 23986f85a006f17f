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
    # r10 changed-code entries FIRST (re-attestation pins the round's
    # rewrites): the screened containment rebuilt around the per-doc
    # gram-array verify (+ the exact form whose index core was
    # refactored and the Jaccard sibling sharing it); the normalized-
    # exact digest kernel's full-Unicode delete table (the r9 ADVICE
    # astral-plane fix); the tiered-precision kernels' bounded fp64
    # fold (decontaminate semantic family, cosine range search); the
    # GD loop's conf_override scoping.
    # r10 NEW entry (never attested): HLL two-hop reach with in-plan
    # error-bound attestation (the 1000×-rung sketch posture)
    "graph_two_hop_approx",
    "dedup_containment_screened", "dedup_containment",
    "dedup_ngram_jaccard", "dedup_normalized_exact",
    "decontaminate_semantic", "decontaminate_semantic_ivf",
    "sim_range_search", "train_quality_classifier",
    "score_quality_trained", "curation_ccnet_buckets",
    # r9 additions re-visited (r9 verdict #8: keep the newest entries
    # in rotation alongside the stalest).
    # THEN the r01-vintage tail (45 entries whose latest driver check
    # is round 1 — the relational/expression core, attested green in
    # every local verify since): bounded-staleness rotation so every
    # entry's driver evidence stays recent. The remaining r02-vintage
    # block rotates in next round.
    "agg_collect", "agg_distinct", "agg_grouping_sets", "agg_hash",
    "agg_string", "array_funcs", "cast_columns", "cast_try",
    "cond_funcs", "date_funcs", "dedup_first_wins", "filter_pred",
    "from_json_struct", "join_anti", "join_asof", "join_bridge",
    "join_cross", "join_fk_inner", "join_full", "join_left",
    "join_null_safe", "join_range", "join_semi", "join_theta",
    "json_funcs", "map_struct_funcs", "math_funcs", "nfkd_fold",
    "null_fill", "project_remap", "scan_csv", "scan_json",
    "scan_parquet", "schema_peek", "set_except", "set_intersect",
    "sort_limit", "str_funcs", "topk_per_group", "union_all",
    "union_by_name", "union_distinct", "win_analytic", "win_frame",
    "win_rank",
    # r02-vintage block (next rotation's head if the budget reaches it)
    "agg_approx_bounds", "budget_select", "chunk_documents",
    "decontaminate_ngrams", "dedup_cluster_components",
    "dedup_cluster_keep_best", "dedup_embedding_cosine",
    "dedup_embedding_keep", "dedup_exact", "dedup_keep_list",
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
