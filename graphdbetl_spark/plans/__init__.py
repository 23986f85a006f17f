from graphdbetl_spark.plans.registry import REGISTRY, query, all_queries, all_oracles

__all__ = ["REGISTRY", "query", "all_queries", "all_oracles"]
