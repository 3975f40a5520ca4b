from rt_bigdata_spark.plans.registry import REGISTRY, QuerySpec, get_queries, get_oracles

__all__ = ["REGISTRY", "QuerySpec", "get_queries", "get_oracles"]
