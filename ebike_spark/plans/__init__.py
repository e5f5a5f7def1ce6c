from ebike_spark.plans.registry import REGISTRY, QuerySpec, all_queries, all_oracles, register

__all__ = ["REGISTRY", "QuerySpec", "all_queries", "all_oracles", "register"]
