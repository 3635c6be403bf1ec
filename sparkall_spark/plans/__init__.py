from sparkall_spark.plans.model import (
    Aggregation,
    Filter,
    OrderKey,
    ParsedQuery,
    Star,
    TransformSpec,
    Triple,
)
from sparkall_spark.plans.parser import parse_sparql
from sparkall_spark.plans.planner import JoinEdge, QueryPlan, plan_query

__all__ = [
    "Aggregation",
    "Filter",
    "OrderKey",
    "ParsedQuery",
    "Star",
    "TransformSpec",
    "Triple",
    "parse_sparql",
    "JoinEdge",
    "QueryPlan",
    "plan_query",
]
