from bigdatacw1_spark.plans.explain import (
    formatted_plan,
    has_broadcast_hash_join,
    has_python_eval,
    has_take_ordered,
    pushed_filters,
    wholestage_codegen_spans,
)

__all__ = [
    "formatted_plan",
    "has_broadcast_hash_join",
    "has_python_eval",
    "has_take_ordered",
    "pushed_filters",
    "wholestage_codegen_spans",
]
