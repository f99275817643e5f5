from bigdatacw1_spark.plans.explain import (
    count_global_windows,
    formatted_plan,
    has_broadcast_hash_join,
    has_python_eval,
    has_take_ordered,
    pushed_filters,
    wholestage_codegen_spans,
)

__all__ = [
    "count_global_windows",
    "formatted_plan",
    "has_broadcast_hash_join",
    "has_python_eval",
    "has_take_ordered",
    "pushed_filters",
    "wholestage_codegen_spans",
]
