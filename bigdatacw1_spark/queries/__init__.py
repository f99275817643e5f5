"""Query modules. Importing this package populates the registry."""

from bigdatacw1_spark.queries.registry import REGISTRY, QuerySpec

# Each import registers its queries via the @q decorator.
from bigdatacw1_spark.queries import inventory  # noqa: F401  (reference ports)
from bigdatacw1_spark.queries import ops_suite  # noqa: F401  (per-operator micro-queries)

__all__ = ["REGISTRY", "QuerySpec"]
