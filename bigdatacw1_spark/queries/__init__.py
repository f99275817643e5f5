"""Query modules. Importing this package populates the registry."""

from bigdatacw1_spark.queries.registry import REGISTRY, QuerySpec

# Each import registers its queries via the @q decorator.
from bigdatacw1_spark.queries import inventory  # noqa: F401  (reference ports)
from bigdatacw1_spark.queries import ops_suite  # noqa: F401  (per-operator micro-queries)
from bigdatacw1_spark.queries import extensions  # noqa: F401  (dedup/similarity/text/multimodal)
from bigdatacw1_spark.queries import streaming_suite  # noqa: F401  (event-time windows)
from bigdatacw1_spark.queries import tpch  # noqa: F401  (TPC-H-shaped headliners)
from bigdatacw1_spark.queries import sampling_suite  # noqa: F401  (deterministic sampling)
from bigdatacw1_spark.queries import warehouse  # noqa: F401  (lifecycle + behavioral)

__all__ = ["REGISTRY", "QuerySpec"]
