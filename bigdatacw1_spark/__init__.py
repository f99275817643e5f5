"""bigdatacw1_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference repo JasmineeeWu/BigDataCW1 (4 declarative
queries: 2 PostgreSQL SQL, 2 MongoDB aggregation pipelines over a
cash-equity dataset), widened with the large-scale training-data pipeline
operators a 100 TB deployment needs (dedup, similarity search, multimodal
column plumbing, text analysis, streaming windows).

Layout:
  session    — SparkSession factory with scale-tuned defaults (AQE, UTC, Arrow)
  sources    — parquet catalog: declared schemas, loader, view registration
  functions  — scalar/text/vector column-expression helpers (JVM-side built-ins)
  operators  — relational operator library + dedup/similarity/multimodal
  queries    — reference-query ports + the oracle-checked operator inventory
  streaming  — Structured Streaming windows over the events table
  plans      — plan-inspection helpers (pushdown/broadcast assertions)

Everything here is built only on the public Apache Spark / PySpark API.
"""

from bigdatacw1_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
