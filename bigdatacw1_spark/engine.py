"""Engine facade: the two user-facing front ends over one implementation.

The reference demonstrates the same analyses in a SQL dialect
(SQLQueries.sql) and a fluent pipeline dialect (NoSQLQueries.js
aggregation stages). SURVEY.md §3.3 maps both onto Spark: a SQL string
and a DataFrame chain converge on the same Catalyst logical plan, so the
engine exposes both over a single registered catalog:

    eng = Engine(sf_dir="/root/testdata/sf0.1")
    eng.sql("SELECT ... FROM lineitem ...")     # lifecycle §3.1
    eng.table("lineitem").where(...).groupBy(...)  # lifecycle §3.2

Session setup (the reference's ``set search_path``, SQLQueries.sql:7) is
the constructor: every driver table is registered as a temp view once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bigdatacw1_spark.session import get_spark
from bigdatacw1_spark.sources.catalog import DEFAULT_SF_DIR, TABLES, register_views


class Engine:
    """One engine, two dialects, one catalog."""

    def __init__(
        self,
        spark: SparkSession | None = None,
        sf_dir: str = DEFAULT_SF_DIR,
    ) -> None:
        self.spark = spark or get_spark()
        self.sf_dir = sf_dir
        register_views(self.spark, sf_dir)

    def sql(self, query: str) -> DataFrame:
        """SQL front end: parse/analyze/optimize via Catalyst against the
        registered views (reference lifecycle §3.1)."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        """Pipeline front end: start a DataFrame chain from a catalog
        table (reference lifecycle §3.2 — Mongo-stage-style chaining)."""
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
        return self.spark.table(name)

    def tables(self) -> list[str]:
        return sorted(TABLES)
