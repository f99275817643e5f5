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

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

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

    def pipeline(
        self,
        table: str,
        stages: list[dict],
        collections: dict[str, DataFrame] | None = None,
    ) -> DataFrame:
        """Mongo aggregation-pipeline front end (the reference's NoSQL
        dialect, lifecycle §3.2): run a stage list against a catalog
        table via bigdatacw1_spark.pipeline.compile_pipeline. Every
        catalog table is implicitly available to $lookup/$unionWith/
        $graphLookup; pass ``collections`` to add or override frames.

            eng.pipeline("orders", [
                {"$match": {"o_totalprice": {"$gt": 100000}}},
                {"$group": {"_id": "$o_orderpriority", "n": {"$sum": 1}}},
            ])
        """
        from bigdatacw1_spark.pipeline import compile_pipeline

        colls: dict[str, DataFrame] = {t: self.spark.table(t) for t in TABLES}
        colls.update(collections or {})
        return compile_pipeline(self.table(table), stages, colls)

    def materialize(
        self, name: str, df: DataFrame | str, path: str, mode: str = "overwrite"
    ) -> DataFrame:
        """Materialized view over plain parquet: compute ``df`` (a frame
        or a SQL string), persist it at ``path``, and register the
        MATERIALIZATION — not the defining plan — as view ``name``, so
        later queries scan the stored result instead of recomputing
        (with parquet stats/pushdown, unlike an in-memory cache, and
        durable across sessions). Re-call to refresh; compose with
        sinks.upsert_partitions or the streaming continuous aggregate
        for incremental refresh of keyed rollups."""
        frame = self.sql(df) if isinstance(df, str) else df
        frame.write.mode(mode).parquet(path)
        out = self.spark.read.parquet(path)
        out.createOrReplaceTempView(name)
        return out

    def sql_script(
        self, script: str, tables: dict[str, DataFrame] | None = None
    ) -> list[DataFrame]:
        """psql-script front end (reference lifecycle §3.1, the FILE
        form): run a multi-statement SQL script VERBATIM against the
        registered catalog via bigdatacw1_spark.sqlfile.run_sql_script —
        quote/comment-aware splitting, ``set search_path`` honored as
        namespace binding. Returns one DataFrame per query statement.

            eng.sql_script(open("SQLQueries.sql").read())
        """
        from bigdatacw1_spark.sqlfile import run_sql_script

        return run_sql_script(self.spark, script, tables=tables)

    def run_query(self, name: str) -> DataFrame:
        """Run a registered engine query (queries/registry.py) against
        this engine's sf_dir."""
        from bigdatacw1_spark.queries import REGISTRY

        return REGISTRY[name].fn(self.spark, self.sf_dir)

    def explain(self, query: "str | DataFrame") -> str:
        """Formatted physical plan plus the scale-flag summary the plan
        gates check (broadcast joins, top-k fusion, pushed filters,
        Python eval, partition-less windows) — the '.explain and
        iterate' loop as one call. ``query`` is a registered query name
        or any DataFrame.

            print(eng.explain("tpch_q5_local_volume"))
        """
        from bigdatacw1_spark.plans import (
            count_global_windows,
            formatted_plan,
            has_broadcast_hash_join,
            has_python_eval,
            has_take_ordered,
            pushed_filters,
        )

        df = self.run_query(query) if isinstance(query, str) else query
        flags = []
        if has_broadcast_hash_join(df):
            flags.append("BHJ")
        if has_take_ordered(df):
            flags.append("TOP")
        if any(f.strip() for f in pushed_filters(df)):
            flags.append("PF")
        if has_python_eval(df):
            flags.append("PY")
        gw = count_global_windows(df)
        if gw:
            flags.append(f"GW×{gw}")
        header = f"flags: [{', '.join(flags) or '-'}]"
        return f"{header}\n{formatted_plan(df)}"

    def observe(
        self, df: DataFrame, watch: dict[str, "F.Column"] | None = None
    ) -> tuple[DataFrame, "Observation"]:
        """Attach runtime observability to a plan (pyspark Observation —
        public API): named aggregate metrics computed DURING the action
        that materializes ``df``, with zero extra passes over the data.
        The in-flight counters a production pipeline exports (rows
        emitted, null rate, value bounds) without paying a second scan
        or a cache.

        Returns (instrumented_df, observation); read
        ``observation.get`` AFTER an action has run. Default metrics:
        row count. Example::

            df, obs = eng.observe(eng.table("orders"),
                                  {"rows": F.count(F.lit(1)),
                                   "null_keys": F.count_if(F.col("o_custkey").isNull())})
            df.write.parquet(...)       # one action
            obs.get["rows"]             # metrics observed during that action
        """
        metrics = watch or {"rows": F.count(F.lit(1))}
        obs = Observation()
        instrumented = df.observe(
            obs, *[c.alias(n) for n, c in metrics.items()]
        )
        return instrumented, obs
