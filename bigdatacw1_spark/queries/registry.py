"""Query registry: the driver-contract surface shared by all query modules.

Each module registers entries with the ``@q`` decorator; importing
``bigdatacw1_spark.queries`` (see its __init__) populates REGISTRY.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from bigdatacw1_spark.sources.catalog import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    headline: bool = False  # included in bench.py's timed set


REGISTRY: dict[str, QuerySpec] = {}


def q(name: str, oracle: str | None = None, headline: bool = False):
    def deco(fn):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn, oracle, headline)
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
