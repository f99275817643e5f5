"""Physical-plan inspection helpers (the '.explain and iterate' loop).

The scale contract in SURVEY.md §4/§7.4.6 is enforceable, not
aspirational: these helpers read the formatted physical plan so tests
can assert that dims broadcast, predicates reach the parquet scan,
top-k never globally sorts, and no row-at-a-time Python sneaks into a
hot path. tests/test_plans.py applies them to the headline queries.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string (explain('formatted'))."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_take_ordered(df: DataFrame) -> bool:
    """True when sort+limit fused into TakeOrderedAndProject (no global sort)."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def has_python_eval(df: DataFrame) -> bool:
    """True when the plan contains row-at-a-time Python (BatchEvalPython)
    or Arrow-batched Python (ArrowEvalPython / MapInPandas / FlatMapGroups
    variants). Reference-parity queries must return False; extension
    operators may use the Arrow forms deliberately."""
    plan = formatted_plan(df)
    return bool(
        re.search(r"BatchEvalPython|ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters lists that reached a parquet scan."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees; wider/fewer is better."""
    return len(set(re.findall(r"\*\((\d+)\)", formatted_plan(df))))
