"""Physical-plan inspection helpers.

The engine's performance claims are plan-shape claims ("one exchange",
"filter pushed to the scan", "broadcast, not shuffle"); these helpers
make them assertable in tests (tests/test_plans.py) so a regression in
Catalyst usage fails CI instead of silently costing a shuffle at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The final (AQE-resolved where possible) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (excludes
    broadcast exchanges — those are the cheap kind)."""
    plan = executed_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def has_broadcast(df: DataFrame) -> bool:
    return "BroadcastExchange" in executed_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of the formatted scan node ('' if none)."""
    txt = formatted_plan(df)
    out = []
    for line in txt.splitlines():
        if "PushedFilters" in line:
            out.append(line.strip())
    return "\n".join(out)


def whole_stage_codegen_ids(df: DataFrame) -> int:
    """How many WholeStageCodegen spans the plan compiled."""
    plan = executed_plan(df)
    import re

    # appears as "WholeStageCodegen (1)" in tree dumps and as the "*(1)"
    # prefix in simple dumps
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    ids |= set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)
