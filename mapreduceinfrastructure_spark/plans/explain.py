"""Physical-plan introspection: the feedback loop for scale tuning.

The reference has no optimizer to audit (SURVEY.md §4.1: the plan is
hardwired in Master::run).  Here the optimizer IS the engine, so the
repo treats plan properties — filter pushdown, column pruning,
broadcast joins, shuffle counts, whole-stage codegen — as testable
invariants: tests/test_plans.py asserts them so a regression that,
say, un-broadcasts a dim join or stops pruning parquet columns fails CI
before it costs anything at scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check)."""
    plan = formatted_plan(df)
    scans: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()}
        scans.append(cols)
    return scans


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange nodes (each is one shuffle).  Broadcast
    exchanges are excluded — they ship only the small side."""
    plan = formatted_plan(df)
    return len(re.findall(r"\(\d+\) Exchange\b", plan)) - len(
        re.findall(r"Arguments: SinglePartition", plan)
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Codegen spans; note AQE's pre-execution formatted plan elides
    WholeStageCodegen markers (isFinalPlan=false) — call after an action
    or with AQE off for a meaningful number."""
    return len(re.findall(r"WholeStageCodegen", formatted_plan(df)))
