"""Physical-plan introspection — the feedback loop behind "is this the plan
I'd want at 100 TB".

Used by tests/test_plans.py as PLAN-SHAPE REGRESSION TESTS: operators assert
not just their results but that filters reach the parquet scan
(PushedFilters), dimension joins broadcast, scans prune columns, and the
shuffle count stays fixed — so a refactor that silently de-optimizes a plan
fails CI even though results are still correct.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (empty strings dropped)."""
    plan = explain_formatted(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if m.group(1).strip():
            out.append(m.group(1))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings per scan — the column-pruning witness."""
    plan = explain_formatted(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_formatted(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (excluding broadcast exchanges) — the
    shuffle budget of the plan."""
    plan = explain_formatted(df)
    # count detail-section headers only ("(5) Exchange"); the tree section
    # repeats each operator and would double-count
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def has_whole_stage_codegen(df: DataFrame) -> bool:
    return "WholeStageCodegen" in df._jdf.queryExecution().executedPlan().toString()
