"""Plan inspection — the reference's repr/display visitor
(streamable/visitors/representation.py:29-149) maps to two things here:
the Stream's own logical-chain rendering (``str(stream)``) and Catalyst's
EXPLAIN (``stream.explain()``). Helpers below inspect physical plans for the
properties the 100 TB target cares about (pushdown, broadcast, codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def plan_has(df: DataFrame, needle: str, mode: str = "formatted") -> bool:
    """Assert-plan-shape helper: e.g. plan_has(df, 'PushedFilters'),
    plan_has(df, 'BroadcastHashJoin'), plan_has(df, 'WholeStageCodegen')."""
    return needle in physical_plan(df, mode)
