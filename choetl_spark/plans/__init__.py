"""Plan inspection helpers: assert the physical plan is the one we want
(broadcasts actually broadcast, filters actually pushed, codegen spans
wide). Used by the perf-guard tests so plan regressions fail CI, not
production."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def assert_broadcast_join(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, (
        "expected a broadcast join in:\n" + plan
    )


def assert_no_cartesian(df: DataFrame) -> None:
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, "cartesian product in:\n" + plan


def assert_pushed_filters(df: DataFrame, fragment: str) -> None:
    """Check a predicate reached the scan (PushedFilters in the plan)."""
    plan = explain_str(df)
    assert "PushedFilters" in plan and fragment in plan, (
        f"filter '{fragment}' not pushed in:\n" + plan
    )


def assert_wholestage_codegen(df: DataFrame) -> None:
    # "codegen" mode reports subtrees even while an AQE plan is not yet
    # final (the "simple" plan hides the *(N) markers until then)
    plan = explain_str(df, mode="codegen")
    assert "WholeStageCodegen subtrees" in plan and "Found 0" not in plan, (
        "no codegen span in:\n" + plan[:2000]
    )
