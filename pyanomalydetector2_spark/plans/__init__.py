"""Plan-inspection helpers: assert the physical plan is the plan we want
(SURVEY §4 — pushdown, pruning, broadcast, codegen). Used by tests and the
bench to keep regressions visible."""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert the parquet scan received pushed filters mentioning each
    fragment (column name, usually)."""
    plan = explain_formatted(df)
    assert "PushedFilters" in plan, plan
    for frag in fragments:
        assert any(
            frag in line
            for line in plan.splitlines()
            if "PushedFilters" in line
        ), f"filter on {frag!r} not pushed:\n{plan}"


def assert_read_schema_only(df: DataFrame, *columns: str) -> None:
    """Assert the scan reads ONLY the given columns (column pruning)."""
    plan = explain_formatted(df)
    for line in plan.splitlines():
        if "ReadSchema" in line:
            schema = line.split("ReadSchema:")[1].strip()
            inner = schema[schema.index("<") + 1 : schema.rindex(">")]
            read_cols = {
                c.split(":")[0].strip() for c in inner.split(",") if c.strip()
            }
            assert read_cols <= set(columns), (
                f"scan reads {read_cols - set(columns)} beyond {columns}\n{plan}"
            )
            return
    raise AssertionError(f"no ReadSchema in plan:\n{plan}")


def assert_broadcast_join(df: DataFrame) -> None:
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan


def count_shuffles(df: DataFrame) -> int:
    return physical_plan(df).count("Exchange hashpartitioning")
