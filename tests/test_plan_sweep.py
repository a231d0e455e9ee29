"""Mechanical anti-pattern sweep over EVERY registered query plan:
no CartesianProduct anywhere, and no row-at-a-time Python evaluation
(BatchEvalPython) — the zero-per-row-UDF rule enforced by plan
inspection rather than grep. Arrow kernels (MapInPandas /
ArrowEvalPython) are the sanctioned Python path."""

from __future__ import annotations

from tests.conftest import SF0001


def test_no_cartesian_or_row_python_in_any_registered_plan(spark):
    from text_extraction_evaluation_spark.plans.queries import SQL_CHECKED

    offenders: dict[str, list[str]] = {}
    for name, (fn, _sql) in sorted(SQL_CHECKED.items()):
        plan = (
            fn(spark, SF0001)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            bad.append("BatchEvalPython")
        if bad:
            offenders[name] = bad
    assert not offenders, f"anti-patterns in registered plans: {offenders}"
