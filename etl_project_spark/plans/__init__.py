from etl_project_spark.plans.audit import (
    PlanStats,
    assert_scalable,
    explain_formatted,
    plan_stats,
)

__all__ = ["PlanStats", "assert_scalable", "explain_formatted", "plan_stats"]
