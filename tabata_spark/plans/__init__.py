from tabata_spark.plans.inspect import (
    assert_no_python_udf,
    explain_str,
    plan_counts,
    pushed_filters,
)

__all__ = ["assert_no_python_udf", "explain_str", "plan_counts", "pushed_filters"]
