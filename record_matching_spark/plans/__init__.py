from record_matching_spark.plans.audit import plan_audit  # noqa: F401
