"""Plan rendering: lisp-style EXPLAIN (llamadb parity) + plan-shape
introspection helpers used by tests and bench."""

from llamadb_spark.plans.explain import formatted_plan, lisp_plan, plan_has

__all__ = ["lisp_plan", "formatted_plan", "plan_has"]
