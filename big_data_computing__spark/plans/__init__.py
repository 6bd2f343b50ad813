"""Plan inspection utilities (see tools/plan_report.py and
tests/test_plans.py for the enforced plan-quality contract)."""

from .explain import executed_plan, explain_formatted  # noqa: F401
