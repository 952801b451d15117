"""Physical-plan introspection and scale assertions."""

from mini_project_204721_data_engineering_spark.plans.checks import (
    physical_plan,
    has_pushed_filters,
    broadcast_join_count,
    has_take_ordered,
    shuffle_count,
    scan_columns,
)

__all__ = [
    "physical_plan",
    "has_pushed_filters",
    "broadcast_join_count",
    "has_take_ordered",
    "shuffle_count",
    "scan_columns",
]
