"""Distributed operator library (SURVEY §2.2-§2.7)."""

from mini_project_204721_data_engineering_spark.operators.query_builder import ListQuery, Page
from mini_project_204721_data_engineering_spark.operators.joins import (
    anti_join,
    semi_join,
    idempotent_append,
)
from mini_project_204721_data_engineering_spark.operators.aggregates import weighted_mean
from mini_project_204721_data_engineering_spark.operators.dedup import dedup_keep_first, dedup_keep_first_agg

__all__ = [
    "ListQuery",
    "Page",
    "anti_join",
    "semi_join",
    "idempotent_append",
    "weighted_mean",
    "dedup_keep_first",
    "dedup_keep_first_agg",
]
