"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship dashboard-probability query on sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 as
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the matching DuckDB
SQL (keys without SQL get the weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mini_project_204721_data_engineering_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (J11 4-way join + C16 probability) on sf0.001."""
    from mini_project_204721_data_engineering_spark.queries.dashboard import dashboard_probability

    return dashboard_probability(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each query (same column aliases)."""
    return _q.all_oracles()
