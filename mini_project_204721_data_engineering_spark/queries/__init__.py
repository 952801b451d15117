"""Query corpus: every SURVEY §2 operator as a named (spark_fn, oracle_sql) pair.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (ANSI SQL for the DuckDB
correctness oracle; keys without an oracle get a rows-only check).

Oracle-parity rules used throughout (see tests/test_oracle_parity.py):
- every computed column is aliased identically in Spark and SQL
- aggregated doubles are rounded (sum→2dp, ratios/means→4dp) on BOTH sides
  because distributed partial aggregation sums in a different order than
  DuckDB's single-threaded fold
- timestamps are cast to DATE or formatted to strings at the output edge
- every ORDER BY used for pagination carries a unique tiebreaker
"""

from mini_project_204721_data_engineering_spark.queries import (
    serving,
    analytics,
    dashboard,
    llm_queries,
    windows,
    cleaning,
)

_MODULES = [serving, analytics, dashboard, llm_queries, windows, cleaning]


def all_queries():
    out = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
