"""Flagship dashboard query (reference ``GET /list_data_graph``,
``backend/app/main.py:682-731`` + ``estimateProbability``,
``frontend/app/page.tsx:66-83``).

The reference's shape: rain ⋈ₗ province ⋈ₗ district ⋈ₗ risk ⋈ₗ incidents,
with the **date predicate inside the incidents join condition** (not the
WHERE clause — preserving left-join semantics, ``main.py:709-710``), then a
per-district landslide-probability score.

Synthetic mapping: customer = district, nation = province,
orders-aggregate = rain fact, acctbal bins = risk level, error events =
incidents.  The probability formula C16 is promoted into the engine.

Scale notes: the per-key aggregates reduce the facts BEFORE the joins
(same dataflow-design choice the reference makes, SURVEY §4.1); nation is
broadcast; customer⋈aggregates co-partition on the key via one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mini_project_204721_data_engineering_spark.catalog import load_table
from mini_project_204721_data_engineering_spark.functions.binning import (
    estimate_probability,
    probability_color,
    risk_label,
)

__all__ = ["QUERIES", "ORACLES", "dashboard_probability"]

#: the dashboard's date slice (reference `date_filter`, main.py:710)
INCIDENT_DAY = "2024-01-15"


def dashboard_probability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11 4-way left join + C16 probability + C17 binning."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    events = load_table(spark, sf_dir, "events")

    # "rain" fact: mean order value per customer, scaled into a mm-like range.
    # Two float-parity rules at once: (1) keep the raw average for the
    # probability input — rounding first then halving manufactures .xxxx5
    # halfway values; (2) sum exact integer CENTS, not doubles — the 2-dp
    # prices are exact after round(x*100), so the long sum is
    # order-independent and both engines derive the identical double, like
    # the r2 decimal(18,2) sum but codegen-cheap (no per-row BigDecimal
    # aggregation buffer).  round() before the long cast is load-bearing:
    # Spark's double→long cast truncates while DuckDB's rounds, and the
    # double product of an exact-2dp price ×100 sits ~1e-9 off the integer
    # on either side.  Halfway cases can't occur (true cents are integers),
    # so Spark HALF_UP and DuckDB round agree bit-for-bit.
    rain = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("double")
            / F.lit(100.0)
            / F.count(F.lit(1))
            / F.lit(5000.0)
        ).alias("rain_raw")
    )
    # "risk" level: per-row deterministic bin of the account balance.
    # r15 optimization (guide §2.4): the oracle writes this as a LEFT JOIN
    # of customer to a customer-derived projection, but c_custkey is the
    # table's unique non-null key, so the self-join matches every spine
    # row exactly once and is row-for-row the inline expression — computing
    # it in the spine projection removes a second full customer scan and a
    # whole-table broadcast build (which past ~autoBroadcastJoinThreshold
    # would have become a sort-merge self-join at 100 TB).
    risk_level = (
        F.when(F.col("c_acctbal") < 2000.0, 1)
        .when(F.col("c_acctbal") < 6000.0, 2)
        .otherwise(3)
        .cast("int")
    )
    # "incidents": error events on the sliced day, counted per user
    incidents = (
        events.filter(F.col("event_type") == "error")
        .groupBy(
            F.col("user_id").cast("bigint").alias("i_custkey"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(F.count(F.lit(1)).alias("count_of_disasters"))
    )

    joined = (
        customer.select(
            "c_custkey",
            F.col("c_name").alias("district_name"),
            "c_nationkey",
            risk_level.alias("risk_level"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey, "left")
        .join(rain, "c_custkey", "left")
        # J11's signature: the date predicate lives IN the join condition
        .join(
            incidents,
            (F.col("c_custkey") == incidents.i_custkey)
            & (incidents.day == F.lit(INCIDENT_DAY).cast("date")),
            "left",
        )
    )
    # portable_round, not F.round: the decimal-sum averages land exactly on
    # 4-dp halfway points for ~1e-4 of customers, where Spark HALF_UP and
    # DuckDB scaled rounding disagree (functions/parity.py)
    from mini_project_204721_data_engineering_spark.functions.parity import portable_round

    prob = portable_round(
        estimate_probability(
            F.col("rain_raw"), F.col("risk_level"), F.col("count_of_disasters")
        ),
        4,
    )
    return joined.select(
        F.col("c_custkey").alias("district_id"),
        F.col("district_name"),
        F.col("n_name").alias("province_name"),
        portable_round(F.coalesce(F.col("rain_raw"), F.lit(0.0)), 4).alias("rain_mm_wmean"),
        F.coalesce(F.col("risk_level"), F.lit(0)).alias("risk_level"),
        F.coalesce(F.col("count_of_disasters"), F.lit(0)).alias("count_of_disasters"),
        prob.alias("probability"),
        probability_color(prob).alias("prob_color"),
        risk_label(F.col("risk_level")).alias("risk_label_en"),
    )


DASHBOARD_PROBABILITY_SQL = f"""
WITH rain AS (
  SELECT o_custkey AS c_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
           / 100.0 / count(*) / 5000.0 AS rain_raw
  FROM orders GROUP BY o_custkey
), risk AS (
  SELECT c_custkey,
         CAST(CASE WHEN c_acctbal < 2000.0 THEN 1
                   WHEN c_acctbal < 6000.0 THEN 2
                   ELSE 3 END AS INT) AS risk_level
  FROM customer
), incidents AS (
  SELECT user_id AS c_custkey, CAST(ts AS DATE) AS day, count(*) AS count_of_disasters
  FROM events WHERE event_type = 'error'
  GROUP BY 1, 2
), joined AS (
  SELECT c.c_custkey AS district_id,
         c.c_name AS district_name,
         n.n_name AS province_name,
         round(coalesce(r.rain_raw, 0.0) * 10000.0) / 10000.0 AS rain_mm_wmean,
         coalesce(k.risk_level, 0) AS risk_level,
         coalesce(i.count_of_disasters, 0) AS count_of_disasters,
         round((CASE
           WHEN coalesce(i.count_of_disasters, 0) > 0 THEN
             least(100.0, greatest(80.0,
               coalesce(r.rain_raw, 0.0) / 2.0
               + coalesce(k.risk_level, 0) * 10.0
               + coalesce(i.count_of_disasters, 0) * 5.0))
           ELSE least(100.0,
               coalesce(r.rain_raw, 0.0) / 2.0
               + coalesce(k.risk_level, 0) * 10.0)
         END) * 10000.0) / 10000.0 AS probability
  FROM customer c
  LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
  LEFT JOIN rain r ON c.c_custkey = r.c_custkey
  LEFT JOIN risk k ON c.c_custkey = k.c_custkey
  LEFT JOIN incidents i
    ON c.c_custkey = i.c_custkey AND i.day = DATE '{INCIDENT_DAY}'
)
SELECT district_id, district_name, province_name,
       rain_mm_wmean, risk_level, count_of_disasters, probability,
       CASE WHEN probability >= 75 THEN 'red'
            WHEN probability >= 50 THEN 'amber'
            ELSE 'green' END AS prob_color,
       CASE WHEN risk_level = 1 THEN 'Low'
            WHEN risk_level = 2 THEN 'Medium'
            WHEN risk_level = 3 THEN 'High'
            ELSE 'Unknown' END AS risk_label_en
FROM joined
"""


QUERIES = {"dashboard_probability": dashboard_probability}
ORACLES = {"dashboard_probability": DASHBOARD_PROBABILITY_SQL}
