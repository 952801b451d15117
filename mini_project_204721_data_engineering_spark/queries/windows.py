"""Event-time window queries (batch form of the streaming surface).

Each is the batch-executable equivalent of a streaming operator in
:mod:`mini_project_204721_data_engineering_spark.streaming.events` — same window semantics,
DuckDB-oracle-checkable.  Window starts are emitted as formatted strings
(timestamp wire formats differ between engines; strings don't).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mini_project_204721_data_engineering_spark.catalog import load_table

__all__ = ["QUERIES", "ORACLES"]

_FMT = "yyyy-MM-dd HH:mm:ss"


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via Spark's window() — count + value sum."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("value_sum"))
        .select(
            F.date_format(F.col("window.start"), _FMT).alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS value_sum
FROM events
GROUP BY 1, 2
"""


def events_tumbling_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute tumbling windows (epoch-aligned, same as streaming)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("window.start"), _FMT).alias("window_start"),
            "n",
        )
    )


EVENTS_TUMBLING_15M_SQL = """
SELECT strftime(to_timestamp((epoch_us(ts) // (900 * 1000000)) * 900),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n
FROM events
GROUP BY 1
"""


def events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min silence closes a session), the
    window-function form: lag → new-session flag → running sum as session
    id → per-session aggregate.  Same result as streaming session_window
    on closed sessions."""
    ev = load_table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = 30 * 60 * 1_000_000
    # timestamp_diff works on TIMESTAMP and TIMESTAMP_NTZ alike; unix_micros
    # rejects NTZ, which is what parquet TIMESTAMP(isAdjustedToUTC=false)
    # columns resolve to under Spark's inferTimestampNTZ default
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.timestamp_diff("MICROSECOND", F.lag("ts").over(w_user), F.col("ts")) > gap_us,
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    ).withColumn("sess_id", F.sum("new_sess").over(w_user))
    return (
        flagged.groupBy("user_id", "sess_id")
        .agg(
            F.date_format(F.min("ts"), _FMT).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            (F.timestamp_diff("MICROSECOND", F.min("ts"), F.max("ts")) / 1_000_000.0).alias(
                "duration_sec"
            ),
        )
        .select("user_id", "sess_id", "session_start", "n_events", "duration_sec")
    )


EVENTS_SESSIONS_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT user_id, ts, new_sess,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
)
SELECT user_id,
       CAST(sess_id AS BIGINT) AS sess_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events,
       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS duration_sec
FROM sess
GROUP BY user_id, sess_id
"""


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 15 min slide): every event lands in 4
    windows — Spark's window() with a slide duration."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("window.start"), _FMT).alias("window_start"),
            "event_type",
            "n",
        )
    )


# oracle: the 4 slide-aligned window starts containing each event are
# base - k·900s for k = 0..3 where base is the event's 15-min bucket
EVENTS_SLIDING_SQL = """
SELECT strftime(to_timestamp(((epoch_us(ts) // (900 * 1000000)) - k.k) * 900),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n
FROM events CROSS JOIN (SELECT * FROM range(4) t(k)) k
GROUP BY 1, 2
"""


def salted_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 via two-phase salted aggregation (operators/skew.py): identical
    result to the direct groupBy — the oracle proves the salting is
    semantics-preserving.  The factor comes from the measured key-skew
    profile (``recommend_salt``: one count-per-group diagnostic + a
    1-row collect), closing the measure→act loop: uniform keys
    degenerate to the plain two-phase grouping, a planted hot key gets
    exactly the split its reducer overload implies."""
    from mini_project_204721_data_engineering_spark.operators.skew import (
        recommend_salt,
        salted_agg,
    )

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id", "event_type", "event_id"
    )
    keys = ["day", "user_id", "event_type"]
    return salted_agg(
        ev,
        keys=keys,
        salt_from="event_id",
        partials={"count_of_disasters": (F.count(F.lit(1)), F.sum("count_of_disasters"))},
        n_salts=recommend_salt(ev, keys),
    )


SALTED_COUNTS_SQL = """
SELECT CAST(ts AS DATE) AS day, user_id, event_type,
       count(*) AS count_of_disasters
FROM events
GROUP BY 1, 2, 3
"""


def daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function analytics (extension — the reference has NO window
    functions, SURVEY §2.5): per-type daily counts with day-over-day delta
    (lag) and a 7-row moving average.  The window partitions by event_type,
    so at scale each type's series sorts independently after one shuffle —
    no global sort."""
    ev = load_table(spark, sf_dir, "events")
    day = (
        ev.groupBy(F.col("event_type"), F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    w7 = w.rowsBetween(-6, 0)
    return day.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n",
        (F.col("n") - F.lag("n").over(w)).alias("delta"),
        F.round(F.avg("n").over(w7), 4).alias("ma7"),
    )


DAILY_ACTIVITY_SQL = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS day,
       n,
       n - lag(n) OVER w AS delta,
       round(avg(n) OVER (w ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
FROM d
WINDOW w AS (PARTITION BY event_type ORDER BY day)
"""


#: keyset-pagination cursor (last seen sort key) — deep pages at 100 TB
#: filter on the cursor instead of scanning `offset` rows (SCALE.md)
KEYSET_CURSOR = "2024-01-20 00:00:00"


def list_events_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 at scale: keyset pagination — the page after a cursor is a
    pushed-down range filter + top-k, never an offset scan.  The filter
    reaches the parquet scan (partition pruning on a date-partitioned
    fact); the sort compiles to TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") > F.lit(KEYSET_CURSOR).cast("timestamp"))
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .limit(100)
        .select(
            "event_id",
            F.date_format("ts", _FMT).alias("ts"),
            "user_id",
            "event_type",
        )
    )


LIST_EVENTS_KEYSET_SQL = f"""
SELECT event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       user_id, event_type
FROM events
WHERE ts > TIMESTAMP '{KEYSET_CURSOR}'
ORDER BY ts, event_id
LIMIT 100
"""


def events_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade (operators/rollup.py): raw → hourly
    rollup → daily reaggregation.  The oracle computes daily DIRECTLY from
    raw events — matching proves the cascade is exact, which is what lets
    a 100 TB store serve daily/weekly views from the hourly rollup
    without rescanning raw data."""
    from mini_project_204721_data_engineering_spark.operators.rollup import reaggregate, rollup_time

    ev = load_table(spark, sf_dir, "events")
    hourly = rollup_time(ev, "ts", "value", ["event_type"], "hour")
    daily = reaggregate(hourly, ["event_type"], "day")
    return daily.select(
        F.date_format("bucket", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        F.round("value_sum", 4).alias("value_sum"),
    )


EVENTS_ROLLUP_DAILY_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       event_type,
       count(*) AS n,
       round(sum(value), 4) AS value_sum
FROM events
GROUP BY 1, 2
"""


def type_user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-user count per event type.  (The scale path swaps in
    ``approx_count_distinct`` — one pass, fixed memory, no expand —
    asserted within 5% by tests/test_operators.py.)"""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


TYPE_USER_CARDINALITY_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


#: histogram-percentile demo bounds (events.value is bounded well below)
HIST_LO, HIST_HI, HIST_BINS = 0.0, 1000.0, 200


def value_p95_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p95 per (month, event_type) served from the mergeable histogram
    rollup (operators/rollup.py::rollup_histogram → estimate_percentile):
    daily bin counts → monthly reaggregation → cumulative walk.  The
    oracle recomputes the identical bin arithmetic from raw rows — what
    it checks is that the cascade+walk is exactly the bin math it
    claims, on top of the pytest guarantee that the bin contains the
    type-1 quantile."""
    from mini_project_204721_data_engineering_spark.operators.rollup import (
        estimate_percentile,
        reaggregate_histogram,
        rollup_histogram,
    )

    ev = load_table(spark, sf_dir, "events")
    daily = rollup_histogram(
        ev, "ts", "value", ["event_type"], "day", HIST_LO, HIST_HI, HIST_BINS
    )
    monthly = reaggregate_histogram(daily, ["event_type"], "month")
    est = estimate_percentile(
        monthly, ["event_type"], 0.95, HIST_LO, HIST_HI, HIST_BINS
    )
    return est.select(
        F.date_format("bucket", "yyyy-MM").alias("month"),
        "event_type",
        "p95_est",
    )


_HIST_W = (HIST_HI - HIST_LO) / HIST_BINS
VALUE_P95_HISTOGRAM_SQL = f"""
WITH b AS (
  SELECT strftime(date_trunc('month', ts), '%Y-%m') AS month, event_type,
         CASE WHEN value < {HIST_LO} THEN 0
              WHEN value >= {HIST_HI} THEN {HIST_BINS + 1}
              ELSE CAST(floor((value - {HIST_LO}) / {_HIST_W}) AS BIGINT) + 1 END AS bin,
         count(*) AS n
  FROM events GROUP BY ALL
), c AS (
  SELECT month, event_type, bin, n,
         sum(n) OVER (PARTITION BY month, event_type ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(n) OVER (PARTITION BY month, event_type) AS total
  FROM b
)
SELECT month, event_type,
       CASE WHEN min(bin) <= {HIST_BINS}
            THEN {HIST_LO} + min(bin) * {_HIST_W} END AS p95_est
FROM c WHERE cum >= total * 0.95
GROUP BY month, event_type
"""


def user_rolling_1h_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour RANGE window per user
    (operators/aggregates.py::rolling_time_agg): for every event, the
    user's spend and event count over the preceding hour INCLUDING the
    event — row-anchored frames that tumbling/sliding buckets cannot
    express.  One user-keyed shuffle; Spark's running-frame window
    never rescans the hour per row.  The range key is
    ``unix_micros(ts)`` — exact integer microseconds, so the frame
    boundary agrees bit-for-bit with DuckDB's ``RANGE BETWEEN INTERVAL
    1 HOUR PRECEDING`` at the timestamp's native resolution; sums
    round portably."""
    from mini_project_204721_data_engineering_spark.functions.parity import portable_round
    from mini_project_204721_data_engineering_spark.operators.aggregates import rolling_time_agg

    ev = load_table(spark, sf_dir, "events")
    out = rolling_time_agg(
        ev,
        ["user_id"],
        "ts",
        3600.0,
        {"spend_1h": F.sum("value"), "n_events_1h": F.count(F.lit(1))},
    )
    return out.select(
        "event_id",
        "user_id",
        portable_round(F.col("spend_1h"), 2).alias("spend_1h"),
        "n_events_1h",
    )


USER_ROLLING_1H_SPEND_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER w * 100) / 100 AS spend_1h,
       CAST(count(*) OVER w AS BIGINT) AS n_events_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def sensor_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap repair by linear interpolation
    (operators/temporal.py::interpolate_linear): treat non-purchase
    events as sensor dropouts (value → NULL) and repair each gap with
    the time-weighted straight line between the user's surrounding
    purchases; leading/trailing gaps stay NULL (no extrapolation).
    Two running IGNORE-NULLS window passes over one keyed sort — no
    self-join, cost ∝ rows not gap length.  The same expression tree
    is evaluated on identical doubles in DuckDB, so values match to
    the last ulp; rounding is belt-and-braces."""
    from mini_project_204721_data_engineering_spark.functions.parity import portable_round
    from mini_project_204721_data_engineering_spark.operators.temporal import interpolate_linear

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("v"),
    )
    out = interpolate_linear(
        ev, ["user_id"], "ts", "v", out_col="v_filled",
        tiebreak_cols=["event_id"],
    )
    return out.select(
        "event_id", "user_id", portable_round(F.col("v_filled"), 4).alias("v_filled")
    )


SENSOR_INTERPOLATE_SQL = """
WITH base AS (
  SELECT event_id, user_id, ts,
         CASE WHEN event_type = 'purchase' THEN value END AS v,
         CAST(epoch_us(ts) AS DOUBLE) AS t
  FROM events
), w AS (
  SELECT event_id, user_id, v, t,
    last_value(v IGNORE NULLS) OVER wb AS prev_v,
    first_value(v IGNORE NULLS) OVER wf AS next_v,
    last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
      OVER wb AS prev_t,
    first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
      OVER wf AS next_t
  FROM base
  WINDOW wb AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
       round((CASE WHEN v IS NOT NULL THEN v
                   WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                        AND next_t > prev_t
                   THEN prev_v + (next_v - prev_v) * (t - prev_t)
                        / (next_t - prev_t) END) * 10000.0) / 10000.0
         AS v_filled
FROM w
"""


QUERIES = {
    "events_hourly": events_hourly,
    "daily_activity": daily_activity,
    "list_events_keyset": list_events_keyset,
    "events_rollup_daily": events_rollup_daily,
    "type_user_cardinality": type_user_cardinality,
    "events_tumbling_15m": events_tumbling_15m,
    "events_sessions": events_sessions,
    "events_sliding": events_sliding,
    "salted_counts": salted_counts,
}

def theta_window_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed distinct-user ESTIMATES from a theta sample
    (operators/theta.py): per 6-hour tumbling window, the estimated
    distinct users from the deterministic θ=0.5 md5 sample — the
    streaming-friendly form of windowed COUNT(DISTINCT): the θ-filter
    runs BEFORE any dedup state, so a streaming twin (filter →
    dropDuplicates → window count) carries θ-scaled state instead of
    every user id.  Deterministic, so the oracle value-checks the
    estimates themselves."""
    from mini_project_204721_data_engineering_spark.operators.theta import theta_distinct_by

    ev = load_table(spark, sf_dir, "events")
    win = ev.select(
        F.date_format(F.window("ts", "6 hours").start, _FMT).alias("window_start"),
        "user_id",
    )
    out = theta_distinct_by(win, ["window_start"], ["user_id"], 0.5)
    return out.select(
        "window_start", "kept", F.col("est_distinct").alias("est_users")
    )


THETA_WINDOW_USERS_SQL = """
WITH kept AS (
  SELECT DISTINCT
         strftime(to_timestamp((epoch_us(ts) // (21600::BIGINT * 1000000)) * 21600),
                  '%Y-%m-%d %H:%M:%S') AS window_start,
         user_id
  FROM events
  WHERE substring(md5('theta|' || CAST(user_id AS VARCHAR)), 1, 4) < '8000'
)
SELECT window_start,
       count(*) AS kept,
       count(*) / 0.5 AS est_users
FROM kept GROUP BY window_start
"""


def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT-user count by day — the classic rewrite: a
    naive per-day distinct-so-far is quadratic (re-scan history every
    day); counting each user on their FIRST day turns it into one
    groupBy + a running SUM over the tiny day series.  The final
    window is day-cardinality-sized (≤ a few thousand rows at any
    fact scale), documented single-partition by construction."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("d"))
    daily = first.groupBy("d").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


CUMULATIVE_UNIQUE_USERS_SQL = """
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id
), n AS (
  SELECT d, count(*) AS new_users FROM f GROUP BY d
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       new_users,
       CAST(sum(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_users
FROM n
"""


EXTRA_QUERIES = {
    "cumulative_unique_users": cumulative_unique_users,
    "theta_window_users": theta_window_users,
    "value_p95_histogram": value_p95_histogram,
    "user_rolling_1h_spend": user_rolling_1h_spend,
    "sensor_interpolate": sensor_interpolate,
}
EXTRA_ORACLES = {
    "cumulative_unique_users": CUMULATIVE_UNIQUE_USERS_SQL,
    "theta_window_users": THETA_WINDOW_USERS_SQL,
    "value_p95_histogram": VALUE_P95_HISTOGRAM_SQL,
    "user_rolling_1h_spend": USER_ROLLING_1H_SPEND_SQL,
    "sensor_interpolate": SENSOR_INTERPOLATE_SQL,
}

ORACLES = {
    "events_hourly": EVENTS_HOURLY_SQL,
    "daily_activity": DAILY_ACTIVITY_SQL,
    "list_events_keyset": LIST_EVENTS_KEYSET_SQL,
    "events_rollup_daily": EVENTS_ROLLUP_DAILY_SQL,
    "type_user_cardinality": TYPE_USER_CARDINALITY_SQL,
    "events_tumbling_15m": EVENTS_TUMBLING_15M_SQL,
    "events_sessions": EVENTS_SESSIONS_SQL,
    "events_sliding": EVENTS_SLIDING_SQL,
    "salted_counts": SALTED_COUNTS_SQL,
}
