"""Temporal state operators: collapse event streams into validity
intervals (the SCD2 / gaps-and-islands build primitive).

``state_intervals`` turns a keyed, timestamped state stream ("user 7
was in state A, then A again, then B") into one row per CONSECUTIVE
run of equal state with its validity window — the transformation that
builds slowly-changing-dimension (type 2) history from change events,
run-length-encodes sensor states, and feeds downtime/uptime reports.

Scale shape: two keyed window functions (lag + a running sum) over ONE
shuffle by key, then a groups-sized aggregate — the standard
gaps-and-islands plan; nothing global, nothing iterative.  Fully
deterministic given unique (key, ts) pairs, so the DuckDB oracle
mirrors it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["state_intervals", "pit_lookup", "interval_join", "event_chain", "interpolate_linear"]


def state_intervals(
    df: DataFrame,
    key: str,
    ts_col: str,
    state_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per consecutive same-state run per key:
    ``(key, state, valid_from, valid_to, n_events)`` — ``valid_from`` =
    the run's first event time, ``valid_to`` = the NEXT run's first
    event time (half-open intervals, the SCD2 convention), NULL for the
    current (open) run.

    Island detection: a run boundary is any row whose state differs
    from its predecessor (``lag``); a running count of boundaries
    numbers the islands, and each island aggregates to one interval.
    ``valid_to`` comes from ``lead`` over the aggregated intervals —
    cheaper than joining back to events.

    ``tiebreak``: extra ordering column for streams where (key, ts) is
    not unique — without it, tied timestamps make run boundaries
    order-dependent (pass the event id)."""
    order = [F.col("__ts").asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(key).orderBy(*order)
    cols = [key, F.col(ts_col).alias("__ts"), F.col(state_col).alias("__state")]
    if tiebreak:
        cols.append(F.col(tiebreak))
    marked = df.select(*cols).withColumn(
        "__new_run",
        F.when(
            F.lag("__state").over(w).isNull()
            | (F.lag("__state").over(w) != F.col("__state")),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = marked.withColumn("__run", F.sum("__new_run").over(w))
    intervals = runs.groupBy(key, "__run").agg(
        F.first("__state").alias(state_col),
        F.min("__ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wi = Window.partitionBy(key).orderBy(F.col("valid_from").asc())
    return intervals.select(
        key,
        state_col,
        "valid_from",
        F.lead("valid_from").over(wi).alias("valid_to"),
        "n_events",
    )


def pit_lookup(
    facts: DataFrame,
    intervals: DataFrame,
    key: str,
    fact_ts: str,
    state_col: str,
) -> DataFrame:
    """Point-in-time lookup — the CONSUME side of SCD2: attach to every
    fact the state whose validity interval contains ``fact_ts``.

    Because :func:`state_intervals` produces TILING half-open intervals
    per key (each ``valid_to`` = the next ``valid_from``), containment
    lookup reduces to an as-of join on ``valid_from`` alone: the latest
    interval starting at or before the fact time IS the containing one,
    and a fact at an exact boundary lands in the newer interval
    (half-open semantics fall out of the as-of tie rule).  Facts before
    the key's first interval get NULL.  Inherits the as-of join's
    union+keyed-window plan — one shuffle, one sort, no range join
    (operators/joins.py::asof_join)."""
    from mini_project_204721_data_engineering_spark.operators.joins import asof_join

    right = intervals.select(key, F.col("valid_from"), F.col(state_col))
    return asof_join(
        facts,
        right,
        on=[key],
        left_time=fact_ts,
        right_time="valid_from",
        payload=[state_col],
        payload_nonnull=True,
    )


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_col: str,
    end_col: str,
    bucket: float,
    on: list[str] | None = None,
    max_span_buckets: int = 10_000,
) -> DataFrame:
    """General interval CONTAINMENT join — every (fact, interval) pair
    with ``start <= ts < end`` (half-open), intervals MAY overlap and a
    fact may match many — the case :func:`pit_lookup` (tiling, single
    match) cannot express, and which a naive theta-join plans as a
    per-row range probe that explodes at scale (open-source Spark has
    no range-join optimization).

    The 1-D form of the radius join's grid trick: time buckets of width
    ``bucket``, each interval replicated to every bucket it spans, facts
    keyed to their single bucket, EQUI-join on (keys..., bucket), exact
    containment filter.  Candidates are bounded by per-bucket density;
    provision ``bucket`` near the typical interval length (an interval
    of length L replicates to ~L/bucket + 1 rows — spans longer than
    ``max_span_buckets`` buckets raise rather than silently exploding
    the replication; split such intervals or raise the bucket width).
    Inputs must be numeric (epoch seconds etc.) — cast timestamps
    upstream with ``timestamp_diff`` (NTZ-safe), mirroring DuckDB's
    ``epoch()``.  NULL ``end`` (open intervals) and INVERTED intervals
    (``end < start``) are rejected — cap open intervals to a horizon
    first (unbounded intervals have unbounded replication by
    construction), and fix inverted rows upstream (``sequence(b0, b1)``
    with b1 < b0 counts DOWN, silently replicating a malformed row to
    buckets it never covered).

    The contract check is IN the plan (``raise_error`` under a
    ``when()`` guarding the end column) — zero extra pass over the
    intervals table on clean input, surfacing at first execution of the
    join rather than eagerly at call time.  Every downstream use of the
    interval end (bucket sequence AND containment filter) goes through
    the guarded expression, so Catalyst's inferred-constraint pushdown
    (e.g. the ``IsNotNull`` it derives from ``ts < end``) evaluates the
    guard too instead of silently filtering the malformed row away."""
    on = list(on or [])
    raw_end = F.col(end_col)
    raw_start = F.col(start_col)
    b0 = F.floor(raw_start / F.lit(bucket)).cast("long")
    b1 = F.floor(raw_end / F.lit(bucket)).cast("long")
    bad = (
        raw_end.isNull()
        | (raw_end < raw_start)
        | ((b1 - b0 + 1) > F.lit(max_span_buckets))
    )
    msg = F.concat(
        F.lit("interval_join: open-ended interval, inverted interval, or "
              f"span exceeding max_span_buckets={max_span_buckets} (start="),
        F.coalesce(raw_start.cast("string"), F.lit("NULL")),
        F.lit(", end="),
        F.coalesce(raw_end.cast("string"), F.lit("NULL")),
        F.lit(") — cap open intervals to a horizon, fix end<start rows, "
              "and/or widen the bucket"),
    )
    iv = intervals.withColumn(
        "__end", F.when(bad, F.raise_error(msg)).otherwise(raw_end)
    )
    iv = iv.withColumn(
        "__bucket",
        F.explode(
            F.sequence(b0, F.floor(F.col("__end") / F.lit(bucket)).cast("long"))
        ),
    )
    f = facts.withColumn(
        "__bucket", F.floor(F.col(fact_ts) / F.lit(bucket)).cast("long")
    )
    return (
        f.join(iv, on + ["__bucket"])
        .filter(
            (F.col(fact_ts) >= F.col(start_col)) & (F.col(fact_ts) < F.col("__end"))
        )
        .drop("__bucket", "__end")
    )


def event_chain(
    events: DataFrame,
    types: list[str],
    within: str,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Earliest completion per key of the ordered event chain
    ``types[0] → types[1] → ...`` with EACH consecutive step within
    ``within`` (an as-of tolerance: ``"INTERVAL '2' HOUR"`` for
    timestamps, a numeric literal for numeric axes) — the k-step funnel
    with per-step deadlines (signup flows, checkout timeouts, incident
    escalation chains).

    Greedy-earliest is WRONG under deadlines (taking the first A can
    strand a B that a later A would have reached), so each stage joins
    BACKWARD instead: stage i keeps every type_i event whose latest
    QUALIFIED stage-(i−1) event lies within the deadline — monotone, so
    as-of's latest-match is exactly the right witness (if the latest
    qualified predecessor is too old, every earlier one is older).
    k−1 as-of joins (one shuffle+sort each, no range probe); each
    intermediate set is at most the type's event count.  Returns
    ``(key, completed_at)`` — the earliest final-stage timestamp whose
    full chain met every deadline."""
    from mini_project_204721_data_engineering_spark.operators.joins import asof_join

    if len(types) < 2:
        raise ValueError("event_chain needs at least two stage types")
    stage = (
        events.filter(F.col(type_col) == types[0])
        .select(key, F.col(ts_col).alias("__pt"))
    )
    for t in types[1:]:
        nxt = events.filter(F.col(type_col) == t).select(key, ts_col)
        joined = asof_join(
            nxt,
            stage.groupBy(key, "__pt").agg(F.lit(1).alias("__one")),
            on=[key],
            left_time=ts_col,
            right_time="__pt",
            payload=["__one"],
            payload_nonnull=True,
            tolerance=within,
        )
        stage = (
            joined.filter(F.col("__one").isNotNull())
            .select(key, F.col(ts_col).alias("__pt"))
        )
    return stage.groupBy(key).agg(F.min("__pt").alias("completed_at"))


def interpolate_linear(
    df: DataFrame,
    partition_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    out_col: str | None = None,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Linear interpolation of NULL gaps in a keyed time series: each
    NULL ``value_col`` becomes the straight-line value between the
    nearest non-NULL observations before and after it (time-weighted,
    at the timestamp's native microsecond resolution).  Leading and
    trailing gaps stay NULL — no extrapolation: inventing data outside
    the observed range is a policy decision the caller must make
    explicitly (coalesce with the nearest fill afterwards if wanted).
    Rows with equal timestamps cannot be interpolated between (zero
    time span) and also stay NULL rather than dividing by zero.

    The standard sensor-feed repair (the reference's rain grids carry
    exactly such gap structure after QC masking — ``F2``/``F8``
    null-dropping discards the row; this KEEPS the row and repairs the
    value).

    Scale shape: ONE keyed shuffle, then two running window passes
    (``last ignorenulls`` forward, ``first ignorenulls`` backward) over
    the same sort — no self-join, no per-gap work; cost is rows, not
    rows × gap length.  Mirrors DuckDB's ``IGNORE NULLS`` window
    semantics exactly (pinned by the ``sensor_interpolate`` EXTRA)."""
    from pyspark.sql.window import Window

    if not partition_cols:
        raise ValueError(
            "interpolate_linear needs >=1 partition column; a global "
            "series is a single-reducer plan — pre-bucket first"
        )
    out_col = out_col or value_col
    t = F.unix_micros(F.col(ts_col).cast("timestamp")).cast("double")
    v = F.col(value_col)
    # ROWS frames need a TOTAL order: pass tiebreak_cols (e.g. a unique
    # id) when timestamps can collide, or the running last/first is
    # permutation-dependent for the tied rows
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    back = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(back)
    next_v = F.first(v, ignorenulls=True).over(fwd)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(back)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(fwd)
    interp = prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t)
    filled = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(
            prev_v.isNotNull() & next_v.isNotNull() & (next_t > prev_t),
            interp,
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return df.withColumn(out_col, filled)
