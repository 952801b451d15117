"""Stream-stream joins (§2.9 extension — the reference has no streaming
at all; this is the Structured Streaming surface a real-time enrichment
pipeline needs).

A stream-stream inner join buffers BOTH sides in state until the
watermark proves no more matches can arrive; without time bounds the
state grows without limit.  ``stream_interval_join`` is the bounded
form: an equi-key join where the right event must fall inside a time
interval ending at the left event's timestamp — "attach the user's
error within the 15 minutes before each click".  The interval condition
is what lets Spark evict state: a buffered right row is droppable once
the watermark passes ``right_ts + interval``.

Scale shape: one shuffle per side on the key, state bounded by
``rate × (watermark delay + interval)`` per side — the same state-bound
discipline as ``corpus.curate_stream_bounded``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stream_interval_join"]


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    interval: str = "15 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: rows pair when keys match and
    ``left_ts - interval <= right_ts <= left_ts``.

    ``how="inner"`` emits matches only; ``how="left_outer"`` is the
    enrichment-with-nulls variant — every left row appears, null-padded
    when no right row fell in its interval.  ``how="right_outer"``
    mirrors that for the right side, and ``how="full_outer"`` emits
    unmatched rows of BOTH sides (the audit shape: every click and
    every error accounted for exactly once).  Outer results need the
    WATERMARK to prove absence: Spark emits an unmatched row only once
    the watermark passes the last instant a matching partner could
    still arrive, so null-padded rows surface in a LATER micro-batch
    than their matches — the inherent latency of correct streaming
    outer joins, not a defect.

    Both inputs may be streaming (the canonical case) or batch — the
    SAME function computes the batch twin, so tests can assert
    stream ≡ batch on identical data.  Column names must be disjoint
    apart from ``key`` (rename upstream); the result carries all columns
    of both sides with ``key`` deduplicated.

    ``watermark`` bounds how late either side may arrive; state for a
    right row is held ~``watermark + interval``, the minimum that still
    guarantees complete results for data within the lateness bound.
    """
    if how not in ("inner", "left_outer", "right_outer", "full_outer"):
        raise ValueError(
            f"how must be inner/left_outer/right_outer/full_outer, got {how!r}"
        )
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = right.withWatermark(right_ts, watermark) if right.isStreaming else right
    r2 = rw.withColumnRenamed(key, "__rkey")
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(right_ts) >= F.col(left_ts) - F.expr(f"INTERVAL {interval}"))
        & (F.col(right_ts) <= F.col(left_ts))
    )
    joined = lw.join(r2, cond, how)
    if how in ("right_outer", "full_outer"):
        # an unmatched right row has a null key on the left side — keep
        # the key from whichever side is present, then drop the helper
        joined = joined.withColumn(key, F.coalesce(F.col(key), F.col("__rkey")))
    return joined.drop("__rkey")
