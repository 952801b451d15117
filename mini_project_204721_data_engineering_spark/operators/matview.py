"""Materialized aggregate views over the snapshot log — the capstone
that ties the round-9 pieces into one serving primitive:

    source snapshot table ──incremental read──▶ maintain_aggregate
                                                      │
                        view snapshot table ◀──atomic overwrite
                        (cursor rides the view's own manifest)

The reference refreshes its serving aggregates by re-reading the whole
fact table per ingest; this refreshes from the APPENDED DELTA only
(``snapshot_incremental_read`` + ``operators/incremental``), and the
consumed-source-version cursor is committed ATOMICALLY with the view
data itself (a ``txn`` entry on the view table's manifest) — so a
replayed or crashed-and-retried refresh is exactly-once by the same
mechanism as the streaming sink: state and cursor can never disagree
because they are one commit.

Non-append source windows (a delete/merge/compact rewrote files) can't
be consumed as a file delta; refresh detects that and falls back to a
full rebuild — correct always, incremental when possible.

Single-refresher discipline per view (the normal arrangement for view
maintenance); CONCURRENT refreshers are safe against replay (the
cursor makes the second a no-op) but may waste work racing overwrites.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

from mini_project_204721_data_engineering_spark.operators.incremental import (
    Measure,
    base_aggregate,
    maintain_aggregate,
)
from mini_project_204721_data_engineering_spark.sources import snapshots as snap

__all__ = ["refresh_aggregate_view"]

_CURSOR_APP = "matview-src"


def _view_cursor(spark: SparkSession, view_dir: str) -> tuple[int | None, str | None]:
    """(consumed source version, consumed source table_id) from the
    view's tip — both ride the same manifest the state does."""
    versions = snap._list_versions(spark, view_dir)
    if not versions:
        return None, None
    tip = snap._read_manifest(spark, view_dir, versions[-1])
    return tip.get("txn", {}).get(_CURSOR_APP), tip.get("meta", {}).get("src_table_id")


def _commit_view(
    df: DataFrame, view_dir: str, src_version: int, src_table_id: str | None
) -> dict:
    """Overwrite the view table with the new state AND the source-cursor
    (version + source table identity) in one atomic manifest — state
    and cursor cannot diverge."""
    spark = df.sparkSession
    new_files, _ = snap._write_data_files(df, view_dir)
    return snap._commit(
        spark, view_dir, "overwrite",
        lambda parent: list(new_files),
        df.schema.simpleString(),
        meta={"added_files": len(new_files), "src_version": src_version,
              "src_table_id": src_table_id},
        txn_update={_CURSOR_APP: src_version},
    )


def refresh_aggregate_view(
    spark: SparkSession,
    source_dir: str,
    view_dir: str,
    keys: Sequence[str],
    measures: Mapping[str, Measure],
    count_col: str = "n",
) -> dict | None:
    """Bring the aggregate view at ``view_dir`` up to the source table's
    tip.  First call builds it fully; later calls consume only the rows
    APPENDED since the recorded cursor (feed of inserts through
    ``maintain_aggregate``); a non-append source window (files were
    rewritten by delete/merge/compact) falls back to a full rebuild.
    Returns the view's new manifest, or None when already current —
    replaying a refresh is a no-op, not a double-count."""
    src_versions = snap._list_versions(spark, source_dir)
    if not src_versions:
        raise ValueError(f"no snapshots at source {source_dir}")
    src_tip = src_versions[-1]
    src_tip_manifest = snap._read_manifest(spark, source_dir, src_tip)
    src_table_id = src_tip_manifest.get("table_id")
    cursor, seen_table_id = _view_cursor(spark, view_dir)

    def rebuild() -> dict:
        full = base_aggregate(
            snap.read_snapshot(spark, source_dir, version=src_tip),
            keys, measures, count_col,
        )
        return _commit_view(full, view_dir, src_tip, src_table_id)

    if cursor is None:
        return rebuild()
    if seen_table_id != src_table_id:
        # the source log was RECREATED (different table identity) — a
        # version-only comparison can't see this once the new log has
        # grown past the cursor; the file delta would be bogus
        return rebuild()
    if cursor == src_tip:
        return None  # already current
    if cursor > src_tip:
        # same table identity but the log truncated below the cursor
        return rebuild()

    try:
        delta, new_v = snap.snapshot_incremental_read(spark, source_dir, cursor)
    except ValueError:
        # non-append window or expired cursor: rebuild from the tip
        return rebuild()
    if delta is None:
        return None

    from pyspark.sql import functions as F

    row = F.struct(*[F.col(c) for c in delta.columns])
    feed = delta.select(
        F.lit("insert").alias("op"),
        F.when(F.lit(False), row).alias("before"),
        row.alias("after"),
    )
    state = snap.read_snapshot(spark, view_dir)
    new_state = maintain_aggregate(state, feed, keys, measures, count_col)
    return _commit_view(new_state, view_dir, new_v, src_table_id)
