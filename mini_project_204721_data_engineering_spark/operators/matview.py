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

Non-append source windows exploit CoW file confinement
(``snapshot_file_changes``): a delete/merge/replace-where window feeds
``maintain_aggregate`` with delete(removed-file rows) +
insert(added-file rows) — correct for ANY op mix because contributions
are additive and carried files are byte-identical — so refresh cost is
∝ the files the window rewrote plus view size, never source size.  A
window whose only ops are compaction is data-identical and advances
the cursor with a metadata-only commit (no bytes read).  Only a
schema-changing window (overwrite / non-additive evolution) or an
expired cursor manifest falls back to the full rebuild — correct
always, incremental whenever the log still has the evidence.

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
    df: DataFrame, view_dir: str, src_version: int, src_table_id: str | None,
    refresh_mode: str, files_read: int | None = None,
) -> dict:
    """Overwrite the view table with the new state AND the source-cursor
    (version + source table identity) in one atomic manifest — state
    and cursor cannot diverge.  ``refresh_mode`` / ``files_read`` land
    in the manifest meta as the observability record of what the
    refresh actually cost."""
    spark = df.sparkSession
    new_files, _ = snap._write_data_files(df, view_dir)
    meta = {"added_files": len(new_files), "src_version": src_version,
            "src_table_id": src_table_id, "refresh_mode": refresh_mode}
    if files_read is not None:
        meta["src_files_read"] = files_read
    return snap._commit(
        spark, view_dir, "overwrite",
        lambda parent: list(new_files),
        df.schema.simpleString(),
        meta=meta,
        txn_update={_CURSOR_APP: src_version},
    )


def _advance_cursor(
    spark: SparkSession, view_dir: str, src_version: int, src_table_id: str | None
) -> dict:
    """Metadata-only commit: re-reference the view's current files with
    an advanced source cursor — the data-identical-window (pure
    compaction) path; zero bytes move."""
    def files_fn(parent):
        if parent is None:
            raise RuntimeError("cursor advance on a view with no commits")
        return list(parent["files"])

    return snap._commit(
        spark, view_dir, "overwrite", files_fn,
        lambda parent: parent["schema"],
        meta={"added_files": 0, "src_version": src_version,
              "src_table_id": src_table_id, "refresh_mode": "cursor-advance",
              "src_files_read": 0},
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
    tip.  First call builds it fully; later calls consume only what the
    window actually changed:

    - append-only window → feed of inserts (appended rows only);
    - rewrite window (delete/merge/replace-where, any mix with appends)
      → file-confined CoW delta (:func:`..sources.snapshots.
      snapshot_file_changes`): delete(removed-file rows) +
      insert(added-file rows) through ``maintain_aggregate`` — cost ∝
      rewritten files + view size, never source size;
    - pure-compaction window → data-identical: cursor advances with a
      metadata-only commit, zero bytes read;
    - schema-changing window / recreated source / expired cursor
      manifest → full rebuild (correct always).

    Returns the view's new manifest, or None when already current —
    replaying a refresh is a no-op, not a double-count.  The manifest
    meta records ``refresh_mode`` and ``src_files_read`` so the cost
    class of every refresh is auditable after the fact."""
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
        return _commit_view(
            full, view_dir, src_tip, src_table_id, refresh_mode="full",
            files_read=len(src_tip_manifest["files"]),
        )

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

    from pyspark.sql import functions as F

    try:
        delta, new_v = snap.snapshot_incremental_read(spark, source_dir, cursor)
    except ValueError:
        return _confined_refresh(
            spark, source_dir, view_dir, keys, measures, count_col,
            cursor, src_tip, src_table_id, rebuild,
        )
    if delta is None:
        return None

    row = F.struct(*[F.col(c) for c in delta.columns])
    feed = delta.select(
        F.lit("insert").alias("op"),
        F.when(F.lit(False), row).alias("before"),
        row.alias("after"),
    )
    state = snap.read_snapshot(spark, view_dir)
    new_state = maintain_aggregate(state, feed, keys, measures, count_col)
    return _commit_view(
        new_state, view_dir, new_v, src_table_id, refresh_mode="delta-append",
        files_read=len(delta.inputFiles()),
    )


def _confined_refresh(
    spark: SparkSession,
    source_dir: str,
    view_dir: str,
    keys: Sequence[str],
    measures: Mapping[str, Measure],
    count_col: str,
    cursor: int,
    src_tip: int,
    src_table_id: str | None,
    rebuild,
) -> dict | None:
    """The non-append window path: consume the CoW file delta instead of
    rebuilding.  Additive maintenance needs no key discipline — every
    removed-file row retracts, every added-file row contributes, and
    carried files are byte-identical — so this is ≡ recompute for ANY
    window op mix at rewritten-files cost.  Falls back to ``rebuild``
    only when the evidence is gone (cursor manifest expired) or the
    schema changed across the window (before/after images would not
    union)."""
    from pyspark.sql import functions as F

    try:
        removed, added, info = snap.snapshot_file_changes(
            spark, source_dir, cursor, src_tip
        )
    except ValueError:
        # cursor manifest expired from the log: the file-confined
        # evidence is gone — rebuild is the honest answer.  ONLY the
        # expiry signal is caught; a programming error or FS fault must
        # surface, not silently demote every refresh to O(source)
        return rebuild()
    except Exception as e:
        # the TOCTOU form of the same signal: a concurrent
        # expire_snapshots deleted the manifest between the version
        # listing and the read — surfaces as a (Py4J-wrapped)
        # FileNotFoundException, which is still "evidence gone"
        if "FileNotFoundException" in str(e):
            return rebuild()
        raise
    if info["from_schema"] != info["to_schema"]:
        # overwrite / non-additive evolution in the window: the two
        # sides' row structs would not union into one feed
        return rebuild()
    if removed is None and added is None:
        # data-identical window (e.g. restore bouncing back): advance only
        return _advance_cursor(spark, view_dir, src_tip, src_table_id)
    if info["all_compact"]:
        # pure compaction re-binpacks identical rows — feeding them
        # through maintenance would net zero at rewritten-bytes cost;
        # skip the bytes outright (all_compact None = expired evidence:
        # fall through to the feed, which is correct regardless of ops)
        return _advance_cursor(spark, view_dir, src_tip, src_table_id)

    def feed_half(df: DataFrame, op: str) -> DataFrame:
        row = F.struct(*[F.col(c) for c in df.columns])
        img = {"delete": "before", "insert": "after"}[op]
        other = "after" if img == "before" else "before"
        sel = {
            img: row.alias(img),
            other: F.when(F.lit(False), row).alias(other),
        }
        return df.select(F.lit(op).alias("op"), sel["before"], sel["after"])

    halves = [
        feed_half(df, op)
        for df, op in ((removed, "delete"), (added, "insert"))
        if df is not None
    ]
    feed = halves[0] if len(halves) == 1 else halves[0].unionByName(halves[1])
    state = snap.read_snapshot(spark, view_dir)
    new_state = maintain_aggregate(state, feed, keys, measures, count_col)
    return _commit_view(
        new_state, view_dir, src_tip, src_table_id,
        refresh_mode="delta-confined",
        files_read=len(info["removed_files"]) + len(info["added_files"])
        + 2 * len(info.get("refiltered_files", [])),
    )
