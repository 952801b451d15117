"""Structured-Streaming source FOR snapshot tables — `readStream` tails
the commit log as a CDC feed.

The batch-side cursor (:func:`~..sources.snapshots.snapshot_incremental_read`)
and change feed (:func:`~..sources.snapshots.snapshot_changes`) already
exist; this closes the loop with a real ``spark.readStream`` source
(PySpark 4's Python DataSource streaming API), so the existing streaming
operators — windowed aggregates, CDC apply, stateful processors — can
consume a snapshot table directly::

    from mini_project_204721_data_engineering_spark.streaming.snapshot_source import (
        SnapshotFeedDataSource,
    )
    spark.dataSource.register(SnapshotFeedDataSource)
    feed = (spark.readStream.format("snapshot_feed")
            .option("table_dir", path)
            .load())          # schema = table schema + _change_type,
                              #          _commit_version

Offsets ARE manifest versions, so the feed is replayable and
exactly-once under Structured Streaming's offset-log checkpoint: a
restarted query re-reads exactly the committed-version window it was
processing.  Each micro-batch spans the versions between two offsets,
and each version contributes its FILE DIFF:

- append            → added files emitted as ``insert`` rows
- CoW delete /      → removed files emitted as ``delete`` rows, added
  replace-where /      (survivor/new) files as ``insert`` rows — the
  merge / overwrite     net multiset applied downstream equals the
                        table state (Iceberg changelog semantics;
                        a rewritten-but-unchanged row appears as a
                        delete+insert pair, never as a lost update)
- compaction        → emits NOTHING (byte-identical rewrite; the cursor
                      metadata-advances — the same rule the matview
                      refresher proved)
- restore           → file diff of the rewind (delete+insert pairs)

Refused loudly (the stream query fails rather than silently corrupting
downstream state): schema-changing commits inside the window, and any
merge-on-read filter change (lazy delete / deletion vector) — a
zero-byte takedown changes visible rows with NO file diff, which a
file-diff feed cannot represent.  Tables must start filter-free
(drain via ``snapshot_apply_filters`` or use CoW deletes while a stream
is attached).

Scale: partitions are per (file, change_type) — at 100 TB each
micro-batch plans one partition per changed file, the same granularity
a parquet scan would use; executors read ONLY changed files with
pyarrow.  Row-group splitting and Arrow-batch yield are the known
next rungs; rows are currently yielded as tuples (correct first).

The manifest log is read with plain-Python I/O (the driver-side reader
has no SparkSession); paths are the ``file:`` scheme the local commit
path writes — object-store support would swap this IO layer.
"""

from __future__ import annotations

import json
import os
import re
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["SnapshotFeedDataSource", "snapshot_feed_schema"]

_V_RE = re.compile(r"^v(\d+)\.json$")


def _local(p: str) -> str:
    """file:-scheme manifest/data paths → local filesystem paths."""
    if p.startswith("file://"):
        return p[len("file:") :]
    if p.startswith("file:"):
        return p[len("file:") :]
    return p


def _versions(table_dir: str) -> list[int]:
    d = os.path.join(_local(table_dir), "_manifests")
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        m = _V_RE.match(name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _manifest(table_dir: str, version: int) -> dict:
    p = os.path.join(
        _local(table_dir), "_manifests", "v%010d.json" % version
    )
    with open(p, "rb") as f:
        return json.loads(f.read().decode("utf-8"))


def _filter_sig(manifest: dict | None, files: set) -> dict:
    """file → tuple of covering filter-entry identities, for exactly the
    given files (mirror of snapshots._filter_sig, dependency-free so the
    driver-side reader needs no Spark imports)."""
    out: dict = {}
    for e in (manifest or {}).get("row_filters", []):
        ident = e.get("predicate") or e.get("dv")
        for f in e.get("files", []):
            if f in files:
                out.setdefault(f, []).append(ident)
    return {f: tuple(sorted(v)) for f, v in out.items()}


def _parse_simple_string(s: str):
    """Parse a ``DataType.simpleString()`` spelling (what manifests pin)
    WITHOUT a SparkSession — the Python DataSource planner runs in a
    sessionless worker where ``_parse_datatype_string`` raises.  Covers
    the atomic types plus decimal/array/map/struct nesting; field names
    with ``:,<>`` in them are not representable in simpleString form to
    begin with."""
    from pyspark.sql import types as T

    atomic = {
        "boolean": T.BooleanType(),
        "tinyint": T.ByteType(),
        "smallint": T.ShortType(),
        "int": T.IntegerType(),
        "bigint": T.LongType(),
        "float": T.FloatType(),
        "double": T.DoubleType(),
        "string": T.StringType(),
        "binary": T.BinaryType(),
        "date": T.DateType(),
        "timestamp": T.TimestampType(),
        "timestamp_ntz": T.TimestampNTZType(),
        "void": T.NullType(),
    }

    def split_top(body: str) -> list[str]:
        out, depth, cur = [], 0, []
        for ch in body:
            if ch == "<" or ch == "(":
                depth += 1
            elif ch == ">" or ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
        return out

    def parse(t: str):
        t = t.strip()
        if t in atomic:
            return atomic[t]
        if t.startswith("decimal(") and t.endswith(")"):
            p, sc = t[len("decimal(") : -1].split(",")
            return T.DecimalType(int(p), int(sc))
        if t.startswith("array<") and t.endswith(">"):
            return T.ArrayType(parse(t[len("array<") : -1]))
        if t.startswith("map<") and t.endswith(">"):
            k, v = split_top(t[len("map<") : -1])
            return T.MapType(parse(k), parse(v))
        if t.startswith("struct<") and t.endswith(">"):
            fields = []
            body = t[len("struct<") : -1]
            if body:
                for part in split_top(body):
                    name, _, ft = part.partition(":")
                    fields.append(T.StructField(name, parse(ft), True))
            return T.StructType(fields)
        raise ValueError(f"snapshot_feed: unsupported manifest type {t!r}")

    return parse(s)


def snapshot_feed_schema(table_dir: str):
    """The feed's schema: the table's TIP schema plus the two change
    columns.  Computed up front so a caller can assert compatibility."""
    from pyspark.sql.types import LongType, StringType, StructField

    versions = _versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshots at {table_dir}")
    base = _parse_simple_string(_manifest(table_dir, versions[-1])["schema"])
    return base.add(
        StructField("_change_type", StringType(), False)
    ).add(StructField("_commit_version", LongType(), False))


class _FilePartition(InputPartition):
    def __init__(
        self,
        path: str,
        change_type: str,
        version: int,
        row_group: int | None = None,
    ):
        self.path = path
        self.change_type = change_type
        self.version = version
        self.row_group = row_group  # None = whole file


class _SnapshotStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema):
        self.table_dir = options.get("table_dir") or options.get("path")
        if not self.table_dir:
            raise ValueError(
                "snapshot_feed: .option('table_dir', <snapshot table>) "
                "is required"
            )
        self.starting = int(options.get("startingversion", 0))
        # backpressure (Delta's maxFilesPerTrigger idea): cap how many
        # CHANGED FILES a micro-batch may span — latestOffset stops
        # advancing once the budget fills (always ≥ 1 version, so a
        # single huge commit still processes).  None = unbounded.
        mfpt = options.get("maxfilespertrigger")
        self.max_files = int(mfpt) if mfpt is not None else None
        self._last_end: int | None = None  # tracked from planning/commits
        self.schema = schema
        self._data_cols = [
            f.name
            for f in schema.fields
            if f.name not in ("_change_type", "_commit_version")
        ]
        versions = _versions(self.table_dir)
        if not versions:
            raise ValueError(f"no snapshots at {self.table_dir}")
        # the feed replays versions (starting, tip] one by one — every
        # one of them must still exist (expire_snapshots may have
        # truncated the early log; FileNotFoundError mid-plan would be
        # an unreadable way to learn that)
        if self.starting + 1 < versions[0]:
            raise ValueError(
                f"startingVersion {self.starting} expired from the log "
                f"(earliest manifest is v{versions[0]}) — re-baseline "
                "with a batch read and a fresh checkpoint"
            )
        if self.starting > versions[-1] or (
            self.starting > 0 and self.starting not in versions
        ):
            raise ValueError(
                f"startingVersion {self.starting} not in the log "
                f"(have v{versions[0]}..v{versions[-1]})"
            )
        anchor = _manifest(self.table_dir, versions[-1])
        self._schema_ddl = anchor["schema"]
        self._table_id = anchor.get("table_id")
        if self.starting > 0:
            start_m = _manifest(self.table_dir, self.starting)
            if start_m.get("row_filters"):
                raise ValueError(
                    "snapshot_feed: table has pending merge-on-read "
                    "filters at the starting version — drain them "
                    "(snapshot_apply_filters) before attaching a stream"
                )

    # -- offsets ---------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        versions = _versions(self.table_dir)
        tip = versions[-1] if versions else self.starting
        if self.max_files is None or self._last_end is None:
            # no budget, or first trigger after a (re)start — the true
            # position lives in the CHECKPOINT, which only partitions()
            # sees; capping against a guess could move the offset
            # backwards, so the first batch runs unbounded and every
            # later one is capped
            return {"version": tip}
        lo, budget, end = self._last_end, self.max_files, self._last_end
        try:
            prev_files = None
            for v in range(lo + 1, tip + 1):
                m = _manifest(self.table_dir, v)
                if prev_files is None:
                    prev_files = (
                        set(_manifest(self.table_dir, v - 1)["files"])
                        if v - 1 > 0
                        else set()
                    )
                cur = set(m["files"])
                changed = (
                    len(cur ^ prev_files) if m.get("op") != "compact" else 0
                )
                if end > lo and budget - changed < 0:
                    break  # budget exhausted; leave this version for later
                budget -= changed
                end = v
                prev_files = cur
        except Exception:
            # a manifest in the window is unreadable (retention passed
            # the offset): advance to the TIP so partitions() runs and
            # raises ITS clear re-baseline error — capping here would
            # stall the stream silently (end stuck at lo, no batch ever
            # planned, no error ever surfaced)
            return {"version": tip}
        return {"version": end}

    # -- planning (driver) -----------------------------------------------
    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start["version"]), int(end["version"])
        self._last_end = hi  # the rate limiter advances from here
        parts: list[InputPartition] = []
        live = set(_versions(self.table_dir))
        missing = [v for v in range(max(lo, 1), hi + 1) if v not in live]
        if missing:
            raise ValueError(
                f"snapshot_feed: version(s) v{missing[0]}.. expired from "
                "the log under the stream (retention passed the "
                "checkpointed offset) — re-baseline with a batch read "
                "and a fresh checkpoint"
            )
        prev = _manifest(self.table_dir, lo) if lo > 0 else None
        if prev is not None and self._table_id and prev.get("table_id") != self._table_id:
            raise ValueError(
                "snapshot_feed: the table log was recreated under the "
                "stream (table_id changed) — restart from a fresh "
                "checkpoint"
            )
        for v in range(lo + 1, hi + 1):
            m = _manifest(self.table_dir, v)
            if m["schema"] != self._schema_ddl:
                raise ValueError(
                    f"snapshot_feed: schema changed at v{v} "
                    f"({self._schema_ddl!r} -> {m['schema']!r}) — restart "
                    "the stream against the new schema"
                )
            pf = set((prev or {}).get("files") or [])
            mf = set(m["files"])
            carried = pf & mf
            if _filter_sig(prev, carried) != _filter_sig(m, carried):
                raise ValueError(
                    f"snapshot_feed: merge-on-read filter change at v{v} "
                    "— a zero-byte takedown has no file diff; use CoW "
                    "deletes (lazy=False) while a stream is attached"
                )
            if m.get("op") == "compact":
                # byte-identical rewrite: cursor advances, nothing emits
                prev = m
                continue
            removed_filtered = [
                f for f in pf - mf if f in _filter_sig(prev, pf - mf)
            ]
            if removed_filtered:
                raise ValueError(
                    f"snapshot_feed: v{v} removed file(s) carrying "
                    "merge-on-read filters — their raw bytes overstate "
                    "the visible rows; drain filters before the stream"
                )
            meta = m.get("file_meta", {})
            pmeta = (prev or {}).get("file_meta", {})
            for f in sorted(mf - pf):
                parts.extend(self._split(f, "insert", v, meta))
            for f in sorted(pf - mf):
                parts.extend(self._split(f, "delete", v, pmeta))
            prev = m
        return parts

    _SPLIT_BYTES = 64 * 1024 * 1024

    def _split(
        self, f: str, change_type: str, v: int, meta: dict
    ) -> list[_FilePartition]:
        """One partition per ROW GROUP for large changed files (manifest
        byte counts decide; the footer is read driver-side only when a
        file crosses the threshold) — a 1 GB rewritten file becomes ~8
        parallel reads instead of one straggler task."""
        size = int((meta.get(f) or {}).get("bytes") or 0)
        if size > self._SPLIT_BYTES:
            try:
                import pyarrow.parquet as pq

                n = pq.ParquetFile(_local(f)).metadata.num_row_groups
                if n > 1:
                    return [
                        _FilePartition(f, change_type, v, row_group=g)
                        for g in range(n)
                    ]
            except Exception:
                pass  # unreadable footer: one whole-file partition
        return [_FilePartition(f, change_type, v)]

    # -- execution (executors) --------------------------------------------
    def read(self, partition: _FilePartition):
        """Arrow-batched: parquet row groups stream through as
        RecordBatches aligned to the feed schema (missing columns null,
        types cast to the pinned schema — the merge_schema read rule) —
        no per-row Python objects on the hot path.  Any file whose
        batches cannot be aligned (exotic type drift) degrades to the
        tuple path for THAT partition, never fails the feed."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(_local(partition.path))
        if partition.row_group is None:
            batches = pf.iter_batches(batch_size=64 * 1024)
        else:
            batches = pf.iter_batches(
                batch_size=64 * 1024, row_groups=[partition.row_group]
            )
        try:
            from pyspark.sql.pandas.types import to_arrow_schema

            target = to_arrow_schema(self.schema)
        except Exception:
            target = None
        ct, cv = partition.change_type, partition.version
        if target is not None:
            try:
                # EAGER alignment: materialize every aligned batch
                # BEFORE yielding any — a mid-stream failure (unsafe
                # cast on values in a later batch) after partial yield
                # would duplicate the already-consumed rows when the
                # tuple fallback replays the partition.  Memory is
                # bounded by the partition (≤ one row group after
                # splitting), the same bound the scan itself has.
                aligned = list(
                    self._arrow_batches(batches, target, ct, cv, pa)
                )
            except Exception:
                aligned = None
            if aligned is not None:
                yield from aligned
                return
            # reopen and degrade to tuples (batches are spent)
            if partition.row_group is None:
                batches = pf.iter_batches(batch_size=64 * 1024)
            else:
                batches = pf.iter_batches(
                    batch_size=64 * 1024,
                    row_groups=[partition.row_group],
                )
        yield from self._tuple_rows(batches, ct, cv)

    def _arrow_batches(self, batches, target, ct: str, cv: int, pa):
        for b in batches:
            present = {n: i for i, n in enumerate(b.schema.names)}
            arrays = []
            for field in target:
                if field.name == "_change_type":
                    arrays.append(pa.array([ct] * b.num_rows, type=field.type))
                elif field.name == "_commit_version":
                    arrays.append(pa.array([cv] * b.num_rows, type=field.type))
                elif field.name in present:
                    col = b.column(present[field.name])
                    if col.type != field.type:
                        col = col.cast(field.type)
                    arrays.append(col)
                else:  # pre-merge_schema file: column surfaces as NULL
                    arrays.append(pa.nulls(b.num_rows, type=field.type))
            yield pa.RecordBatch.from_arrays(arrays, schema=target)

    def _tuple_rows(self, batches, ct: str, cv: int) -> Iterator[tuple]:
        names = self._data_cols
        for b in batches:
            present = set(b.schema.names)
            cols = {
                c: (b.column(c).to_pylist() if c in present else None)
                for c in names
            }
            for i in range(b.num_rows):
                yield tuple(
                    (cols[c][i] if cols[c] is not None else None)
                    for c in names
                ) + (ct, cv)

    def commit(self, end: dict) -> None:
        pass


class SnapshotFeedDataSource(DataSource):
    """``spark.readStream.format("snapshot_feed")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_feed"

    def schema(self):
        table_dir = self.options.get("table_dir") or self.options.get("path")
        if not table_dir:
            raise ValueError(
                "snapshot_feed: .option('table_dir', <snapshot table>) "
                "is required"
            )
        return snapshot_feed_schema(table_dir)

    def streamReader(self, schema):
        return _SnapshotStreamReader(dict(self.options), schema)
