"""Batch DataSource over snapshot tables — the SQL face of the lakehouse.

Through r14 the manifest layer (file pruning, deletion vectors, time
travel, rename repair) was reachable only from Python
(:func:`~.snapshots.read_snapshot_where` and friends); a user typing
``spark.sql("SELECT … FROM t WHERE …")`` over a registered view of the
data directory got a full scan that also resurrected lazily-deleted
rows.  This module closes that gap with a PySpark 4 Python DataSource
batch read::

    from mini_project_204721_data_engineering_spark.sources.snapshot_batch import (
        register_snapshot_table,
    )
    register_snapshot_table(spark, "t", table_dir)     # temp view
    spark.sql("SELECT k, v FROM t WHERE k BETWEEN 10 AND 20")

or directly::

    spark.dataSource.register(SnapshotDataSource)
    spark.read.format("snapshot").option("table_dir", path).load()

and the WRITE path::

    df.write.format("snapshot").mode("append")\
      .option("table_dir", path).option("stats_cols", "k").save()

(executor pyarrow writes + one atomic manifest commit through the same
``_commit`` loop as ``snapshot_append`` — see
:class:`_SnapshotBatchWriter`; ``mode("overwrite")`` is the logical
TRUNCATE+INSERT with time travel to prior versions).

SQL DML (``INSERT INTO`` a ``CREATE TABLE … USING snapshot`` table) is
NOT reachable on Spark 4.1: the catalog-table integration hands the
Python DataSource EMPTY options at read/write time (neither the
``OPTIONS`` map nor ``LOCATION`` is forwarded — probed empirically and
pinned in test_snapshot_batch.py, so a Spark fix is noticed).  Writes
go through the DataFrame API above; reads through views/:func:`snapshot_sql`.

Semantics (all pinned by tests/test_snapshot_batch.py):

- **Pushed filters prune files from the manifest — explicit opt-in**
  (``.option("pushdown", "true")`` plus the session conf
  ``spark.sql.python.filterPushdown.enabled``).  The WHERE clause's
  supported conjuncts are re-spelled as a SQL conjunction and routed
  through the SAME planning pipeline the Python API uses
  (:func:`~.snapshots._predicate_prune_ranges` →
  :func:`~.snapshots._prune_files`), so SQL plans exactly the
  ``read_snapshot_where`` file set.  Every filter is returned to Spark
  as unhandled — file-level pruning is not row-exact, Spark re-applies
  the predicate above the scan.

  Why opt-in: Spark 4.1 caches ONE Python-planning result per relation
  instance (``PythonDataSourceV2.readInfo``), overwrites it on every
  pushdown-bearing scan, and REUSES it for any scan without pushable
  filters — so a long-lived view serving mixed queries would let a
  pruned plan from one query silently answer a later unfiltered one
  (pinned in test_snapshot_batch.py as the upstream-hazard test; if
  Spark fixes the caching, that test fails and the default can flip).
  The pruned mode's contract is therefore ONE pushdown-bearing
  statement per relation instance — exactly what :func:`snapshot_sql`
  provides by registering fresh single-statement views; a self-join of
  one pruned view under DIFFERENT predicates per side is likewise
  outside the contract (the relation cache cannot hold two plans).
  Without the option the source always plans the FULL file set —
  row-level semantics (DV, time travel, renames) stay exact either
  way, and a reused plan is merely unpruned, never wrong.
- **Time travel** via ``.option("version", N)`` or
  ``.option("as_of", unix_seconds)``.  Without either, ``load()`` PINS
  the tip version resolved at schema time and every later query on
  that relation reads that same snapshot — the ``read_snapshot``
  semantics, and the only safe choice: Spark resolves the schema and
  plans the scan at different times (different worker processes), so
  an unpinned reader racing a commit could serve newer files under the
  older schema.  Re-register (or re-``load()``) to see new commits.
- **Deletion vectors apply.**  Files covered by DV takedowns emit raw
  bytes MINUS sidecar positions (the stream feed's position filter);
  predicate-shaped lazy deletes refuse loudly (no SQL engine in the
  Python worker to re-evaluate a stored predicate — drain with
  ``snapshot_apply_filters`` or read through the Python API).
- **Rename chains repair in-scan** (a file written before
  ``snapshot_rename_column`` physically carries the old name; the
  batch aligner fills the current column from it), and additive
  schema evolution NULL-fills/upcasts old files — the same read rules
  as :func:`~.snapshots._filtered_read`.
- **Enrolled tables** read through the catalog:
  ``.option("catalog_dir", c).option("table", name)`` resolves the
  catalog-pinned manifest (published slot or staged fallback), with
  ``.option("version", V)`` meaning CATALOG version in that mode.

Scale: planning is manifest-only (no footers opened; pruning drops
files before any partition exists), partitions are per file with row
group splitting past 64 MB — the same granularity Spark's own parquet
scan plans — and executors read with pyarrow, yielding schema-aligned
Arrow RecordBatches (per-partition tuple fallback for exotic drift).
Bloom-sidecar probes are NOT consulted here (they need Spark jobs, and
the planner worker has no session): a point lookup on a bloom-indexed
key prunes by min/max only — use ``read_snapshot_where`` when the
bloom probe matters.
"""

from __future__ import annotations

import datetime
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)

from ..streaming.snapshot_source import (
    _manifest,
    _parse_simple_string,
    _resolve_pin,
    _versions,
    _with_change_cols,  # noqa: F401  (re-export convenience for callers)
    dv_positions,
    pos_filter,
)
from .manifest_io import _strip_file as _local
from .manifest_io import manifest_io_for, path_scheme

__all__ = ["SnapshotDataSource", "register_snapshot_table", "snapshot_sql"]

_SPLIT_BYTES = 64 * 1024 * 1024


def _sql_lit(v) -> str | None:
    """Spell a pushed-filter value as a SQL literal for the prune-range
    extractor — None for any value we can't spell exactly (that filter
    then simply contributes no pruning; Spark still applies it)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        base = v.strftime("%Y-%m-%d %H:%M:%S")
        if v.microsecond:
            base += f".{v.microsecond:06d}"
        return f"TIMESTAMP '{base}'"
    if isinstance(v, datetime.date):
        return f"DATE '{v.isoformat()}'"
    return None


def _filter_atom(f) -> str | None:
    """One pushed Filter → one SQL atom (or None when it has no sound
    prune spelling).  Only top-level columns with identifier names
    participate — the extractor's tokenizer domain."""
    attr = getattr(f, "attribute", None)
    if not attr or len(attr) != 1 or not str(attr[0]).isidentifier():
        return None
    col = str(attr[0])
    if isinstance(f, IsNull):
        return f"{col} IS NULL"
    if isinstance(f, IsNotNull):
        return f"{col} IS NOT NULL"
    if isinstance(f, In):
        lits = [_sql_lit(v) for v in f.value]
        if lits and all(x is not None for x in lits):
            return f"{col} IN ({', '.join(lits)})"
        return None
    for cls, op in (
        (EqualTo, "="),
        (GreaterThanOrEqual, ">="),
        (GreaterThan, ">"),
        (LessThanOrEqual, "<="),
        (LessThan, "<"),
    ):
        if isinstance(f, cls):
            lit = _sql_lit(f.value)
            return f"{col} {op} {lit}" if lit is not None else None
    return None


def _resolve_batch_manifest(options: dict) -> dict:
    """Sessionless mirror of :func:`~.snapshots._resolve_manifest` plus
    the catalog addressing mode.  Option keys arrive lowercased."""
    version = options.get("version")
    as_of = options.get("as_of")
    cdir, name = options.get("catalog_dir"), options.get("table")
    if cdir and name:
        if as_of is not None:
            raise ValueError(
                "snapshot: as_of is not supported in catalog mode — "
                "pass version (a CATALOG version) instead"
            )
        versions = _versions(cdir)
        if not versions:
            raise ValueError(f"no catalog at {cdir}")
        cv = int(version) if version is not None else versions[-1]
        if cv not in versions:
            raise ValueError(
                f"catalog version {cv} not in log (have "
                f"v{versions[0]}..v{versions[-1]})"
            )
        m = _resolve_pin(cdir, name, cv)
        if m is None:
            raise ValueError(
                f"snapshot: enrolled table {name!r} has no committed "
                f"data at catalog v{cv}"
            )
        m = dict(m)
        m["_resolved_version"] = cv  # catalog version (schema/read pin)
        return m
    table_dir = options.get("table_dir") or options.get("path")
    if not table_dir:
        raise ValueError(
            "snapshot: .option('table_dir', <snapshot table>) or "
            ".option('catalog_dir', ...).option('table', ...) is required"
        )
    if version is not None and as_of is not None:
        raise ValueError("pass version OR as_of, not both")
    versions = _versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshots at {table_dir}")
    if version is not None:
        v = int(version)
        if v not in versions:
            raise ValueError(
                f"version {v} not in log (have {versions[:5]}...)"
            )
    elif as_of is not None:
        eligible = [
            u
            for u in versions
            if _manifest(table_dir, u)["ts"] <= float(as_of)
        ]
        if not eligible:
            raise ValueError(f"no snapshot at or before ts={as_of}")
        v = eligible[-1]
    else:
        v = versions[-1]
    m = dict(_manifest(table_dir, v))
    m["_resolved_version"] = v
    return m


def _guard_filters(manifest: dict) -> dict:
    """file → sorted tuple of DV sidecars covering it; predicate-shaped
    lazy deletes refuse (no positions recorded — a pure-Python reader
    cannot re-evaluate a stored SQL predicate)."""
    dvmap: dict[str, list] = {}
    for e in manifest.get("row_filters") or []:
        if "predicate" in e:
            raise ValueError(
                "snapshot: table has pending PREDICATE-shaped lazy "
                "deletes — not representable in the batch DataSource "
                "(no row positions recorded); drain them "
                "(snapshot_apply_filters) or read through "
                "read_snapshot / read_snapshot_where"
            )
        for f in e.get("files", []):
            dvmap.setdefault(f, []).append(e["dv"])
    return {f: tuple(sorted(s)) for f, s in dvmap.items()}


class _BatchPartition(InputPartition):
    def __init__(
        self,
        path: str,
        row_group: int | None = None,
        dv_exclude: tuple | None = None,
    ):
        self.path = path
        self.row_group = row_group
        self.dv_exclude = dv_exclude


def _split_file(f: str, meta: dict, dv_exclude: tuple | None):
    """Row-group splitting for large files — manifest byte counts
    decide, the footer opens driver-side only past the threshold (the
    same policy the stream feed uses).  DV position filtering is
    whole-file-indexed, so split partitions read their own row group
    via pyarrow (row-group-local positions need no base offset: the
    sidecar records whole-file row_index, and the reader tracks the
    group's starting offset)."""
    size = int((meta.get(f) or {}).get("bytes") or 0)
    if size > _SPLIT_BYTES:
        try:
            import pyarrow.parquet as pq

            md = pq.ParquetFile(_local(f)).metadata
            n = md.num_row_groups
            if n > 1:
                out, off = [], 0
                for g in range(n):
                    p = _BatchPartition(f, row_group=g, dv_exclude=dv_exclude)
                    p.rg_offset = off
                    out.append(p)
                    off += md.row_group(g).num_rows
                return out
        except Exception:
            pass
    p = _BatchPartition(f, dv_exclude=dv_exclude)
    p.rg_offset = 0
    return [p]


class _SnapshotBatchReader(DataSourceReader):
    """The always-safe reader: no ``pushFilters`` method AT ALL — Spark
    4.1 refuses a pushFilters-implementing reader when the session conf
    is off, and the safe mode must work under any conf."""

    def __init__(self, options: dict, schema):
        self.schema = schema
        self.manifest = _resolve_batch_manifest(options)
        self._dvmap = _guard_filters(self.manifest)
        self._renames = self.manifest.get("renames") or {}
        self._atoms: list[str] = []

    # -- planning ---------------------------------------------------------
    def planned_files(self) -> list[str]:
        """The post-prune file list — the testable seam: must equal
        what ``_plan_files`` (read_snapshot_where's planner) derives
        for the same conjunction, minus the bloom probe."""
        from .snapshots import _predicate_prune_ranges, _prune_files

        files = list(self.manifest["files"])
        if self._atoms:
            ranges = {
                c: r
                for c, r in _predicate_prune_ranges(
                    " AND ".join(self._atoms)
                ).items()
                if r is not None
            }
            if ranges:
                files = _prune_files(self.manifest, ranges)
        return files

    def partitions(self) -> Sequence[InputPartition]:
        # consume the pushed atoms so a reader instance reused for a
        # second planning round never carries the first round's filters
        # (defense in depth: the JVM-side readInfo cache reuse is the
        # documented pushdown-mode hazard, but reader-side state must
        # not add a second leak path)
        try:
            files = self.planned_files()
        finally:
            self._atoms = []
        meta = self.manifest.get("file_meta", {})
        parts: list[InputPartition] = []
        for f in files:
            parts.extend(_split_file(f, meta, self._dvmap.get(f)))
        # zero matching files still needs one (empty) partition — the
        # DataSource API requires a non-empty partition list
        return parts or [_BatchPartition("", row_group=None)]

    # -- execution (executors) --------------------------------------------
    def read(self, partition: _BatchPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not partition.path:
            return
        pf = pq.ParquetFile(_local(partition.path))
        positions: list[int] | None = None
        if partition.dv_exclude:
            hit: set = set()
            for sidecar in partition.dv_exclude:
                hit.update(
                    dv_positions(sidecar, partition.path, pq)
                )
            if hit:
                positions = sorted(hit)

        def fresh_batches():
            if partition.row_group is None:
                it = pf.iter_batches(batch_size=64 * 1024)
            else:
                it = pf.iter_batches(
                    batch_size=64 * 1024, row_groups=[partition.row_group]
                )
            if positions is not None:
                return pos_filter(
                    it, positions, pa, exclude=True,
                    base=getattr(partition, "rg_offset", 0),
                )
            return it

        try:
            from pyspark.sql.pandas.types import to_arrow_schema

            target = to_arrow_schema(self.schema)
        except Exception:
            target = None
        if target is not None:
            try:
                # eager alignment: materialize before yielding so a
                # late cast failure can fall back to tuples without
                # duplicating already-yielded rows
                aligned = list(
                    _align_batches(fresh_batches(), target, self._renames, pa)
                )
            except Exception:
                aligned = None
            if aligned is not None:
                yield from aligned
                return
        yield from self._tuple_rows(fresh_batches())

    def _tuple_rows(self, batches) -> Iterator[tuple]:
        names = [f.name for f in self.schema.fields]
        for b in batches:
            present = set(b.schema.names)
            resolved = {}
            for c in names:
                src = c if c in present else next(
                    (o for o in self._renames.get(c, []) if o in present),
                    None,
                )
                resolved[c] = (
                    b.column(src).to_pylist() if src is not None else None
                )
            for i in range(b.num_rows):
                yield tuple(
                    (resolved[c][i] if resolved[c] is not None else None)
                    for c in names
                )


def _align_batches(batches, target, renames: dict, pa):
    """Align raw parquet batches to the pinned schema: missing columns
    NULL-fill (additive evolution), types cast (lossless widening), and
    rename chains repair — a file physically carrying an OLD name of a
    renamed column surfaces it under the current name (each file holds
    at most one name of a chain; the reserved-name guard enforces it
    at commit)."""
    for b in batches:
        present = {n: i for i, n in enumerate(b.schema.names)}
        arrays = []
        for field in target:
            src = field.name if field.name in present else next(
                (o for o in renames.get(field.name, []) if o in present),
                None,
            )
            if src is not None:
                col = b.column(present[src])
                if col.type != field.type:
                    col = col.cast(field.type)
                arrays.append(col)
            else:
                arrays.append(pa.nulls(b.num_rows, type=field.type))
        yield pa.RecordBatch.from_arrays(arrays, schema=target)


class _SnapshotPushdownReader(_SnapshotBatchReader):
    """The opt-in pruned reader (``.option("pushdown", "true")``) —
    single-statement relation contract, module doc."""

    def pushFilters(self, filters):
        pushed = list(filters)
        self._atoms = [a for a in map(_filter_atom, pushed) if a]
        # return EVERY filter as unhandled: manifest pruning skips whole
        # files, it never certifies rows, so Spark re-applies the
        # predicate above the scan.  NOTE this does NOT make pruning
        # soundness optional — a mis-pruned file's rows never reach
        # Spark at all; correctness rests on the shared planner's
        # soundness exactly as read_snapshot_where's does (the same
        # extractor + pruner, parity- and hypothesis-tested there)
        return pushed


class _WriteMessage(WriterCommitMessage):
    def __init__(self, file, rows, bytes_, stats):
        self.file = file          # recorded (manifest-spelled) path, or None
        self.rows = rows
        self.bytes = bytes_
        self.stats = stats        # {col: [min, max, nulls] (+ [sum] for ints)}


_SAFE_INT = {"int8", "int16", "int32", "int64"}
_SAFE_FLOAT = {"float", "double"}


def _batch_col_stats(table, pa):
    """Per-file stats from the written pyarrow table, for exactly the
    types whose manifest spelling we can mirror EXACTLY (a wrong
    spelling could mis-prune — soundness over coverage): integral
    (min/max/nulls + exact sum), float/double (min/max/nulls, NO sum —
    Spark's sum order differs and snapshot_agg's fallback scan is the
    sound answer), and strings (min/max through the same
    truncate-with-increment bound the Spark stats pass uses).  Every
    other type records no stats — absent stats never prune."""
    import pyarrow.compute as pc

    from .snapshots import _STATS_STR_CAP, _trunc_bound

    out = {}
    n = table.num_rows
    for name in table.schema.names:
        col = table.column(name)
        t = col.type
        nulls = col.null_count
        if n == nulls:
            continue  # all-null: min/max undefined; skip (conservative)
        tid = str(t)
        try:
            if tid in _SAFE_INT:
                mn = pc.min(col).as_py()
                mx = pc.max(col).as_py()
                total = int(
                    pc.sum(pc.cast(col, pa.decimal128(38, 0))).as_py()
                )
                out[name] = [int(mn), int(mx), int(nulls), total]
            elif tid in _SAFE_FLOAT:
                mn = pc.min(col).as_py()
                mx = pc.max(col).as_py()
                out[name] = [float(mn), float(mx), int(nulls)]
            elif tid in ("string", "large_string"):
                mn = pc.min(col).as_py()
                mx = pc.max(col).as_py()
                if len(mn) > _STATS_STR_CAP:
                    mn = _trunc_bound(mn, False)
                if len(mx) > _STATS_STR_CAP:
                    mx = _trunc_bound(mx, True)
                out[name] = [mn, mx, int(nulls)]
        except Exception:
            continue  # stats are optional; the file is just never pruned
    return out


class _SnapshotBatchWriter(DataSourceArrowWriter):
    """``df.write.format("snapshot").mode("append"|"overwrite")`` — the
    DataFrame-writer face of the commit protocol.  Executors write one
    parquet file per non-empty partition with pyarrow AND compute its
    manifest stats in the same pass (rows/bytes always; min/max/nulls
    for exactly the types whose spelling matches the Spark stats pass —
    see :func:`_batch_col_stats`); the driver-side ``commit`` lands ONE
    atomic manifest commit through the same ``_commit`` loop every
    other writer uses — schema guard, sticky stats resolution, DV/bloom
    /NDV/evolution carries, optimistic retry and all.  A crash before
    ``commit`` strands invisible orphan files (``expire_snapshots``
    sweeps them), exactly like ``snapshot_append``.

    Scope: ``table_dir`` tables on ``file:``-reachable storage (the
    executors write bytes with pyarrow).  Enrolled tables refuse —
    their writes must ride ``multi_table_txn`` or the catalog pins
    diverge; non-file schemes refuse toward :func:`~.snapshots
    .snapshot_append`.  ``.option("stats_cols", "a,b")`` configures
    identity min/max stats (sticky thereafter, same as
    ``snapshot_append``); derived stats specs need the Python API."""

    def __init__(self, options: dict, schema, overwrite: bool):
        import uuid

        if options.get("catalog_dir") or options.get("table"):
            raise ValueError(
                "snapshot write: enrolled tables write through "
                "multi_table_txn (a direct write would race catalog "
                "publication for version numbers) — pass table_dir for "
                "standalone tables only"
            )
        table_dir = options.get("table_dir") or options.get("path")
        if not table_dir:
            raise ValueError(
                "snapshot write: .option('table_dir', <snapshot table>) "
                "is required"
            )
        spark_base = manifest_io_for(table_dir).spark_path(table_dir)
        if path_scheme(spark_base) not in ("", "file"):
            raise ValueError(
                f"snapshot write: data path {spark_base!r} is not "
                "file:-reachable from the executors' pyarrow writer — "
                "use snapshot_append for this scheme"
            )
        self.table_dir = table_dir
        self.local_base = _local(spark_base).rstrip("/")
        self.commit_id = uuid.uuid4().hex
        self.overwrite = overwrite
        self.ddl = schema.simpleString()
        sc = options.get("stats_cols")
        self.stats_cols = (
            [c.strip() for c in str(sc).split(",") if c.strip()]
            if sc
            else None
        )
        if self.stats_cols:
            known = {f.name for f in schema.fields}
            bad = [c for c in self.stats_cols if c not in known]
            if bad:
                raise ValueError(
                    f"snapshot write: stats_cols {bad} not in schema "
                    f"(have {sorted(known)})"
                )

    # -- executors --------------------------------------------------------
    def write(self, iterator):
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        batches = [b for b in iterator if b.num_rows]
        if not batches:
            # no bytes for an empty partition (tidier than Spark's
            # empty part files; file_meta stays exact without them)
            return _WriteMessage(None, 0, 0, {})
        table = pa.Table.from_batches(batches)
        d = os.path.join(self.local_base, "data", self.commit_id)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(table, path, compression="snappy")
        return _WriteMessage(
            "file:" + path,
            table.num_rows,
            os.stat(path).st_size,
            _batch_col_stats(table, pa),
        )

    # -- driver-side worker ----------------------------------------------
    def commit(self, messages):
        from .snapshots import _check_schema, _commit, _norm_stats

        new_files = sorted(
            m.file for m in messages if m is not None and m.file
        )
        fresh_meta = {
            m.file: {"rows": m.rows, "bytes": m.bytes}
            for m in messages
            if m is not None and m.file
        }
        fresh_stats = {
            m.file: m.stats
            for m in messages
            if m is not None and m.file
        }
        ddl = self.ddl
        explicit = self.stats_cols

        def files_fn(parent):
            if not self.overwrite:
                _check_schema(parent, ddl, "snapshot datasource write")
                return (parent["files"] if parent else []) + new_files
            return list(new_files)

        def stats_fn(parent, files):
            cols = _norm_stats(
                explicit
                if explicit is not None
                else (parent or {}).get("stats_cols", [])
            )
            parent_meta = (parent or {}).get("file_meta", {})
            meta = {
                f: m
                for f in files
                if (m := parent_meta.get(f) or fresh_meta.get(f))
                is not None
            }
            if not cols:
                return {}, {}, meta
            parent_stats = (parent or {}).get("stats", {})
            # only IDENTITY aliases can come from the arrow-side stats;
            # derived expressions record absent (conservatively kept)
            fresh = {
                f: {
                    a: st[a]
                    for a, e in cols.items()
                    if a == e and a in st
                }
                for f, st in fresh_stats.items()
            }
            return (
                {
                    f: (parent_stats.get(f) or fresh.get(f))
                    for f in files
                    if (parent_stats.get(f) or fresh.get(f)) is not None
                },
                cols,
                meta,
            )

        kwargs = {}
        if self.overwrite:
            # full replace: rename chains / reserved names clear (the
            # documented rebuild path, same as snapshot_overwrite)
            kwargs["evo_fn"] = lambda parent: ({}, [])
        _commit(
            None,  # sessionless: manifest IO resolves from the path
            self.table_dir,
            "overwrite" if self.overwrite else "append",
            files_fn,
            ddl,
            meta={"added_files": len(new_files), "writer": "datasource"},
            stats_fn=stats_fn,
            **kwargs,
        )

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and m.file:
                try:
                    os.remove(_local(m.file))
                except OSError:
                    pass


class SnapshotDataSource(DataSource):
    """``spark.read.format("snapshot")`` — see module doc.  Batch only;
    the streaming feed is the separate ``snapshot_feed`` format (their
    schemas differ: the feed appends change-tracking columns)."""

    @classmethod
    def name(cls) -> str:
        return "snapshot"

    def schema(self):
        m = _resolve_batch_manifest(dict(self.options))
        # pin the version schema() resolved so reader() reads the SAME
        # snapshot: Spark calls the two at different times (and in
        # different worker processes — the instance is pickled between
        # them, carrying this attribute), and a commit landing in the
        # gap would otherwise serve newer files under the older
        # schema (a torn read: a widened column's values cast-truncated
        # or tuple-path-garbled against the stale arrow type)
        if "version" not in self.options and "as_of" not in self.options:
            self._pinned_version = m.get("_resolved_version")
        return _parse_simple_string(m["schema"])

    def writer(self, schema, overwrite: bool):
        return _SnapshotBatchWriter(dict(self.options), schema, overwrite)

    def reader(self, schema):
        opts = dict(self.options)
        pinned = getattr(self, "_pinned_version", None)
        if pinned is not None and "version" not in opts and (
            "as_of" not in opts
        ):
            opts["version"] = pinned
        if str(opts.get("pushdown", "false")).lower() == "true":
            return _SnapshotPushdownReader(opts, schema)
        return _SnapshotBatchReader(opts, schema)


def register_snapshot_table(
    spark,
    view_name: str,
    table_dir: str | None = None,
    version: int | None = None,
    as_of: float | None = None,
    catalog_dir: str | None = None,
    table: str | None = None,
    pushdown: bool = False,
):
    """Register the DataSource and create a temp view — after which
    plain ``spark.sql`` over ``view_name`` reads through the manifest
    (DV takedowns applied, time travel via ``version``/``as_of``,
    rename chains repaired).  Returns the DataFrame behind the view.

    ``pushdown=True`` additionally prunes files from pushed WHERE
    conjuncts, under the single-statement relation contract in the
    module doc — leave it False for a long-lived view serving mixed
    queries (the default is always-correct, merely unpruned); use
    :func:`snapshot_sql` when you want pruning per statement.  NOTE
    ``pushdown=True`` enables the session conf
    ``spark.sql.python.filterPushdown.enabled`` and leaves it on (the
    view's later queries plan under it); :func:`snapshot_sql` restores
    the prior value because its views don't outlive the call."""
    spark.dataSource.register(SnapshotDataSource)
    r = spark.read.format("snapshot")
    if catalog_dir and table:
        r = r.option("catalog_dir", catalog_dir).option("table", table)
    elif table_dir:
        r = r.option("table_dir", table_dir)
    else:
        raise ValueError("pass table_dir, or catalog_dir + table")
    if version is not None:
        r = r.option("version", int(version))
    if as_of is not None:
        r = r.option("as_of", float(as_of))
    if pushdown:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
        r = r.option("pushdown", "true")
    df = r.load()
    df.createOrReplaceTempView(view_name)
    return df


def snapshot_sql(spark, sql: str, tables: dict):
    """Run ONE SQL statement over snapshot tables with manifest file
    pruning — the safe pruned pattern: every referenced table gets a
    FRESH pushdown-enabled relation for this statement only, so the
    relation-cache hazard (module doc) cannot cross statements::

        out = snapshot_sql(
            spark,
            "SELECT k, sum(v) FROM t WHERE k BETWEEN 10 AND 20 GROUP BY k",
            {"t": table_dir},                       # or {"t": {"table_dir": d,
        )                                           #     "version": 3}}

    ``tables`` maps view names to a table_dir string or an options dict
    (``table_dir``/``catalog_dir``+``table``/``version``/``as_of``).
    The result is materialized (``collect``) and returned as a local
    DataFrame — the registered views are single-use by contract, so a
    lazy result that re-scans later would outlive them.

    The given view names are TAKEN OVER for the duration of the call
    (``createOrReplaceTempView`` — a pre-existing same-named temp view
    is replaced and then dropped); the session conf
    ``spark.sql.python.filterPushdown.enabled`` is restored to its
    prior value afterwards, and the views are dropped even when the
    statement fails — a leaked pushdown view would re-expose the
    relation-cache hazard this helper exists to avoid."""
    prior_conf = spark.conf.get(
        "spark.sql.python.filterPushdown.enabled", "false"
    )
    try:
        for name, spec in tables.items():
            opts = (
                {"table_dir": spec} if isinstance(spec, str) else dict(spec)
            )
            register_snapshot_table(spark, name, pushdown=True, **opts)
        out = spark.sql(sql)
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        for name in tables:
            try:
                spark.catalog.dropTempView(name)
            except Exception:
                pass
        spark.conf.set(
            "spark.sql.python.filterPushdown.enabled", prior_conf
        )
