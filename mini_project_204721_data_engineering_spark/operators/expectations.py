"""Declarative data-quality expectations — the Deequ/dbt-tests-style
constraint layer an analytics engine runs before anything downstream
trusts a table (generalizing the reference's required-column check,
``backend/app/utils.py`` column validation, from schema presence to
content constraints).

Each expectation compiles to ONE aggregate expression over its table —
uniqueness, null rate, value range, set membership, and row count are
all map-side-combinable counts; referential integrity is a broadcast
(or shuffle, at scale) anti-join counted, never materialized.  All
expectations against the same table FUSE into a single scan (one
``agg`` with N expressions), so a 50-check suite over a 100 TB fact
table costs one pass plus one small join per FK check.  The report is
checks-sized: ``(table, check, n_violations, passed)``.

Everything here is plain ANSI-SQL semantics, so the whole report is
DuckDB-oracle-checkable (the EXTRA query ``data_expectations``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "expect_unique",
    "expect_not_null",
    "expect_in_range",
    "expect_in_set",
    "expect_row_count",
    "expect_expr",
    "expect_fk",
    "run_expectations",
]


@dataclass(frozen=True)
class _Expect:
    name: str
    #: aggregate Column producing the violation count, or None for FK
    agg: Column | None = None
    #: (child cols, parent table name, parent cols) for FK checks
    fk: tuple[tuple[str, ...], str, tuple[str, ...]] | None = field(default=None)


def expect_unique(*cols: str) -> _Expect:
    """No two rows share these column values (PK/BK check).  Violations
    = rows beyond the first of each duplicated key.  NULL-keyed rows
    are EXCLUDED from both sides — ``count(DISTINCT c1, c2)`` ignores
    rows with any NULL key, so a plain ``count(*)`` minuend would flag
    a lone NULL-keyed row (no duplicate at all) as a violation; pair
    it with ``expect_not_null`` to forbid NULL keys.  Counted as
    ``count(all-keys-non-null) - count(distinct cols)`` in one fused
    aggregate (exact; at extreme cardinality swap in
    approx_count_distinct upstream)."""
    d = ", ".join(cols)
    nn = F.lit(True)
    for c in cols:
        nn = nn & F.col(c).isNotNull()
    return _Expect(
        f"unique({d})",
        F.count(F.when(nn, 1)) - F.countDistinct(*[F.col(c) for c in cols]),
    )


def expect_not_null(col: str) -> _Expect:
    """No NULLs in ``col``."""
    return _Expect(
        f"not_null({col})", F.count(F.lit(1)) - F.count(F.col(col))
    )


def expect_in_range(col: str, lo: float, hi: float) -> _Expect:
    """All non-null values in ``[lo, hi]``."""
    c = F.col(col)
    return _Expect(
        f"range({col},{lo},{hi})",
        F.sum(F.when(c.isNotNull() & ((c < lo) | (c > hi)), 1).otherwise(0)),
    )


def expect_in_set(col: str, allowed: tuple) -> _Expect:
    """All non-null values drawn from ``allowed``."""
    c = F.col(col)
    return _Expect(
        f"in_set({col})",
        F.sum(
            F.when(c.isNotNull() & ~c.isin(list(allowed)), 1).otherwise(0)
        ),
    )


def expect_row_count(min_rows: int) -> _Expect:
    """At least ``min_rows`` rows (emptiness/freshness tripwire).
    Violations = the shortfall."""
    return _Expect(
        f"row_count>={min_rows}",
        F.greatest(F.lit(0).cast("long"), F.lit(min_rows) - F.count(F.lit(1))),
    )


def expect_expr(name: str, predicate: str) -> _Expect:
    """Arbitrary row-level invariant as a SQL boolean expression — the
    dbt-style generic test ("every row must satisfy X").  Violations =
    rows where the predicate is NOT TRUE; a NULL predicate result (e.g.
    a NULL operand) counts as a violation — deliberately STRICTER than
    a SQL CHECK constraint (which passes UNKNOWN), because a quality
    gate should flag rows it cannot prove clean; write
    ``x IS NULL OR x > 0`` to permit NULLs.
    Fuses into the same single scan as the other aggregate checks."""
    return _Expect(
        f"expr({name})",
        F.sum(
            F.when(F.coalesce(F.expr(predicate), F.lit(False)), 0).otherwise(1)
        ),
    )


def expect_fk(child_cols: tuple[str, ...] | str, parent: str, parent_cols: tuple[str, ...] | str) -> _Expect:
    """Referential integrity: every non-null child key exists in the
    parent (orphans counted via LEFT ANTI join — broadcast when the
    parent is dimension-sized, shuffle otherwise; Catalyst picks)."""
    cc = (child_cols,) if isinstance(child_cols, str) else tuple(child_cols)
    pc = (parent_cols,) if isinstance(parent_cols, str) else tuple(parent_cols)
    return _Expect(f"fk({','.join(cc)}->{parent})", None, (cc, parent, pc))


def run_expectations(
    tables: dict[str, DataFrame],
    suite: dict[str, list[_Expect]],
) -> DataFrame:
    """Run a suite ({table name: [expectations]}) → the violations
    report ``(table_name, check, n_violations, passed)``, one row per
    expectation.  Per table, all aggregate expectations fuse into ONE
    scan; each FK expectation adds one counted anti-join.  The unions
    are checks-sized — the report never carries row-level data."""
    pieces: list[DataFrame] = []
    for tname, expects in suite.items():
        df = tables[tname]
        aggs = [e for e in expects if e.agg is not None]
        if aggs:
            row = df.agg(
                *[e.agg.cast("long").alias(f"__c{i}") for i, e in enumerate(aggs)]
            )
            stacked = ", ".join(
                f"'{e.name.replace(chr(39), '')}', __c{i}" for i, e in enumerate(aggs)
            )
            pieces.append(
                row.selectExpr(
                    f"stack({len(aggs)}, {stacked}) as (check, n_violations)"
                ).select(
                    F.lit(tname).alias("table_name"), "check", "n_violations"
                )
            )
        for e in expects:
            if e.fk is None:
                continue
            cc, parent, pc = e.fk
            child = df.select(*cc).na.drop()
            par = tables[parent].select(
                *[F.col(p).alias(c) for c, p in zip(cc, pc)]
            )
            orphans = child.join(par, on=list(cc), how="left_anti")
            pieces.append(
                orphans.agg(F.count(F.lit(1)).alias("n_violations")).select(
                    F.lit(tname).alias("table_name"),
                    F.lit(e.name.replace("'", "")).alias("check"),
                    "n_violations",
                )
            )
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("n_violations") == 0)
