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
    "psi_drift",
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


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str,
    breaks: "list[float]",
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    distribution of ``col`` — the standard drift monitor for feature /
    score distributions (PSI < 0.1 stable, 0.1-0.25 moderate shift,
    > 0.25 investigate).  Returns one row per bin:
    ``(bin, ref_frac, cur_frac, psi_term)`` with
    ``psi_term = (cur − ref) · ln(cur / ref)`` on ε-clamped fractions
    (an empty bin on either side contributes a finite, loud term
    instead of ±∞); total PSI is ``sum(psi_term)``.

    ``breaks`` are CALLER-FIXED bin edges (bin 0 = underflow, bin i =
    [breaks[i-1], breaks[i]), bin len(breaks) = overflow) — fixed edges
    make the sketch mergeable and the monitor comparable across runs;
    deriving edges from quantiles of the current batch would make every
    run's bins different and drift unmeasurable.  NULLs are excluded
    (monitor them with expect_not_null).

    Scale shape: one map-side-combinable groupBy per side (shuffle is
    |bins|, not |rows|), totals as broadcast 1-row aggregates, and the
    bin spine is a range() frame joined on bin id — both inputs can be
    100 TB; nothing row-sized leaves the executors."""
    if len(breaks) < 1 or sorted(breaks) != list(breaks):
        raise ValueError(f"breaks must be a non-empty ascending list, got {breaks}")
    n = len(breaks)
    c = F.col(col)

    def binned(df: DataFrame, out: str) -> DataFrame:
        b = F.when(c < F.lit(float(breaks[0])), F.lit(0))
        for i in range(1, n):
            b = b.when(c < F.lit(float(breaks[i])), F.lit(i))
        b = b.otherwise(F.lit(n))
        counts = (
            df.filter(c.isNotNull())
            .groupBy(b.alias("bin"))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        total = counts.agg(F.sum("__n").cast("double").alias("__t"))
        return counts.crossJoin(F.broadcast(total)).select(
            "bin", (F.col("__n") / F.col("__t")).alias(out)
        )
    spark = ref.sparkSession
    spine = spark.range(0, n + 1).select(F.col("id").cast("int").alias("bin"))
    r = binned(ref, "ref_frac")
    u = binned(cur, "cur_frac")
    rf = F.greatest(F.coalesce(F.col("ref_frac"), F.lit(0.0)), F.lit(float(eps)))
    cf = F.greatest(F.coalesce(F.col("cur_frac"), F.lit(0.0)), F.lit(float(eps)))
    return (
        spine.join(F.broadcast(r), "bin", "left")
        .join(F.broadcast(u), "bin", "left")
        .select(
            "bin",
            rf.alias("ref_frac"),
            cf.alias("cur_frac"),
            ((cf - rf) * F.log(cf / rf)).alias("psi_term"),
        )
    )
