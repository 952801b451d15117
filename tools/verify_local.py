"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, then compares row count, column names, and an
order-insensitive value representation (values stringified, doubles via
repr, rows sorted) — a strictly stricter check than a hash match.

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(rows, cols):
    """Order-insensitive canonical form: sort columns by name, stringify."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(repr(round(v, 9)))
            else:
                vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out


def main() -> int:
    import __spark_entry__ as entrymod
    from mini_project_204721_data_engineering_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duck_con(SF_DIR)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # variant demos outside the driver's 50-query budget are still
    # value-checked here every run
    from mini_project_204721_data_engineering_spark import queries as _q

    qs = {**qs, **_q.all_extra_queries()}
    oracles = {**oracles, **_q.all_extra_oracles()}

    failures = []
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            status = "ROWS-ONLY"
            print(f"{status:9s} {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        ok = True
        if sorted(scols) != sorted(dcols):
            ok = False
            print(f"FAIL {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
        elif len(srows) != len(drows):
            ok = False
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
        else:
            sc = canon(srows, scols)
            dc = canon(drows, dcols)
            if sc != dc:
                ok = False
                diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
                print(f"FAIL {name}: value mismatch; first diffs: {diffs}")
        if ok:
            print(f"OK        {name}: rows={len(srows)} ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print(f"\n{len(qs) - len(failures)}/{len(qs)} green" + (f"; FAILURES: {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
