"""Local stand-in for the driver's correctness harness.

Runs every ``queries()[name]`` on Spark at sf0.01 and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet files, comparing
row count, column names, and an order-insensitive value digest
(rows stringified, columns sorted by name, rows sorted). Mirrors the
contract described in the driver stub so mismatches surface before the
driver's own CORRECTNESS run.

Pandas canonicalization (round-2 lesson): the driver converts BOTH
result sets through pandas before sorting/hashing, so dtype coercions
matter — DuckDB ``sum(BIGINT)`` is HUGEINT, which pandas renders as
float64 (``'164.0'`` vs Spark's ``'164'``), and list-valued cells make
pandas ``sort_values`` raise. This checker therefore (a) pulls the
DuckDB side via ``cur.df()`` and the Spark side via ``toPandas()`` so
the same coercions happen locally, and (b) hard-fails ANY query —
oracle-backed or rows-only — whose output contains list/array cells.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    import datetime
    import math as _m

    import numpy as _np

    if v is None:
        return "NULL"
    if isinstance(v, float):  # covers np.float64 (a float subclass)
        if _m.isnan(v):
            return "NaN"
        if v == 0:
            return "0.0"  # -0.0 (duckdb round) and +0.0 (spark round) unify
        return repr(round(v, 9))
    if isinstance(v, _np.integer):
        return str(int(v))
    if isinstance(v, datetime.datetime):  # covers pd.Timestamp
        return v.isoformat()
    if isinstance(v, (list, tuple, _np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def unsortable_cells(rows: list[tuple]) -> bool:
    """True if any cell would crash the driver's pandas sort_values
    canon (lists/arrays/dicts are unhashable → TypeError). Scans EVERY
    row: an array column that is NULL early and populated later must
    still be caught."""
    import numpy as _np

    for r in rows:
        for v in r:
            if isinstance(v, (list, dict, set, _np.ndarray)):
                return True
    return False


def unsortable_schema(sdf) -> bool:
    """Exact schema-level form of the same check for the Spark side:
    any ArrayType/MapType/StructType output column crashes the driver
    canon regardless of which rows are NULL."""
    return any(
        f.dataType.typeName() in ("array", "map", "struct") for f in sdf.schema.fields
    )


def pandas_rows(pdf) -> list[tuple]:
    """pandas DataFrame → list of row tuples, NaT/NaN→None for object
    cols preserved as-is (norm_cell handles NaN)."""
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def digest(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from judyst_web_crawler_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = [n for n in only if n not in qs]
        if unknown:
            print(f"unknown query name(s): {unknown}; valid: {sorted(qs)}")
            return 1
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = pandas_rows(sdf.toPandas())
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        el = time.monotonic() - t0
        if unsortable_schema(sdf) or unsortable_cells(srows):
            # the driver canonicalizes EVERY query (rows-only included)
            # through pandas sort_values; list cells hard-error there.
            print(f"FAIL  {name}: list/array-valued output cell (driver canon crashes)")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {el:.1f}s)")
            continue
        try:
            cur = con.execute(oracles[name])
            opdf = cur.df()
            ocols = list(opdf.columns)
            orows = pandas_rows(opdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        if unsortable_cells(orows):
            print(f"FAIL  {name}: list/array-valued oracle cell (driver canon crashes)")
            failures.append(name)
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if not problems:
            ds = digest(srows, scols)
            do = digest(orows, ocols)
            if ds != do:
                problems.append("value digest mismatch")
                spark_set = {
                    "|".join(norm_cell(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows
                }
                oracle_set = {
                    "|".join(norm_cell(r[i]) for i in sorted(range(len(ocols)), key=lambda i: ocols[i]))
                    for r in orows
                }
                only_s = sorted(spark_set - oracle_set)[:3]
                only_o = sorted(oracle_set - spark_set)[:3]
                if only_s:
                    problems.append(f"spark-only: {only_s}")
                if only_o:
                    problems.append(f"oracle-only: {only_o}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS  {name} ({len(srows)} rows, {el:.1f}s)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    return 1 if failures else 0


if __name__ == "__main__":
    only = sys.argv[1:] or None
    raise SystemExit(main(only=only))
