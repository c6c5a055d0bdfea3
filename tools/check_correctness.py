"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at a given sf and compare with its
oracle_sql() DuckDB twin — row count, sorted column names,
order-insensitive values, AND result types.

The type check exists because the driver's value hash is
type-sensitive: DuckDB `sum()` over integers yields HUGEINT (int128)
where Spark yields BIGINT, and equal values then hash differently
even though a Python-level compare sees `int == int`. Policy,
calibrated against two rounds of driver evidence: integer widths up
to 64 bits are EQUIVALENT (driver r2 hash-passed many int32-vs-int64
and even int32-vs-int8 queries), but int128/HUGEINT is DISTINCT
(every driver r2 hash failure was a HUGEINT oracle column). Float
widths are kept distinct (no counter-evidence); decimal precision,
timestamp unit/timezone, and string-vs-large-string are not
significant (never flagged).

Usage: python tools/check_correctness.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

import __spark_entry__ as entrymod
from orestes_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Widths <=64 collapse to "int" (driver-equivalent); 128-bit is distinct.
_INT_WIDTHS = {
    "tinyint": "int",
    "byte": "int",
    "int1": "int",
    "smallint": "int",
    "short": "int",
    "int2": "int",
    "int": "int",
    "integer": "int",
    "int4": "int",
    "bigint": "int",
    "long": "int",
    "int8": "int",
    "utinyint": "int",
    "usmallint": "int",
    "uinteger": "int",
    "ubigint": "int",
    "hugeint": "int128",
    "int128": "int128",
    "uhugeint": "int128",
}


def canon_type(t: str) -> str:
    """Canonicalize a Spark simpleString or DuckDB type name so the two
    sides are comparable, preserving exactly the distinctions the
    driver's hash is known to be sensitive to (integer/float width)."""
    t = t.strip().lower()
    m = re.fullmatch(r"(.+)\[\]", t)  # DuckDB list syntax X[]
    if m:
        return f"list<{canon_type(m.group(1))}>"
    m = re.fullmatch(r"array<(.+)>", t)  # Spark list syntax
    if m:
        return f"list<{canon_type(m.group(1))}>"
    if t.startswith(("struct", "row(")):
        return "struct"
    if t.startswith("map"):
        return "map"
    if t.startswith("decimal") or t.startswith("numeric"):
        return "decimal"
    if t.startswith("timestamp") or t.startswith("datetime"):
        return "timestamp"
    if t in _INT_WIDTHS:
        return _INT_WIDTHS[t]
    if t in ("double", "float64", "double precision"):
        return "float64"
    if t in ("float", "real", "float32", "float4", "float8"):
        # DuckDB FLOAT/REAL are 32-bit; Spark 'float' is 32-bit.
        return "float32" if t != "float8" else "float64"
    if t in ("varchar", "string", "text", "large_string", "char"):
        return "string"
    if t in ("boolean", "bool"):
        return "bool"
    if t in ("blob", "binary", "varbinary", "bytea"):
        return "binary"
    return t


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if math.isnan(v):
                    v = "NaN"
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-correctness")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = {f.name: canon_type(f.dataType.simpleString()) for f in sdf.schema.fields}
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            desc = con.execute("DESCRIBE " + oracles[name]).fetchall()
            otypes = {d[0]: canon_type(d[1]) for d in desc}
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        else:
            mism = {c: (stypes[c], otypes[c]) for c in scols if stypes[c] != otypes[c]}
            if mism:
                problems.append(f"types differ (spark, oracle): {mism}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            sn, on = normalize(srows, scols), normalize(orows, ocols)
            if sn != on:
                diff = [(a, b) for a, b in zip(sn, on) if a != b][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name}: {len(srows)} rows")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
