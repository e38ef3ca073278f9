"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry from __spark_entry__.py against its
``oracle_sql()`` DuckDB twin at sf0.01 and reports row-count, schema
(sorted column names), and order-insensitive value-hash matches.

Usage: python tools/oracle_check.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import importlib.util
import math
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ["PYTHONPATH"] = "/root/repo" + os.pathsep + os.environ.get("PYTHONPATH", "")

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # round to 6 significant-ish decimals to absorb engine float noise
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def table_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted(
        "\x01".join(norm_value(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(only: list[str]):
    from vanus_spark.session import get_spark

    m = load_entry()
    spark = get_spark("oracle_check", 16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = m.queries()
    oracles = m.oracle_sql()
    names = only or list(qs)
    passed = failed = rows_only = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NOT FOUND")
            continue
        try:
            sdf = qs[name](spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {str(e)[:200]}")
            failed += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows) [no oracle]")
            rows_only += 1
            continue
        try:
            res = con.sql(oracles[name])
            drows = res.fetchall()
            dcols = res.columns
        except Exception as e:  # noqa: BLE001
            print(f"{name}: DUCKDB ERROR {str(e)[:200]}")
            failed += 1
            continue
        ok_count = len(srows) == len(drows)
        ok_schema = sorted(scols) == sorted(dcols)
        sh = table_hash([tuple(r) for r in srows], scols)
        dh = table_hash(drows, dcols)
        ok_hash = sh == dh
        status = "OK" if (ok_count and ok_schema and ok_hash) else "MISMATCH"
        if status == "OK":
            passed += 1
        else:
            failed += 1
        print(
            f"{name}: {status} rows={len(srows)}/{len(drows)} "
            f"schema={'ok' if ok_schema else f'{sorted(scols)} vs {sorted(dcols)}'} "
            f"hash={'ok' if ok_hash else f'{sh} vs {dh}'}"
        )
        if status == "MISMATCH" and len(srows) <= 20 and len(drows) <= 20:
            print("  spark :", sorted(tuple(r) for r in srows)[:5])
            print("  duckdb:", sorted(drows)[:5])
    print(f"\n{passed} ok, {failed} failed, {rows_only} rows-only of {len(names)}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
