"""Standalone driver-style oracle check: run queries() vs oracle_sql() at a
given sf and compare rows/schema/value-hash the way the driver does.

Usage: python tests/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if v is None:
        return "\0"
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("oracle_check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    os_ = E.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in os_:
            print(f"{name}: rows={len(srows)} (no_oracle)")
            continue
        orel = con.execute(os_[name])
        ocols = [d[0] for d in orel.description]
        orows = orel.fetchall()
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        sh = value_hash([tuple(r) for r in srows], scols)
        oh = value_hash(orows, ocols)
        hash_ok = sh == oh
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            bad += 1
        print(
            f"{name}: {status} rows {len(srows)}/{len(orows)} "
            f"schema={schema_ok} hash={hash_ok}"
        )
        if not schema_ok:
            print(f"   spark cols: {sorted(scols)}\n   oracle cols: {sorted(ocols)}")
        if rows_ok and schema_ok and not hash_ok and len(srows) <= 30:
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            ss = sorted(tuple(_norm(r[i]) for i in order) for r in srows)
            oo = sorted(tuple(_norm(r[i]) for i in order) for r in orows)
            for a, b in zip(ss, oo):
                if a != b:
                    print(f"   spark : {a}\n   oracle: {b}")
                    break
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
