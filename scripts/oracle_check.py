"""Local replica of the driver's CORRECTNESS check: run every
__spark_entry__.queries() entry at sf0.01 next to its oracle_sql() in
DuckDB and compare row count, schema (column names), and a value hash
over column-name-sorted, row-sorted data.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):  # noqa: ANN001
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(_norm(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from webxtract.session import get_spark

    # Mirror the DRIVER's seat: it hands queries() a default Spark 4
    # session, where spark.sql.ansi.enabled=true. Round 3 shipped a bare
    # element_at that only crashes under ANSI — invisible to the old
    # replica because get_spark pins ansi=false. Default the replica to
    # ANSI-ON; set WEBXTRACT_ORACLE_ANSI=false to test the lenient leg.
    ansi = os.environ.get("WEBXTRACT_ORACLE_ANSI", "true")
    spark = get_spark(
        "oracle-check", master="local[8]", shuffle_partitions=8,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.ansi.enabled": ansi,
        },
    )
    spark.conf.set("spark.sql.ansi.enabled", ansi)
    print(f"oracle_check: spark.sql.ansi.enabled={ansi}", flush=True)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    report = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            report[name] = {"err": f"spark: {e}"}
            print(name, report[name], flush=True)
            continue
        if name not in oracles:
            report[name] = {"spark_rows": len(srows), "err": "no_oracle"}
            print(name, report[name], flush=True)
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            report[name] = {"err": f"duckdb: {e}"}
            print(name, report[name], flush=True)
            continue
        rows_match = len(srows) == len(orows)
        schema_match = sorted(scols) == sorted(ocols)
        hash_match = (
            _hash(srows, scols) == _hash(orows, ocols)
            if rows_match and schema_match
            else False
        )
        report[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
        }
        print(name, report[name], flush=True)

    bad = [n for n, r in report.items() if r.get("hash_match") is False or "err" in r and r["err"] != "no_oracle"]
    print(json.dumps({"bad": bad}))
    spark.stop()


if __name__ == "__main__":
    main()
