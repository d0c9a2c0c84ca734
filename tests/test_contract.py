"""Mirror of the driver's correctness gate: run every queries() entry
on sf0.001 and compare against its DuckDB oracle — row count, sorted
column names, order-insensitive value hash."""

import hashlib

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _cell(v) -> str:
    import decimal

    import numpy as np

    if v is None or (isinstance(v, float) and pd.isna(v)) or v is pd.NA:
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, (int, np.integer, float, np.floating, decimal.Decimal)):
        # uniform numeric form: DuckDB HUGEINT arrives as float64 while
        # Spark returns int64 — compare value, not dtype
        return f"{float(v):.6f}"
    return str(v)


def _normalize(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(
        "|".join(_cell(v) for v in r) for r in df.itertuples(index=False)
    )
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as m

    return m


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    rows = df.limit(50).collect()
    assert len(rows) > 0
    assert {"url", "extracted_text", "success"} <= set(df.columns)


def test_all_queries_against_oracles(spark, entry_mod, duck):
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(queries)
    failures = []
    for name, fn in queries.items():
        sdf = fn(spark, SF_DIR).toPandas()
        if name not in oracles:
            assert len(sdf) >= 0  # rows-only check
            continue
        odf = duck.sql(oracles[name]).df()
        if len(sdf) != len(odf):
            failures.append(f"{name}: rows {len(sdf)} != {len(odf)}")
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append(f"{name}: cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
            continue
        if _normalize(sdf) != _normalize(odf):
            merged = sdf[sorted(sdf.columns)].sort_values(sorted(sdf.columns)[0]).head(3)
            omerged = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)[0]).head(3)
            failures.append(f"{name}: value hash mismatch\n spark: {merged}\n duck: {omerged}")
    assert failures == [], "\n".join(str(f)[:1500] for f in failures)
