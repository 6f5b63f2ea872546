"""Local mini-driver: run every queries() entry on Spark AND its
oracle_sql() on DuckDB at sf0.001, compare row-count + schema-width +
order-insensitive value equality (mirrors the driver's correctness gate)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.001")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    try:  # Decimal and friends
        import decimal
        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted((tuple(_norm(r[i]) for i in order) for r in rows),
                  key=lambda row: tuple((v is None, str(type(v)), v)
                                        for v in row))


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [f.name.lower() for f in sdf.schema.fields]
    spark_rows = [tuple(r) for r in sdf.collect()]

    osql = entrymod.oracle_sql().get(name)
    if osql is None:
        assert len(spark_rows) >= 0  # rows-only check
        return
    rel = duck.sql(osql)
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), \
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), \
        f"{name}: row counts differ: {len(spark_rows)} vs {len(duck_rows)}"
    a = _rowset(spark_cols, spark_rows)
    b = _rowset(duck_cols, duck_rows)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
