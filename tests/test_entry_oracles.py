"""Driver-gate emulation: run every queries() entry and compare against
its oracle_sql() in DuckDB — row count, column names, and
order-insensitive value multiset (the CORRECTNESS_r{N}.json contract).

Default SF is 0.001 to keep the CI suite fast (the driver runs the SAME
harness at sf0.01 itself every round — this test exists to catch gate
breakage before the driver does, and every query/oracle pair is
scale-free). Run the driver-exact scale with
``WAL_ORACLE_SF=/root/testdata/sf0.01 pytest tests/test_entry_oracles.py``.
A sentinel test asserts every query returns non-trivial rows at the CI
scale so empty-vs-empty can never pass silently."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("WAL_ORACLE_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm(v):
    """Totally-ordered normalization (NULLs sort below everything and
    never compare against other types — mixed None/int columns are
    legitimate, e.g. permissive-cast NULLs)."""
    if v is None:
        return (0, "")
    if isinstance(v, bool):
        return (1, v)
    if isinstance(v, float):
        return (2, round(v, 6))
    if isinstance(v, int):
        return (2, v)
    return (3, str(v))


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm(r[i]) for i in order) for r in rows
    )


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    df = q(spark, SF_DIR)
    spark_cols = df.columns
    spark_rows = [tuple(r) for r in df.collect()]

    # non-trivial at CI scale: every registered query yields rows at
    # sf0.001 (verified per-query), so empty-vs-empty can never pass
    assert len(spark_rows) > 0, f"{name}: empty result at {SF_DIR}"

    if name not in oracles:
        # rows-only contract for non-SQL-expressible ops
        return

    res = ddb.execute(oracles[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(ddb_cols), (
        f"{name}: columns {spark_cols} vs oracle {ddb_cols}"
    )
    assert len(spark_rows) == len(ddb_rows), (
        f"{name}: {len(spark_rows)} rows vs oracle {len(ddb_rows)}"
    )
    s = _rows_to_multiset(spark_cols, spark_rows)
    o = _rows_to_multiset(ddb_cols, ddb_rows)
    if s != o:
        diff = [(a, b) for a, b in zip(s, o) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
