"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 and compare it with its oracle_sql() via DuckDB — row count, column
names, and order-insensitive exact values (the driver value-hashes, so the
comparison here is exact, not approximate)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

_Q = entrymod.queries()
_O = entrymod.oracle_sql()


@pytest.fixture(scope="session")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = "NaN" if math.isnan(v) else repr(round(v, 9))
            elif isinstance(v, bool):
                v = f"b{int(v)}"
            elif v is None:
                v = "\x00NULL"
            else:
                v = str(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return out


def test_all_queries_have_callables():
    assert len(_Q) >= 40
    for name in _O:
        assert name in _Q, f"oracle without query: {name}"


@pytest.mark.parametrize("name", sorted(_O))
def test_oracle_parity(spark, ddb, name):
    sdf = _Q[name](spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    scols = [c.lower() for c in sdf.columns]
    ores = ddb.sql(_O[name])
    orows = ores.fetchall()
    ocols = [c.lower() for c in ores.columns]
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch"
    assert len(srows) == len(orows), (
        f"{name}: row count {len(srows)} vs oracle {len(orows)}"
    )
    a, b = canon(srows, scols), canon(orows, ocols)
    if a != b:
        diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "url", "score"} <= set(df.columns)
