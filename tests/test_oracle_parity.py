"""Mirror of the driver's correctness gate: run every ``queries()`` entry on
Spark AND its ``oracle_sql()`` twin on DuckDB over the same parquet tables,
then compare row count, column names, and order-insensitive values.

Comparison is EXACT (string-normalized cell values) — stricter than any
plausible hash, so passing here should imply passing the driver's check.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "<nan>"
        return repr(v)  # full precision — bit-exactness required
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: columns differ: spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count differs: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    s, d = _canon(spark_cols, spark_rows), _canon(duck_cols, duck_rows)
    if s != d:
        diffs = [(a, b) for a, b in zip(s, d) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_no_hugeint_oracle_outputs(sf_dir):
    """No oracle may emit HUGEINT/UHUGEINT (r3/r4 ``sessionize`` red row:
    DuckDB types an un-cast window SUM over INTEGER as int128, Spark emits
    bigint, and the driver's value hash is type-encoding-sensitive — values
    can be identical and still mismatch).  Plan-only: LIMIT 0, no Spark.
    """
    con = _duck(sf_dir)
    bad = []
    for name, sql in ORACLES.items():
        rel = con.sql(f"SELECT * FROM ({sql}) __q LIMIT 0")
        for col, typ in zip(rel.columns, rel.types):
            if str(typ) in ("HUGEINT", "UHUGEINT"):
                bad.append(f"{name}.{col}: {typ}")
    con.close()
    assert not bad, f"un-cast int128 oracle outputs (CAST ... AS BIGINT): {bad}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_smoke(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert len(df.collect()) >= 0 and df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns[0] == "l_returnflag"
