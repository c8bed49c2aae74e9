"""Meta-tests of the driver contract itself: registry shape, oracle key
consistency, entry() schema stability — the things the driver assumes before
it even compares values."""

from __future__ import annotations

import inspect

import __spark_entry__ as entry_mod


def test_oracle_keys_subset_of_queries():
    qs, osql = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 70


def test_query_callables_take_spark_and_sfdir():
    for name, fn in entry_mod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir): {params}"


def test_oracle_sql_mentions_registered_tables_only():
    tables = {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    for name, sql in entry_mod.oracle_sql().items():
        low = sql.lower()
        assert any(t in low for t in tables), f"{name} references no fixture table"


def test_entry_is_stable(spark):
    a = entry_mod.entry(spark)
    b = entry_mod.entry(spark)
    assert a.schema == b.schema
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
