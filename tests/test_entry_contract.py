"""Driver-contract smoke tests: the exact calls the build driver makes."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert len(df.columns) == 5
    assert df.count() > 0


def test_queries_and_oracles_aligned():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 35
    # every oracle key must have a query; rows-only queries are the
    # documented exceptions
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"simhash_signatures"}


def test_registry_callables_run(spark, sf_dir):
    """Every registered query executes and yields a schema at sf0.001."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, f"{name} returned no columns"
