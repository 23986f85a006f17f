"""Smoke tests for the driver contract (__spark_entry__)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "_id" in df.columns


def test_registry_shapes():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs)
    # the vast majority must be oracle-checked, not rows-only
    assert len(oracles) >= 0.8 * len(qs)


def test_all_queries_buildable_lazily(spark):
    """Every query constructs a DataFrame (plan analysis only, no
    execution) on sf0.001."""
    for name, fn in entrymod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.schema is not None, name
