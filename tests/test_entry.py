"""Smoke tests of the driver contract in __spark_entry__.py."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_queries_oracle_keys_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "no queries registered"
    assert set(o) <= set(q)
