"""Driver-contract sanity: entry() runs, queries/oracles align."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_queries_and_oracles_align():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 10


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    cols = set(df.columns)
    assert {"conv_id", "bucket_ts", "n_points"} <= cols
