"""Smoke: driver contract shape + flagship query end-to-end at sf0.001."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_contract_shape():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "no queries registered"
    assert set(o) <= set(q), "oracle id without a query"
    # every callable takes (spark, sf_dir)
    for qid, fn in q.items():
        assert callable(fn), qid


def test_entry_flagship(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"l_returnflag", "l_linestatus", "sum_qty", "count_order"} <= cols


def test_every_query_runs_sf0001(spark, sf_dir):
    """Each registered query executes and yields a stable schema at sf0.001."""
    for qid, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, qid
        df.limit(5).collect()
