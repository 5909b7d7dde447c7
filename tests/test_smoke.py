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


def test_cmdb_engine_facade(spark, sf_dir):
    """CmdbEngine delegates to the oracle-tested operator machinery:
    scan, encoded query, closure, components, transform-map upsert,
    and corpus dup-clustering all run end-to-end from the facade."""
    from pyspark.sql import functions as F

    from servicenow_cmdb_integration_to_aws_spark import CmdbEngine
    from servicenow_cmdb_integration_to_aws_spark.operators.transform_map import (
        FieldMap,
    )

    eng = CmdbEngine(spark, sf_dir)
    assert eng.table("region").count() == 5
    assert (
        eng.encoded_query("orders", "o_orderstatus=O^o_totalprice>300000").count()
        > 0
    )
    edges = eng.table("nation").select(
        F.col("n_regionkey").cast("string").alias("parent"),
        F.col("n_nationkey").cast("string").alias("child"),
    )
    assert eng.closure(edges).count() == 25
    staging = eng.table("customer").limit(10).select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("nm")
    )
    target = eng.table("customer").select("c_custkey", "c_name")
    merged = eng.transform_map(
        staging,
        [FieldMap("k", "c_custkey"), FieldMap("nm", "c_name", fn=F.upper)],
        target,
        "c_custkey",
    )
    assert merged.filter(F.col("row_source") == "update").count() == 10
    docs = eng.table("documents").limit(80).select("doc_id", "text")
    clusters = eng.dup_clusters(docs)
    assert clusters.count() == 80  # every doc gets a component label


def test_cmdb_engine_facade_tokens_and_range_join(spark, sf_dir):
    """Facade round 2b: token_counts matches j18's per-doc regex;
    range_join reproduces c14's matched pairs on the events table."""
    from pyspark.sql import functions as F

    from servicenow_cmdb_integration_to_aws_spark import CmdbEngine

    eng = CmdbEngine(spark, sf_dir)
    docs = eng.table("documents").select("doc_id", "text")
    tc = eng.token_counts(docs)
    assert tc.filter(F.col("n_tokens") <= 0).count() == 0
    assert tc.count() == docs.count()

    ev = eng.table("events")
    win = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    pts = ev.filter(F.col("event_type") != "purchase").select(
        F.col("event_id").alias("p_id"), "user_id", "ts", "value"
    )
    got = eng.range_join(win, pts, "user_id")
    naive = win.alias("w").join(
        pts.alias("p"),
        (F.col("w.user_id") == F.col("p.user_id"))
        & (F.col("p.ts") > F.col("w.start_ts"))
        & (F.col("p.ts") <= F.col("w.end_ts")),
    )
    assert got.count() == naive.count() > 0
