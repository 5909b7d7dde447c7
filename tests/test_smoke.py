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
