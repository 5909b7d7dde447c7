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


def test_cmdb_engine_facade_session4_surface(spark, sf_dir):
    """Facade round 5d: sessionize/scd2/profile/semdedup/compact/
    zorder_write/sql delegate to the oracle-tested machinery and
    agree with the registered queries where one exists."""
    import glob
    import tempfile

    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from servicenow_cmdb_integration_to_aws_spark import CmdbEngine

    eng = CmdbEngine(spark, sf_dir)
    ev = eng.table("events")

    # sessionize ≡ e12 (same defaults)
    got = eng.sessionize(ev).count()
    want = entrymod.queries()["e12_sessionize"](spark, sf_dir).count()
    assert got == want

    # scd2 over the event-type change log: versions cover all users
    ch = ev.select("user_id", F.col("event_type").alias("state"), "ts", "event_id")
    scd = eng.scd2(ch)
    assert scd.filter(F.col("is_current")).count() == ev.select("user_id").distinct().count()

    # profile: one row per column, zero nulls in lineitem keys
    prof = {r["column_name"]: r for r in eng.profile(
        eng.table("lineitem").select("l_orderkey", "l_suppkey"),
        ["l_orderkey", "l_suppkey"],
    ).collect()}
    assert prof["l_suppkey"]["n_null"] == 0 and int(prof["l_suppkey"]["n_distinct"]) > 0

    # semdedup default ≡ j41
    assert eng.semdedup().count() == entrymod.queries()["j41_semdedup"](spark, sf_dir).count()

    # compact: fragmented dir → fewer files, equal rows
    frag = tempfile.mkdtemp(prefix="facade_frag_")
    eng.table("region").repartition(16).write.mode("overwrite").parquet(frag)
    out = eng.compact(frag)
    assert len(glob.glob(out + "/*.parquet")) < 16
    assert spark.read.parquet(out).count() == 5

    # zorder_write: readable, row-complete
    zdir = tempfile.mkdtemp(prefix="facade_z_")
    eng.zorder_write(
        eng.table("lineitem").select("l_partkey", "l_suppkey"),
        "l_partkey", "l_suppkey", zdir,
    )
    assert spark.read.parquet(zdir).count() == eng.table("lineitem").count()

    # sql surface
    n = eng.sql("SELECT COUNT(*) AS n FROM sqlv_orders").collect()[0]["n"]
    assert n == eng.table("orders").count()


def test_facade_warehouse_surface(spark, tmp_path):
    """CmdbEngine warehouse delegation (r12): snapshot_store /
    consistent_read / store_group wire to the oracle-tested compaction
    machinery — one end-to-end pass over a tiny shared log."""
    import datetime
    import os

    from servicenow_cmdb_integration_to_aws_spark import CmdbEngine

    eng = CmdbEngine(spark, str(tmp_path))
    log = str(tmp_path / "log")
    sa = eng.snapshot_store(
        str(tmp_path / "a"), key="user_id", order=["ts", "event_id"]
    )
    sb = eng.snapshot_store(
        str(tmp_path / "b"), key="user_id", order=["ts", "event_id"]
    )
    spark.createDataFrame(
        [
            (1, 10, datetime.datetime(2024, 1, 1, 12)),
            (2, 10, datetime.datetime(2024, 1, 1, 13)),
            (3, 20, datetime.datetime(2024, 1, 1, 14)),
        ],
        "event_id long, user_id long, ts timestamp",
    ).write.parquet(os.path.join(log, "batch_id=0"))
    assert sa.compact(spark, log) == 1
    assert sb.compact(spark, log) == 1
    h, (da, db) = eng.consistent_read([(sa, log), (sb, log)])
    assert h == 0
    assert sorted(map(tuple, da.collect())) == sorted(map(tuple, db.collect()))
    assert da.count() == 2  # latest per user: users 10 and 20
    group = eng.store_group(str(tmp_path / "grp"), {"a": sa, "b": sb})
    with group.commit():
        pass  # members already folded; publish {a: 1, b: 1}
    assert group.manifest() == {"a": 1, "b": 1}
    assert group.read_pinned(spark)["a"].count() == 2
