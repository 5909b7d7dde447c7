"""REST-source connector tests: filter pushdown really happens,
unsupported predicates stay in Spark, and paging partitions the read.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from servicenow_cmdb_integration_to_aws_spark.sources import rest_source
from servicenow_cmdb_integration_to_aws_spark.sources.tables import (
    SCHEMAS,
    path_of,
    scan,
)


def _read(spark, sf_dir, **options):
    rest_source.register(spark)
    r = spark.read.format("snow_table").schema(SCHEMAS["customer"])
    for k, v in options.items():
        r = r.option(k, v)
    return r.option("path", path_of(sf_dir, "customer")).load()


def test_filters_are_pushed_to_server(spark, sf_dir):
    """The translated encoded query must reach the server — i.e. the
    predicates left Spark."""
    df = _read(spark, sf_dir).filter(
        (F.col("c_acctbal") > 1000.0)
        & F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    )
    n = df.count()
    pushed = rest_source.last_pushed(path_of(sf_dir, "customer"))
    assert "c_acctbal>1000.0" in pushed, pushed
    assert "c_mktsegmentINBUILDING,AUTOMOBILE" in pushed, pushed
    # and the server-filtered result matches a local parquet evaluation
    expect = (
        scan(spark, sf_dir, "customer")
        .filter(
            (F.col("c_acctbal") > 1000.0)
            & F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        )
        .count()
    )
    assert n == expect


def test_unsupported_filter_stays_in_spark(spark, sf_dir):
    """An expression the Table API grammar can't express (length())
    must NOT be pushed — Spark re-applies it post-scan and the result
    is still correct (the DSv2 residual-filter contract)."""
    df = _read(spark, sf_dir).filter(
        (F.length("c_name") % 2 == 0) & (F.col("c_acctbal") > 0.0)
    )
    n = df.count()
    pushed = rest_source.last_pushed(path_of(sf_dir, "customer"))
    # the length() expression itself is not translatable and must stay
    # in Spark; only its null-intolerance (ISNOTEMPTY) may be pushed
    for term in pushed.split("^"):
        if term.startswith("c_name"):
            assert term == "c_nameISNOTEMPTY", pushed
    assert "c_acctbal>0.0" in pushed, pushed
    expect = (
        scan(spark, sf_dir, "customer")
        .filter((F.length("c_name") % 2 == 0) & (F.col("c_acctbal") > 0.0))
        .count()
    )
    assert n == expect


def test_paged_read_partitions_and_reassembles(spark, sf_dir):
    """page_size < table size → multiple input partitions; the union of
    pages must equal the plain scan exactly (no dup/lost rows)."""
    df = _read(spark, sf_dir, page_size="100")
    assert df.rdd.getNumPartitions() > 1
    got = sorted(r["c_custkey"] for r in df.collect())
    expect = sorted(
        r["c_custkey"] for r in scan(spark, sf_dir, "customer").collect()
    )
    assert got == expect
