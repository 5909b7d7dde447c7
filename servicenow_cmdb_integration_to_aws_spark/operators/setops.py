"""Category G — set operations (SURVEY §2.G).

Encoded-query analogue: `^NQ` (query union) and reconciliation deltas
between sync runs [SN-API].

100 TB notes: union is a zero-shuffle concatenation of partitions;
distinct/intersect/except shuffle on the full row — project to the key
columns FIRST (as done here) so the shuffle payload is minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import scan


@query(
    "g1_union_all",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
    WHERE o_totalprice > 400000
    """,
)
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union by name (g1) — `^NQ`; overlap rows duplicated."""
    o = scan(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return o.filter(F.col("o_orderstatus") == "O").unionByName(
        o.filter(F.col("o_totalprice") > 400000)
    )


@query(
    "g2_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
)
def g2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union (g2)."""
    c = scan(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .union(c.filter(F.col("c_acctbal") > 9000).select("c_custkey"))
        .distinct()
    )


@query(
    "g3_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    """,
)
def g3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set intersection (g3)."""
    c = scan(spark, sf_dir, "customer")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .intersect(c.filter(F.col("c_acctbal") > 0).select("c_custkey"))
    )


@query(
    "g4_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def g4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set difference (g4) — delta detection between sync runs:
    customers never seen in orders (orphan-CI analogue)."""
    c = scan(spark, sf_dir, "customer").select("c_custkey")
    o = scan(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.subtract(o)
