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


@query(
    "g7_delta_detect",
    oracle="""
    WITH old AS (
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_custkey % 97 <> 0
    ),
    new AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 31 = 0
                    THEN ROUND(c_acctbal + 100.0, 2) ELSE c_acctbal
               END AS c_acctbal
        FROM customer
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_acctbal FROM customer
        WHERE c_custkey % 53 = 0
    )
    SELECT COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
           CASE WHEN o.c_custkey IS NULL THEN 'insert'
                WHEN n.c_custkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           o.c_acctbal AS old_acctbal,
           n.c_acctbal AS new_acctbal
    FROM old o FULL JOIN new n ON o.c_custkey = n.c_custkey
    WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
       OR o.c_acctbal <> n.c_acctbal OR o.c_name <> n.c_name
    """,
)
def g7_delta_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot delta detection (g7) — the sync-diff primitive: given
    the PREVIOUS and CURRENT version of a table (here derived
    deterministically from customer: some keys deleted, some balances
    changed, some rows new), classify every difference as
    insert / delete / update. One co-partitioned full-outer join on the
    key; unchanged rows are filtered inside the join's output before
    anything else touches them.

    At 100 TB the two snapshots are both cluster-resident parquet
    (yesterday's and today's extract); the full-outer on the key is one
    shuffle each, and column comparison happens post-join without
    materializing unchanged rows — the delta (typically <<1% of rows)
    is all that flows downstream (i9/i11 apply it)."""
    c = scan(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    old = c.filter(F.col("c_custkey") % 97 != 0)
    new = c.withColumn(
        "c_acctbal",
        F.when(
            F.col("c_custkey") % 31 == 0, F.round(F.col("c_acctbal") + 100.0, 2)
        ).otherwise(F.col("c_acctbal")),
    ).unionByName(
        c.filter(F.col("c_custkey") % 53 == 0).withColumn(
            "c_custkey", F.col("c_custkey") + 1000000
        )
    )
    o = old.select(
        F.col("c_custkey").alias("o_key"),
        F.col("c_name").alias("o_name"),
        F.col("c_acctbal").alias("old_acctbal"),
    )
    n = new.select(
        F.col("c_custkey").alias("n_key"),
        F.col("c_name").alias("n_name"),
        F.col("c_acctbal").alias("new_acctbal"),
    )
    j = o.join(n, F.col("o_key") == F.col("n_key"), "full")
    return j.filter(
        F.col("o_key").isNull()
        | F.col("n_key").isNull()
        | (F.col("old_acctbal") != F.col("new_acctbal"))
        | (F.col("o_name") != F.col("n_name"))
    ).select(
        F.coalesce("n_key", "o_key").alias("c_custkey"),
        F.when(F.col("o_key").isNull(), "insert")
        .when(F.col("n_key").isNull(), "delete")
        .otherwise("update")
        .alias("change_type"),
        "old_acctbal",
        "new_acctbal",
    )


@query(
    "g8_orphan_audit",
    oracle="""
    SELECT 'lineitem->orders' AS fk_edge,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans,
           CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'orders->customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM orders) AS BIGINT)
    UNION ALL
    SELECT 'customer->nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT),
           CAST((SELECT COUNT(*) FROM customer) AS BIGINT)
    """,
)
def g8_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (g8): orphan counts across every
    foreign-key edge of the star — rows whose parent is missing. A
    CMDB without enforced constraints (ServiceNow reference fields
    don't cascade; AWS feeds arrive out of order) accumulates orphans
    silently; this is the nightly sweep that catches them, and the
    zero rows here are the PROOF of integrity, not a triviality.

    100 TB notes: each edge is one LEFT-ANTI join — dimension sides
    broadcast (nation, customer at ratio), the fact-fact edge
    (lineitem→orders) co-partitions on the orderkey; counts
    partial-agg to one row per edge. At scale this runs incrementally
    on a16's change feed (audit the delta, not the corpus) — the
    full-scan form here is the backfill/bootstrap shape."""
    li = scan(spark, sf_dir, "lineitem").select("l_orderkey")
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = scan(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = scan(spark, sf_dir, "nation").select("n_nationkey")

    def edge(name, child, parent, ck, pk):
        orphans = child.join(
            parent, F.col(ck) == F.col(pk), "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = child.agg(F.count(F.lit(1)).alias("n_rows"))
        return orphans.crossJoin(total).select(
            F.lit(name).alias("fk_edge"), "n_orphans", "n_rows"
        )

    return (
        edge("lineitem->orders", li, o.select("o_orderkey"), "l_orderkey", "o_orderkey")
        .unionByName(
            edge("orders->customer", o, c.select("c_custkey"), "o_custkey", "c_custkey")
        )
        .unionByName(
            edge("customer->nation", c, n, "c_nationkey", "n_nationkey")
        )
    )
