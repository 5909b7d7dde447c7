"""Category B — projections / filters / predicates (SURVEY §2.B).

Each operator names its ServiceNow encoded-query analogue [SN-API]
(``sysparm_query`` grammar: `field=value^field2>value2^OR...`). All are
native Column expressions → Catalyst pushes them into the parquet scan
(verify: `.explain` shows PushedFilters). No Python UDFs anywhere here.

100 TB notes (whole category): pure map-side predicates/projections —
zero shuffles, zero state; filters reach the scan as PushedFilters (at
real scale that is row-group/page skipping via parquet min-max stats,
and partition pruning where the layout provides it), projections reach
it as ReadSchema column pruning. Cost scales with bytes actually read,
which these operators themselves minimize; pinned by
tests/test_plans.py (pushdown + pruning + codegen gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import scan


@query(
    "b1_project",
    oracle="""
    SELECT c_custkey AS id, c_name AS name, c_mktsegment AS segment
    FROM customer
    """,
)
def b1_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection — `sysparm_fields` (b1): select/rename/drop."""
    c = scan(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


@query(
    "b2_computed",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def b2_computed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed column (b2). Same IEEE expression shape as the oracle →
    bit-identical doubles (inputs are the same parquet values)."""
    li = scan(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


@query(
    "b3_eq_filter",
    oracle="""
    SELECT * FROM orders
    WHERE o_orderstatus = 'O' AND o_orderpriority <> '1-URGENT'
    """,
)
def b3_eq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality / inequality — encoded `=` / `!=` (b3)."""
    o = scan(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "O") & (F.col("o_orderpriority") != "1-URGENT")
    )


@query(
    "b4_cmp_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
    FROM lineitem
    WHERE l_shipdate > TIMESTAMP '1998-01-01' AND l_quantity >= 30
    """,
)
def b4_cmp_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered comparison incl. timestamps — encoded `>` `>=` (b4)."""
    li = scan(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") >= 30)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")


@query(
    "b5_like",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_name LIKE '%gear%' OR starts_with(p_name, 'red')
       OR p_type LIKE '%OMY'
    """,
)
def b5_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring/prefix/suffix — encoded LIKE/STARTSWITH/ENDSWITH (b5)."""
    p = scan(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").contains("gear")
        | F.col("p_name").startswith("red")
        | F.col("p_type").endswith("OMY")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "b6_in",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def b6_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership — encoded `IN` (b6)."""
    c = scan(spark, sf_dir, "customer")
    return c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")).select(
        "c_custkey", "c_mktsegment"
    )


@query(
    "b7_null",
    oracle="""
    SELECT c_custkey,
           (c_name IS NULL OR c_name = '') AS name_empty
    FROM customer
    WHERE c_acctbal IS NOT NULL
    """,
)
def b7_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null/empty tests — encoded ISEMPTY/ISNOTEMPTY (b7)."""
    c = scan(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal").isNotNull()).select(
        "c_custkey",
        (F.col("c_name").isNull() | (F.col("c_name") == "")).alias("name_empty"),
    )


@query(
    "b8_between",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 200000
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    """,
)
def b8_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-range predicate — encoded BETWEEN (b8)."""
    o = scan(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_totalprice").between(100000, 200000)
        & F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    ).select("o_orderkey", "o_totalprice", "o_orderdate")


@query(
    "b9_sameas",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount, l_tax
    FROM lineitem WHERE l_discount = l_tax
    """,
)
def b9_sameas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-to-field comparison — encoded SAMEAS (b9)."""
    li = scan(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_discount") == F.col("l_tax")).select(
        "l_orderkey", "l_linenumber", "l_discount", "l_tax"
    )


@query(
    "b10_boolcomp",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus = 'F' AND o_totalprice > 250000)
       OR (o_orderpriority = '1-URGENT' AND NOT o_orderstatus = 'O')
    """,
)
def b10_boolcomp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean composition — encoded `^` AND / `^OR` / negation (b10)."""
    o = scan(spark, sf_dir, "orders")
    return o.filter(
        ((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 250000))
        | ((F.col("o_orderpriority") == "1-URGENT") & ~(F.col("o_orderstatus") == "O"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "b11_reldate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-09-02' - INTERVAL 90 DAY
      AND l_shipdate < TIMESTAMP '1998-09-02'
    """,
)
def b11_reldate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-date filter — `gs.daysAgoStart(n)` pattern (b11).

    The anchor is an explicit parameter (never wall-clock) so results
    are deterministic; the CMDB incremental-poll analogue passes "now".
    """
    anchor = F.lit("1998-09-02").cast("timestamp")
    li = scan(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= anchor - F.expr("INTERVAL 90 DAYS"))
        & (F.col("l_shipdate") < anchor)
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@query(
    "b12_regex",
    oracle="""
    SELECT p_partkey, p_name,
           regexp_extract(p_name, '^([a-z]+) ([a-z]+)$', 1) AS adjective
    FROM part
    WHERE regexp_matches(p_name, '^(red|blue|green) ')
    """,
)
def b12_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex predicate + extraction (b12). Patterns stay in the
    Java/RE2-common subset so Spark and DuckDB agree."""
    p = scan(spark, sf_dir, "part")
    return p.filter(F.col("p_name").rlike("^(red|blue|green) ")).select(
        "p_partkey",
        "p_name",
        F.regexp_extract("p_name", "^([a-z]+) ([a-z]+)$", 1).alias("adjective"),
    )


@query(
    "b16_bloom_join",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 400000.0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def b16_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter pruned join (b16): a selective predicate on
    the orders side injects a bloom filter onto the lineitem probe
    scan, discarding non-joining rows BEFORE the shuffle — Spark's
    runtime row-level filter (the complement of b15's partition-level
    DPP). Results are identical with or without the filter (bloom is
    may-contain); only the shuffled volume changes.

    100 TB notes: THE mechanism for selective fact-fact joins too big
    to broadcast — at 1000 executors the probe side ships only rows
    whose keys might join, cutting shuffle I/O by the predicate's
    selectivity. The conf thresholds (creation side ≤ a few hundred MB,
    probe side huge) are exactly the 100 TB regime; locally they're
    lowered so the sf0.1 plan exercises the same path
    (tests/test_plans.py pins BloomFilterMightContain + the semi-join
    aggregate in the creation subquery). The merge hint forces the
    shuffle join the bloom path targets — at real scale AQE makes that
    choice by size."""
    from .numeric import dec, dsum

    o = scan(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000.0)
    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    df = (
        li.hint("merge")
        .join(o.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(dec("l_extendedprice")).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )
    # Runtime-settable optimizer confs, scoped to THIS plan: lowered
    # thresholds make the injection fire at sf0.1 sizes (at 100 TB the
    # defaults fire on their own). Touching optimizedPlan() memoizes
    # the bloom-injected plan inside df's QueryExecution; the session
    # confs are restored immediately so no other query's (pinned,
    # tested) plan shape changes.
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # model the 100 TB regime where NEITHER side broadcasts: the
        # injection rule (correctly) skips bloom when the creation side
        # could broadcast, since a BHJ needs no runtime filter.
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        df._jdf.queryExecution().optimizedPlan()
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df
