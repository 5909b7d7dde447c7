"""Golden end-to-end queries (SURVEY §5.5) — TPC-H-derived analogues
adapted to the driver's column set.

These exercise the full relational stack in one plan each (multi-way
broadcast + shuffle joins, pushed filters, decimal-exact money math,
grouped agg, top-k) the way real reporting queries do — the per-
operator ids (§2) isolate features; these prove composition.

100 TB notes: both plans are the canonical star-join shape — dims
(region/nation/customer-filter) broadcast, the orders⋈lineitem spine
shuffles once on the join key, aggregation reuses that partitioning,
and the final top-k is TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import scan
from .numeric import dec, dsum

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


@query(
    "t1_golden_q3",
    oracle=f"""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, o_orderkey
    LIMIT 10
    """,
)
def t1_golden_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q3 analogue — shipping priority: top-10 unshipped-revenue
    orders for one market segment. customer filter broadcasts into the
    orders⋈lineitem spine; both date filters push to the parquet scans."""
    c = scan(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = scan(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = scan(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        F.broadcast(c.select("c_custkey"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "o_orderdate", "o_orderkey")
        .limit(10)
    )


@query(
    "t2_golden_q5",
    oracle=f"""
    SELECT n_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM region
    JOIN nation ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def t2_golden_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q5 analogue — local-supplier volume: revenue where the
    supplier sits in the customer's (ASIA) nation. Five-way star join:
    region→nation→customer resolve via broadcasts; orders⋈lineitem is
    the shuffled spine; the supplier 'local' condition is the classic
    co-nation equi-predicate."""
    r = scan(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = scan(spark, sf_dir, "nation")
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    li = scan(spark, sf_dir, "lineitem")
    s = scan(spark, sf_dir, "supplier")
    cust = (
        F.broadcast(r.select("r_regionkey"))
        .join(n, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(c, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
    )
    return (
        o.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "t3_golden_q10",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-10-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def t3_golden_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q10 analogue — returned-item reporting: top-20 customers
    by revenue lost to returns in one quarter. Same star shape as
    t1/t2: nation broadcast, orders date-filter pushed to the scan,
    lineitem returnflag filter pushed, one shuffled spine, top-k."""
    c = scan(spark, sf_dir, "customer")
    n = scan(spark, sf_dir, "nation")
    o = scan(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = scan(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "t5_golden_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag
    """,
)
def t5_golden_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden TPC-H Q12 analogue (t5; l_returnflag stands in for the
    synthetic schema's missing l_shipmode): priority-split line counts
    per flag over a one-year ship window. Shape: the date filter
    pushes to the lineitem scan (row-group pruning at scale), the join
    shuffles both sides on orderkey once, and the conditional counts
    partial-aggregate map-side to 3 rows."""
    o = scan(spark, sf_dir, "orders")
    li = scan(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "t6_golden_q14",
    oracle=f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           ROUND(100.0
                 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE 0 END)
                        AS DOUBLE)
                 / CAST(SUM({_REV}) AS DOUBLE), 4) AS promo_pct,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def t6_golden_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden TPC-H Q14 analogue (t6) — promo revenue share by ship
    month. Shape: the year filter pushes to the lineitem scan; `part`
    is the small side and broadcasts (no spine shuffle before the
    agg); the CASE ratio is two decimal-exact partial sums divided
    driver-free in the same aggregate. 12 output rows regardless of
    scale."""
    li = scan(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    p = scan(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))
    promo = dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.round(
                F.lit(100.0) * promo.cast("double") / dsum(rev).cast("double"), 4
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "t7_golden_q19",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def t7_golden_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden TPC-H Q19 analogue (t7) — discounted-revenue over an
    OR-of-ANDs predicate mixing both join sides. The optimizer work
    worth testing: Catalyst derives the single-side implications
    (l_quantity <= 30 on lineitem, p_size/p_brand disjunction on part)
    and pushes them BELOW the join into each scan, so the join sees
    pre-filtered inputs; the cross-side residual evaluates post-join.
    Q19 is the classic regression test for disjunctive pushdown — an
    engine that ships the full OR to the join scans everything."""
    li = scan(spark, sf_dir, "lineitem")
    p = scan(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & q.between(20, 30))
    )
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))
    return j.filter(cond).agg(
        dsum(rev).alias("revenue"), F.count(F.lit(1)).alias("n_lines")
    )
