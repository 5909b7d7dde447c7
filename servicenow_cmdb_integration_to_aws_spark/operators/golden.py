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


@query(
    "t11_golden_q2",
    oracle="""
    WITH costed AS (
        SELECT p.p_partkey, p.p_brand, s.s_name, s.s_acctbal, n.n_name,
               l.l_extendedprice / l.l_quantity AS unit_cost,
               MIN(l.l_extendedprice / l.l_quantity) OVER
                   (PARTITION BY p.p_partkey) AS min_cost
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'EUROPE' AND p.p_size = 15
    )
    SELECT p_partkey, p_brand, s_name, n_name, s_acctbal,
           ROUND(unit_cost, 6) AS unit_cost
    FROM costed WHERE unit_cost = min_cost
    ORDER BY s_acctbal DESC, s_name, p_partkey
    LIMIT 100
    """,
)
def t11_golden_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q2 analogue — minimum-cost supplier: for every size-15
    part, the EUROPE supplier(s) shipping it at the lowest unit cost
    (the schema has no partsupp, so shipped lineitems stand in for the
    supply catalog and extendedprice/quantity for ps_supplycost).
    Q2's correlated-MIN subquery becomes a window-min over the part
    key — one pass, no re-scan, ties emitted like the subquery form.

    100 TB notes: supplier⋈nation⋈region and part are broadcast dims;
    lineitem shuffles ONCE on p_partkey for the window; the final
    top-100 is TakeOrderedAndProject. The equality filter compares the
    same IEEE division both engines computed — bit-exact."""
    s = scan(spark, sf_dir, "supplier")
    n = scan(spark, sf_dir, "nation")
    r = scan(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = scan(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    li = scan(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    dims = (
        s.join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    from pyspark.sql import Window

    unit_cost = F.col("l_extendedprice") / F.col("l_quantity")
    w = Window.partitionBy("p_partkey")
    costed = (
        li.join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(p.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .withColumn("unit_cost", unit_cost)
        .withColumn("min_cost", F.min("unit_cost").over(w))
    )
    return (
        costed.filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            "s_acctbal",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "t12_golden_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM lineitem l1
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.l_returnflag = 'R' AND o.o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def t12_golden_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q21 analogue — sole-faulty-supplier report: suppliers
    whose returned ('R') lineitems sit in finalized multi-supplier
    orders where NO other supplier had a return (the schema has no
    commit/receipt dates, so the returnflag stands in for "kept
    waiting"). Q21's EXISTS / NOT-EXISTS pair is algebraically a
    per-order predicate on supplier counts, so instead of compiling it
    to a left-semi + left-anti self-join (three lineitem legs), we
    aggregate lineitem ONCE: for each l1 row of a qualifying order,
    EXISTS(other supplier) <=> the order has >= 2 distinct suppliers,
    and NOT EXISTS(other RETURNING supplier) <=> the order has exactly
    1 distinct returning supplier (l1's own, since l1 itself returns).
    Every qualifying order therefore contributes its unique returning
    supplier's R-row count to that supplier's numwait.

    100 TB notes: one lineitem scan -> partial-agg groupBy
    (l_orderkey, l_suppkey) with a huge map-side combine ratio ->
    re-agg per order (no exchange: hash(l_orderkey, l_suppkey) rows
    re-shuffle once on l_orderkey, the same key the orders join needs,
    so AQE reuses the partitioning). The old semi/anti form shuffled
    the full lineitem table three times; this shape shuffles the
    (order, supplier)-distinct rows once. Supplier stays a broadcast
    dim; the final top-20 is TakeOrderedAndProject."""
    # NULL-suppkey lineitems mirror SQL exactly by EXCLUSION (r9
    # --nullkeys sweep): in the oracle they can never witness the
    # EXISTS/NOT-EXISTS (<> against NULL is NULL) nor join supplier,
    # but the algebraic rewrite's groupBy would count the NULL group
    # as a distinct supplier and mis-qualify single-supplier orders.
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    ).filter(F.col("l_suppkey").isNotNull())
    o = scan(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    s = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    per_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(
            F.when(F.col("l_returnflag") == "R", F.lit(1)).otherwise(F.lit(0))
        ).alias("r_cnt")
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum(
                F.when(F.col("r_cnt") > 0, F.lit(1)).otherwise(F.lit(0))
            ).alias("n_r_supp"),
            F.max(
                F.when(F.col("r_cnt") > 0, F.col("l_suppkey"))
            ).alias("f_suppkey"),
            F.max(F.when(F.col("r_cnt") > 0, F.col("r_cnt"))).alias("f_rows"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
    )
    return (
        # orders is NOT broadcast: the status filter keeps ~1/3 of an
        # arbitrarily large fact table; per_order is already keyed on
        # l_orderkey, so this join adds no new lineitem-sized exchange.
        per_order.join(
            o.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(s), F.col("f_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("f_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@query(
    "t13_golden_q4",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      AND o_orderdate <  TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def t13_golden_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q4 analogue — order-priority checking: orders placed in
    one quarter that had at least one returned ('R') lineitem, counted
    per priority class (the schema has no commit/receipt dates, so the
    returnflag stands in for "delivered late"). Q4's EXISTS compiles to
    a left-semi join on the order key.

    100 TB notes: the quarter filter pushes to the orders scan; both
    semi-join legs hash-shuffle once on the order key (neither side is
    broadcast-sized); the 5-group count is partial-aggregated map-side
    so the final exchange carries five rows per task."""
    o = scan(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = scan(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "t14_golden_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM({_REV}) AS DOUBLE) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
                 l_extendedprice, l_discount
          FROM supplier s
          JOIN lineitem l ON s_suppkey = l_suppkey
          JOIN orders o ON o_orderkey = l_orderkey
          JOIN customer cu ON cu.c_custkey = o.o_custkey
          JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2 ON cu.c_nationkey = n2.n_nationkey
          WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def t14_golden_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q7 analogue — volume shipping between two nations: yearly
    bilateral revenue where the supplier sits in one of the pair and
    the customer in the other. The nation pair predicate is applied to
    the two broadcast dims BEFORE the spine join, so non-pair rows
    never reach the shuffle.

    100 TB notes: supplier⋈nation and customer⋈nation reduce to tiny
    keyed dims (pair nations only) and broadcast into the two fact
    scans; lineitem⋈orders is the single shuffled spine on the order
    key; the cross-pair disjunction survives as a cheap post-join
    filter on two broadcast-resolved columns; the (2×2×years)-group
    agg is partial-aggregated."""
    pair = ("NATION_3", "NATION_7")
    n = scan(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    s = scan(spark, sf_dir, "supplier")
    cu = scan(spark, sf_dir, "customer")
    sdim = s.join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    cdim = cu.join(
        F.broadcast(
            n.select(
                F.col("n_nationkey").alias("n2_nationkey"),
                F.col("n_name").alias("cust_nation"),
            )
        ),
        F.col("c_nationkey") == F.col("n2_nationkey"),
    ).select("c_custkey", "cust_nation")
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(sdim), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cdim), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "t15_golden_q17",
    oracle="""
    WITH pavg AS (
        SELECT l_partkey, 0.2 * AVG(l_quantity) AS qty_thresh
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#13'
        GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
           COUNT(*) AS n_small
    FROM lineitem JOIN pavg ON lineitem.l_partkey = pavg.l_partkey
    WHERE l_quantity < qty_thresh
    """,
)
def t15_golden_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q17 analogue — small-quantity-order revenue: weekly-ish
    revenue lost if orders below 20% of a part's average quantity were
    no longer taken, for one brand. Q17's correlated AVG subquery
    becomes a per-part aggregate joined back to the same filtered
    lineitems.

    Float-parity: l_quantity values are integer-valued doubles, so the
    per-part AVG (exact integer sum / count) is bit-identical in both
    engines regardless of accumulation order; the revenue sum goes
    through DECIMAL (numeric.py policy).

    100 TB notes: the brand filter reduces part to ~1/brand-count and
    broadcasts into the lineitem scan; the per-part threshold table is
    part-cardinality-small, so it broadcasts BACK into the second pass
    (two scans, zero fact shuffles) instead of hash-joining the fact on
    l_partkey — at 100 TB a rescan with pushed filters beats a full
    fact exchange."""
    p13 = scan(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    li = scan(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    li_b = li.join(
        F.broadcast(p13.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    pavg = li_b.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li_b.withColumnRenamed("l_partkey", "lk")
        .join(F.broadcast(pavg), F.col("lk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (dsum(dec("l_extendedprice")) / F.lit(7.0))
            .cast("double")
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "t16_golden_q22",
    oracle="""
    WITH thresh AS (
        SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*) AS DOUBLE) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
             AS totacctbal
    FROM customer, thresh
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def t16_golden_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q22 analogue — dormant high-balance customers: per
    nation, customers whose balance exceeds the positive-balance
    average and who placed NO order since 2000 (every customer here
    has historical orders, so Q22's "never ordered" becomes "gone
    dormant" — the realistic churn variant anyway).

    Float-parity: the global average is derived as exact DECIMAL sum →
    DOUBLE, divided by the count in double — bit-identical both
    engines (no order-dependent double accumulation).

    100 TB notes: the threshold is a 1-row aggregate crossJoin-
    broadcast back (never a driver-side collect); the NOT EXISTS is a
    left-anti join — orders is fact-sized so both anti legs shuffle
    once on the customer key; the date filter pushes to the orders
    scan and shrinks the anti build side first."""
    cu = scan(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    thresh = (
        cu.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (dsum(dec("c_acctbal")) / F.count(F.lit(1)))
            .cast("double")
            .alias("avg_bal")
        )
    )
    recent = scan(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cu.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            recent.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "t17_golden_q11",
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS part_value
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_5'
        GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(part_value) AS total_value FROM pv)
    SELECT l_partkey, part_value,
           ROUND(part_value / total_value, 9) AS share
    FROM pv, tot
    WHERE part_value > 0.001 * total_value
    ORDER BY part_value DESC, l_partkey
    """,
)
def t17_golden_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q11 analogue — important stock identification: parts
    whose shipped value through NATION_5 suppliers exceeds 0.1% of the
    total such value (no partsupp in the schema, so shipped lineitem
    value stands in for supplycost×availqty). Q11's scalar HAVING
    subquery becomes a 1-row aggregate over the per-part result,
    broadcast back.

    Float-parity: per-part values are exact DECIMAL sums cast to
    DOUBLE; the total is a sum of those doubles in a single 1-row
    aggregate — both engines accumulate part-cardinality values, and
    the comparison/share use the identical IEEE expressions (share
    rounded to 9dp as last-ulp insurance on the division).

    100 TB notes: the nation filter reduces supplier to a broadcast
    dim; lineitem shuffles ONCE on l_partkey; the threshold derives
    from the per-part aggregate itself (part-cardinality rows → 1-row
    agg → crossJoin-broadcast), never a second fact scan."""
    n5 = scan(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    s = scan(spark, sf_dir, "supplier").join(
        F.broadcast(n5.select("n_nationkey")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    li = scan(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    pv = (
        li.join(
            F.broadcast(s.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_partkey")
        .agg(dsum(dec("l_extendedprice")).alias("part_value"))
    )
    tot = pv.agg(F.sum("part_value").alias("total_value"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > F.lit(0.001) * F.col("total_value"))
        .select(
            "l_partkey",
            "part_value",
            F.round(F.col("part_value") / F.col("total_value"), 9).alias(
                "share"
            ),
        )
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )
