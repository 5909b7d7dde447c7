"""Golden end-to-end queries, batch 2 (SURVEY §5.5) — the remaining
TPC-H analogues (Q1, Q6, Q8, Q9, Q13, Q15, Q16, Q20) adapted to the
driver's column set (no partsupp table — shipped lineitems stand in
for the part-supplier catalog wherever TPC-H uses it; dates are
TIMESTAMP columns spanning 1995-2001; nations are NATION_0..24).

These complete the reporting-suite composition coverage started in
``golden.py`` (t1–t17): every remaining canonical TPC-H shape —
full-table aggregate report (Q1), single-row forecast delta (Q6),
market-share conditional ratio (Q8), profit-by-nation-and-year (Q9),
outer-join distribution histogram (Q13), window-max top entity (Q15),
anti-joined count-distinct catalog rollup (Q16), and the nested
semi-join chain (Q20).

Float-parity policy (same as golden.py): money math in DECIMAL casts
(exact, order-independent), final values cast to DOUBLE with the
identical IEEE expression in both engines; ratios round to 9dp as
last-ulp insurance.

100 TB notes per-query in docstrings; the shared shape: dims
broadcast, the fact spine shuffles at most once on its join key, and
scalar thresholds come from 1-row aggregates crossJoin-broadcast back
(never a driver collect, never a fact rescan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import scan
from .numeric import dec, dsum

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


@query(
    "t18_golden_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_base_price,
           CAST(SUM({_REV}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_REV} * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
             AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
             AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)
             AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def t18_golden_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q1 — the pricing summary report, verbatim shape: per
    (returnflag, linestatus) sums/averages of quantity, base price,
    discounted price, charge.

    Float-parity: every SUM is an exact DECIMAL accumulation (the
    charge product widens to DECIMAL(38,6) — still exact for 2dp×2dp×
    2dp inputs) cast to DOUBLE once; averages divide that exact double
    by the group count, the identical IEEE op both engines.

    100 TB notes: the canonical map-side-partial-agg workload — 4
    output groups mean the shuffle carries ~4 rows per task regardless
    of input size; the date filter pushes to parquet row-group stats.
    One scan, one tiny exchange, no sort until the 4-row result."""
    li = scan(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-06-01").cast("timestamp")
    )
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))
    charge = disc_price * (F.lit(1) + dec("l_tax", 4, 2))
    n = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity", 12, 2)).alias("sum_qty"),
            dsum(dec("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            (dsum(dec("l_quantity", 12, 2)) / n).alias("avg_qty"),
            (dsum(dec("l_extendedprice")) / n).alias("avg_price"),
            (dsum(dec("l_discount", 4, 2)) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "t19_golden_q6",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def t19_golden_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q6 — forecasting revenue change: the revenue a year's
    small-quantity mid-discount lines would have yielded undiscounted.

    100 TB notes: zero shuffles — three pushed predicates (two reach
    parquet min/max stats; the BETWEEN on discount prunes dictionary
    pages), then a single partial-aggregable global SUM/COUNT whose
    exchange carries one row per task. The canonical scan-bound query:
    at 100 TB it is I/O-limited and scales linearly with executors."""
    li = scan(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", 4, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "t20_golden_q9",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(strftime(o_orderdate, '%Y') AS INT) AS o_year,
           CAST(SUM({_REV}) AS DOUBLE) AS profit
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN part     ON p_partkey = l_partkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, o_year
    ORDER BY nation, o_year DESC
    """,
)
def t20_golden_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q9 — product-type profit measure: revenue on a part-name
    pattern, grouped by supplier nation and order year (no partsupp ⇒
    no supplycost term; discounted revenue stands in for profit).

    100 TB notes: part (name-filtered) and supplier⋈nation broadcast;
    lineitem⋈orders is the only fact-fact edge and shuffles once on
    the orderkey; the (25 nations × 7 years) aggregate is partial-agg
    tiny. The p_name LIKE filter lands on the broadcast build side so
    the probe skips non-matching parts without any fact-side work."""
    p = scan(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = scan(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))
    return (
        li.join(F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(rev).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "t21_golden_q13",
    oracle="""
    WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON o_custkey = c_custkey
                        AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def t21_golden_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q13 — customer order-count distribution: how many
    customers placed exactly N non-urgent orders (LEFT join keeps the
    zero-order customers; the priority predicate lives in the join
    condition, not WHERE — the Q13 trap).

    100 TB notes: one c_custkey/o_custkey co-keyed shuffle for the
    outer join + count (COUNT(o_orderkey) partial-aggs map-side after
    AQE coalesces); the second aggregate is distribution-sized (~tens
    of rows) so its exchange is negligible. No broadcast — customer is
    fact-sized here, and the left join preserves its partitioning."""
    c = scan(spark, sf_dir, "customer").select("c_custkey")
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "t22_golden_q15",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_REV}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1999-01-01'
          AND l_shipdate < TIMESTAMP '1999-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def t22_golden_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q15 — top supplier: the supplier(s) with maximum revenue
    in one quarter. Q15's view + scalar-subquery becomes a per-supplier
    aggregate reused for both the max (1-row agg, crossJoin-broadcast)
    and the final equality filter — ties emitted, like the spec.

    Float-parity: per-supplier revenue is an exact DECIMAL sum cast to
    DOUBLE, so the MAX-equality compares bit-identical values — no
    tolerance needed even at the max boundary.

    100 TB notes: the quarter filter pushes to the scan; ONE l_suppkey
    shuffle builds rev; the max derives from rev itself (supplier-
    cardinality input, 1-row output) — no second fact scan; supplier
    joins broadcast. AQE replans rev's reuse without recomputation
    (same exchange feeds the max and the filter)."""
    li = scan(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-04-01").cast("timestamp"))
    )
    rev_col = dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(rev_col).alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    s = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "t23_golden_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7%'
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def t23_golden_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q16 — parts/supplier relationship: distinct suppliers
    shipping each qualifying (brand, type, size) combination,
    excluding a complained-about supplier set (no partsupp ⇒ shipped
    lineitems are the part-supplier relation; the NOT IN subquery maps
    to a left-anti join — none of the excluded keys are NULL, so the
    NOT-IN ≡ anti-join equivalence is exact).

    100 TB notes: part filters land on the broadcast build side; the
    excluded-supplier set is dim-sized and anti-joins broadcast; the
    COUNT(DISTINCT) is the one real shuffle — Spark expands it to a
    two-phase (group+suppkey distinct, then count) partial-agg plan,
    the same strategy a 1000-executor run needs for the skewed popular
    combinations."""
    p = scan(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad = scan(spark, sf_dir, "supplier").filter(
        F.col("s_name").like("%7%")
    )
    li = scan(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(
            F.broadcast(bad.select("s_suppkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "t24_golden_q20",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, CAST(SUM(l_quantity) AS DOUBLE) AS qty
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_name LIKE '%red%'
          AND l_shipdate >= TIMESTAMP '2000-01-01'
          AND l_shipdate < TIMESTAMP '2001-01-01'
        GROUP BY l_suppkey
    ),
    thresh AS (SELECT CAST(AVG(qty) AS DOUBLE) AS avg_qty FROM shipped)
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM shipped, thresh WHERE qty > 0.5 * avg_qty
    )
    ORDER BY s_name, s_suppkey
    """,
)
def t24_golden_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q20 — potential part promotion: suppliers who shipped an
    above-half-average quantity of the pattern-matched ('%red%') parts in one
    year (Q20's availqty > half-of-shipped inverts without partsupp:
    the nested IN-chain shape — part-pattern semi-join feeding a
    per-supplier aggregate feeding a supplier semi-join — is intact).

    Float-parity: per-supplier qty is an integral-exact SUM cast to
    DOUBLE; the half-average threshold is computed with the identical
    expression both engines.

    100 TB notes: part pattern-filter broadcasts into the date-pruned
    lineitem scan (semi shape — only l_suppkey/l_quantity survive the
    probe); one l_suppkey shuffle; the threshold is a 1-row agg
    crossJoin-broadcast; the final IN is a left-semi against a
    supplier-cardinality set, broadcast. Zero fact rescans."""
    p = scan(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = scan(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").cast("double").alias("qty"))
    )
    thresh = shipped.agg(F.avg("qty").cast("double").alias("avg_qty"))
    qualifying = (
        shipped.crossJoin(F.broadcast(thresh))
        .filter(F.col("qty") > F.lit(0.5) * F.col("avg_qty"))
        .select("l_suppkey")
    )
    s = scan(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        s.join(
            F.broadcast(qualifying),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .orderBy("s_name", "s_suppkey")
    )


@query(
    "t25_golden_q8",
    oracle=f"""
    WITH sales AS (
        SELECT CAST(strftime(o_orderdate, '%Y') AS INT) AS o_year,
               CAST({_REV} AS DOUBLE) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        -- the customer leg is a FILTER ("shipped to EUROPE customers"),
        -- not an attribute lookup: IN = semi-join, mirroring the
        -- engine's left_semi — a plain inner join would double-count
        -- revenue for a duplicated customer record (r11 --dupids on
        -- dimension keys; semi and inner were equivalent only while
        -- c_custkey was unique)
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer
            JOIN nation cn ON cn.n_nationkey = c_nationkey
            JOIN region   ON r_regionkey = cn.n_regionkey
            WHERE r_name = 'EUROPE'
        )
    )
    SELECT o_year,
           ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE 0.0 END) / SUM(volume), 9) AS mkt_share
    FROM sales
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def t25_golden_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden Q8 — national market share: NATION_3 suppliers' share of
    revenue shipped to EUROPE customers, per order year (no p_type
    filter — the part dimension contributes nothing without it, so the
    join drops; the conditional-ratio shape is the point).

    Float-parity: per-line volumes are exact-DECIMAL products cast to
    DOUBLE, but the year-group SUM accumulates doubles in engine-
    specific order — so the share (a ratio of two such sums, relative
    error ≤ n·ε ≈ 1e-11) rounds to 9dp, the same last-ulp insurance as
    t17. Numerator uses CASE/otherwise(0.0) identically both sides.

    100 TB notes: customer⋈nation⋈region (region-filtered) and
    supplier⋈nation broadcast; lineitem⋈orders is the one co-keyed
    fact shuffle; the (7 years) aggregate partial-aggs to nothing.
    Both CASE branches ride the same partial aggregate — one pass."""
    cn = (
        scan(spark, sf_dir, "customer")
        .join(
            F.broadcast(scan(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                scan(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    sn = (
        scan(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                scan(spark, sf_dir, "nation").select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                )
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    o = scan(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = scan(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    volume = (
        (dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2)))
        .cast("double")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cn), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(sn), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(F.lit(0.0))
                )
                / F.sum("volume"),
                9,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )
