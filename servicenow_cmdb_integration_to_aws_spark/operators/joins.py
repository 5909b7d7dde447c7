"""Category C — joins (SURVEY §2.C).

Domain mapping [SN-API]: dot-walking (reference-field resolution),
choice/display-value lookups, `cmdb_rel_ci` graph traversal, IRE
two-source reconciliation — all joins.

100 TB notes per operator:
- c1: dimension joins are explicitly `broadcast()` — zero shuffle of
  the fact side; nation/region stay tiny at any scale.
- c2: large-large equi-join → sort-merge/shuffle-hash chosen by
  Catalyst + AQE (skew split at runtime). Both sides shuffle on the
  key once; the post-join aggregate reuses the same partitioning.
- c7: theta component rides on an equi prefix so it is NOT a cartesian
  product: Spark hash-partitions on the equi key and applies the range
  predicate inside the join — the only scalable shape for theta joins.
- c8: as-of via join+window; at extreme per-user fan-out, the scale
  path is repartition-by-user + in-partition merge (applyInPandas) —
  see streaming/stream_ops.py for the stateful analogue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import EVENTS_US, query
from ..sources.tables import scan
from .fixpoint import cut_lineage
from .numeric import dec, dsum, fdec, sql_finite


@query(
    "c1_join_bcast",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def c1_join_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast equi-join (c1): the dot-walk customer→nation→region.
    Dims are broadcast — the customer side never shuffles."""
    c, n, r = scan(spark, sf_dir, "customer"), scan(spark, sf_dir, "nation"), scan(
        spark, sf_dir, "region"
    )
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@query(
    "c2_join_shuffle",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
             AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    GROUP BY o_orderkey, o_orderdate
    """,
)
def c2_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large equi-join + reaggregation (c2), TPC-H-Q3-ish. The filter is
    pushed below the join; the groupBy reuses the join's hash
    partitioning on o_orderkey (no extra shuffle)."""
    o = scan(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    li = scan(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount", 4, 2))).alias(
                "revenue"
            )
        )
    )


@query(
    "c3_join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_orderstatus = 'F'
    """,
)
def c3_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join (c3): CI rows with possibly-missing references
    survive with NULLs."""
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_orderstatus == "F"), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "c4_join_full",
    oracle="""
    SELECT k, urgent_price, big_price
    FROM (SELECT o_orderkey AS k, o_totalprice AS urgent_price
          FROM orders WHERE o_orderpriority = '1-URGENT') a
    FULL JOIN (SELECT o_orderkey AS k2, o_totalprice AS big_price
          FROM orders WHERE o_totalprice > 300000) b
      ON a.k = b.k2
    """,
)
def c4_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (c4): two-source reconciliation view (IRE
    pattern) — rows unique to either side survive."""
    o = scan(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("urgent_price")
    )
    b = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_orderkey").alias("k2"), F.col("o_totalprice").alias("big_price")
    )
    return a.join(b, a.k == b.k2, "full").select("k", "urgent_price", "big_price")


@query(
    "c5_join_semi",
    oracle="""
    SELECT * FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def c5_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join (c5) — the encoded `IN`-subquery: customers having
    at least one urgent order. Semi joins shuffle only the key."""
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi")


@query(
    "c6_join_anti",
    oracle="""
    SELECT * FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def c6_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (c6) — orphan detection: customers with no orders
    (the orphan-CI reconciliation query)."""
    c = scan(spark, sf_dir, "customer")
    o = scan(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@query(
    "c7_join_theta",
    oracle="""
    SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
    """,
)
def c7_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join (c7): equi prefix (nationkey) carries the hash
    partitioning; the inequality is applied inside the join — never a
    cartesian product."""
    s = scan(spark, sf_dir, "supplier")
    c = scan(spark, sf_dir, "customer")
    return s.join(
        c,
        (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal),
    ).select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")


@query(
    "c8_join_asof",
    oracle=f"""
    {EVENTS_US},
    p AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'purchase'),
    c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
    j AS (
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
               c.event_id AS click_id, c.ts AS click_ts,
               row_number() OVER (
                   PARTITION BY p.event_id
                   ORDER BY c.ts DESC NULLS LAST,
                            c.event_id DESC NULLS LAST,
                            p.ts DESC NULLS LAST,
                            p.user_id DESC NULLS LAST) AS rn
        FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
    )
    SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
    FROM j WHERE rn = 1
    """,
)
def c8_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (c8): for each purchase, the latest click by the same
    user at-or-before the purchase (change-history lookup pattern).

    Tie rule (pinned, SURVEY §7 hard-part #2): latest ts wins; equal ts
    broken by larger event_id; purchases with no prior click kept with
    NULLs. The window partitions by purchase EVENT_ID, which under
    at-least-once delivery is NOT a row identity (r11 --dupids): two
    purchase twins share one partition, so the order carries
    purchase-side keys too (purchase_ts, user_id) — a content-total
    order, or the surviving twin's payload would be physical-row-order
    dependent (r13 --rowshuffle x sf0.01-chain finding). Null
    placement pinned DESC NULLS LAST on BOTH engines (their defaults
    are opposite). Implemented as ranged left join + row_number —
    Catalyst partitions on user_id, AQE splits skewed users."""
    e = scan(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    j = p.join(
        c,
        (p.user_id == c.c_user) & (c.click_ts <= p.purchase_ts),
        "left",
    )
    w = Window.partitionBy("purchase_id").orderBy(
        F.col("click_ts").desc_nulls_last(),
        F.col("click_id").desc_nulls_last(),
        F.col("purchase_ts").desc_nulls_last(),
        F.col("user_id").desc_nulls_last(),
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
    )


@query(
    "c9_rel_2hop",
    oracle="""
    WITH edges AS (
        SELECT 'R' || CAST(n_regionkey AS VARCHAR) AS parent,
               'N' || CAST(n_nationkey AS VARCHAR) AS child
        FROM nation
        UNION ALL
        SELECT 'N' || CAST(c_nationkey AS VARCHAR) AS parent,
               'C' || CAST(c_custkey AS VARCHAR) AS child
        FROM customer
    )
    SELECT e1.parent AS root, e1.child AS mid, e2.child AS leaf
    FROM edges e1 JOIN edges e2 ON e1.child = e2.parent
    """,
)
def c9_rel_2hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph 2-hop (c9): the `cmdb_rel_ci` pattern — a generic
    (parent, child) edge table traversed by self-join. Multi-hop =
    iterated self-joins; ≤2 hops never needs a graph library."""
    n = scan(spark, sf_dir, "nation")
    c = scan(spark, sf_dir, "customer")
    e_rn = n.select(
        F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("parent"),
        F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("child"),
    )
    e_nc = c.select(
        F.concat(F.lit("N"), F.col("c_nationkey").cast("string")).alias("parent"),
        F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("child"),
    )
    edges = e_rn.unionByName(e_nc)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    return e1.join(e2, F.col("e1.child") == F.col("e2.parent")).select(
        F.col("e1.parent").alias("root"),
        F.col("e1.child").alias("mid"),
        F.col("e2.child").alias("leaf"),
    )


@query(
    "c10_join_cross",
    oracle="""
    SELECT r_name, seg
    FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)
    """,
)
def c10_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded cross join (c10): small×small pair generation (5×5).
    Cross joins are only ever allowed on provably-small inputs."""
    r = scan(spark, sf_dir, "region").select("r_name")
    segs = (
        scan(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("seg"))
        .distinct()
    )
    return r.crossJoin(segs)


@query(
    "c11_rel_closure",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT 'R' || CAST(n_regionkey AS VARCHAR) AS parent,
               'N' || CAST(n_nationkey AS VARCHAR) AS child
        FROM nation
        UNION ALL
        SELECT 'N' || CAST(c_nationkey AS VARCHAR) AS parent,
               'C' || CAST(c_custkey AS VARCHAR) AS child
        FROM customer
    ),
    reach AS (
        SELECT parent AS root, child AS node, 1 AS depth FROM edges
        UNION ALL
        SELECT r.root, e.child, r.depth + 1
        FROM reach r JOIN edges e ON e.parent = r.node
        WHERE r.depth < 3
    )
    SELECT root, node, CAST(depth AS BIGINT) AS depth FROM reach
    """,
)
def c11_rel_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded transitive closure (c11): all (root, node, depth<=3)
    reachability pairs over the `cmdb_rel_ci`-style edge table — the
    'everything under this datacenter' CMDB query.

    Spark-first iterative shape: breadth-first frontier expansion
    unrolled into one join per depth level, unioned. Each level is a
    single equi-join shuffle on the frontier key; AQE right-sizes the
    shrinking frontier at runtime. The depth bound makes the plan
    static — for unbounded closure at 100 TB you graduate to an
    iterative driver loop with persisted frontiers (same join per
    step, loop until empty) or GraphFrames' Pregel."""
    n = scan(spark, sf_dir, "nation")
    c = scan(spark, sf_dir, "customer")
    edges = (
        n.select(
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("parent"),
            F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("child"),
        )
        .unionByName(
            c.select(
                F.concat(F.lit("N"), F.col("c_nationkey").cast("string")).alias(
                    "parent"
                ),
                F.concat(F.lit("C"), F.col("c_custkey").cast("string")).alias("child"),
            )
        )
    )
    frontier = edges.select(
        F.col("parent").alias("root"),
        F.col("child").alias("node"),
        F.lit(1).cast("long").alias("depth"),
    )
    out = frontier
    for depth in (2, 3):
        e = edges.select(
            F.col("parent").alias("e_parent"), F.col("child").alias("e_child")
        )
        frontier = frontier.join(e, F.col("e_parent") == F.col("node")).select(
            "root",
            F.col("e_child").alias("node"),
            F.lit(depth).cast("long").alias("depth"),
        )
        out = out.unionByName(frontier)
    return out


def transitive_closure(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Unbounded transitive closure of an edge table (`parent`,`child`)
    → distinct (`root`,`node`) reachability pairs, by iterative
    frontier expansion to fixpoint.

    Cycle-safe: each round's frontier is anti-joined against the
    already-reached set, so a cycle contributes each pair once and the
    frontier empties. Semi-naive evaluation — only NEW pairs join the
    edge table each round, not the whole closure.

    100 TB notes: each round is one equi-join shuffle on the frontier
    key plus one anti-join on (root,node); :func:`fixpoint.cut_lineage`
    truncates lineage so the plan stays O(1) per round instead of
    growing with iteration count — executor-local checkpoint by
    default, reliable `checkpoint()` when `FIXPOINT_CKPT_CONF` names a
    fault-tolerant dir (r11 verdict item 5: a lost executor on a
    preemptible fleet must not restart a 20-round fixpoint from zero).
    Rounds are O(graph diameter), not O(|V|) — BFS doubling is
    possible but triples the shuffle volume per round and rarely wins
    on CMDB-shaped shallow graphs."""
    e = edges.select("parent", "child").persist()
    reach = (
        e.select(F.col("parent").alias("root"), F.col("child").alias("node"))
        .distinct()
    )
    reach = cut_lineage(reach)
    frontier = reach
    for _ in range(max_iter):
        grown = (
            frontier.join(e, e["parent"] == frontier["node"])
            .select("root", F.col("child").alias("node"))
            .distinct()
        )
        new = cut_lineage(grown.join(reach, ["root", "node"], "left_anti"))
        if new.isEmpty():
            break
        reach = cut_lineage(reach.unionByName(new))
        frontier = new
    else:
        raise RuntimeError(f"closure did not converge in {max_iter} rounds")
    e.unpersist()
    return reach


@query(
    "c12_rel_closure_unbounded",
    oracle="""
    WITH RECURSIVE edges AS (
        SELECT 'R' || CAST(n_regionkey AS VARCHAR) AS parent,
               'N' || CAST(n_nationkey AS VARCHAR) AS child
        FROM nation
        UNION ALL
        SELECT 'N' || CAST(c_nationkey AS VARCHAR) AS parent,
               'C' || CAST(c_custkey AS VARCHAR) AS child
        FROM customer
    ),
    reach AS (
        SELECT parent AS root, child AS node FROM edges
        UNION
        SELECT r.root, e.child
        FROM reach r JOIN edges e ON e.parent = r.node
    )
    SELECT root, node FROM reach
    """,
)
def c12_rel_closure_unbounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNBOUNDED transitive closure (c12) — c11 without the depth
    guard: 'everything under this CI, however deep'. Iterative driver
    loop over a persisted frontier until fixpoint (see
    :func:`transitive_closure`); oracle is the recursive CTE with
    UNION-distinct termination.

    r14 (guide §2.3 narrower types, the c16/c22 treatment): the loop
    iterates on TAGGED LONGS (key*4 + {0:R, 1:N, 2:C}) instead of
    concatenated strings — every distinct/join/anti-join inside the
    fixpoint shuffles and hashes two 8-byte longs per pair instead of
    two strings; the string form is produced exactly once, on the
    final closed frame. Same pairs, proven EQUAL against the oracle
    (A/B in OPTIMIZATION_r14.md)."""
    n = scan(spark, sf_dir, "nation")
    c = scan(spark, sf_dir, "customer")
    edges = n.select(
        (F.col("n_regionkey").cast("long") * 4).alias("parent"),
        (F.col("n_nationkey").cast("long") * 4 + 1).alias("child"),
    ).unionByName(
        c.select(
            (F.col("c_nationkey").cast("long") * 4 + 1).alias("parent"),
            (F.col("c_custkey").cast("long") * 4 + 2).alias("child"),
        )
    )

    def _decode(col: str):
        tag = F.pmod(F.col(col), F.lit(4))
        # floor-consistent base: subtract the pmod remainder BEFORE the
        # integer divide so a negative encoded key decodes to the key
        # that produced it (`div` truncates toward zero, pmod is always
        # non-negative — bare `col div 4` would mis-decode key*4+tag
        # for key < 0; r14 ADVICE)
        base = F.expr(f"({col} - pmod({col}, 4)) div 4").cast("string")
        return F.concat(
            F.when(tag == 0, F.lit("R"))
            .when(tag == 1, F.lit("N"))
            .otherwise(F.lit("C")),
            base,
        )

    closed = transitive_closure(edges)
    return closed.select(
        _decode("root").alias("root"), _decode("node").alias("node")
    )


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round: every node u links its LARGER neighbors to
    the minimum of its closed neighborhood m(u) = min(N(u) ∪ {u})."""
    sym = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))  # larger neighbors only
        .select(
            F.col("v").alias("u"),
            F.least(F.col("mv"), F.col("u")).alias("v"),
        )
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient edges toward the smaller endpoint;
    every node u links its smaller neighbors (and itself) to their
    minimum."""
    o = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = o.groupBy("u").agg(F.min("v").alias("mv"))
    relink = (
        o.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("mv").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    return relink.unionByName(
        mins.select("u", F.col("mv").alias("v"))
    ).distinct()


def _probe_this_round(r: int, max_iter: int) -> bool:
    """Batched-convergence-probe schedule: probe every round for the
    first three, every 2nd round after (monotone star contraction
    cannot oscillate, so signature equality across a 2-round gap
    implies the skipped round was converged) — but ALWAYS probe the
    last two budget rounds, so the skip never shrinks the effective
    convergence budget: a graph converging at round ``max_iter-2`` or
    ``max_iter-1`` is still detected before the loop exhausts (r12
    advice). Pure function so the schedule invariant is unit-testable."""
    return r < 3 or r % 2 == 1 or r >= max_iter - 2


def connected_components(
    edges: DataFrame, nodes: DataFrame, max_iter: int = 50
) -> DataFrame:
    """Connected components by alternating large-star/small-star
    pointer doubling (the MapReduce CC algorithm of Kiveris et al.):
    every node's component id converges to the smallest node id in its
    component. `edges` has (src, dst) (treated undirected), `nodes`
    has (id); returns (id, component).

    Each round halves tree heights (doubling), so convergence is
    O(log n) rounds — independent of component DIAMETER, unlike the
    min-label propagation this replaced (a 1M-node path graph needs
    ~20 rounds here vs 1M there). 100 TB notes: each half-round is one
    groupBy + one co-keyed join on node id (same co-partitioned
    layout), nothing driver-side but the convergence signature (count
    + hash, one tiny collect) — probed EVERY round for the first
    three, then every 2nd round, and unconditionally in the last two
    budget rounds so the skip never shrinks the effective convergence
    budget (r11 verdict item 6, r12 advice): star-contraction
    is monotone (per-node min labels only decrease), so the state
    cannot oscillate and signature equality across a 2-round gap
    implies the intermediate round was already converged — same
    fixpoint, half the late-round py4j probe jobs, at worst ONE no-op
    contraction round past convergence (its inputs are the converged
    star forest, so it is the cheapest round of the run).
    :func:`fixpoint.cut_lineage` truncates lineage per round exactly
    as in :func:`transitive_closure` (reliable-checkpoint option
    included)."""
    e = cut_lineage(
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    # Empty-graph fast path (r14): a graph with no edges is already a
    # (vacuous) star forest — every node labels itself. The take(1)
    # probe reads one partition of the just-materialized checkpoint
    # (microseconds); skipping the loop saves two full contraction
    # rounds + probes that would only re-derive the empty set
    # (measured on j16 at sf0.1, where tau=0.6 yields zero pairs:
    # 3.91 s → 2.73 s median, results EQUAL). Dedup corpora with real
    # edges take the loop exactly as before.
    if not e.take(1):
        return nodes.select("id", F.col("id").alias("component"))
    prev_sig = None
    for r in range(max_iter):
        e = cut_lineage(_small_star(_large_star(e)))
        if not _probe_this_round(r, max_iter):
            continue  # batched probe: skip even late rounds
        # convergence signature: edge count + order-independent hash
        # (bit_xor never overflows; the edge set is distinct, so xor
        # self-cancellation cannot occur)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(f"components did not converge in {max_iter} rounds")
    # e is now a star forest: (member -> root). Roots and isolated
    # nodes label themselves.
    return nodes.select("id").join(
        e.select(F.col("u").alias("id"), F.col("v").alias("component")),
        "id",
        "left",
    ).select("id", F.coalesce("component", "id").alias("component"))


# Window length == bucket width, so every interval spans at most two
# buckets and the explode fan-out is a fixed 2x, independent of data
# volume.
_RANGE_WIN_S = 2 * 3600


@query(
    "c14_range_join",
    oracle=f"""
    {EVENTS_US},
    win AS (
        SELECT event_id AS win_id, user_id, ts AS start_ts,
               ts + INTERVAL 2 HOUR AS end_ts
        FROM e WHERE event_type = 'purchase'
    )
    SELECT w.win_id, w.user_id,
           COUNT(ev.event_id) AS n_in_window,
           CAST(COALESCE(SUM(CAST({sql_finite("ev.value")} AS DECIMAL(18,2))), 0) AS DOUBLE)
             AS sum_value
    FROM win w LEFT JOIN e ev
      ON ev.user_id = w.user_id
     AND ev.ts > w.start_ts AND ev.ts <= w.end_ts
     AND ev.event_type <> 'purchase'
    GROUP BY w.win_id, w.user_id
    """,
)
def c14_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join (c14): activity inside each purchase's
    2-hour follow-up window — "which audit events fall inside each
    change window" in CMDB terms.

    Spark has no first-class point-in-interval join; the naive form is
    a theta join whose only equi key (user_id) leaves O(per-user^2)
    comparisons. Scale shape used here: quantize time into buckets as
    wide as the window, explode each interval to the <=2 buckets it
    covers, and equi-join on (user_id, bucket) with the exact range
    predicate as a residual. The join is then a plain shuffled hash /
    sort-merge equi-join — co-partitioned, AQE-skew-splittable — and
    the pair space per bucket is bounded by bucket occupancy, not by
    per-user event counts over all time. A matched point falls in
    exactly one bucket, so no post-join dedup is needed; the 2x
    interval fan-out is constant and the buckets column prunes to
    nothing after the join."""
    e = scan(spark, sf_dir, "events")
    win = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("win_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end_ts"),
    )
    wb = win.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("start_ts") / _RANGE_WIN_S),
                F.floor(F.unix_timestamp("end_ts") / _RANGE_WIN_S),
            )
        ),
    )
    pt = (
        e.filter(F.col("event_type") != "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            # finite gate (numeric.finite_metric policy): a NaN/Inf/
            # garbage-magnitude metric must not poison the window sum
            fdec("value").alias("p_value"),
        )
        .withColumn("bucket", F.floor(F.unix_timestamp("p_ts") / _RANGE_WIN_S))
    )
    j = wb.join(
        pt,
        (wb.user_id == pt.p_user)
        & (wb.bucket == pt.bucket)
        & (pt.p_ts > wb.start_ts)
        & (pt.p_ts <= wb.end_ts),
        "left",
    )
    return j.groupBy("win_id", "user_id").agg(
        F.count("p_event_id").alias("n_in_window"),
        F.coalesce(F.sum("p_value"), F.lit(0).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


@query(
    "c15_join_asof_fwd",
    oracle=f"""
    {EVENTS_US},
    s AS (SELECT user_id, min(ts) AS signup_ts
          FROM e WHERE event_type = 'signup' GROUP BY user_id),
    p AS (SELECT e.user_id, min(e.ts) AS first_purchase_ts
          FROM e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s.signup_ts
          GROUP BY e.user_id)
    SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
           COALESCE(p.first_purchase_ts
                    <= s.signup_ts + INTERVAL 7 DAY, FALSE) AS converted_7d
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def c15_join_asof_fwd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (c15) — the dual of c8: for each user's FIRST
    signup, the FIRST purchase strictly after it, plus a 7-day
    conversion flag (the funnel/attribution primitive).

    Shape: two partial-aggregated min()s co-partitioned on user_id and
    one left join on the same key — the events table shuffles once per
    side at (user, ts) granularity already reduced to one row per user.
    No window over raw events is needed: min-reduction commutes with
    the as-of-after semantics because the anchor is itself the earliest
    signup."""
    e = scan(spark, sf_dir, "events")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return s.join(p, "user_id", "left").select(
        "user_id",
        "signup_ts",
        "first_purchase_ts",
        F.coalesce(
            F.col("first_purchase_ts")
            <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"),
            F.lit(False),
        ).alias("converted_7d"),
    )


@query(
    "c20_join_hints",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    GROUP BY o_orderpriority
    """,
)
def c20_join_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Physical join-strategy hints (c20): the same logical fact-fact
    join as c2, pinned to SHUFFLE_HASH via the hint API. Sort-merge
    (the default above the broadcast threshold) pays two full sorts to
    get spill-safety; when the build side is known to fit per-task
    memory after partitioning — the case here, with the date filter
    pruning orders — a hash join skips both sorts. The hint is the
    user-facing escape hatch when the optimizer's cost model lacks
    that knowledge (stats-starved scans, freshly-landed data).

    tests/test_plans.py pins that the hint actually flips the
    operator (ShuffledHashJoin in this plan, SortMergeJoin without);
    results are hint-invariant by construction — the oracle proves
    it.

    100 TB notes: identical shuffle volume either way (both
    co-partition on the orderkey); the saving is the two O(n log n)
    in-partition sorts. The risk the hint accepts: a hash build that
    exceeds task memory spills MUCH worse than sort-merge — which is
    why it's a HINT, not the default."""
    o = (
        scan(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
        .select("o_orderkey", "o_orderpriority")
    )
    li = scan(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    return (
        li.join(o.hint("shuffle_hash"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )
