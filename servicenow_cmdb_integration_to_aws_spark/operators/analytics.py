"""Event-analytics workloads (SURVEY §2-addendum r5): conversion
funnel and cohort retention — the two classic warehouse queries every
event-stream consumer runs over the CMDB activity feed.

100 TB notes: both queries move events through user_id-keyed shuffles
exactly once (t9 computes all three funnel stages with consecutive
window passes over ONE exchange; t10's per-user day-grain collapse
happens before the cohort agg, so the second shuffle carries
user-day rows, not raw events)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import EVENTS_US, query
from ..sources.tables import scan

#: funnel step window: the next stage must land within this horizon
FUNNEL_DAYS = 7


@query(
    "t9_funnel",
    oracle=f"""
    {EVENTS_US},
    -- anonymous (NULL user_id) events carry no attributable journey:
    -- excluded in BOTH engines (r9 --nullkeys sweep — the engine's
    -- window would otherwise funnel all anonymous events as one user)
    v AS (SELECT user_id, MIN(ts) AS v_ts FROM e
          WHERE event_type = 'view' AND user_id IS NOT NULL
          GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
          FROM e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.v_ts
            AND e.ts <= v.v_ts + INTERVAL {FUNNEL_DAYS} DAY
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
          FROM e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
            AND e.ts <= c.c_ts + INTERVAL {FUNNEL_DAYS} DAY
          GROUP BY e.user_id)
    SELECT v.user_id, v.v_ts, c.c_ts, p.p_ts,
           CAST(CASE WHEN p.p_ts IS NOT NULL THEN 3
                     WHEN c.c_ts IS NOT NULL THEN 2
                     ELSE 1 END AS BIGINT) AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def t9_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel (t9): first view → first click within 7 days
    of it → first purchase within 7 days of that, per user; `stage` is
    how far the user got.

    One user_id exchange total: each stage is a conditional window-min
    over the SAME partitioning (stage n's predicate references stage
    n-1's column, so they stack as consecutive selects; Catalyst folds
    them into window passes over one shuffle — no self-joins, unlike
    the textbook three-join funnel the oracle runs)."""
    w = Window.partitionBy("user_id")
    # anonymous events: no user, no journey (oracle's v-CTE filter)
    ev = (
        scan(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .filter(F.col("user_id").isNotNull())
    )
    horizon = F.expr(f"INTERVAL {FUNNEL_DAYS} DAY")
    staged = (
        ev.withColumn(
            "v_ts", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
        )
        .withColumn(
            "c_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("v_ts"))
                    & (F.col("ts") <= F.col("v_ts") + horizon),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("c_ts"))
                    & (F.col("ts") <= F.col("c_ts") + horizon),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    return (
        staged.filter(F.col("v_ts").isNotNull())
        .groupBy("user_id")
        .agg(
            F.first("v_ts").alias("v_ts"),
            F.first("c_ts").alias("c_ts"),
            F.first("p_ts").alias("p_ts"),
        )
        .withColumn(
            "stage",
            F.when(F.col("p_ts").isNotNull(), 3)
            .when(F.col("c_ts").isNotNull(), 2)
            .otherwise(1)
            .cast("long"),
        )
    )


@query(
    "t10_cohort",
    oracle=f"""
    {EVENTS_US},
    cohort AS (SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
               FROM e WHERE event_type = 'signup' AND user_id IS NOT NULL
               GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM e
                 WHERE user_id IS NOT NULL)
    SELECT c.cohort_day,
           CAST(a.day - c.cohort_day AS BIGINT) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    WHERE a.day >= c.cohort_day
    GROUP BY 1, 2
    """,
)
def t10_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (t10): users grouped by signup day; for each
    cohort and day-offset k, how many were active (any event) k days
    after signing up — the retention triangle.

    Events collapse to ONE user-day-grain aggregate; the cohort day is
    then a window-min over the user partition of that SAME lineage (no
    self-join, no second scan — a branched cohort-join formulation
    scans the corpus twice because column pruning makes the branches
    canonically unequal and defeats exchange reuse). Everything after
    the first shuffle carries user-day rows (bounded by users x days,
    not event volume); the per-user window partitions are bounded by
    days-in-period, so there is no skew surface.

    NULL-key policy (t9's rule, sprung here by the r10 composed
    hotkey×nullkeys chain — standalone --nullkeys happened to miss
    it): anonymous events carry no attributable journey, so NULL
    users are EXCLUDED in both engines. The engine filters at the
    scan (cheaper: the NULL group never enters the exchange); the
    oracle states it in both CTEs rather than relying on the inner
    join's implicit NULL drop — the window formulation here would
    otherwise keep NULL as one pseudo-user where the join drops it."""
    ev = (
        scan(spark, sf_dir, "events")
        .select("user_id", "event_type", "ts")
        .filter(F.col("user_id").isNotNull())
    )
    ud = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        F.min(
            F.when(F.col("event_type") == "signup", F.col("ts"))
        ).alias("s_min")
    )
    cohort_day = (
        F.min("s_min").over(Window.partitionBy("user_id")).cast("date")
    )
    return (
        ud.withColumn("cohort_day", cohort_day)
        .filter(
            F.col("cohort_day").isNotNull()
            & (F.col("day") >= F.col("cohort_day"))
        )
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@query(
    "c18_scd2_intervals",
    oracle=f"""
    {EVENTS_US},
    c AS (
        SELECT user_id, event_type AS state, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id, event_type NULLS FIRST
               ) AS prev_state
        FROM e
    ),
    ch AS (
        SELECT user_id, state, ts, event_id FROM c
        WHERE prev_state IS NULL OR state <> prev_state
    )
    SELECT user_id, state,
           ts AS valid_from,
           lead(ts) OVER w AS valid_to,
           CAST(row_number() OVER w AS BIGINT) AS version,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM ch
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY ts, event_id, state NULLS FIRST)
    """,
)
def c18_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type-2 build (c18): fold the per-user
    change log into validity intervals — consecutive repeats of the
    same state collapse, each surviving change opens a version row
    `[valid_from, valid_to)` closed by the NEXT change (open-ended =
    current). This is the CMDB history table every as-of join (c8/c15)
    and audit query reads; the reverse of a16's change feed.

    100 TB notes: ONE user_id exchange end-to-end — the change filter
    preserves the lag window's hash partitioning AND its (ts,
    event_id) sort order, so the lead/row_number pass re-uses both
    (no second Exchange, no second Sort — pinned by
    tests/test_plans.py). State per partition is O(1); skew bound is
    events-per-user. At petabyte history depth the same plan holds:
    versions-per-key out is |changes|, not |events|."""
    e = scan(spark, sf_dir, "events").select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id"
    )
    return scd2_intervals(e)


def scd2_intervals(
    df: DataFrame,
    key: str = "user_id",
    state: str = "state",
    ts: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Parametric SCD2 builder (c18's tested machinery): collapse
    consecutive same-state repeats, open [valid_from, valid_to)
    versions — one exchange, one sort. The state column is the THIRD
    sort key (asc NULLS FIRST, mirrored in the oracle): under
    at-least-once delivery two DIFFERENT states can tie on (ts,
    id_col), and without a total order the surviving change sequence
    depends on physical row order (r13 --rowshuffle finding)."""
    w = Window.partitionBy(key).orderBy(
        ts, id_col, F.col(state).asc_nulls_first()
    )
    ch = (
        df.withColumn("prev_state", F.lag(state).over(w))
        .filter(
            F.col("prev_state").isNull() | (F.col(state) != F.col("prev_state"))
        )
        .drop("prev_state")
    )
    nxt = F.lead(ts).over(w)
    return ch.select(
        key,
        state,
        F.col(ts).alias("valid_from"),
        nxt.alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "e14_seq_pattern",
    oracle=f"""
    {EVENTS_US},
    s AS (
        SELECT user_id,
               -- the initial is the THIRD sort key, NULLS FIRST on all
               -- three: Spark's array_sort over (ts, event_id, i)
               -- structs compares every field (nulls smallest) — on a
               -- corpus where two DIFFERENT events tie on (ts,
               -- event_id) (r11 --dupids × tie-truncated ts), a
               -- two-key ORDER BY leaves the tie engine-ambiguous
               string_agg(substring(event_type, 1, 1), ''
                          ORDER BY ts ASC NULLS FIRST,
                                   event_id ASC NULLS FIRST,
                                   substring(event_type, 1, 1)
                                       ASC NULLS FIRST) AS seq
        FROM e GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS n_events,
           CAST(instr(seq, 'vcp') AS BIGINT) AS pos_vcp,
           regexp_matches(seq, 'v.*c.*p') AS has_funnel
    FROM s
    """,
)
def e14_seq_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection (e14): MATCH_RECOGNIZE-style CEP
    over the batch event log — each user's history collapses to an
    ordered event-initial string (v/c/p/s/e, initials are unique),
    then pattern hits are plain string ops: `pos_vcp` = first
    IMMEDIATELY-consecutive view→click→purchase run, `has_funnel` =
    the eventual v..c..p subsequence (t9's funnel as a regex). The
    encode-as-string trick turns arbitrary sequence patterns into
    regexes — the standard SQL workaround for engines without
    MATCH_RECOGNIZE, identical in both.

    Parity: the aggregation orders by the (ts, event_id) total order
    on both engines (Spark: array_sort over (ts, event_id, initial)
    structs — lexicographic struct compare IS the order-by; DuckDB:
    ORDER BY inside string_agg); pattern results are integer/boolean.

    100 TB notes: ONE user_id shuffle; per-user state is the
    initial string (1 byte/event — 67 MB for a pathological 67M-event
    user, but real CEP at that depth belongs to the i-series state
    machines; the docstring contract caps this operator at bounded
    per-key activity). Pattern evaluation is map-side codegen on
    user-grain rows."""
    ev = scan(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.substring("event_type", 1, 1).alias("i"),
    )
    seq = F.concat_ws(
        "",
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "event_id", "i"))),
            lambda s: s["i"],
        ),
    )
    g = ev.groupBy("user_id").agg(seq.alias("seq"))
    return g.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        F.instr("seq", "vcp").cast("bigint").alias("pos_vcp"),
        F.col("seq").rlike("v.*c.*p").alias("has_funnel"),
    )
