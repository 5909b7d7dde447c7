"""Category I — streaming operators, batch-equivalent forms (SURVEY §2.I).

The DuckDB oracle is batch-only, so each windowing operator ships in two
forms (SURVEY §2.I note): the oracle-checkable batch equivalent here
(same window arithmetic over the static `events` table) and the true
Structured Streaming variant in stream_ops.py (rows-only).

i8 is the CMDB incremental-sync pattern itself: `sys_updated_on` high-
water-mark polling [SN-API] — a filtered batch read plus persisted
watermark state (see incremental.py for the stateful API).

100 TB notes: tumbling/sliding windows are plain groupBy on derived
keys — partial aggregation collapses the shuffle. Session windows
require a per-user sort; Spark's session_window does gap-merge inside
the shuffle partition (no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.numeric import FIN, dec, fdec
from ..registry import EVENTS_US, query
from ..sources.tables import scan

SESSION_GAP = "2 hours"
SESSION_GAP_US = 2 * 3600 * 1_000_000


@query(
    "i1_tumbling",
    oracle=f"""
    {EVENTS_US}
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS wstart,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) + INTERVAL 1 HOUR AS wend,
           COUNT(*) AS n_events,
           CAST(SUM(CAST({FIN} AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM e
    GROUP BY 1, 2
    """,
)
def i1_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window aggregate (i1): hourly event stats. Same
    `window()` expression the streaming variant uses."""
    e = scan(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(fdec("value")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_events",
            "total_value",
            "n_users",
        )
    )


@query(
    "i2_sliding",
    oracle=f"""
    {EVENTS_US}
    -- FLOOR window alignment, integer-exact for NEGATIVE epochs too:
    -- duckdb's // TRUNCATES toward zero (-1 // 9e8 = 0), which shifts
    -- every pre-1970 window one slide late vs Spark's floorDiv; the
    -- ((x % P) + P) % P positive-mod form floors at any sign without
    -- the double-precision loss floor(x/P) has beyond 2^53 µs
    SELECT make_timestamp(epoch_us(ts)
                          - ((epoch_us(ts) % 900000000) + 900000000) % 900000000
                          - j * 900000000::BIGINT) AS wstart,
           make_timestamp(epoch_us(ts)
                          - ((epoch_us(ts) % 900000000) + 900000000) % 900000000
                          - j * 900000000::BIGINT)
             + INTERVAL 1 HOUR AS wend,
           COUNT(*) AS n_events,
           CAST(SUM(CAST({FIN} AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j) offsets
    GROUP BY 1, 2
    """,
)
def i2_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window aggregate (i2): 1-hour window sliding every 15
    minutes — each event lands in 4 windows. Oracle replicates window
    assignment with exact integer-µs arithmetic."""
    e = scan(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(fdec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_events",
            "total_value",
        )
    )


@query(
    "i3_session",
    oracle=f"""
    {EVENTS_US},
    flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > {SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS new_session
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT *, SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 2 HOUR AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST({FIN} AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM numbered
    GROUP BY user_id, sid
    """,
)
def i3_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session window aggregate (i3): gap-based sessions per user
    (2-hour gap). Boundary rule pinned (SURVEY §7 hard-part #2): a new
    session starts when the gap strictly exceeds the gap duration;
    session_end = last event + gap — exactly `session_window`'s
    semantics, replicated in the oracle with lag-gap + running sum."""
    e = scan(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", SESSION_GAP).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(fdec("value")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


WATERMARK_ANCHOR = "2024-01-15 00:00:00"


@query(
    "i8_watermark_inc",
    oracle=f"""
    {EVENTS_US}
    SELECT event_id, ts, user_id, event_type, value
    FROM e
    WHERE ts > TIMESTAMP '{WATERMARK_ANCHOR}'
    """,
)
def i8_watermark_inc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental high-water-mark sync (i8): rows newer than the stored
    watermark — the `sys_updated_on` poll [SN-API]. The stateful API
    (persist watermark, advance after commit) lives in
    streaming/incremental.py; the anchor here is fixed for determinism.
    The timestamp predicate pushes down to parquet row-group stats, so
    each poll reads only new data files at scale."""
    e = scan(spark, sf_dir, "events")
    return e.filter(
        F.col("ts") > F.lit(WATERMARK_ANCHOR).cast("timestamp")
    ).select("event_id", "ts", "user_id", "event_type", "value")


@query(
    "i9_cdc_merge",
    oracle="""
    WITH chg AS (
        SELECT c_custkey AS k, 'U' AS op, c_acctbal + 100.0 AS new_bal
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, 'D', NULL FROM customer WHERE c_custkey % 7 = 1
        UNION ALL
        SELECT c_custkey + 1000000, 'I', 500.0
        FROM customer WHERE c_custkey % 7 = 2
    )
    SELECT coalesce(s.c_custkey, g.k) AS c_custkey,
           CASE WHEN g.op = 'U' THEN g.new_bal
                WHEN g.op = 'I' THEN g.new_bal
                ELSE s.c_acctbal END AS c_acctbal,
           coalesce(g.op, '=') AS merge_op
    FROM customer s FULL OUTER JOIN chg g ON s.c_custkey = g.k
    WHERE g.op IS NULL OR g.op != 'D'
    """,
)
def i9_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC upsert/delete merge (i9): apply a change batch (insert /
    update / delete ops keyed by sys_id-style key) onto a snapshot —
    the IRE reconciliation step of every CMDB sync cycle [SN-API], and
    the MERGE INTO shape of any lakehouse ingest.

    One full-outer equi-join on the key: both sides hash-partition by
    key, so at 100 TB the merge is a single co-partitioned shuffle
    (or none, if snapshot and changes are bucketed by key on disk —
    the layout a5 produces). Change batches are typically ≪ snapshot:
    AQE demotes the join to broadcast automatically when so. The
    deterministic change set here is derived from the snapshot itself
    (key mod 7) to stay oracle-checkable."""
    c = scan(spark, sf_dir, "customer")
    chg = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .select(
            F.col("c_custkey").alias("k"),
            F.lit("U").alias("op"),
            (F.col("c_acctbal") + 100.0).alias("new_bal"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 7 == 1).select(
                F.col("c_custkey").alias("k"),
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("new_bal"),
            )
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 7 == 2).select(
                (F.col("c_custkey") + 1000000).alias("k"),
                F.lit("I").alias("op"),
                F.lit(500.0).alias("new_bal"),
            )
        )
    )
    merged = c.join(chg, c["c_custkey"] == chg["k"], "full_outer")
    return merged.filter(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce(c["c_custkey"], chg["k"]).alias("c_custkey"),
        F.when(F.col("op").isin("U", "I"), F.col("new_bal"))
        .otherwise(c["c_acctbal"])
        .alias("c_acctbal"),
        F.coalesce(F.col("op"), F.lit("=")).alias("merge_op"),
    )
