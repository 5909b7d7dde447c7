"""Import-set transform maps (a13) — the ServiceNow staging→target
ETL surface [SN-API]: an import lands in a staging table, a TRANSFORM
MAP declares per-field source→target mappings (rename, cast, default,
scripted transform), and a COALESCE KEY decides insert-vs-update
against the target table.

Spark-first: the map compiles to a single `select` of Column
expressions (one codegen'd projection — renames/casts/defaults are
free at any scale) and the upsert is one co-partitioned full-outer
join on the coalesce key, the same shape as c13/i9. Nothing here is
row-at-a-time: a 100 TB import is projection + one shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import scan


@dataclass(frozen=True)
class FieldMap:
    """One transform-map row: staging field → target field.

    ``cast``: optional Spark type name applied after ``fn``.
    ``default``: value substituted when the (transformed) source is
    null — the map's "use source script / default value" knob.
    ``fn``: optional Column→Column transform (the scripted field map);
    must be built from built-in functions to stay codegen'd.
    """

    src: str
    tgt: str
    cast: Optional[str] = None
    default: object = None
    fn: Optional[Callable[[Column], Column]] = None


def apply_transform_map(staging: DataFrame, maps: list[FieldMap]) -> DataFrame:
    """Compile the transform map onto the staging frame: one projection."""
    cols = []
    for m in maps:
        c = F.col(m.src)
        if m.fn is not None:
            c = m.fn(c)
        if m.cast is not None:
            c = c.cast(m.cast)
        if m.default is not None:
            c = F.coalesce(c, F.lit(m.default))
        cols.append(c.alias(m.tgt))
    return staging.select(*cols)


def upsert(
    target: DataFrame,
    staged: DataFrame,
    key: str,
    tag_col: str = "row_source",
) -> DataFrame:
    """Coalesce-key merge: staged rows win field-by-field (import is
    authoritative); unmatched target rows pass through; unmatched
    staged rows are inserts. One full-outer join on the key — both
    sides hash-partition once, the COALESCE is row-local."""
    s = staged.select([F.col(c).alias(f"_s_{c}") for c in staged.columns])
    j = target.join(s, target[key] == s[f"_s_{key}"], "full_outer")
    out_cols = [
        F.coalesce(F.col(f"_s_{c}"), F.col(c)).alias(c)
        if c in staged.columns
        else F.col(c)
        for c in target.columns
    ]
    tag = (
        F.when(F.col(f"_s_{key}").isNotNull() & F.col(key).isNotNull(), "update")
        .when(F.col(f"_s_{key}").isNotNull(), "insert")
        .otherwise("existing")
        .alias(tag_col)
    )
    return j.select(*out_cols, tag)


@query(
    "a13_transform_map",
    oracle="""
    WITH staging AS (
        SELECT c_custkey AS import_key,
               c_name AS import_name,
               c_acctbal + 100.0 AS import_bal,
               NULLIF(c_mktsegment, 'MACHINERY') AS import_seg
        FROM customer WHERE c_custkey % 5 = 0
    ),
    mapped AS (
        SELECT import_key AS c_custkey,
               upper(import_name) AS c_name,
               CAST(import_bal AS DOUBLE) AS c_acctbal,
               COALESCE(import_seg, 'UNKNOWN') AS c_mktsegment
        FROM staging
    )
    SELECT COALESCE(m.c_custkey, t.c_custkey) AS c_custkey,
           COALESCE(m.c_name, t.c_name) AS c_name,
           t.c_nationkey AS c_nationkey,
           COALESCE(m.c_acctbal, t.c_acctbal) AS c_acctbal,
           COALESCE(m.c_mktsegment, t.c_mktsegment) AS c_mktsegment,
           CASE WHEN m.c_custkey IS NOT NULL AND t.c_custkey IS NOT NULL
                THEN 'update'
                WHEN m.c_custkey IS NOT NULL THEN 'insert'
                ELSE 'existing' END AS row_source
    FROM customer t FULL OUTER JOIN mapped m ON m.c_custkey = t.c_custkey
    """,
)
def a13_transform_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Import-set transform map + coalesce-key upsert (a13) [SN-API]:
    every-5th customer arrives as a fresh import (balance restated,
    name normalized to upper case, segment defaulted when the choice
    value is unmapped); the map projects staging→target fields and the
    merge updates matching CIs, leaving the rest untouched. The
    `row_source` tag is the transform-map audit column."""
    c = scan(spark, sf_dir, "customer")
    staging = c.filter(F.col("c_custkey") % 5 == 0).select(
        F.col("c_custkey").alias("import_key"),
        F.col("c_name").alias("import_name"),
        (F.col("c_acctbal") + 100.0).alias("import_bal"),
        F.nullif("c_mktsegment", F.lit("MACHINERY")).alias("import_seg"),
    )
    maps = [
        FieldMap("import_key", "c_custkey"),
        FieldMap("import_name", "c_name", fn=F.upper),
        FieldMap("import_bal", "c_acctbal", cast="double"),
        FieldMap("import_seg", "c_mktsegment", default="UNKNOWN"),
    ]
    staged = apply_transform_map(staging, maps)
    return upsert(c, staged, "c_custkey")


@query(
    "a25_transform_errors",
    oracle="""
    WITH staged AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 11 = 0 THEN NULL
                    ELSE CAST(c_custkey AS VARCHAR) END AS src_key,
               CASE WHEN c_custkey % 13 = 0 THEN 'not-a-number'
                    ELSE CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS VARCHAR)
                    END AS src_bal,
               c_name AS src_name
        FROM customer
    )
    SELECT CASE WHEN src_key IS NULL THEN 'missing_coalesce_key'
                WHEN TRY_CAST(src_bal AS DOUBLE) IS NULL
                  THEN 'type_cast_failure'
                ELSE 'ok' END AS row_state,
           COUNT(*) AS n,
           MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
    FROM staged GROUP BY 1
    """,
)
def a25_transform_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Import-set error rows (a25): ServiceNow transform maps give
    every import row a STATE — inserted/updated/ignored/error — and
    broken rows land in the import-set row table with an error
    message, never silently dropped. This operator classifies a
    deliberately dirty staging feed (missing coalesce key every 11th
    row, unparseable money every 13th) into `row_state` buckets with
    id ranges — the a24 quarantine discipline applied at the
    TRANSFORM stage instead of the parse stage.

    Parity: fault injection is arithmetic on the key (deterministic
    across engines/runs); the type-failure test is try_cast on both
    sides (h16's family); counts and key ranges exact.

    100 TB notes: classification is one map-side CASE over the
    staging scan plus a |states|-key partial agg; the error rows
    then re-enter a13's upsert EXCLUDED by a pushed row_state filter
    — the import never stalls on bad rows, and the error report is an
    aggregate, not a log-scrape (a21's observe carries the same
    counters in-flight)."""
    c = scan(spark, sf_dir, "customer")
    staged = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None))
        .otherwise(F.col("c_custkey").cast("string"))
        .alias("src_key"),
        F.when(F.col("c_custkey") % 13 == 0, F.lit("not-a-number"))
        .otherwise(F.col("c_acctbal").cast("decimal(18,2)").cast("string"))
        .alias("src_bal"),
        F.col("c_name").alias("src_name"),
    )
    state = (
        F.when(F.col("src_key").isNull(), "missing_coalesce_key")
        .when(F.col("src_bal").try_cast("double").isNull(), "type_cast_failure")
        .otherwise("ok")
    )
    return staged.groupBy(state.alias("row_state")).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("c_custkey").alias("min_key"),
        F.max("c_custkey").alias("max_key"),
    )
