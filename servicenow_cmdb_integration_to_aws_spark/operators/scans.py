"""Category A — scans / sources (SURVEY §2.A).

Domain mapping [SN-API]: a CMDB sync job reads CI tables (REST Table API,
paginated with ``sysparm_limit``/``sysparm_offset``) and AWS Config JSON
payloads; at rest everything is columnar parquet. Here each pattern is a
declarative Spark scan so Catalyst gets pushdown/pruning.

100 TB notes: a1/a2 are plain parquet scans — filters and projections
composed on top reach the row-group level. a3 parses the JSON boundary
with an explicit schema (never inference on the hot path). a4 is a
*simulation* of REST pagination for semantics parity; at scale the
pagination loop lives in the connector (one task per page), not in a
global sort — see sources/rest_source.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..sources.tables import scan, scan_declared


@query(
    "a1_scan_parquet",
    oracle="SELECT * FROM nation",
)
def a1_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan, footer schema (SURVEY §2 a1)."""
    return scan(spark, sf_dir, "nation")


@query(
    "a2_scan_schema",
    oracle="SELECT * FROM supplier",
)
def a2_scan_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-enforced scan: declared StructType, cast + ordered (a2)."""
    return scan_declared(spark, sf_dir, "supplier")


@query(
    "a3_ingest_jsonl",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS prop_k
    FROM events
    """,
)
def a3_ingest_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-string ingest: parse `events.props` into a typed struct (a3).

    The AWS-Config-payload pattern: semi-structured JSON flattened onto
    typed columns with a *declared* schema (`from_json`), not inference.
    """
    e = scan(spark, sf_dir, "events")
    parsed = e.withColumn(
        "props_struct",
        F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())])),
    )
    return parsed.select("event_id", F.col("props_struct.k").alias("prop_k"))


@query(
    "a4_rest_page_sim",
    oracle="SELECT * FROM orders",
)
def a4_rest_page_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paginated-source simulation: limit/offset pages reassembled (a4).

    ServiceNow Table API clients page with sysparm_limit/sysparm_offset
    over a stable ordering; the union of pages must equal the plain
    scan exactly. Page ordering key is the unique primary key so pages
    are disjoint and exhaustive.
    """
    o = scan(spark, sf_dir, "orders")
    total = o.count()
    page_size = max(1, (total + 3) // 4)
    o.createOrReplaceTempView("a4_orders_src")
    pages = []
    for off in range(0, total, page_size):
        pages.append(
            spark.sql(
                f"SELECT * FROM a4_orders_src ORDER BY o_orderkey "
                f"LIMIT {page_size} OFFSET {off}"
            )
        )
    out = pages[0]
    for p in pages[1:]:
        out = out.unionByName(p)
    return out
