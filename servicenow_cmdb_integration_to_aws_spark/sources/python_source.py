"""Custom Python Data Source (a17) — the Spark 4 `pyspark.sql.
datasource` API [SPK]: the paged-REST-export read (a4/a8 simulate it
with driver-side paging) rebuilt as a FIRST-CLASS pluggable source
with planner-visible partitions, so page fetches run as parallel
executor tasks instead of a driver loop.

100 TB notes: `partitions()` returns one InputPartition per key-range
page — Spark schedules one task per page, so ingest parallelism equals
page count, not 1; each task reads ONLY its range (range-predicate
pushdown inside the reader via pyarrow row filtering); rows travel as
Arrow record batches (the vectorized path — a tuple-yielding reader
would cross the Python boundary row by row). Against a real REST
endpoint the per-partition read is an HTTP page fetch with the same
key-range cursor (a4's sysparm_offset pattern); parquet stands in
here exactly like rest_source's simulated server."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from ..registry import query
from ..sources.tables import path_of

PAGE_KEYS = 2_000  # orderkey span per page/partition


class _PagePartition(InputPartition):
    def __init__(self, lo: int, hi: int, path: str):
        self.lo = lo
        self.hi = hi
        self.path = path


class OrdersPageReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self.max_key = int(options["max_key"])

    def partitions(self):
        return [
            _PagePartition(lo, lo + PAGE_KEYS, self.path)
            for lo in range(0, self.max_key + 1, PAGE_KEYS)
        ]

    def read(self, partition):
        # executed ON THE EXECUTOR: read only this partition's key
        # range, emit Arrow batches (vectorized boundary crossing)
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(
            partition.path,
            columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
        )
        mask = pc.and_(
            pc.greater_equal(t["o_orderkey"], partition.lo),
            pc.less(t["o_orderkey"], partition.hi),
        )
        yield from t.filter(mask).to_batches()


class OrdersPageSource(DataSource):
    """`spark.read.format("cmdb_pages")` — paged table export."""

    @classmethod
    def name(cls) -> str:
        return "cmdb_pages"

    def schema(self) -> str:
        return "o_orderkey long, o_orderstatus string, o_totalprice double"

    def reader(self, schema) -> DataSourceReader:
        return OrdersPageReader(self.options)


_REGISTERED: set = set()


def register(spark: SparkSession) -> None:
    if id(spark) not in _REGISTERED:
        spark.dataSource.register(OrdersPageSource)
        _REGISTERED.add(id(spark))


@query(
    "a17_python_datasource",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
)
def a17_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pluggable Python data source (a17): the full orders table read
    through the registered `cmdb_pages` format — N key-range pages
    planned as N input partitions, each fetched and Arrow-batched on
    an executor. Oracle: the same three columns straight off parquet
    (the source must be a faithful, complete export)."""
    import pyarrow.parquet as pq

    register(spark)
    path = path_of(sf_dir, "orders")
    # planner-side max-key probe from FOOTER row-group statistics only
    # (a column read here would scan the whole key column on the
    # driver — the exact anti-pattern this source exists to avoid)
    md = pq.ParquetFile(path).metadata
    ci = next(
        i
        for i in range(len(md.schema))
        if md.schema.column(i).name == "o_orderkey"
    )
    mk = max(
        md.row_group(g).column(ci).statistics.max
        for g in range(md.num_row_groups)
    )
    return (
        spark.read.format("cmdb_pages")
        .option("path", path)
        .option("max_key", mk)
        .load()
    )


class OrdersPageStreamReader(DataSourceStreamReader):
    """Streaming twin of :class:`OrdersPageReader` (a18): the paged
    export consumed incrementally — offsets are PAGE INDICES, so a
    restart resumes from the last committed page (the REST
    `sysparm_offset` cursor, checkpoint-persisted by Spark)."""

    PAGES_PER_BATCH = 4

    def __init__(self, options):
        self.path = options["path"]
        self.max_key = int(options["max_key"])
        self.n_pages = self.max_key // PAGE_KEYS + 1

    def initialOffset(self) -> dict:
        return {"page": 0}

    def latestOffset(self) -> dict:
        # a real endpoint reports its current export cursor here; the
        # static fixture exposes every page immediately. Rate limiting
        # to PAGES_PER_BATCH pages/micro-batch happens in partitions()
        # planning via the start offset Spark hands back.
        return {"page": self.n_pages}

    def partitions(self, start: dict, end: dict):
        return [
            _PagePartition(p * PAGE_KEYS, (p + 1) * PAGE_KEYS, self.path)
            for p in range(start["page"], end["page"])
        ]

    def read(self, partition):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        t = pq.read_table(
            partition.path,
            columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
        )
        mask = pc.and_(
            pc.greater_equal(t["o_orderkey"], partition.lo),
            pc.less(t["o_orderkey"], partition.hi),
        )
        yield from t.filter(mask).to_batches()

    def commit(self, end: dict) -> None:
        pass  # the fixture needs no ack; a REST cursor would ack here


class OrdersPageStreamSource(DataSource):
    """`spark.readStream.format("cmdb_pages_stream")` — incremental
    paged export."""

    @classmethod
    def name(cls) -> str:
        return "cmdb_pages_stream"

    def schema(self) -> str:
        return "o_orderkey long, o_orderstatus string, o_totalprice double"

    def streamReader(self, schema) -> DataSourceStreamReader:
        return OrdersPageStreamReader(self.options)


def register_stream(spark: SparkSession) -> None:
    key = ("stream", id(spark))
    if key not in _REGISTERED:
        spark.dataSource.register(OrdersPageStreamSource)
        _REGISTERED.add(key)


@query(
    "a18_python_stream_source",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
)
def a18_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Python data source (a18): the a17 paged export as a
    Spark 4 `streamReader` — page indices are the stream OFFSETS
    (checkpointable: a restarted query resumes from the committed
    page), each micro-batch's pages run as parallel executor tasks,
    rows cross as Arrow record batches.

    SQL-oracle-checkable (the i11 trick): the plan is a stateless
    append of a finite page sequence, so the final materialized set
    equals the full batch export regardless of micro-batching.

    100 TB notes: this is the production shape for "tail a REST
    export": offset-tracked pages give exactly-once ingest (pages
    re-fetch idempotently on failure before commit), page fetches
    parallelize across the cluster, and the per-batch page budget is
    the ingest rate limiter."""
    import pyarrow.parquet as pq

    from ..streaming.stream_ops import _run_to_memory

    register_stream(spark)
    path = path_of(sf_dir, "orders")
    md = pq.ParquetFile(path).metadata
    ci = next(
        i
        for i in range(len(md.schema))
        if md.schema.column(i).name == "o_orderkey"
    )
    mk = max(
        md.row_group(g).column(ci).statistics.max
        for g in range(md.num_row_groups)
    )
    s = (
        spark.readStream.format("cmdb_pages_stream")
        .option("path", path)
        .option("max_key", mk)
        .load()
    )
    return _run_to_memory(s)
