"""Python Data Source with server-side filter pushdown (SURVEY §4/§7
phase 6) — the ServiceNow REST Table API pattern.

The domain's ONE essential optimization is pushing predicates to the
source as a `sysparm_query` encoded string so the server filters
before the wire [SN-API]. This module implements that with Spark's
Python Data Source API (PySpark ≥4.0):

- :class:`TableApiServer` simulates the REST endpoint (no network in
  this sandbox): it evaluates an encoded query over a parquet file and
  serves `sysparm_offset`/`sysparm_limit` pages — server-side
  filtering + pagination, exactly the Table API contract.
- :class:`SnowTableDataSource` is the Spark connector. `pushFilters`
  translates Catalyst filters (EqualTo/GreaterThan/In/StringStartsWith
  …) into encoded-query terms and accepts them; untranslatable filters
  are returned to Spark for post-scan evaluation (the DSv2 contract).
  `partitions()` asks the server for the filtered count and emits one
  InputPartition per page → PARALLEL paginated ingest.

100 TB notes: pushdown means the cluster never sees non-matching rows
— the dominant cost at scale is the wire, not the CPU. Pages map to
input partitions so ingest parallelism is `ceil(matching/page_size)`,
and each worker fetches only its page. (A real deployment adds retry/
rate-limit handling per page; the sandbox server is a local class, so
that surface is intentionally absent rather than stubbed with fakes.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

PAGE_SIZE_DEFAULT = 25_000


class TableApiServer:
    """Simulated ServiceNow Table API: encoded-query filter + paging
    over one parquet 'table'. Lives driver-side for count() and inside
    each worker for page fetches (stateless; path + query pickle)."""

    def __init__(self, path: str):
        self.path = path

    def _frame(self, sysparm_query: str):
        import pandas as pd  # noqa: F401  (worker-side import)
        import pyarrow.parquet as pq

        pdf = pq.read_table(self.path).to_pandas()
        if sysparm_query:
            from ..plans.encoded_query import parse

            groups = parse(sysparm_query)
            if len(groups) != 1:
                raise ValueError("server supports a single ^NQ branch")
            mask = None
            for disj in groups[0].groups:
                dmask = None
                for t in disj:
                    m = self._term_mask(pdf, t)
                    dmask = m if dmask is None else (dmask | m)
                mask = dmask if mask is None else (mask & dmask)
            if mask is not None:
                pdf = pdf[mask]
        # stable server-side order: primary key = first column
        return pdf.sort_values(list(pdf.columns[:1]), kind="mergesort")

    @staticmethod
    def _term_mask(pdf, t):
        col = pdf[t.field]
        v = type(col.iloc[0])(t.value) if len(col) and t.op not in (
            "IN", "ISNOTEMPTY", "STARTSWITH", "ENDSWITH", "LIKE",
        ) else t.value
        if t.op == "=":
            return col == v
        if t.op == "!=":
            return col != v
        if t.op == ">":
            return col > v
        if t.op == ">=":
            return col >= v
        if t.op == "<":
            return col < v
        if t.op == "<=":
            return col <= v
        if t.op == "IN":
            vals = t.value.split(",")
            typed = [type(col.iloc[0])(x) for x in vals] if len(col) else vals
            return col.isin(typed)
        if t.op == "STARTSWITH":
            return col.astype(str).str.startswith(t.value)
        if t.op == "ENDSWITH":
            return col.astype(str).str.endswith(t.value)
        if t.op == "LIKE":
            return col.astype(str).str.contains(t.value, regex=False)
        if t.op == "ISNOTEMPTY":
            return col.notna()
        raise ValueError(f"server does not implement {t.op}")

    def count(self, sysparm_query: str) -> int:
        return len(self._frame(sysparm_query))

    def fetch(self, sysparm_query: str, offset: int, limit: int):
        pdf = self._frame(sysparm_query).iloc[offset : offset + limit]
        return list(pdf.itertuples(index=False, name=None))


def _filter_to_term(f: Filter) -> str | None:
    """Catalyst Filter -> encoded-query term (None = not translatable,
    Spark re-applies it post-scan)."""
    if len(getattr(f, "attribute", ("x",))) != 1:
        return None
    a = f.attribute[0]
    if isinstance(f, EqualTo):
        return f"{a}={f.value}"
    if isinstance(f, GreaterThan):
        return f"{a}>{f.value}"
    if isinstance(f, GreaterThanOrEqual):
        return f"{a}>={f.value}"
    if isinstance(f, LessThan):
        return f"{a}<{f.value}"
    if isinstance(f, LessThanOrEqual):
        return f"{a}<={f.value}"
    if isinstance(f, In):
        return f"{a}IN" + ",".join(str(v) for v in f.value)
    if isinstance(f, StringStartsWith):
        return f"{a}STARTSWITH{f.value}"
    if isinstance(f, StringEndsWith):
        return f"{a}ENDSWITH{f.value}"
    if isinstance(f, StringContains):
        return f"{a}LIKE{f.value}"
    if isinstance(f, IsNotNull):
        return f"{a}ISNOTEMPTY"
    return None


def _pushdown_log_path(path: str) -> str:
    """Sidecar file recording the last encoded query pushed for `path`.
    The reader runs inside a Spark Python worker process, so tests
    can't observe it via module state — the file is the audit channel
    (and mirrors a real connector's request log)."""
    import hashlib
    import tempfile

    h = hashlib.md5(path.encode()).hexdigest()[:16]
    return f"{tempfile.gettempdir()}/snow_pushed_{h}.log"


def last_pushed(path: str) -> str:
    """The encoded query most recently pushed for `path` ('' if none)."""
    import os

    p = _pushdown_log_path(path)
    if not os.path.exists(p):
        return ""
    with open(p) as f:
        return f.read().strip()


@dataclass
class PagePartition(InputPartition):
    offset: int
    limit: int


class SnowTableReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.path = options.get("path")
        self.page_size = int(options.get("page_size", PAGE_SIZE_DEFAULT))
        self.terms: list[str] = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            term = _filter_to_term(f)
            if term is None:
                yield f  # Spark keeps evaluating this one
            else:
                self.terms.append(term)
        with open(_pushdown_log_path(self.path), "w") as fh:
            fh.write("^".join(self.terms))

    @property
    def _query(self) -> str:
        return "^".join(self.terms)

    def partitions(self):
        total = TableApiServer(self.path).count(self._query)
        return [
            PagePartition(off, self.page_size)
            for off in range(0, max(total, 1), self.page_size)
        ]

    def read(self, partition: PagePartition):
        server = TableApiServer(self.path)
        yield from server.fetch(self._query, partition.offset, partition.limit)


class SnowTableDataSource(DataSource):
    """`spark.read.format("snow_table").schema(ddl).option("path", p)`"""

    @classmethod
    def name(cls) -> str:
        return "snow_table"

    def reader(self, schema) -> SnowTableReader:
        return SnowTableReader(schema, self.options)


def register(spark) -> None:
    """Idempotent registration of the connector on a session."""
    try:
        spark.dataSource.register(SnowTableDataSource)
    except Exception:
        pass  # already registered on this session


# --- registered query id -------------------------------------------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ..registry import query  # noqa: E402
from .tables import SCHEMAS, path_of  # noqa: E402


@query(
    "a8_rest_pushdown",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer
    WHERE c_acctbal > 1000.0
      AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)
def a8_rest_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REST-source scan with server-side filter pushdown (a8): the
    DataFrame filter below is translated by `pushFilters` into the
    encoded query `c_acctbal>1000.0^c_mktsegmentINBUILDING,AUTOMOBILE`
    and evaluated by the (simulated) Table API server — Spark receives
    only matching pages, in parallel. tests/test_rest_source.py asserts
    the predicates actually left Spark."""
    register(spark)
    df = (
        spark.read.format("snow_table")
        .schema(SCHEMAS["customer"])
        .option("path", path_of(sf_dir, "customer"))
        .load()
    )
    return df.filter(
        (F.col("c_acctbal") > 1000.0)
        & F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
    )
