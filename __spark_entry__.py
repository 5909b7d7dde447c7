"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship TPC-H-Q1-style pricing summary at
sf0.001; ``queries()``/``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with its DuckDB differential oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import servicenow_cmdb_integration_to_aws_spark as engine

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    engine.load_all()
    return engine.QUERIES["d2_agg_group"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    engine.load_all()
    return dict(engine.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query id (where expressible)."""
    engine.load_all()
    return dict(engine.ORACLE)
