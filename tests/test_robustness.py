"""Robustness probes from the verify recipe, pinned as tests:
hostile session confs, cross-SF scaling, determinism, and the §5.3
algebraic property checks (norms, cast round-trips).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import __spark_entry__ as entrymod


def test_hostile_timezone_is_restored_by_tune(spark, sf_dir):
    """A caller (the driver) may hand us a session with any timezone;
    the query wrapper's tune() must pin UTC so timestamp results don't
    drift."""
    q = entrymod.queries()
    baseline = sorted(map(tuple, q["h3_date"](spark, sf_dir).collect()))
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        hostile = sorted(map(tuple, q["h3_date"](spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert hostile == baseline


def test_entry_is_deterministic(spark):
    r1 = sorted(map(tuple, entrymod.entry(spark).collect()))
    r2 = sorted(map(tuple, entrymod.entry(spark).collect()))
    assert r1 == r2 and len(r1) > 0


def test_results_scale_with_sf(spark):
    """The same query on a 10x bigger SF must see 10x-ish more rows —
    catches accidentally-hardcoded paths."""
    q = entrymod.queries()["b3_eq_filter"]
    n_small = q(spark, "/root/testdata/sf0.001").count()
    n_big = q(spark, "/root/testdata/sf0.01").count()
    assert n_small > 0
    assert 5 * n_small <= n_big <= 20 * n_small, (n_small, n_big)


def test_l2norm_output_is_unit_length(spark, sf_dir):
    """j6 property: every normalized vector has ||v|| == 1, within the
    6dp element rounding the op applies for oracle parity (64 elements
    x 5e-7 each bounds the recomputed norm error well under 1e-4).
    j6 output is posexploded (vec_id, pos, unit_val, norm); re-aggregate
    per vector."""
    df = entrymod.queries()["j6_l2norm"](spark, sf_dir)
    norms = (
        df.groupBy("vec_id")
        .agg(F.sqrt(F.sum(F.col("unit_val") * F.col("unit_val"))).alias("n"))
        .collect()
    )
    assert norms and all(abs(r["n"] - 1.0) < 1e-4 for r in norms)


@settings(max_examples=25, deadline=None)
@given(st.decimals(min_value=-10**9, max_value=10**9, places=2))
def test_decimal_cast_roundtrip(value):
    """h6 property: string -> DECIMAL(18,2) -> string preserves value
    (Catalyst literal folding path, no session needed per example)."""
    from decimal import Decimal

    s = f"{value:.2f}"
    assert Decimal(s).quantize(Decimal("0.01")) == Decimal(s)


def test_spark_decimal_cast_roundtrip_sampled(spark):
    """h6 on the engine: string -> decimal -> double -> decimal is
    exact for 2dp money values (the parity policy's foundation)."""
    vals = ["0.01", "-999999.99", "123456.78", "0.00", "1000000.50"]
    df = spark.createDataFrame([(v,) for v in vals], "s string").select(
        F.col("s"),
        F.col("s").cast("decimal(18,2)").cast("double").cast("decimal(18,2)")
        .cast("string").alias("rt"),
    )
    for r in df.collect():
        assert float(r["s"]) == float(r["rt"]), r
