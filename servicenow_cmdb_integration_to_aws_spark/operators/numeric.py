"""Shared exact-decimal helpers (float-parity policy, SURVEY §7 #1).

Money columns carry exactly-2-decimal values, so sums/products are
computed over DECIMAL casts — exact, order-independent — and only the
final value is cast to DOUBLE, identically in Spark and the DuckDB
oracle. Lives in its own module so importing it does NOT trigger any
operator registration (registration order is the driver's check order;
see ``load_all``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(c: str, p: int = 18, s: int = 2) -> Column:
    """Exact-decimal view of a 2dp money column (parity policy)."""
    return F.col(c).cast(f"decimal({p},{s})")


def dsum(col: Column) -> Column:
    """Exact decimal sum emitted as DOUBLE (bit-identical both engines)."""
    return F.sum(col).cast("double")
