"""Shared helpers for oracle-parity-safe aggregation.

The driver compares Spark output against a DuckDB oracle with an
order-insensitive value hash (BASELINE.md "t2").  Floating-point SUM/AVG is
order-dependent, and Spark and DuckDB aggregate in different orders — so any
reduction over doubles must be made order-independent.  The trick: per-row
arithmetic in IEEE double is deterministic and identical across engines, so
we cast each row's value to an exact DECIMAL right before the SUM (decimal
addition is exact, hence order-independent) and cast the exact total back to
DOUBLE.  Ties in the double->decimal rounding cannot occur at scale 6
(binary doubles are never exactly x.0000005), so rounding mode differences
between engines are moot.

This is not just an oracle hack: at 100 TB the same property makes results
reproducible across partitionings and AQE re-plans.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(30,6): 24 integer digits — sums of 1e12 rows of 1e9-sized values
# still fit; scale 6 captures the cent-level synthetic data exactly.
DEC = "decimal(30,6)"


def dsum(expr: Column | str, alias: str) -> Column:
    """Order-independent SUM over doubles (exact decimal accumulation)."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(expr: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    c = F.col(expr) if isinstance(expr, str) else expr
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).alias(alias)


def sql_dsum_expr(expr: str) -> str:
    """Alias-free order-independent SUM expression (for composition)."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"


def sql_dsum(expr: str, alias: str) -> str:
    return f"{sql_dsum_expr(expr)} AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (f"(CAST(SUM(CAST({expr} AS DECIMAL(30,6))) AS DOUBLE)"
            f" / COUNT({expr})) AS {alias}")
