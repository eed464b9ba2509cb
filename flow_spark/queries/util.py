"""Helpers shared by query builders.

Cross-engine FP determinism: ``SUM(double)`` accumulates in a
partition/merge order that differs between Spark and the DuckDB oracle, so
a rounded money sum can flip its last digit (seen live: 185899.545 ->
.54 vs .55).  The fixture money columns are exact 2-decimal values, so we
sum them as ``DECIMAL`` (exact, order-independent — also what TPC-H
specifies), round, and cast back to double.  At 100 TB this is the same
answer-stability argument: decimal aggregation is deterministic under any
re-partitioning, AQE re-plan, or speculative re-execution.

Decimal widths are chosen so every product stays well under precision 38
in BOTH engines (no silent precision-loss rounding): price (12,2),
rate (4,2), price*rate (17,4), price*rate*rate (22,6).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRICE = "decimal(12,2)"  # extendedprice/totalprice/acctbal magnitudes
RATE = "decimal(4,2)"  # discount/tax in [0, 1)


def dec(col: Column | str, typ: str = PRICE) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def one_minus(col: Column | str) -> Column:
    """(1 - rate) as an exact RATE decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.lit(1) - c.cast("decimal(3,2)")).cast(RATE)


def one_plus(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.lit(1) + c.cast("decimal(3,2)")).cast(RATE)


def money_sum(expr: Column, scale: int = 2) -> Column:
    """Exact decimal sum -> round -> double (order-independent)."""
    return F.round(F.sum(expr), scale).cast("double")


def money_avg(expr: Column, scale: int = 4) -> Column:
    """Deterministic mean: exact decimal sum cast to double, / count."""
    return F.round(F.sum(expr).cast("double") / F.count(F.lit(1)), scale)


def revenue_expr() -> Column:
    """lineitem revenue term, exact: extprice * (1 - discount)."""
    return dec("l_extendedprice") * one_minus("l_discount")


#: DuckDB-side fragments (keep in sync with the Spark expressions above)
SQL_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
SQL_ONE_MINUS_DISC = "CAST(1 - CAST(l_discount AS DECIMAL(3,2)) AS DECIMAL(4,2))"
SQL_ONE_PLUS_TAX = "CAST(1 + CAST(l_tax AS DECIMAL(3,2)) AS DECIMAL(4,2))"
SQL_REVENUE = f"{SQL_PRICE} * {SQL_ONE_MINUS_DISC}"
