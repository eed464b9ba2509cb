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


# --------------------------------------------------------------------------
# Fixed-point (cents) fast path
#
# SUM over DecimalType costs ~2.3x SUM over LongType in the hash-agg hot
# loop (measured at sf0.1, 591k groups).  Money columns are exact
# 2-decimal values, so scaled-integer arithmetic is just as exact:
# per-row values become longs (cents / basis points), the aggregate runs
# on longs, and only the per-GROUP finalization touches decimal (sum ->
# decimal38 -> /10^scale -> round).  Same determinism argument as the
# decimal path — integer sums are order-independent.
#
# Overflow bound: long holds ±9.2e18.  Revenue in 1e-4 units is ≤1e9 per
# row, so a single group can hold ~9e9 rows before overflow — at larger
# fan-in, sum in two levels or fall back to money_sum.  (TPC-H SF100k's
# biggest per-group partial is far below this.)
# --------------------------------------------------------------------------


def cents(col: Column | str, scale: int = 2) -> Column:
    """Exact scaled-integer of a value with <= `scale` decimals."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**scale), 0).cast("long")


def cents_sum_money(expr: Column, in_scale: int, out_scale: int = 2) -> Column:
    """SUM a scaled-long expr -> rounded double money value.

    The exact integer sum converts to double (well-defined round-to-nearest,
    identical in Spark and DuckDB), then one IEEE division and one
    half-away-from-zero round — every step bit-identical across engines.
    (Exact-decimal division instead would round differently from the double
    path at .xx5 boundaries, and the two engines type decimal division
    differently — so double-division on BOTH sides is the determinism play.)
    """
    return F.round(F.sum(expr).cast("double") / (10**in_scale), out_scale)


def revenue_cents() -> Column:
    """lineitem revenue in 1e-4 units: cents(price) * (100 - pct(disc))."""
    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


#: DuckDB equivalents (HUGEINT sum, then scale back)
SQL_PRICE_CENTS = "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
SQL_DISC_PCT = "CAST(ROUND(l_discount * 100, 0) AS BIGINT)"
SQL_TAX_PCT = "CAST(ROUND(l_tax * 100, 0) AS BIGINT)"
SQL_REVENUE_CENTS = f"({SQL_PRICE_CENTS} * (100 - {SQL_DISC_PCT}))"


def sql_cents_sum_money(expr: str, in_scale: int, out_scale: int = 2) -> str:
    return f"ROUND(CAST(SUM({expr}) AS DOUBLE) / {10**in_scale}, {out_scale})"
SQL_REVENUE = f"{SQL_PRICE} * {SQL_ONE_MINUS_DISC}"
