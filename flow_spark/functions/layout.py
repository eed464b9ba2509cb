"""Data-layout keys (Morton / Z-order interleaving).

Everything is integer bit arithmetic on JVM-side columns — stays inside
whole-stage codegen, no Python on the path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 16  # bits interleaved per dimension -> 32-bit z value


def morton_interleave16(x: Column, y: Column) -> Column:
    """Z-value: bit i of x lands at position 2i, bit i of y at 2i+1.

    Only the low 16 bits of each dimension participate (higher bits
    wrap); cast inputs down/bucket them first if they exceed 16 bits.
    """
    one = F.lit(1).cast("bigint")
    z: Column | None = None
    for i in range(BITS):
        term = F.shiftleft(F.shiftright(x, i).bitwiseAND(one), 2 * i) + F.shiftleft(
            F.shiftright(y, i).bitwiseAND(one), 2 * i + 1
        )
        z = term if z is None else z + term
    assert z is not None
    return z


def morton_interleave16_py(x: int, y: int) -> int:
    """Pure-python reference of :func:`morton_interleave16` (tests)."""
    z = 0
    for i in range(BITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


HILBERT_BITS = 8  # bits per dimension -> 256x256 grid, d in [0, 65536)


def _h_rx(s: int) -> str:
    return f"CASE WHEN (x & {s}) > 0 THEN 1 ELSE 0 END AS rx"


def _h_ry(s: int) -> str:
    return f"CASE WHEN (y & {s}) > 0 THEN 1 ELSE 0 END AS ry"


def _h_x(s: int) -> str:
    return (
        f"CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN {s - 1} - y "
        f"ELSE y END ELSE x END AS x"
    )


def _h_y(s: int) -> str:
    return (
        f"CASE WHEN ry = 0 THEN CASE WHEN rx = 1 THEN {s - 1} - x "
        f"ELSE x END ELSE y END AS y"
    )


def _h_d(s: int) -> str:
    digit = (
        "CASE WHEN rx = 0 AND ry = 0 THEN 0 "
        "WHEN rx = 0 AND ry = 1 THEN 1 "
        "WHEN rx = 1 AND ry = 1 THEN 2 ELSE 3 END"
    )
    return f"d + {s * s} * ({digit}) AS d"


def hilbert_rounds_spark(df):
    """Apply the SAME per-round expressions as :func:`hilbert_rounds_sql`
    to a DataFrame with integer columns (x, y, rawx, rawy); returns a
    frame with (d, rawx, rawy).  Shared expr text == oracle-exact."""
    df = df.selectExpr("x", "y", "0 AS d", "rawx", "rawy")
    for k in range(HILBERT_BITS):
        s = 1 << (HILBERT_BITS - 1 - k)
        df = df.selectExpr(
            "x", "y", "d", "rawx", "rawy", _h_rx(s), _h_ry(s)
        ).selectExpr(_h_x(s), _h_y(s), _h_d(s), "rawx", "rawy")
    return df.select("d", "rawx", "rawy")


def hilbert_rounds_sql(src: str) -> str:
    """SQL CTE chain computing the Hilbert index d of (x, y) on the
    2^HILBERT_BITS grid — the textbook xy->d bit-level walk (one round
    per bit, MSB first: quadrant digit + conditional reflect/swap),
    emitted as IDENTICAL text for Spark (selectExpr) and DuckDB, so the
    layout key is oracle-checkable bit-for-bit.  `src` must provide
    integer columns x, y in [0, 2^HILBERT_BITS) plus passenger columns
    rawx, rawy.  The final CTE is `h{HILBERT_BITS}` with columns
    (d, rawx, rawy).  Only +,-,*,&,CASE — integer, codegen-friendly,
    engine-agnostic.
    """
    ctes = [f"h0 AS (SELECT x, y, 0 AS d, rawx, rawy FROM {src})"]
    for k in range(HILBERT_BITS):
        s = 1 << (HILBERT_BITS - 1 - k)
        ctes.append(
            f"p{k} AS (SELECT x, y, d, rawx, rawy, "
            f"{_h_rx(s)}, {_h_ry(s)} FROM h{k})"
        )
        ctes.append(
            f"h{k + 1} AS (SELECT {_h_x(s)}, {_h_y(s)}, {_h_d(s)}, "
            f"rawx, rawy FROM p{k})"
        )
    return ",\n        ".join(ctes)


def hilbert_xy2d_py(x: int, y: int, bits: int = HILBERT_BITS) -> int:
    """Pure-python reference of the SQL walk (tests)."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d
