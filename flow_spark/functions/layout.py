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
