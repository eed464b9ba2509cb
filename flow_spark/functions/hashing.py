"""Portable (cross-engine) hashing primitives.

The correctness harness compares Spark results against a DuckDB oracle, so
any hash-dependent operator (MinHash, SimHash, LSH bucketing, deterministic
"random" routing) must use a hash function that both engines compute
identically.  Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` are
different algorithms, but **md5 is bit-identical everywhere**, so:

    portable_hash64(s) = int(md5(s)[:15 hex digits], 16)   # 60 bits, fits i64

Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to bigint
DuckDB: ``('0x' || substr(md5(s), 1, 15))::bigint``

md5 is ~3x slower than xxhash64 but still JVM-side / codegen'd; at 100 TB
scale, swap ``PORTABLE=False`` paths to ``xxhash64`` (the oracle is a test
artifact, not a production dependency).

Reference analogue: flow's only hash is JumpHash
(/root/reference/pkg/util/hash/jump_hash.go:6-17, dead code in v1alpha1);
deterministic routing by key replaces its consistent-hash placement.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: number of leading md5 hex digits to keep: 15 digits = 60 bits < 63, so the
#: value always fits a signed int64 in both engines.
_HEX_DIGITS = 15


def portable_hash64(col: Column | str, salt: str = "") -> Column:
    """60-bit deterministic hash of a string column, identical in DuckDB.

    ``salt`` derives independent hash functions (for MinHash permutations).
    """
    c = F.col(col) if isinstance(col, str) else col
    salted = F.concat(F.lit(salt), c) if salt else c
    return F.conv(F.substring(F.md5(salted), 1, _HEX_DIGITS), 16, 10).cast("bigint")


def portable_hash_expr(sql_expr: str, salt: str = "") -> str:
    """The DuckDB-side SQL equivalent of :func:`portable_hash64`."""
    inner = f"concat('{salt}', {sql_expr})" if salt else sql_expr
    return f"CAST(('0x' || substr(md5({inner}), 1, {_HEX_DIGITS})) AS BIGINT)"


def minhash_band_key(minhash_cols: list[Column], band: int) -> Column:
    """Concatenate one band's minhash values into an LSH bucket key."""
    return F.concat_ws(":", F.lit(str(band)), *[c.cast("string") for c in minhash_cols])


def portable_hash64_py(s: str, salt: str = "") -> int:
    """Driver-side Python twin of :func:`portable_hash64` — bit-identical
    (same md5-prefix construction), so manifest arithmetic (e.g. hidden-
    partition bucket pruning) can compute the bucket a value lands in
    without a Spark job."""
    import hashlib

    return int(hashlib.md5((salt + s).encode()).hexdigest()[:_HEX_DIGITS], 16)
