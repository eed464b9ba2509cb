"""Bucketed range-lookup joins: spatial grid radius join and CIDR
longest-prefix-match.

Two classic "the naive form is quadratic" joins, each expressed with the
bounded-candidate bucketing that survives 100 TB:

- ``join_spatial_grid``: radius self-join over 2-D points.  Points land in
  r-sized grid cells; each probe point fans out to its 3x3 cell
  neighborhood, so candidate pairs are bounded by local density — never
  the n^2 cross product the DuckDB oracle runs.  This is the standard
  geo-join shape (geohash/S2 bucketing) for store-proximity, sensor
  clustering, near-duplicate GPS traces.
- ``join_cidr_lookup``: IPv4 longest-prefix-match against a CIDR table.
  The probe side expands each address once per DISTINCT prefix length
  (<= 17 rows, broadcast), joins on the masked prefix, and keeps the
  longest match per address — the routing-table join behind geo-IP and
  abuse-list enrichment, with candidates O(|lens|) per row instead of
  O(|cidrs|).

Coordinates/addresses derive deterministically from row keys via the
portable (md5) hash bridge so both engines compute identical inputs;
the ORACLES use the naive quadratic / full-table formulations, proving
the bucketed plans produce exactly the same answer.

Reference parity: none (novel surface; the reference's router
pkg/flow/router.go routes on exact meta keys only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flow_spark.catalog import load_table
from flow_spark.functions.hashing import portable_hash64, portable_hash_expr
from flow_spark.queries.registry import register

#: world size and radius for the grid join (integer lattice)
_WORLD = 100_000
_RADIUS = 2_000

#: IPv4 space
_IP_SPACE = 4_294_967_296  # 2^32


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    key = F.col("c_custkey").cast("string")
    return cust.select(
        F.col("c_custkey").cast("bigint").alias("id"),
        F.pmod(portable_hash64(key, salt="gx"), F.lit(_WORLD)).alias("x"),
        F.pmod(portable_hash64(key, salt="gy"), F.lit(_WORLD)).alias("y"),
    )


_POINTS_SQL = f"""
        SELECT CAST(c_custkey AS BIGINT) AS id,
               {portable_hash_expr("CAST(c_custkey AS VARCHAR)", salt="gx")} % {_WORLD} AS x,
               {portable_hash_expr("CAST(c_custkey AS VARCHAR)", salt="gy")} % {_WORLD} AS y
        FROM customer
"""


@register(
    "join_spatial_grid",
    category="join",
    doc="Grid-bucketed radius self-join: points in r-sized cells, probe "
    "side fans out to its 3x3 neighborhood, exact integer distance "
    f"filter d2 <= r^2 (r={_RADIUS} on a {_WORLD}^2 lattice).  Each "
    "unordered pair is produced exactly once (probe covers the "
    "neighbor cells, build side keeps its own cell, id< filter picks "
    "one orientation), so no distinct is needed.  The oracle is the "
    "NAIVE all-pairs cross join — the point of the entry is that the "
    "bucketed plan (candidates bounded by local density, shuffle keyed "
    "on cells) matches it bit-for-bit.  Output is per-point neighbor "
    "stats, all exact integers.",
    oracle=f"""
        WITH pts AS ({_POINTS_SQL}),
        pairs AS (
            SELECT p.id AS a, q.id AS b,
                   (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y) AS d2
            FROM pts p JOIN pts q ON p.id < q.id
            WHERE (p.x - q.x) * (p.x - q.x) + (p.y - q.y) * (p.y - q.y)
                  <= {_RADIUS * _RADIUS}
        ),
        sides AS (
            SELECT a AS id, d2 FROM pairs
            UNION ALL
            SELECT b AS id, d2 FROM pairs
        )
        SELECT id,
               CAST(COUNT(*) AS BIGINT) AS n_neighbors,
               CAST(MIN(d2) AS BIGINT) AS min_d2,
               CAST(SUM(d2) AS BIGINT) AS sum_d2
        FROM sides
        GROUP BY id
        ORDER BY id
    """,
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    r = F.lit(_RADIUS)
    build = pts.select(
        F.col("id").alias("a_id"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        (F.col("x") / r).cast("bigint").alias("cx"),
        (F.col("y") / r).cast("bigint").alias("cy"),
    )
    # probe side covers its 3x3 cell neighborhood: one struct array explode
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = (
        pts.select(
            F.col("id").alias("b_id"),
            F.col("x").alias("bx"),
            F.col("y").alias("by"),
            (F.col("x") / r).cast("bigint").alias("bcx"),
            (F.col("y") / r).cast("bigint").alias("bcy"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "b_id",
            "bx",
            "by",
            (F.col("bcx") + F.col("o.dx")).alias("cx"),
            (F.col("bcy") + F.col("o.dy")).alias("cy"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    pairs = (
        build.join(probe, ["cx", "cy"])
        .where(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", d2.alias("d2"))
        .where(F.col("d2") <= F.lit(_RADIUS * _RADIUS))
    )
    both = pairs.select(F.col("a_id").alias("id"), "d2").unionByName(
        pairs.select(F.col("b_id").alias("id"), "d2")
    )
    return (
        both.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_neighbors"),
            F.min("d2").cast("bigint").alias("min_d2"),
            F.sum("d2").cast("bigint").alias("sum_d2"),
        )
        .orderBy("id")
    )


@register(
    "join_cidr_lookup",
    category="join",
    doc="IPv4 longest-prefix-match join: ~|supplier| CIDR routes with "
    "prefix lengths 8..24 (deduped per (net, len) by min suppkey), "
    "probed by one synthetic address per order.  The probe expands "
    "each address once per DISTINCT prefix length present (<= 17, a "
    "broadcast cross join), joins on the masked prefix (address div "
    "2^(32-len) == net), and arg-max-by-length picks the winner — "
    "unique per address because equal lengths imply equal masks.  "
    "Candidates are O(distinct lens) per address, vs O(|cidrs|) for "
    "the naive containment scan the oracle runs.  Unmatched addresses "
    "roll up under route_supp = -1 (the default route).  Masks use "
    "div by cast(pow(2, 32-len) as bigint) — exact for 2^8..2^24 — "
    "because Spark's shiftright takes only literal shift amounts.",
    oracle=f"""
        WITH cidrs_raw AS (
            SELECT s_suppkey AS supp,
                   8 + (s_suppkey % 17) AS len,
                   ({portable_hash_expr("CAST(s_suppkey AS VARCHAR)", salt="ip")}
                    % {_IP_SPACE})
                   // CAST(POW(2, 32 - (8 + (s_suppkey % 17))) AS BIGINT) AS net
            FROM supplier
        ),
        cidrs AS (
            SELECT net, len, MIN(supp) AS supp
            FROM cidrs_raw GROUP BY net, len
        ),
        ips AS (
            SELECT o_orderkey AS ip_id,
                   {portable_hash_expr("CAST(o_orderkey AS VARCHAR)", salt="oip")}
                   % {_IP_SPACE} AS ip
            FROM orders
        ),
        matched AS (
            SELECT i.ip_id, i.ip,
                   ARG_MAX(c.supp, c.len) AS supp,
                   MAX(c.len) AS len
            FROM ips i
            JOIN cidrs c
              ON i.ip // CAST(POW(2, 32 - c.len) AS BIGINT) = c.net
            GROUP BY i.ip_id, i.ip
        ),
        unmatched AS (
            SELECT ip_id, ip FROM ips
            WHERE ip_id NOT IN (SELECT ip_id FROM matched)
        ),
        tagged AS (
            SELECT supp AS route_supp, len AS prefix_len, ip FROM matched
            UNION ALL
            SELECT -1, 0, ip FROM unmatched
        )
        SELECT CAST(route_supp AS BIGINT) AS route_supp,
               CAST(prefix_len AS BIGINT) AS prefix_len,
               CAST(COUNT(*) AS BIGINT) AS n_ips,
               CAST(SUM(ip) AS BIGINT) AS ip_checksum
        FROM tagged
        GROUP BY route_supp, prefix_len
        ORDER BY route_supp, prefix_len
    """,
)
def join_cidr_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    plen = (F.lit(8) + F.col("s_suppkey") % 17).cast("bigint")
    base = F.pmod(
        portable_hash64(F.col("s_suppkey").cast("string"), salt="ip"),
        F.lit(_IP_SPACE),
    )
    cidrs = (
        supp.select(
            F.col("s_suppkey").cast("bigint").alias("supp"),
            plen.alias("len"),
            base.alias("base"),
        )
        .withColumn("net", F.expr("base div CAST(pow(2, 32 - len) AS BIGINT)"))
        .groupBy("net", "len")
        .agg(F.min("supp").alias("supp"))
    )
    ips = orders.select(
        F.col("o_orderkey").cast("bigint").alias("ip_id"),
        F.pmod(
            portable_hash64(F.col("o_orderkey").cast("string"), salt="oip"),
            F.lit(_IP_SPACE),
        ).alias("ip"),
    )
    lens = cidrs.select("len").distinct()
    cand = ips.crossJoin(F.broadcast(lens)).withColumn(
        "pfx",
        F.expr("ip div CAST(pow(2, 32 - len) AS BIGINT)"),
    )
    matched = (
        cand.join(
            F.broadcast(cidrs.withColumnRenamed("net", "pfx")),
            ["len", "pfx"],
        )
        .groupBy("ip_id", "ip")
        .agg(
            F.max_by("supp", "len").alias("route_supp"),
            F.max("len").alias("prefix_len"),
        )
    )
    unmatched = ips.join(matched.select("ip_id"), "ip_id", "left_anti").select(
        F.lit(-1).cast("bigint").alias("route_supp"),
        F.lit(0).cast("bigint").alias("prefix_len"),
        "ip",
    )
    tagged = matched.select("route_supp", "prefix_len", "ip").unionByName(unmatched)
    return (
        tagged.groupBy("route_supp", "prefix_len")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_ips"),
            F.sum("ip").cast("bigint").alias("ip_checksum"),
        )
        .orderBy("route_supp", "prefix_len")
    )
