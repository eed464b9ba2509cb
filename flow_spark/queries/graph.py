"""Graph analytics over a derived supplier<->part bipartite graph.

The reference has no graph operators; this is north-star engine surface a
training-data platform needs (PageRank-style importance for source
weighting, triangle/community structure for spam rings, degree stats for
skew detection) expressed Spark-first:

- The edge list derives from ``lineitem`` as distinct (partkey, suppkey)
  pairs, both directions, with node ids packed into one bigint domain
  (part -> 2k, supplier -> 2k+1).  At 100 TB this is one hash-distinct
  over the fact table, partitioned by edge source thereafter.
- PageRank runs a FIXED number of iterations with all arithmetic in
  scaled-integer space (micro-rank units, floor division) so Spark and
  DuckDB agree bit-for-bit — the float formulation would diverge in the
  last ulps under different summation orders.  Each iteration is one
  shuffle (join ranks on src, aggregate on dst); the oracle unrolls the
  same three iterations as chained CTEs.
- Triangle counting first sparsifies to the top-E strongest co-supply
  ties (E = 3x node count, deterministic (count, s1, s2) order) — the
  standard strong-tie projection that keeps a naturally near-complete
  co-occurrence graph tractable — then enumerates each triangle once via
  the oriented s1 < s2 < s3 join.  At 100 TB the co-supply pair counts
  are the expensive part: one groupBy keyed (s1, s2) after a per-part
  self-join whose fan-out is bounded by max suppliers-per-part, and the
  top-E cut is a global top-k (the same rank-pushdown shape as
  sort_topk_global), after which the triangle join touches only E rows.

Reference parity: none (novel surface); SURVEY.md §2.2 'iterative /
graph' gap noted in round-1 COVERAGE notes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from flow_spark.catalog import load_table
from flow_spark.queries.registry import register

#: PageRank constants in micro-rank units (1.0 == 1_000_000)
_INIT_MICRO = 1_000_000
_TELEPORT_MICRO = 150_000  # 0.15 * 1e6
_N_ITER = 3


def _bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed edge list of the supplier<->part graph, both directions.

    Node ids share one bigint domain: part p -> 2p, supplier s -> 2s+1.
    """
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part_node = (F.col("l_partkey") * 2).cast("bigint")
    supp_node = (F.col("l_suppkey") * 2 + 1).cast("bigint")
    fwd = ps.select(supp_node.alias("src"), part_node.alias("dst"))
    bwd = ps.select(part_node.alias("src"), supp_node.alias("dst"))
    return fwd.unionByName(bwd)


def _sql_pagerank_iterations(n: int) -> str:
    """Chained CTEs r1..rN, each one PageRank step from the previous."""
    steps = []
    for i in range(1, n + 1):
        steps.append(
            f"""
        r{i} AS (
            SELECT e.dst AS node,
                   CAST({_TELEPORT_MICRO}
                        + (85 * SUM(r.rank // d.d)) // 100 AS BIGINT) AS rank
            FROM edges e
            JOIN r{i - 1} r ON e.src = r.node
            JOIN deg d ON d.src = e.src
            GROUP BY e.dst
        )"""
        )
    return ",".join(steps)


@register(
    "graph_pagerank",
    category="graph",
    doc="Fixed-iteration (3) PageRank over the supplier<->part bipartite "
    "graph in exact scaled-integer arithmetic: rank in micro-units, "
    "per-edge contribution = rank // out_degree (floor division), "
    "update = 150000 + (85 * incoming) // 100.  Bit-deterministic "
    "across engines because no floats are summed.  One shuffle per "
    "iteration (join on src, aggregate on dst); the degree table is "
    "computed once and reused.  Every node has both in- and out-edges "
    "by construction, so there is no dangling-mass term.",
    oracle=f"""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        edges AS (
            SELECT s * 2 + 1 AS src, p * 2 AS dst FROM ps
            UNION ALL
            SELECT p * 2 AS src, s * 2 + 1 AS dst FROM ps
        ),
        deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        r0 AS (
            SELECT src AS node, CAST({_INIT_MICRO} AS BIGINT) AS rank FROM deg
        ),
        {_sql_pagerank_iterations(_N_ITER)}
        SELECT node, rank AS microrank FROM r{_N_ITER} ORDER BY node
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _bipartite_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    ranks = deg.select(
        F.col("src").alias("node"), F.lit(_INIT_MICRO).cast("bigint").alias("rank")
    )
    # NOTE: edges_deg is deliberately NOT cached/checkpointed even though
    # the loop reuses it N times — measured at sf0.1, localCheckpoint
    # (store + truncate) costs MORE than the re-run of the scan+distinct
    # (2.9 s -> 3.4 s): the recompute is two codegen stages over a small
    # distinct set, while checkpointing serializes every partition.  At
    # 100 TB with an expensive upstream, flip to .localCheckpoint().
    edges_deg = edges.join(deg, "src")
    for _ in range(_N_ITER):
        ranks = (
            edges_deg.join(ranks, edges_deg.src == ranks.node)
            .select("dst", F.expr("rank div d").alias("contrib"))
            .groupBy("dst")
            .agg(
                (
                    F.lit(_TELEPORT_MICRO)
                    + F.expr("(85 * sum(contrib)) div 100")
                )
                .cast("bigint")
                .alias("rank")
            )
            .select(F.col("dst").alias("node"), "rank")
        )
    return ranks.select("node", F.col("rank").alias("microrank")).orderBy("node")


#: (applicationId, abs sf_dir) -> parquet dir of the materialized edge list.
#: Four graph queries (triangle_count, ktruss, LPA, modularity) share the
#: SAME deterministic strong-tie projection; deriving it per query re-ran
#: the pair aggregation 4x (LPA/modularity were 14-16 s each at sf1, both
#: edge-derivation-bound).  One parquet materialization per session+SF is
#: the classic shared-intermediate table: disk (not .cache) so it survives
#: bench.py's release_cached_blocks between entries, keyed by application
#: id so a fresh session (or regenerated fixtures) recomputes.
_STRONG_TIE_CACHE: dict = {}


def _strong_tie_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-E co-supply ties (E = 3x supplier count), s1 < s2 oriented.

    The co-supply graph on a random-ish fixture is near-complete, so raw
    triangle enumeration would be O(n^3); the deterministic top-E cut by
    (co DESC, s1, s2) keeps the strongest ties at every SF.  The result
    is deterministic, so the memoized parquet copy is value-identical to
    a recompute (every consumer's oracle replays the same cut).
    """
    import os as _os
    import tempfile as _tempfile

    import atexit as _atexit
    import shutil as _shutil

    key = (spark.sparkContext.applicationId, _os.path.abspath(sf_dir))
    path = _STRONG_TIE_CACHE.get(key)
    if path is not None and _os.path.isdir(path):
        return spark.read.parquet(path)
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # sorted-array HOF pair generation (the graph_link_prediction idiom):
    # one shuffle by part builds supplier lists, the i<j pairs explode
    # MAP-SIDE as one bigint key each (s1 << 31 | s2) and partial-agg
    # before the (s1,s2) shuffle — replacing the ps-self-join, which
    # re-shuffled every (part, supplier) row and measured 15.8x at 10x
    # data (28 s of the ktruss sf1 run) vs ~1.4x with this shape.  The
    # per-part fan-out is degree-bounded by the fixture (max 52); at
    # 100 TB a hub cap belongs here (see graph_link_prediction).
    grouped = (
        ps.groupBy("p")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
        .filter(F.size("ss") >= 2)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    within = F.expr(
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, size(ss)), y -> x * 2147483648L + y)))"
    )
    pairs = (
        grouped.select(F.explode(within).alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("co"))
        .select(
            F.expr("pk div 2147483648L").alias("s1"),
            F.expr("pk % 2147483648L").alias("s2"),
            "co",
        )
    )
    n_edges = 3 * ps.select("s").distinct().count()
    # global top-k: Spark pushes the limit through the sort (TakeOrdered)
    edges = (
        pairs.orderBy(F.desc("co"), "s1", "s2").limit(n_edges).select("s1", "s2")
    )
    path = _tempfile.mkdtemp(prefix="flow_spark_strong_ties_")
    # one memo dir per (application, sf_dir); removed at interpreter exit
    # so long-running multi-session hosts don't accrete parquet dirs
    _atexit.register(_shutil.rmtree, path, ignore_errors=True)
    edges.write.mode("overwrite").parquet(path)
    _STRONG_TIE_CACHE[key] = path
    return spark.read.parquet(path)


@register(
    "graph_triangle_count",
    category="graph",
    doc="Per-node triangle participation over the strong-tie co-supply "
    "graph: sparsify to the top-3n ties by co-supply count "
    "(deterministic order), orient edges s1 < s2, enumerate each "
    "triangle exactly once via the two-hop join "
    "E(a,b) |x| E(b,c) |x| E(a,c), then credit all three corners.  "
    "The expensive stage at scale is the co-supply pair aggregation "
    "(one groupBy keyed (s1, s2), fan-out bounded by max suppliers "
    "per part); the triangle join itself touches only the 3n "
    "surviving edges.",
    oracle="""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        pairs AS (
            SELECT a.s AS s1, b.s AS s2, COUNT(*) AS co
            FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
            GROUP BY a.s, b.s
        ),
        nn AS (SELECT 3 * COUNT(DISTINCT s) AS e FROM ps),
        edges AS (
            SELECT s1, s2 FROM (
                SELECT s1, s2,
                       ROW_NUMBER() OVER (ORDER BY co DESC, s1, s2) AS rn
                FROM pairs
            ), nn WHERE rn <= e
        ),
        tri AS (
            SELECT e1.s1 AS a, e1.s2 AS b, e2.s2 AS c
            FROM edges e1
            JOIN edges e2 ON e1.s2 = e2.s1
            JOIN edges e3 ON e1.s1 = e3.s1 AND e2.s2 = e3.s2
        ),
        corners AS (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        SELECT node, COUNT(*) AS n_triangles
        FROM corners GROUP BY node ORDER BY node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _strong_tie_edges(spark, sf_dir).cache()
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.s2") == F.col("e2.s1"))
        .join(
            e3,
            (F.col("e1.s1") == F.col("e3.s1"))
            & (F.col("e2.s2") == F.col("e3.s2")),
        )
        .select(
            F.col("e1.s1").alias("a"),
            F.col("e1.s2").alias("b"),
            F.col("e2.s2").alias("c"),
        )
    )
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return (
        corners.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("node")
    )


@register(
    "graph_degree_histogram",
    category="graph",
    doc="Degree distribution of the bipartite graph, split by node side "
    "(part vs supplier): degree per node via one groupBy on src, then "
    "the histogram via a second tiny groupBy on (side, degree).  The "
    "skew-detection primitive: a heavy-tailed histogram here is how a "
    "100 TB pipeline discovers the hot keys that need salting.",
    oracle="""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        edges AS (
            SELECT s * 2 + 1 AS src, p * 2 AS dst FROM ps
            UNION ALL
            SELECT p * 2 AS src, s * 2 + 1 AS dst FROM ps
        ),
        deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)
        SELECT CASE WHEN src % 2 = 1 THEN 'supplier' ELSE 'part' END AS side,
               d AS degree, COUNT(*) AS n_nodes
        FROM deg GROUP BY side, degree
        ORDER BY side, degree
    """,
)
def graph_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _bipartite_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    side = F.when(F.col("src") % 2 == 1, F.lit("supplier")).otherwise(
        F.lit("part")
    )
    return (
        deg.groupBy(side.alias("side"), F.col("d").alias("degree"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("side", "degree")
    )


_JACC_HUB_CAP = 64  # parts with more suppliers than this are hub-cut
_JACC_TOPK = 50


@register(
    "graph_link_prediction",
    category="graph",
    doc="Common-neighbor link prediction over the supplier projection of "
    "the bipartite graph: candidate supplier pairs ranked by exact-"
    "integer Jaccard overlap of their part neighborhoods (jacc_permille "
    "= 1000*|A&B| div |A|+|B|-|A&B|), full deterministic tiebreak "
    f"(score, common, s1, s2), top {_JACC_TOPK}.  Parts with more than "
    f"{_JACC_HUB_CAP} suppliers are hub-cut BEFORE the self-join — on "
    "this fixture that drops nothing, but at 100 TB it is what bounds "
    "the per-part pair fan-out to C(cap,2) instead of C(10^5,2); "
    "degrees are computed inside the same capped universe so the "
    "score stays a true Jaccard of the graph actually joined.  One "
    "self-join shuffle keyed on the part, one (s1,s2) groupBy, then a "
    "global top-k (rank-pushdown, same shape as sort_topk_global).",
    oracle=f"""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        keep AS (
            SELECT p FROM ps GROUP BY p HAVING COUNT(*) <= {_JACC_HUB_CAP}
        ),
        psk AS (SELECT ps.p, ps.s FROM ps JOIN keep USING (p)),
        deg AS (SELECT s, COUNT(*) AS d FROM psk GROUP BY s),
        pairs AS (
            SELECT a.s AS s1, b.s AS s2, COUNT(*) AS common
            FROM psk a JOIN psk b ON a.p = b.p AND a.s < b.s
            GROUP BY a.s, b.s
        ),
        scored AS (
            SELECT s1, s2, common, d1.d AS deg1, d2.d AS deg2,
                   1000 * common // (d1.d + d2.d - common) AS jacc_permille
            FROM pairs
            JOIN deg d1 ON d1.s = s1
            JOIN deg d2 ON d2.s = s2
        )
        SELECT s1, s2,
               CAST(common AS BIGINT) AS common,
               CAST(deg1 AS BIGINT) AS deg1,
               CAST(deg2 AS BIGINT) AS deg2,
               CAST(jacc_permille AS BIGINT) AS jacc_permille
        FROM scored
        ORDER BY jacc_permille DESC, common DESC, s1, s2
        LIMIT {_JACC_TOPK}
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    # one shuffle by part builds the hub-cut supplier lists; the i<j pair
    # generation is the same sorted-array HOF idiom as the LSH buckets
    # (operators/dedup.py) — no self-join, no separate hub-cut join, and
    # the per-part fan-out is bounded by the cap (<= C(64,2) pairs)
    grouped = (
        ps.groupBy("p")
        .agg(F.sort_array(F.collect_list("s")).alias("ss"))
        .filter(F.size("ss") <= _JACC_HUB_CAP)
        # the pair fan-out below multiplies rows ~C(cap,2)-fold: spread the
        # (few, heavy) part rows across every core BEFORE exploding —
        # measured 4x on the whole query at sf0.1 (3.8 s -> 0.9 s warm)
        .repartition(spark.sparkContext.defaultParallelism)
        .localCheckpoint()  # feeds both the degree and the pair branch
    )
    deg = (
        grouped.select(F.explode("ss").alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    # pairs travel as ONE bigint (s1 << 32 | s2) rather than a struct:
    # cheaper explode + hash-agg on a primitive key (~20% measured).
    # Bound: keys must fit 32 bits unsigned and s1 < 2^31 (product stays
    # under 2^63) — the original 2^20 shift silently corrupted pairs the
    # moment sf1's replicated supplier keys passed 1,048,576 (caught by
    # the full sf1 oracle sweep).  Beyond 2^31 keys, drop to a struct key.
    within = F.expr(
        "flatten(transform(ss, (x, i) -> "
        "transform(slice(ss, i + 2, size(ss)), y -> x * 4294967296L + y)))"
    )
    pairs = (
        grouped.filter(F.size("ss") >= 2)
        .select(F.explode(within).alias("pk"))
        .groupBy("pk")
        .agg(F.count(F.lit(1)).alias("common"))
        .select(
            F.expr("pk div 4294967296L").alias("s1"),
            F.expr("pk % 4294967296L").alias("s2"),
            "common",
        )
    )
    d1 = deg.select(F.col("s").alias("s1"), F.col("d").alias("deg1"))
    d2 = deg.select(F.col("s").alias("s2"), F.col("d").alias("deg2"))
    scored = (
        pairs.join(F.broadcast(d1), "s1")
        .join(F.broadcast(d2), "s2")
        .select(
            "s1",
            "s2",
            F.col("common").cast("bigint").alias("common"),
            F.col("deg1").cast("bigint").alias("deg1"),
            F.col("deg2").cast("bigint").alias("deg2"),
            F.expr("1000 * common div (deg1 + deg2 - common)")
            .cast("bigint")
            .alias("jacc_permille"),
        )
    )
    return scored.orderBy(
        F.desc("jacc_permille"), F.desc("common"), "s1", "s2"
    ).limit(_JACC_TOPK)


_BFS_MAX_LEVEL = 4


@register(
    "graph_bfs_levels",
    category="graph",
    doc="Breadth-first search from the minimum node of the bipartite "
    f"supplier<->part graph, {_BFS_MAX_LEVEL} levels: per level, the "
    "frontier expands by one join on src, new nodes are discovered via "
    "an anti-join against the visited set, and levels are minimal by "
    "construction (a node joins the frontier the first time it is "
    "reachable).  The Pregel/BSP shape: each level is one shuffle join "
    "+ one distinct, frontier and visited sets stay columnar, nothing "
    "iterates on the driver except the bounded level counter.  Level "
    "counts and node-id checksums make the whole reachability frontier "
    "value-checked.  Oracle: recursive CTE with UNION-distinct over "
    "(node, lvl) pairs (terminates at the level bound), min level per "
    "node.  At 100 TB the visited set is the scaling concern: it is "
    "hash-partitioned on node, the anti-join co-partitions with the "
    "frontier, and lineage stays shallow because the level count is a "
    "constant, not data-driven.  Source = MIN(src) computed as a 1-row "
    "aggregate DataFrame (no driver collect).",
    oracle=f"""
        WITH RECURSIVE ps AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        edges AS (
            SELECT s * 2 + 1 AS src, p * 2 AS dst FROM ps
            UNION ALL
            SELECT p * 2 AS src, s * 2 + 1 AS dst FROM ps
        ),
        walk(node, lvl) AS (
            SELECT (SELECT MIN(src) FROM edges), 0
            UNION
            SELECT e.dst, w.lvl + 1
            FROM walk w JOIN edges e ON e.src = w.node
            WHERE w.lvl < {_BFS_MAX_LEVEL}
        ),
        levels AS (
            SELECT node, MIN(lvl) AS lvl FROM walk GROUP BY node
        )
        SELECT lvl,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(node) AS BIGINT) AS id_checksum
        FROM levels
        GROUP BY lvl
        ORDER BY lvl
    """,
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _bipartite_edges(spark, sf_dir).cache()
    # seed: 1-row aggregate DataFrame — stays a DataFrame end to end
    frontier = edges.agg(F.min("src").alias("node"))
    visited = frontier.select("node", F.lit(0).alias("lvl"))
    for lvl in range(1, _BFS_MAX_LEVEL + 1):
        nxt = (
            frontier.join(edges, frontier.node == edges.src)
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            # materialize each level once: the union of L levels otherwise
            # re-derives every prefix chain per branch (measured 21.9 s ->
            # 4.1 s at sf0.01; contrast graph_pagerank, where per-iteration
            # state is 1 small rank table and recompute won)
            .localCheckpoint(eager=False)
        )
        visited = visited.unionByName(nxt.select("node", F.lit(lvl).alias("lvl")))
        frontier = nxt
    return (
        visited.groupBy("lvl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("node").cast("bigint").alias("id_checksum"),
        )
        .orderBy("lvl")
    )


# ---- connected components at scale (large-star / small-star) ---------------


@register(
    "graph_connected_components",
    category="graph",
    doc="Connected components via alternating large-star/small-star "
    "(Kiveris et al. SoCC'14) — the O(log^2 n)-round shuffle-native CC "
    "algorithm, vs O(diameter) for naive label propagation.  The input "
    "graph is a deliberately HIGH-DIAMETER stress case derived from real "
    "rows: customers chained by consecutive (acctbal, custkey) order "
    "within each (nation, mktsegment) group, so each component is a "
    "path of ~n/125 nodes (120 hops at sf0.1 — label propagation would "
    "need 120 shuffles; this converges in <10 star rounds, asserted in "
    "tests/test_graph_cc.py).  Ground truth is known by construction "
    "(component = min custkey of the group), which is what makes the "
    "oracle exact without a recursive CTE.  Every round is one "
    "groupBy + one co-partitioned join on the node id; the driver loop "
    "carries only a (count, hash) convergence probe.",
    oracle="""
        WITH g AS (
            SELECT c_custkey,
                   COUNT(*) OVER (PARTITION BY c_nationkey, c_mktsegment) AS n,
                   MIN(c_custkey) OVER (PARTITION BY c_nationkey, c_mktsegment) AS comp
            FROM customer
        )
        SELECT CAST(c_custkey AS BIGINT) AS id,
               CAST(comp AS BIGINT) AS component
        FROM g
        WHERE n >= 2
        ORDER BY id
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flow_spark.operators.graph import cc_star

    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey", "c_mktsegment").orderBy(
        "c_acctbal", "c_custkey"
    )
    chain = (
        cust.select(
            F.col("c_custkey").cast("bigint").alias("a"),
            F.lag(F.col("c_custkey").cast("bigint")).over(w).alias("b"),
        )
        .where(F.col("b").isNotNull())
    )
    return cc_star(chain).orderBy("id")


_KCORE_K = 3
_KCORE_ROUNDS = 3


def _sql_kcore_rounds() -> str:
    """Chained CTEs g1..gN, each one peel round from the previous."""
    steps = []
    for i in range(1, _KCORE_ROUNDS + 1):
        steps.append(
            f"""
        keep{i - 1} AS MATERIALIZED (
            SELECT src AS node FROM g{i - 1}
            GROUP BY src HAVING COUNT(*) >= {_KCORE_K}
        ),
        g{i} AS MATERIALIZED (
            SELECT e.src, e.dst FROM g{i - 1} e
            JOIN keep{i - 1} a ON a.node = e.src
            JOIN keep{i - 1} b ON b.node = e.dst
        )"""
        )
    return ",".join(steps)


@register(
    "graph_kcore_peel",
    category="graph",
    doc=f"k-core peeling (k={_KCORE_K}, {_KCORE_ROUNDS} unrolled rounds) "
    "over the supplier<->part bipartite graph: each round drops nodes "
    "with degree < k and the edges touching them — the standard "
    "spam-ring / dense-community extraction.  Full k-core iterates to "
    "a fixpoint; a FIXED round count is the production form at scale "
    "(each round is one groupBy + two co-partitioned semi-joins, and "
    "the node set shrinks monotonically so later rounds are cheaper; "
    "the round budget bounds worst-case cost on adversarial 'peeling "
    "chain' graphs the same way BFS bounds its level count).  Output "
    "is the per-round (nodes, directed edges) census — the convergence "
    "curve — all exact integers.",
    oracle=f"""
        -- MATERIALIZED: the census reads every g{{i}} while g{{i+1}} also
        -- reads g{{i}} — without the hint DuckDB re-evaluates the whole
        -- chain per census branch (exponential re-evaluation; observed
        -- >90 GB of temp spill at sf1 before the hint)
        WITH ps AS MATERIALIZED (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        g0 AS MATERIALIZED (
            SELECT s * 2 + 1 AS src, p * 2 AS dst FROM ps
            UNION ALL
            SELECT p * 2 AS src, s * 2 + 1 AS dst FROM ps
        ),
        {_sql_kcore_rounds()}
        SELECT r.round,
               CAST(r.n_nodes AS BIGINT) AS n_nodes,
               CAST(r.n_dir_edges AS BIGINT) AS n_dir_edges
        FROM (
            {" UNION ALL ".join(
                f"SELECT {i} AS round, COUNT(DISTINCT src) AS n_nodes,"
                f" COUNT(*) AS n_dir_edges FROM g{i}"
                for i in range(_KCORE_ROUNDS + 1)
            )}
        ) r
        ORDER BY r.round
    """,
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _bipartite_edges(spark, sf_dir).localCheckpoint()
    censuses = []
    cur = edges
    for rnd in range(_KCORE_ROUNDS + 1):
        censuses.append(
            cur.agg(
                F.lit(rnd).alias("round"),
                F.countDistinct("src").cast("bigint").alias("n_nodes"),
                F.count(F.lit(1)).cast("bigint").alias("n_dir_edges"),
            )
        )
        if rnd == _KCORE_ROUNDS:
            break
        keep = (
            cur.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select(F.col("src").alias("node"))
        )
        cur = (
            cur.join(keep.withColumnRenamed("node", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("node", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
    out = censuses[0]
    for c in censuses[1:]:
        out = out.unionByName(c)
    return out.orderBy("round")


_LPA_ITERS = 3
#: composite argmax key: cnt * 2^40 - label picks (max count, then MIN
#: label) with one scalar — both engines' arg/max_by need a scalar key
_LPA_KEY = 1 << 40


def _lpa_communities(spark: SparkSession, sf_dir: str):
    """Shared LPA machinery: returns (edges, sym, labels-after-N-rounds).

    edges is the canonical (s1 < s2) strong-tie list, localCheckpointed
    (it feeds both the sym expansion here and graph_modularity's
    within-community join); labels is checkpointed per round so round k
    never re-executes rounds 1..k-1.
    """
    st = _strong_tie_edges(spark, sf_dir).localCheckpoint()
    sym = st.select(
        F.col("s1").alias("node"), F.col("s2").alias("nbr")
    ).unionByName(
        st.select(F.col("s2").alias("node"), F.col("s1").alias("nbr"))
    ).localCheckpoint()  # edge list feeds every iteration: materialize once
    labels = sym.select("node").distinct().withColumn("lbl", F.col("node"))
    for _ in range(_LPA_ITERS):
        counts = (
            sym.join(
                labels.select(F.col("node").alias("nbr"), "lbl"), "nbr"
            )
            .groupBy("node", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = counts.groupBy("node").agg(
            F.expr(f"max_by(lbl, cnt * {_LPA_KEY} - lbl)").alias("lbl")
        ).localCheckpoint()
    return st, sym, labels


def _sql_lpa_step(prev: str, out: str) -> str:
    return f"""
        c_{out} AS (
            SELECT e.node, l.lbl, COUNT(*) AS cnt
            FROM sym e JOIN {prev} l ON l.node = e.nbr
            GROUP BY e.node, l.lbl
        ),
        {out} AS (
            SELECT node, arg_max(lbl, cnt * {_LPA_KEY} - lbl) AS lbl
            FROM c_{out} GROUP BY node
        )"""


@register(
    "graph_label_propagation",
    category="graph",
    doc="Community detection by synchronous label propagation (Raghavan "
    f"2007) over the strong-tie co-supply graph, {_LPA_ITERS} unrolled "
    "iterations: every node adopts its neighbors' most frequent label, "
    "ties broken to the SMALLEST label via one scalar argmax key "
    "(cnt * 2^40 - lbl) — fully deterministic, no random visit order.  "
    "Per iteration: one join of the edge list against the (node,label) "
    "frontier + two groupBys, the same BSP shape as PageRank — labels "
    "are a node-sized table, edges stream through one shuffle, nothing "
    "iterates on the driver.  Output: per-community size and member-id "
    "checksum.  The oracle replays all iterations as chained CTEs.",
    oracle=f"""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        pairs AS (
            SELECT a.s AS s1, b.s AS s2, COUNT(*) AS co
            FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
            GROUP BY a.s, b.s
        ),
        nn AS (SELECT 3 * COUNT(DISTINCT s) AS e FROM ps),
        edges AS (
            SELECT s1, s2 FROM (
                SELECT s1, s2,
                       ROW_NUMBER() OVER (ORDER BY co DESC, s1, s2) AS rn
                FROM pairs
            ), nn WHERE rn <= e
        ),
        sym AS (
            SELECT s1 AS node, s2 AS nbr FROM edges
            UNION ALL SELECT s2, s1 FROM edges
        ),
        l0 AS (SELECT DISTINCT node, node AS lbl FROM sym),
        {",".join(_sql_lpa_step(f"l{i}", f"l{i + 1}") for i in range(_LPA_ITERS))}
        SELECT CAST(lbl AS BIGINT) AS community,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(node) AS BIGINT) AS member_sum
        FROM l{_LPA_ITERS}
        GROUP BY lbl
        ORDER BY community
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, _, labels = _lpa_communities(spark, sf_dir)
    return (
        labels.groupBy("lbl")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.sum("node").cast("bigint").alias("member_sum"),
        )
        .select(F.col("lbl").cast("bigint").alias("community"), "n_members", "member_sum")
        .orderBy("community")
    )


_KTRUSS_K = 4  # edges must sit in >= k-2 = 2 triangles
_KTRUSS_ROUNDS = 2


def _sql_ktruss_rounds() -> str:
    steps = []
    for i in range(_KTRUSS_ROUNDS):
        steps.append(
            f"""
        tri{i} AS MATERIALIZED (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM g{i} e1
            JOIN g{i} e2 ON e2.a = e1.b
            JOIN g{i} e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        sup{i} AS (
            SELECT a, b, COUNT(*) AS s FROM (
                SELECT x AS a, y AS b FROM tri{i}
                UNION ALL SELECT y AS a, z AS b FROM tri{i}
                UNION ALL SELECT x AS a, z AS b FROM tri{i}
            ) GROUP BY a, b
        ),
        g{i + 1} AS MATERIALIZED (
            SELECT g.a, g.b FROM g{i} g
            JOIN sup{i} s ON s.a = g.a AND s.b = g.b
            WHERE s.s >= {_KTRUSS_K - 2}
        )"""
        )
    return ",".join(steps)


def _sql_ktruss_census() -> str:
    parts = []
    for i in range(_KTRUSS_ROUNDS + 1):
        parts.append(
            f"""SELECT {i} AS round,
                   (SELECT COUNT(*) FROM g{i}) AS n_edges,
                   (SELECT COUNT(*) FROM (
                        SELECT 1 FROM g{i} e1
                        JOIN g{i} e2 ON e2.a = e1.b
                        JOIN g{i} e3 ON e3.a = e1.a AND e3.b = e2.b
                   )) AS n_triangles"""
        )
    return " UNION ALL ".join(parts)


@register(
    "graph_ktruss_peel",
    category="graph",
    doc=f"k-truss peeling (k={_KTRUSS_K}, {_KTRUSS_ROUNDS} unrolled "
    "rounds) over the strong-tie co-supply graph: each round counts "
    "every edge's triangle support with the oriented (x<y<z) "
    "enumeration join (each triangle credits its three edges once) and "
    "drops edges in fewer than k-2 triangles — the community-core "
    "refinement one notch stronger than k-core (Cohen 2008).  Support "
    "recount per round is one self-join pipeline over the CAPPED "
    "strong-tie edge list (top-3n ties, so triangle work is bounded at "
    "any SF) and the edge set shrinks monotonically.  Output: "
    "(edges, triangles) census per round, exact integers.",
    oracle=f"""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        pairs AS (
            SELECT a.s AS s1, b.s AS s2, COUNT(*) AS co
            FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
            GROUP BY a.s, b.s
        ),
        g0 AS MATERIALIZED (
            SELECT s1 AS a, s2 AS b FROM pairs
            ORDER BY co DESC, s1, s2
            LIMIT 3 * (SELECT COUNT(DISTINCT s) FROM ps)
        ),
        {_sql_ktruss_rounds()}
        SELECT CAST(round AS BIGINT) AS round,
               CAST(n_edges AS BIGINT) AS n_edges,
               CAST(n_triangles AS BIGINT) AS n_triangles
        FROM ({_sql_ktruss_census()})
        ORDER BY round
    """,
)
def graph_ktruss_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = (
        _strong_tie_edges(spark, sf_dir)
        .select(F.col("s1").alias("a"), F.col("s2").alias("b"))
        .localCheckpoint()
    )

    def _triangles(g: DataFrame) -> DataFrame:
        e1 = g.select(F.col("a").alias("x"), F.col("b").alias("y"))
        e2 = g.select(F.col("a").alias("y"), F.col("b").alias("z"))
        e3 = g.select(F.col("a").alias("x"), F.col("b").alias("z"))
        return e1.join(e2, "y").join(e3, ["x", "z"])

    censuses = []
    cur = edges
    for rnd in range(_KTRUSS_ROUNDS + 1):
        tri = _triangles(cur)
        censuses.append(
            cur.agg(F.count(F.lit(1)).cast("bigint").alias("n_edges")).crossJoin(
                tri.agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
            ).select(
                F.lit(rnd).cast("bigint").alias("round"), "n_edges", "n_triangles"
            )
        )
        if rnd == _KTRUSS_ROUNDS:
            break
        sup = (
            tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
            .unionByName(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
            .unionByName(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("s"))
            .filter(F.col("s") >= _KTRUSS_K - 2)
            .select("a", "b")
        )
        cur = cur.join(sup, ["a", "b"], "left_semi").localCheckpoint(eager=False)
    out = censuses[0]
    for c in censuses[1:]:
        out = out.unionByName(c)
    return out.orderBy("round")


@register(
    "graph_modularity",
    category="graph",
    doc="Newman modularity Q of the label-propagation communities — the "
    "standard quality score that closes the community-detection loop "
    "(detect with graph_label_propagation, then QUANTIFY how much "
    "better than random the partition is).  All in exact integers: "
    "per community qnum = 4m*e_c - d_c^2 (e_c = within-community "
    "edges, d_c = total degree), and Q = sum(qnum) / 4m^2 reported "
    "once in ppm with floor division.  The LPA rounds are shared "
    "machinery (_lpa_communities, each round checkpointed); the "
    "modularity pass is two broadcast-joinable label lookups + one "
    "groupBy over the CAPPED edge list.  The oracle replays the same "
    "rounds as chained CTEs.",
    oracle=f"""
        WITH ps AS (
            SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
        ),
        pairs AS (
            SELECT a.s AS s1, b.s AS s2, COUNT(*) AS co
            FROM ps a JOIN ps b ON a.p = b.p AND a.s < b.s
            GROUP BY a.s, b.s
        ),
        nn AS (SELECT 3 * COUNT(DISTINCT s) AS e FROM ps),
        edges AS MATERIALIZED (
            SELECT s1, s2 FROM (
                SELECT s1, s2,
                       ROW_NUMBER() OVER (ORDER BY co DESC, s1, s2) AS rn
                FROM pairs
            ), nn WHERE rn <= e
        ),
        sym AS MATERIALIZED (
            SELECT s1 AS node, s2 AS nbr FROM edges
            UNION ALL SELECT s2, s1 FROM edges
        ),
        l0 AS (SELECT DISTINCT node, node AS lbl FROM sym),
        {",".join(_sql_lpa_step(f"l{i}", f"l{i + 1}") for i in range(_LPA_ITERS))},
        lab AS MATERIALIZED (SELECT node, lbl FROM l{_LPA_ITERS}),
        m AS (SELECT COUNT(*) AS m FROM edges),
        within AS (
            SELECT la.lbl, COUNT(*) AS ec
            FROM edges e
            JOIN lab la ON la.node = e.s1
            JOIN lab lb ON lb.node = e.s2
            WHERE la.lbl = lb.lbl
            GROUP BY la.lbl
        ),
        degs AS (SELECT node, COUNT(*) AS d FROM sym GROUP BY node),
        dc AS (
            SELECT la.lbl, SUM(d.d) AS dcs
            FROM lab la JOIN degs d ON d.node = la.node
            GROUP BY la.lbl
        ),
        contrib AS MATERIALIZED (
            SELECT dc.lbl, COALESCE(w.ec, 0) AS ec, dc.dcs,
                   4 * m.m * COALESCE(w.ec, 0) - dc.dcs * dc.dcs AS qnum
            FROM dc CROSS JOIN m
            LEFT JOIN within w ON w.lbl = dc.lbl
        ),
        tot AS (
            SELECT SUM(c.qnum) * 1000000 // (4 * m.m * m.m) AS q_ppm
            FROM contrib c, m GROUP BY m.m
        )
        SELECT CAST(c.lbl AS BIGINT) AS community,
               CAST(c.ec AS BIGINT) AS within_edges,
               CAST(c.dcs AS BIGINT) AS degree_sum,
               CAST(c.qnum AS BIGINT) AS qnum,
               CAST(t.q_ppm AS BIGINT) AS q_ppm
        FROM contrib c CROSS JOIN tot t
        ORDER BY community
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges, sym, labels = _lpa_communities(spark, sf_dir)
    la = labels.select(F.col("node").alias("s1"), F.col("lbl").alias("l1"))
    lb = labels.select(F.col("node").alias("s2"), F.col("lbl").alias("l2"))
    within = (
        edges.join(F.broadcast(la), "s1")
        .join(F.broadcast(lb), "s2")
        .filter(F.col("l1") == F.col("l2"))
        .groupBy(F.col("l1").alias("lbl"))
        .agg(F.count(F.lit(1)).alias("ec"))
    )
    degs = sym.groupBy("node").agg(F.count(F.lit(1)).alias("d"))
    dc = (
        labels.join(degs, "node")
        .groupBy("lbl")
        .agg(F.sum("d").alias("dcs"))
    )
    mdf = edges.agg(F.count(F.lit(1)).alias("m"))
    contrib = (
        dc.join(within, "lbl", "left")
        .crossJoin(F.broadcast(mdf))
        .select(
            "lbl",
            F.coalesce("ec", F.lit(0)).alias("ec"),
            "dcs",
            (
                4 * F.col("m") * F.coalesce("ec", F.lit(0))
                - F.col("dcs") * F.col("dcs")
            ).alias("qnum"),
            "m",
        )
    )
    tot = contrib.groupBy("m").agg(
        F.expr("sum(qnum) * 1000000 div (4 * m * m)").alias("q_ppm")
    ).select("q_ppm")
    return (
        contrib.crossJoin(F.broadcast(tot))
        .select(
            F.col("lbl").cast("bigint").alias("community"),
            F.col("ec").cast("bigint").alias("within_edges"),
            F.col("dcs").cast("bigint").alias("degree_sum"),
            F.col("qnum").cast("bigint").alias("qnum"),
            F.col("q_ppm").cast("bigint").alias("q_ppm"),
        )
        .orderBy("community")
    )
