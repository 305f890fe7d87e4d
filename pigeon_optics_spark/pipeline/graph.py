"""Graph centrality over catalog-derived link graphs.

Training-data curation weighs sources by their position in a link/overlap
graph (the Common-Crawl-style host-authority signal): a source that many
other sources share content with — or link to — earns a different sampling
rate than an isolated one.  ``pagerank`` is the generic operator; the gate
runs it over the corpus source-overlap graph.

Engine determinism: floating-point PageRank is order-sensitive (the
per-node damping sum accumulates in engine-dependent order), so ranks live
on an integer grid — rank mass is a BIGINT in units of 1/scale, edge
proportions are BIGINTs in units of 1/pscale, and every step is integer
multiply / integer divide / order-free integer SUM.  Spark ``div``, DuckDB
``//`` and Python ``//`` agree on all (non-negative) inputs, so the oracle
reproduces ranks bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**9    # rank grid: 1.0 of rank mass == SCALE units
PSCALE = 10**6   # edge-proportion grid


def pagerank(edges: DataFrame, iters: int = 3,
             damping_pct: int = 85) -> DataFrame:
    """Weighted PageRank on an integer grid — Pregel-style iteration.

    ``edges``: (src, dst, weight[long]) — directed; pass both directions
    for an undirected graph.  Nodes are derived from the edge list, so a
    fully isolated vertex is out of scope (it would hold the base rank).

    Update rule (all integer, all deterministic)::

        p_uv  = (w_uv * PSCALE) div W_u          -- out-weight proportion
        c_v   = Σ_u (r_u * p_uv) div PSCALE      -- exact BIGINT sum
        r'_v  = base + (damping_pct * c_v) div 100
        base  = (SCALE * (100 - damping_pct)) div (N * 100)

    Dangling mass (nodes with no out-edges) simply leaks — the standard
    simplification; ranks remain a strict partial order either way.

    Scale shape: one shuffle per iteration (groupBy dst with map-side
    combine over the contributions join); ranks and edges are DataFrames
    throughout — nothing is collected but the node COUNT scalar.  Each
    round ends in ``localCheckpoint`` (the connected-components lesson:
    without it the join lineage doubles per iteration and planning time
    explodes long before data size matters).  At 100 TB the edge list
    shuffles on (src)/(dst) like any big join; skewed high-degree hubs are
    AQE skew-join territory, not a new algorithm.
    """
    e = edges.select(F.col("src"), F.col("dst"),
                     F.col("weight").cast("long").alias("w"))
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))).distinct().localCheckpoint()
    n = nodes.count()
    if n == 0:
        # 'SCALE div (n*100)' below would be a Python ZeroDivisionError —
        # refuse with the actual problem named (review finding)
        raise ValueError("pagerank: empty edge list (no nodes)")
    base = (SCALE * (100 - damping_pct)) // (n * 100)
    r0 = SCALE // n

    outw = e.groupBy("src").agg(F.sum("w").alias("tw"))
    # tw == 0 (a src whose edges ALL have weight 0) would DIVIDE_BY_ZERO
    # under ANSI mode mid-job; such a node sends no rank anywhere — treat
    # it as dangling (its mass leaks, the documented rule) by dropping
    # its zero-proportion edges up front
    pe = (e.join(outw, "src").where(F.col("tw") > 0)
          .select("src", "dst",
                  F.expr(f"(w * {PSCALE}) div tw").alias("p"))
          .localCheckpoint())

    ranks = nodes.select("node", F.lit(r0).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (pe.join(ranks, pe["src"] == ranks["node"])
                   .select(F.col("dst").alias("node"),
                           F.expr(f"(rank * p) div {PSCALE}").alias("c"))
                   .groupBy("node").agg(F.sum("c").alias("c")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         (F.lit(base).cast("long")
                          + F.expr(f"({damping_pct} * coalesce(c, CAST(0 AS LONG))) div 100")
                          ).alias("rank"))
                 .localCheckpoint())
    return ranks


def triangle_enumerate(edges: DataFrame) -> DataFrame:
    """Exact triangle enumeration via degree-ordered orientation.

    ``edges``: undirected edge list (u, v) BIGINT, one row per edge with
    u < v (canonical form; duplicates must be pre-deduped).  Returns one
    row per triangle as the sorted triple (p1, p2, p3).

    Scale shape — the textbook oriented wedge join (node-iterator++):
    every edge is oriented from its lower-(degree, node) endpoint to the
    higher one, so a node's oriented out-degree is bounded by O(sqrt(E))
    on any graph — the wedge self-join (out-neighbor pairs of a shared
    source) then touches Σ outdeg² = O(E^1.5) candidates worst-case
    instead of Σ deg² (unbounded under skew: one celebrity node with
    degree D contributes D² unoriented wedges but only its low-degree
    neighbors' small out-lists when oriented).  The closing-edge check is
    an equi-join against the oriented edge list.  Three shuffles total
    (degree agg, wedge join, close join), no window, no collect, and no
    CartesianProduct (plan-tested).

    Triangle identity: orientation by the total order (degree, node)
    yields each triangle exactly once — (a→b, a→c, b→c) with a the
    minimum — so no post-dedup is needed.
    """
    deg = (edges.select(F.col("u").alias("node"))
           .unionAll(edges.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("deg")))
    # attach (deg, node) sort keys to both endpoints, orient low -> high
    e = (edges
         .join(deg.withColumnsRenamed({"node": "u", "deg": "du"}), "u")
         .join(deg.withColumnsRenamed({"node": "v", "deg": "dv"}), "v"))
    fwd = F.struct(F.col("du").alias("d"), F.col("u").alias("n")) < \
        F.struct(F.col("dv").alias("d"), F.col("v").alias("n"))
    oriented = e.select(
        F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(fwd, F.struct(F.col("dv").alias("d"), F.col("v").alias("n")))
        .otherwise(F.struct(F.col("du").alias("d"), F.col("u").alias("n")))
        .alias("dst_key"))
    e1 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("b"),
                         F.col("dst_key").alias("kb"))
    e2 = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"),
                         F.col("dst_key").alias("kc"))
    wedges = (e1.join(e2, "a").where(F.col("kb") < F.col("kc"))
              .select("a", "b", "c"))
    closing = oriented.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    tris = wedges.join(closing, ["b", "c"])
    srt = F.array_sort(F.array("a", "b", "c"))
    return tris.select(srt[0].alias("p1"), srt[1].alias("p2"),
                       srt[2].alias("p3"))


def kcore(edges: DataFrame, k: int, max_rounds: int = 20,
          src: str = "u", dst: str = "v") -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly remove nodes
    whose degree among SURVIVORS is < k until a fixpoint — the classic
    community-density / spam-subgraph primitive (the fifth graph family
    after components, pagerank, triangles, BFS).

    ``edges``: undirected, one row per edge (pre-deduped, the
    triangle_enumerate contract).  → (node, core_deg): the surviving
    k-core members with their degree INSIDE the core.

    Scale shape: each round is one degree aggregation (map-side combined)
    + two anti-joins pruning the edge list, ``localCheckpoint``-ed so the
    loop's lineage stays flat (the connected-components lesson).  The only
    driver-side values are the per-round removal COUNTs — the scalar
    round-control class (kmeans/pagerank stance).  Peeling converges in
    O(peel depth) rounds (degeneracy ordering depth), data-dependent:
    exceeding ``max_rounds`` raises instead of silently returning a
    non-core (fixture-drift guard; the oracle unrolls a fixed superset of
    rounds, which is safe because peeling is idempotent at fixpoint)."""
    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionAll(edges.select(F.col(dst).alias("a"),
                                  F.col(src).alias("b"))))\
        .localCheckpoint()
    for _ in range(max_rounds):
        deg = und.groupBy("a").agg(F.count("*").alias("core_deg"))
        removed = deg.where(F.col("core_deg") < k).select("a")
        if removed.count() == 0:
            return deg.select(F.col("a").alias("node"), "core_deg")
        rm_a = removed
        rm_b = removed.select(F.col("a").alias("b"))
        und = (und.join(rm_a, "a", "left_anti")
               .join(rm_b, "b", "left_anti")
               .localCheckpoint())
    raise RuntimeError(
        f"k-core did not converge within {max_rounds} rounds — "
        "graph shape drifted; raise max_rounds and re-unroll the oracle")


def bfs_distances(edges: DataFrame, seeds: DataFrame, max_hops: int = 3,
                  src: str = "u", dst: str = "v") -> DataFrame:
    """Multi-source BFS over an undirected edge list: shortest hop count
    from ANY seed, bounded at ``max_hops`` (nodes farther than the bound
    are absent — at scale an unbounded frontier is the whole graph).

    → (node, dist) with dist in [0, max_hops].  The Pregel min-plus
    shape shared with pagerank/connected_components: each round joins
    the current distances to the adjacency list and folds with MIN —
    pure integer arithmetic, order-free, bit-reproducible in an
    iteration-unrolled SQL oracle.  ``localCheckpoint`` per round (the
    connected-components lesson: without it the self-referencing plan
    doubles every round and planning hangs).

    ``seeds`` is a (node) DataFrame; seed nodes need not appear in the
    edge list (dist 0 either way).
    """
    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionAll(edges.select(F.col(dst).alias("a"),
                                  F.col(src).alias("b"))))
    dist = seeds.select(F.col("node"),
                        F.lit(0).cast("long").alias("dist")).distinct()
    for h in range(1, max_hops + 1):
        # expand only the PREVIOUS round's level: nodes settled earlier
        # already contributed their neighbors, so re-joining the whole
        # accumulated set each round costs O(Σ settled degree) per round
        # for identical results (review finding)
        level = dist.where(F.col("dist") == h - 1)
        frontier = (level.join(und, level["node"] == und["a"])
                    .select(F.col("b").alias("node"),
                            F.lit(h).cast("long").alias("dist")))
        dist = (dist.unionByName(frontier)
                .groupBy("node").agg(F.min("dist").alias("dist"))
                .localCheckpoint())
    return dist


def sssp_distances(edges: DataFrame, seeds: DataFrame, max_rounds: int = 3,
                   src: str = "u", dst: str = "v",
                   weight: str = "w") -> DataFrame:
    """Bounded single-source(-set) WEIGHTED shortest paths — Bellman-Ford
    rounds over an undirected weighted edge list: after round k every
    node holds the cheapest total weight over paths of ≤ k edges from
    any seed (nodes beyond the bound are absent — the bfs_distances
    stance: an unbounded frontier is the whole graph at scale).

    Distinct from :func:`bfs_distances`: relaxation carries dist + w
    (min-PLUS over integer weights), so the cheapest path can be LONGER
    in hops than the hop-shortest one.  Same Pregel shape as the other
    iterative ops — one join + min-agg per round, ``localCheckpoint``
    per round (the connected-components lesson), only scalars on the
    driver.  All-integer arithmetic ⇒ bit-reproducible in an
    iteration-unrolled SQL oracle.
    """
    und = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"),
                        F.col(weight).cast("long").alias("w"))
           .unionAll(edges.select(F.col(dst).alias("a"),
                                  F.col(src).alias("b"),
                                  F.col(weight).cast("long").alias("w"))))
    dist = seeds.select(F.col("node"),
                        F.lit(0).cast("long").alias("dist")).distinct()
    frontier = dist
    for _ in range(max_rounds):
        # relax only from nodes whose dist IMPROVED last round (the
        # Bellman-Ford changed-set optimization): an unchanged node's
        # outgoing relaxations were already applied with the same dist,
        # so the fixpoint is identical and per-round cost tracks the
        # frontier degree, not Σ settled degree (review finding)
        relaxed = (frontier.join(und, frontier["node"] == und["a"])
                   .select(F.col("b").alias("node"),
                           (F.col("dist") + F.col("w")).alias("dist")))
        new_dist = (dist.unionByName(relaxed)
                    .groupBy("node").agg(F.min("dist").alias("dist"))
                    .localCheckpoint())
        frontier = (new_dist
                    .join(dist.withColumnRenamed("dist", "_prev"),
                          "node", "left")
                    .where(F.col("_prev").isNull()
                           | (F.col("dist") < F.col("_prev")))
                    .select("node", "dist")
                    .localCheckpoint())
        dist = new_dist
    return dist
