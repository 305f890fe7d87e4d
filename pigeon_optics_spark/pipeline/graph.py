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
    base = (SCALE * (100 - damping_pct)) // (n * 100)
    r0 = SCALE // n

    outw = e.groupBy("src").agg(F.sum("w").alias("tw"))
    pe = (e.join(outw, "src")
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
