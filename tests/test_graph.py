"""Integer-grid PageRank (pipeline.graph): pure-Python replica + edge
semantics.  The oracle gate proves engine parity on the corpus overlap
graph; these tests pin the contract on adversarial little graphs."""

from pigeon_optics_spark.pipeline.graph import PSCALE, SCALE, pagerank


def _py_pagerank(edges, iters=3, damping_pct=85):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    base = (SCALE * (100 - damping_pct)) // (n * 100)
    tw = {}
    for s, _, w in edges:
        tw[s] = tw.get(s, 0) + w
    pe = [(s, d, (w * PSCALE) // tw[s]) for s, d, w in edges]
    r = {v: SCALE // n for v in nodes}
    for _ in range(iters):
        c = {v: 0 for v in nodes}
        for s, d, p in pe:
            c[d] += (r[s] * p) // PSCALE
        r = {v: base + (damping_pct * c[v]) // 100 for v in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, weight long")
    return {row["node"]: row["rank"] for row in pagerank(df, **kw).collect()}


class TestPagerank:
    def test_matches_python_replica_exactly(self, spark):
        # weighted digraph with a hub, a dangling node, and asymmetric edges
        edges = [("a", "b", 3), ("a", "c", 1), ("b", "c", 5), ("c", "a", 2),
                 ("d", "a", 7), ("b", "d", 1), ("e", "a", 1)]  # e: no inlinks
        got = _run(spark, edges)
        assert got == _py_pagerank(edges)

    def test_hub_outranks_leaf(self, spark):
        # everything points at 'hub'; hub points at one leaf
        edges = [(f"v{i}", "hub", 1) for i in range(5)] + [("hub", "v0", 1)]
        got = _run(spark, edges)
        assert got["hub"] > max(v for k, v in got.items() if k != "hub")

    def test_no_inlink_node_holds_base_rank(self, spark):
        edges = [("a", "b", 1), ("c", "b", 1)]
        got = _run(spark, edges)
        n = 3
        base = (SCALE * 15) // (n * 100)
        assert got["a"] == base and got["c"] == base

    def test_dangling_mass_leaks_total_bounded(self, spark):
        # dangling node 'b' absorbs rank it never redistributes: total mass
        # stays <= SCALE (never inflates) and every rank >= base
        edges = [("a", "b", 1)]
        got = _run(spark, edges, iters=5)
        assert sum(got.values()) <= SCALE
        base = (SCALE * 15) // (2 * 100)
        assert all(v >= base for v in got.values())


def test_bfs_distances_matches_python_bfs(spark):
    """Brute-force BFS replica on a seeded random graph + a path graph
    whose tail exceeds the hop bound (absence contract)."""
    import collections
    import random

    rng = random.Random(7)
    nodes = list(range(30))
    edges = {(a, b) for a, b in
             (sorted(rng.sample(nodes, 2)) for _ in range(45))}
    # plus a long path hanging off node 0: 100 -> 101 -> ... -> 105
    path = [(0, 100)] + [(100 + i, 101 + i) for i in range(5)]
    all_edges = sorted(edges) + path
    adj = collections.defaultdict(set)
    for a, b in all_edges:
        adj[a].add(b)
        adj[b].add(a)
    seeds = [0, 7]
    want = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in (1, 2, 3):
        frontier = {v for u in frontier for v in adj[u] if v not in want}
        for v in frontier:
            want[v] = h
    from pigeon_optics_spark.pipeline.graph import bfs_distances

    e_df = spark.createDataFrame(all_edges, "u long, v long")
    s_df = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {r["node"]: r["dist"]
           for r in bfs_distances(e_df, s_df, max_hops=3).collect()}
    assert got == want
    # path tail: 0 -> 100 (h1) -> 101 (h2) -> 102 (h3); 103+ beyond bound
    assert 102 in got and 103 not in got


def test_kcore_matches_python_peeling(spark):
    """kcore vs an independent Python peel on a mixed graph: a K5 clique
    (4-core), a C4 ring (2-core), a chain, and a bridge between clique
    and ring; verified at k=2 and k=3 including in-core degrees."""
    import collections

    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    ring = [(10, 11), (11, 12), (12, 13), (13, 10)]
    chain = [(20, 21), (21, 22)]
    bridge = [(0, 10)]
    all_edges = clique + ring + chain + bridge

    def peel(k):
        adj = collections.defaultdict(set)
        for a, b in all_edges:
            adj[a].add(b)
            adj[b].add(a)
        alive = set(adj)
        while True:
            rm = {n for n in alive
                  if sum(1 for m in adj[n] if m in alive) < k}
            if not rm:
                break
            alive -= rm
        return {n: sum(1 for m in adj[n] if m in alive) for n in alive}

    from pigeon_optics_spark.pipeline.graph import kcore

    e_df = spark.createDataFrame(all_edges, "u long, v long")
    for k in (2, 3):
        got = {r["node"]: r["core_deg"] for r in kcore(e_df, k=k).collect()}
        assert got == peel(k), k
    # k=3 drops ring/chain/bridge, keeps the bare K5 at degree 4
    got3 = {r["node"]: r["core_deg"] for r in kcore(e_df, k=3).collect()}
    assert got3 == {i: 4 for i in range(5)}
    # k=6 peels everything -> empty result, not an error
    assert kcore(e_df, k=6).count() == 0
