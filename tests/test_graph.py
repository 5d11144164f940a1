"""Fixed-point PageRank (operators/graph.py): hand-computed tiny graph,
dangling-node semantics, repartition determinism, python twin."""

from pyspark.sql import functions as F

from ideafast_etl_spark.operators.graph import (
    PR_SCALE,
    pagerank,
    purchase_graph_edges,
)


def _twin(edges, iters):
    """Pure-python replica of the fixed-point iteration."""
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    rank = {n: PR_SCALE for n in nodes}
    base = 15 * PR_SCALE // 100
    for _ in range(iters):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += rank[s] // out[s]
        rank = {n: base + (85 * contrib[n]) // 100 for n in nodes}
    return rank


def test_pagerank_matches_python_twin(spark):
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["irank"] for r in pagerank(df, iters=4).collect()}
    assert got == _twin(edges, 4)


def test_pagerank_hub_ranks_highest(spark):
    # star: everyone points at node 0
    edges = [(i, 0) for i in range(1, 6)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    rows = pagerank(df, iters=3).orderBy(F.desc("irank")).collect()
    assert rows[0]["node"] == 0
    # spokes are dangling-equal
    assert len({r["irank"] for r in rows[1:]}) == 1


def test_pagerank_deterministic_under_repartition(spark):
    edges = [(i % 7, (i * 3) % 7) for i in range(30) if i % 7 != (i * 3) % 7]
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = sorted(map(tuple, pagerank(df, iters=3).collect()))
    b = sorted(map(tuple, pagerank(df.repartition(11), iters=3).collect()))
    assert a == b


def test_purchase_graph_is_bidirectional_and_disjoint(spark):
    orders = spark.createDataFrame(
        [(1, 10), (2, 20)], ["o_orderkey", "o_custkey"]
    )
    lineitem = spark.createDataFrame(
        [(1, 5), (1, 6), (2, 5)], ["l_orderkey", "l_suppkey"]
    )
    e = purchase_graph_edges(orders, lineitem).collect()
    pairs = {(r["src"], r["dst"]) for r in e}
    # 3 distinct (cust, supp) pairs, both directions
    assert len(pairs) == 6
    # customer ids even, supplier ids odd
    for s, d in pairs:
        assert (s % 2) != (d % 2)
    assert (20, 11) in pairs and (11, 20) in pairs  # cust 10*2, supp 5*2+1


def test_bfs_hops_min_distance_and_cycles(spark):
    from ideafast_etl_spark.operators.graph import bfs_hops

    # 1->2->3->4 with a shortcut 1->3 and a back-edge 4->1 (cycle)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (4, 1)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=5).collect()}
    # min-hop wins (3 via the shortcut, not the long path); cycle terminates
    assert out == {1: 0, 2: 1, 3: 1, 4: 2}


def test_bfs_hops_depth_cap(spark):
    from ideafast_etl_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame([(i, i + 1) for i in range(6)], "src long, dst long")
    seeds = spark.createDataFrame([(0,)], "node long")
    out = bfs_hops(edges, seeds, max_hops=2)
    assert {r["node"] for r in out.collect()} == {0, 1, 2}


def _bfs_twin(edges, seed_nodes, max_hops):
    """Pure-python min-hop BFS replica."""
    from collections import defaultdict

    adj = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
    hops = {n: 0 for n in seed_nodes}
    frontier = set(seed_nodes)
    for i in range(1, max_hops + 1):
        nxt = {d for s in frontier for d in adj[s] if d not in hops}
        for d in nxt:
            hops[d] = i
        if not nxt:
            break
        frontier = nxt
    return hops


def test_bfs_hops_random_graph_parity(spark):
    """Seeded random-digraph fuzz vs the python twin: multi-seed frontiers,
    unreachable islands, cycles, and the early-exit path (hop budget beyond
    the graph's eccentricity) all in one sweep."""
    import random

    from ideafast_etl_spark.operators.graph import bfs_hops

    for seed, n, m, max_hops in ((7, 40, 90, 3), (23, 25, 30, 6)):
        rng = random.Random(seed)
        edges = list({
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        })
        seed_nodes = sorted(rng.sample(range(n), 2))
        e = spark.createDataFrame(edges, "src long, dst long")
        s = spark.createDataFrame([(x,) for x in seed_nodes], "node long")
        got = {
            r["node"]: r["hops"]
            for r in bfs_hops(e, s, max_hops=max_hops).collect()
        }
        assert got == _bfs_twin(edges, seed_nodes, max_hops), (
            f"seed={seed}"
        )


def test_pagerank_random_graph_matches_twin(spark):
    """Seeded random digraph vs the integer twin — exercises dangling
    nodes and uneven out-degrees beyond the fixed fixture."""
    import random

    rng = random.Random(11)
    edges = list({(rng.randrange(12), rng.randrange(12)) for _ in range(25)})
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["irank"] for r in pagerank(df, iters=4).collect()}
    assert got == _twin(edges, 4)


def test_bfs_hops_shj_conf_scoped_and_restored(spark):
    """bfs_hops pins the AQE SMJ->SHJ threshold for its own hop jobs only
    (r12): the session value must be restored on normal return AND when a
    hop job raises, and the result must be identical to a run with the
    conversion disabled."""
    from ideafast_etl_spark.operators import graph
    from ideafast_etl_spark.operators.graph import _SHJ_CONF, bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (4, 1)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    sentinel = "12345"
    prev = spark.conf.get(_SHJ_CONF, "0")
    spark.conf.set(_SHJ_CONF, sentinel)
    try:
        with_shj = {
            r["node"]: r["hops"]
            for r in bfs_hops(edges, seeds, max_hops=5).collect()
        }
        assert spark.conf.get(_SHJ_CONF) == sentinel  # restored on return
        # identical result with the conversion off (strategy is
        # semantics-free; the oracle relies on this)
        orig = graph._SHJ_THRESHOLD
        graph._SHJ_THRESHOLD = "0"
        try:
            without = {
                r["node"]: r["hops"]
                for r in bfs_hops(edges, seeds, max_hops=5).collect()
            }
        finally:
            graph._SHJ_THRESHOLD = orig
        assert with_shj == without == {1: 0, 2: 1, 3: 1, 4: 2}
        # exception path: a mid-loop failure must still restore the conf
        bad_seeds = spark.createDataFrame([("x",)], "node string")
        try:
            bfs_hops(edges, bad_seeds.selectExpr("node || 'y' as node"), 2)
        except Exception:
            pass
        assert spark.conf.get(_SHJ_CONF) == sentinel
    finally:
        spark.conf.set(_SHJ_CONF, prev)
