"""Fixed-point PageRank (operators/graph.py)."""

from collections import defaultdict

from fundcrawler_spark.operators.graph import pagerank_fixed_point

SCALE = 1_000_000_000


def _py_pagerank(edges, iters, scale=SCALE):
    """Independent pure-Python replication of the fixed-point spec."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = defaultdict(int)
    for u, _ in edges:
        outdeg[u] += 1
    rank = {n: scale for n in nodes}
    base = (scale * 15) // 100
    for _ in range(iters):
        s = defaultdict(int)
        for u, v in edges:
            s[v] += (rank[u] * 85) // (100 * outdeg[u])
        rank = {n: base + s[n] for n in nodes}
    return rank


def _run(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r["node"]: r["rank"]
        for r in pagerank_fixed_point(df, iters=iters).collect()
    }


def test_matches_pure_python_on_hand_graph(spark):
    edges = [(1, 2), (2, 1), (1, 3), (3, 1), (2, 3), (4, 3)]
    for iters in (1, 2, 3, 5):
        assert _run(spark, edges, iters) == _py_pagerank(edges, iters)


def test_sink_node_accumulates_and_dangling_leaks(spark):
    # 1 and 2 both point at 3; 3 points nowhere (dangling)
    got = _run(spark, [(1, 3), (2, 3)], iters=2)
    assert got[3] > got[1] == got[2]
    # total mass is bounded: base*N <= sum <= scale*N
    assert 3 * (SCALE * 15 // 100) <= sum(got.values()) <= 3 * SCALE


def test_parallel_edges_are_weights(spark):
    single = _run(spark, [(1, 2), (1, 3)], iters=1)
    double = _run(spark, [(1, 2), (1, 2), (1, 3)], iters=1)
    # with a duplicated 1->2 edge, node 2 gets 2/3 of 1's outflow
    assert double[2] > single[2]
    assert double[2] == _py_pagerank([(1, 2), (1, 2), (1, 3)], 1)[2]


def test_deterministic_under_repartition(spark):
    edges = [((i * 7) % 40, (i * 13 + 3) % 40) for i in range(300)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted(map(tuple, pagerank_fixed_point(df, iters=3).collect()))
    b = sorted(
        map(tuple, pagerank_fixed_point(df.repartition(9), iters=3).collect())
    )
    assert a == b == sorted(_py_pagerank(edges, 3).items())


def test_no_single_partition_exchange(spark):
    edges = [((i * 3) % 20, (i * 11 + 1) % 20) for i in range(100)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src long, dst long")
    plan = (
        pagerank_fixed_point(df, iters=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan
    assert "Cartesian" not in plan


def test_twenty_iterations_bit_exact_and_bounded_plan(spark):
    # r6 verdict item 5: per-iteration lineage truncation must keep a
    # 20-iteration run compiling flat AND bit-exact vs the pure-Python
    # replica (the truncation is a plan choice, not a value change)
    edges = [((i * 7) % 25, (i * 13 + 3) % 25) for i in range(150)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _run(spark, edges, iters=20)
    assert got == _py_pagerank(edges, 20)
