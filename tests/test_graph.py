"""Fixed-point PageRank: DataFrame result vs a plain-Python replay of
the exact integer recurrence, on a hand-built graph."""

from __future__ import annotations

from konohadataplatform_spark.operators.graph import pagerank_fixed_point


def _python_pagerank(edges, iterations=3, scale=10**12):
    edges = sorted(set(edges))
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    n = len(nodes)
    tele = (3 * scale) // (20 * n)
    r = {v: scale // n for v in nodes}
    for _ in range(iterations):
        s = {v: 0 for v in nodes}
        for u, v in edges:
            s[v] += r[u] // outdeg[u]
        r = {v: tele + (17 * s[v]) // 20 for v in nodes}
    return r, outdeg


def test_pagerank_matches_python_replay(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("e", "c"),
        ("a", "b"),  # duplicate edge: must dedupe to unweighted
    ]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {
        r.node: (r.rank_scaled, r.out_degree)
        for r in pagerank_fixed_point(df, iterations=3).collect()
    }
    want_r, outdeg = _python_pagerank(edges)
    assert got == {
        v: (want_r[v], outdeg.get(v, 0)) for v in want_r
    }
    # the hub everything points at must outrank a pure source; a node
    # with no in-edges holds exactly the teleport floor
    assert got["c"][0] > got["e"][0]
    n, scale = 5, 10**12
    assert got["e"][0] == (3 * scale) // (20 * n)


def test_pagerank_empty_graph(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank_fixed_point(df).count() == 0
