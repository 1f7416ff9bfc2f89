"""PageRank power iteration vs a dense numpy twin (dangling redistribution,
uniform start, fixed iterations)."""

from __future__ import annotations

import numpy as np

from goprowl_spark.operators import graph


def np_pagerank(n: int, edges: list[tuple[int, int]], iters: int, d: float):
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[s] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[t] += pr[s] / outdeg[s]
        dangling = pr[outdeg == 0].sum()
        pr = (1 - d) / n + d * (contrib + dangling / n)
    return pr


def test_pagerank_matches_numpy(spark):
    n = 40
    edges = [(i, (i * 3 + 1) % n) for i in range(n) if i % 5 != 0] + [
        (i, (i * 7 + 2) % n) for i in range(0, n, 2) if i % 5 != 0
    ]
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["pr"]
        for r in graph.pagerank(nodes, e, iters=4, damping=0.85).collect()
    }
    want = np_pagerank(n, edges, iters=4, d=0.85)
    assert len(got) == n
    for i in range(n):
        assert abs(got[i] - want[i]) < 1e-12, i
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def np_hits(n: int, edges: list[tuple[int, int]], iters: int):
    hub = np.ones(n)
    auth = np.ones(n)
    for _ in range(iters):
        a = np.zeros(n)
        for s, t in edges:
            a[t] += hub[s]
        z = np.sqrt((a * a).sum()) or 1.0
        auth = a / z
        h = np.zeros(n)
        for s, t in edges:
            h[s] += auth[t]
        z = np.sqrt((h * h).sum()) or 1.0
        hub = h / z
    return hub, auth


def test_hits_matches_numpy(spark):
    n = 30
    edges = [(i, (i * 3 + 1) % n) for i in range(n) if i % 4 != 0] + [
        (i, (i * 11 + 5) % n) for i in range(0, n, 3)
    ]
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: (r["hub"], r["auth"])
        for r in graph.hits(nodes, e, iters=3).collect()
    }
    hub, auth = np_hits(n, edges, iters=3)
    for i in range(n):
        assert abs(got[i][0] - hub[i]) < 1e-10, ("hub", i)
        assert abs(got[i][1] - auth[i]) < 1e-10, ("auth", i)


def test_anchor_stats_matches_python_twin(spark):
    """anchor_stats vs a direct Python aggregation over the same edges —
    including duplicate (src,target) edges and shared anchors."""
    import hashlib

    from goprowl_spark.operators.graph import anchor_stats

    edges = [
        ("a", "x", "click here"),
        ("a", "x", "click here"),   # duplicate edge counts twice
        ("b", "x", "the x page"),
        ("c", "y", "click here"),
        ("b", "y", "y!"),
        ("b", "y", "y again"),
        ("c", "y", None),           # null anchor: hashes as 'c|', not 'c'
    ]
    df = spark.createDataFrame(edges, "src string, target string, anchor string")

    def h60(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = {}
    for t in {e[1] for e in edges}:
        es = [e for e in edges if e[1] == t]
        want[t] = (
            len(es),
            len({e[0] for e in es}),
            len({e[2] for e in es if e[2] is not None}),
            sum(h60(f"{e[0]}|{e[2] or ''}") % 1000003 for e in es),
        )
    got = {
        r["target"]: (
            r["in_degree"], r["n_sources"], r["n_anchors"], r["anchor_checksum"]
        )
        for r in anchor_stats(df).collect()
    }
    assert got == want
