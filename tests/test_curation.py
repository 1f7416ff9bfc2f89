"""Curation operators: connected components vs a Python union-find oracle,
deterministic hash sampling invariants, token-budget mixture greedy-prefix
properties."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from goprowl_spark.operators import curation as C


# ------------------------------------------------------------ python oracles

def py_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; component label = min node id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def py_h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ------------------------------------------------------- connected components

EDGES = [
    (1, 2), (2, 3),                    # chain → comp 1
    (10, 11), (11, 12), (12, 10),      # triangle → comp 10
    (20, 21),                          # pair → comp 20
    (3, 30), (30, 31),                 # extends comp 1 through a bridge
    (40, 41), (42, 41), (43, 40),      # star-ish → comp 40
]


def test_connected_components_match_union_find(spark):
    got = {
        r["node"]: r["comp"]
        for r in C.connected_components(
            spark.createDataFrame(EDGES, ["id_a", "id_b"])
        ).collect()
    }
    assert got == py_components(EDGES)


def test_dedup_clusters_full_mapping(spark):
    docs = spark.createDataFrame([(i,) for i in range(50)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 2), (2, 7), (40, 45)], ["id_a", "id_b"])
    rows = {r["doc_id"]: r for r in C.dedup_clusters(docs, pairs).collect()}
    assert len(rows) == 50
    oracle = py_components([(1, 2), (2, 7), (40, 45)])
    for d in range(50):
        want = oracle.get(d, d)
        assert rows[d]["canonical_id"] == want
        assert rows[d]["is_dup"] == (1 if want != d else 0)


# ----------------------------------------------------------------- sampling

def test_hash_sample_matches_python_hash(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], ["doc_id"])
    got = {r["doc_id"] for r in C.hash_sample(df, 300).collect()}
    want = {i for i in range(500) if py_h60(str(i)) % C.SAMPLE_BUCKETS < 300}
    assert got == want
    # deterministic: a second run selects the identical set
    assert {r["doc_id"] for r in C.hash_sample(df, 300).collect()} == want


def test_hash_sample_strata_overrides(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 3 == 0 else ("drop" if i % 3 == 1 else "mid"))
         for i in range(300)],
        ["doc_id", "source"],
    )
    got = C.hash_sample(
        df, 500, strata_col="source",
        strata_rates={"keep": C.SAMPLE_BUCKETS, "drop": 0},
    ).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert by_src.get("keep") == {i for i in range(300) if i % 3 == 0}
    assert "drop" not in by_src
    want_mid = {
        i for i in range(300)
        if i % 3 == 2 and py_h60(str(i)) % C.SAMPLE_BUCKETS < 500
    }
    assert by_src.get("mid", set()) == want_mid


# ------------------------------------------------------------- token budgets

def test_token_budget_mix_greedy_prefix(spark):
    docs = [
        (i, "word " * (5 + i % 7), f"src{i % 3}") for i in range(60)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
    budget = 40
    rows = C.token_budget_mix(df, budget).collect()
    # python twin: per source, h60-order, keep while cumsum <= budget
    by_src: dict[str, list[tuple[int, int]]] = {}
    for i, text, src in docs:
        by_src.setdefault(src, []).append((i, len(text.split())))
    want = {}
    for src, items in by_src.items():
        items.sort(key=lambda t: (py_h60(str(t[0])), t[0]))
        cum = 0
        for i, n in items:
            cum += n
            if cum > budget:
                break
            want[i] = (src, n, cum)
    got = {r["doc_id"]: (r["source"], r["ws_tokens"], r["cum_tokens"]) for r in rows}
    assert got == want
    assert all(c <= budget for (_, _, c) in got.values())


def test_connected_components_random_graphs(spark):
    """Random graphs (incl. a 24-node chain — worst diameter) vs union-find;
    pointer jumping must converge well inside max_iter."""
    import random

    rng = random.Random(7)
    graphs = [
        [(i, i + 1) for i in range(100, 124)],          # long chain
        [(rng.randrange(60), rng.randrange(60)) for _ in range(40)],
        [(i, (i * 7) % 30) for i in range(30)],
    ]
    for edges in graphs:
        edges = [(a, b) for a, b in edges if a != b]
        got = {
            r["node"]: r["comp"]
            for r in C.connected_components(
                spark.createDataFrame(edges, ["id_a", "id_b"]), max_iter=12
            ).collect()
        }
        assert got == py_components(edges), edges


# ------------------------------------------------------------ training shards

def test_training_shards_layout_invariants(spark):
    docs = [(i, "tok " * (3 + i % 5), f"src{i % 3}") for i in range(120)]
    df = spark.createDataFrame(docs, ["doc_id", "text", "source"])
    n_shards = 4
    rows = C.training_shards(df, n_shards).collect()
    # every doc appears exactly once
    assert sorted(r["doc_id"] for r in rows) == list(range(120))
    by_shard: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["shard"] < n_shards
        by_shard.setdefault(r["shard"], []).append(r)
    # positions are contiguous 1..n per shard
    for srows in by_shard.values():
        assert sorted(r["position"] for r in srows) == list(
            range(1, len(srows) + 1)
        )
    # within-shard order follows the independent 'o|' hash (then doc_id)
    for srows in by_shard.values():
        srows.sort(key=lambda r: r["position"])
        keys = [(py_h60(f"o|{r['doc_id']}"), r["doc_id"]) for r in srows]
        assert keys == sorted(keys)
    # shard assignment is the salted 's|' hash — the python twin agrees
    for r in rows:
        assert r["shard"] == py_h60(f"s|{r['doc_id']}") % n_shards
    # token counts are whitespace tokens
    want_toks = {i: len(t.split()) for i, t, _ in docs}
    assert {r["doc_id"]: r["ws_tokens"] for r in rows} == want_toks


def test_training_shards_deterministic_across_layouts(spark):
    """Same layout regardless of input partitioning — the resumability
    property a re-run export depends on."""
    docs = [(i, f"alpha beta {i}", "s") for i in range(80)]
    df1 = spark.createDataFrame(docs, ["doc_id", "text", "source"])
    df8 = df1.repartition(8)
    a = sorted(map(tuple, C.training_shards(df1, 5).collect()))
    b = sorted(map(tuple, C.training_shards(df8, 5).collect()))
    assert a == b
