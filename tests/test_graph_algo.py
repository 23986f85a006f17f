"""Connected components vs a pure-Python union-find reference."""

import random


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    return {x: find(x) for x in parent}


def test_components_match_union_find(spark):
    from graphdbetl_spark.operators.graph import connected_components

    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(50)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df).collect()}

    exp = _uf_components(edges)
    # same grouping with min-id labels
    assert set(got) == set(exp)
    for node, comp in exp.items():
        assert got[node] == comp


def test_star_variant_matches_union_find(spark):
    from graphdbetl_spark.operators.graph import connected_components_star

    rng = random.Random(11)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(70)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.component for r in connected_components_star(df).collect()}
    exp = _uf_components(edges)
    assert set(got) == set(exp)
    for node, comp in exp.items():
        assert got[node] == comp


def test_star_variant_long_chain_logarithmic_rounds(spark):
    from graphdbetl_spark.operators.graph import connected_components_star

    # diameter-100 chain: label propagation needs ~100 rounds; the
    # star variant's pointer jumping converges within max_iter=12
    chain = [(i, i + 1) for i in range(100)]
    df = spark.createDataFrame(chain, "src long, dst long")
    got = {r.id: r.component for r in connected_components_star(df, max_iter=12).collect()}
    assert set(got.values()) == {0}


def test_chain_collapses_to_one_component(spark):
    from graphdbetl_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(30)]  # diameter 30 > default rounds? no: 20 iters of doubling-free propagation
    df = spark.createDataFrame(chain, "src long, dst long")
    got = {r.id: r.component for r in connected_components(df, max_iter=40).collect()}
    assert set(got.values()) == {0}
