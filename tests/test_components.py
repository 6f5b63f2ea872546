"""Connected components (transitive dedup resolution) — SURVEY.md §5 model:
exactness vs a driver-side union-find on adversarial and random graphs,
plus the end-to-end dedup_components query wiring."""

import random

import pytest
from pyspark.sql import functions as F

from loc2vec_spark.operators.components import connected_components


def _uf(n_nodes, edges):
    """Reference union-find: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id canonical labels
    return {v: find(v) for v in range(n_nodes)}


def _run(spark, n_nodes, edges):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)],
                                  "doc_id BIGINT")
    if edges:
        e = spark.createDataFrame(edges, "a BIGINT, b BIGINT")
    else:
        e = spark.createDataFrame([], "a BIGINT, b BIGINT")
    log = []
    out = connected_components(e, nodes, log=log)
    got = {r["node"]: r["component"] for r in out.collect()}
    return got, log


def test_chain_resolves_transitively(spark):
    """The r1 one-hop failure mode: A~B~C must all land on A."""
    got, _ = _run(spark, 10, [(i, i + 1) for i in range(9)])
    assert got == {i: 0 for i in range(10)}


def test_chain_reversed_and_shuffled(spark):
    edges = [(i + 1, i) for i in range(9)]
    random.Random(3).shuffle(edges)
    got, _ = _run(spark, 12, edges)
    assert got == {**{i: 0 for i in range(10)}, 10: 10, 11: 11}


def test_isolated_nodes_self_canonical(spark):
    got, _ = _run(spark, 5, [])
    assert got == {i: i for i in range(5)}


def test_two_stars_merged_by_bridge(spark):
    # two hubs + a single bridge edge between leaf nodes
    edges = [(0, k) for k in range(1, 5)] + [(10, k) for k in range(11, 15)]
    edges.append((4, 14))
    got, _ = _run(spark, 15, edges)
    comp = {v for k, v in got.items() if k in (0, 4, 10, 14)}
    assert comp == {0}
    assert all(got[k] == 0 for k in [0, 1, 2, 3, 4, 10, 11, 12, 13, 14])


@pytest.mark.parametrize("seed,n,m", [(1, 60, 40), (2, 80, 120), (3, 50, 25)])
def test_random_graphs_match_union_find(spark, seed, n, m):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    got, log = _run(spark, n, edges)
    assert got == _uf(n, edges)
    assert log[0][0] == 0 and log[-1][0] <= 30  # convergence trace recorded


def test_output_one_row_per_node(spark):
    """Fixpoint must be a star forest: exactly one component per node."""
    rng = random.Random(9)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    nodes = spark.createDataFrame([(i,) for i in range(40)], "doc_id BIGINT")
    e = spark.createDataFrame(edges, "a BIGINT, b BIGINT")
    out = connected_components(e, nodes)
    assert out.count() == 40
    assert out.select("node").distinct().count() == 40
    # component label is always the minimum member id
    mins = out.groupBy("component").agg(F.min("node").alias("mn")).collect()
    assert all(r["component"] == r["mn"] for r in mins)


def test_dedup_components_query_wiring(spark):
    """End-to-end: the registered query equals union-find over the
    registered LSH pair query on the same documents table."""
    from loc2vec_spark import queries as qreg
    import tests.conftest as c
    pairs = qreg.run_spark(spark, c.TESTDATA, "dedup_minhash_lsh") \
                .select("doc_a", "doc_b").collect()
    docs = [r["doc_id"] for r in
            spark.read.parquet(f"{c.TESTDATA}/documents.parquet")
                 .select("doc_id").collect()]
    idx = {d: i for i, d in enumerate(sorted(docs))}
    uf = _uf(len(docs), [(idx[r["doc_a"]], idx[r["doc_b"]]) for r in pairs])
    rev = sorted(docs)
    expected = {d: rev[uf[idx[d]]] for d in docs}
    got = {r["node"]: r["component"] for r in
           qreg.run_spark(spark, c.TESTDATA, "dedup_components").collect()}
    assert got == expected
