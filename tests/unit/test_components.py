"""connected_components / dedup_clusters (gpse/components.py) vs an exact
pure-Python union-find oracle, across topologies chosen to stress the
large-star/small-star rounds: long chains (diameter >> rounds), stars,
cycles, forests of random components, and isolated nodes."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from gpse.components import connected_components, dedup_clusters


def _uf_oracle(edges: list[tuple[int, int]], nodes: set[int]) -> dict[int, int]:
    parent = {n: n for n in nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component
    comp_min: dict[int, int] = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def _spark_cc(spark, edges, nodes=None):
    e = spark.createDataFrame(
        edges or [(0, 0)], "doc_a long, doc_b long"
    )
    if not edges:
        e = e.filter(F.lit(False))
    nd = (
        spark.createDataFrame([(n,) for n in nodes], "doc_id long")
        if nodes is not None
        else None
    )
    out = connected_components(e, nodes=nd)
    return {r.node: r.component for r in out.collect()}


TOPOLOGIES = [
    ("chain", [(i, i + 1) for i in range(200)]),
    ("reversed chain", [(i + 1, i) for i in range(150)]),
    ("star", [(500, i) for i in range(40)]),
    ("two cycles", [(i, (i + 1) % 30) for i in range(30)]
     + [(100 + i, 100 + (i + 1) % 17) for i in range(17)]),
    ("dup+self edges", [(1, 2), (2, 1), (1, 2), (3, 3), (2, 4)]),
]


@pytest.mark.parametrize("name,edges", TOPOLOGIES, ids=[t[0] for t in TOPOLOGIES])
def test_matches_union_find(spark, name, edges):
    nodes = {x for e in edges for x in e}
    got = _spark_cc(spark, edges)
    want = _uf_oracle(edges, nodes)
    # self-loop-only nodes vanish without an explicit node list
    want = {n: c for n, c in want.items()
            if any(a != b and n in (a, b) for a, b in edges)}
    assert got == want


def test_random_forests_match_union_find(spark):
    rng = random.Random(7)
    for _ in range(5):
        n = rng.randrange(30, 120)
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(10, 3 * n))
        ]
        nodes = set(range(n))  # includes isolated nodes
        got = _spark_cc(spark, edges, nodes=nodes)
        assert got == _uf_oracle(edges, nodes)


def test_empty_edges_all_singletons(spark):
    got = _spark_cc(spark, [], nodes={3, 9, 11})
    assert got == {3: 3, 9: 9, 11: 11}


def test_diameter_independence_chain_converges_in_few_rounds(spark):
    # A 300-node chain has diameter 299; min-label propagation would need
    # ~300 rounds. large-star/small-star must land well inside max_iter=15.
    edges = [(i, i + 1) for i in range(300)]
    e = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(e, max_iter=15)
    rows = out.collect()
    assert len(rows) == 301
    assert {r.component for r in rows} == {0}


def test_unconverged_raises(spark):
    e = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="no fixed point"):
        connected_components(e, max_iter=1)


def test_dedup_clusters_representatives(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame(
        [(0, 3), (3, 7), (5, 6)], "doc_a long, doc_b long"
    )
    rows = {r.doc_id: r for r in dedup_clusters(docs, pairs).collect()}
    assert {i: r.cluster_id for i, r in rows.items()} == {
        0: 0, 3: 0, 7: 0, 5: 5, 6: 5, 1: 1, 2: 2, 4: 4, 8: 8, 9: 9,
    }
    assert rows[0].keep and not rows[3].keep and not rows[7].keep
    assert rows[0].cluster_size == 3 and rows[5].cluster_size == 2
    assert rows[1].keep and rows[1].cluster_size == 1
    # filtering on keep yields exactly one survivor per cluster
    kept = [r for r in rows.values() if r.keep]
    assert sorted(r.doc_id for r in kept) == [0, 1, 2, 4, 5, 8, 9]


def test_no_cartesian_in_star_rounds(spark):
    from gpse.components import _large_star, _small_star

    e = spark.createDataFrame(
        [(1, 2), (2, 3)], "doc_a long, doc_b long"
    ).select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    for stage in (_large_star(e), _small_star(e)):
        plan = stage._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
