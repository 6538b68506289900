"""Fixed-point PageRank: exact agreement with a Python integer
reference, dangling-node semantics, and partitioning-independence —
the properties that make the iterative computation oracle-checkable."""

from __future__ import annotations

from ehr_data_pipeline_spark.operators.graph import (
    PAGERANK_SCALE,
    pagerank_fixed_point,
)


def _py_pagerank(edges: list[tuple], n_iters: int, scale: int = PAGERANK_SCALE):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    outdeg: dict = {}
    for s, _ in e:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (scale - scale * 17 // 20) // n
    r = {v: scale // n for v in nodes}
    for _ in range(n_iters):
        mass = {v: 0 for v in nodes}
        for s, d in e:
            mass[d] += r[s] // outdeg[s]
        r = {v: base + mass[v] * 17 // 20 for v in nodes}
    return r


def _spark_ranks(spark, edges, n_iters=3):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        row["node"]: row["rank"]
        for row in pagerank_fixed_point(df, n_iters=n_iters).collect()
    }


def test_pagerank_matches_python_reference_exactly(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("d", "a"), ("e", "e"),
    ]
    for iters in (1, 3, 5):
        assert _spark_ranks(spark, edges, iters) == _py_pagerank(edges, iters)


def test_pagerank_dangling_node_settles_at_base(spark):
    # z has an in-edge source but no out-edges: its mass decays rather
    # than redistributing, and a node nobody links to keeps base rank
    edges = [("a", "z"), ("a", "b"), ("b", "a")]
    got = _spark_ranks(spark, edges, 3)
    assert got == _py_pagerank(edges, 3)
    base = (PAGERANK_SCALE - PAGERANK_SCALE * 17 // 20) // 3
    # after z's initial mass decays, nothing flows back out of z
    assert got["z"] >= base


def test_pagerank_is_partitioning_independent(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(60)]
    df1 = spark.createDataFrame(edges, "src string, dst string").repartition(1)
    df16 = spark.createDataFrame(edges, "src string, dst string").repartition(16)
    r1 = {r["node"]: r["rank"] for r in pagerank_fixed_point(df1).collect()}
    r16 = {r["node"]: r["rank"] for r in pagerank_fixed_point(df16).collect()}
    assert r1 == r16  # integer sums commute; IEEE sums would not


def test_pagerank_hub_outranks_leaves(spark):
    # star graph: everyone links to the hub
    edges = [(f"leaf{i}", "hub") for i in range(10)]
    got = _spark_ranks(spark, edges, 3)
    assert got["hub"] > max(v for k, v in got.items() if k != "hub")
