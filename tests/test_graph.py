"""PageRank (operators/graph.py): known-graph values, dangling mass,
rank conservation, and edge de-duplication."""

from __future__ import annotations

import pytest

from conversation_with_vector_db_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src: string, dst: string")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def _reference(edges, iters=3, d=0.85):
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    out = {}
    for s, t in set(edges):
        out.setdefault(s, set()).add(t)
    r = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dm = sum(r[v] for v in nodes if v not in out)
        nxt = {v: (1 - d) / n + d * dm / n for v in nodes}
        for s, ts in out.items():
            for t in ts:
                nxt[t] += d * r[s] / len(ts)
        r = nxt
    return {v: round(x, 6) for v, x in r.items()}


def test_matches_python_reference_with_dangling(spark):
    # c is dangling (no out-edges); a has fan-out 2.
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "a")]
    got = _ranks(spark, edges)
    want = _reference(edges)
    assert got == want
    # c (two in-links, one from a hub) outranks b.
    assert got["c"] > got["b"]


def test_rank_mass_conserved(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")]
    got = _ranks(spark, edges, iters=4)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_duplicate_edges_do_not_weight(spark):
    base = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")]
    got1 = _ranks(spark, base)
    got2 = _ranks(spark, base + [("a", "b")] * 10)
    assert got1 == got2


def test_symmetric_pair_is_uniform(spark):
    got = _ranks(spark, [("a", "b"), ("b", "a")])
    assert got == {"a": 0.5, "b": 0.5}


def test_empty_graph_raises(spark):
    df = spark.createDataFrame([], "src: string, dst: string")
    with pytest.raises(ValueError, match="empty graph"):
        pagerank(df)


def test_label_propagation_two_cliques_with_bridge(spark):
    from conversation_with_vector_db_spark.operators.graph import (
        label_propagation,
    )

    # Two triangles bridged by one edge: LPA keeps them as two
    # communities (the bridge is outvoted) where connected
    # components would merge them.
    tri1 = [("a", "b"), ("b", "c"), ("c", "a")]
    tri2 = [("x", "y"), ("y", "z"), ("z", "x")]
    bridge = [("c", "x")]
    edges = []
    for s, t in tri1 + tri2 + bridge:
        edges += [(s, t), (t, s)]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    got = {
        r["node"]: r["lbl"]
        for r in label_propagation(df, iters=3).collect()
    }
    assert got["a"] == got["b"] == got["c"]
    assert got["x"] == got["y"] == got["z"]
    assert got["a"] != got["x"]


def test_label_propagation_tie_break_is_min_label(spark):
    from conversation_with_vector_db_spark.operators.graph import (
        label_propagation,
    )

    # b's neighbors a and c tie at one vote each after round 1 of a
    # path graph; the smaller label must win deterministically.
    df = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "b"), ("b", "c")],
        "src: string, dst: string",
    )
    got = {
        r["node"]: r["lbl"]
        for r in label_propagation(df, iters=1).collect()
    }
    assert got["b"] == "a"
