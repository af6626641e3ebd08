"""PageRank: conservation, dangling handling, parity with a NumPy oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_pipelines_spark.operators.linkgraph import pagerank


def _numpy_pagerank(edge_list, iters, d=0.85):
    nodes = sorted({x for e in edge_list for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for s, _ in set(edge_list):
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(r[idx[v]] for v in nodes if out[v] == 0)
        nxt += d * dangling / n
        for s, t in set(edge_list):
            nxt[idx[t]] += d * r[idx[s]] / out[s]
        r = nxt
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture()
def edge_list():
    # a hub (0), a cycle, a dangling sink (9), duplicate edges
    return [
        (0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 4), (4, 5), (5, 3),
        (3, 9), (7, 9), (8, 7), (0, 1),
    ]


def test_pagerank_matches_reference_and_conserves_mass(spark, edge_list):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: r["rank"] for r in pagerank(e, iters=4).collect()}
    want = _numpy_pagerank(edge_list, iters=4)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_hub_outranks_leaves(spark, edge_list):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.node: r["rank"] for r in pagerank(e, iters=5).collect()}
    assert got[0] > got[8]  # hub with two in-cycles beats an isolated chain
    assert got[9] > got[8]  # the sink accumulates from two sources


def test_deterministic_and_validates(spark, edge_list):
    e = spark.createDataFrame(edge_list, "src long, dst long")
    a = sorted((r.node, r["rank"]) for r in pagerank(e, iters=3).collect())
    b = sorted((r.node, r["rank"]) for r in pagerank(e, iters=3).collect())
    assert a == b
    with pytest.raises(ValueError):
        pagerank(e, iters=0)
