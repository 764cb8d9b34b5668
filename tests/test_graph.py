"""Unit tests for operators/graph.py (the registry-level oracle parity of
supplier_customer_pagerank is covered by tests/test_oracle_parity.py)."""

from __future__ import annotations

import numpy as np
import pytest

from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.graph import pagerank


def _numpy_pagerank(edges, iterations=3, damping=0.85, symmetric=True):
    if symmetric:
        edges = edges + [(d, s, w) for s, d, w in edges]
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    W = np.zeros((n, n))
    for s, d, w in edges:
        W[idx[s], idx[d]] += w
    out = W.sum(axis=1, keepdims=True)
    frac = np.divide(W, out, out=np.zeros_like(W), where=out > 0)
    r = np.ones(n)
    for _ in range(iterations):
        r = (1 - damping) + damping * (frac.T @ r)
    return dict(zip(nodes, r))


@pytest.mark.parametrize("iterations", [1, 3])
def test_pagerank_matches_numpy_reference(spark, iterations):
    edges = [("a", "b", 1.0), ("a", "c", 2.0), ("b", "c", 1.0), ("d", "a", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {
        r.node: r.pagerank
        for r in pagerank(
            df, weight_col="w", iterations=iterations, symmetric=True
        ).collect()
    }
    want = _numpy_pagerank(edges, iterations=iterations)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_pagerank_isolated_direction_and_total_mass(spark):
    # directed line a->b->c: a is a source (teleport floor), c is a sink;
    # with damping d and unit start, total mass is conserved only for
    # stochastic graphs — here we just pin the closed-form first rounds
    edges = [("a", "b", 1.0), ("b", "c", 1.0)]
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {
        r.node: r.pagerank
        for r in pagerank(df, weight_col="w", iterations=2, symmetric=False).collect()
    }
    # r1: a=0.15, b=0.15+0.85*1=1.0, c=1.0 ; r2: a=0.15, b=0.15+0.85*0.15,
    # c=0.15+0.85*1.0
    assert got["a"] == pytest.approx(0.15)
    assert got["b"] == pytest.approx(0.15 + 0.85 * 0.15)
    assert got["c"] == pytest.approx(0.15 + 0.85 * 1.0)
