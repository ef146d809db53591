"""Optimizer layer: accuracy tables, ε exploration, ONNG pipeline driver."""

import numpy as np
import pytest

import ngt_tpu
from ngt_tpu import optimizer as O
from ngt_tpu.ops.bruteforce import recall_at_k
from ngt_tpu.properties import GraphType


@pytest.fixture(scope="module")
def built_index():
    rng = np.random.default_rng(11)
    data = rng.normal(size=(1500, 16)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=16)
    idx.batch_insert(data, build=True)
    return idx, data


def test_accuracy_table_roundtrip():
    t = O.AccuracyTable([(0.0, 0.5), (0.1, 0.8), (0.3, 0.95)])
    s = t.to_string()
    t2 = O.AccuracyTable.from_string(s)
    assert t2.pairs == t.pairs
    # interpolation
    assert abs(t2.get_epsilon(0.8) - 0.1) < 1e-9
    assert 0.0 < t2.get_epsilon(0.65) < 0.1
    assert t2.get_epsilon(0.3) == 0.0  # below range -> smallest eps
    assert t2.get_epsilon(0.99) > 0.3  # above range -> extrapolates


def test_evaluate_monotone(built_index, rng):
    idx, data = built_index
    queries = rng.normal(size=(64, 16)).astype(np.float32)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    pts = O.evaluate(idx, queries, np.asarray(gt_ids), epsilons=(0.0, 0.3))
    assert pts[1].recall >= pts[0].recall
    assert pts[1].mean_distance_count > pts[0].mean_distance_count


def test_explore_epsilon(built_index, rng):
    idx, data = built_index
    queries = rng.normal(size=(48, 16)).astype(np.float32)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    eps = O.explore_epsilon(idx, queries, np.asarray(gt_ids), 0.95)
    ids, _ = idx.batch_search(queries, size=10, epsilon=eps)
    assert recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10) >= 0.95


def test_accuracy_table_and_expected_accuracy(built_index):
    idx, data = built_index
    table = O.generate_accuracy_table(idx, k=10, n_queries=64)
    assert idx.prop.accuracy_table == table.to_string()
    assert len(table.pairs) >= 5
    # expected_accuracy search knob resolves through the table
    q = data[321]
    res = idx.search(q, size=5, expected_accuracy=0.9)
    assert res[0][0] == 321


def test_extract_queries(built_index):
    idx, _ = built_index
    q = O.extract_queries(idx, 32)
    assert q.shape == (32, 16)
    assert np.isfinite(q).all()


def test_graph_optimizer_pipeline(rng):
    data = rng.normal(size=(1000, 12)).astype(np.float32)
    queries = rng.normal(size=(32, 12)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=12, edge_size_for_creation=16)
    idx.batch_insert(data, build=True)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)

    opt = O.GraphOptimizer(out_edges=8, in_edges=24, tune_parameters=True)
    opt.execute(idx)
    assert idx.prop.graph_type == GraphType.ONNG
    assert idx.prop.accuracy_table  # table was generated
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.15)
    rec = recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10)
    assert rec >= 0.9, f"post-ONNG recall {rec}"


def test_optimize_number_of_edges(rng):
    data = rng.normal(size=(2000, 12)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=12)
    idx.batch_insert(data, build=True)
    out = O.optimize_number_of_edges(
        idx, target_accuracy=0.9, start_size=800, num_queries=32,
    )
    assert len(out["sizes"]) >= 2
    assert out["recommended_edge_size_for_creation"] >= 5
    assert out["target_size"] == 2000
    # the estimate is validated by one REAL rebuild at the recommendation
    # (not just the optimistic edge-size-masked sweep)
    assert out["validated_accuracy"] is not None
    assert out["validated_accuracy"] >= 0.9


def test_dynamic_edge_size_formula(built_index):
    """edge_size=-2 resolves to base + 10^(ε·rate), clamped to e_max
    (reference Graph.h:683-686)."""
    idx, _ = built_index
    idx.prop.dynamic_edge_size_base = 30
    idx.prop.dynamic_edge_size_rate = 20
    assert idx._resolve_edge_size(-2, 0.0) == min(31, idx.graph.e_max)
    # ε=0.1, rate=20 -> 30 + 10^2 = 130 (the reference's default op point)
    assert idx._resolve_edge_size(-2, 0.1) == min(130, idx.graph.e_max)
    idx.prop.dynamic_edge_size_rate = 10
    assert idx._resolve_edge_size(-2, 0.1) == min(40, idx.graph.e_max)
    # 0 = unlimited (Graph.h:679-680), -1 = property default
    assert idx._resolve_edge_size(0, 0.1) == idx.graph.e_max
    assert idx._resolve_edge_size(-1, 0.1) == min(
        idx.prop.edge_size_for_search, idx.graph.e_max
    )
    with pytest.raises(ValueError):
        idx._resolve_edge_size(-3, 0.1)
    # searchable end-to-end with the dynamic size
    _, d = idx.batch_search(
        np.zeros((1, 16), np.float32), size=5, epsilon=0.1, edge_size=-2
    )
    assert np.isfinite(d).all()


def test_adjust_search_edge_size(rng):
    """Coordinate descent converges and persists tuned base/rate."""
    data = rng.normal(size=(800, 12)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=12)
    idx.batch_insert(data, build=True)
    q = rng.normal(size=(32, 12)).astype(np.float32)
    base, rate = O.adjust_search_edge_size(
        idx, queries=q, k=10, eps_grid=(0.05, 0.2),
        base_accuracy_range=(0.3, 0.6), rate_accuracy_range=(0.6, 0.9),
    )
    assert base >= 4 and rate >= 2
    assert idx.prop.dynamic_edge_size_base == base
    assert idx.prop.dynamic_edge_size_rate == rate
    ids, _ = idx.batch_search(q, size=10, epsilon=0.1, edge_size=-2)
    assert (np.asarray(ids) >= 0).any()


def test_statistics(built_index):
    idx, _ = built_index
    st = idx.statistics()
    assert st["nodes"] == 1500
    assert st["edges"] > 0
    assert st["outdegree"]["max"] <= idx.graph.e_max
    assert st["indegree"]["mean"] > 0
    assert st["edge_length"]["mean"] > 0


def test_build_time_limit(rng):
    """The budget controller degrades epsilon instead of blowing the wall
    clock (BuildTimeController analogue)."""
    data = rng.normal(size=(3000, 16)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=16)
    idx.prop.build_time_limit = 1e-9  # force immediate degradation
    idx.batch_insert(data, build=True)
    assert idx.verify() == []
    # graph still searchable
    res = idx.search(data[5], size=3, epsilon=0.2)
    assert res[0][0] == 5
