"""ONNG reconstruction passes vs oracle properties.

The reference has no tests for GraphReconstructor; we check structural
invariants (degree caps, reverse-edge presence, dedupe/sort) and that each
pass preserves or improves search recall.
"""

import numpy as np
import jax.numpy as jnp

import ngt_tpu
from ngt_tpu.graph.reconstruct import (
    adjust_paths,
    convert_to_anng,
    reconstruct_graph,
    refine_anng,
)
from ngt_tpu.graph.storage import GraphStore
from ngt_tpu.ops.bruteforce import recall_at_k


def _knng_store(x, k, e_max=32):
    n = len(x)
    d = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, :k].astype(np.int32)
    nd = np.take_along_axis(d, nn, axis=1).astype(np.float32)
    g = GraphStore(max_edges=e_max, capacity=n)
    g.set_nodes(np.arange(n), nn, nd)
    return g, d


def test_convert_to_anng_adds_reverse_edges(rng):
    x = rng.normal(size=(120, 8)).astype(np.float32)
    g, d = _knng_store(x, 4)
    out = convert_to_anng(g, len(x), e_max=64)
    # every original edge now exists in both directions
    for u in range(len(x)):
        for v in g.nbr_ids[u, : g.degree[u]]:
            row = out.nbr_ids[v, : out.degree[v]]
            assert u in row, f"missing reverse edge {v}->{u}"
    # rows sorted + deduped
    for u in range(len(x)):
        row = out.nbr_ids[u, : out.degree[u]]
        assert len(set(row.tolist())) == len(row)
        rd = out.nbr_dist[u, : out.degree[u]]
        assert (np.diff(rd) >= -1e-6).all()


def test_reconstruct_anng_from_anng(rng):
    """Thin-edges pseudo-ANNG (reference GraphReconstructor.h:717-801):
    per node keep the first e edges with target id < node id, mirrored,
    deduped, distance-sorted."""
    from ngt_tpu.graph.reconstruct import reconstruct_anng_from_anng

    x = rng.normal(size=(150, 8)).astype(np.float32)
    g, d = _knng_store(x, 8)
    e = 3
    out = reconstruct_anng_from_anng(g, len(x), e)
    # oracle: recompute expected undirected edge set
    want = set()
    for u in range(len(x)):
        cnt = 0
        for v in g.nbr_ids[u, : g.degree[u]]:
            if v < u:
                want.add((u, int(v)))
                cnt += 1
                if cnt >= e:
                    break
    got = set()
    for u in range(len(x)):
        row = out.nbr_ids[u, : out.degree[u]]
        # sorted ascending by distance, no dups
        dd = out.nbr_dist[u, : out.degree[u]]
        assert (np.diff(dd) >= -1e-7).all()
        assert len(set(row.tolist())) == len(row)
        for v in row:
            got.add((max(u, int(v)), min(u, int(v))))
    assert got == want


def test_reconstruct_graph_degrees(rng):
    x = rng.normal(size=(200, 12)).astype(np.float32)
    g, d = _knng_store(x, 12)
    out_e, in_e = 4, 8
    out = reconstruct_graph(g, len(x), out_e, in_e)
    # out-degree <= out_e + in-edges contributed by reverses
    deg = out.degree[: len(x)]
    assert deg.max() <= out.e_max
    # forward edges: each node keeps its out_e nearest original edges
    for u in range(0, 200, 17):
        orig = g.nbr_ids[u, :out_e]
        row = set(out.nbr_ids[u, : out.degree[u]].tolist())
        assert set(orig.tolist()) <= row


def test_adjust_paths_drops_shortcuts():
    # u=0, v=1, w=2: d(0,1)=1.0, d(1,2)=0.94, d(0,2)=1.7 — edge 0->2 is
    # dominated by 0->1->2, and both path legs are rank-0/1 edges so they
    # are already inserted when rank of 0->2 is processed (the reference
    # skips paths whose legs are not yet inserted at check time)
    x = np.array([[0, 0], [1.0, 0], [1.5, 0.8], [10, 10]], np.float32)
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    g = GraphStore(max_edges=8, capacity=4)
    ids = np.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]], np.int32)
    ds = np.take_along_axis(d, ids, axis=1).astype(np.float32)
    g.set_nodes(np.arange(4), ids, ds)
    out = adjust_paths(g, 4, min_edges=0)
    row0 = out.nbr_ids[0, : out.degree[0]].tolist()
    assert 1 in row0          # the short leg stays
    assert 2 not in row0      # the dominated long edge is gone
    assert 3 in row0          # non-dominated far edge stays


def test_adjust_paths_min_edges_guard():
    x = np.array([[0, 0], [1.0, 0], [1.4, 1.3], [10, 10]], np.float32)
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    g = GraphStore(max_edges=8, capacity=4)
    ids = np.array([[1, 2, 3], [0, 2, 3], [0, 1, 3], [0, 1, 2]], np.int32)
    ds = np.take_along_axis(d, ids, axis=1).astype(np.float32)
    g.set_nodes(np.arange(4), ids, ds)
    out = adjust_paths(g, 4, min_edges=3)
    assert (out.degree[:4] >= 3).all()  # nothing dropped below the floor


def test_onng_pipeline_recall(rng):
    """reconstruct + path-adjust keeps recall while cutting edges."""
    data = rng.normal(size=(1200, 16)).astype(np.float32)
    queries = rng.normal(size=(32, 16)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=16, edge_size_for_creation=16)
    idx.batch_insert(data, build=True)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    n = idx.store.repository_size

    onng = reconstruct_graph(idx.graph, n, out_edges=10, in_edges=24)
    onng = adjust_paths(onng, n, min_edges=10)
    before_edges = idx.graph.degree[:n].sum()
    after_edges = onng.degree[:n].sum()
    idx.graph = onng
    idx._mirror = None
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.15)
    rec = recall_at_k(ids, np.asarray(gt_ids), 10)
    assert rec >= 0.9, f"ONNG recall {rec}"
    assert after_edges <= before_edges * 1.5  # degree stayed bounded


def test_refine_anng_recovers_recall(rng):
    """refine_anng on a degraded graph restores recall
    (reference refineANNG, GraphReconstructor.h:803-924)."""
    data = rng.normal(size=(800, 12)).astype(np.float32)
    queries = rng.normal(size=(24, 12)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=12)
    idx.batch_insert(data, build=True)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    n = idx.store.repository_size
    # degrade: chop every row to its 2 nearest edges
    idx.graph.nbr_ids[:, 2:] = -1
    idx.graph.nbr_dist[:, 2:] = np.inf
    idx.graph.degree[:] = np.minimum(idx.graph.degree, 2)
    idx._mirror = None
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.1)
    degraded = recall_at_k(ids, np.asarray(gt_ids), 10)
    refine_anng(idx, epsilon=0.2)
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.1)
    refined = recall_at_k(ids, np.asarray(gt_ids), 10)
    assert refined >= degraded
    assert refined >= 0.9, f"refined recall {refined}"
    assert idx.verify() == []


def test_reconstruct_with_constraint(rng):
    """Indegree-balanced reconstruction (GraphReconstructor.h:565-715):
    native and python selections agree; the reversed-edge indegree cap
    holds; the graph stays searchable at good recall."""
    import ngt_tpu
    from ngt_tpu import native
    from ngt_tpu.graph import reconstruct as R
    from ngt_tpu.ops.bruteforce import recall_at_k

    data = rng.normal(size=(800, 12)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=12, edge_size_for_creation=16)
    idx.batch_insert(data, build=True)
    n = idx.store.repository_size
    g = idx.graph
    out_e, in_e = 8, 24

    rid, src, rd = native.constrained_reverse(
        g.nbr_ids[:n], g.nbr_dist[:n], g.degree[:n], out_e, in_e
    )
    # the in_edges cap holds on selected reversed edges
    assert np.bincount(src, minlength=n).max() <= in_e
    # python fallback agrees with the native path exactly
    if native.available():
        lib_backup = native._lib
        native._lib = None
        try:
            rid2, src2, rd2 = native.constrained_reverse(
                g.nbr_ids[:n], g.nbr_dist[:n], g.degree[:n], out_e, in_e
            )
        finally:
            native._lib = lib_backup
        np.testing.assert_array_equal(rid, rid2)
        np.testing.assert_array_equal(src, src2)

    onng = R.reconstruct_graph_with_constraint(g, n, out_e, in_e)
    idx.graph = onng
    idx.prop.max_edges = onng.e_max
    idx._mirror = None
    idx.optimize_seeds()
    assert idx.verify() == []
    queries = rng.normal(size=(32, 12)).astype(np.float32)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.15)
    rec = recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10)
    assert rec >= 0.85, f"constrained-ONNG recall {rec}"
    # indegree is balanced vs the unconstrained reconstruction
    stats = idx.statistics()
    assert stats["indegree"]["zero"] == 0


def test_adjust_paths_device_matches_native(rng, monkeypatch):
    """Device phase 2 + on-device normalize (the production path for large
    graphs) reproduces the host replay bit-for-bit under the shared R(C)
    snapshot rule, across multiple snapshot windows (e=12 > C=8) and with
    the min_edges floor engaged."""
    n, e = 300, 12
    x = rng.normal(size=(n, 8)).astype(np.float32)
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    ids = np.argsort(d, axis=1)[:, :e].astype(np.int32)
    ds = np.take_along_axis(d, ids, axis=1).astype(np.float32)

    def mk():
        g = GraphStore(max_edges=e, capacity=n)
        g.set_nodes(np.arange(n), ids, ds)
        return g

    monkeypatch.setenv("NGT_TPU_ADJUST_DEVICE_MIN", "0")
    out_dev = adjust_paths(mk(), n, min_edges=3)
    monkeypatch.setenv("NGT_TPU_ADJUST_DEVICE", "0")
    out_host = adjust_paths(mk(), n, min_edges=3, snap=8)
    assert np.array_equal(out_dev.degree[:n], out_host.degree[:n])
    assert np.array_equal(out_dev.nbr_ids[:n], out_host.nbr_ids[:n])
    np.testing.assert_allclose(
        out_dev.nbr_dist[:n], out_host.nbr_dist[:n], rtol=0, atol=0
    )
    assert (out_dev.degree[:n] >= 3).all()


def test_onng_pipeline_recall_device_rule(rng, monkeypatch):
    """The R(8) snapshot rule (device default) keeps ONNG recall — it may
    only drop edges whose 2-hop detour was present in the pre-window graph,
    so reachability is preserved by strict distance descent."""
    data = rng.normal(size=(1200, 16)).astype(np.float32)
    queries = rng.normal(size=(32, 16)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=16, edge_size_for_creation=16)
    idx.batch_insert(data, build=True)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    n = idx.store.repository_size
    monkeypatch.setenv("NGT_TPU_ADJUST_DEVICE_MIN", "0")
    onng = reconstruct_graph(idx.graph, n, out_edges=10, in_edges=24)
    onng = adjust_paths(onng, n, min_edges=10)
    idx.graph = onng
    idx._mirror = None
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.15)
    rec = recall_at_k(ids, np.asarray(gt_ids), 10)
    assert rec >= 0.9, f"ONNG device-rule recall {rec}"


def test_adjust_paths_native_matches_numpy(rng, monkeypatch):
    # native phase-2 (C rank replay) must reproduce the numpy rank loop
    # bit-for-bit on a non-trivial random graph
    from ngt_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native lib unavailable")
    n, e = 300, 12
    x = rng.normal(size=(n, 8)).astype(np.float32)
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    ids = np.argsort(d, axis=1)[:, :e].astype(np.int32)
    ds = np.take_along_axis(d, ids, axis=1).astype(np.float32)
    g = GraphStore(max_edges=e, capacity=n)
    g.set_nodes(np.arange(n), ids, ds)
    out_native = adjust_paths(g, n, min_edges=3)

    g2 = GraphStore(max_edges=e, capacity=n)
    g2.set_nodes(np.arange(n), ids, ds)
    monkeypatch.setattr(native, "adjust_paths_phase2",
                        lambda *a, **k: None)
    out_numpy = adjust_paths(g2, n, min_edges=3)
    assert np.array_equal(out_native.degree[:n], out_numpy.degree[:n])
    assert np.array_equal(out_native.nbr_ids[:n], out_numpy.nbr_ids[:n])


def test_normalize_rows_device_path_parity(rng, monkeypatch):
    """The device _normalize_rows path (big pair lists) must reproduce the
    host lexsort path bit-for-bit — including the ids-only download +
    symmetric host-side distance lookup used by the reconstruction family
    (dist_from), in both the native and numpy lookup implementations."""
    from ngt_tpu import native
    from ngt_tpu.graph import reconstruct as R

    n, e = 400, 14
    x = rng.normal(size=(n, 8)).astype(np.float32)
    d = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    ids = np.argsort(d, axis=1)[:, :e].astype(np.int32)
    ds = np.take_along_axis(d, ids, axis=1).astype(np.float32)

    def mk():
        g = GraphStore(max_edges=e, capacity=n)
        g.set_nodes(np.arange(n), ids, ds)
        return g

    host = reconstruct_graph(mk(), n, out_edges=6, in_edges=16)

    monkeypatch.setattr(R, "DEV_PAIRS_MIN", 1)
    dev = reconstruct_graph(mk(), n, out_edges=6, in_edges=16)
    assert np.array_equal(host.degree[:n], dev.degree[:n])
    assert np.array_equal(host.nbr_ids[:n], dev.nbr_ids[:n])
    np.testing.assert_array_equal(host.nbr_dist[:n], dev.nbr_dist[:n])
    assert np.isfinite(
        dev.nbr_dist[:n][dev.nbr_ids[:n] >= 0]
    ).all()  # every resolved edge found a source-graph distance

    if native.available():
        lib_backup = native._lib, native._tried
        native._lib, native._tried = None, True
        try:
            dev2 = reconstruct_graph(mk(), n, out_edges=6, in_edges=16)
        finally:
            native._lib, native._tried = lib_backup
        assert np.array_equal(dev.nbr_ids[:n], dev2.nbr_ids[:n])
        np.testing.assert_array_equal(dev.nbr_dist[:n], dev2.nbr_dist[:n])
