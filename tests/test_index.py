"""End-to-end index tests: build -> search recall, persistence, mutation.

Mirrors the reference's de-facto integration tests: samples/* smoke flows
plus `ngt info -m v` structural verification (SURVEY.md §4).
"""

import os

import numpy as np
import pytest

import ngt_tpu
from ngt_tpu.ops.bruteforce import recall_at_k


def _build(data, **kw):
    idx = ngt_tpu.create(None, dimension=data.shape[1], **kw)
    idx.batch_insert(data, build=True)
    return idx


def test_anng_recall_random(rng):
    data = rng.normal(size=(2000, 24)).astype(np.float32)
    queries = rng.normal(size=(64, 24)).astype(np.float32)
    idx = _build(data)
    assert idx.verify() == []
    ids, dists = idx.batch_search(queries, size=10, epsilon=0.1)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    rec = recall_at_k(ids, np.asarray(gt_ids), 10)
    assert rec >= 0.90, f"ANNG recall@10 {rec}"


def test_anng_recall_sift5k(sift5k):
    data = sift5k[:2500]
    queries = data[::25] + np.float32(0.5)
    idx = _build(data)
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.1)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    rec = recall_at_k(ids, np.asarray(gt_ids), 10)
    assert rec >= 0.92, f"SIFT5k recall@10 {rec}"


def test_epsilon_increases_recall(rng):
    data = rng.normal(size=(1500, 16)).astype(np.float32)
    queries = rng.normal(size=(32, 16)).astype(np.float32)
    idx = _build(data)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    recalls = []
    for eps in (0.0, 0.1, 0.3):
        ids, _ = idx.batch_search(queries, size=10, epsilon=eps)
        recalls.append(recall_at_k(ids, np.asarray(gt_ids), 10))
    assert recalls[-1] >= recalls[0]
    assert recalls[-1] >= 0.9


def test_single_search_and_linear(rng):
    data = rng.normal(size=(500, 12)).astype(np.float32)
    idx = _build(data)
    q = data[123]
    res = idx.search(q, size=5, epsilon=0.2)
    assert res[0][0] == 123 and res[0][1] < 1e-4
    lin = idx.linear_search(q, size=5)
    assert lin[0][0] == 123
    ids_only = idx.search(q, size=5, with_distance=False)
    assert ids_only[0] == 123


def test_incremental_append(rng):
    """append -> build -> append -> build resumes (Index.cpp:648-651)."""
    data = rng.normal(size=(800, 16)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=16)
    idx.batch_insert(data[:500], build=True)
    idx.batch_insert(data[500:], build=True)
    assert len(idx) == 800
    assert idx.verify() == []
    q = data[650]
    res = idx.search(q, size=3, epsilon=0.2)
    assert res[0][0] == 650


def test_insert_then_build(rng):
    data = rng.normal(size=(300, 8)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=8)
    ids = [idx.insert(v) for v in data]
    assert ids == list(range(300))
    idx.build_index()
    assert idx.verify() == []
    res = idx.search(data[42], size=1)
    assert res[0][0] == 42


def test_remove_and_reuse(rng):
    data = rng.normal(size=(400, 8)).astype(np.float32)
    idx = _build(data)
    idx.remove(100)
    assert len(idx) == 399
    with pytest.raises(KeyError):
        idx.get_object(100)
    # removed object never comes back from searches
    ids, _ = idx.batch_search(data[100][None, :], size=5, epsilon=0.3)
    assert 100 not in ids[0].tolist()
    assert idx.verify() == []
    # slot reuse (Repository::removedList, Common.h:1747-1760)
    new_id = idx.insert(rng.normal(size=8).astype(np.float32))
    assert new_id == 100
    idx.build_index()
    assert idx.verify() == []


def test_batch_remove(rng):
    """batch_remove: one reverse scan + one repair pass for the whole set,
    same observable semantics as per-id remove (tombstones, no removed id in
    results, graph invariants hold, post-removal recall intact)."""
    data = rng.normal(size=(500, 16)).astype(np.float32)
    idx = _build(data)
    victims = rng.choice(np.arange(500), size=60, replace=False).tolist()
    idx.batch_remove(victims)
    assert len(idx) == 440
    for v in victims[:5]:
        with pytest.raises(KeyError):
            idx.get_object(v)
    assert idx.verify() == []
    # removed ids never come back; survivors stay findable
    gone = set(victims)
    live = np.array([i for i in range(500) if i not in gone])
    ids, _ = idx.batch_search(data[live[:64]], size=10, epsilon=0.2)
    found = np.asarray(ids)
    assert not np.isin(found[found >= 0], victims).any()
    hit = (found == live[:64][:, None]).any(axis=1)
    assert hit.mean() >= 0.95  # self-query still lands on itself
    # double removal raises, like the per-id path
    with pytest.raises(KeyError):
        idx.batch_remove(victims[:2])
    # slots are reusable afterwards
    nid = idx.insert(rng.normal(size=16).astype(np.float32))
    assert nid in gone
    idx.build_index()
    assert idx.verify() == []


def test_save_open_roundtrip(tmp_path, rng):
    data = rng.normal(size=(600, 16)).astype(np.float32)
    path = os.path.join(tmp_path, "idx")
    idx = ngt_tpu.create(path, dimension=16)
    idx.batch_insert(data, build=True)
    idx.save()
    reopened = ngt_tpu.open_index(path)
    assert len(reopened) == 600
    assert reopened.verify() == []
    q = data[77]
    a = idx.search(q, size=5, epsilon=0.2)
    b = reopened.search(q, size=5, epsilon=0.2)
    assert a[0][0] == b[0][0] == 77
    assert reopened.prop.distance_type == idx.prop.distance_type
    ngt_tpu.Index.destroy(path)
    assert not os.path.exists(path)


def test_prf_interop(tmp_path):
    """prf keys match the reference's property names (Index.h:105-190)."""
    path = os.path.join(tmp_path, "idx")
    idx = ngt_tpu.create(
        path, dimension=32, edge_size_for_creation=12, distance_type="Cosine"
    )
    text = open(os.path.join(path, "prf")).read()
    assert "Dimension\t32" in text
    assert "EdgeSizeForCreation\t12" in text
    assert "DistanceType\t4" in text  # Cosine = 4 (ObjectSpace.h:172)
    p = ngt_tpu.Property.load_dir(path)
    assert p.dimension == 32
    assert p.distance_type == ngt_tpu.DistanceType.COSINE


def test_cosine_metric_index(rng):
    data = rng.normal(size=(1000, 20)).astype(np.float32)
    queries = rng.normal(size=(16, 20)).astype(np.float32)
    idx = _build(data, distance_type="Cosine")
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.15)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    rec = recall_at_k(ids, np.asarray(gt_ids), 10)
    assert rec >= 0.9, f"cosine recall {rec}"


def test_uint8_hamming_index(rng):
    data = rng.integers(0, 256, size=(500, 16), dtype=np.uint8)
    idx = ngt_tpu.create(
        None, dimension=16, distance_type="Hamming", object_type="Byte"
    )
    idx.batch_insert(data, build=True)
    res = idx.search(data[33].astype(np.float32), size=3, epsilon=0.3)
    assert res[0][0] == 33 and res[0][1] == 0.0


def test_export_import(tmp_path, rng):
    import io

    data = rng.normal(size=(200, 8)).astype(np.float32)
    idx = _build(data)
    buf = io.StringIO()
    idx.export_index(buf)
    buf.seek(0)
    idx2 = ngt_tpu.Index.import_index(buf)
    assert len(idx2) == 200
    q = data[10]
    assert idx2.search(q, size=1)[0][0] == 10


def test_export_import_lossless(rng):
    """The text stream round-trips the GRAPH, not just vectors: identical
    adjacency, verify(), statistics() and search results (reference
    exportIndex/importIndex semantics, Index.h:703-727) — an ONNG must not
    silently degrade to a rebuilt ANNG on import."""
    import io
    from ngt_tpu.optimizer import GraphOptimizer

    data = rng.normal(size=(400, 12)).astype(np.float32)
    idx = _build(data)
    idx.remove(37)  # holes must round-trip too
    GraphOptimizer(out_edges=8, in_edges=24, tune_parameters=False).execute(idx)
    buf = io.StringIO()
    idx.export_index(buf)
    buf.seek(0)
    idx2 = ngt_tpu.Index.import_index(buf)
    n = idx.store.repository_size
    assert idx2.store.repository_size == n
    np.testing.assert_array_equal(
        idx.graph.nbr_ids[:n], idx2.graph.nbr_ids[:n]
    )
    np.testing.assert_allclose(
        idx.graph.nbr_dist[:n], idx2.graph.nbr_dist[:n], rtol=1e-6
    )
    np.testing.assert_array_equal(idx.graph.degree[:n], idx2.graph.degree[:n])
    assert idx2.verify() == idx.verify() == []
    assert idx2.statistics() == idx.statistics()
    assert idx2.prop.graph_type == idx.prop.graph_type
    q = rng.normal(size=(16, 12)).astype(np.float32)
    ids1, d1 = idx.batch_search(q, size=10, epsilon=0.1)
    ids2, d2 = idx2.batch_search(q, size=10, epsilon=0.1)
    np.testing.assert_array_equal(np.asarray(ids1), np.asarray(ids2))
    with pytest.raises(KeyError):
        idx2.get_object(37)


def test_knng_build_exact(rng):
    """KNNG graph type: every node's edges are its exact k nearest
    (insertKNNGNode; Graph.h:577-609), no reverse edges."""
    from ngt_tpu.properties import GraphType

    data = rng.normal(size=(400, 12)).astype(np.float32)
    idx = ngt_tpu.create(
        None, dimension=12, edge_size_for_creation=5,
        graph_type=GraphType.KNNG,
    )
    idx.batch_insert(data, build=True)
    d = np.linalg.norm(data[:, None, :] - data[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    want = np.sort(d, axis=1)[:, :5]
    n = idx.store.repository_size
    for oid in range(1, n, 37):
        ids, dists = idx.graph.get_node(oid)
        np.testing.assert_allclose(
            dists[:5], want[oid - 1], rtol=1e-4, atol=1e-4
        )


def test_bknng_build_has_reverse_edges(rng):
    from ngt_tpu.properties import GraphType

    data = rng.normal(size=(300, 8)).astype(np.float32)
    idx = ngt_tpu.create(
        None, dimension=8, edge_size_for_creation=4,
        graph_type=GraphType.BKNNG,
    )
    idx.batch_insert(data, build=True)
    # for a sample of nodes, each forward edge has a reverse counterpart
    n = idx.store.repository_size
    checked = 0
    for oid in range(1, n, 29):
        ids, _ = idx.graph.get_node(oid)
        for t in ids[:4]:
            tids, _ = idx.graph.get_node(int(t))
            if oid in tids:
                checked += 1
    assert checked > 0


def test_ianng_build_and_recall(rng):
    from ngt_tpu.properties import GraphType
    from ngt_tpu.ops.bruteforce import recall_at_k

    data = rng.normal(size=(800, 16)).astype(np.float32)
    queries = rng.normal(size=(24, 16)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=16, graph_type=GraphType.IANNG)
    idx.batch_insert(data, build=True)
    assert idx.verify() == []
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.2)
    assert recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10) >= 0.85


def test_sq8_build_mode(rng):
    """Opt-in sq8 insertion search matches the exact build's recall."""
    data = rng.normal(size=(1500, 16)).astype(np.float32)
    queries = rng.normal(size=(32, 16)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=16, build_mode="sq8")
    idx.batch_insert(data, build=True)
    assert idx.verify() == []
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.1)
    assert recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10) >= 0.88


def test_truncation_threshold(rng):
    """truncation_threshold caps reverse-edge growth (the role of
    truncateEdgesOptimally, Graph.cpp:947-1131)."""
    data = rng.normal(size=(600, 8)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=8, truncation_threshold=12)
    idx.batch_insert(data, build=True)
    n = idx.store.repository_size
    deg = idx.graph.degree[:n][idx.graph._has_node[:n]]
    assert deg.max() <= 12
    assert idx.verify() == []
    res = idx.search(data[50], size=3, epsilon=0.2)
    assert res[0][0] == 50


def test_bulk_build_connects_components(rng):
    """Disconnected clone clusters must be linked by the connectivity pass
    (ensure_connected): queries seeded far from a cluster still reach it."""
    from ngt_tpu import native

    # 40 tight clusters of 25 clones each — exact-KNN edges stay in-cluster
    centers = rng.normal(size=(40, 16)).astype(np.float32) * 50
    data = np.repeat(centers, 25, axis=0) + rng.normal(
        size=(1000, 16)
    ).astype(np.float32) * 0.01
    idx = ngt_tpu.create(None, dimension=16, edge_size_for_creation=8)
    idx.batch_insert(data, build=True)
    n = idx.store.repository_size
    labels, comps = native.connected_components(
        idx.graph.nbr_ids[:n], idx.graph._has_node[:n]
    )
    assert comps == 1, f"{comps} components after bulk build"


def test_connected_components_native_vs_numpy(rng):
    from ngt_tpu import native
    from ngt_tpu.graph.storage import GraphStore

    g = GraphStore(max_edges=4, capacity=32)
    # two chains: 0-1-2-3 and 10-11-12
    g.set_nodes(np.array([0, 1, 2, 3]),
                np.array([[1], [2], [3], [2]], np.int32),
                np.ones((4, 1), np.float32))
    g.set_nodes(np.array([10, 11, 12]),
                np.array([[11], [12], [10]], np.int32),
                np.ones((3, 1), np.float32))
    labels, comps = native.connected_components(
        g.nbr_ids[:16], g._has_node[:16]
    )
    assert comps == 2
    assert labels[0] == labels[3] and labels[10] == labels[12]
    assert labels[0] != labels[10]
    assert labels[5] == -1  # non-node


def test_memory_mapped_open(tmp_path, rng):
    """memory_mapped=True opens the index over copy-on-write memmaps: same
    results, local mutations stay process-private (the reference's
    multi-process shared read, README.md:85 / PersistentRepository)."""
    data = rng.normal(size=(300, 8)).astype(np.float32)
    idx = _build(data)
    p = str(tmp_path / "mmidx")
    idx.save(p)
    q = rng.normal(size=(8, 8)).astype(np.float32)
    want, wantd = idx.batch_search(q, size=5, epsilon=0.1)

    ro = ngt_tpu.open_index(p, memory_mapped=True)
    assert isinstance(ro.store._x, np.memmap)
    got, gotd = ro.batch_search(q, size=5, epsilon=0.1)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    # a second reader shares the same files
    ro2 = ngt_tpu.open_index(p, memory_mapped=True)
    got2, _ = ro2.batch_search(q, size=5, epsilon=0.1)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got2))
    # local mutation works (COW) and does NOT leak into the files
    ro.remove(7)
    assert not ro.store.contains(ro._int(7))
    ro3 = ngt_tpu.open_index(p, memory_mapped=True)
    assert ro3.store.contains(ro3._int(7))
    # growth past the mapped capacity falls back to private arrays
    nid = ro.insert(np.zeros(8, np.float32))
    ro.build_index()
    assert ro.search(np.zeros(8, np.float32), size=1)[0][0] == nid


def test_deferred_adjacency_materializes_consistently(rng):
    """Bulk build leaves the adjacency device-resident (defer_rows); search
    works pre-materialization, and the lazily-materialized host copy equals
    the device mirror (incl. connectivity bridges merged device-side)."""
    centers = rng.normal(size=(20, 16)).astype(np.float32) * 50
    data = np.repeat(centers, 40, axis=0) + rng.normal(
        size=(800, 16)
    ).astype(np.float32) * 0.01
    idx = ngt_tpu.create(None, dimension=16, edge_size_for_creation=8)
    idx.batch_insert(data, build=True)
    assert idx.graph._deferred is not None, "bulk build should defer"
    mirror_nbr = np.asarray(idx._mirror.nbr)
    q = data[::37] + np.float32(0.001)
    ids, _ = idx.batch_search(q, size=5, epsilon=0.1)
    assert idx.graph._deferred is not None, "search must not materialize"
    # host access materializes; rows must match the device mirror
    host_nbr = idx.graph.nbr_ids
    assert idx.graph._deferred is None
    n = idx.store.repository_size
    np.testing.assert_array_equal(host_nbr[:n], mirror_nbr[:n])
    assert (idx.graph.degree[:n] == (host_nbr[:n] >= 0).sum(axis=1)).all()
    # rows stay distance-sorted after the deferred bridge merges
    # (inf padding replaced by a finite sentinel: inf-inf diffs are nan)
    d = np.where(np.isfinite(idx.graph.nbr_dist[:n]),
                 idx.graph.nbr_dist[:n], np.float32(3.4e38))
    assert (np.diff(d, axis=1) >= 0).all()
    assert idx.verify() == []


def test_merge_edge_rows_matches_add_edges(rng):
    """The extracted numpy merge (used by the deferred bridge path) must be
    bit-identical to GraphStore.add_edges on the same inputs."""
    from ngt_tpu.graph.storage import GraphStore, merge_edge_rows

    g1 = GraphStore(max_edges=6, capacity=64)
    base_ids = rng.integers(0, 50, size=(20, 4)).astype(np.int32)
    base_d = np.sort(rng.random((20, 4)).astype(np.float32), axis=1)
    rows = np.arange(20)
    g1.set_nodes(rows, base_ids, base_d)
    targets = rng.integers(0, 20, size=40).astype(np.int64)
    srcs = rng.integers(0, 50, size=40).astype(np.int32)
    dists = rng.random(40).astype(np.float32)

    order = np.argsort(targets, kind="stable")
    t_s, s_s, d_s = targets[order], srcs[order], dists[order]
    uniq = np.unique(t_s)
    new_i, new_d, new_deg = merge_edge_rows(
        uniq, g1.nbr_ids[uniq].copy(), g1.nbr_dist[uniq].copy(),
        t_s, s_s, d_s, g1.e_max,
    )
    g1.add_edges(targets, srcs, dists)
    np.testing.assert_array_equal(g1.nbr_ids[uniq], new_i)
    np.testing.assert_array_equal(g1.nbr_dist[uniq], new_d)
    np.testing.assert_array_equal(g1.degree[uniq], new_deg)


def test_batch_insert_dedup(rng):
    """Range-gated dedup insert (reference createIndex(objects, ids, range),
    Index.cpp:1303-1352): within-radius rows are not inserted and report the
    surviving object; chains resolve against INSERTED objects only."""
    data = rng.normal(size=(200, 16)).astype(np.float32) * 10
    idx = _build(data)
    n0 = len(idx.store)

    # batch: one exact dup of a stored row, one fresh, one intra-batch dup
    fresh = rng.normal(size=(16,)).astype(np.float32) * 10 + 500
    batch = np.stack([data[7], fresh, fresh + 0.001, data[100] + 300])
    ids, ident, dist = idx.batch_insert_dedup(batch, radius=0.1)
    assert ident.tolist() == [True, False, True, False]
    assert ids[0] == 7  # external id of data[7] (0-based)
    assert ids[2] == ids[1], "intra-batch dup maps to surviving row"
    assert dist[0] <= 0.1 and dist[2] <= 0.1
    assert len(idx.store) == n0 + 2
    # deduped rows must NOT be searchable as separate objects
    got, _ = idx.batch_search(fresh[None], size=1, epsilon=0.1)
    assert got[0, 0] == ids[1]


def test_batch_insert_dedup_chain(rng):
    """A->A' (dup), A''->A' only: A' was never inserted, so A'' must insert
    (the reference compares only against objects with real ids)."""
    idx = ngt_tpu.create(None, dimension=8)
    a = np.zeros(8, np.float32)
    a1 = a.copy(); a1[0] = 0.9          # |a1-a| = 0.9 <= 1.0 -> dup of a
    a2 = a.copy(); a2[0] = 1.8          # |a2-a1|=0.9 but a1 not inserted;
    #                                     |a2-a| = 1.8 > 1.0 -> inserted
    ids, ident, _ = idx.batch_insert_dedup(np.stack([a, a1, a2]), radius=1.0)
    assert ident.tolist() == [False, True, False]
    assert ids[1] == ids[0]
    assert len(idx.store) == 2


def test_auto_bulk_append_routing(rng):
    """Appends of >= bulk_append_threshold objects route through the bulk
    scan-and-merge (23x the incremental rate at equal recall, measured);
    small appends keep the incremental resume path."""
    data = rng.normal(size=(3000, 16)).astype(np.float32) * 10
    idx = ngt_tpu.create(None, dimension=16)
    idx.prop.bulk_append_threshold = 1024
    idx.batch_insert(data[:1200], build=True)
    called = {}
    import ngt_tpu.graph.build as B

    real_bulk, real_anng = B.build_bulk, B.build_anng

    def spy_bulk(*a, **k):
        called["bulk"] = called.get("bulk", 0) + 1
        return real_bulk(*a, **k)

    def spy_anng(*a, **k):
        called["anng"] = called.get("anng", 0) + 1
        return real_anng(*a, **k)

    import ngt_tpu.index as I

    I.build_anng = spy_anng
    B.build_bulk = spy_bulk
    B.build_anng = spy_anng
    try:
        idx.batch_insert(data[1200:1300], build=True)   # small -> incremental
        idx.batch_insert(data[1300:3000], build=True)   # 1700 -> bulk
    finally:
        B.build_bulk, B.build_anng = real_bulk, real_anng
        I.build_anng = real_anng
    assert called.get("anng", 0) >= 1
    assert called.get("bulk", 0) >= 1
    assert idx.graph.node_count() == 3000
    assert idx.verify() == []
    q = data[777]
    got = idx.search(q, size=3, epsilon=0.1)
    assert got[0][0] == 777


def test_bulk_append_cross_chunk_reverse_edges(rng, monkeypatch):
    """A chunked bulk append must keep reverse edges whose TARGET sits in a
    later chunk: node rows are applied for every chunk first, then reverse
    edges merge.  (A per-chunk interleave wiped chunk A's reverse edges
    into chunk B's nodes when B's own row write landed later, leaving the
    appended graph less connected than a fresh build of the same data.)
    Invariant checked: for every directed edge u->v where v's row still
    has free slots, the reverse v->u exists (add_edges only drops a
    reverse edge from a FULL row of strictly nearer edges)."""
    monkeypatch.setenv("NGT_TPU_BULK_QBLOCK", "256")
    data = rng.normal(size=(1100, 12)).astype(np.float32) * 5
    idx = ngt_tpu.create(None, dimension=12, edge_size_for_creation=8)
    idx.prop.bulk_append_threshold = 256
    idx.batch_insert(data[:300], build=True)   # fresh bulk build
    idx.batch_insert(data[300:], build=True)   # 800 rows -> 4 chunks
    assert idx.graph.node_count() == 1100
    g = idx.graph
    n = idx.store.repository_size
    missing = checked = 0
    for u in range(1, n):
        if not g._has_node[u]:
            continue
        row_u = g.nbr_ids[u]
        for v in row_u[row_u >= 0]:
            row_v = g.nbr_ids[int(v)]
            if (row_v >= 0).all():
                continue  # full rows may legitimately evict the reverse
            checked += 1
            missing += int(u not in row_v)
    assert checked > 0
    assert missing == 0, f"{missing}/{checked} reverse edges lost"
    assert idx.verify() == []


def test_truncation_relink_incremental(rng):
    """Incremental truncation mirrors truncateEdgesOptimally
    (Graph.cpp:947-1103): over-threshold rows are capped, the reverse
    direction of dropped edges is erased, and cut-off targets are re-linked
    to their nearest surviving node — so every node stays reachable."""
    data = rng.normal(size=(900, 8)).astype(np.float32)
    idx = ngt_tpu.create(
        None, dimension=8, truncation_threshold=10, edge_size_for_creation=8,
        bulk_append_threshold=10_000,  # force the incremental path
    )
    idx.batch_insert(data[:300], build=True)   # fresh -> bulk
    idx.batch_insert(data[300:], build=True)   # appends -> incremental
    assert idx.verify() == []
    n = idx.store.repository_size
    deg = idx.graph.degree[:n][idx.graph._has_node[:n]]
    # relink can push a row one past the cap transiently, but growth must
    # stay bounded near the threshold rather than at e_max
    assert deg.max() <= idx.graph.e_max
    assert np.median(deg) <= 11
    assert deg.min() >= 1  # no node got orphaned by truncation
    # searchability: every object still findable as its own nearest
    q = data[::30]
    ids, _ = idx.batch_search(q, size=1, epsilon=0.1)
    found = (np.asarray(ids)[:, 0] == np.arange(0, 900, 30)).mean()
    assert found >= 0.9


def test_check_graph_rederives_edges(rng):
    """check_graph (reference checkGraph, Index.h:886-938): the fresh
    bulk-built graph stores exact k-NN prefixes, so sampled overlap with
    the re-derived exact neighbor list is high; corrupting a row is
    detected as divergence."""
    data = rng.normal(size=(1500, 24)).astype(np.float32)
    idx = _build(data)
    rep = idx.check_graph(sample=256, seed=3)
    assert rep["checked"] == 256
    # rows hold the exact top-k PLUS reverse-edge insertions; reverse edges
    # need not rank in the exact top-(degree), so healthy overlap sits well
    # below 1.0 but far above a corrupted row's
    assert rep["mean_overlap"] >= 0.7, rep
    assert rep["min_overlap"] >= 0.4, rep
    # corrupt one sampled node's edges -> divergence grows
    victim = 7
    nbr = idx.graph.nbr_ids
    d = int(idx.graph.degree[victim])
    assert d >= 4
    # point every edge at the node's FARTHEST rows (membership change is
    # what check_graph detects; rank shuffles keep the same edge set)
    far = np.argsort(((data - data[victim - 1]) ** 2).sum(1))[-d:]
    nbr[victim, :d] = far + 1
    rep2 = idx.check_graph(sample=1500, seed=3)
    assert rep2["min_overlap"] <= 0.25, rep2
    assert rep2["divergent"] >= 1


def test_narrow_mirror_integral_corpus(rng, monkeypatch):
    """Integral (SIFT-like) corpora keep the device mirror in uint8 — 4x
    less HBM and hop-gather bandwidth — with BIT-IDENTICAL results (every
    distance entry point casts to f32 before arithmetic).  Non-integral
    inserts widen the mirror; NGT_TPU_MIRROR_NARROW=0 opts out."""
    data = np.rint(
        np.clip(rng.normal(size=(2000, 32)) * 20 + 100, 0, 255)
    ).astype(np.float32)
    q = data[rng.choice(2000, 32)] + rng.normal(size=(32, 32)).astype(
        np.float32
    )
    idx = _build(data, search_mode="exact")
    assert str(idx._ensure_mirror().x.dtype) == "uint8"
    i1, d1 = idx.batch_search(q, size=10, epsilon=0.05)

    monkeypatch.setenv("NGT_TPU_MIRROR_NARROW", "0")
    idx2 = _build(data, search_mode="exact")
    assert str(idx2._ensure_mirror().x.dtype) == "float32"
    i2, d2 = idx2.batch_search(q, size=10, epsilon=0.05)
    monkeypatch.delenv("NGT_TPU_MIRROR_NARROW")
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)

    # integral appends stay narrow; half-integral data narrows to f16;
    # data only f32 can hold widens all the way
    idx.batch_insert(data[:64] + np.float32(1.0), build=True)
    assert str(idx._mirror.x.dtype) == "uint8"
    idx.batch_insert(data[:8] + np.float32(0.5), build=True)
    assert str(idx._mirror.x.dtype) in ("float16", "float32")
    idx.batch_insert(data[:8] + np.float32(1.0 / 3.0), build=True)
    assert str(idx._mirror.x.dtype) == "float32"
    r = idx.search(data[42], size=5)
    assert r[0][0] == 43 or r[0][1] < 1e-6  # row 42 (1-based id 43) found


def test_qg_ivfpq_crossover(rng, monkeypatch):
    """Past the capacity where even floor-width sq8 blocks exceed the HBM
    budget, auto routing must fall through to a WORKING path: the IVFPQ
    mirror (search_fallback default), not the silent exact downgrade.
    Forced here by shrinking NGT_TPU_QG_MAX_GB below any block size."""
    data = rng.normal(size=(3000, 24)).astype(np.float32) * 10
    queries = data[rng.choice(3000, 48, replace=False)] + rng.normal(
        size=(48, 24)
    ).astype(np.float32)
    idx = _build(data)
    idx.prop.search_qg_threshold = 1000   # keep the corpus small
    monkeypatch.setenv("NGT_TPU_QG_MAX_GB", "0.0000001")
    # a 6k corpus puts 32/256 default probes at only 12% coverage; widen so
    # the assertion tests the ROUTING, not small-corpus IVFPQ tuning
    monkeypatch.setenv("NGT_TPU_AUTO_IVFPQ_NPROBE", "96")
    monkeypatch.setenv("NGT_TPU_AUTO_IVFPQ_EXP", "30")
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    ids, dists = idx.batch_search(queries, size=10)
    assert idx._qg is None          # blocks were never attempted
    assert getattr(idx, "_ivfpq_mirror", None) is not None
    rec = recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10)
    assert rec >= 0.9, f"crossover recall {rec}"
    # distances are exact (refine mode re-ranks with the true metric)
    row0 = data[np.asarray(ids)[0, 0]]
    want = np.linalg.norm(row0 - queries[0])
    np.testing.assert_allclose(np.asarray(dists)[0, 0], want, rtol=1e-4)
    # the mirror tracks store mutations
    key0 = idx._ivfpq_key
    idx.batch_insert(data[:4] + np.float32(1000.0), build=True)
    idx.batch_search(queries[:4], size=5)
    assert idx._ivfpq_key != key0
    # opting out serves the exact path instead
    idx.prop.search_fallback = "exact"
    idx._ivfpq_mirror = None
    ids2, _ = idx.batch_search(queries, size=10)
    assert idx._ivfpq_mirror is None
    rec2 = recall_at_k(np.asarray(ids2), np.asarray(gt_ids), 10)
    assert rec2 >= 0.9
