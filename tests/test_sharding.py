"""Multi-device index tests on the 8-device virtual CPU mesh."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ngt_tpu.parallel.sharding import (
    ShardedGraphIndex,
    ShardedQG,
    build_local_knng_shards,
    make_mesh,
    make_sharded_build_step,
    shard_host_index,
)
from ngt_tpu.properties import DistanceType


def _toy(n, dim, e, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, dim)).astype(np.float32)
    d = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    nbr = np.argsort(d, axis=1)[:, :e].astype(np.int32)
    nbr_d = np.sqrt(np.take_along_axis(d, nbr, axis=1)).astype(np.float32)
    return x, nbr, nbr_d, np.ones(n, bool)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_search_recall():
    p = 8
    n, dim, e, k = 512, 32, 12, 10
    x, nbr, nbr_d, valid = _toy(n, dim, e)
    x_s, _, _, val_s, n_local = shard_host_index(x, nbr, valid, p, nbr_d)
    # each shard builds its own local graph (vald-agent layout)
    nbr_s, nbrd_s = build_local_knng_shards(x_s, val_s, e, DistanceType.L2)
    mesh = make_mesh(p)
    sidx = ShardedGraphIndex(
        mesh, x_s, nbr_s, val_s,
        seed_ids_local=np.arange(8, dtype=np.int32),
        metric=DistanceType.L2,
        nbr_dist_shards=nbrd_s,
    )
    rng = np.random.default_rng(3)
    q = rng.normal(size=(16, dim)).astype(np.float32)
    ids, dists = sidx.search(jnp.asarray(q), k=k, epsilon=0.2, width=32)
    ids = np.asarray(ids)
    dists = np.asarray(dists)

    # ground truth: global brute force; global ids here are shard*n_local+slot
    owner = np.arange(n) % p
    slot = np.arange(n) // p
    gid_of = owner * n_local + slot
    full = np.linalg.norm(q[:, None, :] - x[None, :, :], axis=-1)
    gt = gid_of[np.argsort(full, axis=1)[:, :k]]
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt)
    )
    rec = hits / (len(q) * k)
    # each shard's subgraph is tiny (64 nodes, seeded with 8 of them) —
    # cross-shard merge must still recover most of the global top-k
    assert rec >= 0.9, f"sharded recall {rec}"
    assert (np.diff(dists, axis=1) >= -1e-5).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_build_step_executes():
    p = 8
    n, dim, e, k, b = 64 * p, 32, 8, 4, 8
    x, nbr, nbr_d, valid = _toy(n, dim, e)
    x_s, nbr_s, nbrd_s, val_s, n_local = shard_host_index(
        x, nbr, valid, p, nbr_d
    )
    mesh = make_mesh(p)
    sidx = ShardedGraphIndex(
        mesh, x_s, nbr_s, val_s,
        seed_ids_local=np.arange(4, dtype=np.int32),
        metric=DistanceType.L2,
        nbr_dist_shards=nbrd_s,
    )
    step = make_sharded_build_step(mesh, DistanceType.L2, k, n_local, width=16)
    rng = np.random.default_rng(4)
    newx = jnp.asarray(rng.normal(size=(b, x_s.shape[2])).astype(np.float32))
    new_gids = jnp.asarray(
        np.array(
            [s * n_local + (n_local - 1 - i // p) for i, s in
             enumerate(np.arange(b) % p)],
            dtype=np.int32,
        )
    )
    out = step(sidx.x, sidx.nbr, sidx.nbr_dist, sidx.valid, newx, new_gids,
               sidx.seed_ids_local)
    nn = np.asarray(out.new_neighbor_ids)
    assert nn.shape == (b, k)
    assert (nn >= -1).all() and (nn < p * n_local).all()
    # the inserted rows are now valid on their owning shards
    v = np.asarray(out.valid)
    assert v[np.asarray(new_gids)].all()
    # invariants after the step: every row stays distance-sorted with -1/inf
    # at the tail (the sorted bounded insert must not corrupt rows)
    nbr_after = np.asarray(out.nbr)
    nbrd_after = np.asarray(out.nbr_dist)
    dd = np.where(np.isfinite(nbrd_after), nbrd_after, np.float32(3e38))
    assert (np.diff(dd, axis=1) >= -1e-5).all(), "rows lost sortedness"
    assert ((nbr_after >= 0) == np.isfinite(nbrd_after)).all()
    # reverse edges landed: some owned target row now contains a new node
    # (check one shard's rows for any new local slot)
    # and repeated steps keep the invariants
    newx2 = jnp.asarray(rng.normal(size=(b, x_s.shape[2])).astype(np.float32))
    new_gids2 = jnp.asarray(
        np.array(
            [s * n_local + (n_local - 2 - i // p) for i, s in
             enumerate(np.arange(b) % p)],
            dtype=np.int32,
        )
    )
    out2 = step(out.x, out.nbr, out.nbr_dist, out.valid, newx2, new_gids2,
                sidx.seed_ids_local)
    dd2 = np.asarray(out2.nbr_dist)
    dd2 = np.where(np.isfinite(dd2), dd2, np.float32(3e38))
    assert (np.diff(dd2, axis=1) >= -1e-5).all()
    # no duplicate edges within any row (ignoring -1 padding)
    nbr2 = np.asarray(out2.nbr)
    for row in nbr2[: 3 * n_local // p]:
        live = row[row >= 0]
        assert len(live) == len(set(live.tolist())), "duplicate edge in row"
    # slot-0 ownership: a batch whose gids land on LOCAL SLOT 0 of every
    # shard must not collide with the non-owned rows' writes (mode="drop"
    # routes those out of bounds; the old clamp-to-0 raced this exact
    # case and could nondeterministically lose the insert)
    newx3 = jnp.asarray(rng.normal(size=(p, x_s.shape[2])).astype(np.float32))
    new_gids3 = jnp.asarray(
        np.arange(p, dtype=np.int32) * n_local
    )
    out3 = step(out2.x, out2.nbr, out2.nbr_dist, out2.valid, newx3,
                new_gids3, sidx.seed_ids_local)
    v3 = np.asarray(out3.valid)
    assert v3[np.asarray(new_gids3)].all(), "slot-0 insert lost"
    np.testing.assert_allclose(
        np.asarray(out3.x)[np.asarray(new_gids3)], np.asarray(newx3),
        rtol=1e-6,
    )


def test_merge_reverse_edges_semantics():
    """Pure-function check of the sorted bounded insert (addEdge semantics,
    reference Graph.h:845-934): sorted insert, duplicate skip, drop-farthest
    on full rows, deterministic under colliding targets."""
    from ngt_tpu.parallel.sharding import _merge_reverse_edges

    e = 4
    nbr = jnp.asarray(np.array([
        [1, 2, -1, -1],
        [0, 3, 5, 7],      # full after adding one more
        [-1, -1, -1, -1],
    ], np.int32))
    nbr_d = jnp.asarray(np.array([
        [1.0, 2.0, np.inf, np.inf],
        [1.0, 2.0, 3.0, 4.0],
        [np.inf] * 4,
    ], np.float32))
    # proposals: (tgt, src, d):
    #  row0 <- 9 @1.5 (sorted middle), row0 <- 2 @0.5 (dup: skipped)
    #  row1 <- 9 @2.5 (full row: farthest edge 7@4.0 drops)
    #  row2 <- 4 @1.0 and row2 <- 6 @0.5 (same target twice in one batch)
    tgt = jnp.asarray(np.array([0, 0, 1, 2, 2], np.int32))
    src = jnp.asarray(np.array([9, 2, 9, 4, 6], np.int32))
    d = jnp.asarray(np.array([1.5, 0.5, 2.5, 1.0, 0.5], np.float32))
    ok = jnp.ones((5,), bool)
    out_i, out_d = jax.jit(_merge_reverse_edges)(nbr, nbr_d, tgt, src, d, ok)
    out_i, out_d = np.asarray(out_i), np.asarray(out_d)
    np.testing.assert_array_equal(out_i[0], [1, 9, 2, -1])
    np.testing.assert_allclose(out_d[0][:3], [1.0, 1.5, 2.0])
    np.testing.assert_array_equal(out_i[1], [0, 3, 9, 5])
    np.testing.assert_allclose(out_d[1], [1.0, 2.0, 2.5, 3.0])
    np.testing.assert_array_equal(out_i[2], [6, 4, -1, -1])
    np.testing.assert_allclose(out_d[2][:2], [0.5, 1.0])


def test_graft_entry_single_chip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    ids, dists = jax.jit(fn)(*args)
    assert ids.shape[1] == 10


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_entry_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_index_end_to_end():
    """High-level ShardedIndex: per-shard ANNG build + fan-out search."""
    from ngt_tpu.parallel.sharding import ShardedIndex
    from ngt_tpu.properties import DistanceType

    rng = np.random.default_rng(13)
    data = rng.normal(size=(1600, 24)).astype(np.float32)
    queries = rng.normal(size=(16, 24)).astype(np.float32)

    mesh = make_mesh(8)
    sidx = ShardedIndex.build(data, mesh=mesh, metric=DistanceType.L2)
    ids, dists = sidx.batch_search(queries, size=10, epsilon=0.2)

    full = np.linalg.norm(queries[:, None, :] - data[None, :, :], axis=-1)
    gt = np.argsort(full, axis=1)[:, :10]
    hits = sum(
        len(set(a.tolist()) & set(b.tolist())) for a, b in zip(ids, gt)
    )
    rec = hits / (len(queries) * 10)
    assert rec >= 0.9, f"distributed recall {rec}"
    # distances correspond to the returned (original) ids
    np.testing.assert_allclose(
        dists[0, 0], full[0, ids[0, 0]], rtol=1e-4
    )
    # self-query: nearest is the object itself
    ids2, _ = sidx.batch_search(data[:4], size=1, epsilon=0.2)
    assert (ids2[:, 0] == np.arange(4)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_qg_parity_and_recall():
    """ShardedQG: the SPMD sq8 block search must return EXACTLY what the
    same per-shard single-device traversal + exact re-rank + host top-k
    merge returns (this pins the shard_map plumbing: local-id blocks,
    global-id mapping, all_gather merge), and recall must track the exact
    sharded path."""
    from ngt_tpu.graph.search import graph_search
    from ngt_tpu.parallel.sharding import AXIS, ShardedIndex
    from ngt_tpu.quant.qgraph import _rerank_body

    rng = np.random.default_rng(21)
    data = rng.normal(size=(1600, 24)).astype(np.float32)
    queries = rng.normal(size=(16, 24)).astype(np.float32)
    mesh = make_mesh(8)
    sidx = ShardedIndex.build(data, mesh=mesh, metric=DistanceType.L2)
    qg = ShardedQG.from_sharded_index(sidx)

    from ngt_tpu.ops.bruteforce import pad_dim

    d_pad = pad_dim(queries.shape[1])
    qq = np.zeros((len(queries), d_pad), np.float32)
    qq[:, : queries.shape[1]] = queries
    k, k_exp, eps, width = 10, 30, 0.1, 64
    ids, dists = qg.search(
        jnp.asarray(qq), k=k, epsilon=eps, result_expansion=3.0, width=width
    )
    ids, dists = np.asarray(ids), np.asarray(dists)

    # host reference: same per-shard inputs, single-device kernel, host merge
    p, nl = 8, qg.n_local
    blocks = np.asarray(qg.blocks).reshape(p, nl, -1)
    nbr = np.asarray(qg.nbr).reshape(p, nl, -1)
    valid = np.asarray(qg.valid).reshape(p, nl)
    codes = np.asarray(qg.codes).reshape(p, nl, -1)
    xs = np.asarray(qg.x).reshape(p, nl, -1)
    seeds = np.asarray(qg.seed_ids_local)
    ref_i = []
    ref_d = []
    for s in range(p):
        seed_b = np.broadcast_to(seeds[s][None, :], (len(qq), seeds.shape[1]))
        res = graph_search(
            jnp.asarray(blocks[s]), jnp.asarray(nbr[s]),
            jnp.asarray(valid[s]), jnp.asarray(qq / qg.sq_scale),
            jnp.asarray(seed_b), metric=DistanceType.L2, k=k_exp,
            k_radius=k, epsilon=eps, width=width,
            hash_bits=max(int(np.ceil(np.log2(nl))), 10), exact_hash=True,
            block_mode=True, seed_x=jnp.asarray(codes[s]),
        )
        i1, d1 = _rerank_body(
            jnp.asarray(xs[s]), jnp.asarray(qq), res.ids, res.ids >= 0,
            DistanceType.L2, k,
        )
        i1 = np.asarray(i1)
        ref_i.append(np.where(i1 >= 0, i1 + s * nl, -1))
        ref_d.append(np.asarray(d1))
    all_i = np.concatenate(ref_i, axis=1)
    all_d = np.concatenate(ref_d, axis=1)
    order = np.argsort(all_d, axis=1, kind="stable")[:, :k]
    want_i = np.take_along_axis(all_i, order, axis=1)
    want_d = np.take_along_axis(all_d, order, axis=1)
    np.testing.assert_allclose(dists, want_d, rtol=1e-5)
    same = (ids == want_i) | ~np.isfinite(want_d)
    assert same.mean() > 0.99  # ties may reorder ids at equal distance

    # recall vs brute force through the id map
    ext = np.where(ids >= 0, sidx.id_map[np.clip(ids, 0, None)], -1)
    full = np.linalg.norm(queries[:, None, :] - data[None, :, :], axis=-1)
    gt = np.argsort(full, axis=1)[:, :k]
    hits = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(ext, gt))
    assert hits / (len(queries) * k) >= 0.9


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_index_save_open(tmp_path):
    from ngt_tpu.parallel.sharding import ShardedIndex

    rng = np.random.default_rng(17)
    data = rng.normal(size=(800, 16)).astype(np.float32)
    queries = rng.normal(size=(8, 16)).astype(np.float32)
    mesh = make_mesh(8)
    sidx = ShardedIndex.build(data, mesh=mesh, metric=DistanceType.L2)
    ids, dists = sidx.batch_search(queries, size=5, epsilon=0.15)
    path = str(tmp_path / "sharded_idx")
    sidx.save(path)
    re = ShardedIndex.open(path)
    ids2, dists2 = re.batch_search(queries, size=5, epsilon=0.15)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(dists, dists2, rtol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_index_distributed_layout_roundtrip(tmp_path):
    """save_distributed writes one file per shard + meta; open_distributed
    reloads per-process (here one process owning all 8 shards) and must
    return bit-identical search results to the monolithic layout."""
    from ngt_tpu.parallel.sharding import ShardedIndex

    rng = np.random.default_rng(23)
    data = rng.normal(size=(800, 16)).astype(np.float32)
    queries = rng.normal(size=(8, 16)).astype(np.float32)
    mesh = make_mesh(8)
    sidx = ShardedIndex.build(data, mesh=mesh, metric=DistanceType.L2)
    ids, dists = sidx.batch_search(queries, size=5, epsilon=0.15)
    path = str(tmp_path / "dist_idx")
    sidx.save_distributed(path)
    assert len([f for f in os.listdir(path) if f.startswith("shard_")]) == 8
    re = ShardedIndex.open_distributed(path)
    ids2, dists2 = re.batch_search(queries, size=5, epsilon=0.15)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(dists, dists2, rtol=1e-6)


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_recall_parity_with_single_device():
    """Mesh-sharded search reaches >= single-device recall at equal ε (the
    merged cross-shard candidate list compensates per-shard subgraph loss).
    Scale chosen to keep the CPU-mesh suite fast; the same layout is what
    the 1M TPU deployment uses."""
    import ngt_tpu
    from ngt_tpu.parallel.sharding import ShardedIndex
    from ngt_tpu.ops.bruteforce import recall_at_k

    rng = np.random.default_rng(23)
    n, dim, k, eps = 20_000, 32, 10, 0.1
    centers = rng.normal(size=(64, dim)).astype(np.float32) * 3
    data = (
        centers[rng.integers(0, 64, size=n)]
        + rng.normal(size=(n, dim)).astype(np.float32)
    )
    queries = (
        centers[rng.integers(0, 64, size=64)]
        + rng.normal(size=(64, dim)).astype(np.float32)
    )

    single = ngt_tpu.create(None, dimension=dim)
    single.batch_insert(data, build=True)
    gt_ids, _ = single.batch_linear_search(queries, size=k)
    s_ids, _ = single.batch_search(queries, size=k, epsilon=eps)
    rec_single = recall_at_k(np.asarray(s_ids), np.asarray(gt_ids), k)

    mesh = make_mesh(8)
    sidx = ShardedIndex.build(data, mesh=mesh, metric=DistanceType.L2)
    m_ids, _ = sidx.batch_search(queries, size=k, epsilon=eps)
    rec_mesh = recall_at_k(np.asarray(m_ids), np.asarray(gt_ids), k)
    assert rec_mesh >= min(rec_single, 0.98) - 0.02, (
        f"sharded recall {rec_mesh} vs single-device {rec_single}"
    )


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_recall_100k():
    """100k-scale 8-device fan-out: sharded search must hold >= 0.95
    recall@10 against exact GT at moderate epsilon (the operating point the
    1M single-chip deployment uses)."""
    import ngt_tpu
    from ngt_tpu.parallel.sharding import ShardedIndex
    from ngt_tpu.ops.bruteforce import recall_at_k

    n = 100_000
    dim, k = 32, 10
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(256, dim)).astype(np.float32) * 4
    data = (
        centers[rng.integers(0, 256, size=n)]
        + rng.normal(size=(n, dim)).astype(np.float32)
    )
    queries = (
        centers[rng.integers(0, 256, size=128)]
        + rng.normal(size=(128, dim)).astype(np.float32)
    )
    mesh = make_mesh(8)
    sidx = ShardedIndex.build(data, mesh=mesh, metric=DistanceType.L2)

    gt = ngt_tpu.create(None, dimension=dim)
    gt.batch_insert(data, build=False)
    gt_ids, _ = gt.batch_linear_search(queries, size=k)

    ids, _ = sidx.batch_search(queries, size=k, epsilon=0.1)
    rec = recall_at_k(np.asarray(ids), np.asarray(gt_ids), k)
    assert rec >= 0.95, f"sharded recall@10 {rec} at n={n}"


def test_multihost_helpers_single_process():
    """Multi-host helpers must degrade to the single-process case: a global
    mesh over the virtual devices, all shards owned by process 0, and
    local_shard_array assembling the same sharded global array the
    single-host path would."""
    import jax
    from ngt_tpu.parallel import multihost

    assert multihost.initialize() is False  # no coordinator -> no-op
    mesh = multihost.make_global_mesh()
    assert mesh.devices.size == len(jax.devices())
    owners = multihost.process_shard_slices(mesh)
    assert list(owners.keys()) == [0]
    assert owners[0] == list(range(mesh.devices.size))

    p = mesh.devices.size
    local = np.stack([
        np.full((4, 8), i, np.float32) for i in range(p)
    ])
    arr = multihost.local_shard_array(mesh, (p * 4, 8), local)
    got = np.asarray(arr).reshape(p, 4, 8)
    np.testing.assert_array_equal(got, local)
