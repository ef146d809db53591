"""Batched best-first search vs brute force on an exact KNNG.

On an exact k-NN graph with enough seeds and ε, best-first search should
reach near-perfect recall — this isolates the traversal kernel from build
quality (the reference validates searches the same way: linear-search GT,
Optimizer.h:1338-1340).
"""

import numpy as np
import jax.numpy as jnp

from ngt_tpu.graph.search import graph_search
from ngt_tpu.ops.bruteforce import linear_search, recall_at_k
from ngt_tpu.properties import DistanceType


def make_knng(x, k, mutual=False):
    d = np.linalg.norm(x[:, None, :] - x[None, :, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    nn = np.argsort(d, axis=1)[:, :k].astype(np.int32)
    if not mutual:
        return nn
    # add reverse edges (ANNG-like bidirectionality; Graph.h:611-626)
    n = x.shape[0]
    adj = [set(row.tolist()) for row in nn]
    for i, row in enumerate(nn):
        for j in row:
            adj[j].add(i)
    e_max = max(len(a) for a in adj)
    out = np.full((n, e_max), -1, np.int32)
    for i, a in enumerate(adj):
        ids = sorted(a, key=lambda j: d[i, j])
        out[i, : len(ids)] = ids
    return out


def test_search_on_exact_knng(rng):
    n, dim, k = 600, 32, 10
    x = rng.normal(size=(n, dim)).astype(np.float32)
    x[0] = 0  # dummy slot
    valid = np.ones(n, bool)
    valid[0] = False
    nbr = make_knng(x, 16, mutual=True)
    nbr[0] = -1

    q = rng.normal(size=(20, dim)).astype(np.float32)
    seeds = rng.integers(1, n, size=(20, 10)).astype(np.int32)

    res = graph_search(
        jnp.asarray(x),
        jnp.asarray(nbr),
        jnp.asarray(valid),
        jnp.asarray(q),
        jnp.asarray(seeds),
        metric=DistanceType.L2,
        k=k,
        epsilon=0.2,
        width=64,
        hash_bits=10,
        exact_hash=True,
    )
    gt_ids, gt_d = linear_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), DistanceType.L2, k
    )
    rec = recall_at_k(np.asarray(res.ids), np.asarray(gt_ids), k)
    assert rec >= 0.97, f"recall@10 too low: {rec}"
    # distances of found ids must be exact
    found = np.asarray(res.ids)
    fd = np.asarray(res.dists)
    for b in range(found.shape[0]):
        for j in range(k):
            if found[b, j] >= 0:
                want = np.linalg.norm(q[b] - x[found[b, j]])
                np.testing.assert_allclose(fd[b, j], want, rtol=1e-4, atol=1e-4)
    # results sorted ascending
    assert (np.diff(fd, axis=1) >= -1e-6).all()
    # never returns the dummy/invalid slot
    assert (found != 0).all()


def test_lossy_visited_hash_recall(rng):
    """The >2^20-id regime: ids no longer fit the visited bitmap and the
    double-hash Bloom path engages (graph/search.py _hash_slots).  Force it
    on a small index (hash_bits=10 -> 1024 bits for 600 ids) and pin that
    recall stays within noise of the exact-bitmap run — false "visited"
    marks are the only possible failure (they skip candidates silently)."""
    n, dim, k = 600, 32, 10
    x = rng.normal(size=(n, dim)).astype(np.float32)
    valid = np.ones(n, bool)
    nbr = make_knng(x, 16, mutual=True)
    q = rng.normal(size=(50, dim)).astype(np.float32)
    seeds = rng.integers(0, n, size=(50, 10)).astype(np.int32)
    kw = dict(metric=DistanceType.L2, k=k, epsilon=0.2, width=64,
              hash_bits=10)
    args = (jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(valid),
            jnp.asarray(q), jnp.asarray(seeds))
    exact = graph_search(*args, exact_hash=True, **kw)
    lossy = graph_search(*args, exact_hash=False, **kw)
    gt_ids, _ = linear_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), DistanceType.L2, k
    )
    rec_exact = recall_at_k(np.asarray(exact.ids), np.asarray(gt_ids), k)
    rec_lossy = recall_at_k(np.asarray(lossy.ids), np.asarray(gt_ids), k)
    assert rec_exact >= 0.97
    assert rec_lossy >= rec_exact - 0.01, (rec_lossy, rec_exact)


def test_search_stats_and_termination(rng):
    n, dim = 300, 16
    x = rng.normal(size=(n, dim)).astype(np.float32)
    valid = np.ones(n, bool)
    nbr = make_knng(x, 8)
    q = rng.normal(size=(4, dim)).astype(np.float32)
    seeds = rng.integers(0, n, size=(4, 5)).astype(np.int32)
    res = graph_search(
        jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(valid),
        jnp.asarray(q), jnp.asarray(seeds),
        metric=DistanceType.L2, k=5, epsilon=0.1,
        width=32, hash_bits=10, exact_hash=True,
    )
    assert int(res.iters) < 300  # terminated by ε rule, not the iteration cap
    assert (np.asarray(res.dist_count) > 0).all()
    assert (np.asarray(res.visit_count) >= np.asarray(res.dist_count)).all()


def test_search_radius(rng):
    """Range search: results outside the radius are filtered
    (SearchContainer radius semantics, Common.h:2029-2037)."""
    n, dim = 200, 8
    x = rng.normal(size=(n, dim)).astype(np.float32)
    valid = np.ones(n, bool)
    nbr = make_knng(x, 8)
    q = x[17][None, :] + 0.01
    # seeds near the query, as tree/centroid seeding provides in practice;
    # NGT likewise finds nothing if every seed is beyond ε·radius
    # (the pop rule Graph.cpp:541-543 fires immediately)
    seeds = np.array([[17, 3, 5, 9, 11]], dtype=np.int32)
    full = np.linalg.norm(q - x, axis=-1)
    r = float(np.sort(full)[5]) + 1e-3  # radius admitting ~6 objects
    res = graph_search(
        jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(valid),
        jnp.asarray(q), jnp.asarray(seeds),
        metric=DistanceType.L2, k=10, epsilon=0.3, radius=r,
        width=32, hash_bits=10, exact_hash=True,
    )
    d = np.asarray(res.dists)[0]
    ids = np.asarray(res.ids)[0]
    assert (d[ids >= 0] <= r).all()
    assert ids[0] == 17
    # every in-radius result it returns is a true in-radius object
    want = set(np.nonzero(full <= r)[0].tolist())
    assert set(ids[ids >= 0].tolist()) <= want
    assert len(set(ids[ids >= 0].tolist())) >= len(want) - 1


def test_duplicate_seeds_ok(rng):
    n, dim = 100, 8
    x = rng.normal(size=(n, dim)).astype(np.float32)
    valid = np.ones(n, bool)
    nbr = make_knng(x, 6)
    q = rng.normal(size=(2, dim)).astype(np.float32)
    seeds = np.array([[3, 3, 3, 7, -1], [5, 5, 5, 5, 5]], dtype=np.int32)
    res = graph_search(
        jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(valid),
        jnp.asarray(q), jnp.asarray(seeds),
        metric=DistanceType.L2, k=5, epsilon=0.2,
        width=32, hash_bits=10, exact_hash=True,
    )
    ids = np.asarray(res.ids)
    # no duplicate results
    for row in ids:
        live = row[row >= 0]
        assert len(live) == len(set(live.tolist()))


def test_exploration_rank_ef(rng):
    """search_ef (rank-based radius widening, the HNSW-ef analogue — a TPU
    extension, see properties.search_ef): driving the radius-shrink rule
    from the ef-th best pool distance explores strictly more than the k-th
    (admission/termination both compare against a larger radius), so on a
    deliberately WEAK graph recall must improve monotonically with ef."""
    n, dim, k = 1500, 24, 10
    x = rng.normal(size=(n, dim)).astype(np.float32)
    valid = np.ones(n, bool)
    nbr = make_knng(x, 5)            # directed, narrow: weak by design
    q = rng.normal(size=(64, dim)).astype(np.float32)
    seeds = rng.integers(0, n, size=(64, 4)).astype(np.int32)
    gt_ids, _ = linear_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), DistanceType.L2, k
    )
    args = (jnp.asarray(x), jnp.asarray(nbr), jnp.asarray(valid),
            jnp.asarray(q), jnp.asarray(seeds))
    recs = []
    for ef in (k, 24, 48):
        res = graph_search(
            *args, metric=DistanceType.L2, k=ef, epsilon=0.0, width=64,
            hash_bits=11, exact_hash=True,
        )
        recs.append(
            recall_at_k(np.asarray(res.ids)[:, :k], np.asarray(gt_ids), k)
        )
    assert recs[1] >= recs[0] and recs[2] >= recs[1], recs
    assert recs[2] > recs[0], recs   # widening must actually buy recall here


def test_index_search_ef_paths(rng):
    """ef wiring through BOTH production wrappers: Index.batch_search's
    exact path (k widened to ef, sliced back to size) and the routed sq8
    quantized-graph path (k_radius lifted toward k_exp)."""
    import ngt_tpu
    from ngt_tpu.quant.qgraph import QuantizedGraphIndex

    n, dim, k = 1200, 24, 10
    x = rng.normal(size=(n, dim)).astype(np.float32)
    q = rng.normal(size=(32, dim)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=dim, edge_size_for_creation=5)
    idx.prop.max_edges = 8           # keep the bulk build's rows narrow/weak
    idx.batch_insert(x, build=True)
    gt_ids, _ = idx.batch_linear_search(q, size=k)
    gt_ids = np.asarray(gt_ids)

    base_ids, base_d = idx.batch_search(q, size=k, epsilon=0.0)
    ef_ids, ef_d = idx.batch_search(q, size=k, epsilon=0.0, ef=40)
    assert ef_ids.shape == (32, k) and ef_d.shape == (32, k)
    r0 = recall_at_k(np.asarray(base_ids), gt_ids, k)
    r1 = recall_at_k(np.asarray(ef_ids), gt_ids, k)
    assert r1 >= r0, (r0, r1)

    # property route (search_ef) must match the per-call kwarg
    idx.prop.search_ef = 40
    prop_ids, _ = idx.batch_search(q, size=k, epsilon=0.0)
    np.testing.assert_array_equal(np.asarray(prop_ids), np.asarray(ef_ids))
    idx.prop.search_ef = 0

    qg = QuantizedGraphIndex.quantize(idx, mode="sq8")
    q0, _ = qg.batch_search(q, size=k, epsilon=0.0, result_expansion=6.0)
    q1, _ = qg.batch_search(q, size=k, epsilon=0.0, result_expansion=6.0,
                            ef=40)
    rq0 = recall_at_k(np.asarray(q0), gt_ids, k)
    rq1 = recall_at_k(np.asarray(q1), gt_ids, k)
    assert rq1 >= rq0, (rq0, rq1)
