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
