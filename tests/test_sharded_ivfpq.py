"""Mesh-sharded IVF+PQ: recall parity with the single-device index.

The sharded search refines the UNION of per-shard candidate lists, so its
recall must be >= the single-device search at equal nprobe/expansion."""

import numpy as np
import pytest

from ngt_tpu.parallel.sharding import make_mesh
from ngt_tpu.parallel.sharded_ivfpq import ShardedIVFPQ
from ngt_tpu.quant.ivfpq import IVFPQIndex


def _corpus(n=20000, d=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(128, d)).astype(np.float32) * 8
    x = centers[rng.integers(0, 128, size=n)] + rng.normal(
        size=(n, d)
    ).astype(np.float32)
    q = centers[rng.integers(0, 128, size=64)] + rng.normal(
        size=(64, d)
    ).astype(np.float32)
    return x, q


def _gt(x, q, k):
    d = (
        np.sum(q * q, axis=1)[:, None]
        - 2.0 * (q @ x.T)
        + np.sum(x * x, axis=1)[None, :]
    )
    return np.argsort(d, axis=1, kind="stable")[:, :k]


def _recall(ids, gt):
    hits = sum(
        len(set(map(int, f[f >= 0])) & set(map(int, g)))
        for f, g in zip(ids, gt)
    )
    return hits / gt.size


@pytest.fixture(scope="module")
def built():
    x, q = _corpus()
    idx = IVFPQIndex(dimension=32, n_centroids=64, dsub=2, ksub=16,
                     raw_store="host")
    idx.batch_insert(x)
    idx.build(kmeans_iters=8)
    return idx, x, q, _gt(x, q, 10)


def test_sharded_matches_single_device(built):
    idx, x, q, gt = built
    single_ids, _ = idx.batch_search(
        q, size=10, nprobe=16, result_expansion=20.0
    )
    r_single = _recall(single_ids, gt)
    assert r_single >= 0.9

    sh = ShardedIVFPQ(make_mesh(8), idx)
    ids, dists = sh.batch_search(
        q, size=10, nprobe=16, result_expansion=20.0
    )
    r_shard = _recall(ids, gt)
    # union-of-shards candidates ⊇ single-device candidates
    assert r_shard >= r_single - 1e-9
    assert np.all(np.diff(dists, axis=1) >= -1e-4)  # sorted results


def test_shard_balance_and_memory(built):
    idx, *_ = built
    sh = ShardedIVFPQ(make_mesh(8), idx)
    rep = sh.memory_report()
    assert rep["n_shards"] == 8
    loads = np.array(rep["shard_loads"])
    assert loads.sum() == idx.size
    # greedy balance keeps every shard within 2x of the mean
    assert loads.max() <= 2 * max(loads.mean(), 1)
    assert rep["per_shard_bytes"] * 8 == rep["total_bytes"]


def test_sharded_exact_distances(built):
    """Returned distances are EXACT (post-refine) metric distances."""
    idx, x, q, gt = built
    sh = ShardedIVFPQ(make_mesh(8), idx)
    ids, dists = sh.batch_search(q[:8], size=5, nprobe=16)
    for r in range(8):
        for c in range(5):
            i = ids[r, c]
            if i < 0:
                continue
            true = np.linalg.norm(q[r] - x[i])
            assert abs(true - dists[r, c]) < 1e-2
