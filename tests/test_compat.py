"""Compatibility surfaces: ngtpy shim, ngt.base shim, sparse-Jaccard API."""

import os

import numpy as np
import pytest

import ngt_tpu
from ngt_tpu.ops.bruteforce import recall_at_k


def test_ngtpy_shim_roundtrip(tmp_path, rng):
    import ngt_tpu.ngtpy as ngtpy

    path = os.path.join(tmp_path, "shim")
    data = rng.normal(size=(600, 16)).astype(np.float32)
    ngtpy.create(path, 16, distance_type="L2")
    index = ngtpy.Index(path)
    index.batch_insert(data)
    assert index.get_num_of_objects() == 600
    res = index.search(data[33], size=5, epsilon=0.2)
    assert res[0][0] == 33
    lin = index.linear_search(data[33], size=3)
    assert lin[0][0] == 33
    obj = index.get_object(33)
    np.testing.assert_allclose(obj, data[33], rtol=1e-6)
    index.remove(33)
    res = index.search(data[33], size=3, epsilon=0.3)
    assert all(i != 33 for i, _ in res)
    index.save()
    index.close()


def test_ngtpy_optimizer_shim(tmp_path, rng):
    import ngt_tpu.ngtpy as ngtpy
    from ngt_tpu.properties import GraphType

    path = os.path.join(tmp_path, "opt_in")
    out = os.path.join(tmp_path, "opt_out")
    data = rng.normal(size=(800, 12)).astype(np.float32)
    ngtpy.create(path, 12)
    index = ngtpy.Index(path)
    index.batch_insert(data)
    index.save()

    opt = ngtpy.Optimizer(num_of_outgoings=8, num_of_incomings=24)
    opt.execute(path, out)
    reopened = ngt_tpu.open_index(out)
    assert reopened.prop.graph_type == GraphType.ONNG
    gt_ids, _ = reopened.batch_linear_search(data[:32], size=10)
    ids, _ = reopened.batch_search(data[:32], size=10, epsilon=0.15)
    assert recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10) >= 0.9


def test_ngtpy_quantized_shim(tmp_path, rng):
    import ngt_tpu.ngtpy as ngtpy

    path = os.path.join(tmp_path, "qidx")
    data = rng.normal(size=(700, 32)).astype(np.float32)
    ngtpy.create(path, 32)
    index = ngtpy.Index(path)
    index.batch_insert(data)
    index.save()
    ngtpy.QuantizedIndex.quantize(path, dimension_of_subvector=2)
    q = ngtpy.QuantizedIndex(path)
    res = q.search(data[5], size=3, epsilon=0.1, result_expansion=3.0)
    assert res[0][0] == 5


def test_base_shim(tmp_path, rng):
    from ngt_tpu.base import Index, ObjectDistance

    path = os.path.join(tmp_path, "base")
    data = rng.normal(size=(300, 8)).astype(np.float32)
    idx = Index.create(path, 8)
    ids = idx.insert_blob(data)
    assert ids[0] == 1  # ngt.base ids are 1-based (base.py wraps the C API)
    res = idx.search(data[10], k=3)
    assert isinstance(res[0], ObjectDistance)
    assert res[0].id == 11 and res[0].distance < 1e-4
    idx.save()
    idx2 = Index.open(path)
    assert idx2.search(data[10], k=1)[0].id == 11


def test_sparse_jaccard_index(rng):
    """Sparse-Jaccard workflow (reference samples/jaccard-sparse)."""
    idx = ngt_tpu.create(
        None, dimension=16, distance_type="Sparse Jaccard"
    )
    sets = [
        sorted(rng.choice(1000, size=rng.integers(3, 12), replace=False))
        for _ in range(300)
    ]
    from ngt_tpu.store import pad_sparse

    packed = pad_sparse(sets, 16)
    idx.batch_insert(packed, build=True)
    assert idx.verify() == []
    # identical set -> distance 0, itself first
    res = idx.search(idx.make_sparse_object(sets[42]), size=3, epsilon=0.3)
    assert res[0][0] == 42 and res[0][1] < 1e-6
    # brute-force agreement on a few queries
    gt_ids, _ = idx.batch_linear_search(packed[:16], size=5)
    ids, _ = idx.batch_search(packed[:16], size=5, epsilon=0.3)
    rec = recall_at_k(np.asarray(ids), np.asarray(gt_ids), 5)
    assert rec >= 0.85, f"sparse jaccard recall {rec}"


def test_sparse_insert_single(rng):
    idx = ngt_tpu.create(None, dimension=8, distance_type="Sparse Jaccard")
    a = idx.insert_sparse([5, 3, 9])
    b = idx.insert_sparse([3, 9, 5, 100])
    idx.build_index()
    assert a == 0 and b == 1
    res = idx.search(idx.make_sparse_object([3, 5, 9]), size=2, epsilon=0.2)
    assert res[0][0] == 0 and res[0][1] < 1e-6
    assert 0 < res[1][1] <= 0.5  # |∩|=3, |∪|=4 -> 0.25


def test_optimize_seeds_kmeans(rng):
    data = rng.normal(size=(1000, 16)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=16)
    idx.batch_insert(data, build=True)
    idx.optimize_seeds(num_reps=64)
    assert idx.seeder.num_reps >= 32
    ids, _ = idx.batch_search(data[:16], size=5, epsilon=0.1)
    assert (np.asarray(ids)[:, 0] == np.arange(16)).all()
