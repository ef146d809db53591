import numpy as np
import jax.numpy as jnp

from ngt_tpu.ops.bruteforce import linear_search, recall_at_k, pad_dim
from ngt_tpu.properties import DistanceType


def test_linear_search_exact(rng):
    x = rng.normal(size=(500, 32)).astype(np.float32)
    q = rng.normal(size=(17, 32)).astype(np.float32)
    valid = np.ones(500, bool)
    valid[0] = False  # dummy slot
    valid[100] = False  # removed
    ids, dists = linear_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), DistanceType.L2, 5
    )
    ids, dists = np.asarray(ids), np.asarray(dists)
    full = np.linalg.norm(q[:, None, :] - x[None, :, :], axis=-1)
    full[:, ~valid] = np.inf
    want = np.argsort(full, axis=1)[:, :5]
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(
        dists, np.take_along_axis(full, want, axis=1), rtol=1e-4, atol=1e-4
    )
    assert (ids != 0).all() and (ids != 100).all()


def test_linear_search_blocked(rng):
    """Blocked scan path (N > block) must agree with the single-block path."""
    x = rng.normal(size=(700, 16)).astype(np.float32)
    q = rng.normal(size=(9, 16)).astype(np.float32)
    valid = np.ones(700, bool)
    i1, d1 = linear_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid),
        DistanceType.L2, 7, block=256,
    )
    i2, d2 = linear_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid),
        DistanceType.L2, 7, block=65536,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)


def test_recall_metric():
    found = np.array([[1, 2, 3], [4, 5, 6]])
    gt = np.array([[1, 2, 9], [4, 5, 6]])
    assert recall_at_k(found, gt, 3) == 5 / 6


def test_pad_dim():
    assert pad_dim(1) == 128
    assert pad_dim(128) == 128
    assert pad_dim(129) == 256
