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


def test_fast_knn_matches_exact(rng):
    """bf16-scan + exact re-rank must return the exact top-k."""
    import jax.numpy as jnp
    from ngt_tpu.ops.bruteforce import fast_knn_l2, linear_search
    from ngt_tpu.properties import DistanceType

    x = (rng.normal(size=(3000, 128)) * 20 + 100).astype(np.float32)
    q = x[rng.choice(3000, 32, replace=False)] + rng.normal(
        size=(32, 128)
    ).astype(np.float32)
    valid = np.ones(3000, bool)
    valid[5] = False
    sqn = (x * x).sum(1).astype(np.float32)
    fi, fd = fast_knn_l2(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), jnp.asarray(sqn), 10
    )
    ei, ed = linear_search(
        jnp.asarray(q), jnp.asarray(x), jnp.asarray(valid), DistanceType.L2, 10
    )
    np.testing.assert_array_equal(np.asarray(fi), np.asarray(ei))
    # distances: compare against f64 truth — the fast path's direct diff^2
    # re-rank matches it to ~1e-7; linear_search's norm-trick matmul carries
    # ~0.5% cancellation error (fine for ranking, not a distance oracle)
    d64 = np.linalg.norm(
        q[:, None, :].astype(np.float64) - x[None, :, :].astype(np.float64),
        axis=-1,
    )
    d64[:, ~valid] = np.inf
    want = np.take_along_axis(d64, np.asarray(fi).astype(np.int64), axis=1)
    np.testing.assert_allclose(np.asarray(fd), want, rtol=1e-5)


def test_fast_knn_l2_bulk_variants_exact(rng):
    """The bulk scan (plain and bf16-tile/centered variants) must return the
    exact top-k for stored rows: SIFT-like all-positive data with a large
    mean exercises the centering algebra (||a-b|| translation invariance)."""
    from ngt_tpu.ops.bruteforce import fast_knn_l2_bulk
    from ngt_tpu.ops import distances as D

    x = (rng.random(size=(300, 64)) * 200).astype(np.float32)
    valid = np.ones(300, bool)
    valid[0] = False
    valid[42] = False
    q_ids = np.arange(64, dtype=np.int32)  # qblock-aligned stored rows
    sq = D.sq_norms(jnp.asarray(x))
    full = np.linalg.norm(x[q_ids][:, None, :] - x[None, :, :], axis=-1)
    full[:, ~valid] = np.inf
    want = np.argsort(full, axis=1, kind="stable")[:, :5]
    for bf16_tile in (False, True):
        ids, dists = fast_knn_l2_bulk(
            jnp.asarray(q_ids), jnp.asarray(x), jnp.asarray(valid), sq,
            k=5, kc=16, qblock=64, block=128, bf16_tile=bf16_tile,
        )
        ids, dists = np.asarray(ids), np.asarray(dists)
        np.testing.assert_array_equal(ids, want)
        np.testing.assert_allclose(
            dists, np.take_along_axis(full, want, axis=1), rtol=1e-4, atol=1e-3
        )
