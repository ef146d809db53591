"""Batched k-means on device.

TPU redesign of the reference's ``Clustering`` (lib/NGT/Clustering.h:45-927):
OpenMP assignment loops + AVX sumOfSquares become one distance matmul per
iteration; the three init modes (head / random / k-means++,
Clustering.h:259-333) are kept.  The reference's NGT-accelerated assignment
(each centroid queries an NGT index, :439-577) exists to avoid O(N*K) work
on CPU — on the MXU the O(N*K) matmul IS the fast path, so it is the only
assignment mode.

``kmeans_multi`` runs M independent k-means (one per PQ subspace) inside a
single vmapped program — the whole PQ codebook trains in one device call.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_F32 = jnp.float32
_PREC = jax.lax.Precision.HIGHEST


def _pairwise_sq(q, x):
    """[B, D] x [K, D] -> [B, K] squared L2 (MXU)."""
    dot = jnp.dot(q, x.T, preferred_element_type=_F32, precision=_PREC)
    return (
        jnp.sum(q * q, axis=-1, keepdims=True)
        + jnp.sum(x * x, axis=-1)[None, :]
        - 2.0 * dot
    )


def _init_centroids(x, k, mode, key):
    n = x.shape[0]
    if mode == "head":  # InitializationModeHead (Clustering.h:262-270)
        return x[:k]
    if mode == "random":  # (Clustering.h:272-291)
        idx = jax.random.choice(key, n, shape=(k,), replace=False)
        return jnp.take(x, idx, axis=0)
    if mode == "kmeans++":  # (Clustering.h:293-333)
        # incremental: carry the running min-distance and score only the
        # LAST added centroid per step — the naive rescan against all k
        # slots is O(k^2 n d) (50+ TFLOP and ~200 s at n=200k, k=512)
        key, sub = jax.random.split(key)
        first = jax.random.choice(sub, n)
        c0 = x[first]
        cents0 = jnp.zeros((k, x.shape[1]), _F32).at[0].set(c0)
        mind0 = jnp.sum((x - c0[None, :]) ** 2, axis=1)

        def body(carry, i):
            cents, mind, key = carry
            key, sub = jax.random.split(key)
            p = mind / jnp.maximum(jnp.sum(mind), 1e-30)
            pick = jax.random.choice(sub, n, p=p)
            newc = x[pick]
            cents = cents.at[i].set(newc)
            mind = jnp.minimum(
                mind, jnp.sum((x - newc[None, :]) ** 2, axis=1)
            )
            return (cents, mind, key), None

        (cents, _, _), _ = jax.lax.scan(
            body, (cents0, mind0, key), jnp.arange(1, k)
        )
        return cents
    raise ValueError(f"unknown init mode: {mode}")


@functools.partial(jax.jit, static_argnames=("k", "iters", "mode"))
def _kmeans_one(x, valid, key, *, k, iters, mode):
    """x: [N, D] f32 (rows where ~valid are ignored). Returns
    (centroids [k, D], assign [N] int32)."""
    big = jnp.float32(3.0e38)
    cents = _init_centroids(x, k, mode, key)

    def step(cents, _):
        d = _pairwise_sq(x, cents)
        d = jnp.where(valid[:, None], d, big)
        assign = jnp.argmin(d, axis=1).astype(jnp.int32)
        onehot = (
            jax.nn.one_hot(assign, k, dtype=_F32) * valid[:, None]
        )  # [N, k]
        sums = jnp.dot(onehot.T, x, preferred_element_type=_F32,
                       precision=_PREC)
        counts = jnp.sum(onehot, axis=0)
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0),
            cents,
        )
        return new, None

    cents, _ = jax.lax.scan(step, cents, None, length=iters)
    d = _pairwise_sq(x, cents)
    assign = jnp.argmin(d, axis=1).astype(jnp.int32)
    return cents, assign


def kmeans(
    x: np.ndarray,
    k: int,
    iters: int = 25,
    mode: str = "kmeans++",
    valid: np.ndarray | None = None,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Single k-means. Returns (centroids [k, D], assignment [N])."""
    xj = jnp.asarray(np.asarray(x, np.float32))
    v = (
        jnp.asarray(valid)
        if valid is not None
        else jnp.ones(x.shape[0], bool)
    )
    c, a = _kmeans_one(
        xj, v, jax.random.PRNGKey(seed), k=int(k), iters=int(iters), mode=mode
    )
    return np.asarray(c), np.asarray(a)


@functools.partial(jax.jit, static_argnames=("k", "iters", "mode"))
def _kmeans_multi(xs, key, *, k, iters, mode):
    """xs: [M, N, Dsub] — M independent k-means, vmapped (the PQ codebook
    trainer: all subspaces in one device program)."""
    keys = jax.random.split(key, xs.shape[0])
    valid = jnp.ones(xs.shape[1], bool)
    return jax.vmap(
        lambda x, kk: _kmeans_one(x, valid, kk, k=k, iters=iters, mode=mode)
    )(xs, keys)


def kmeans_multi(
    xs: np.ndarray, k: int, iters: int = 25, mode: str = "kmeans++",
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """xs: [M, N, Dsub] -> (centroids [M, k, Dsub], assign [M, N])."""
    c, a = _kmeans_multi(
        jnp.asarray(np.asarray(xs, np.float32)),
        jax.random.PRNGKey(seed),
        k=int(k), iters=int(iters), mode=mode,
    )
    return np.asarray(c), np.asarray(a)


def mean_squared_error(x, centroids, assign) -> float:
    """Quantization MSE (reference Clustering::calculateMSE,
    Clustering.h:781-831)."""
    diff = np.asarray(x, np.float32) - np.asarray(centroids)[assign]
    return float((diff**2).sum(axis=1).mean())
