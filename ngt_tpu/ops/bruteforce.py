"""Exact brute-force k-NN — the TPU analogue of the reference's
``ObjectSpaceRepository::linearSearch`` (ObjectSpaceRepository.h:466-502).

On TPU exact search is one (blocked) distance matrix + top-k, riding the MXU;
it doubles as the ground-truth generator for the recall harness (the
reference generates GT with ``ngt search -i s``, Optimizer.h:1338-1340).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ngt_tpu.ops import distances as D
from ngt_tpu.properties import DistanceType

_F32 = jnp.float32
INF = jnp.float32(jnp.inf)


def pad_dim(d: int, multiple: int = 128) -> int:
    """Round feature dim up to the TPU lane multiple (the analogue of
    ObjectSpace::getPaddedDimension's x16 rounding, ObjectSpace.h:249)."""
    return max(((d + multiple - 1) // multiple) * multiple, multiple)


def pad_rows_np(x: np.ndarray, d_pad: int) -> np.ndarray:
    if x.shape[-1] == d_pad:
        return x
    out = np.zeros(x.shape[:-1] + (d_pad,), dtype=x.dtype)
    out[..., : x.shape[-1]] = x
    return out


@functools.partial(jax.jit, static_argnames=("metric", "k", "block"))
def linear_search(
    queries: jax.Array,     # [B, D_pad]
    x: jax.Array,           # [N_pad, D_pad]
    valid: jax.Array,       # [N_pad] bool — False for unfilled/removed slots
    metric: DistanceType,
    k: int,
    x_sqnorm: jax.Array | None = None,
    block: int = 65536,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k. Returns (ids [B,k] int32, dists [B,k] f32), sorted
    ascending; empty slots are (-1, +inf). Blocked over N so the [B, block]
    distance tile stays on-chip-friendly."""
    n = x.shape[0]
    b = queries.shape[0]
    nblocks = max((n + block - 1) // block, 1)

    def scan_body(carry, i):
        best_d, best_i = carry
        start = i * block
        xb = jax.lax.dynamic_slice_in_dim(x, start, block, axis=0)
        vb = jax.lax.dynamic_slice_in_dim(valid, start, block, axis=0)
        sqb = (
            jax.lax.dynamic_slice_in_dim(x_sqnorm, start, block, axis=0)
            if x_sqnorm is not None
            else None
        )
        d = D.pairwise(metric, queries, xb, x_sqnorm=sqb)  # [B, block]
        ids = jax.lax.broadcasted_iota(jnp.int32, (b, block), 1) + start
        d = jnp.where(vb[None, :], d, INF)
        cat_d = jnp.concatenate([best_d, d], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        neg_top, top_i = jax.lax.top_k(-cat_d, k)
        new_i = jnp.take_along_axis(cat_i, top_i, axis=1)
        return (-neg_top, new_i), None

    if n <= block:
        d = D.pairwise(metric, queries, x, x_sqnorm=x_sqnorm)
        d = jnp.where(valid[None, :], d, INF)
        neg_top, top_i = jax.lax.top_k(-d, k)
        dist, idx = -neg_top, top_i.astype(jnp.int32)
    else:
        n_pad = nblocks * block
        if n_pad != n:
            x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
            valid = jnp.pad(valid, (0, n_pad - n))
            if x_sqnorm is not None:
                x_sqnorm = jnp.pad(x_sqnorm, (0, n_pad - n))
        init = (jnp.full((b, k), INF), jnp.full((b, k), -1, jnp.int32))
        (dist, idx), _ = jax.lax.scan(
            scan_body, init, jnp.arange(nblocks, dtype=jnp.int32)
        )
    idx = jnp.where(jnp.isinf(dist), -1, idx)
    return idx.astype(jnp.int32), dist


def recall_at_k(found_ids: np.ndarray, gt_ids: np.ndarray, k: int) -> float:
    """recall@k as computed by the reference's evaluator
    (Optimizer::evaluate, Optimizer.h:130-226): |found ∩ gt| / k averaged."""
    found = found_ids[:, :k]
    gt = gt_ids[:, :k]
    hits = 0
    for f, g in zip(found, gt):
        hits += len(set(int(i) for i in f if i >= 0) & set(int(i) for i in g if i >= 0))
    return hits / (len(found) * k)
