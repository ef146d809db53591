"""Batched distance kernels for all reference metrics.

TPU-native replacement for the reference's hand-written AVX512/AVX2/SSE
kernels (reference lib/NGT/PrimitiveComparator.h:105-752).  Where the
reference computes one (query, object) pair per call with SIMD intrinsics,
these kernels compute whole blocks at once:

* ``pairwise(metric, Q, X)`` — [B, D] x [N, D] -> [B, N].  L2/cosine/dot
  families ride the MXU via one matmul (||q-x||^2 = ||q||^2+||x||^2-2 q.x);
  L1/Hamming/Jaccard are VPU reductions.
* ``gathered(metric, Q, Xs)`` — [B, D] x [B, E, D] -> [B, E], the per-hop
  scorer of the graph search (one query against its gathered neighbor rows).

Padding convention: feature dims are zero-padded to a lane multiple (the
analogue of the reference's ``getPaddedDimension`` x16 rounding,
ObjectSpace.h:249); zero padding is distance-neutral for every dense metric
here (for Lorentz only coordinate 0 is special, and it is never padding).
Sparse-Jaccard rows are int32 feature-id sets padded with -1.

Metric definitions follow the reference exactly:
  L1/L2:            PrimitiveComparator.h:143-313
  NormalizedL2:     sqrt(2 - 2 dot)             (:226-234)
  Hamming:          popcount(a XOR b)           (:340-354)
  Jaccard:          1 - |a AND b| / |a OR b|    (:375-392)
  SparseJaccard:    1 - |ids_a ∩ ids_b| / |ids_a ∪ ids_b|  (:399-418)
  Cosine:           1 - dot/(|a||b|)            (:487-553)
  Angle:            acos(cos similarity)        (:571-593)
  Poincare:         acosh(1 + 2|a-b|^2 / ((1-|a|^2)(1-|b|^2)))  (:596-618)
  Lorentz:          acosh(a0*b0 - sum_{i>0} ai*bi)              (:621-637)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ngt_tpu.properties import DistanceType

#: TPU MXU defaults to bfloat16 passes; distance ranking needs full f32
#: (SIFT-scale vectors have squared norms ~1e6 — bf16 error swamps the
#: inter-neighbor distance gaps entirely).
_PREC = jax.lax.Precision.HIGHEST

# Metrics whose stored vectors are L2-normalized at insertion time, after
# which the normalized kernel (plain dot) applies (reference
# ObjectSpaceRepository.h:560-618 + ObjectSpace::normalize ObjectSpace.h:251).
NORMALIZED_METRICS = frozenset(
    {
        DistanceType.NORMALIZED_L2,
        DistanceType.NORMALIZED_COSINE,
        DistanceType.NORMALIZED_ANGLE,
    }
)

# Plain angular metrics: stored UN-normalized (the reference computes
# Cosine/Angle with explicit norms, PrimitiveComparator.h:487-553, and
# normalizes at insert only for the Normalized* variants); any dot-based
# seed surrogate must divide by the stored norms.
ANGULAR_METRICS = frozenset({DistanceType.COSINE, DistanceType.ANGLE})

#: metrics computed on uint8 *bit patterns* (stored as uint8, never cast)
BITWISE_METRICS = frozenset({DistanceType.HAMMING, DistanceType.JACCARD})

_F32 = jnp.float32


def _acos_safe(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def _acosh_safe(x):
    return jnp.arccosh(jnp.maximum(x, 1.0))


def _popcount(x):
    return jax.lax.population_count(x)


def sq_norms(x: jax.Array) -> jax.Array:
    """Row squared norms, f32. x: [..., D]."""
    xf = x.astype(_F32)
    return jnp.sum(xf * xf, axis=-1)


# --------------------------------------------------------------------------
# pairwise: [B, D] x [N, D] -> [B, N]
# --------------------------------------------------------------------------


def pairwise(
    metric: DistanceType,
    q: jax.Array,
    x: jax.Array,
    x_sqnorm: jax.Array | None = None,
) -> jax.Array:
    """Full pairwise distance matrix.  Used by brute-force search (the
    analogue of ObjectSpaceRepository::linearSearch,
    reference ObjectSpaceRepository.h:466-502) and by the build's intra-batch
    distance step (reference Index.cpp:687-703)."""
    metric = DistanceType(metric)

    if metric in BITWISE_METRICS:
        qb = q[:, None, :]
        xb = x[None, :, :]
        if metric == DistanceType.HAMMING:
            return jnp.sum(_popcount(qb ^ xb), axis=-1).astype(_F32)
        inter = jnp.sum(_popcount(qb & xb), axis=-1).astype(_F32)
        union = jnp.sum(_popcount(qb | xb), axis=-1).astype(_F32)
        return 1.0 - inter / jnp.maximum(union, 1.0)

    if metric == DistanceType.SPARSE_JACCARD:
        return _sparse_jaccard_pairwise(q, x)

    qf = q.astype(_F32)
    xf = x.astype(_F32)

    if metric == DistanceType.L1:
        return jnp.sum(jnp.abs(qf[:, None, :] - xf[None, :, :]), axis=-1)

    dot = jnp.dot(qf, xf.T, preferred_element_type=_F32, precision=_PREC)  # MXU

    if metric in (DistanceType.NORMALIZED_COSINE,):
        return 1.0 - dot
    if metric == DistanceType.NORMALIZED_ANGLE:
        return _acos_safe(dot)
    if metric == DistanceType.NORMALIZED_L2:
        return jnp.sqrt(jnp.maximum(2.0 - 2.0 * dot, 0.0))

    q_sq = jnp.sum(qf * qf, axis=-1)
    x_sq = sq_norms(xf) if x_sqnorm is None else x_sqnorm.astype(_F32)

    if metric == DistanceType.L2:
        d2 = q_sq[:, None] + x_sq[None, :] - 2.0 * dot
        return jnp.sqrt(jnp.maximum(d2, 0.0))
    if metric == DistanceType.COSINE:
        denom = jnp.sqrt(jnp.maximum(q_sq[:, None] * x_sq[None, :], 1e-30))
        return 1.0 - dot / denom
    if metric == DistanceType.ANGLE:
        denom = jnp.sqrt(jnp.maximum(q_sq[:, None] * x_sq[None, :], 1e-30))
        return _acos_safe(dot / denom)
    if metric == DistanceType.POINCARE:
        d2 = jnp.maximum(q_sq[:, None] + x_sq[None, :] - 2.0 * dot, 0.0)
        denom = jnp.maximum((1.0 - q_sq)[:, None] * (1.0 - x_sq)[None, :], 1e-30)
        return _acosh_safe(1.0 + 2.0 * d2 / denom)
    if metric == DistanceType.LORENTZ:
        # a0*b0 - sum_{i>0} = 2*a0*b0 - dot
        ab0 = jnp.outer(qf[:, 0], xf[:, 0])
        return _acosh_safe(2.0 * ab0 - dot)
    raise ValueError(f"unsupported metric: {metric!r}")


def seed_scores(
    metric: DistanceType,
    q: jax.Array,
    reps: jax.Array,
    rep_sq: jax.Array | None = None,
) -> jax.Array:
    """Approximate scores for SEED SELECTION only — one bf16 MXU pass
    instead of the ~3 f32-precision passes of ``pairwise``.

    Safe because every consumer uses the scores only to pick representative
    IDS (graph_search re-scores the chosen seeds exactly in-program, so no
    approximate value ever enters a result or a pool radius).  Monotone
    surrogates are used where cheaper (squared L2, negated dot).  bf16
    resolution argument: L2 rows are centered on the rep mean first
    (translation invariance — the same trick as the bulk scan's bf16 score
    tile), normalized metrics are unit-scale already.  Exotic metrics fall
    back to the exact ``pairwise``."""
    metric = DistanceType(metric)
    # NOTE: the [B, reps] score TILE stays f32 — emitting it in bf16 was
    # measured to cost ~0.2% recall@10 at 1M (and fails the selection-quality
    # test); the HBM saved on the tile write does not pay for it.
    if metric in NORMALIZED_METRICS or metric in ANGULAR_METRICS:
        qf = q.astype(_F32)
        dot = jnp.dot(
            qf.astype(jnp.bfloat16), reps.astype(jnp.bfloat16).T,
            preferred_element_type=_F32,
        )
        if metric in ANGULAR_METRICS:
            # plain Cosine/Angle rows are stored UN-normalized: raw -dot
            # would rank large-norm reps over angularly-near ones.  Divide
            # by the rep norms (|q| is constant per row — rank-invariant).
            r_sq = (
                rep_sq
                if rep_sq is not None
                else jnp.sum(reps.astype(_F32) * reps.astype(_F32), axis=-1)
            )
            dot = dot * jax.lax.rsqrt(jnp.maximum(r_sq, 1e-30))[None, :]
        return -dot  # normalized/angular metrics are monotone-decreasing in dot
    if metric == DistanceType.L2:
        qf = q.astype(_F32)
        rf = reps.astype(_F32)
        mu = jnp.mean(rf, axis=0)
        qc = qf - mu[None, :]
        rc = rf - mu[None, :]
        dot = jnp.dot(
            qc.astype(jnp.bfloat16), rc.astype(jnp.bfloat16).T,
            preferred_element_type=_F32,
        )
        q_sq = jnp.sum(qc * qc, axis=-1)
        r_sq = jnp.sum(rc * rc, axis=-1)
        return q_sq[:, None] + r_sq[None, :] - 2.0 * dot  # squared L2
    return pairwise(metric, q, reps, x_sqnorm=rep_sq)


def _sparse_jaccard_pairwise(q_ids: jax.Array, x_ids: jax.Array) -> jax.Array:
    """q_ids: [B, L], x_ids: [N, L] int32, -1 padded, each row's valid ids unique.

    Mirrors compareSparseJaccardDistance (reference
    PrimitiveComparator.h:399-418) which merge-intersects sorted id arrays."""
    qv = q_ids[:, None, :, None]            # [B,1,L,1]
    xv = x_ids[None, :, None, :]            # [1,N,1,L]
    match = (qv == xv) & (qv >= 0)
    inter = jnp.sum(jnp.any(match, axis=-1), axis=-1).astype(_F32)  # [B,N]
    nq = jnp.sum(q_ids >= 0, axis=-1).astype(_F32)
    nx = jnp.sum(x_ids >= 0, axis=-1).astype(_F32)
    union = jnp.maximum(nq[:, None] + nx[None, :] - inter, 1.0)
    return 1.0 - inter / union


# --------------------------------------------------------------------------
# gathered: [B, D] x [B, E, D] -> [B, E]   (per-hop scorer of graph search)
# --------------------------------------------------------------------------


def gathered(
    metric: DistanceType,
    q: jax.Array,
    xs: jax.Array,
    xs_sqnorm: jax.Array | None = None,
    q_sqnorm: jax.Array | None = None,
) -> jax.Array:
    """Distances from each query to its own gathered candidate rows."""
    metric = DistanceType(metric)

    if metric in BITWISE_METRICS:
        qb = q[:, None, :]
        if metric == DistanceType.HAMMING:
            return jnp.sum(_popcount(qb ^ xs), axis=-1).astype(_F32)
        inter = jnp.sum(_popcount(qb & xs), axis=-1).astype(_F32)
        union = jnp.sum(_popcount(qb | xs), axis=-1).astype(_F32)
        return 1.0 - inter / jnp.maximum(union, 1.0)

    if metric == DistanceType.SPARSE_JACCARD:
        qv = q[:, None, :, None]
        xv = xs[:, :, None, :]
        match = (qv == xv) & (qv >= 0)
        inter = jnp.sum(jnp.any(match, axis=-1), axis=-1).astype(_F32)
        nq = jnp.sum(q >= 0, axis=-1).astype(_F32)
        nx = jnp.sum(xs >= 0, axis=-1).astype(_F32)
        union = jnp.maximum(nq[:, None] + nx - inter, 1.0)
        return 1.0 - inter / union

    qf = q.astype(_F32)
    xf = xs.astype(_F32)

    if metric == DistanceType.L1:
        return jnp.sum(jnp.abs(qf[:, None, :] - xf), axis=-1)

    if metric == DistanceType.L2:
        # exact elementwise form on the VPU — cheaper than a f32 MXU pass at
        # gather sizes and immune to the norm-trick cancellation
        diff = qf[:, None, :] - xf
        return jnp.sqrt(jnp.sum(diff * diff, axis=-1))

    dot = jnp.einsum(
        "bd,bed->be", qf, xf, preferred_element_type=_F32, precision=_PREC
    )

    if metric == DistanceType.NORMALIZED_COSINE:
        return 1.0 - dot
    if metric == DistanceType.NORMALIZED_ANGLE:
        return _acos_safe(dot)
    if metric == DistanceType.NORMALIZED_L2:
        return jnp.sqrt(jnp.maximum(2.0 - 2.0 * dot, 0.0))

    q_sq = jnp.sum(qf * qf, axis=-1) if q_sqnorm is None else q_sqnorm.astype(_F32)
    x_sq = jnp.sum(xf * xf, axis=-1) if xs_sqnorm is None else xs_sqnorm.astype(_F32)

    if metric == DistanceType.COSINE:
        denom = jnp.sqrt(jnp.maximum(q_sq[:, None] * x_sq, 1e-30))
        return 1.0 - dot / denom
    if metric == DistanceType.ANGLE:
        denom = jnp.sqrt(jnp.maximum(q_sq[:, None] * x_sq, 1e-30))
        return _acos_safe(dot / denom)
    if metric == DistanceType.POINCARE:
        d2 = jnp.maximum(q_sq[:, None] + x_sq - 2.0 * dot, 0.0)
        denom = jnp.maximum((1.0 - q_sq)[:, None] * (1.0 - x_sq), 1e-30)
        return _acosh_safe(1.0 + 2.0 * d2 / denom)
    if metric == DistanceType.LORENTZ:
        ab0 = qf[:, 0:1] * xf[:, :, 0]
        return _acosh_safe(2.0 * ab0 - dot)
    raise ValueError(f"unsupported metric: {metric!r}")


def normalize_rows(x: jax.Array) -> jax.Array:
    """L2-normalize rows; raises on zero vectors like the reference
    (ObjectSpace::normalize throws, ObjectSpace.h:251-266) — but inside jit we
    substitute a zero row (caller validates on host)."""
    xf = x.astype(_F32)
    n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True))
    return jnp.where(n > 0, xf / jnp.maximum(n, 1e-30), 0.0)


@functools.lru_cache(maxsize=None)
def needs_normalization(metric: DistanceType) -> bool:
    return DistanceType(metric) in (
        DistanceType.NORMALIZED_L2,
        DistanceType.NORMALIZED_COSINE,
        DistanceType.NORMALIZED_ANGLE,
    )
