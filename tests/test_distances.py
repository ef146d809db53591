"""Distance kernels vs pure-numpy references.

The reference never unit-tested its AVX kernels (SURVEY.md §4); we test each
metric against an independent numpy implementation, both the pairwise and
the gathered form.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ngt_tpu.ops import distances as D
from ngt_tpu.properties import DistanceType


def np_ref(metric, a, b):
    """One (query, object) distance in float64 numpy."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    if metric == DistanceType.L1:
        return np.abs(a - b).sum()
    if metric == DistanceType.L2:
        return np.sqrt(((a - b) ** 2).sum())
    if metric == DistanceType.NORMALIZED_L2:
        return np.sqrt(max(2 - 2 * np.dot(a, b), 0))
    if metric == DistanceType.COSINE:
        return 1 - np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
    if metric == DistanceType.NORMALIZED_COSINE:
        return 1 - np.dot(a, b)
    if metric == DistanceType.ANGLE:
        c = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
        return np.arccos(np.clip(c, -1, 1))
    if metric == DistanceType.NORMALIZED_ANGLE:
        return np.arccos(np.clip(np.dot(a, b), -1, 1))
    if metric == DistanceType.POINCARE:
        d2 = ((a - b) ** 2).sum()
        return np.arccosh(
            1 + 2 * d2 / ((1 - (a**2).sum()) * (1 - (b**2).sum()))
        )
    if metric == DistanceType.LORENTZ:
        return np.arccosh(a[0] * b[0] - np.dot(a[1:], b[1:]))
    raise ValueError(metric)


DENSE_METRICS = [
    DistanceType.L1,
    DistanceType.L2,
    DistanceType.COSINE,
    DistanceType.ANGLE,
]
NORMALIZED_METRICS = [
    DistanceType.NORMALIZED_L2,
    DistanceType.NORMALIZED_COSINE,
    DistanceType.NORMALIZED_ANGLE,
]


@pytest.mark.parametrize("metric", DENSE_METRICS)
def test_pairwise_dense(metric, rng):
    q = rng.normal(size=(7, 64)).astype(np.float32)
    x = rng.normal(size=(23, 64)).astype(np.float32)
    got = np.asarray(D.pairwise(metric, jnp.asarray(q), jnp.asarray(x)))
    want = np.array([[np_ref(metric, a, b) for b in x] for a in q])
    # rtol 1e-3: the ||a||^2+||b||^2-2ab form trades a few ulps for the MXU
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("metric", NORMALIZED_METRICS)
def test_pairwise_normalized(metric, rng):
    q = rng.normal(size=(5, 32)).astype(np.float32)
    x = rng.normal(size=(11, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    got = np.asarray(D.pairwise(metric, jnp.asarray(q), jnp.asarray(x)))
    want = np.array([[np_ref(metric, a, b) for b in x] for a in q])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)


def test_pairwise_poincare(rng):
    q = rng.normal(size=(4, 16)).astype(np.float32) * 0.1
    x = rng.normal(size=(9, 16)).astype(np.float32) * 0.1
    got = np.asarray(
        D.pairwise(DistanceType.POINCARE, jnp.asarray(q), jnp.asarray(x))
    )
    want = np.array([[np_ref(DistanceType.POINCARE, a, b) for b in x] for a in q])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_pairwise_lorentz(rng):
    # points on the hyperboloid: x0 = sqrt(1 + |x|^2)
    def hyp(v):
        return np.concatenate([[np.sqrt(1 + (v**2).sum())], v])

    q = np.stack([hyp(rng.normal(size=15) * 0.3) for _ in range(4)]).astype(
        np.float32
    )
    x = np.stack([hyp(rng.normal(size=15) * 0.3) for _ in range(9)]).astype(
        np.float32
    )
    got = np.asarray(
        D.pairwise(DistanceType.LORENTZ, jnp.asarray(q), jnp.asarray(x))
    )
    want = np.array([[np_ref(DistanceType.LORENTZ, a, b) for b in x] for a in q])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_hamming_jaccard(rng):
    q = rng.integers(0, 256, size=(5, 16), dtype=np.uint8)
    x = rng.integers(0, 256, size=(13, 16), dtype=np.uint8)
    got_h = np.asarray(
        D.pairwise(DistanceType.HAMMING, jnp.asarray(q), jnp.asarray(x))
    )
    got_j = np.asarray(
        D.pairwise(DistanceType.JACCARD, jnp.asarray(q), jnp.asarray(x))
    )
    for i, a in enumerate(q):
        for j, b in enumerate(x):
            ab = np.unpackbits(a).astype(int)
            bb = np.unpackbits(b).astype(int)
            assert got_h[i, j] == (ab ^ bb).sum()
            inter = (ab & bb).sum()
            union = (ab | bb).sum()
            np.testing.assert_allclose(got_j[i, j], 1 - inter / union, rtol=1e-6)


def test_sparse_jaccard():
    q = np.array([[1, 5, 9, -1], [2, 3, -1, -1]], dtype=np.int32)
    x = np.array([[1, 5, 9, -1], [5, 9, 11, 13], [7, 8, -1, -1]], dtype=np.int32)
    got = np.asarray(
        D.pairwise(DistanceType.SPARSE_JACCARD, jnp.asarray(q), jnp.asarray(x))
    )
    np.testing.assert_allclose(got[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(got[0, 1], 1 - 2 / 5, atol=1e-6)
    np.testing.assert_allclose(got[0, 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(got[1, 1], 1.0, atol=1e-6)


@pytest.mark.parametrize("metric", DENSE_METRICS + [DistanceType.NORMALIZED_L2])
def test_gathered_matches_pairwise(metric, rng):
    q = rng.normal(size=(6, 48)).astype(np.float32)
    x = rng.normal(size=(50, 48)).astype(np.float32)
    if metric == DistanceType.NORMALIZED_L2:
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
    ids = rng.integers(0, 50, size=(6, 8))
    got = np.asarray(
        D.gathered(metric, jnp.asarray(q), jnp.asarray(x[ids]))
    )
    full = np.asarray(D.pairwise(metric, jnp.asarray(q), jnp.asarray(x)))
    want = np.take_along_axis(full, ids, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_zero_padding_neutral(rng):
    """Zero feature padding must not change any dense metric."""
    q = rng.normal(size=(3, 40)).astype(np.float32)
    x = rng.normal(size=(10, 40)).astype(np.float32)
    qp = np.zeros((3, 128), np.float32)
    qp[:, :40] = q
    xp = np.zeros((10, 128), np.float32)
    xp[:, :40] = x
    for metric in DENSE_METRICS:
        a = np.asarray(D.pairwise(metric, jnp.asarray(q), jnp.asarray(x)))
        b = np.asarray(D.pairwise(metric, jnp.asarray(qp), jnp.asarray(xp)))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_seed_scores_selection_quality(rng):
    """seed_scores is selection-only and approximate (bf16), but on
    SIFT-scale data (large norms — the hard case for bf16) its top-10
    picks must overlap the exact top-10 almost completely, and every pick
    must rank inside the exact top-20."""
    import jax.numpy as jnp
    from ngt_tpu.ops import distances as D
    from ngt_tpu.properties import DistanceType

    reps = (rng.random(size=(2048, 128)) * 255).astype(np.float32)
    q = (rng.random(size=(64, 128)) * 255).astype(np.float32)
    exact = np.asarray(D.pairwise(DistanceType.L2, jnp.asarray(q), jnp.asarray(reps)))
    approx = np.asarray(
        D.seed_scores(DistanceType.L2, jnp.asarray(q), jnp.asarray(reps))
    )
    ex_top = np.argsort(exact, axis=1, kind="stable")[:, :10]
    ap_top = np.argsort(approx, axis=1, kind="stable")[:, :10]
    ex_rank = np.argsort(np.argsort(exact, axis=1, kind="stable"), axis=1)
    overlaps, worst = [], 0
    for e, a, r in zip(ex_top, ap_top, ex_rank):
        overlaps.append(len(set(e) & set(a)) / 10.0)
        worst = max(worst, int(r[a].max()))
    assert np.mean(overlaps) >= 0.95
    assert worst < 20

    # normalized metric branch: monotone surrogate (-dot) must give the
    # same ordering as the exact cosine distance up to bf16 jitter
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    rn = reps / np.linalg.norm(reps, axis=1, keepdims=True)
    exact_c = np.asarray(
        D.pairwise(DistanceType.NORMALIZED_COSINE, jnp.asarray(qn), jnp.asarray(rn))
    )
    approx_c = np.asarray(
        D.seed_scores(DistanceType.NORMALIZED_COSINE, jnp.asarray(qn), jnp.asarray(rn))
    )
    ex_top = np.argsort(exact_c, axis=1, kind="stable")[:, :10]
    ap_top = np.argsort(approx_c, axis=1, kind="stable")[:, :10]
    mean_overlap = np.mean([len(set(e) & set(a)) / 10.0 for e, a in zip(ex_top, ap_top)])
    assert mean_overlap >= 0.9


def test_seed_scores_angular_unnormalized(rng):
    """Plain Cosine/Angle rows are stored UN-normalized (the store
    normalizes only the Normalized* metrics), so seed selection must rank
    by angle, not raw dot — a huge-norm rep nearly orthogonal to q must
    not outrank an aligned small-norm rep."""
    import jax.numpy as jnp
    from ngt_tpu.ops import distances as D
    from ngt_tpu.properties import DistanceType

    q = rng.normal(size=(16, 32)).astype(np.float32)
    reps = rng.normal(size=(256, 32)).astype(np.float32)
    # wildly varying norms: raw -dot would rank by magnitude
    reps *= rng.uniform(0.05, 50.0, size=(256, 1)).astype(np.float32)
    for metric in (DistanceType.COSINE, DistanceType.ANGLE):
        exact = np.asarray(
            D.pairwise(metric, jnp.asarray(q), jnp.asarray(reps))
        )
        approx = np.asarray(
            D.seed_scores(metric, jnp.asarray(q), jnp.asarray(reps))
        )
        ex_top = np.argsort(exact, axis=1, kind="stable")[:, :10]
        ap_top = np.argsort(approx, axis=1, kind="stable")[:, :10]
        overlap = np.mean(
            [len(set(e) & set(a)) / 10.0 for e, a in zip(ex_top, ap_top)]
        )
        assert overlap >= 0.9, f"{metric}: overlap {overlap}"
        # rep_sq (precomputed squared norms) must give identical scores
        sq = np.asarray(D.sq_norms(jnp.asarray(reps)))
        with_sq = np.asarray(
            D.seed_scores(
                metric, jnp.asarray(q), jnp.asarray(reps),
                rep_sq=jnp.asarray(sq),
            )
        )
        np.testing.assert_allclose(approx, with_sq, rtol=1e-5, atol=1e-5)
