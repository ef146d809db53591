"""End-to-end hyperbolic-metric coverage: full Index build/search/persist
on Poincaré-ball and Lorentz-hyperboloid corpora.

The reference bundles 5k fixtures + generators for both metrics
(data/poincare-input-5k.tsv, data/lorentz-input-5k.tsv,
data/*_input_generator.py) exercising PrimitiveComparator.h:596-637; the
distance kernels are unit-tested in test_distances.py — these tests pin the
metric-specific paths through build/seeds/search (e.g. _wants_sqnorm
includes POINCARE, graph/build.py:227) against exact ground truth.
Fixtures are generated, not copied: hierarchy-like clusters mirroring the
generators' "points near the boundary = leaves" shape.
"""

import numpy as np
import pytest

import ngt_tpu
from ngt_tpu.ops.bruteforce import recall_at_k


def _poincare_corpus(rng, n, d):
    """Clustered points in the open unit ball: cluster centers at radius
    ~0.5, members jittered toward the boundary (hyperbolic volume
    concentrates there — the same shape poincare_input_generator.py
    produces via its radius distribution)."""
    k = 16
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True) * 2.0
    pick = rng.integers(0, k, size=n)
    x = centers[pick] + rng.normal(size=(n, d)) * 0.08
    norm = np.linalg.norm(x, axis=1, keepdims=True)
    # clamp into the ball at radius <= 0.85 (the comparator needs |x| < 1)
    x = np.where(norm > 0.85, x * (0.85 / norm), x)
    return x.astype(np.float32)


def _lorentz_corpus(rng, n, d):
    """Points on the hyperboloid x0 = sqrt(1 + |x|^2) (the lorentz
    generator's parameterization; coordinate 0 is the timelike one,
    PrimitiveComparator.h:621-637)."""
    k = 16
    centers = rng.normal(size=(k, d - 1)) * 0.6
    pick = rng.integers(0, k, size=n)
    sp = centers[pick] + rng.normal(size=(n, d - 1)) * 0.15
    x0 = np.sqrt(1.0 + (sp**2).sum(axis=1, keepdims=True))
    return np.concatenate([x0, sp], axis=1).astype(np.float32)


@pytest.mark.parametrize("metric", ["Poincare", "Lorentz"])
def test_hyperbolic_index_end_to_end(rng, metric, tmp_path):
    d = 16
    n = 1500
    if metric == "Poincare":
        data = _poincare_corpus(rng, n, d)
    else:
        data = _lorentz_corpus(rng, n, d)
    queries = data[rng.choice(n, 32, replace=False)]

    idx = ngt_tpu.create(
        str(tmp_path / "hyp"), dimension=d, distance_type=metric
    )
    idx.batch_insert(data, build=True)
    assert idx.verify() == []

    gt_ids, gt_d = idx.batch_linear_search(queries, size=10)
    ids, dists = idx.batch_search(queries, size=10, epsilon=0.15)
    rec = recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10)
    assert rec >= 0.9, f"{metric} recall@10 {rec}"
    # self-query: the query row itself comes back at distance ~0
    # (acosh(1+eps) ~ sqrt(2*eps) amplifies f32 rounding to ~1e-3)
    assert np.asarray(dists)[:, 0].max() < 5e-3

    # distances agree with the exact kernel (the traversal must score with
    # the true metric, not a surrogate)
    np.testing.assert_allclose(
        np.asarray(dists)[:, 0], np.asarray(gt_d)[:, 0], atol=5e-3
    )

    # persistence round-trip keeps the metric + results
    idx.save()
    re = ngt_tpu.open_index(str(tmp_path / "hyp"))
    assert re.prop.distance_type == idx.prop.distance_type
    ids2, _ = re.batch_search(queries, size=10, epsilon=0.15)
    rec2 = recall_at_k(np.asarray(ids2), np.asarray(gt_ids), 10)
    assert rec2 >= 0.9


def test_poincare_incremental_insert_and_remove(rng):
    """Mutation paths under a hyperbolic metric: incremental append keeps
    the graph searchable; removed ids never come back."""
    d = 12
    data = _poincare_corpus(rng, 900, d)
    idx = ngt_tpu.create(None, dimension=d, distance_type="Poincare")
    idx.batch_insert(data[:800], build=True)
    idx.batch_insert(data[800:], build=True)
    q = data[850]
    r = idx.search(q, size=5)
    assert r[0][1] < 1e-5  # finds itself
    victim = r[0][0]
    idx.remove(victim)
    r2 = idx.search(q, size=5)
    assert all(oid != victim for oid, _ in r2)
