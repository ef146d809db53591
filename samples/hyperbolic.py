"""Hyperbolic-metric sample: Poincaré-ball and Lorentz-hyperboloid search.

The reference ships 5k fixtures + generators for both metrics
(data/poincare-input-5k.tsv, data/lorentz-input-5k.tsv) over
PrimitiveComparator.h:596-637.  Hyperbolic embeddings encode hierarchies:
points near the ball boundary are leaves, points near the origin are
roots — nearest-neighbor search in this geometry retrieves tree-relatives.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import ngt_tpu


def poincare_points(rng, n, d):
    """Clustered points in the open unit ball (|x| < 1)."""
    centers = rng.normal(size=(16, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True) * 2.0
    x = centers[rng.integers(0, 16, size=n)] + rng.normal(size=(n, d)) * 0.08
    norm = np.linalg.norm(x, axis=1, keepdims=True)
    return np.where(norm > 0.85, x * (0.85 / norm), x).astype(np.float32)


def lorentz_points(rng, n, d):
    """Points on the hyperboloid x0 = sqrt(1 + |x_space|^2)."""
    sp = rng.normal(size=(n, d - 1)) * 0.5
    x0 = np.sqrt(1.0 + (sp**2).sum(axis=1, keepdims=True))
    return np.concatenate([x0, sp], axis=1).astype(np.float32)


def main():
    rng = np.random.default_rng(3)
    for metric, maker in (("Poincare", poincare_points),
                          ("Lorentz", lorentz_points)):
        d = 16
        data = maker(rng, 5000, d)
        index = ngt_tpu.create(None, dimension=d, distance_type=metric)
        index.batch_insert(data, build=True)
        q = data[123]
        print(f"-- {metric}")
        for oid, dist in index.search(q, size=3, epsilon=0.1):
            print(f"id={oid}\t{metric} distance={dist:.6f}")


if __name__ == "__main__":
    main()
