"""Sparse-Jaccard sample (reference samples/jaccard-sparse): objects are
feature-id sets packed with make_sparse_object (Index.cpp:303-320)."""

import numpy as np

import ngt_tpu
from ngt_tpu.store import pad_sparse


def main():
    rng = np.random.default_rng(5)
    # each object: 5-15 feature ids out of a 10k vocabulary
    sets = [
        sorted(rng.choice(10000, size=rng.integers(5, 16), replace=False))
        for _ in range(3000)
    ]
    index = ngt_tpu.create(
        None, dimension=16, distance_type="Sparse Jaccard"
    )
    index.batch_insert(pad_sparse(sets, 16), build=True)

    query = index.make_sparse_object(sets[123])
    for oid, dist in index.search(query, size=5, epsilon=0.3):
        print(f"id={oid}\tjaccard distance={dist:.4f}")


if __name__ == "__main__":
    main()
