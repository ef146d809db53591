"""Radius (range) search sample (reference samples/l2-uint8-range-search):
search with both a radius bound and epsilon."""

import numpy as np

import ngt_tpu


def main():
    rng = np.random.default_rng(3)
    data = rng.normal(size=(3000, 16)).astype(np.float32)
    index = ngt_tpu.create(None, dimension=16)
    index.batch_insert(data, build=True)

    q = data[100] + 0.01
    radius = 1.0
    results = index.search(q, size=50, epsilon=0.2, radius=radius)
    print(f"{len(results)} objects within radius {radius}:")
    for oid, dist in results:
        print(f"id={oid}\tdistance={dist:.4f}")
        assert dist <= radius


if __name__ == "__main__":
    main()
