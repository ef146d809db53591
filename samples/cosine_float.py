"""Cosine/float sample (reference samples/cosine-float)."""

import numpy as np

import ngt_tpu


def main():
    rng = np.random.default_rng(1)
    data = rng.normal(size=(5000, 64)).astype(np.float32)
    index = ngt_tpu.create(None, dimension=64, distance_type="Cosine")
    index.batch_insert(data, build=True)
    q = data[7]
    for oid, dist in index.search(q, size=3, epsilon=0.1):
        print(f"id={oid}\tcosine distance={dist:.6f}")


if __name__ == "__main__":
    main()
