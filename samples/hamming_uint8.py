"""Hamming/uint8 sample (reference samples/hamming-uint8): vectors are raw
bit patterns stored as uint8."""

import numpy as np

import ngt_tpu


def main():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=(2000, 32), dtype=np.uint8)
    index = ngt_tpu.create(
        None, dimension=32, distance_type="Hamming", object_type="Byte"
    )
    index.batch_insert(data, build=True)
    q = data[5].astype(np.float32)
    for oid, dist in index.search(q, size=3, epsilon=0.2):
        print(f"id={oid}\thamming={int(dist)}")


if __name__ == "__main__":
    main()
