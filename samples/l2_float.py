"""L2/float end-to-end sample — the analogue of the reference's
samples/l2-uint8/l2-uint8.cpp flow (create -> append -> build -> search)."""

import numpy as np

import ngt_tpu


def main():
    rng = np.random.default_rng(0)
    dim = 128
    data = rng.normal(size=(10000, dim)).astype(np.float32)

    index = ngt_tpu.create("/tmp/ngt_tpu_sample_l2", dimension=dim,
                           distance_type="L2")
    index.batch_insert(data, build=True)
    index.save()

    query = data[42] + 0.05
    for oid, dist in index.search(query, size=5, epsilon=0.1):
        print(f"id={oid}\tdistance={dist:.4f}")


if __name__ == "__main__":
    main()
