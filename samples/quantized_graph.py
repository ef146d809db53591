"""Quantized-graph (NGTQG analogue) sample: build, quantize, search with
result expansion (reference bin/ngtqg workflow)."""

import numpy as np

import ngt_tpu
from ngt_tpu.quant.qgraph import QuantizedGraphIndex


def main():
    rng = np.random.default_rng(4)
    data = rng.normal(size=(8000, 128)).astype(np.float32) * 20 + 100
    index = ngt_tpu.create(None, dimension=128)
    index.batch_insert(data, build=True)

    qg = QuantizedGraphIndex.quantize(index, dsub=2, ksub=16)
    q = data[11] + 0.5
    for oid, dist in qg.search(q, size=5, epsilon=0.02, result_expansion=3.0):
        print(f"id={oid}\tdistance={dist:.4f}")


if __name__ == "__main__":
    main()
