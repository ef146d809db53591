"""ngt_tpu — a TPU-native approximate-nearest-neighbor index & query engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of NGT
("Neighborhood Graph and Tree", reference: /root/reference, Apache-2.0):
an incremental proximity-graph index (ANNG/ONNG) with quantized variants
(IVF+PQ and a quantized-graph search), re-architected for TPU:

* vectors live in one dense HBM matrix (not per-object heap allocations),
* distance kernels are batched matmuls/reductions on the MXU/VPU
  (not AVX intrinsics; cf. reference lib/NGT/PrimitiveComparator.h),
* best-first graph traversal is a batched, fixed-width beam search inside
  ``lax.while_loop`` (cf. reference lib/NGT/Graph.cpp:499-638),
* seeding uses a coarse-centroid matmul scorer instead of a pointer
  VP-tree (cf. reference lib/NGT/Tree.cpp),
* multi-chip scale-out shards objects over a ``jax.sharding.Mesh`` with
  all-gather top-k merge (the reference delegates this to external
  servers; README.md:30).

Public API mirrors the reference's ``ngtpy`` module (python/src/ngtpy.cpp).
"""

from ngt_tpu.properties import (  # noqa: F401
    DistanceType,
    ObjectType,
    IndexType,
    GraphType,
    SeedType,
    Property,
)
from ngt_tpu.index import Index, create, open_index  # noqa: F401
from ngt_tpu.utils import enable_log, disable_log  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # lazy: the distributed layer pulls in jax.sharding machinery that
    # single-chip users never need at import time
    if name == "ShardedIndex":
        from ngt_tpu.parallel.sharding import ShardedIndex

        return ShardedIndex
    if name == "IVFPQIndex":
        from ngt_tpu.quant.ivfpq import IVFPQIndex

        return IVFPQIndex
    if name == "QuantizedGraphIndex":
        from ngt_tpu.quant.qgraph import QuantizedGraphIndex

        return QuantizedGraphIndex
    raise AttributeError(f"module 'ngt_tpu' has no attribute {name!r}")
