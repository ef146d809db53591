"""Distributed (mesh-sharded) index sample — the vald deployment pattern
(objects sharded across agents, per-shard graphs, top-k merge; reference
README.md:30,97) as ONE SPMD program over a jax device mesh.

Runs anywhere: on a multi-chip TPU slice the mesh spans real chips (ICI
collectives); on CPU this script forces 8 virtual devices so the same
program is testable on a laptop.  On a multi-HOST deployment, call
``ngt_tpu.parallel.multihost.initialize()`` first and replace ``make_mesh``
with ``multihost.make_global_mesh()`` — everything else is unchanged.

Run:  python samples/sharded_search.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force a CPU mesh with 8 virtual devices when no multi-chip platform is
# configured (must happen before any jax computation)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

import ngt_tpu  # noqa: E402  (path setup above)
from ngt_tpu.parallel import multihost
from ngt_tpu.parallel.sharding import ShardedIndex
from ngt_tpu.ops.bruteforce import recall_at_k


def main():
    rng = np.random.default_rng(0)
    n, dim = 8000, 64
    data = rng.normal(size=(n, dim)).astype(np.float32)
    queries = data[rng.choice(n, 256, replace=False)] + rng.normal(
        size=(256, dim)
    ).astype(np.float32) * 0.05

    multihost.initialize()  # no-op single-process; DCN bootstrap otherwise
    mesh = multihost.make_global_mesh()
    print(f"mesh: {mesh.devices.size} devices over "
          f"{jax.process_count()} process(es)")

    idx = ShardedIndex.build(data, mesh=mesh, edge_size_for_creation=12)
    ids, dists = idx.batch_search(queries, size=10, epsilon=0.1)

    # exact ground truth for recall
    d = ((queries[:, None, :] - data[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(d, axis=1)[:, :10]
    rec = recall_at_k(ids, gt, 10)
    print(f"sharded recall@10 = {rec:.4f} over {mesh.devices.size} shards")
    assert rec > 0.9
    print("OK")


if __name__ == "__main__":
    main()
