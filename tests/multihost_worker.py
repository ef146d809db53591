"""Worker for the 2-process multi-host smoke test (test_multihost.py).

Each process pins the CPU backend with 4 virtual devices, joins a
jax.distributed rendezvous, and runs a sharded top-k search over the
host-major global mesh: every process holds ONLY its own corpus shards
(parallel.multihost.local_shard_array), the merge is one all_gather.

Run:  python multihost_worker.py <coordinator> <num_procs> <process_id>
      [index_path expected_path]

With the optional args, instead of the inline top-k program the worker
opens a ShardedIndex.save_distributed layout (loading ONLY its own shard
files), searches it over the global mesh, and asserts bit-identical
results to the single-process expectation recorded in expected_path.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from ngt_tpu.parallel import multihost as MH

    ok = MH.initialize(coord, nproc, pid)
    assert ok, "distributed runtime did not come up"
    assert jax.process_count() == nproc, jax.process_count()
    mesh = MH.make_global_mesh()

    if len(sys.argv) > 5:
        _distributed_index(mesh, nproc, pid, sys.argv[4], sys.argv[5])
        return
    n_shards = mesh.devices.size
    assert n_shards == 4 * nproc

    # host-major layout: this process's shard ids are contiguous
    owners = MH.process_shard_slices(mesh)
    mine = owners[jax.process_index()]
    assert mine == sorted(mine) and len(mine) == 4

    # deterministic global corpus; each process materializes ONLY its rows
    n, d, per = 4096, 32, 4096 // n_shards
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((n, d)).astype(np.float32)  # small: test GT
    local = np.stack([corpus[s * per:(s + 1) * per] for s in mine])
    x_global = MH.local_shard_array(mesh, (n, d), local)

    queries = rng.standard_normal((8, d)).astype(np.float32)

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from ngt_tpu.parallel.sharding import AXIS

    k = 10

    def local_topk(xs, q):
        dd = (
            jnp.sum(q * q, axis=1)[:, None]
            - 2.0 * jnp.dot(q, xs.T, precision=jax.lax.Precision.HIGHEST)
            + jnp.sum(xs * xs, axis=1)[None, :]
        )
        neg, idx = jax.lax.top_k(-dd, k)
        me = jax.lax.axis_index(AXIS)
        return (
            jax.lax.all_gather(-neg, AXIS, axis=1, tiled=True),
            jax.lax.all_gather(idx + me * xs.shape[0], AXIS, axis=1,
                               tiled=True),
        )

    fn = jax.jit(
        shard_map(
            local_topk, mesh=mesh,
            in_specs=(P(AXIS, None), P()),
            out_specs=(P(), P()),
            check_rep=False,
        )
    )
    dmerge, imerge = jax.device_get(fn(x_global, jnp.asarray(queries)))
    order = np.argsort(dmerge, axis=1, kind="stable")[:, :k]
    got = np.take_along_axis(imerge, order, axis=1)

    dd = ((queries[:, None, :] - corpus[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(dd, axis=1, kind="stable")[:, :k]
    assert (np.sort(got, axis=1) == np.sort(gt, axis=1)).all(), (
        got[0], gt[0]
    )
    print(f"MULTIHOST_OK pid={pid} procs={jax.process_count()} "
          f"devices={len(jax.devices())}")


def _distributed_index(mesh, nproc, pid, index_path, expected_path) -> None:
    """open_distributed + search, asserted against the single-process run."""
    from ngt_tpu.parallel.sharding import ShardedIndex

    sidx = ShardedIndex.open_distributed(index_path, mesh=mesh)
    exp = np.load(expected_path)
    ids, dists = sidx.batch_search(
        exp["queries"], size=int(exp["size"]), epsilon=float(exp["epsilon"])
    )
    assert (ids == exp["ids"]).all(), (ids[:2], exp["ids"][:2])
    np.testing.assert_allclose(dists, exp["dists"], rtol=1e-5)
    print(f"MULTIHOST_INDEX_OK pid={pid} procs={jax.process_count()} "
          f"devices={len(jax.devices())}")


if __name__ == "__main__":
    main()
