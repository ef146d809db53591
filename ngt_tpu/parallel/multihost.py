"""Multi-host (multi-process) bootstrap for the sharded index.

The reference delegates anything beyond one process to external serving
wrappers (ngtd/vald; reference README.md:30,97).  Here multi-host is the
same SPMD program as single-host: once ``jax.distributed`` is initialized,
``jax.devices()`` spans every process, a ``Mesh`` over those devices makes
``shard_map`` + ``all_gather`` ride ICI within a host and DCN between
hosts, and the single-host ``ShardedGraphIndex`` code runs unchanged.

What this module adds on top of ``parallel.sharding``:

* ``initialize()`` — idempotent ``jax.distributed.initialize`` wrapper with
  environment-variable defaults (no-op for single-process runs, so library
  code can call it unconditionally);
* ``make_global_mesh()`` — a 1-D mesh over ALL processes' devices, ordered
  so that consecutive shards live on the same host (collectives do the
  intra-host segment over ICI and cross DCN once per hop, the layout the
  scaling playbook prescribes for bandwidth-light axes — and the top-k
  merge is bandwidth-light: ``[B, k]`` ids+distances per shard);
* ``process_shard_slices()`` — which global shard ids a process owns, for
  loading per-host data without materializing the global corpus anywhere.

Single-host meshes and tests exercise the same code paths (one process
owning every shard); true multi-host runs have not been executed in this
environment (one tunneled chip) — the code is gated accordingly.
"""

from __future__ import annotations

import os

import numpy as np
import jax

from ngt_tpu.parallel.sharding import AXIS, Mesh


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Idempotent ``jax.distributed.initialize``.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > single-process no-op.
    Returns True when a multi-process runtime is (already) active.

    NOTE: probing via ``jax.process_count()`` would itself initialize the
    XLA backend, after which ``jax.distributed.initialize`` refuses to run
    — ``jax.distributed.is_initialized()`` checks without touching it."""
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return False  # single-process run; nothing to do
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "0"))
    pid = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "-1"))
    )
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=nproc or None,
        process_id=pid if pid >= 0 else None,
    )
    return jax.process_count() > 1


def make_global_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over every process's devices, grouped host-major.

    ``jax.devices()`` already orders devices process-major, so a flat mesh
    keeps each host's shard range contiguous: the ``all_gather`` that merges
    per-shard top-k runs its large intra-host segments over ICI and crosses
    DCN once per host boundary."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


def process_shard_slices(mesh: Mesh) -> dict[int, list[int]]:
    """shard id -> owning process map plus this process's shard list.

    Use to load only the local slice of a corpus on each host:
    ``mine = process_shard_slices(mesh)[jax.process_index()]``."""
    owners: dict[int, list[int]] = {}
    for i, d in enumerate(mesh.devices.ravel()):
        owners.setdefault(d.process_index, []).append(i)
    return owners


def local_shard_array(
    mesh: Mesh, global_shape: tuple[int, ...], local_shards: np.ndarray
) -> jax.Array:
    """Assemble a global array sharded over ``AXIS`` from this process's
    local shard data ([n_local_shards, ...]) without gathering globally —
    the multi-host analogue of ``jnp.asarray`` + ``device_put`` used by the
    single-host path (wraps ``jax.make_array_from_single_device_arrays``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(AXIS, *([None] * (len(global_shape) - 1))))
    local_devs = [
        d for d in mesh.devices.ravel()
        if d.process_index == jax.process_index()
    ]
    if len(local_devs) != len(local_shards):
        raise ValueError(
            f"{len(local_shards)} local shards for {len(local_devs)} "
            "local devices"
        )
    per = global_shape[0] // mesh.devices.size
    bufs = [
        jax.device_put(np.asarray(local_shards[i])[:per], d)
        for i, d in enumerate(local_devs)
    ]
    return jax.make_array_from_single_device_arrays(
        global_shape, sharding, bufs
    )
