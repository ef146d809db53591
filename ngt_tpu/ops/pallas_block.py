"""Pallas TPU kernel for the block-mode hop: fused block-row DMA + scoring.

The quantized-graph hop reads ONE contiguous code block per expanded node
(`[E, D]` int8) and scores all E neighbors against the query.  XLA expresses
this as take + convert + subtract + reduce with an HBM round-trip for the
gathered blocks; this kernel keeps each block in VMEM: the row DMA from HBM
is issued per query with the rows double-buffered against compute, and the
squared-L2 reduction happens in registers.

Restricted to the sq8 layout (int8 codes, D a multiple of 128 lanes); the
caller falls back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 8  # queries per program


def _kernel(ids_ref, q_ref, blocks_ref, out_ref, scratch, sems, *, e, d):
    g = pl.program_id(0)

    # start all TB block DMAs up front (independent; overlaps with compute).
    # blocks is [N, E, D] so the row slice keeps (E, D) as the tiled plane.
    for j in range(_TB):
        row = ids_ref[g * _TB + j]
        pltpu.make_async_copy(
            blocks_ref.at[row], scratch.at[j], sems.at[j]
        ).start()

    for j in range(_TB):
        pltpu.make_async_copy(
            blocks_ref.at[ids_ref[g * _TB + j]], scratch.at[j], sems.at[j]
        ).wait()
        codes = scratch[j].astype(jnp.float32)            # [E, D]
        q = q_ref[j, :]  # [d]
        diff = codes - q[None, :]
        out_ref[j, :] = jnp.sum(diff * diff, axis=1)


@functools.partial(jax.jit, static_argnames=("e", "interpret"))
def block_sq8_scores(
    blocks: jax.Array,   # [N, E, D] int8 (HBM)
    cur_ids: jax.Array,  # [B] int32 (padded to a multiple of 8)
    queries: jax.Array,  # [B, D] f32 (scaled by 1/sq_scale)
    *,
    e: int,
    interpret: bool = False,
) -> jax.Array:
    """Squared scaled-L2 scores [B, E] of each query against the neighbors
    encoded in its expanded node's block row."""
    b, d = queries.shape
    assert b % _TB == 0, "batch must be a multiple of 8"
    assert blocks.ndim == 3 and blocks.shape[1] == e
    grid = (b // _TB,)

    kern = functools.partial(_kernel, e=e, d=d)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_TB, d), lambda g, ids: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((_TB, e), lambda g, ids: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_TB, e, d), jnp.int8),
                pltpu.SemaphoreType.DMA((_TB,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, e), jnp.float32),
        interpret=interpret,
    )(cur_ids, queries, blocks)
