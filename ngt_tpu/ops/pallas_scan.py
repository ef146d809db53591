"""Fused bulk-scan candidate kernel (Pallas/TPU).

The bulk exact-KNN build scan (ops/bruteforce.py fast_knn_l2_bulk — the TPU
analogue of the reference's parallel insertion scan, GraphIndex.h:358-410)
was HBM-bound, not MXU-bound: XLA materializes every [B, block] score tile
to HBM (matmul write + approx_max_k read-back), ~4 TB of traffic for a 1M x
1M scan whose matmul work is only ~260 TFLOP.  This kernel fuses the two:
the score tile lives in VMEM only, and each WINDOW of `window` consecutive
corpus rows is reduced in-register to its single best candidate per query
(min score + argmin index).  Per query the whole corpus collapses to
N/window candidates — a ~2*window reduction in HBM traffic — which the
caller then narrows with approx_max_k and re-ranks exactly in f32.

Layout notes (Mosaic tiling): the score tile is computed TRANSPOSED,
[chunk, qsub] = x_chunk @ q^T, so that
  * the window split is a sublane-dimension reshape
    ([chunk, qsub] -> [wins, window, qsub], last dim untouched), and
  * the window reduce is over the cheap sublane axis (axis=1), and
  * output blocks are [wins_per_chunk, qsub] = (16, 256) — legal tiles.
Outputs are therefore [nwin, B]; the caller transposes (tiny arrays).

Selection scores are ss - 2*q.x (centered): ranking-equivalent to the
squared L2 distance (the per-query ||q||^2 term is constant per row and
cancels in per-row selection).  Invalid/padded corpus rows are masked by
setting their ss to BIG before the call.

Window loss: a true top-k neighbor is dropped only when TWO true top-k
neighbors land in the same `window`-row span — probability ~C(k,2)*w/N
(~0.1% at k=20, w=128, N=1M), the same order as the approx_max_k selector
the XLA path already uses, and far below the candidate over-provision.

Measured (v5 lite, tunneled, 4096 queries x 1M x 128 bf16): 30-35 ms
per call = 30-37 TFLOPs — AT the device's square-matmul XLA rate (31
TFLOPs, itself the achievable ceiling on this shared chip) and 3.5x the
XLA-fused matmul+window-min equivalent (129 ms), which round-trips every
score tile through HBM.  Layout (NT vs NN vs TN), int8 vs bf16, and the
reduce flavor (argmin / min-only / packed-key) all measured within 10%:
the kernel is MXU-issue-bound at K=128, so only fusion — not kernel
micro-tuning — pays.  chunk=8192/qsub=512 was the best measured config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# np, NOT jnp: a module-level jnp scalar commits a device buffer at import,
# which initializes the XLA backend and breaks jax.distributed.initialize
BIG = np.float32(1e30)


def _kernel(q_ref, x_ref, ss_ref, od_ref, oi_ref, *, window: int):
    """One (data-chunk, query-subtile) grid step.

    q_ref  [QS, D]          bf16  query subtile (centered)
    x_ref  [C, D]           bf16  corpus chunk (centered; resident over QS)
    ss_ref [1, C/W, W]      f32   centered sqnorms (BIG for invalid rows)
    od_ref [C/W, QS]        f32   window-min scores (transposed)
    oi_ref [C/W, QS]        i32   global corpus index of each window min
    """
    j = pl.program_id(0)
    qs = q_ref.shape[0]
    c = x_ref.shape[0]
    wins = c // window
    dot_t = jax.lax.dot_general(
        x_ref[:], q_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                # [C, QS]
    d3 = dot_t.reshape(wins, window, qs)
    sc = ss_ref[0][:, :, None] - 2.0 * d3            # [wins, window, QS]
    wd = jnp.min(sc, axis=1)                         # [wins, QS]
    wi = jnp.argmin(sc, axis=1).astype(jnp.int32)    # offset in window
    base = (
        j * c
        + jax.lax.broadcasted_iota(jnp.int32, (wins, qs), 0) * window
    )
    od_ref[:] = wd
    oi_ref[:] = wi + base


@functools.partial(
    jax.jit, static_argnames=("window", "chunk", "qsub", "interpret")
)
def fused_scan_candidates(
    q: jax.Array,    # [B, D] bf16 — centered queries (B % qsub == 0)
    x: jax.Array,    # [N_pad, D] bf16 — centered corpus (N_pad % chunk == 0)
    ss: jax.Array,   # [N_pad] f32 — centered sqnorms, BIG where invalid
    *,
    window: int = 128,
    chunk: int = 8192,
    qsub: int = 512,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Window-min candidates of every query against the whole corpus.

    Returns (scores [B, N_pad/window] f32, ids [B, N_pad/window] i32)
    where scores are ss - 2*q.x (monotone in L2^2 per row).
    """
    b, d = q.shape
    n = x.shape[0]
    assert n % chunk == 0 and chunk % window == 0 and b % qsub == 0
    n_chunks = n // chunk
    n_qsub = b // qsub
    wins_per_chunk = chunk // window
    nwin = n // window
    ss3 = ss.reshape(n_chunks, wins_per_chunk, window)

    grid = (n_chunks, n_qsub)  # chunk outer -> x block resident over queries
    out = pl.pallas_call(
        functools.partial(_kernel, window=window),
        grid=grid,
        in_specs=[
            pl.BlockSpec((qsub, d), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, d), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, wins_per_chunk, window), lambda j, i: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((wins_per_chunk, qsub), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((wins_per_chunk, qsub), lambda j, i: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nwin, b), jnp.float32),
            jax.ShapeDtypeStruct((nwin, b), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=(b * d * 2) * n_chunks + n * d * 2 + b * nwin * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q, x, ss3)
    return out[0].T, out[1].T
