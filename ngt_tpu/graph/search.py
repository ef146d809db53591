"""Batched best-first graph traversal — the hot query path.

TPU-native redesign of ``NeighborhoodGraph::search`` (reference
lib/NGT/Graph.cpp:499-638) and its monomorphized read-only variant
(``searchReadOnlyGraph``, Graph.cpp:396-497).  The reference walks one node
at a time with binary heaps, an exact visited set, and AVX distance calls;
that shape is hostile to a vector machine, so instead:

* B queries traverse simultaneously (one program, no per-query dispatch);
* the unchecked-heap + result-heap pair becomes ONE sorted candidate pool of
  static width W per query.  The pool's first k entries are exactly the
  reference's result heap (the global top-k of scored nodes always survives
  in the top-W), so ``radius`` = k-th pool distance reproduces the
  reference's radius-shrink rule (Graph.cpp:609-616);
* per iteration each live query expands its best unexpanded candidate within
  the exploration radius — the exact pop rule ``top.distance > ε·radius ⇒
  stop`` (Graph.cpp:541-543) becomes the per-query done flag;
* neighbor rows are gathered from the dense adjacency [N, E] and scored with
  one batched distance kernel (the MXU/VPU replaces PrimitiveComparator);
* the visited set (``distanceChecked``, an exact bitset/hash in the
  reference) becomes a per-query bit table indexed by id when the index is
  small enough (exact), else by multiplicative hash (the analogue of
  HashBasedBooleanSet.h:25-109; collisions only skip candidates, never
  corrupt results) — pool-membership tests keep the pool itself duplicate
  free, and discarded candidates can never re-enter because the pool's worst
  distance is monotonically non-increasing.

Instrumentation mirrors the reference's ``visitCount`` /
``distanceComputationCount`` (Common.h:2060-2063, Graph.cpp:592-604).
"""

from __future__ import annotations

import functools
import math

import numpy as np
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ngt_tpu.ops import distances as D
from ngt_tpu.properties import DistanceType

_F32 = jnp.float32
_I32 = jnp.int32


def wrap_hash_bits(capacity: int, override: int = 0) -> tuple[int, bool]:
    """Visited-bitmap sizing, THE single copy (index/build/qgraph all use
    it): exact (identity-indexed) up to 2^20 ids — hash collisions falsely
    mark candidates visited and cap recall (the reference's
    HashBasedBooleanSet avoids this with an overflow set;
    HashBasedBooleanSet.h:25-109). 2^20 bits = 128 KiB per query."""
    if override > 0:
        bits = override
    else:
        bits = max(min(int(math.ceil(math.log2(max(capacity, 2)))), 20), 10)
    return bits, capacity <= (1 << bits)
_U32 = jnp.uint32
# np, NOT jnp: a module-level jnp scalar commits a device buffer at import,
# which initializes the XLA backend and breaks jax.distributed.initialize
# for multi-host programs that import ngt_tpu first
INF = np.float32(np.inf)

#: default exploration coefficient = 1 + ε with ε=0.1
#: (reference NGT_EXPLORATION_COEFFICIENT, defines.h.in:52 via Common.h)
DEFAULT_EPSILON = 0.1


class SearchResult(NamedTuple):
    ids: jax.Array          # [B, k] int32, 0-padded ids are -1
    dists: jax.Array        # [B, k] f32, +inf where empty
    visit_count: jax.Array  # [B] int32 — neighbors looked at
    dist_count: jax.Array   # [B] int32 — distance computations
    iters: jax.Array        # [] int32 — loop iterations executed


def _hash_slots(
    ids: jax.Array, hash_bits: int, exact: bool
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Map ids -> (word, bit1, bit2) into a [2^hash_bits]-bit table.

    Exact regime (id space fits the table): identity indexing, one bit,
    bit2 == bit1 — zero false positives, like the reference's plain bitset.

    Lossy regime (ids > 2^hash_bits, the HashBasedBooleanSet.h:25-109
    analogue): TWO independent bits inside ONE 32-bit word (double-hash
    Bloom, k=2).  The table only ever holds EXPANDED node ids (~15-60 per
    query at eps=0), so with v set entries and m table bits the
    false-visited probability per neighbor test drops from ~v/m
    (single bit) to ~(2v/m)^2 — e.g. at 2M ids / 2^20 bits / v=256:
    2.4e-4 -> 2.4e-7 — for the same memory and the same one-word gather.
    bit2 is forced != bit1 so the rate is genuinely quadratic."""
    u = ids.astype(_U32)
    if exact:
        word = (u >> _U32(5)).astype(_I32)
        bit1 = u & _U32(31)
        return word, bit1, bit1
    h1 = (u * _U32(2654435761)) >> _U32(32 - hash_bits)
    word = (h1 >> _U32(5)).astype(_I32)
    bit1 = h1 & _U32(31)
    h2 = (u * _U32(2246822519)) >> _U32(27)   # top 5 bits -> [0, 32)
    bit2 = (bit1 + _U32(1) + h2 % _U32(31)) & _U32(31)
    return word, bit1, bit2


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "k_radius", "width", "max_iters", "hash_bits",
        "exact_hash", "expand", "scorer", "block_mode",
    ),
)
def graph_search(
    x: jax.Array,            # [N_pad, D_pad] object matrix (or PQ codes)
    nbr: jax.Array,          # [N_pad, E_max] int32 adjacency, -1 padded
    valid: jax.Array,        # [N_pad] bool — live objects
    queries: jax.Array,      # [B, D_pad] prepared queries (or PQ LUTs)
    seed_ids: jax.Array,     # [B, S] int32, -1 padded
    *,
    metric: DistanceType,
    k: int,
    k_radius: int = 0,        # rank that drives the radius-shrink rule;
                              # 0 = k.  Setting k_radius < k returns k
                              # candidates while exploring with the tighter
                              # k_radius radius (the quantized-graph
                              # result-expansion pattern: candidates beyond
                              # k_radius ride along in the pool for free)
    epsilon: float | jax.Array = DEFAULT_EPSILON,
    radius: float | jax.Array = jnp.inf,
    width: int = 64,
    edge_size: int | jax.Array = 0,  # 0 = all stored edges; traced operand —
                                     # applied as a mask, not a slice, so any
                                     # value shares one compiled program (the
                                     # reference's edgeSize limits SIMD work;
                                     # on TPU the hop gather is fixed-width)
    max_iters: int = 0,       # 0 = auto
    hash_bits: int = 16,
    exact_hash: bool = False,
    expand: int = 1,          # candidates expanded per step (static); >1
                              # trades distance computations for ~expand x
                              # fewer sequential loop steps
    x_sqnorm: jax.Array | None = None,
    scorer=None,              # static callable(queries, rows, rows_sq, q_sq)
                              # -> [B, E]; None = metric distance.  Lets the
                              # quantized-graph search drop in a PQ-LUT
                              # scorer while reusing this traversal.
    block_mode: bool = False, # when True, `x` holds PER-NODE NEIGHBOR blocks
                              # [N, E*M]: one contiguous row read per expanded
                              # node scores ALL its neighbors (the reference's
                              # QuantizedNode stream, QuantizedGraph.h:64-115;
                              # random per-neighbor gathers are the TPU
                              # bottleneck at ~1% of HBM bandwidth).  Seed
                              # scoring then uses `seed_x` (flat per-object
                              # rows).
    seed_x: jax.Array | None = None,
) -> SearchResult:
    """One batched k-NN search over a fixed proximity graph."""
    n_pad, e_max = nbr.shape
    b, _ = queries.shape
    e = e_max
    edge_limit = jnp.where(
        jnp.asarray(edge_size, _I32) > 0,
        jnp.asarray(edge_size, _I32),
        jnp.int32(e_max),
    )
    w = max(width, k)
    s = seed_ids.shape[1]
    if max_iters <= 0:
        # exploration length grows with graph size; a capped loop silently
        # flattens the ε→recall curve (every ε returns the same truncated
        # expansion), so scale the bound with log(n)
        import math as _math

        base = max(512, 4 * w + 32 * k)
        scale = max(float(n_pad) / 65536.0, 1.0)
        max_iters = int(base * (1.0 + _math.log2(scale) / 2.0))
    hash_words = (1 << hash_bits) // 32

    eps_coeff = 1.0 + jnp.asarray(epsilon, _F32)          # explorationCoefficient
    radius0 = jnp.broadcast_to(jnp.asarray(radius, _F32), (b,))

    q_sq = jnp.sum(queries.astype(_F32) ** 2, axis=-1)
    if scorer is None:
        def scorer(qs, rows, rows_sq, qsq):
            return D.gathered(metric, qs, rows, xs_sqnorm=rows_sq, q_sqnorm=qsq)

    # ---- seed scoring (reference setupDistances/setupSeeds, Graph.cpp:243-394)
    seed_src = seed_x if block_mode else x
    seed_ok = (seed_ids >= 0) & jnp.take(
        valid, jnp.clip(seed_ids, 0, n_pad - 1), axis=0
    )
    seed_rows = jnp.take(seed_src, jnp.clip(seed_ids, 0, n_pad - 1), axis=0)
    seed_sq = (
        jnp.take(x_sqnorm, jnp.clip(seed_ids, 0, n_pad - 1), axis=0)
        if x_sqnorm is not None
        else None
    )
    seed_d = scorer(queries, seed_rows, seed_sq, q_sq)
    seed_d = jnp.where(seed_ok, seed_d, INF)
    # dedupe seeds within the batch row (duplicate ids would poison the pool)
    srt = jnp.sort(seed_ids, axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), srt[:, 1:] == srt[:, :-1]], axis=1
    )
    # map dup flags back: mark all but first occurrence as inf via a trick —
    # sort (id, dist) pairs, then invalidate repeats, then restore by re-sort
    order = jnp.argsort(seed_ids, axis=1)
    inv_dup = jnp.zeros((b, s), bool).at[
        jnp.arange(b)[:, None], order
    ].set(dup)
    seed_d = jnp.where(inv_dup, INF, seed_d)
    seed_idv = jnp.where(jnp.isinf(seed_d), -1, seed_ids)

    # ---- initial pool: seeds sorted ascending, padded to width W
    if s > w:
        # sort BEFORE truncating so the nearest seeds survive (an arbitrary
        # first-w slice would drop nearer seeds when seed fan-in > width)
        seed_d, seed_idv = jax.lax.sort(
            (seed_d, seed_idv), dimension=1, num_keys=2
        )
    pad = w - s if w > s else 0
    pool_d = jnp.concatenate([seed_d, jnp.full((b, pad), INF)], axis=1)[:, :w]
    pool_i = jnp.concatenate(
        [seed_idv, jnp.full((b, pad), -1, _I32)], axis=1
    )[:, :w]
    pool_d, pool_i = jax.lax.sort((pool_d, pool_i), dimension=1, num_keys=2)
    pool_e = jnp.zeros((b, w), bool)

    visited = jnp.zeros((b, hash_words), _U32)
    done = jnp.logical_not(jnp.any(pool_i >= 0, axis=1))
    rowsel = jnp.arange(b)

    nbr_e = nbr
    edge_cols3 = jax.lax.broadcasted_iota(_I32, (1, 1, e), 2)

    kr = k_radius if 0 < k_radius <= k else k

    def radius_of(pd):
        rk = pd[:, kr - 1] if kr <= w else pd[:, -1]
        return jnp.minimum(rk, radius0)

    def cond(state):
        it, _, _, _, _, done_, _, _ = state
        return jnp.logical_and(it < max_iters, jnp.logical_not(jnp.all(done_)))

    p = max(int(expand), 1)
    pe = p * e

    def body(state):
        it, pool_d, pool_i, pool_e, visited, done_, vc, dc = state

        r = radius_of(pool_d)
        er = r * eps_coeff  # explorationRadius (Graph.cpp:525)

        cand = (~pool_e) & (pool_i >= 0) & (pool_d <= er[:, None])
        has = jnp.any(cand, axis=1)
        new_done = done_ | ~has
        live = ~new_done

        # select the p best unexpanded candidates (p=1 reproduces the
        # reference's one-pop-per-step best-first order exactly; p>1 trades
        # extra distance computations for ~p x fewer sequential steps — the
        # batched-expansion idea of GPU graph searchers)
        if p == 1:
            cur_idx = jnp.argmax(cand, axis=1)[:, None]
        else:
            pos = jax.lax.broadcasted_iota(_I32, (b, w), 1)
            score = jnp.where(cand, pos, jnp.int32(w + 1))
            _, cur_idx = jax.lax.top_k(-score, p)             # [B, p]
        sel_ok = jnp.take_along_axis(cand, cur_idx, axis=1) & live[:, None]
        cur_id = jnp.take_along_axis(pool_i, cur_idx, axis=1)  # [B, p]
        cur_id_safe = jnp.clip(cur_id, 0, n_pad - 1)

        # mark expanded (pop from unchecked) + visited bitmap
        word, bit1, bit2 = _hash_slots(cur_id_safe, hash_bits, exact_hash)
        setmask = (_U32(1) << bit1) | (_U32(1) << bit2)
        for j in range(p):
            pool_e = pool_e.at[rowsel, cur_idx[:, j]].set(
                pool_e[rowsel, cur_idx[:, j]] | sel_ok[:, j]
            )
            oldw = visited[rowsel, word[:, j]]
            visited = visited.at[rowsel, word[:, j]].set(
                jnp.where(sel_ok[:, j], oldw | setmask[:, j], oldw)
            )

        # gather neighbors of the expanded nodes (first edge_limit edges
        # only, the reference's edgeSize policy; Graph.h:675-692)
        nb = jnp.take(nbr_e, cur_id_safe, axis=0)             # [B, p, e]
        nb = jnp.where(edge_cols3 < edge_limit, nb, -1)
        nb = nb.reshape(b, pe)
        blk_ok = jnp.repeat(sel_ok, e, axis=1)                # [B, p*e]
        nb_ok = (nb >= 0) & blk_ok
        nb_safe = jnp.clip(nb, 0, n_pad - 1)
        nb_ok &= jnp.take(valid, nb_safe, axis=0)

        # visited test (distanceChecked, Graph.cpp:597): BOTH bits must be
        # set (in the exact regime bit2 == bit1, so this is the plain test)
        wn, nb1, nb2 = _hash_slots(nb_safe, hash_bits, exact_hash)
        wv = jnp.take_along_axis(visited, wn, axis=1)
        seen = (wv >> nb1) & (wv >> nb2) & _U32(1)
        nb_ok &= seen == 0
        # pool-membership test (keeps pool duplicate-free; unexpanded pool
        # entries are exactly the reference's unchecked set)
        inpool = jnp.any(nb[:, :, None] == pool_i[:, None, :], axis=2)
        nb_ok &= ~inpool
        if p > 1:
            # neighbors of different expanded nodes may overlap — dedupe
            # within the candidate set (same sort trick as seed dedup)
            dd = jnp.where(nb_ok, nb, -1)
            srt2 = jnp.sort(dd, axis=1)
            dup2 = jnp.concatenate(
                [jnp.zeros((b, 1), bool),
                 (srt2[:, 1:] == srt2[:, :-1]) & (srt2[:, 1:] >= 0)], axis=1
            )
            order2 = jnp.argsort(dd, axis=1)
            inv2 = jnp.zeros((b, pe), bool).at[
                rowsel[:, None], order2
            ].set(dup2)
            nb_ok &= ~inv2

        vc = vc + jnp.sum((nb >= 0) & blk_ok, axis=1, dtype=_I32)
        dc = dc + jnp.sum(nb_ok, axis=1, dtype=_I32)

        if block_mode:
            # ONE contiguous block row per expanded node scores all its
            # neighbors at once (order matches the adjacency row)
            blocks = jnp.take(x, cur_id_safe, axis=0)         # [B, p, E*M]
            rows = blocks.reshape(b, p, e, -1).reshape(b, pe, -1)
            rsq = None
        else:
            rows = jnp.take(x, nb_safe, axis=0)               # [B, pe, D]
            rsq = (
                jnp.take(x_sqnorm, nb_safe, axis=0)
                if x_sqnorm is not None
                else None
            )
        nd = scorer(queries, rows, rsq, q_sq)
        # admission: push to unchecked iff dist <= explorationRadius
        # (Graph.cpp:605-607); anything farther can never become a result
        nd = jnp.where(nb_ok & (nd <= er[:, None]), nd, INF)
        ni = jnp.where(jnp.isinf(nd), -1, nb)

        md = jnp.concatenate([pool_d, nd], axis=1)
        mi = jnp.concatenate([pool_i, ni], axis=1)
        me = jnp.concatenate([pool_e, jnp.zeros((b, pe), bool)], axis=1)
        md, mi, me = jax.lax.sort((md, mi, me), dimension=1, num_keys=2)
        pool_d, pool_i, pool_e = md[:, :w], mi[:, :w], me[:, :w]

        # Evict expanded entries ranked beyond k: they are neither results
        # (the pool's top-k only ever improves, so a sub-top-k expanded entry
        # can never re-enter it) nor frontier (already expanded).  This keeps
        # the fixed-width pool behaving like the reference's unbounded
        # unchecked queue: k result slots + (W-k) live frontier slots.
        rank = jax.lax.broadcasted_iota(_I32, (b, w), 1)
        evict = pool_e & (rank >= k)
        pool_d = jnp.where(evict, INF, pool_d)
        pool_i = jnp.where(evict, -1, pool_i)
        pool_e = pool_e & ~evict

        return (it + 1, pool_d, pool_i, pool_e, visited, new_done, vc, dc)

    state = (
        jnp.int32(0), pool_d, pool_i, pool_e, visited, done,
        jnp.zeros((b,), _I32), jnp.zeros((b,), _I32),
    )
    it, pool_d, pool_i, pool_e, visited, done, vc, dc = jax.lax.while_loop(
        cond, body, state
    )

    out_d = pool_d[:, :k]
    out_i = pool_i[:, :k]
    keep = out_d <= radius0[:, None]
    out_i = jnp.where(keep, out_i, -1)
    out_d = jnp.where(keep, out_d, INF)
    return SearchResult(out_i, out_d, vc, dc, it)


def _seeded_search(
    x, nbr, valid, sqnorm, rep_rows, rep_sq, rep_ids, queries, epsilon,
    radius, edge_size, *, metric, k, s, width, max_iters, hash_bits,
    exact_hash, expand=1,
):
    """Seed scoring (one matmul over representative rows) + graph search as
    a single device program — one dispatch per query batch."""
    # seed_scores + approx_max_k: selection-only scores, one bf16 MXU pass
    # and a PartialReduce pick (exact top_k over [B, reps] costs ~60 ms at
    # the rep counts a 1M index uses — ~25% of an eps=0 batch); the chosen
    # seed ids are re-scored exactly inside graph_search
    sd = D.seed_scores(metric, queries, rep_rows, rep_sq=rep_sq)
    _, si = jax.lax.approx_max_k(-sd, min(s, rep_rows.shape[0]))
    seeds = jnp.take(rep_ids, si, axis=0)
    return graph_search(
        x, nbr, valid, queries, seeds,
        metric=metric, k=k, epsilon=epsilon, radius=radius, width=width,
        edge_size=edge_size, max_iters=max_iters, hash_bits=hash_bits,
        exact_hash=exact_hash, expand=expand, x_sqnorm=sqnorm,
    )


seeded_search = jax.jit(
    _seeded_search,
    static_argnames=(
        "metric", "k", "s", "width", "max_iters", "hash_bits",
        "exact_hash", "expand",
    ),
)
