"""ONNG construction: bulk graph rewrites + shortcut (path) reduction.

TPU redesign of ``GraphReconstructor`` (reference
lib/NGT/GraphReconstructor.h).  The reference mutates per-node vectors with
OpenMP loops; here every pass is a whole-graph array operation:

* ``convert_to_anng`` — add all reverse edges, sort, dedupe
  (reference :389-423);
* ``reconstruct_graph`` — keep the best ``out_edges`` per row (rows with
  fewer edges keep what they have), add the reverses of each row's first
  ``in_edges`` ORIGINAL edges, then sort + dedupe; marks the result ONNG
  (reference :425-561);
* ``adjust_paths`` — shortcut reduction (reference
  ``adjustPathsEffectively`` :197-386): an edge u->w is removable when some
  earlier neighbor v of u has w in its list with both legs shorter
  (d_uv < d_uw and d_vw < d_uw); candidates are detected for the whole graph
  with one blocked device program, then edges are re-inserted rank-by-rank
  (shortest first) skipping those whose 2-hop path survives.  Deviation from
  the reference: within one rank the keep/drop decisions are made in
  parallel (the reference processes ids serially inside a rank), which can
  keep an edge the reference would drop — never the reverse, so recall can
  only match or improve at slightly higher degree;
* ``refine_anng`` — re-search every object and merge the results as new
  out/in edges (reference :803-924), powered by the batched searcher.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ngt_tpu.graph.storage import GraphStore

INF = np.float32(np.inf)

#: pair count above which _normalize_rows routes to the device sort
#: (host lexsorts dominate the 1-core host past a few million pairs);
#: module-level so tests can force the device path at tiny sizes
DEV_PAIRS_MIN = 1 << 21


# --------------------------------------------------------------------------
# bulk rewrites (host numpy; these are offline passes over int/float arrays)
# --------------------------------------------------------------------------


def _rows_to_lists(nbr: np.ndarray, dist: np.ndarray, deg: np.ndarray):
    n = nbr.shape[0]
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    col = np.concatenate([np.arange(d) for d in deg]) if len(deg) else np.array([], np.int64)
    return src, nbr[src, col], dist[src, col]


@functools.partial(jax.jit, static_argnames=("e_max", "cap", "with_dist"))
def _normalize_rows_dev(s, t, d, *, e_max, cap, with_dist=True):
    """Device _normalize_rows: sort 10s of millions of edge triples in one
    program (three host lexsorts over ~50M pairs took ~190 s of the 1M
    ONNG reconstruct on this one-core host; the device sorts them in
    seconds).  Same semantics: dedupe (src, dst) keeping the shortest,
    rank within row by (dist, dst), scatter into fixed-width rows."""
    pad_row = jnp.int32(cap)
    invalid = (t < 0) | (s < 0) | ~jnp.isfinite(d)
    s = jnp.where(invalid, pad_row, s)
    # sort by (src, dst, dist): first of each (src, dst) run is shortest
    s1, t1, d1 = jax.lax.sort((s, t, d), num_keys=3)
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), (s1[1:] == s1[:-1]) & (t1[1:] == t1[:-1])]
    )
    d1 = jnp.where(dup, jnp.inf, d1)
    s1 = jnp.where(dup, pad_row, s1)
    # rank within row by (dist, dst)
    s2, d2, t2 = jax.lax.sort((s1, d1, t1), num_keys=3)
    l = s2.shape[0]
    idxv = jnp.arange(l, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), s2[1:] != s2[:-1]])
    gstart = jax.lax.cummax(jnp.where(is_start, idxv, 0))
    rank = idxv - gstart
    keep = (rank < e_max) & (s2 < pad_row) & jnp.isfinite(d2)
    row = jnp.where(keep, s2, pad_row)
    col = jnp.where(keep, rank, 0)
    nbr = jnp.full((cap + 1, e_max), -1, jnp.int32)
    nbr = nbr.at[row, col].set(jnp.where(keep, t2, -1))
    nbr = nbr[:cap]
    deg = jnp.sum(nbr >= 0, axis=1).astype(jnp.int32)
    if not with_dist:
        return nbr, deg
    dist = jnp.full((cap + 1, e_max), jnp.inf, jnp.float32)
    dist = dist.at[row, col].set(jnp.where(keep, d2, jnp.inf))
    return nbr, dist[:cap], deg


def _normalize_rows(
    pairs_src: np.ndarray, pairs_dst: np.ndarray, pairs_d: np.ndarray,
    n: int, e_max: int,
    dist_from: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Group (src -> dst, d) pairs into sorted, deduped fixed-width rows —
    the vectorized 'sort + erase duplicates' normalization pass
    (reference GraphReconstructor.h:516-553).  Large pair lists route to
    the device sort (pow2-padded so programs are reused across sizes).

    ``dist_from`` = (nbr, dist, deg) of the SOURCE graph when every pair's
    distance is a copy of a stored edge in one direction or the other (the
    reconstruction family: forward edges + mirrored reverses).  The device
    path then downloads only the id rows and resolves distances host-side
    via the symmetric native lookup — the f32 half of a 1M e_max=136 row
    download is ~0.5 GB / 25-50 s on the contended link."""
    if len(pairs_src) >= DEV_PAIRS_MIN:
        import os as _os
        import sys as _sys
        import time as _t

        from ngt_tpu import native

        prof = _os.environ.get("NGT_TPU_BUILD_PROFILE", "") == "1"
        t0 = _t.time()
        ln = 1 << int(np.ceil(np.log2(len(pairs_src))))
        pad = ln - len(pairs_src)
        s = np.concatenate([pairs_src, np.full(pad, -1, np.int64)])
        t = np.concatenate([pairs_dst, np.full(pad, -1, np.int32)])
        d = np.concatenate([pairs_d, np.full(pad, np.inf, np.float32)])
        sd, td, dd = (
            jnp.asarray(s.astype(np.int32)), jnp.asarray(t),
            jnp.asarray(d.astype(np.float32)),
        )
        if dist_from is not None:
            nbr_d, deg_d = _normalize_rows_dev(
                sd, td, dd, e_max=e_max, cap=n, with_dist=False,
            )
            deg_h = np.asarray(deg_d)
            if prof:
                print(f"# normalize_dev sort={_t.time()-t0:.1f}s "
                      f"(pairs={len(pairs_src)})",
                      file=_sys.stderr, flush=True)
                t0 = _t.time()
            nbr_h = np.asarray(nbr_d)
            dist_h = native.edge_dist_lookup(
                dist_from[0], dist_from[1], dist_from[2],
                nbr_h, deg_h, symmetric=True,
            )
            if prof:
                print(f"# normalize_dev ids_download+lookup="
                      f"{_t.time()-t0:.1f}s", file=_sys.stderr, flush=True)
            return nbr_h, dist_h, deg_h
        nbr_d, dist_d, deg_d = _normalize_rows_dev(
            sd, td, dd, e_max=e_max, cap=n,
        )
        deg_h = np.asarray(deg_d)
        if prof:
            print(f"# normalize_dev sort={_t.time()-t0:.1f}s "
                  f"(pairs={len(pairs_src)})", file=_sys.stderr, flush=True)
            t0 = _t.time()
        out = np.asarray(nbr_d), np.asarray(dist_d), deg_h
        if prof:
            print(f"# normalize_dev download={_t.time()-t0:.1f}s",
                  file=_sys.stderr, flush=True)
        return out
    ok = (pairs_dst >= 0) & (pairs_src >= 0) & np.isfinite(pairs_d)
    if not ok.all():
        pairs_src, pairs_dst, pairs_d = (
            pairs_src[ok], pairs_dst[ok], pairs_d[ok]
        )
    # sort by (src, dist, dst); dedupe by (src, dst) keeping the shortest
    order = np.lexsort((pairs_dst, pairs_d, pairs_src))
    s, t, d = pairs_src[order], pairs_dst[order], pairs_d[order]
    dd_order = np.lexsort((t, s))
    s2, t2 = s[dd_order], t[dd_order]
    first = np.ones(len(s2), bool)
    first[1:] = (s2[1:] != s2[:-1]) | (t2[1:] != t2[:-1])
    keep = np.zeros(len(s), bool)
    keep[dd_order] = first
    s, t, d = s[keep], t[keep], d[keep]
    # re-sort by (src, dist, dst) after dedupe
    order = np.lexsort((t, d, s))
    s, t, d = s[order], t[order], d[order]

    nbr = np.full((n, e_max), -1, np.int32)
    dist = np.full((n, e_max), INF, np.float32)
    if len(s):
        uniq, starts, counts = np.unique(s, return_index=True, return_counts=True)
        slot = np.arange(len(s)) - np.repeat(starts, counts)
        ok = slot < e_max
        nbr[s[ok], slot[ok]] = t[ok]
        dist[s[ok], slot[ok]] = d[ok]
    deg = (nbr >= 0).sum(axis=1).astype(np.int32)
    return nbr, dist, deg


def convert_to_anng(graph: GraphStore, n: int, e_max: int | None = None) -> GraphStore:
    """KNNG -> ANNG: add all reverse edges (reference :389-423)."""
    e_max = e_max or graph.e_max
    src, dst, d = _rows_to_lists(
        graph.nbr_ids[:n], graph.nbr_dist[:n], graph.degree[:n]
    )
    ps = np.concatenate([src, dst.astype(np.int64)])
    pt = np.concatenate([dst, src.astype(np.int32)])
    pd = np.concatenate([d, d])
    nbr, dist, deg = _normalize_rows(
        ps, pt, pd, n, e_max,
        dist_from=(graph.nbr_ids[:n], graph.nbr_dist[:n], graph.degree[:n]),
    )
    out = GraphStore(max_edges=e_max, capacity=max(n, 16))
    out.nbr_ids[:n], out.nbr_dist[:n], out.degree[:n] = nbr, dist, deg
    out._has_node[:n] = graph._has_node[:n]
    return out


def reconstruct_anng_from_anng(
    graph: GraphStore, n: int, edge_size: int, e_max: int | None = None,
) -> GraphStore:
    """Thin an ANNG: per node keep the first ``edge_size`` edges whose
    target id is SMALLER than the node id, added bidirectionally, then
    sort + dedupe (the reference's pseudo-ANNG thinning,
    reconstructANNGFromANNG, GraphReconstructor.h:717-801 — rows are
    distance-ascending so "first" = nearest, and the id<self rule keeps
    exactly one direction of each mutual pair before mirroring)."""
    e_max = e_max or graph.e_max
    nbr = graph.nbr_ids[:n]
    dist = graph.nbr_dist[:n]
    src_col = np.arange(n, dtype=np.int64)[:, None]
    ok = (nbr >= 0) & (nbr < src_col)
    rank = np.cumsum(ok, axis=1) - 1
    keep = ok & (rank < edge_size)
    src = np.repeat(np.arange(n, dtype=np.int64), keep.sum(axis=1))
    dst = nbr[keep]
    dd = dist[keep]
    ps = np.concatenate([src, dst.astype(np.int64)])
    pt = np.concatenate([dst.astype(np.int32), src.astype(np.int32)])
    pd = np.concatenate([dd, dd])
    nbr2, dist2, deg2 = _normalize_rows(
        ps, pt, pd, n, e_max,
        dist_from=(graph.nbr_ids[:n], graph.nbr_dist[:n], graph.degree[:n]),
    )
    out = GraphStore(max_edges=e_max, capacity=max(n, 16))
    out.nbr_ids[:n], out.nbr_dist[:n], out.degree[:n] = nbr2, dist2, deg2
    out._has_node[:n] = graph._has_node[:n]
    return out


def reconstruct_graph(
    graph: GraphStore, n: int, out_edges: int, in_edges: int,
    e_max: int | None = None,
) -> GraphStore:
    """ONNG degree adjustment (reference reconstructGraph, :425-561)."""
    if e_max is None:
        e_max = ((out_edges + in_edges + 7) // 8) * 8
    deg = graph.degree[:n]
    nbr = graph.nbr_ids[:n]
    dist = graph.nbr_dist[:n]
    col = np.arange(nbr.shape[1])[None, :]

    # forward edges: best `out_edges`; rows with fewer keep everything
    fw_keep = col < np.minimum(deg, out_edges)[:, None]
    short = deg < out_edges
    fw_keep[short] = col < deg[short][:, None]
    src_f = np.repeat(np.arange(n, dtype=np.int64), fw_keep.sum(axis=1))
    dst_f = nbr[fw_keep]
    d_f = dist[fw_keep]

    # reverse edges from each row's first `in_edges` ORIGINAL edges
    rv_keep = col < np.minimum(deg, in_edges)[:, None]
    src_r = nbr[rv_keep].astype(np.int64)
    dst_r = np.repeat(np.arange(n, dtype=np.int32), rv_keep.sum(axis=1))
    d_r = dist[rv_keep]

    ps = np.concatenate([src_f, src_r])
    pt = np.concatenate([dst_f.astype(np.int32), dst_r])
    pd = np.concatenate([d_f, d_r])
    nbr2, dist2, deg2 = _normalize_rows(
        ps, pt, pd, n, e_max, dist_from=(nbr, dist, deg),
    )
    out = GraphStore(max_edges=e_max, capacity=max(n, 16))
    out.nbr_ids[:n], out.nbr_dist[:n], out.degree[:n] = nbr2, dist2, deg2
    out._has_node[:n] = graph._has_node[:n]
    return out


def reconstruct_graph_with_constraint(
    graph: GraphStore, n: int, out_edges: int, in_edges: int,
    mode: str = "a", e_max: int | None = None,
) -> GraphStore:
    """Indegree-balanced ONNG variant (reference
    reconstructGraphWithConstraint, GraphReconstructor.h:565-715):

    1. reversed edges are selected processing reverse lists smallest-first,
       capping each target at ``in_edges`` reversed edges and each source
       row at ``out_edges`` (except a target's FIRST edge always lands, so
       no node is orphaned) — the serial selection runs in the native lib;
    2. forward edges then fill each row up to ``out_edges``
       (mode 'a'; mode 'c' always adds the first ``out_edges`` originals);
    3. rows are sorted + deduped.
    """
    from ngt_tpu import native

    if e_max is None:
        e_max = ((out_edges + in_edges + 7) // 8) * 8
    deg = graph.degree[:n]
    nbr = graph.nbr_ids[:n]
    dist = graph.nbr_dist[:n]
    rid, src, rd = native.constrained_reverse(
        nbr, dist, deg, out_edges, in_edges
    )
    outdeg = np.bincount(rid, minlength=n)

    col = np.arange(nbr.shape[1])[None, :]
    if mode == "a":
        room = np.maximum(out_edges - outdeg, 0)
        fw_keep = col < np.minimum(deg, room)[:, None]
    else:  # 'c'
        fw_keep = col < np.minimum(deg, out_edges)[:, None]
    src_f = np.repeat(np.arange(n, dtype=np.int64), fw_keep.sum(axis=1))
    dst_f = nbr[fw_keep]
    d_f = dist[fw_keep]

    ps = np.concatenate([rid.astype(np.int64), src_f])
    pt = np.concatenate([src.astype(np.int32), dst_f.astype(np.int32)])
    pd = np.concatenate([rd, d_f])
    nbr2, dist2, deg2 = _normalize_rows(
        ps, pt, pd, n, e_max, dist_from=(nbr, dist, deg),
    )
    out = GraphStore(max_edges=e_max, capacity=max(n, 16))
    out.nbr_ids[:n], out.nbr_dist[:n], out.degree[:n] = nbr2, dist2, deg2
    out._has_node[:n] = graph._has_node[:n]
    return out


# --------------------------------------------------------------------------
# shortcut reduction (path adjustment)
# --------------------------------------------------------------------------


def _shortcut_hits(nbr_blk, dist_blk, nbr_all, dist_all, e):
    """For a block of rows: mark edges (u, rank_w) having a 2-hop path
    u->v->w with d_uv < d_uw and d_vw < d_uw, v an earlier-or-any neighbor
    of u.  Returns [blk, e, e] bool: axis1 = v rank, axis2 = w rank."""
    v_ids = nbr_blk[:, :e]                              # [blk, e]
    safe_v = jnp.clip(v_ids, 0, nbr_all.shape[0] - 1)
    v_nbrs = jnp.take(nbr_all, safe_v, axis=0)[:, :, :e]   # [blk, e, e] w' ids
    v_dists = jnp.take(dist_all, safe_v, axis=0)[:, :, :e]
    # match w' against u's own neighbor list -> position of w in u's row
    w_ids = nbr_blk[:, :e]                              # [blk, e]
    # [blk, e_v, e_w', e_u]
    eq = v_nbrs[:, :, :, None] == w_ids[:, None, None, :]
    eq &= (v_nbrs >= 0)[:, :, :, None] & (w_ids >= 0)[:, None, None, :]
    d_uv = dist_blk[:, :e]                              # [blk, e_v]
    d_uw = dist_blk[:, :e]                              # [blk, e_u] (=e_w pos)
    cond = (d_uv[:, :, None, None] < d_uw[:, None, None, :]) & (
        v_dists[:, :, :, None] < d_uw[:, None, None, :]
    )
    hit = jnp.any(eq & cond, axis=2)                    # [blk, e_v, e_u]
    # don't count v == w (an edge is not its own shortcut)
    vw_same = v_ids[:, :, None] == w_ids[:, None, :]
    hit &= ~vw_same
    return hit                                          # [blk, v_rank, w_rank]


@functools.partial(jax.jit, static_argnames=("e", "block", "eb"))
def _detect_shortcuts_all(nbr_all, dist_all, *, e, block, eb=None):
    """Whole-graph shortcut detection in ONE device program: lax.scan over
    node tiles, each tile's [block, e, e] hit tensor BIT-PACKED on device
    along the w axis (np.packbits layout: big-endian per byte).  The
    per-block eager version paid one dispatch + an 8x-bigger bool download
    per tile (~205 dispatches / 1.7 GB at 100k, e=130 — phase 1 was 97 s
    of the ONNG pipeline; fused+packed it is one dispatch + e/8 bytes per
    edge).  nbr_all rows must be padded to a multiple of ``block``.
    ``eb`` (multiple of 8, >= e) pads the packed w axis.

    Returns a TUPLE of eb//8 arrays [n, e] uint8 — byte-column k holds w
    ranks 8k..8k+7.  One [n, e, eb//8] tensor crosses 2^31 ELEMENTS at 1M
    nodes x e=136 (2.3e9): TPU kernels address with int32 offsets and a
    dynamic_slice over such a buffer faults the worker (measured: 400k
    fine, 1M = hard crash).  Column buffers stay well under the limit and
    the phase-2 pass consumes exactly one column per 8-rank window."""
    n = nbr_all.shape[0]
    ntiles = n // block
    if eb is None:
        eb = ((e + 7) // 8) * 8
    weights = jnp.array([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)

    def body(_, ti):
        s = ti * block
        nbr_blk = jax.lax.dynamic_slice_in_dim(nbr_all, s, block, axis=0)
        dist_blk = jax.lax.dynamic_slice_in_dim(dist_all, s, block, axis=0)
        hit = _shortcut_hits(nbr_blk, dist_blk, nbr_all, dist_all, e)
        hitp = jnp.pad(hit, ((0, 0), (0, 0), (0, eb - e)))
        packed = jnp.sum(
            hitp.reshape(block, e, eb // 8, 8).astype(jnp.uint8)
            * weights[None, None, None, :],
            axis=3,
        ).astype(jnp.uint8)
        return None, tuple(packed[:, :, k] for k in range(eb // 8))

    _, cols = jax.lax.scan(body, None, jnp.arange(ntiles, dtype=jnp.int32))
    return tuple(c.reshape(ntiles * block, e) for c in cols)


@functools.partial(
    jax.jit, static_argnames=("e", "block", "min_edges", "snap"),
    donate_argnums=(3, 4),
)
def _adjust_phase2_chunk(nbr_e, deg_all, cand_chunk, kept, cnt, r0, *,
                         e, block, min_edges, snap):
    """One snapshot window of device rank-ordered re-insertion — phase 2 of
    path adjustment under the R(C) visibility rule (C = ``snap``, multiple
    of 8; see the native adjust_paths_phase2 docstring).  Driven by a host
    loop over windows (one compiled program, r0 traced; ~e/C dispatches)
    rather than a single fori program so each window reads only ITS
    [n, e, C/8] candidate slice — the full candidate tensor crosses the
    int32 element-addressing limit at 1M nodes (see _detect_shortcuts_all).
    ``kept``/``cnt`` are donated: the carry updates in place across
    windows.

    Per window, lax.scan over node tiles gathers each tile's neighbor rows
    + snapshot-kept rows ONCE ([block, e, e]), then an inner fori over the
    window's ranks decides edges with the tile's own kept state live
    in-registers.  Total compute across windows is n*e^3 byte-compares —
    the same envelope as detection; gather traffic is (e/C)
    detection-equivalents (measured ~2x detection wall at C=8).

      nbr_e [n_pad, e] int32   deg_all [n_pad] int32
      cand_chunk [n_pad, e, snap//8] uint8 (this window's byte columns)
      kept [n_pad, e] bool   cnt [n_pad] int32   r0 = window start rank
    Returns (kept, cnt) with ranks [r0, r0+snap) decided."""
    n = nbr_e.shape[0]
    ntiles = n // block
    p_idx = jnp.arange(e, dtype=jnp.int32)

    def tile_body(_, ti):
        s = ti * block
        nbr_blk = jax.lax.dynamic_slice(nbr_e, (s, 0), (block, e))
        deg_blk = jax.lax.dynamic_slice(deg_all, (s,), (block,))
        kept_blk = jax.lax.dynamic_slice(kept, (s, 0), (block, e))
        cnt_blk = jax.lax.dynamic_slice(cnt, (s,), (block,))
        cbytes = jax.lax.dynamic_slice(
            cand_chunk, (s, 0, 0), (block, e, snap // 8)
        )
        safe_v = jnp.clip(nbr_blk, 0, n - 1)
        v_nbrs = jnp.take(nbr_e, safe_v, axis=0)     # [block, e_v, e_p]
        v_snap = jnp.take(kept, safe_v, axis=0)      # [block, e_v, e_p]

        def micro(j, mc):
            kept_blk, cnt_blk = mc
            r = r0 + j
            w = jax.lax.dynamic_slice(nbr_blk, (0, r), (block, 1))
            eq = v_nbrs == w[:, :, None]             # [block, e_v, e_p]
            # visibility: decided (< r0) via snapshot, in-window (< r)
            # via presence; >= r never
            window = (p_idx >= r0) & (p_idx < r)
            inner = jnp.any(eq & (v_snap | window[None, None, :]), axis=2)
            byte = jax.lax.dynamic_slice(
                cbytes, (0, 0, j // 8), (block, e, 1)
            )[..., 0]
            uv = ((byte >> (7 - (j % 8)).astype(jnp.uint8)) & 1) > 0
            drop = jnp.any(inner & uv & kept_blk, axis=1)
            has_edge = r < deg_blk
            can_drop = cnt_blk + (deg_blk - r) > min_edges
            keep_now = has_edge & ~(drop & can_drop)
            kept_blk = jax.lax.dynamic_update_slice(
                kept_blk, keep_now[:, None], (0, r)
            )
            cnt_blk = cnt_blk + keep_now.astype(jnp.int32)
            return kept_blk, cnt_blk

        hi = jnp.minimum(snap, e - r0)
        kept_blk, cnt_blk = jax.lax.fori_loop(
            0, hi, micro, (kept_blk, cnt_blk)
        )
        return None, (kept_blk, cnt_blk)

    _, (kept_t, cnt_t) = jax.lax.scan(
        tile_body, None, jnp.arange(ntiles, dtype=jnp.int32)
    )
    return kept_t.reshape(n, e), cnt_t.reshape(n)


def _adjust_phase2_device(nbr_e, deg_dev, cand_cols, *, e, block, min_edges,
                          snap):
    """Host driver for the windowed device phase 2: stacks each window's
    candidate byte columns ([n, e, snap//8], < 2^31 elements) and threads
    the donated (kept, cnt) carry through one dispatch per window."""
    n = nbr_e.shape[0]
    kept = jnp.zeros((n, e), jnp.bool_)
    cnt = jnp.zeros((n,), jnp.int32)
    k = snap // 8
    nchunks = (e + snap - 1) // snap
    for ci in range(nchunks):
        cand_chunk = jnp.stack(cand_cols[ci * k : ci * k + k], axis=2)
        kept, cnt = _adjust_phase2_chunk(
            nbr_e, deg_dev, cand_chunk, kept, cnt,
            jnp.int32(ci * snap),
            e=e, block=block, min_edges=min_edges, snap=snap,
        )
    return kept


@functools.partial(jax.jit, static_argnames=("e", "e_max", "cap"))
def _kept_to_rows_dev(nbr_e, kept, *, e, e_max, cap):
    """Compact the kept mask straight into fixed-width id rows on device:
    the phase-2 output never leaves HBM — only the final [cap, e_max]
    adjacency ids come back over the tunnel (distances resolve host-side,
    see adjust_paths).  No sort is needed: input rows are already
    distance-ascending and duplicate-free, and ``kept`` selects a subset in
    rank order, so per-row stable compaction (cumsum ranks + scatter,
    OOB-dropped for invalid/padded entries) reproduces exactly what
    _normalize_rows would produce — a whole-array sort here cost 100 s at
    400k where this is sub-second."""
    valid = kept & (nbr_e >= 0)
    rank = jnp.cumsum(valid.astype(jnp.int32), axis=1) - 1
    n = nbr_e.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (n, e), 0)
    col = jnp.where(valid, rank, e_max + 1)   # invalid -> dropped
    nbr2 = jnp.full((cap, e_max), -1, jnp.int32)
    nbr2 = nbr2.at[row, col].set(nbr_e, mode="drop")
    deg2 = jnp.sum(valid, axis=1).astype(jnp.int32)[:cap]
    return nbr2, deg2


def adjust_paths(
    graph: GraphStore, n: int, min_edges: int = 0, block: int = 512,
    snap: int | None = None,
) -> GraphStore:
    """Shortcut reduction (reference adjustPathsEffectively, :197-386).

    Large graphs run BOTH phases plus row normalization on device under
    the R(C) visibility rule (C = ``snap``; see adjust_paths_phase2 in
    native/src): the packed candidate tensor (2.2 GB at 1M/e=130) and the
    kept mask never cross the tunnel — only the final fixed-width rows come
    back.  Small graphs (and the device-failure fallback) use the host
    replay; when the device path was not engaged the host default stays
    R(1), the exact historical rank-synchronous rule.  Env knobs:
    NGT_TPU_ADJUST_DEVICE=0 reverts to host phase 2,
    NGT_TPU_ADJUST_DEVICE_MIN (default 4M edge-cells) gates engagement,
    NGT_TPU_ADJUST_SNAP (default 8, 0 = one full-width window) sets C."""
    import os as _os
    import sys as _sys
    import time as _t

    prof = _os.environ.get("NGT_TPU_BUILD_PROFILE", "") == "1"
    t0 = _t.time()

    def mark(label):
        nonlocal t0
        if prof:
            print(f"# adjust_paths {label}={_t.time()-t0:.1f}s",
                  file=_sys.stderr, flush=True)
            t0 = _t.time()

    e = int(graph.degree[:n].max()) if n else 0
    if e == 0:
        return graph
    nbr = graph.nbr_ids[:n]
    dist = graph.nbr_dist[:n]
    deg = graph.degree[:n]
    mark("materialize")

    env = _os.environ
    use_dev = env.get("NGT_TPU_ADJUST_DEVICE", "1") != "0"
    dev_min = int(env.get("NGT_TPU_ADJUST_DEVICE_MIN", str(1 << 22)))
    use_dev = use_dev and n * e >= dev_min
    if snap is None:
        snap = int(env.get("NGT_TPU_ADJUST_SNAP", "8")) if use_dev else 1
    if snap <= 0 or snap > e:
        snap = e
    # the device pass slices snapshot windows of whole bytes; cap the
    # window so one window's [n, e, snap/8] candidate slice stays under
    # the int32 element-addressing limit (see _detect_shortcuts_all)
    snap8 = ((snap + 7) // 8) * 8
    if use_dev:
        n_est = ((n + block - 1) // block) * block + block
        k_max = max(1, (1 << 31) // max(n_est * e, 1) - 1)
        snap8 = max(8, min(snap8, 8 * k_max))
    eb = ((e + snap8 - 1) // snap8) * snap8 if use_dev else None

    # phase 1: candidate detection — ONE fused device program (scan over
    # node tiles) returning the candidate tensor already BIT-PACKED along
    # the w axis ([u, v_rank, w_rank//8] uint8): an unpacked [n, e, e] bool
    # is ~17 GB at 1M nodes / ONNG-typical e=130, packed it is ~2.1 GB
    # (the OpenMP reference builds per-node vectors instead;
    # adjustPathsEffectively, GraphReconstructor.h:197-386).  Block size
    # caps the [block, e, e, e] detection tensor at ~1 GiB.
    block = max(16, min(block, (1 << 30) // max(e * e * e, 1)))
    n_pad = ((n + block - 1) // block) * block
    nbr_p = graph.nbr_ids[:n]
    dist_p = graph.nbr_dist[:n]
    if n_pad != n:
        nbr_p = np.concatenate(
            [nbr_p, np.full((n_pad - n, nbr_p.shape[1]), -1, nbr_p.dtype)]
        )
        dist_p = np.concatenate(
            [dist_p, np.full((n_pad - n, dist_p.shape[1]), INF, dist_p.dtype)]
        )
    nbr_dev = jnp.asarray(nbr_p)
    dist_dev = jnp.asarray(dist_p)
    cand_cols = _detect_shortcuts_all(nbr_dev, dist_dev, e=e, block=block,
                                      eb=eb)
    mark("detect")

    from ngt_tpu import native

    if use_dev:
        try:
            deg_p = np.zeros(n_pad, np.int32)
            deg_p[:n] = deg
            nbr_e_dev = nbr_dev[:, :e]
            kept_dev = _adjust_phase2_device(
                nbr_e_dev, jnp.asarray(deg_p), cand_cols,
                e=e, block=block, min_edges=min_edges, snap=snap8,
            )
            del cand_cols  # 2 GB-class; free before the row compaction
            nbr2d, deg2d = _kept_to_rows_dev(
                nbr_e_dev, kept_dev, e=e, e_max=graph.e_max, cap=n,
            )
            deg2 = np.asarray(deg2d)
            mark("phase2_dev")
            nbr2 = np.asarray(nbr2d)
            # distances are a permuted subset of rows the host already
            # holds: resolve them host-side (native binary-search lookup,
            # ~1 s at 1M) instead of downloading the f32 half of the rows
            # (0.5 GB -> 25-40 s of the round-5 contended profile)
            dist2 = native.edge_dist_lookup(nbr, dist, deg, nbr2, deg2)
            mark("rows_download")
            out = GraphStore(max_edges=graph.e_max, capacity=max(n, 16))
            out.nbr_ids[:n], out.nbr_dist[:n], out.degree[:n] = (
                nbr2, dist2, deg2
            )
            out._has_node[:n] = graph._has_node[:n]
            return out
        except jax.errors.JaxRuntimeError as exc:
            print(f"# adjust_paths: device phase 2 failed ({exc}); "
                  "falling back to host replay", file=_sys.stderr,
                  flush=True)
            cand_cols = _detect_shortcuts_all(
                nbr_dev, dist_dev, e=e, block=block, eb=eb
            )
    cand_bits = np.stack(
        [np.asarray(c)[:n] for c in cand_cols], axis=2
    )
    del cand_cols
    mark("cand_download")

    # phase 2: rank-ordered re-insertion.  Native single pass (per-node
    # id-sorted rows + binary-search pos lookup — seconds at 1M) with the
    # per-rank numpy loop as the toolchain-free fallback; both compute the
    # same kept set (pinned by tests/test_reconstruct.py).  The snap period
    # matches what the device pass would have used, so a fallback changes
    # nothing about the result.
    snap_eff = snap8 if use_dev else snap
    kept = native.adjust_paths_phase2(nbr, deg, cand_bits, min_edges,
                                      snap_period=snap_eff)
    mark("phase2")
    if kept is not None:
        src, col = np.nonzero(kept)
        out = GraphStore(max_edges=graph.e_max, capacity=max(n, 16))
        nbr2, dist2, deg2 = _normalize_rows(
            src.astype(np.int64), nbr[src, col], dist[src, col], n,
            graph.e_max, dist_from=(nbr, dist, deg),
        )
        out.nbr_ids[:n], out.nbr_dist[:n], out.degree[:n] = nbr2, dist2, deg2
        out._has_node[:n] = graph._has_node[:n]
        mark("normalize")
        return out

    # kept[u, r] - whether u's rank-r edge survives.  Implements the same
    # R(C) rule as native/device: the u-row factor kept[us, vr] is live
    # (ranks < r decided), the inner-edge factor reads the chunk-start
    # snapshot for pos < r0 and the presence rule for pos in [r0, r).
    kept = np.zeros((n, e), bool)
    kept_snap = np.zeros((n, e), bool)
    kept_count = np.zeros(n, np.int32)
    r0 = 0
    # position of w (= u's rank-r edge target) inside v's row, for the
    # path-exists test kept[v, pos_vw]
    for r in range(e):
        if r % snap_eff == 0:
            kept_snap[:] = kept
            r0 = r
        has_edge = r < deg
        if not has_edge.any():
            break
        # allow dropping only while enough edges would remain
        remaining = deg - r
        can_drop = (kept_count + remaining) > min_edges
        # does a kept 2-hop path exist? v must be an already-kept edge of u
        # (ranks < r, kept) and v's edge to w must be visible as well
        drop = np.zeros(n, bool)
        # unpack the w-axis bit for rank r (packbits is big-endian per byte)
        bit_r = (cand_bits[:, :, r >> 3] >> (7 - (r & 7))) & 1
        us, vr = np.nonzero(bit_r)
        if len(us):
            mask = kept[us, vr]  # u->v kept
            us2, vr2 = us[mask], vr[mask]
            if len(us2):
                v_ids = nbr[us2, vr2]
                w_ids = nbr[us2, r]
                # pos of w in v's row
                pos = np.argmax(nbr[v_ids] == w_ids[:, None], axis=1)
                vis = np.where(pos < r0, kept_snap[v_ids, pos], pos < r)
                vw_ok = (nbr[v_ids, pos] == w_ids) & vis
                hit_u = np.unique(us2[vw_ok])
                drop[hit_u] = True
        drop &= can_drop & has_edge
        keep_now = has_edge & ~drop
        kept[:, r] = keep_now
        kept_count += keep_now.astype(np.int32)

    src, col = np.nonzero(kept)
    out = GraphStore(max_edges=graph.e_max, capacity=max(n, 16))
    nbr2, dist2, deg2 = _normalize_rows(
        src.astype(np.int64), nbr[src, col], dist[src, col], n, graph.e_max
    )
    out.nbr_ids[:n], out.nbr_dist[:n], out.degree[:n] = nbr2, dist2, deg2
    out._has_node[:n] = graph._has_node[:n]
    return out


def refine_anng(index, epsilon: float = 0.1, num_edges: int = 0) -> None:
    """Re-search every object and rebuild its neighborhood (reference
    refineANNG, GraphReconstructor.h:803-924) using the batched searcher."""
    import ngt_tpu.graph.build as B

    store, graph = index.store, index.graph
    n = store.repository_size
    live = np.nonzero(store._valid[:n])[0].astype(np.int32)
    k = num_edges if num_edges > 0 else index.prop.edge_size_for_creation
    batch = index.prop.device_batch_size
    mirror = index._ensure_mirror()

    new_i = np.full((n, k), -1, np.int32)
    new_d = np.full((n, k), INF, np.float32)
    cols = np.arange(k)[None, :]
    for s in range(0, len(live), batch):
        chunk = live[s : s + batch]
        ids, dists = index.batch_search(
            store._x[chunk][:, : store.dimension],
            size=k + 1,  # the object itself comes back first
            epsilon=epsilon,
        )
        ids = np.where(ids >= 0, ids + (1 if index.zero_based else 0), -1)
        # vectorized self-exclusion: stable-sort non-self entries to the
        # front of each row, then truncate to k (order is preserved)
        keep = (ids != chunk[:, None]) & (ids >= 0)
        order = np.argsort(~keep, axis=1, kind="stable")[:, :k]
        sel = np.take_along_axis(ids, order, axis=1)
        seld = np.take_along_axis(dists, order, axis=1).astype(np.float32)
        cnt = keep.sum(axis=1, keepdims=True)
        sel = np.where(cols < cnt, sel, -1)
        seld = np.where(cols < cnt, seld, INF)
        new_i[chunk] = sel
        new_d[chunk] = seld

    src, col = np.nonzero(new_i >= 0)
    ps = src.astype(np.int64)
    pt = new_i[src, col]
    pd = new_d[src, col]
    # out-edges + reverse in-edges, normalized
    ps2 = np.concatenate([ps, pt.astype(np.int64)])
    pt2 = np.concatenate([pt, ps.astype(np.int32)])
    pd2 = np.concatenate([pd, pd])
    nbr2, dist2, deg2 = _normalize_rows(ps2, pt2, pd2, n, graph.e_max)
    graph.ensure_capacity(n)
    graph.nbr_ids[:n], graph.nbr_dist[:n], graph.degree[:n] = nbr2, dist2, deg2
    graph._has_node[:n] = store._valid[:n]
    index._mirror = None
