"""Batched incremental ANNG construction.

TPU redesign of the reference's thread-pool build
(``GraphIndex::createIndex(threads)`` / ``GraphAndTreeIndex::createIndex``,
reference lib/NGT/Index.cpp:631-792, 1157-1256): the reference searches a
batch of ~200 new objects concurrently on worker threads and then inserts
them serially; here the concurrent search is ONE device program
(``graph_search`` over the whole batch) and the serial insert is a
vectorized host update (GraphStore.set_nodes / add_edges), mirroring:

* per-object insertion search with k = edgeSizeForCreation and
  ε = insertionRadiusCoefficient - 1 (``searchForNNGInsertion``,
  Index.h:815-837);
* intra-batch pairwise distances merged into each member's candidate list —
  the step the reference calls "about 30% of the indexing time"
  (Index.cpp:681-703) — computed as one matmul;
* ANNG reverse edges: every chosen neighbor also gets an edge back to the
  new node (``insertANNGNode`` -> addEdge, Graph.h:611-626), bounded by the
  fixed row width (addEdgeDeletingExcessEdges semantics, Graph.h:888-934).

Resume semantics match the reference: only objects lacking graph nodes are
indexed (Index.cpp:648-651), so append -> build -> append -> build works.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp

from ngt_tpu.graph.search import graph_search, wrap_hash_bits
from ngt_tpu.graph.storage import GraphStore
from ngt_tpu.ops import distances as D
from ngt_tpu.properties import DistanceType, GraphType, Property
from ngt_tpu.seeds import Seeder, default_reps
from ngt_tpu.store import VectorStore
from ngt_tpu.utils import logger

INF = np.float32(np.inf)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(arr, idx, vals):
    return arr.at[idx].set(vals)


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3))
def _scatter_all(x, valid, sqnorm, nbr, obj_idx, obj_rows, obj_valid,
                 obj_sq, nbr_idx, nbr_rows):
    """One fused donated update of every device mirror array — a single
    host->device round trip per build batch (the axon-tunneled TPU pays
    ~0.1-1 s per dispatch, so call count dominates small-batch builds)."""
    x = x.at[obj_idx].set(obj_rows)
    valid = valid.at[obj_idx].set(obj_valid)
    if sqnorm is not None:
        sqnorm = sqnorm.at[obj_idx].set(obj_sq)
    nbr = nbr.at[nbr_idx].set(nbr_rows)
    return x, valid, sqnorm, nbr


def _fused_insert_search(
    x, nbr, valid, sqnorm, rep_rows, rep_sq, rep_ids, queries, qvalid, eps,
    *, metric, k, kb, s, width, hash_bits, exact_hash, expand=1,
):
    """Seed scoring + insertion search + intra-batch pairwise top-k as ONE
    device program (the whole device side of a build batch)."""
    # seeds from representatives (one bf16 matmul; replaces tree descent).
    # seed_scores/approx_max_k: selection-only, re-scored in graph_search
    sd = D.seed_scores(metric, queries, rep_rows, rep_sq=rep_sq)
    _, si = jax.lax.approx_max_k(-sd, min(s, rep_rows.shape[0]))
    seeds = jnp.take(rep_ids, si, axis=0)
    res = graph_search(
        x, nbr, valid, queries, seeds,
        metric=metric, k=k, epsilon=eps, width=width,
        hash_bits=hash_bits, exact_hash=exact_hash, expand=expand,
        x_sqnorm=sqnorm,
    )
    # intra-batch pairwise (reference Index.cpp:687-703); padded/dup rows
    # are masked via qvalid so they cannot appear as 0-distance neighbors
    pb = D.pairwise(metric, queries, queries)
    b = queries.shape[0]
    eye = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    pb = jnp.where(eye | ~qvalid[None, :], jnp.inf, pb)
    nbd, nbi = jax.lax.top_k(-pb, kb)
    return res.ids, res.dists, nbi.astype(jnp.int32), -nbd


_fused_insert_search_jit = jax.jit(
    _fused_insert_search,
    static_argnames=("metric", "k", "kb", "s", "width", "hash_bits",
                     "exact_hash", "expand"),
)


def _fused_insert_search_sq8(
    x, nbr, valid, sqnorm, blocks, codes, rep_rows, rep_sq, rep_ids,
    queries, qvalid, eps, inv_scale,
    *, metric, k, kb, s, width, hash_bits, exact_hash,
):
    """sq8 variant of the insertion-search program: the graph traversal
    scores int8 neighbor BLOCKS (one contiguous read per hop — random
    per-neighbor row gathers run near the HBM transaction envelope), then
    the top candidates are re-ranked EXACTLY against the f32 rows so the
    edges stored in the graph carry true distances.  Build quality matches
    the exact path up to candidate-set differences from int8 rounding."""
    sd = D.seed_scores(metric, queries, rep_rows, rep_sq=rep_sq)
    _, si = jax.lax.approx_max_k(-sd, min(s, rep_rows.shape[0]))
    seeds = jnp.take(rep_ids, si, axis=0)
    k_cand = 2 * k
    res = graph_search(
        blocks, nbr, valid, queries.astype(jnp.float32) * inv_scale, seeds,
        metric=DistanceType.L2, k=k_cand, k_radius=k, epsilon=eps,
        width=width, hash_bits=hash_bits, exact_hash=exact_hash,
        block_mode=True, seed_x=codes,
    )
    # exact re-rank of the candidate set
    safe = jnp.clip(res.ids, 0, x.shape[0] - 1)
    rows = jnp.take(x, safe, axis=0)
    rsq = jnp.take(sqnorm, safe, axis=0) if sqnorm is not None else None
    dd = D.gathered(metric, queries, rows, xs_sqnorm=rsq)
    dd = jnp.where(res.ids >= 0, dd, jnp.inf)
    neg, sel = jax.lax.top_k(-dd, k)
    f_ids = jnp.take_along_axis(res.ids, sel, axis=1)
    f_d = -neg
    f_ids = jnp.where(jnp.isfinite(f_d), f_ids, -1)

    pb = D.pairwise(metric, queries, queries)
    b = queries.shape[0]
    eye = jax.lax.broadcasted_iota(jnp.int32, (b, b), 0) == \
        jax.lax.broadcasted_iota(jnp.int32, (b, b), 1)
    pb = jnp.where(eye | ~qvalid[None, :], jnp.inf, pb)
    nbd, nbi = jax.lax.top_k(-pb, kb)
    return f_ids, f_d, nbi.astype(jnp.int32), -nbd


_fused_insert_search_sq8_jit = jax.jit(
    _fused_insert_search_sq8,
    static_argnames=("metric", "k", "kb", "s", "width", "hash_bits",
                     "exact_hash"),
)


@jax.jit
def _make_codes_blocks(x, nbr, inv_scale):
    # NOTE: these 3-D [cap, E, D] int8 blocks sit in padded tile layout
    # (second-minor dim rounds up to 32 — ~1.6x bytes at E=40).  Acceptable
    # for this OPT-IN insertion-search path at append scales; the
    # production search mirror uses the 2-D slab-filled layout instead
    # (quant/qgraph._fill_blocks_slab).
    codes = jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv_scale), -127, 127
    ).astype(jnp.int8)
    safe = jnp.clip(nbr, 0, x.shape[0] - 1)
    blocks = jnp.take(codes, safe, axis=0)
    return codes, blocks


#: metrics whose stored-vector scaled-L2 ranking is monotone with the metric
#: (normalized metrics store unit vectors: L2^2 = 2-2cos)
_SQ8_METRICS = (
    DistanceType.L2,
    DistanceType.NORMALIZED_L2,
    DistanceType.NORMALIZED_COSINE,
    DistanceType.NORMALIZED_ANGLE,
    # plain angular metrics qualify because the sq8 codes are built from
    # ROW-NORMALIZED vectors (qgraph._sq8_rows): L2 ranking on unit rows
    # equals the cosine/angle ranking, and the exact re-rank uses the true
    # metric on the raw mirror
    DistanceType.COSINE,
    DistanceType.ANGLE,
)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _update_codes_blocks(codes, blocks, obj_idx, obj_codes, blk_idx, nbr_rows):
    """Scatter fresh int8 codes for new objects and rebuild the neighbor
    blocks of every row whose adjacency changed (blocks[u] = codes[nbr[u]])."""
    codes = codes.at[obj_idx].set(obj_codes)
    safe = jnp.clip(nbr_rows, 0, codes.shape[0] - 1)
    fresh = jnp.take(codes, safe, axis=0)          # [T, E, D] int8
    blocks = blocks.at[blk_idx].set(fresh)
    return codes, blocks


def _pad_ids(ids: np.ndarray, size: int) -> np.ndarray:
    """Pad an index list to a fixed size by repeating the first element
    (idempotent under scatter) — bounds jit recompiles to log2 buckets."""
    if len(ids) == size:
        return ids
    out = np.empty((size,), dtype=ids.dtype)
    out[: len(ids)] = ids
    out[len(ids):] = ids[0] if len(ids) else 0
    return out


def _bucket(n: int) -> int:
    return 1 << max(int(math.ceil(math.log2(max(n, 1)))), 5)


class DeviceMirror:
    """Device copies of the object matrix + adjacency, updated by row
    scatter with buffer donation (no full re-upload per batch)."""

    _version_seed = 0

    def __init__(self, store: VectorStore, graph: GraphStore):
        self.store = store
        self.graph = graph
        self.x = None
        self.valid = None
        self.sqnorm = None
        self.nbr = None
        self.capacity = 0
        #: bumped on every device-array replacement; derived caches (e.g.
        #: the quantized-graph neighbor blocks) key on this instead of
        #: id(self.nbr), which CPython can reuse after GC.  Seeded from a
        #: process-wide counter so a REPLACED mirror never repeats a version
        #: an old mirror already handed out.
        DeviceMirror._version_seed += 1_000_000
        self.version = DeviceMirror._version_seed

    def _wants_sqnorm(self) -> bool:
        return self.store.metric in (
            DistanceType.L2,
            DistanceType.COSINE,
            DistanceType.ANGLE,
            DistanceType.POINCARE,
        )

    def _search_valid(self, idx=None):
        # a search may only return indexed objects (the reference's graph
        # search traverses graph nodes; unindexed repository entries are
        # unreachable) — so validity = live object AND graph node
        cap = self.store._x.shape[0]
        v = self.store._valid[:cap] & self.graph._has_node[:cap]
        return v if idx is None else v[idx]

    @staticmethod
    def _narrow_enabled() -> bool:
        import os as _os

        return _os.environ.get("NGT_TPU_MIRROR_NARROW", "1") != "0"

    def sync_full(self):
        self.graph.ensure_capacity(self.store._x.shape[0])
        # the resident mirror stays in the narrowest LOSSLESS dtype (u8 for
        # SIFT-like integral corpora: 4x less HBM AND 4x less gather
        # bandwidth on every hop; distances cast to f32 in-program, so
        # results are bit-identical) — the lever that fits 8M rows on one
        # 16 GB chip.  NGT_TPU_MIRROR_NARROW=0 reverts to f32.
        self.x = (
            _upload_narrow(self.store._x)
            if self._narrow_enabled()
            else _upload_f32(self.store._x)
        )
        self.valid = jnp.asarray(self._search_valid())
        self.nbr = jnp.asarray(self.graph.nbr_ids[: self.store._x.shape[0]])
        self.sqnorm = D.sq_norms(self.x) if self._wants_sqnorm() else None
        self.capacity = self.store._x.shape[0]
        self.version += 1

    def adopt(self, x: jax.Array, nbr: jax.Array, sqnorm: jax.Array | None,
              x_narrow: jax.Array | None = None):
        """Take ownership of already-device-resident arrays (the bulk build
        constructs the adjacency ON device; re-uploading it through
        sync_full would cost ~10 s per 850 MB over the tunnel).  When the
        build kept its narrow upload (``x_narrow``), the mirror adopts THAT
        and the f32 working copy is dropped with the build's scan state."""
        self.graph.ensure_capacity(self.store._x.shape[0])
        self.x = (
            x_narrow
            if x_narrow is not None and self._narrow_enabled()
            else x
        )
        self.nbr = nbr
        self.sqnorm = sqnorm if self._wants_sqnorm() else None
        self.valid = jnp.asarray(self._search_valid())
        self.capacity = self.store._x.shape[0]
        self.version += 1

    def update_rows(self, obj_ids: np.ndarray | None, nbr_ids: np.ndarray | None):
        if self.x is None or self.capacity != self.store._x.shape[0]:
            self.sync_full()
            return
        if obj_ids is None or len(obj_ids) == 0:
            if nbr_ids is not None and len(nbr_ids):
                pad = _pad_ids(np.asarray(nbr_ids), _bucket(len(nbr_ids)))
                self.nbr = _scatter_rows(
                    self.nbr, jnp.asarray(pad), jnp.asarray(self.graph.nbr_ids[pad])
                )
                self.version += 1
            return
        opad = _pad_ids(np.asarray(obj_ids), _bucket(len(obj_ids)))
        npad = _pad_ids(
            np.asarray(nbr_ids if nbr_ids is not None and len(nbr_ids) else obj_ids),
            _bucket(len(nbr_ids) if nbr_ids is not None and len(nbr_ids) else len(obj_ids)),
        )
        rows = self.store._x[opad]
        sq = (
            (rows.astype(np.float32) ** 2).sum(-1)
            if self.sqnorm is not None
            else None
        )
        if self.x.dtype != jnp.float32 and rows.dtype == np.float32:
            # narrow resident mirror: scatter rows in its dtype when
            # lossless; otherwise widen the mirror once (a later integral
            # re-sync can narrow it again)
            cast = rows.astype(np.dtype(self.x.dtype))
            if np.array_equal(cast.astype(np.float32), rows):
                rows = cast
            else:
                self.x = self.x.astype(jnp.float32)
        self.x, self.valid, self.sqnorm, self.nbr = _scatter_all(
            self.x, self.valid, self.sqnorm, self.nbr,
            jnp.asarray(opad), jnp.asarray(rows),
            jnp.asarray(self._search_valid(opad)),
            jnp.asarray(sq) if sq is not None else None,
            jnp.asarray(npad), jnp.asarray(self.graph.nbr_ids[npad]),
        )
        self.version += 1




@functools.partial(jax.jit, static_argnames=("e_max", "cap", "reverse"))
def _bulk_graph_rows(src_ids, f_ids, f_d, *, e_max, cap, reverse):
    """Build ALL adjacency rows from the bulk scan's forward edges in one
    device program: forward ∪ reversed edge triples -> sort by (row, dist)
    -> dedupe -> rank-within-row -> scatter into fixed-width rows.

    This replaces the host-side set_nodes + merge_edges passes: with one
    host core (this container) the serial merge was ~35 s at 1M, while the
    device sorts ~80M triples in seconds and the result lands already
    device-resident for the search mirror."""
    npq, kk = f_ids.shape
    ok = (f_ids >= 0) & (f_ids != src_ids[:, None])
    d = jnp.where(ok, f_d, jnp.inf).astype(jnp.float32)
    t = jnp.where(ok, f_ids, -1)
    s_fwd = jnp.broadcast_to(src_ids[:, None], (npq, kk))
    if reverse:
        s = jnp.concatenate([s_fwd.reshape(-1), t.reshape(-1)])
        tt = jnp.concatenate([t.reshape(-1), s_fwd.reshape(-1)])
        dd = jnp.concatenate([d.reshape(-1), d.reshape(-1)])
    else:
        s, tt, dd = s_fwd.reshape(-1), t.reshape(-1), d.reshape(-1)
    pad_row = jnp.int32(cap)
    invalid = (tt < 0) | (s < 0) | jnp.isinf(dd)
    s = jnp.where(invalid, pad_row, s)
    # dedupe (row, target) keeping the (identical) distance
    s1, t1, d1 = jax.lax.sort((s, tt, dd), num_keys=3)
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), (s1[1:] == s1[:-1]) & (t1[1:] == t1[:-1])]
    )
    d1 = jnp.where(dup, jnp.inf, d1)
    s1 = jnp.where(dup, pad_row, s1)
    # rank within row by distance
    s2, d2, t2 = jax.lax.sort((s1, d1, t1), num_keys=2)
    l = s2.shape[0]
    idxv = jnp.arange(l, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.ones((1,), bool), s2[1:] != s2[:-1]])
    gstart = jax.lax.cummax(jnp.where(is_start, idxv, 0))
    rank = idxv - gstart
    keep = (rank < e_max) & (s2 < pad_row) & jnp.isfinite(d2)
    row = jnp.where(keep, s2, pad_row)
    col = jnp.where(keep, rank, 0)
    nbr = jnp.full((cap + 1, e_max), -1, jnp.int32)
    nbrd = jnp.full((cap + 1, e_max), jnp.inf, jnp.float32)
    # masked entries all write the constant (-1, inf) at the pad row —
    # colliding scatters carry identical values, so order cannot matter
    nbr = nbr.at[row, col].set(jnp.where(keep, t2, -1))
    nbrd = nbrd.at[row, col].set(jnp.where(keep, d2, jnp.inf))
    nbr, nbrd = nbr[:cap], nbrd[:cap]
    deg = jnp.sum(nbr >= 0, axis=1).astype(jnp.int32)
    return nbr, nbrd, deg


@jax.jit
def _cc_labels_pass(nbr, valid, labels0=None):
    """Connected-component labels by min-label propagation with pointer
    jumping — the device analogue of the native union-find (one host core
    here makes an 80M-edge serial union-find a ~20 s pass; on device each
    round is two big gathers and convergence takes O(log n) rounds)."""
    n, _ = nbr.shape
    none = jnp.int32(n)
    if labels0 is None:
        labels0 = jnp.where(valid, jnp.arange(n, dtype=jnp.int32), none)
    safe = jnp.clip(nbr, 0, n - 1)
    edge_ok = nbr >= 0

    def cond(st):
        i, _, changed = st
        return changed & (i < 128)

    def jump_fixpoint(l):
        # follow label chains to their minimum: operates on the [n] label
        # array only (cheap), so run it to convergence each round — one
        # edge round + full jumping converges in a handful of rounds where
        # single-hop jumping needed >100 (it hit the iteration cap and made
        # CC the longest build phase)
        def jcond(st):
            j, _, ch = st
            return ch & (j < 64)

        def jbody(st):
            j, l, _ = st
            nxt = jnp.take(l, jnp.clip(l, 0, n - 1))
            l2 = jnp.where(l < none, jnp.minimum(l, nxt), none)
            return j + 1, l2, jnp.any(l2 != l)

        _, l, _ = jax.lax.while_loop(
            jcond, jbody, (jnp.int32(0), l, jnp.bool_(True))
        )
        return l

    def pull_fixpoint(l):
        # gather-only propagation rounds: measured 81 ms vs 132 ms with the
        # scatter-push at [1M, 8] (983 ms at [1M, 64]) — TPU scatter-min
        # with colliding indices is the expensive half, so run the cheap
        # pull+jump operator to ITS fixpoint first
        def pcond(st):
            i, _, ch = st
            return ch & (i < 64)

        def pbody(st):
            i, l, _ = st
            nl = jnp.where(edge_ok, jnp.take(l, safe), none)
            new = jnp.minimum(l, jnp.min(nl, axis=1))
            new = jump_fixpoint(new)
            new = jnp.where(valid, new, none)
            return i + 1, new, jnp.any(new != l)

        _, l, _ = jax.lax.while_loop(
            pcond, pbody, (jnp.int32(0), l, jnp.bool_(True))
        )
        return l

    def body(st):
        i, labels, _ = st
        l = pull_fixpoint(labels)
        # one push round (symmetrize): at the pull fixpoint an unchanged
        # push proves convergence of the full pull+push operator — exact
        # CC labels; a changed push re-enters the pull fixpoint
        push = jnp.where(
            edge_ok, jnp.broadcast_to(l[:, None], nbr.shape), none
        )
        new = l.at[safe.reshape(-1)].min(push.reshape(-1))
        new = jump_fixpoint(new)
        new = jnp.where(valid, new, none)
        return i + 1, new, jnp.any(new != l)

    _, labels, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), labels0, jnp.bool_(True))
    )
    return labels


@jax.jit
def _cc_cross_count(nbr, l0):
    """Count edges whose endpoints hold different component labels."""
    n = nbr.shape[0]
    safe = jnp.clip(nbr, 0, n - 1)
    el = jnp.where(nbr >= 0, jnp.take(l0, safe), l0[:, None])
    return jnp.sum(el != l0[:, None])


@functools.partial(jax.jit, static_argnames=("B",))
def _cc_cross_pairs(nbr, l0, B):
    """Compact the label pairs of cross-component edges into a [B] buffer
    (B >= the true count; padding slots emit the no-op pair (0, 0))."""
    n, e = nbr.shape
    safe = jnp.clip(nbr, 0, n - 1)
    el = jnp.where(nbr >= 0, jnp.take(l0, safe), l0[:, None])
    cross = (el != l0[:, None]).ravel()
    cnt = jnp.sum(cross)
    idx = jnp.nonzero(cross, size=B, fill_value=0)[0]
    ok = jnp.arange(B) < cnt
    a = jnp.where(ok, jnp.take(l0, (idx // e).astype(jnp.int32)), 0)
    b = jnp.where(ok, jnp.take(el.ravel(), idx), 0)
    return a, b


def _cc_labels_bulk(pending, cap, nbr_dev, valid_dev, has_host, narrow_dev):
    """Exact CC labels for the fresh bulk build, computed host-side in ONE
    shot instead of iterating on the device.

    A cold full-width device pass needs ~16 pull rounds of ~750 ms each at
    [1M, 80] — 15.6 s of the 63 s 1M build — and a warm start cannot fix
    that: min-propagation pays O(log diameter) rounds whenever narrow
    components chain together (measured: warm verify 14.8 s ~= cold).  So
    finish the problem where iteration is free: (1) union-find on the host
    over each node's first ~8 scan candidates (the ~36 MB download and the
    0.2 s union-find overlap the ``_bulk_graph_rows`` program still
    executing on device), (2) ONE device gather pass extracts just the
    edges that CROSS narrow components (compacted on device; they are rare
    exactly when components exist at all), (3) a host union over those
    pairs.  Out-edges are never dropped by the row merge, so narrow-UF +
    all cross edges over the merged rows is the exact full partition.
    Falls back to the cold device pass when cross edges exceed the
    download budget (~well-mixed data, where narrow-UF usually yields one
    component and zero cross edges anyway).  NGT_TPU_CC_DEVICE_COLD=1
    forces the cold device pass."""
    import os

    if os.environ.get("NGT_TPU_CC_DEVICE_COLD", "") == "1" or not len(pending):
        return np.asarray(_cc_labels_device(nbr_dev, valid_dev))
    import time as _t

    from ngt_tpu import native

    prof = os.environ.get("NGT_TPU_BUILD_PROFILE", "") == "1"
    t0 = _t.time()
    # narrow_dev: the pre-enqueued single slice program of the first ~9
    # scan-id columns (one dispatch + one transfer; per-chunk slices cost
    # 8 dispatches of 0.3-1 s each over the tunnel — measured dl 4-25 s
    # depending on service load)
    host_i = np.asarray(jax.device_get(narrow_dev))
    narrow = np.full((cap, host_i.shape[1]), -1, np.int32)
    narrow[pending] = host_i
    t1 = _t.time()
    labels, _ = native.connected_components(narrow, has_host)
    t2 = _t.time()
    l0 = jnp.asarray(np.where(labels >= 0, labels, cap).astype(np.int32))
    cnt = int(_cc_cross_count(nbr_dev, l0))
    t3 = _t.time()
    if cnt > (16 << 20):  # >128 MB of pair downloads: iterate on device
        out = np.asarray(_cc_labels_device(nbr_dev, valid_dev))
        if prof:
            import sys

            print(
                f"# cc_bulk: cross={cnt} over budget -> cold device pass",
                file=sys.stderr,
            )
        return out
    if cnt == 0:
        merged, _ = native.union_pairs(
            labels, np.zeros(0, np.int32), np.zeros(0, np.int32)
        )
    else:
        a, b = jax.device_get(
            _cc_cross_pairs(nbr_dev, l0, _bucket(cnt))
        )
        merged, _ = native.union_pairs(labels, a, b)
    out = np.where(merged >= 0, merged, cap).astype(np.int32)
    if prof:
        import sys

        print(
            f"# cc_bulk: dl={t1 - t0:.1f}s uf={t2 - t1:.1f}s "
            f"count={t3 - t2:.1f}s cross={cnt} "
            f"pairs+union={_t.time() - t3:.1f}s",
            file=sys.stderr,
        )
    return out


@functools.partial(jax.jit, static_argnames=("w",))
def _narrow_slice(all_i, w: int):
    """First-w columns of the bulk scan ids in ONE device program (the
    host union-find seed for _cc_labels_bulk)."""
    return all_i[:, :w]


def _cc_labels_device(nbr, valid, narrow: int | None = None):
    """Exact CC labels.  A narrow warm-start (propagate over ``nbr[:,
    :narrow]`` first) was measured at 1M and NEVER pays — full-width
    convergence needs the same ~16 rounds either way (cc= 16.6 s plain vs
    18.4/20.6 s with narrow 8/16), so the default is narrow=0; the knob
    stays for A/B (NGT_TPU_CC_NARROW).  The win that did land is in
    ``_cc_labels_pass``: pull-only rounds to fixpoint with the scatter-push
    demoted to a convergence check (TPU scatter-min with colliding indices
    costs ~2x a gather round)."""
    import os

    if narrow is None:
        narrow = int(os.environ.get("NGT_TPU_CC_NARROW", "0"))
    e = nbr.shape[1]
    labels = None
    if 0 < narrow < e:
        labels = _cc_labels_pass(nbr[:, :narrow], valid)
    return _cc_labels_pass(nbr, valid, labels)


@functools.partial(jax.jit, static_argnames=("metric",))
def _bridge_select(prow, rrow, rep_labels, piv_labels, metric):
    """One fused program per connectivity pass: distances pivot x rep,
    mask same-component / dead reps, per-pivot winner.  Fused because each
    eager op is a separate ~0.3-1 s dispatch over the tunneled TPU — the
    unfused pass made ensure_connected scale-INDEPENDENTLY slow (~30 s)."""
    dd = D.pairwise(metric, prow, rrow)
    bad = (
        rep_labels[None, :] == piv_labels[:, None]
    ) | (rep_labels < 0)[None, :]
    dd = jnp.where(bad, jnp.inf, dd)
    return jnp.argmin(dd, axis=1), jnp.min(dd, axis=1)


@jax.jit
def _gather_rows2(dev_i, dev_d, pad):
    return dev_i[pad], dev_d[pad]


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _scatter_rows3(dev_i, dev_d, dev_g, pad, new_i, new_d, new_g):
    return (
        dev_i.at[pad].set(new_i),
        dev_d.at[pad].set(new_d),
        dev_g.at[pad].set(new_g.astype(dev_g.dtype)),
    )


def _bridge_deferred(graph: GraphStore, piv, tgt, td) -> jax.Array:
    """Apply bidirectional bridge edges to a graph whose adjacency is still
    device-resident (GraphStore.defer_rows): pull only the touched rows,
    merge on host with add_edges semantics (sorted bounded insert, dup
    check; Graph.h:888-934), scatter the merged rows back into the deferred
    device arrays.  Keeps the deferred ~650 MB download (1M scale) off the
    build critical path — the touched rows are a few MB."""
    from ngt_tpu.graph.storage import merge_edge_rows

    dev_i, dev_d, dev_g, n_used = graph._deferred
    targets = np.concatenate([piv, tgt]).astype(np.int64)
    srcs = np.concatenate([tgt, piv]).astype(np.int32)
    dd = np.concatenate([td, td]).astype(np.float32)
    order = np.argsort(targets, kind="stable")
    targets, srcs, dd = targets[order], srcs[order], dd[order]
    uniq = np.unique(targets)
    pad = _pad_ids(uniq, _bucket(len(uniq)))
    padj = jnp.asarray(pad)
    cur_i, cur_d = jax.device_get(_gather_rows2(dev_i, dev_d, padj))
    new_i, new_d, new_deg = merge_edge_rows(
        uniq, cur_i[: len(uniq)], cur_d[: len(uniq)],
        targets, srcs, dd, graph.e_max,
    )
    # scatter back via the padded id list (pad repeats uniq[0]; feeding it
    # row 0's merged values keeps the scatter idempotent).  Donated: three
    # undonated .at[].set calls would copy ~650 MB of device buffers per
    # connectivity pass.
    local = np.searchsorted(uniq, pad)
    dev_i, dev_d, dev_g = _scatter_rows3(
        dev_i, dev_d, dev_g, padj,
        jnp.asarray(new_i[local]), jnp.asarray(new_d[local]),
        jnp.asarray(new_deg[local]),
    )
    graph._deferred = (dev_i, dev_d, dev_g, n_used)
    return dev_i


from ngt_tpu.utils import narrow_host as _narrow_host


def _upload_narrow(xh: np.ndarray) -> jax.Array:
    """Ship the object matrix over the ~50-100 MB/s tunnel in the narrowest
    LOSSLESS dtype and KEEP it narrow on device.  SIFT-style integral data
    (uint8-valued, like sift-128-euclidean) moves — and permanently holds —
    4x fewer bytes; every distance entry point (ops/distances.py) casts row
    gathers to f32 before arithmetic, so results are bit-identical."""
    return jnp.asarray(_narrow_host(xh))


def _upload_f32(xh: np.ndarray) -> jax.Array:
    """_upload_narrow, widened back to f32 on device when the HOST data was
    f32 (for code that holds the whole matrix hot in compute, e.g. the bulk
    scan).  Non-float stores (uint8 Byte objects for the bitwise metrics)
    keep their dtype — xor/popcount need integers."""
    x = _upload_narrow(xh)
    if xh.dtype == np.float32 and x.dtype != jnp.float32:
        return x.astype(jnp.float32)
    return x


def ensure_connected(
    store: VectorStore,
    graph: GraphStore,
    seeder: Seeder,
    metric: DistanceType,
    max_passes: int = 4,
    nbr_dev: jax.Array | None = None,
    first_labels: np.ndarray | None = None,
) -> tuple[int, jax.Array | None]:
    """Link disconnected components into the main graph.

    An exact-KNN graph over clustered data can decompose into cliques with
    no inter-cluster edges (the reference's incremental growth avoids this
    implicitly because every insertion searches the CURRENT global graph).
    Labels are computed ONCE (device propagation when ``nbr_dev`` is given,
    else the native union-find); each bridging pass: per secondary
    component take a pivot and link it bidirectionally to its nearest
    representative holding a different component label — one small matmul
    per pass — then MERGE the bridged label pairs in place (the bridges
    are the only new edges, so recomputing full CC per pass — ~50 s on
    device / ~20 s host union-find at 1M — is pure waste).  Returns the
    final component count and the (bridge-updated) device adjacency when
    one was passed in."""
    from ngt_tpu import native

    n = store.repository_size
    if first_labels is not None:
        labels = np.asarray(first_labels)[:n].astype(np.int64)
        labels[labels >= n] = -1
    elif nbr_dev is not None:
        valid_dev = jnp.asarray(graph._has_node[: nbr_dev.shape[0]])
        lab_dev = _cc_labels_device(nbr_dev, valid_dev)
        labels = np.asarray(lab_dev)[:n].astype(np.int64)
        labels[labels >= n] = -1
    else:
        labels, _ = native.connected_components(
            graph.nbr_ids[: max(n, 1)], graph._has_node[: max(n, 1)]
        )
        labels = labels.astype(np.int64)
    comps = len(np.unique(labels[labels >= 0]))
    rrow = None  # rep rows upload once, reused across passes
    for _ in range(max_passes):
        if comps <= 1:
            break
        live_labels = labels[labels >= 0]
        main = np.bincount(live_labels).argmax()
        # one pivot per secondary component (vectorized first-occurrence:
        # a per-component nonzero scan is O(comps*n) — minutes at 1M with
        # thousands of clique components)
        live_idx = np.nonzero(labels >= 0)[0]
        order = np.argsort(labels[live_idx], kind="stable")
        ll = labels[live_idx][order]
        first_mask = np.concatenate([[True], ll[1:] != ll[:-1]])
        firsts = live_idx[order][first_mask]
        lab_vals = ll[first_mask]
        pivots = firsts[lab_vals != main].astype(np.int64)
        reps = seeder.rep_ids
        if len(reps) == 0:
            break
        rep_labels = labels[np.clip(reps, 0, n - 1)]
        # one fused dispatch per pass (pivot count bucketed to bound
        # compiles): distances + same-component mask + per-pivot winner
        # stay on device — the winner is 40 KB vs the ~0.5 GB distance
        # matrix, and fusing avoids ~15 eager tunnel round trips per pass
        npv = len(pivots)
        pivpad = _pad_ids(pivots, _bucket(npv))
        if rrow is None:
            rrow = jnp.asarray(store._x[reps])
        tgt_idx, td = jax.device_get(
            _bridge_select(
                jnp.asarray(store._x[pivpad]), rrow,
                jnp.asarray(rep_labels), jnp.asarray(labels[pivpad]),
                metric,
            )
        )
        tgt_idx, td = tgt_idx[:npv], td[:npv]
        okm = np.isfinite(td)
        if not okm.any():
            break
        tgt = reps[tgt_idx[okm]].astype(np.int32)
        piv = pivots[okm].astype(np.int32)
        td = td[okm].astype(np.float32)
        if graph._deferred is not None:
            # adjacency still device-resident: merge the bridges into the
            # touched rows only (a few MB) instead of materializing the
            # full host copy
            nbr_dev = _bridge_deferred(graph, piv, tgt, td)
        else:
            graph.add_edges(piv.astype(np.int64), tgt, td)
            graph.add_edges(tgt.astype(np.int64), piv, td)
            if nbr_dev is not None:
                touched = np.unique(
                    np.concatenate([piv, tgt])
                ).astype(np.int64)
                pad = _pad_ids(touched, _bucket(len(touched)))
                nbr_dev = nbr_dev.at[jnp.asarray(pad)].set(
                    jnp.asarray(graph.nbr_ids[pad])
                )
        # merge bridged components in the label array (tiny union-find over
        # label VALUES — the bridges are the only new edges)
        parent: dict[int, int] = {}

        def find(a: int) -> int:
            r = a
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(a, a) != a:
                parent[a], a = r, parent[a]
            return r

        for a, b in zip(labels[piv], labels[tgt]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        uniq = np.unique(live_labels)
        roots = np.array([find(int(u)) for u in uniq], np.int64)
        lut = np.arange(labels.max() + 1, dtype=np.int64)
        lut[uniq] = roots
        labels = np.where(labels >= 0, lut[np.clip(labels, 0, None)], -1)
        comps = len(np.unique(roots))
    return comps, nbr_dev


def build_bulk(
    store: VectorStore,
    graph: GraphStore,
    seeder: Seeder,
    prop: Property,
    pending: np.ndarray,
    mirror: DeviceMirror | None = None,
) -> DeviceMirror:
    """Fresh-index bulk construction: EXACT k-NN edges by blocked matmul +
    reverse edges.

    The reference grows the graph incrementally because exact k-NN is
    quadratic on a CPU; on the MXU the full distance matrix is the cheap
    path at this scale (100k x 100k x 128 ≈ 1.3 TFLOP ≈ seconds), and an
    exact-KNNG with reverse edges dominates an incrementally-grown ANNG in
    quality (the reference itself treats the exact graph as the ideal its
    refineANNG approaches; GraphReconstructor.h:803-924)."""
    import os
    import time as _t

    from ngt_tpu.ops import bruteforce as BF

    prof = os.environ.get("NGT_TPU_BUILD_PROFILE", "") == "1"
    marks: list[tuple[str, float]] = []

    def mark(label, sync=None):
        if not prof:
            return
        if sync is not None:
            jax.block_until_ready(sync)
            np.asarray(jax.tree.leaves(sync)[0].ravel()[0])
        marks.append((label, _t.time()))

    mark("start")
    k = int(prop.edge_size_for_creation)
    metric = store.metric
    pending = np.asarray(pending, dtype=np.int32)
    graph.ensure_capacity(store._x.shape[0])
    if mirror is None:
        mirror = DeviceMirror(store, graph)
    elif mirror.x is not None:
        # Staged appends: drop the stale device mirror BEFORE the fresh
        # narrow upload.  The bulk path re-adopts new device arrays at the
        # end either way, and at 8M the previous stage's x+nbr (~4 GB at
        # cap 2^23) held through the scan is the difference between fitting
        # and RESOURCE_EXHAUSTED (round 5g: the 6M->8M staged append OOM'd
        # at _upload_narrow with the 6M-era mirror still resident).
        mirror.x = mirror.valid = mirror.sqnorm = mirror.nbr = None
        mirror.capacity = 0
        mirror.version += 1

    x_narrow = _upload_narrow(store._x)
    # the scan holds the whole matrix hot — widen a working copy (only for
    # float stores: uint8 Byte objects stay integer for xor/popcount); the
    # NARROW upload is what the search mirror adopts at the end (u8 SIFT:
    # 4x less resident HBM + hop gather bandwidth, bit-identical distances)
    x = (
        x_narrow.astype(jnp.float32)
        if store._x.dtype == np.float32 and x_narrow.dtype != jnp.float32
        else x_narrow
    )
    valid = jnp.asarray(store._valid)  # all live objects are candidates
    sqn = D.sq_norms(x) if mirror._wants_sqnorm() else None
    mark("upload", x)

    # bf16 scan + exact re-rank where L2 ranking equals the metric (a single
    # MXU pass instead of the ~3 passes of f32-precision matmuls).  Angular
    # metrics qualify too: on unit-normalized rows cosine distance =
    # |a-b|^2/2 and angle = acos(1 - |a-b|^2/2), both monotone in L2 — so
    # the scan runs on a normalized copy and distances convert analytically
    # (the reference's NormalizedL2 kernel uses the same identity,
    # PrimitiveComparator.h:226-234).
    ang = metric in (
        DistanceType.COSINE,
        DistanceType.ANGLE,
        DistanceType.NORMALIZED_COSINE,
        DistanceType.NORMALIZED_ANGLE,
    )
    fast = metric in (DistanceType.L2, DistanceType.NORMALIZED_L2) or ang
    if fast:
        x_fast = x if x.dtype == jnp.float32 else x.astype(jnp.float32)
        if ang and not store.normalize:
            nrm = jnp.sqrt(jnp.maximum(D.sq_norms(x_fast), 1e-30))
            x_fast = x_fast / nrm[:, None]
        sqn_fast = (
            D.sq_norms(x_fast)
            if (ang and not store.normalize) or sqn is None
            else sqn
        )

    def _l2_to_metric(d, xp):
        """Convert unit-row L2 distances to the angular metric (exact)."""
        if not ang:
            return d
        if metric in (DistanceType.COSINE, DistanceType.NORMALIZED_COSINE):
            return 0.5 * d * d
        return xp.arccos(xp.clip(1.0 - 0.5 * d * d, -1.0, 1.0))

    # per-dispatch chunk: the tiled program handles many 4k-query tiles per
    # call (each dispatch over the axon tunnel costs ~0.1-1 s, so dispatch
    # COUNT — not MXU time — dominated the 1M build before tiling)
    qtile = 4096
    qblock = int(os.environ.get("NGT_TPU_BULK_QBLOCK", "0")) or (
        32 * qtile if fast else 4096
    )
    fresh = graph.node_count() == 0
    dev_chunks = [] if fresh else None
    host_chunks = []  # incremental append: (chunk, sel_i, sel_d) per chunk

    # scan_impl: the fused Pallas kernel (ops/pallas_scan.py) keeps the
    # score tiles in VMEM (measured 1.55-1.65x the XLA scan at 1M within
    # one process); NGT_TPU_SCAN_IMPL=xla reverts.  Engaged only at scale:
    # the kernel keeps ONE candidate per 128-row window, so its expected
    # edge loss is C(k+1,2)*128/n — negligible at >=512k rows (<=0.5% of
    # row edges at k=40, vs 0.06% for the XLA selector) but structurally
    # wrong at small n (a 200-row corpus spans 2 windows).  The
    # axon-tunneled runtime also RARELY fails a Pallas dispatch with a
    # bare INVALID_ARGUMENT (observed ~1 in 20 full-scan sequences,
    # correlated with fresh buffer layouts, never reproducible with fixed
    # buffers) — every use below is wrapped so a flake falls back to the
    # XLA scan instead of failing the build.
    scan_impl = ""
    if fast:
        scan_impl = os.environ.get("NGT_TPU_SCAN_IMPL", "")
        if not scan_impl:
            # auto-route needs the COMPILED kernel: on any other backend
            # fast_knn_l2_bulk falls back to interpret mode, which at
            # >=512k rows is orders of magnitude slower than the XLA scan
            # d_pad cap: the kernel's scoped-VMEM stack grows with the row
            # width and the 16 MB budget overflows 2x at d_pad~1000
            # (measured: gist-960 compile fails with vmem-stack OOM);
            # validated at d_pad=128 — stay on the XLA scan past 256
            scan_impl = (
                "pallas"
                if x_fast.shape[0] >= (1 << 19)
                and x_fast.shape[1] <= 256
                and jax.default_backend() == "tpu"
                else "xla"
            )

    def _scan_chunk(chunk, impl):
        bpad = (
            ((len(chunk) + qtile - 1) // qtile) * qtile
            if len(chunk) > qtile
            else _bucket(len(chunk))
        )
        # kc=2(k+1): any TRUE top-(k+1) neighbor ranks <= k+1 within its
        # own block, so a 2x window never loses it to bf16 noise; the
        # approximate selector and the re-rank gather both scale with kc
        return BF.fast_knn_l2_bulk(
            jnp.asarray(_pad_ids(chunk, bpad)), x_fast, valid, sqn_fast,
            k=k + 1, kc=2 * (k + 1), qblock=min(qtile, bpad),
            bf16_tile=os.environ.get("NGT_TPU_SCAN_F32_TILE", "") != "1",
            scan_impl=impl,
        )

    for off in range(0, len(pending), qblock):
        chunk = pending[off : off + qblock]
        if fast:
            try:
                ids, dists = _scan_chunk(chunk, scan_impl)
            except jax.errors.JaxRuntimeError:
                # COMPILE-time failures surface synchronously at the call
                # (client-side AOT), unlike the async dispatch flakes the
                # sync-point catches handle — downgrade this and all later
                # chunks to the XLA scan
                if scan_impl == "xla":
                    raise
                logger.warning(
                    "pallas scan compile/dispatch failed; using the XLA "
                    "scan for the rest of this build"
                )
                scan_impl = "xla"
                ids, dists = _scan_chunk(chunk, "xla")
        else:
            bpad = _bucket(len(chunk))
            qrows = jnp.asarray(store._x[_pad_ids(chunk, bpad)])
            ids, dists = BF.linear_search(
                qrows, x, valid, metric, k + 1, x_sqnorm=sqn
            )
        if fresh:
            # keep scan outputs ON DEVICE; the whole graph assembles in one
            # device program below (one host core makes the per-chunk
            # set_nodes/merge_edges path the build bottleneck at scale)
            if fast:
                dists = _l2_to_metric(dists, jnp)
            dev_chunks.append((ids[: len(chunk)], dists[: len(chunk)]))
            continue
        try:
            ids, dists = jax.device_get((ids, dists))
        except jax.errors.JaxRuntimeError:
            if scan_impl == "xla" or not fast:
                raise
            # incremental chunks apply host-side AFTER this download, so a
            # per-chunk redo on the XLA path is safe (nothing was applied)
            logger.warning(
                "pallas scan dispatch failed; redoing chunk on the XLA scan"
            )
            ids, dists = jax.device_get(_scan_chunk(chunk, "xla"))
        ids, dists = ids[: len(chunk)], dists[: len(chunk)]
        if fast:
            dists = _l2_to_metric(dists, np)
        # drop self-matches, keep k
        self_hit = ids == chunk[:, None]
        dists = np.where(self_hit, np.inf, dists)
        order = np.argsort(dists, axis=1, kind="stable")[:, :k]
        sel_i = np.take_along_axis(ids, order, axis=1)
        sel_d = np.take_along_axis(dists, order, axis=1)
        sel_i[~np.isfinite(sel_d)] = -1
        host_chunks.append((chunk, sel_i, sel_d))

    # incremental append: apply in TWO phases — every node row first, every
    # reverse edge second.  Interleaving them per chunk loses cross-chunk
    # reverse edges: chunk A's add_edges into a pending node of chunk B is
    # wiped when B's set_nodes later overwrites that row, so a chunked
    # append would end up less connected than a fresh build of the same
    # data (the fresh path's _bulk_graph_rows unions forward+reverse over
    # the WHOLE append at once).
    for chunk, sel_i, sel_d in host_chunks:
        graph.set_nodes(chunk, sel_i, sel_d)
    if prop.graph_type != GraphType.KNNG:
        for chunk, sel_i, sel_d in host_chunks:
            ok = sel_i >= 0
            graph.add_edges(
                sel_i[ok].astype(np.int64),
                np.repeat(chunk, ok.sum(axis=1)).astype(np.int32),
                sel_d[ok].astype(np.float32),
            )

    nbr_dev = None
    if fresh:

        def _concat(chunks):
            all_i = (
                jnp.concatenate([c[0] for c in chunks])
                if len(chunks) > 1 else chunks[0][0]
            )
            all_d = (
                jnp.concatenate([c[1] for c in chunks])
                if len(chunks) > 1 else chunks[0][1]
            )
            return all_i, all_d

        all_i, all_d = _concat(dev_chunks)
        # ONE tiny pull forces every enqueued scan chunk (the concat
        # depends on all of them) so a flaked pallas dispatch surfaces
        # HERE — before any graph state exists — instead of poisoning a
        # later download (or, for KNNG, the first post-build search,
        # where recovery is impossible).  Costs one tunnel round-trip.
        try:
            np.asarray(jax.device_get(all_i[0, 0]))
        except jax.errors.JaxRuntimeError:
            if scan_impl != "pallas":
                raise
            # nothing was applied to the graph yet: redo the whole scan
            # on the XLA path (best-effort — some flakes poison the
            # runtime itself, in which case this re-raises)
            logger.warning(
                "pallas scan failed at sync; redoing the scan on the XLA "
                "path"
            )
            dev_chunks = []
            for off in range(0, len(pending), qblock):
                chunk = pending[off : off + qblock]
                ids, dists = _scan_chunk(chunk, "xla")
                dists = _l2_to_metric(dists, jnp)
                dev_chunks.append((ids[: len(chunk)], dists[: len(chunk)]))
            all_i, all_d = _concat(dev_chunks)
            np.asarray(jax.device_get(all_i[0, 0]))
        mark("scan")
        # the per-chunk scan outputs are duplicated by the concat — at 8M
        # x kc=82 the chunks + concat together hold 2 x 5.2 GB of HBM that
        # the CC phase then OOMs on; drop the chunk refs as soon as the
        # concat is forced (the except path above rebuilds them)
        dev_chunks = None
        cap = store._x.shape[0]
        # enqueue the narrow-id slice BEFORE the rows program so its (one)
        # transfer is not queued behind the rows compute on the tunnel
        narrow_dev = (
            _narrow_slice(all_i, min(9, all_i.shape[1]))
            if prop.graph_type != GraphType.KNNG
            else None
        )
        nbr_dev, nbrd_dev, deg_dev = _bulk_graph_rows(
            jnp.asarray(pending), all_i, all_d,
            e_max=graph.e_max, cap=cap,
            reverse=prop.graph_type != GraphType.KNNG,
        )
        # all_i/all_d are dead once the narrow slice + rows programs are
        # enqueued (the runtime keeps them alive until those execute);
        # another 5.2 GB at 8M the CC download must not sit on top of
        all_i = all_d = None
        # no sync: the narrow-id download + host union-find below overlap
        # the rows program still executing on the device, so a blocking
        # profile mark here would serialize what production overlaps
        mark("rows")
        n_used = int(pending.max()) + 1 if len(pending) else 1
        first_labels = None
        if prop.graph_type != GraphType.KNNG:
            # fresh build: graph membership == store validity, so the
            # device valid mask stands in for has_node (not host-set yet)
            first_labels = _cc_labels_bulk(
                pending, cap, nbr_dev, valid,
                store._valid[:cap], narrow_dev,
            )
        mark("cc")
        graph._has_node[:] = False
        graph._has_node[pending] = True
        # the ~650 MB adjacency download (24 s of the round-2 66 s build
        # over the ~50-100 MB/s tunnel) is DEFERRED: the device arrays are
        # the pending source of truth, and the host copy materializes
        # lazily on first host access (save/mutate/stats); search runs off
        # the device mirror and never pays it
        graph.defer_rows(nbr_dev, nbrd_dev, deg_dev, n_used)
        mark("defer")

    if prop.truncation_threshold > 0:
        # bulk rows are EXACT k-NN, so the tail really is the set of
        # farthest edges and no re-search can improve the survivors; the
        # relink half of truncateEdgesOptimally (keeping cut-off targets
        # reachable) is covered globally by ensure_connected below.  The
        # incremental path applies the full drop+relink semantics
        # (truncate_drop/truncate_relink).
        live = np.nonzero(graph._has_node)[0]
        graph.truncate_rows(
            live.astype(np.int64), int(prop.truncation_threshold)
        )
        nbr_dev = None  # host rows changed wholesale; re-upload below
        first_labels = None
    live = np.nonzero(graph._has_node)[0].astype(np.int32)
    seeder.refresh(live, store._x, num_reps=default_reps(len(live)))
    mark("seeds")
    if prop.graph_type != GraphType.KNNG:
        _, nbr_dev = ensure_connected(
            store, graph, seeder, metric, nbr_dev=nbr_dev,
            first_labels=first_labels if fresh else None,
        )
    mark("connect")
    if nbr_dev is not None:
        # adopt the already-device-resident arrays instead of re-uploading
        # ~850 MB over the tunnel
        mirror.adopt(x, nbr_dev, sqn, x_narrow=x_narrow)
    else:
        mirror.sync_full()
    mark("mirror", mirror.nbr)
    if prof:
        import sys

        parts = [
            f"{marks[i][0]}={marks[i][1] - marks[i - 1][1]:.1f}s"
            for i in range(1, len(marks))
        ]
        print("# build_bulk profile: " + " ".join(parts), file=sys.stderr)
    return mirror


def truncate_drop(
    graph: GraphStore, rows: np.ndarray, threshold: int
) -> tuple[np.ndarray, np.ndarray]:
    """Phase 1 of optimal truncation (truncateEdgesOptimally,
    Graph.cpp:947-1008): cap each over-threshold row at its ``threshold``
    nearest edges (rows are distance-sorted, so the tail IS the excess) and
    erase the REVERSE direction of every dropped edge (the reference erases
    ``id`` from each truncated target's list).  Returns
    ``(dropped_targets, touched_rows)``."""
    rows = np.unique(np.asarray(rows, np.int64))
    rows = rows[(rows >= 0) & (rows < graph.capacity)]
    over = rows[graph.degree[rows] > threshold]
    if len(over) == 0:
        return np.zeros((0,), np.int64), np.zeros((0,), np.int64)
    tail_i = graph.nbr_ids[over, threshold:]
    src = np.repeat(over, tail_i.shape[1])
    tgt = tail_i.ravel().astype(np.int64)
    keep = tgt >= 0
    src, tgt = src[keep], tgt[keep]
    graph.truncate_rows(over, threshold)
    # vectorized reverse unlink: membership test on (tgt, src) pair keys
    cap = graph.capacity
    pair_keys = np.unique(tgt * cap + src)
    utgt = np.unique(tgt)
    utgt = utgt[graph._has_node[utgt]]
    rows_i = graph.nbr_ids[utgt]
    rows_d = graph.nbr_dist[utgt]
    qkeys = utgt[:, None] * cap + np.where(rows_i >= 0, rows_i, 0)
    hit = (rows_i >= 0) & np.isin(qkeys, pair_keys)
    if hit.any():
        rows_d[hit] = INF
        rows_i[hit] = -1
        order = np.argsort(rows_d, axis=1, kind="stable")
        graph.nbr_dist[utgt] = np.take_along_axis(rows_d, order, axis=1)
        graph.nbr_ids[utgt] = np.take_along_axis(rows_i, order, axis=1)
        graph.degree[utgt] = (graph.nbr_ids[utgt] >= 0).sum(axis=1)
    return utgt, np.unique(np.concatenate([over, utgt]))


def truncate_relink(
    store: VectorStore,
    graph: GraphStore,
    prop: Property,
    mirror: "DeviceMirror",
    utgt: np.ndarray,
    rep_rows: jax.Array,
    rep_sq: jax.Array | None,
    rep_ids_dev: jax.Array,
    metric: DistanceType,
) -> np.ndarray:
    """Phase 2 of optimal truncation (Graph.cpp:1015-1103): for every
    dropped target, search the (already truncated) graph for its nearest
    nodes and re-link the target bidirectionally to the nearest node other
    than itself — keeping cut-off targets well connected.  The reference
    runs one search per target in a mini thread pool with resultSize=2 and
    radius coefficient 1.1 (Graph.cpp:960-961); here all targets search in
    ONE batched device program (same compiled program as insertion — k is
    reused and the top hit extracted).  Returns touched row ids."""
    if len(utgt) == 0:
        return np.zeros((0,), np.int64)
    k = int(prop.edge_size_for_creation)
    bpad = _bucket(len(utgt))
    pad = _pad_ids(utgt, bpad)
    qrows = store._x[pad]
    qvalid = np.zeros((bpad,), bool)
    qvalid[: len(utgt)] = True
    bits, exact = wrap_hash_bits(mirror.capacity, prop.visited_bits_log2)
    kb = max(min(k, bpad - 1), 1)
    f_ids, f_d, _, _ = _fused_insert_search_jit(
        mirror.x, mirror.nbr, mirror.valid, mirror.sqnorm,
        rep_rows, rep_sq, rep_ids_dev,
        jnp.asarray(qrows), jnp.asarray(qvalid), 0.1,
        metric=metric, k=k, kb=kb, s=10,
        width=max(32, 2 * k), hash_bits=bits, exact_hash=exact,
    )
    f_ids, f_d = jax.device_get((f_ids, f_d))
    f_ids, f_d = f_ids[: len(utgt)], f_d[: len(utgt)]
    # nearest found node other than the target itself (nearest == target
    # means the target is still reachable — no re-link, Graph.cpp:1048-1052)
    self_hit = f_ids == utgt[:, None]
    first_other = np.argmax((f_ids >= 0) & ~self_hit, axis=1)
    near_i = np.take_along_axis(f_ids, first_other[:, None], axis=1)[:, 0]
    near_d = np.take_along_axis(f_d, first_other[:, None], axis=1)[:, 0]
    found_self = self_hit[:, 0]
    ok = (near_i >= 0) & np.isfinite(near_d) & ~found_self
    if not ok.any():
        return np.zeros((0,), np.int64)
    t = utgt[ok].astype(np.int64)
    m = near_i[ok].astype(np.int32)
    d = near_d[ok].astype(np.float32)
    graph.add_edges(t, m, d)
    graph.add_edges(m.astype(np.int64), t.astype(np.int32), d)
    return np.unique(np.concatenate([t, m.astype(np.int64)]))


def build_anng(
    store: VectorStore,
    graph: GraphStore,
    seeder: Seeder,
    prop: Property,
    pending: np.ndarray,
    mirror: DeviceMirror | None = None,
    progress=None,
) -> DeviceMirror:
    """Index every id in ``pending`` (ids already inserted into the store but
    lacking graph nodes).  Returns the device mirror for reuse."""
    k = int(prop.edge_size_for_creation)
    eps = float(prop.insertion_radius_coefficient) - 1.0
    metric = store.metric
    batch = int(prop.device_batch_size)
    pending = np.asarray(pending, dtype=np.int32)
    if len(pending) == 0:
        if mirror is None:
            mirror = DeviceMirror(store, graph)
            mirror.sync_full()
        return mirror

    graph.ensure_capacity(store._x.shape[0])

    # ---- bootstrap: exact kNN among the first chunk (the reference grows
    # from a single object; starting from an exact mini-KNNG is strictly
    # better and one matmul)
    start = 0
    if graph.node_count() == 0:
        b0 = min(batch, len(pending))
        ids0 = pending[:b0]
        rows = store._x[ids0]  # keep dtype: bitwise metrics need uint8
        q = jnp.asarray(rows)
        d = np.array(D.pairwise(metric, q, q))  # writable copy
        np.fill_diagonal(d, INF)
        kk = min(k, b0 - 1) if b0 > 1 else 0
        if kk > 0:
            nn = np.argsort(d, axis=1, kind="stable")[:, :kk]
            nd = np.take_along_axis(d, nn, axis=1)
            graph.set_nodes(ids0, ids0[nn].astype(np.int32), nd.astype(np.float32))
            graph.add_edges(
                ids0[nn].ravel().astype(np.int64),
                np.repeat(ids0, kk).astype(np.int32),
                nd.ravel().astype(np.float32),
            )
            if prop.truncation_threshold > 0:
                graph.truncate_rows(
                    ids0.astype(np.int64), int(prop.truncation_threshold)
                )
        else:
            graph.set_nodes(
                ids0,
                np.full((b0, 1), -1, np.int32),
                np.full((b0, 1), INF, np.float32),
            )
        start = b0
        seeder.refresh(ids0, store._x, num_reps=min(1024, b0))

    if mirror is None:
        mirror = DeviceMirror(store, graph)
    mirror.sync_full()

    next_seed_refresh = max(2 * graph.node_count(), 1024)

    if seeder.num_reps == 0 and graph.node_count() > 0:
        live = np.nonzero(graph._has_node)[0].astype(np.int32)
        seeder.refresh(live, store._x, num_reps=default_reps(len(live)))

    rep_rows = jnp.asarray(store._x[seeder.rep_ids])
    rep_sq = (
        D.sq_norms(rep_rows) if mirror.sqnorm is not None else None
    )
    rep_ids_dev = jnp.asarray(seeder.rep_ids)

    # sq8 insertion search: int8 neighbor blocks for the traversal + exact
    # re-rank (see _fused_insert_search_sq8); only for metrics where the
    # scaled-L2 ranking is monotone with the true metric.  Opt-in: measured
    # on hardware, per-batch block MAINTENANCE (re-gathering codes for every
    # adjacency row the batch touched) costs more random reads than the
    # cheaper traversal saves, so "auto" resolves to the exact path; blocks
    # pay off at query time where they are built once (quant.qgraph).
    sq8 = (
        prop.build_mode == "sq8"
        and metric in _SQ8_METRICS
        and prop.graph_type not in (GraphType.KNNG, GraphType.BKNNG)
    )
    codes_dev = blocks_dev = None
    sq8_scale = 1.0
    if sq8:
        sample = store._x[pending[: min(len(pending), 4096)]]
        peak = float(np.abs(sample).max()) if len(sample) else 1.0
        sq8_scale = max(peak * 1.25, 1e-30) / 127.0
        codes_dev, blocks_dev = _make_codes_blocks(
            mirror.x, mirror.nbr, 1.0 / sq8_scale
        )

    # build-time budget (reference BuildTimeController, Index.cpp:433-482):
    # degrade insertion ε (and thereby per-batch work) when the projected
    # build time would exceed prop.build_time_limit (hours in the reference;
    # we use minutes — document in Property if changed)
    import time as _time

    limit_s = float(prop.build_time_limit) * 60.0
    t_start = _time.time()

    for off in range(start, len(pending), batch):
        if limit_s > 0 and off > start:
            frac = (off - start) / max(len(pending) - start, 1)
            projected = (_time.time() - t_start) / max(frac, 1e-9)
            if projected > limit_s and eps > 0.02:
                eps = max(eps * 0.5, 0.02)
        chunk = pending[off : off + batch]
        bsz = len(chunk)
        bpad = _bucket(bsz)
        qrows = store._x[_pad_ids(chunk, bpad)]
        qvalid = np.zeros((bpad,), bool)
        qvalid[:bsz] = True

        bits, exact = wrap_hash_bits(mirror.capacity, prop.visited_bits_log2)
        kb = max(min(k, bpad - 1), 1)
        exact_candidates = prop.graph_type in (
            GraphType.KNNG, GraphType.BKNNG
        )
        if exact_candidates:
            # KNNG/BKNNG: exact kNN edges by brute force (the reference's
            # searchForKNNGInsertion is a linear scan, Index.h:839-856)
            from ngt_tpu.ops import bruteforce as BF

            f_ids, f_d = BF.linear_search(
                jnp.asarray(qrows), mirror.x, mirror.valid, metric, k,
                x_sqnorm=mirror.sqnorm,
            )
            pb = D.pairwise(metric, jnp.asarray(qrows), jnp.asarray(qrows))
            eye = np.eye(bpad, dtype=bool)
            pbn = np.array(pb)
            pbn[eye] = INF
            pbn[:, ~qvalid] = INF
            b_ids = np.argsort(pbn, axis=1, kind="stable")[:, :kb]
            b_d = np.take_along_axis(pbn, b_ids, axis=1)
            f_ids, f_d = jax.device_get((f_ids, f_d))
        elif sq8:
            qmax = float(np.abs(qrows).max())
            if qmax > 127.0 * sq8_scale:
                # outlier beyond the int8 range: grow the scale far enough
                # to cover it (a single doubling can still clip when the
                # sampling window missed a heavy-tailed value) and re-encode
                while qmax > 127.0 * sq8_scale:
                    sq8_scale *= 2.0
                codes_dev, blocks_dev = _make_codes_blocks(
                    mirror.x, mirror.nbr, 1.0 / sq8_scale
                )
            f_ids, f_d, b_ids, b_d = _fused_insert_search_sq8_jit(
                mirror.x, mirror.nbr, mirror.valid, mirror.sqnorm,
                blocks_dev, codes_dev,
                rep_rows, rep_sq, rep_ids_dev,
                jnp.asarray(qrows), jnp.asarray(qvalid), eps,
                jnp.float32(1.0 / sq8_scale),
                metric=metric, k=k, kb=kb, s=max(prop.seed_size, 10),
                width=max(32, 2 * k), hash_bits=bits, exact_hash=exact,
            )
            f_ids, f_d, b_ids, b_d = jax.device_get(
                (f_ids, f_d, b_ids, b_d)
            )
        else:
            f_ids, f_d, b_ids, b_d = _fused_insert_search_jit(
                mirror.x, mirror.nbr, mirror.valid, mirror.sqnorm,
                rep_rows, rep_sq, rep_ids_dev,
                jnp.asarray(qrows), jnp.asarray(qvalid), eps,
                metric=metric, k=k, kb=kb, s=max(prop.seed_size, 10),
                width=max(32, 2 * k), hash_bits=bits, exact_hash=exact,
                expand=max(prop.search_expand, 1),
            )
            f_ids, f_d, b_ids, b_d = jax.device_get(
                (f_ids, f_d, b_ids, b_d)
            )
        found_i, found_d = f_ids[:bsz], f_d[:bsz]

        # ---- intra-batch pairwise merge (reference Index.cpp:687-703):
        # batch-local indices -> global chunk ids; inf rows masked
        if bsz > 1:
            bi = np.clip(b_ids[:bsz], 0, bsz - 1)
            bd = b_d[:bsz].astype(np.float32)
            cand_i = np.concatenate(
                [found_i, np.where(np.isfinite(bd), chunk[bi], -1)], axis=1
            )
            cand_d = np.concatenate([found_d, bd], axis=1)
        else:
            cand_i, cand_d = found_i, found_d

        # never link a node to itself (possible when a removed slot is
        # reused and stale representatives alias the new object)
        cand_i = np.where(cand_i == chunk[:, None], -1, cand_i)
        cand_d = np.where(cand_i >= 0, cand_d, INF)
        order = np.argsort(cand_d, axis=1, kind="stable")[:, :k]
        sel_i = np.take_along_axis(cand_i, order, axis=1)
        sel_d = np.take_along_axis(cand_d, order, axis=1)
        sel_i[~np.isfinite(sel_d)] = -1

        if prop.graph_type == GraphType.IANNG:
            # mutual-k pruning (insertIANNGNode, Graph.h:628-635): keep a
            # neighbor only if the new node would enter ITS current k-NN
            tgt = np.clip(sel_i, 0, graph.capacity - 1)
            kth = np.where(
                graph.degree[tgt] >= k,
                graph.nbr_dist[tgt, np.minimum(k, graph.e_max) - 1],
                INF,
            )
            drop = (sel_i >= 0) & (sel_d > kth)
            sel_d[drop] = INF
            sel_i[drop] = -1

        graph.set_nodes(chunk, sel_i, sel_d)
        ok = sel_i >= 0
        if prop.graph_type != GraphType.KNNG:
            # reverse edges (ANNG/IANNG/BKNNG; KNNG is directed:
            # insertKNNGNode adds none, Graph.h:577-609)
            graph.add_edges(
                sel_i[ok].astype(np.int64),
                np.repeat(chunk, ok.sum(axis=1)).astype(np.int32),
                sel_d[ok].astype(np.float32),
            )
        tr_tgts = None
        if prop.graph_type != GraphType.KNNG and prop.truncation_threshold > 0:
            # optimal truncation phase 1: cap + reverse unlink
            # (truncateEdgesOptimally, Graph.cpp:947-1008)
            tr_tgts, tr_touched = truncate_drop(
                graph, sel_i[ok].astype(np.int64),
                int(prop.truncation_threshold),
            )
        else:
            tr_touched = np.zeros((0,), np.int64)

        affected = np.unique(
            np.concatenate([
                chunk.astype(np.int64), sel_i[ok].astype(np.int64), tr_touched,
            ])
        )
        mirror.update_rows(chunk, affected)
        if tr_tgts is not None and len(tr_tgts):
            # phase 2 on the updated mirror: re-link each cut-off target to
            # its nearest surviving node (Graph.cpp:1015-1103)
            touched2 = truncate_relink(
                store, graph, prop, mirror, tr_tgts,
                rep_rows, rep_sq, rep_ids_dev, metric,
            )
            if len(touched2):
                mirror.update_rows(None, touched2)

        if sq8:
            if codes_dev.shape[0] != mirror.capacity:
                # capacity grew: rebuild the code/block mirrors wholesale
                codes_dev, blocks_dev = _make_codes_blocks(
                    mirror.x, mirror.nbr, 1.0 / sq8_scale
                )
            else:
                opad = _pad_ids(chunk, _bucket(len(chunk)))
                apad = _pad_ids(
                    affected.astype(np.int64), _bucket(len(affected))
                )
                obj_codes = np.clip(
                    np.round(store._x[opad].astype(np.float32) / sq8_scale),
                    -127, 127,
                ).astype(np.int8)
                codes_dev, blocks_dev = _update_codes_blocks(
                    codes_dev, blocks_dev,
                    jnp.asarray(opad), jnp.asarray(obj_codes),
                    jnp.asarray(apad), jnp.asarray(graph.nbr_ids[apad]),
                )

        if graph.node_count() >= next_seed_refresh:
            live = np.nonzero(graph._has_node)[0].astype(np.int32)
            seeder.refresh(live, store._x, num_reps=default_reps(len(live)))
            next_seed_refresh = 2 * graph.node_count()
            rep_rows = jnp.asarray(store._x[seeder.rep_ids])
            rep_sq = (
                D.sq_norms(rep_rows) if mirror.sqnorm is not None else None
            )
            rep_ids_dev = jnp.asarray(seeder.rep_ids)
        if progress is not None:
            progress(off + bsz, len(pending))

    live = np.nonzero(graph._has_node)[0].astype(np.int32)
    seeder.refresh(live, store._x, num_reps=default_reps(len(live)))
    return mirror


def batch_remove_objects(
    store: VectorStore,
    graph: GraphStore,
    oids: np.ndarray,
    metric: DistanceType,
) -> np.ndarray:
    """Delete a SET of objects with batch-wide passes instead of per-id
    scans (the per-id ``remove_object`` pays one full O(N*E) reverse scan
    per removal; 10k removals at 1M would be 10k * 80M-element scans).

    Same semantics as the per-id path (the batched analogue of the
    reference's per-delete ``removeEdgesReliably``, Graph.cpp:641-864):

    1. tombstone all removed nodes (capturing their former neighbors);
    2. ONE vectorized reverse scan drops every edge into the removed set;
    3. repair: each removed node's surviving former neighbors are linked to
       their nearest former co-neighbor (one vmapped pairwise program over
       all removal groups), keeping each local component attached exactly
       like the per-id repair does.

    Returns the ids whose adjacency rows changed so the caller can
    scatter-update the device mirror once."""
    import jax

    oids = np.unique(np.asarray(oids, np.int64))
    if len(oids) == 0:
        return np.zeros((0,), np.int64)
    n = store._x.shape[0]
    graph.ensure_capacity(n)
    cap = graph.capacity
    gone = np.zeros(cap, bool)
    gone[oids] = True

    # 1. capture former neighbor lists, then tombstone (one fancy-index
    #    store per array — not R remove_node calls)
    formers = graph.nbr_ids[oids].copy()               # [R, E]
    graph.nbr_ids[oids] = -1
    graph.nbr_dist[oids] = INF
    graph.degree[oids] = 0
    graph._has_node[oids] = False

    # 2. one reverse scan over the whole adjacency
    rows_i = graph.nbr_ids[:n]
    hit_rows = np.nonzero(
        (gone[np.clip(rows_i, 0, cap - 1)] & (rows_i >= 0)).any(axis=1)
    )[0]
    graph.remove_edges_to_many(hit_rows, gone)

    for oid in oids:
        store.remove(int(oid))

    # 3. repair: nearest surviving former co-neighbor within each removal
    #    group.  One fixed-shape vmapped pairwise per chunk (groups are
    #    independent, so the batched program IS the per-id loop).
    fsafe = np.clip(formers, 0, n - 1)
    alive = (
        (formers >= 0)
        & ~gone[np.clip(formers, 0, cap - 1)]
        & graph._has_node[np.clip(formers, 0, cap - 1)]
    )                                                   # [R, E]
    touched = [oids, hit_rows.astype(np.int64)]
    groups = np.nonzero((alive.sum(axis=1) >= 2))[0]
    if len(groups):
        e = formers.shape[1]
        pair_group = jax.jit(jax.vmap(lambda r: D.pairwise(metric, r, r)))
        chunk = max(1, min(len(groups), (1 << 22) // max(e * e, 1)))
        src_all, dst_all, d_all = [], [], []
        eye = np.eye(e, dtype=bool)
        for off in range(0, len(groups), chunk):
            gsel = groups[off : off + chunk]
            if len(gsel) < chunk:  # pad to the compiled shape
                gsel = np.concatenate(
                    [gsel, np.repeat(gsel[-1:], chunk - len(gsel))]
                )
            rows = jnp.asarray(store._x[fsafe[gsel]])  # [C, E, D]
            d = np.array(pair_group(rows))             # [C, E, E] (writable)
            ok = alive[gsel]
            d[~ok[:, :, None] | ~ok[:, None, :] | eye[None]] = INF
            nn = np.argmin(d, axis=2)                  # [C, E]
            nd = np.take_along_axis(d, nn[:, :, None], axis=2)[:, :, 0]
            keep = ok & np.isfinite(nd)
            gi, mi = np.nonzero(keep)
            src_all.append(formers[gsel[gi], mi])
            dst_all.append(formers[gsel[gi], nn[gi, mi]])
            d_all.append(nd[gi, mi])
        if src_all:
            src = np.concatenate(src_all).astype(np.int64)
            dst = np.concatenate(dst_all).astype(np.int32)
            dd = np.concatenate(d_all).astype(np.float32)
            graph.add_edges(src, dst, dd)
            graph.add_edges(dst.astype(np.int64), src.astype(np.int32), dd)
            touched.append(src)
            touched.append(dst.astype(np.int64))
    return np.unique(np.concatenate(touched))


def remove_object(
    store: VectorStore, graph: GraphStore, oid: int, metric: DistanceType
) -> np.ndarray:
    """Delete an object: tombstone + vectorized unlink + local repair.

    The reference relinks the deleted node's neighborhood with an MST-like
    pass (``removeEdgesReliably``, Graph.cpp:641-864).  The batched
    equivalent: drop all edges to the node, then reconnect its former
    neighbors to their nearest former co-neighbor so the local component
    stays attached (verified by the invariant checker instead of pointer
    surgery).  Returns the ids whose adjacency rows changed (incl. ``oid``)
    so the caller can scatter-update its device mirror instead of paying a
    full HBM re-upload per removal (the reference's delete is likewise
    incremental)."""
    former = graph.remove_node(oid)
    former = former[former >= 0]
    # vectorized reverse scan (no back-pointers are stored; the reference
    # walks candidate nodes similarly)
    n = store._x.shape[0]
    hit_rows = np.nonzero((graph.nbr_ids[:n] == oid).any(axis=1))[0]
    graph.remove_edges_to(hit_rows, oid)
    store.remove(oid)

    former = np.unique(np.concatenate([former, hit_rows.astype(np.int32)]))
    former = former[(former != oid) & (former >= 0)]
    former = former[graph._has_node[former]]
    touched = [np.asarray([oid], np.int64), former.astype(np.int64)]
    if len(former) >= 2:
        rows = jnp.asarray(store._x[former])
        d = np.array(D.pairwise(metric, rows, rows))
        np.fill_diagonal(d, INF)
        nn = np.argmin(d, axis=1)
        nd = d[np.arange(len(former)), nn]
        graph.add_edges(
            former.astype(np.int64),
            former[nn].astype(np.int32),
            nd.astype(np.float32),
        )
        graph.add_edges(
            former[nn].astype(np.int64),
            former.astype(np.int32),
            nd.astype(np.float32),
        )
        touched.append(former[nn].astype(np.int64))
    return np.unique(np.concatenate(touched))
