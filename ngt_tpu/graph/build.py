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

from ngt_tpu.graph.search import graph_search
from ngt_tpu.graph.storage import GraphStore
from ngt_tpu.ops import distances as D
from ngt_tpu.properties import DistanceType, Property
from ngt_tpu.seeds import Seeder
from ngt_tpu.store import VectorStore

INF = np.float32(np.inf)


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_rows(arr, idx, vals):
    return arr.at[idx].set(vals)


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

    def __init__(self, store: VectorStore, graph: GraphStore):
        self.store = store
        self.graph = graph
        self.x = None
        self.valid = None
        self.sqnorm = None
        self.nbr = None
        self.capacity = 0

    def _wants_sqnorm(self) -> bool:
        return self.store.metric in (
            DistanceType.L2,
            DistanceType.COSINE,
            DistanceType.ANGLE,
            DistanceType.POINCARE,
        )

    def sync_full(self):
        self.graph.ensure_capacity(self.store._x.shape[0])
        self.x = jnp.asarray(self.store._x)
        self.valid = jnp.asarray(self.store._valid)
        self.nbr = jnp.asarray(self.graph.nbr_ids[: self.store._x.shape[0]])
        self.sqnorm = D.sq_norms(self.x) if self._wants_sqnorm() else None
        self.capacity = self.store._x.shape[0]

    def update_rows(self, obj_ids: np.ndarray | None, nbr_ids: np.ndarray | None):
        if self.x is None or self.capacity != self.store._x.shape[0]:
            self.sync_full()
            return
        if obj_ids is not None and len(obj_ids):
            pad = _pad_ids(obj_ids, _bucket(len(obj_ids)))
            idx = jnp.asarray(pad)
            self.x = _scatter_rows(self.x, idx, jnp.asarray(self.store._x[pad]))
            self.valid = _scatter_rows(
                self.valid, idx, jnp.asarray(self.store._valid[pad])
            )
            if self.sqnorm is not None:
                rows = self.store._x[pad].astype(np.float32)
                self.sqnorm = _scatter_rows(
                    self.sqnorm, idx, jnp.asarray((rows * rows).sum(-1))
                )
        if nbr_ids is not None and len(nbr_ids):
            pad = _pad_ids(np.asarray(nbr_ids), _bucket(len(nbr_ids)))
            self.nbr = _scatter_rows(
                self.nbr, jnp.asarray(pad), jnp.asarray(self.graph.nbr_ids[pad])
            )


def _hash_bits_for(capacity: int) -> tuple[int, bool]:
    bits = max(min(int(math.ceil(math.log2(max(capacity, 2)))), 17), 10)
    return bits, capacity <= (1 << bits)


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

    for off in range(start, len(pending), batch):
        chunk = pending[off : off + batch]
        bsz = len(chunk)
        bpad = _bucket(bsz)
        qrows = store._x[_pad_ids(chunk, bpad)]
        queries = jnp.asarray(qrows)

        seeds = seeder.seeds_for(queries, seed_size=max(prop.seed_size, 10))
        bits, exact = _hash_bits_for(mirror.capacity)
        res = graph_search(
            mirror.x,
            mirror.nbr,
            mirror.valid,
            queries,
            seeds,
            metric=metric,
            k=k,
            epsilon=eps,
            width=max(32, 2 * k),
            edge_size=0,
            hash_bits=bits,
            exact_hash=exact,
            x_sqnorm=mirror.sqnorm,
        )
        found_i = np.asarray(res.ids)[:bsz]
        found_d = np.asarray(res.dists)[:bsz]

        # ---- intra-batch pairwise merge (reference Index.cpp:687-703)
        if bsz > 1:
            pb = np.array(
                D.pairwise(metric, queries, queries)
            )[:bsz, :bsz]
            np.fill_diagonal(pb, INF)
            kb = min(k, bsz - 1)
            bi = np.argpartition(pb, kb - 1, axis=1)[:, :kb]
            bd = np.take_along_axis(pb, bi, axis=1)
            cand_i = np.concatenate([found_i, chunk[bi].astype(np.int32)], axis=1)
            cand_d = np.concatenate([found_d, bd.astype(np.float32)], axis=1)
        else:
            cand_i, cand_d = found_i, found_d

        cand_d = np.where(cand_i >= 0, cand_d, INF)
        order = np.argsort(cand_d, axis=1, kind="stable")[:, :k]
        sel_i = np.take_along_axis(cand_i, order, axis=1)
        sel_d = np.take_along_axis(cand_d, order, axis=1)
        sel_i[~np.isfinite(sel_d)] = -1

        graph.set_nodes(chunk, sel_i, sel_d)
        ok = sel_i >= 0
        graph.add_edges(
            sel_i[ok].astype(np.int64),
            np.repeat(chunk, ok.sum(axis=1)).astype(np.int32),
            sel_d[ok].astype(np.float32),
        )

        affected = np.unique(
            np.concatenate([chunk.astype(np.int64), sel_i[ok].astype(np.int64)])
        )
        mirror.update_rows(chunk, affected)

        if graph.node_count() >= next_seed_refresh:
            live = np.nonzero(graph._has_node)[0].astype(np.int32)
            seeder.refresh(live, store._x, num_reps=min(4096, len(live)))
            next_seed_refresh = 2 * graph.node_count()
        if progress is not None:
            progress(off + bsz, len(pending))

    live = np.nonzero(graph._has_node)[0].astype(np.int32)
    seeder.refresh(live, store._x, num_reps=min(4096, len(live)))
    return mirror


def remove_object(
    store: VectorStore, graph: GraphStore, oid: int, metric: DistanceType
):
    """Delete an object: tombstone + vectorized unlink + local repair.

    The reference relinks the deleted node's neighborhood with an MST-like
    pass (``removeEdgesReliably``, Graph.cpp:641-864).  The batched
    equivalent: drop all edges to the node, then reconnect its former
    neighbors to their nearest former co-neighbor so the local component
    stays attached (verified by the invariant checker instead of pointer
    surgery)."""
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
