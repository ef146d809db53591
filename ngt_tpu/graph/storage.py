"""GraphStore — fixed-width adjacency replacing the reference's per-node
variable-length sorted edge lists (``GraphRepository`` of ``GraphNode``;
reference lib/NGT/Graph.h:62-183).

Host numpy is authoritative (graph mutation is inherently serial in the
reference too — ``insertMultipleSearchResults`` runs on the coordinator
thread, Index.cpp:670-719); the device holds a mirror used by the batched
search kernel, updated by row scatter.

Layout: ``nbr_ids[N_cap, E_max]`` int32 (-1 padded), ``nbr_dist`` f32
(+inf padded), rows sorted ascending by distance (the reference keeps edge
lists sorted; Graph.h:845-886 ``addEdge`` does a sorted insert).  A fixed
E_max replaces the reference's unbounded ANNG in-degree growth: when a row
is full, a farther edge is dropped (the behavior of
``addEdgeDeletingExcessEdges``, Graph.h:888-934).
"""

from __future__ import annotations

import numpy as np

INF = np.float32(np.inf)


def merge_edge_rows(uniq, cur_i, cur_d, targets, srcs, dists, e_max):
    """Bounded sorted merge of add-edges into existing rows (pure numpy).

    ``targets`` must be sorted ascending with ``uniq = unique(targets)`` and
    ``cur_i/cur_d`` the current rows aligned with ``uniq``.  Returns
    ``(new_i, new_d, new_deg)`` aligned with ``uniq``.  Semantics match the
    reference's ``addEdgeDeletingExcessEdges`` (Graph.h:888-934): sorted
    insert, duplicate (target, src) pairs skipped, farthest edge dropped
    when a row is full."""
    starts = np.searchsorted(targets, uniq)
    counts = np.diff(np.append(starts, len(targets)))
    a_max = int(counts.max())
    nt = len(uniq)
    slot = np.arange(len(targets)) - np.repeat(starts, counts)
    add_i = np.full((nt, a_max), -1, dtype=np.int32)
    add_d = np.full((nt, a_max), INF, dtype=np.float32)
    grp = np.repeat(np.arange(nt), counts)
    add_i[grp, slot] = srcs
    add_d[grp, slot] = dists

    # drop adds already present in the row
    dup = (add_i[:, :, None] == cur_i[:, None, :]).any(axis=2)
    # ... and duplicate (target, src) pairs within this batch (keep first)
    if a_max <= 128:
        eq = add_i[:, :, None] == add_i[:, None, :]
        lower = np.tril(np.ones((a_max, a_max), bool), -1)
        dup |= (eq & lower[None]).any(axis=2)
    else:
        for r in range(nt):
            seen: set = set()
            for j in range(a_max):
                v = int(add_i[r, j])
                if v in seen:
                    dup[r, j] = True
                seen.add(v)
    dup |= add_i < 0
    add_d[dup] = INF
    add_i[dup] = -1

    merged_d = np.concatenate([cur_d, add_d], axis=1)
    merged_i = np.concatenate([cur_i, add_i], axis=1)
    order2 = np.argsort(merged_d, axis=1, kind="stable")[:, :e_max]
    new_d = np.take_along_axis(merged_d, order2, axis=1)
    new_i = np.take_along_axis(merged_i, order2, axis=1)
    return new_i, new_d, (new_i >= 0).sum(axis=1).astype(np.int32)


class GraphStore:
    def __init__(self, max_edges: int = 64, capacity: int = 1024):
        self.e_max = int(max_edges)
        cap = max(int(capacity), 16)
        self._h_ids = np.full((cap, self.e_max), -1, dtype=np.int32)
        self._h_dist = np.full((cap, self.e_max), INF, dtype=np.float32)
        self._h_deg = np.zeros((cap,), dtype=np.int32)
        self._has_node = np.zeros((cap,), dtype=bool)
        #: (dev_ids, dev_dist, dev_deg, n_used) when the freshly-built
        #: adjacency still lives only on device (bulk build defers the
        #: ~650 MB download over the ~50-100 MB/s tunnel until something
        #: actually needs the host copy — persistence, mutation, stats;
        #: search runs off the device mirror and never pays it)
        self._deferred = None

    # Host arrays are exposed through materializing properties: ANY host
    # read or mutation first completes the deferred device->host download,
    # so every existing consumer stays correct without knowing about
    # deferral.  Assignment (e.g. ensure_capacity realloc) bypasses it.
    @property
    def nbr_ids(self) -> np.ndarray:
        self._materialize()
        return self._h_ids

    @nbr_ids.setter
    def nbr_ids(self, v: np.ndarray) -> None:
        self._h_ids = v

    @property
    def nbr_dist(self) -> np.ndarray:
        self._materialize()
        return self._h_dist

    @nbr_dist.setter
    def nbr_dist(self, v: np.ndarray) -> None:
        self._h_dist = v

    @property
    def degree(self) -> np.ndarray:
        self._materialize()
        return self._h_deg

    @degree.setter
    def degree(self, v: np.ndarray) -> None:
        self._h_deg = v

    def defer_rows(self, dev_ids, dev_dist, dev_deg, n_used: int) -> None:
        """Adopt device-resident adjacency as the pending source of truth
        for rows [0, n_used); the host copy materializes lazily on first
        host access."""
        if n_used > self._h_ids.shape[0]:
            raise ValueError("defer_rows: host capacity too small")
        self._deferred = (dev_ids, dev_dist, dev_deg, int(n_used))

    def _materialize(self) -> None:
        if self._deferred is None:
            return
        import jax

        dev_ids, dev_dist, dev_deg, n = self._deferred
        self._deferred = None  # clear first: device_get may re-enter via GC
        ids_h, dist_h, deg_h = jax.device_get(
            (dev_ids[:n], dev_dist[:n], dev_deg[:n])
        )
        self._h_ids[:n] = ids_h
        self._h_dist[:n] = dist_h
        self._h_deg[:n] = deg_h

    @property
    def capacity(self) -> int:
        return self._h_ids.shape[0]

    def ensure_capacity(self, n: int) -> bool:
        """Grow to hold node id n-1; returns True if a realloc happened."""
        if n <= self.capacity:
            return False
        cap = self.capacity
        while cap < n:
            cap *= 2
        ids = np.full((cap, self.e_max), -1, dtype=np.int32)
        ids[: self.nbr_ids.shape[0]] = self.nbr_ids
        dist = np.full((cap, self.e_max), INF, dtype=np.float32)
        dist[: self.nbr_dist.shape[0]] = self.nbr_dist
        deg = np.zeros((cap,), dtype=np.int32)
        deg[: self.degree.shape[0]] = self.degree
        has = np.zeros((cap,), dtype=bool)
        has[: self._has_node.shape[0]] = self._has_node
        self.nbr_ids, self.nbr_dist, self.degree, self._has_node = ids, dist, deg, has
        return True

    def has_node(self, oid: int) -> bool:
        return 0 <= oid < self.capacity and bool(self._has_node[oid])

    def node_count(self) -> int:
        return int(self._has_node.sum())

    def get_node(self, oid: int) -> tuple[np.ndarray, np.ndarray]:
        d = int(self.degree[oid])
        return self.nbr_ids[oid, :d].copy(), self.nbr_dist[oid, :d].copy()

    # ------------------------------------------------------------ mutation --
    def set_nodes(self, oids: np.ndarray, ids: np.ndarray, dists: np.ndarray):
        """Replace whole rows (ids/dists [T, <=E_max], -1/inf padded, sorted)."""
        oids = np.asarray(oids, dtype=np.int64)
        self.ensure_capacity(int(oids.max()) + 1 if len(oids) else 0)
        t, k = ids.shape
        if k > self.e_max:
            ids, dists = ids[:, : self.e_max], dists[:, : self.e_max]
            k = self.e_max
        row_i = np.full((t, self.e_max), -1, dtype=np.int32)
        row_d = np.full((t, self.e_max), INF, dtype=np.float32)
        row_i[:, :k] = ids
        row_d[:, :k] = np.where(ids >= 0, dists, INF)
        row_i[row_d == INF] = -1
        order = np.argsort(row_d, axis=1, kind="stable")
        row_d = np.take_along_axis(row_d, order, axis=1)
        row_i = np.take_along_axis(row_i, order, axis=1)
        self.nbr_ids[oids] = row_i
        self.nbr_dist[oids] = row_d
        self.degree[oids] = (row_i >= 0).sum(axis=1)
        self._has_node[oids] = True

    def add_edges(self, targets: np.ndarray, srcs: np.ndarray, dists: np.ndarray):
        """Bulk sorted-insert of edges target->src (the reverse-edge step of
        ANNG insertion; reference ``addEdge`` calls in insertANNGNode,
        Graph.h:611-626).  Full rows drop the farthest edge.  Duplicate
        (target, src) pairs are skipped like the reference's
        ``addEdgeDeletingExcessEdges`` duplicate check (Graph.h:896-907)."""
        if len(targets) == 0:
            return
        targets = np.asarray(targets, dtype=np.int64)
        srcs = np.asarray(srcs, dtype=np.int32)
        dists = np.asarray(dists, dtype=np.float32)
        self.ensure_capacity(int(targets.max()) + 1)

        from ngt_tpu import native

        if native.merge_edges(
            self.nbr_ids, self.nbr_dist, self.degree,
            self._has_node.view(np.uint8), targets, srcs, dists,
        ):
            return

        order = np.argsort(targets, kind="stable")
        targets, srcs, dists = targets[order], srcs[order], dists[order]
        uniq = np.unique(targets)
        new_i, new_d, new_deg = merge_edge_rows(
            uniq, self.nbr_ids[uniq], self.nbr_dist[uniq],
            targets, srcs, dists, self.e_max,
        )
        self.nbr_ids[uniq] = new_i
        self.nbr_dist[uniq] = new_d
        self.degree[uniq] = new_deg
        self._has_node[uniq] = True

    def truncate_rows(self, oids: np.ndarray, threshold: int) -> None:
        """Cap the given rows to their `threshold` nearest edges (rows are
        kept distance-sorted, so this is a tail drop)."""
        oids = np.asarray(oids, np.int64)
        oids = oids[(oids >= 0) & (oids < self.capacity)]
        over = oids[self.degree[oids] > threshold]
        if len(over) == 0:
            return
        self.nbr_ids[over, threshold:] = -1
        self.nbr_dist[over, threshold:] = INF
        self.degree[over] = threshold

    def remove_node(self, oid: int) -> np.ndarray:
        """Tombstone a node; returns its former neighbor ids.  The caller is
        responsible for unlinking incoming edges (see build.remove_object —
        the batched analogue of removeEdgesReliably, Graph.cpp:641-864)."""
        former = self.nbr_ids[oid, : self.degree[oid]].copy()
        self.nbr_ids[oid] = -1
        self.nbr_dist[oid] = INF
        self.degree[oid] = 0
        self._has_node[oid] = False
        return former

    def remove_edges_to(self, targets: np.ndarray, gone: int):
        """Drop edges target->gone from the given rows (vectorized unlink)."""
        if len(targets) == 0:
            return
        targets = np.asarray(targets, dtype=np.int64)
        targets = targets[(targets >= 0) & (targets < self.capacity)]
        rows_i = self.nbr_ids[targets]
        rows_d = self.nbr_dist[targets]
        hit = rows_i == gone
        rows_d[hit] = INF
        rows_i[hit] = -1
        order = np.argsort(rows_d, axis=1, kind="stable")
        self.nbr_dist[targets] = np.take_along_axis(rows_d, order, axis=1)
        self.nbr_ids[targets] = np.take_along_axis(rows_i, order, axis=1)
        self.degree[targets] = (self.nbr_ids[targets] >= 0).sum(axis=1)

    def remove_edges_to_many(self, targets: np.ndarray, gone_mask: np.ndarray):
        """Drop every edge target->g with ``gone_mask[g]`` from the given
        rows in ONE vectorized pass (the batched unlink behind
        ``Index.batch_remove``; the per-id path pays one full reverse scan
        per removal)."""
        if len(targets) == 0:
            return
        targets = np.asarray(targets, dtype=np.int64)
        targets = targets[(targets >= 0) & (targets < self.capacity)]
        rows_i = self.nbr_ids[targets]
        rows_d = self.nbr_dist[targets]
        hit = gone_mask[np.clip(rows_i, 0, len(gone_mask) - 1)] & (rows_i >= 0)
        rows_d[hit] = INF
        rows_i[hit] = -1
        order = np.argsort(rows_d, axis=1, kind="stable")
        self.nbr_dist[targets] = np.take_along_axis(rows_d, order, axis=1)
        self.nbr_ids[targets] = np.take_along_axis(rows_i, order, axis=1)
        self.degree[targets] = (self.nbr_ids[targets] >= 0).sum(axis=1)

    # --------------------------------------------------------- persistence --
    def state_dict(self, n: int) -> dict:
        return {
            "nbr_ids": self.nbr_ids[:n],
            "nbr_dist": self.nbr_dist[:n],
            "degree": self.degree[:n],
            "has_node": self._has_node[:n],
            "e_max": self.e_max,
        }

    @classmethod
    def from_state(cls, state: dict, copy: bool = True) -> "GraphStore":
        n = len(state["degree"])
        if not copy:
            # adopt (e.g. copy-on-write memmaps for shared multi-process
            # reading); ensure_capacity makes a private copy on growth
            g = cls(max_edges=int(state["e_max"]), capacity=16)
            g.nbr_ids = state["nbr_ids"]
            g.nbr_dist = state["nbr_dist"]
            g.degree = np.array(state["degree"])
            g._has_node = np.array(state["has_node"])
            return g
        g = cls(max_edges=int(state["e_max"]), capacity=max(n, 16))
        g.nbr_ids[:n] = state["nbr_ids"]
        g.nbr_dist[:n] = state["nbr_dist"]
        g.degree[:n] = state["degree"]
        g._has_node[:n] = state["has_node"]
        return g
