"""Object-sharded distributed index over a device mesh.

The reference ships NO in-tree distribution — multi-node serving is
delegated to external wrappers that shard objects across NGT agents and
merge top-k (ngtd/vald; reference README.md:30,97).  Here that becomes a
first-class, single-program component: the object matrix and adjacency are
sharded over a 1-D ``jax.sharding.Mesh`` axis, every device runs the batched
graph search on its local subgraph (local ids), and the per-shard top-k
frontiers merge with one ``all_gather`` over ICI — queries replicated,
results replicated.

The *build* step is likewise SPMD: a batch of new vectors is searched on all
shards, candidate lists merge via all_gather + top-k, and each shard
scatters the adjacency/object rows it owns — the distributed analogue of the
reference's thread-pool build barrier (Index.cpp:1157-1256).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ngt_tpu.graph.search import graph_search
from ngt_tpu.ops import distances as D
from ngt_tpu.properties import DistanceType

AXIS = "shard"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AXIS,))


class ShardedGraphIndex:
    """A proximity-graph index whose objects and adjacency are sharded.

    Each shard's subgraph is built independently over its local objects (the
    vald layout); global ids are ``shard * n_local + local``.
    """

    def __init__(
        self,
        mesh: Mesh,
        x_shards: np.ndarray,      # [P, n_local, D_pad]
        nbr_shards: np.ndarray,    # [P, n_local, E] local ids, -1 padded
        valid_shards: np.ndarray,  # [P, n_local]
        seed_ids_local: np.ndarray,  # [S] local seed ids used on every shard
        metric: DistanceType,
        nbr_dist_shards: np.ndarray | None = None,  # [P, n_local, E] f32;
        # required for build steps (sorted bounded edge insert), optional
        # for a search-only index
    ):
        self.mesh = mesh
        self.metric = DistanceType(metric)
        p, n_local, d = x_shards.shape
        assert p == mesh.devices.size
        self.n_local = n_local
        flat = lambda a: a.reshape(p * n_local, *a.shape[2:])
        row_sh = NamedSharding(mesh, P(AXIS, None))
        self.x = jax.device_put(flat(x_shards), row_sh)
        self.nbr = jax.device_put(flat(nbr_shards), row_sh)
        if nbr_dist_shards is None:
            self.nbr_dist = None
        else:
            self.nbr_dist = jax.device_put(
                flat(np.asarray(nbr_dist_shards, np.float32)), row_sh
            )
        self.valid = jax.device_put(
            flat(valid_shards), NamedSharding(mesh, P(AXIS))
        )
        seeds = np.asarray(seed_ids_local, np.int32)
        if seeds.ndim == 1:  # same local seed slots on every shard
            seeds = np.broadcast_to(seeds[None, :], (p, seeds.shape[0]))
        self.seed_ids_local = jax.device_put(
            np.ascontiguousarray(seeds), NamedSharding(mesh, P(AXIS, None))
        )

    @classmethod
    def from_arrays(
        cls,
        mesh: Mesh,
        x: jax.Array,              # [P*n_local, D_pad] sharded P(AXIS, None)
        nbr: jax.Array,            # [P*n_local, E]
        valid: jax.Array,          # [P*n_local] sharded P(AXIS)
        seed_ids_local: jax.Array,  # [P, S] sharded P(AXIS, None)
        metric: DistanceType,
        n_local: int,
        nbr_dist: jax.Array | None = None,
    ) -> "ShardedGraphIndex":
        """Wrap PRE-SHARDED global arrays (multi-process loading builds them
        per-host with multihost.local_shard_array — no process ever holds
        the whole index, so the host-array __init__ path cannot be used)."""
        self = cls.__new__(cls)
        self.mesh = mesh
        self.metric = DistanceType(metric)
        self.n_local = int(n_local)
        self.x, self.nbr, self.valid = x, nbr, valid
        self.nbr_dist = nbr_dist
        self.seed_ids_local = seed_ids_local
        return self

    def search(self, queries: jax.Array, k: int = 10, epsilon: float = 0.1,
               width: int = 64) -> tuple[jax.Array, jax.Array]:
        fn = _sharded_search(
            self.mesh, self.metric, k, epsilon, width, self.n_local
        )
        return fn(self.x, self.nbr, self.valid, queries, self.seed_ids_local)


@functools.lru_cache(maxsize=None)
def _sharded_search(mesh, metric, k, epsilon, width, n_local):
    def local(x, nbr, valid, q, seeds):
        # x: [n_local, D], q: [B, D] (replicated), seeds: [1, S] this
        # shard's own seed slots (per-shard representatives)
        b = q.shape[0]
        seed_b = jnp.broadcast_to(seeds.reshape(-1)[None, :],
                                  (b, seeds.shape[-1]))
        res = graph_search(
            x, nbr, valid, q, seed_b,
            metric=metric, k=k, epsilon=epsilon, width=width,
            hash_bits=max(int(np.ceil(np.log2(max(n_local, 2)))), 10),
            exact_hash=True,
        )
        my = jax.lax.axis_index(AXIS)
        gids = jnp.where(res.ids >= 0, res.ids + my * n_local, -1)
        # merge per-shard top-k over ICI: all_gather + local top-k
        all_d = jax.lax.all_gather(res.dists, AXIS, axis=1)   # [B, P, k]
        all_i = jax.lax.all_gather(gids, AXIS, axis=1)        # [B, P, k]
        p = all_d.shape[1]
        all_d = all_d.reshape(b, p * k)
        all_i = all_i.reshape(b, p * k)
        neg, sel = jax.lax.top_k(-all_d, k)
        out_i = jnp.take_along_axis(all_i, sel, axis=1)
        return out_i, -neg

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(),
                  P(AXIS, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


# ----------------------------------------------------------------------------
# distributed build step (used by the multichip dry run and large builds)
# ----------------------------------------------------------------------------


class BuildStepOut(NamedTuple):
    x: jax.Array
    nbr: jax.Array
    nbr_dist: jax.Array
    valid: jax.Array
    new_neighbor_ids: jax.Array    # [B, K] global ids chosen for the new nodes
    new_neighbor_dists: jax.Array


def _merge_reverse_edges(nbr, nbr_d, tgt, src, d, ok):
    """Deterministic batched addEdge: insert edges (tgt[i] -> src[i], d[i])
    into fixed-width DISTANCE-SORTED rows, skipping duplicates and dropping
    the farthest edge of a full row (the reference's sorted bounded insert,
    addEdgeDeletingExcessEdges, Graph.h:888-934).

    Proposals are grouped by target via one sort; every proposal of a group
    computes the SAME merged row from the group's leading window and
    scatters it, so colliding scatter indices all carry identical values —
    order-independent, hence deterministic under XLA scatter."""
    e_width = nbr.shape[1]
    l = tgt.shape[0]
    big = jnp.int32(2**30)
    key_t = jnp.where(ok, tgt, big)          # invalid proposals sort last
    sort_t, sort_d, sort_s = jax.lax.sort(
        (key_t, d, src), dimension=0, num_keys=2
    )
    idx = jnp.arange(l, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), sort_t[1:] != sort_t[:-1]]
    )
    group_start = jax.lax.cummax(jnp.where(is_start, idx, 0))
    # candidate window: the E nearest proposals of this position's group
    win_raw = group_start[:, None] + jnp.arange(e_width, dtype=jnp.int32)
    inb = win_raw < l  # clipped slots would repeat the last proposal
    win = jnp.clip(win_raw, 0, l - 1)
    cd = jnp.take(sort_d, win)                                  # [L, E]
    cs = jnp.take(sort_s, win)
    same = (jnp.take(sort_t, win) == sort_t[:, None]) & inb
    cd = jnp.where(same, cd, jnp.inf)
    cs = jnp.where(same, cs, -1)
    # existing rows + duplicate check (a proposed src already present keeps
    # its existing edge; the proposal is dropped).  Invalid proposals route
    # to a pad row (a clamp to row 0 would collide with a real group
    # targeting row 0 and reintroduce scatter nondeterminism).
    n_rows = nbr.shape[0]
    nbr_p = jnp.concatenate(
        [nbr, jnp.full((1, e_width), -1, nbr.dtype)], axis=0
    )
    nbr_d_p = jnp.concatenate(
        [nbr_d, jnp.full((1, e_width), jnp.inf, nbr_d.dtype)], axis=0
    )
    t_safe = jnp.where(sort_t < big, sort_t, n_rows)
    rows_i = jnp.take(nbr_p, t_safe, axis=0)                    # [L, E]
    rows_d = jnp.take(nbr_d_p, t_safe, axis=0)
    dup = jnp.any(cs[:, :, None] == rows_i[:, None, :], axis=2)
    cd = jnp.where(dup, jnp.inf, cd)
    cs = jnp.where(dup, -1, cs)
    md = jnp.concatenate([rows_d, cd], axis=1)
    mi = jnp.concatenate([rows_i, cs], axis=1)
    md, mi = jax.lax.sort((md, mi), dimension=1, num_keys=2)
    md, mi = md[:, :e_width], mi[:, :e_width]
    nbr_p = nbr_p.at[t_safe].set(mi)
    nbr_d_p = nbr_d_p.at[t_safe].set(md)
    return nbr_p[:n_rows], nbr_d_p[:n_rows]


def make_sharded_build_step(
    mesh: Mesh,
    metric: DistanceType,
    k: int,
    n_local: int,
    epsilon: float = 0.1,
    width: int = 32,
):
    """One SPMD index-growth step: search the sharded graph for a batch of
    new vectors, merge candidates across shards (all_gather over ICI), then
    each shard scatters (a) the object rows it owns, (b) the new nodes' own
    sorted adjacency rows, and (c) reverse edges whose target it owns via a
    sorted bounded insert with duplicate check (reference addEdge semantics,
    Graph.h:845-934).  ``new_gids``/dest slots are precomputed on host (the
    id allocator is serial there, like the reference's repository)."""

    def local(x, nbr, nbr_d, valid, newx, new_gids, seeds):
        # x [n_local, D]; newx [B, D] replicated; new_gids [B] global
        # slots; seeds [1, S] this shard's own seed slots
        b = newx.shape[0]
        my = jax.lax.axis_index(AXIS)
        seed_b = jnp.broadcast_to(seeds.reshape(-1)[None, :],
                                  (b, seeds.shape[-1]))
        res = graph_search(
            x, nbr, valid, newx, seed_b,
            metric=metric, k=k, epsilon=epsilon, width=width,
            hash_bits=max(int(np.ceil(np.log2(max(n_local, 2)))), 10),
            exact_hash=True,
        )
        gids = jnp.where(res.ids >= 0, res.ids + my * n_local, -1)
        all_d = jax.lax.all_gather(res.dists, AXIS, axis=1).reshape(b, -1)
        all_i = jax.lax.all_gather(gids, AXIS, axis=1).reshape(b, -1)
        neg, sel = jax.lax.top_k(-all_d, k)
        nn_i = jnp.take_along_axis(all_i, sel, axis=1)        # [B, k] global
        nn_d = -neg

        # -- scatter object rows owned by this shard.  Rows another shard
        # owns route to the OUT-OF-BOUNDS slot n_local and are dropped by
        # the scatter (mode="drop"): a clamp to slot 0 would collide a
        # real insert targeting slot 0 with the dummy writes, and XLA
        # scatter-set is order-nondeterministic under duplicate indices
        # (same hazard _merge_reverse_edges documents above).
        owner = new_gids // n_local
        mine = owner == my
        local_slot = jnp.where(mine, new_gids % n_local, n_local)
        x = x.at[local_slot].set(newx, mode="drop")
        valid = valid.at[local_slot].set(True, mode="drop")

        # -- new nodes' own adjacency rows (local ids on the owning shard).
        # Cross-shard edges are dropped in this layout — each shard's
        # subgraph is self-contained (vald semantics); the merged candidate
        # list still spans shards for result quality.  Compact the row so
        # surviving edges stay distance-sorted at the front.
        keep = (nn_i >= 0) & (nn_i // n_local == my)
        nn_local = jnp.where(keep, nn_i % n_local, -1)
        nn_ld = jnp.where(keep, nn_d, jnp.inf)
        nn_ld, nn_local = jax.lax.sort(
            (nn_ld, nn_local), dimension=1, num_keys=2
        )
        e_width = nbr.shape[1]
        nn_row = jnp.full((b, e_width), -1, jnp.int32)
        nn_row = nn_row.at[:, : nn_local.shape[1]].set(nn_local)
        nn_row_d = jnp.full((b, e_width), jnp.inf, nbr_d.dtype)
        nn_row_d = nn_row_d.at[:, : nn_ld.shape[1]].set(nn_ld)
        nbr = nbr.at[local_slot].set(nn_row, mode="drop")
        nbr_d = nbr_d.at[local_slot].set(nn_row_d, mode="drop")

        # -- reverse edges: sorted bounded insert into owned target rows
        tgt_mine = (nn_i >= 0) & (nn_i // n_local == my)
        flat_ok = (tgt_mine & mine[:, None]).reshape(-1)
        flat_t = jnp.where(tgt_mine, nn_i % n_local, 0).reshape(-1)
        flat_s = jnp.broadcast_to(
            (new_gids % n_local)[:, None], tgt_mine.shape
        ).reshape(-1)
        flat_d = nn_d.reshape(-1)
        nbr, nbr_d = _merge_reverse_edges(
            nbr, nbr_d, flat_t, flat_s, flat_d, flat_ok
        )
        return x, nbr, nbr_d, valid, nn_i, nn_d

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS),
                  P(), P(), P(AXIS, None)),
        out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None), P(AXIS),
                   P(), P()),
        check_vma=False,
    )

    def step(x, nbr, nbr_d, valid, newx, new_gids, seeds):
        return BuildStepOut(*smapped(x, nbr, nbr_d, valid, newx, new_gids,
                                     seeds))

    return jax.jit(step, donate_argnums=(0, 1, 2, 3))


class ShardedIndex:
    """High-level distributed index: objects round-robin over the mesh,
    each shard a self-contained ANNG built by the host engine, queries
    fanned out and merged over ICI.  This is the vald deployment pattern
    (objects sharded across NGT agents, per-agent graphs, top-k merge;
    reference README.md:30,97) as one SPMD program."""

    def __init__(self, mesh: Mesh, shard_index: "ShardedGraphIndex",
                 id_map: np.ndarray):
        self.mesh = mesh
        self._sharded = shard_index
        self.id_map = id_map  # global slot -> original row index (-1 unused)

    @classmethod
    def build(
        cls,
        data: np.ndarray,
        mesh: Mesh | None = None,
        metric: DistanceType = DistanceType.L2,
        edge_size_for_creation: int = 10,
        max_edges: int = 48,
        seed_size: int = 12,
    ) -> "ShardedIndex":
        """Build per-shard ANNGs with the single-chip engine, then lay the
        shards out over the mesh."""
        import ngt_tpu
        from ngt_tpu.ops.bruteforce import pad_dim

        mesh = mesh or make_mesh()
        p = mesh.devices.size
        data = np.asarray(data, np.float32)
        n, dim = data.shape
        d_pad = pad_dim(dim)
        n_local = (n + p - 1) // p

        x_s = np.zeros((p, n_local, d_pad), np.float32)
        nbr_s = np.full((p, n_local, max_edges), -1, np.int32)
        nbrd_s = np.full((p, n_local, max_edges), np.inf, np.float32)
        val_s = np.zeros((p, n_local), bool)
        id_map = np.full((p * n_local,), -1, np.int64)
        owner = np.arange(n) % p
        shard_seeds = []
        for s in range(p):
            rows = np.nonzero(owner == s)[0]
            sub = ngt_tpu.create(
                None, dimension=dim, distance_type=metric,
                edge_size_for_creation=edge_size_for_creation,
                max_edges=max_edges,
            )
            ids = sub.store.batch_insert(data[rows])
            sub.build_index()
            # local layout: slot j holds internal id ids[j]
            x_s[s, : len(rows)] = sub.store._x[ids]
            remap = np.full(sub.store._x.shape[0], -1, np.int32)
            remap[ids] = np.arange(len(rows), dtype=np.int32)
            adj = sub.graph.nbr_ids[ids][:, :max_edges]
            ok = adj >= 0
            loc = np.full_like(adj, -1)
            loc[ok] = remap[adj[ok]]
            nbr_s[s, : len(rows)] = loc
            dd = sub.graph.nbr_dist[ids][:, :max_edges].astype(np.float32)
            dd[~ok] = np.inf
            nbrd_s[s, : len(rows)] = dd
            val_s[s, : len(rows)] = True
            id_map[s * n_local : s * n_local + len(rows)] = rows
            # per-shard seeds = the sub-index's representatives (k-means
            # coverage beats an arbitrary first-S slice, which misses
            # clusters and caps cross-shard recall), remapped to local slots
            reps = remap[sub.seeder.rep_ids]
            reps = reps[reps >= 0]
            if len(reps) == 0:
                reps = np.arange(min(seed_size * 4, len(rows)), dtype=np.int32)
            shard_seeds.append(reps.astype(np.int32))
        s_max = max(len(r) for r in shard_seeds)
        seeds_local = np.zeros((p, s_max), np.int32)
        for s, reps in enumerate(shard_seeds):
            seeds_local[s, : len(reps)] = reps
            if len(reps) < s_max:  # pad by repeating (dedup'd in search)
                seeds_local[s, len(reps):] = reps[0] if len(reps) else 0
        sharded = ShardedGraphIndex(
            mesh, x_s, nbr_s, val_s, seeds_local, metric,
            nbr_dist_shards=nbrd_s,
        )
        return cls(mesh, sharded, id_map)

    # ------------------------------------------------------- persistence ----
    def save(self, path: str) -> None:
        """Persist the sharded layout (one npz; the analogue of the index
        directory for the distributed deployment).  Reopening lays the same
        shards out over a fresh mesh of the same size."""
        import os

        os.makedirs(path, exist_ok=True)
        s = self._sharded
        p = s.mesh.devices.size
        unflat = lambda a: np.asarray(a).reshape(p, s.n_local, *a.shape[1:])
        np.savez(
            os.path.join(path, "shards.npz"),
            x=unflat(s.x),
            nbr=unflat(s.nbr),
            nbr_dist=(
                unflat(s.nbr_dist) if s.nbr_dist is not None
                else np.zeros((0,), np.float32)
            ),
            valid=unflat(s.valid),
            seed_ids_local=np.asarray(s.seed_ids_local),
            metric=int(s.metric),
            id_map=self.id_map,
        )

    def save_distributed(self, path: str) -> None:
        """Persist as ONE FILE PER SHARD + a small meta file, so each
        process of a multi-host deployment loads only the shards it owns
        (open_distributed) — the corpus never materializes on one host.
        `save()` keeps the single-file layout for single-process use."""
        import os

        os.makedirs(path, exist_ok=True)
        s = self._sharded
        p = s.mesh.devices.size
        n_local = s.n_local

        def per_shard(arr, rows_per_shard):
            """shard id -> host copy of that shard, ADDRESSABLE shards only
            (a true multi-host save must not fetch remote rows — np.asarray
            on the global array would raise on non-addressable devices)."""
            out = {}
            for sh in arr.addressable_shards:
                start = sh.index[0].start or 0
                out[start // rows_per_shard] = np.asarray(sh.data)
            return out

        xs = per_shard(s.x, n_local)
        nbrs = per_shard(s.nbr, n_local)
        valids = per_shard(s.valid, n_local)
        nbrds = None if s.nbr_dist is None else per_shard(s.nbr_dist, n_local)
        seedss = per_shard(s.seed_ids_local, 1)
        for i in xs:
            np.savez(
                os.path.join(path, f"shard_{i:05d}.npz"),
                x=xs[i], nbr=nbrs[i], valid=valids[i],
                seeds=seedss[i].reshape(-1),
                nbr_dist=(
                    np.zeros((0,), np.float32) if nbrds is None else nbrds[i]
                ),
            )
        if jax.process_index() == 0:
            np.savez(
                os.path.join(path, "meta.npz"),
                p=p, n_local=n_local,
                d_pad=s.x.shape[1], e=s.nbr.shape[1],
                s_max=s.seed_ids_local.shape[1],
                has_nbr_dist=s.nbr_dist is not None,
                metric=int(s.metric), id_map=self.id_map,
            )

    @classmethod
    def open_distributed(
        cls, path: str, mesh: Mesh | None = None
    ) -> "ShardedIndex":
        """Open a save_distributed() layout; under a multi-process mesh
        each process reads ONLY its own shard files and the global arrays
        are assembled from per-host buffers (multihost.local_shard_array).
        Works identically single-process (one process owns every shard)."""
        import os

        from ngt_tpu.parallel import multihost as MH

        meta = np.load(os.path.join(path, "meta.npz"))
        p, n_local = int(meta["p"]), int(meta["n_local"])
        mesh = mesh or make_mesh(p)
        if mesh.devices.size != p:
            raise ValueError(
                f"index has {p} shards; mesh has {mesh.devices.size} devices"
            )
        d_pad, e = int(meta["d_pad"]), int(meta["e"])
        s_max, has_d = int(meta["s_max"]), bool(meta["has_nbr_dist"])
        mine = MH.process_shard_slices(mesh).get(jax.process_index(), [])
        parts = [
            np.load(os.path.join(path, f"shard_{i:05d}.npz")) for i in mine
        ]

        def stack(key, shape, dtype):
            # a process owning zero mesh devices still participates with
            # empty buffers (meta supplies the shapes np.stack cannot infer)
            if not parts:
                return np.zeros((0, *shape), dtype)
            return np.stack([np.asarray(s[key]) for s in parts])

        glob = lambda a: MH.local_shard_array(
            mesh, (p * n_local, *a.shape[2:]), a
        )
        seeds_local = stack("seeds", (s_max,), np.int32)[:, None]
        sharded = ShardedGraphIndex.from_arrays(
            mesh,
            glob(stack("x", (n_local, d_pad), np.float32)),
            glob(stack("nbr", (n_local, e), np.int32)),
            glob(stack("valid", (n_local,), bool)),
            MH.local_shard_array(mesh, (p, s_max), seeds_local),
            DistanceType(int(meta["metric"])), n_local,
            nbr_dist=(
                glob(stack("nbr_dist", (n_local, e), np.float32))
                if has_d else None
            ),
        )
        return cls(mesh, sharded, meta["id_map"])

    @classmethod
    def open(cls, path: str, mesh: Mesh | None = None) -> "ShardedIndex":
        import os

        st = np.load(os.path.join(path, "shards.npz"))
        p = st["x"].shape[0]
        mesh = mesh or make_mesh(p)
        if mesh.devices.size != p:
            raise ValueError(
                f"index has {p} shards; mesh has {mesh.devices.size} devices"
            )
        nbrd = st["nbr_dist"] if st["nbr_dist"].size else None
        sharded = ShardedGraphIndex(
            mesh, st["x"], st["nbr"], st["valid"],
            seed_ids_local=st["seed_ids_local"],
            metric=DistanceType(int(st["metric"])),
            nbr_dist_shards=nbrd,
        )
        return cls(mesh, sharded, st["id_map"])

    def batch_search(self, queries: np.ndarray, size: int = 10,
                     epsilon: float = 0.1, width: int = 64):
        from ngt_tpu.ops.bruteforce import pad_dim

        q = np.asarray(queries, np.float32)
        d_pad = pad_dim(q.shape[1])
        if q.shape[1] != d_pad:
            qq = np.zeros((len(q), d_pad), np.float32)
            qq[:, : q.shape[1]] = q
            q = qq
        # explicit replication over THIS mesh: under a multi-process mesh a
        # plain jnp.asarray lands on the default local device and the
        # global-mesh jit rejects it
        qd = jax.device_put(q, NamedSharding(self.mesh, P()))
        ids, dists = self._sharded.search(
            qd, k=size, epsilon=epsilon, width=width
        )
        ids = np.asarray(ids)
        dists = np.asarray(dists)
        out = np.where(ids >= 0, self.id_map[np.clip(ids, 0, None)], -1)
        return out.astype(np.int64), dists


class ShardedQG:
    """Quantized-graph (sq8) search sharded over the mesh — NGTQG as the
    production path (reference NGTQ/QuantizedGraph.h:192-320) scaled past
    one chip.  Motivation: the eps=0 recall ceiling on a single chip is the
    HBM block budget (eb>=64 blocks OOM a 16 GB chip at 1M, BASELINE.md
    round-2k); sharded, each device holds n/P block rows, so full-width
    hops fit at any corpus size.

    Layout mirrors ShardedGraphIndex: per-shard self-contained subgraphs in
    LOCAL ids; per shard — int8 codes [n_local, D_pad], neighbor blocks
    [n_local, eb*D_pad] (one contiguous row read scores a whole hop), the
    f32 rows for the exact re-rank, and seed slots.  The search is ONE SPMD
    program: local sq8 traversal + local exact re-rank, then an all_gather
    top-k merge over ICI.  One global sq scale keeps per-shard rankings
    mutually comparable (a per-shard scale would re-weight distances at the
    merge)."""

    def __init__(
        self,
        mesh: Mesh,
        x_shards: np.ndarray,        # [P, n_local, D_pad] f32
        nbr_shards: np.ndarray,      # [P, n_local, E] local ids
        valid_shards: np.ndarray,    # [P, n_local]
        seed_ids_local: np.ndarray,  # [P, S] local seed slots
        metric: DistanceType,
        block_edges: int = 0,        # 0 = all E columns
    ):
        self.mesh = mesh
        self.metric = DistanceType(metric)
        p, n_local, d_pad = x_shards.shape
        e = nbr_shards.shape[2]
        eb = min(block_edges, e) if block_edges > 0 else e
        self.n_local = n_local
        self.eb = eb

        # sq8 codes with ONE global scale (plain angular metrics encode the
        # normalized rows — quant/qgraph.py _sq8_rows rank-faithfulness)
        rows = x_shards.reshape(p * n_local, d_pad)
        if self.metric in (DistanceType.COSINE, DistanceType.ANGLE):
            nrm = np.linalg.norm(rows, axis=1, keepdims=True)
            rows = rows / np.maximum(nrm, 1e-30)
        live = valid_shards.reshape(-1)
        scale = float(np.abs(rows[live]).max()) / 127.0 if live.any() else 1.0
        self.sq_scale = scale or 1.0
        codes = np.zeros((p * n_local, d_pad), np.int8)
        codes[live] = np.clip(
            np.round(rows[live] / self.sq_scale), -127, 127
        ).astype(np.int8)
        codes = codes.reshape(p, n_local, d_pad)

        # per-shard neighbor blocks from LOCAL codes (subgraphs are
        # self-contained, so the gather never crosses shards)
        blocks = np.zeros((p, n_local, eb * d_pad), np.int8)
        for s in range(p):
            safe = np.clip(nbr_shards[s, :, :eb], 0, n_local - 1)
            blk = codes[s][safe]                      # [n_local, eb, D]
            blk[nbr_shards[s, :, :eb] < 0] = 0
            blocks[s] = blk.reshape(n_local, -1)

        row_sh = NamedSharding(mesh, P(AXIS, None))
        flat = lambda a: a.reshape(p * n_local, *a.shape[2:])
        self.x = jax.device_put(flat(x_shards), row_sh)
        self.codes = jax.device_put(flat(codes), row_sh)
        self.blocks = jax.device_put(flat(blocks), row_sh)
        self.nbr = jax.device_put(
            np.ascontiguousarray(flat(nbr_shards)[:, :eb]), row_sh
        )
        self.valid = jax.device_put(
            flat(valid_shards), NamedSharding(mesh, P(AXIS))
        )
        seeds = np.asarray(seed_ids_local, np.int32)
        if seeds.ndim == 1:
            seeds = np.broadcast_to(seeds[None, :], (p, seeds.shape[0]))
        self.seed_ids_local = jax.device_put(
            np.ascontiguousarray(seeds), NamedSharding(mesh, P(AXIS, None))
        )

    @classmethod
    def from_sharded_index(
        cls, sharded: "ShardedIndex", block_edges: int = 0
    ) -> "ShardedQG":
        """Quantize an existing ShardedIndex (single-process convenience:
        pulls each addressable shard to host once)."""
        s = sharded._sharded
        p = s.mesh.devices.size
        unflat = lambda a: np.asarray(a).reshape(p, s.n_local, *a.shape[1:])
        return cls(
            s.mesh, unflat(s.x), unflat(s.nbr), unflat(s.valid),
            np.asarray(s.seed_ids_local), s.metric, block_edges=block_edges,
        )

    def search(
        self, queries: jax.Array, k: int = 10, epsilon: float = 0.0,
        result_expansion: float = 3.0, width: int = 0,
    ) -> tuple[jax.Array, jax.Array]:
        k_exp = max(int(np.ceil(k * max(result_expansion, 1.0))), k)
        fn = _sharded_qg_search(
            self.mesh, self.metric, k, k_exp, float(epsilon),
            width if width > 0 else max(64, 2 * k_exp), self.n_local,
        )
        return fn(
            self.blocks, self.nbr, self.valid, self.codes, self.x,
            queries, self.seed_ids_local, jnp.float32(self.sq_scale),
        )


@functools.lru_cache(maxsize=None)
def _sharded_qg_search(mesh, metric, k, k_exp, epsilon, width, n_local):
    from ngt_tpu.quant.qgraph import _rerank_body

    def local(blocks, nbr, valid, codes, x, q, seeds, sq_scale):
        b = q.shape[0]
        qdv = q.astype(jnp.float32)
        if metric in (DistanceType.COSINE, DistanceType.ANGLE):
            qn = jnp.sqrt(jnp.sum(qdv * qdv, axis=1, keepdims=True))
            qdv = qdv / jnp.maximum(qn, 1e-30)
        seed_b = jnp.broadcast_to(
            seeds.reshape(-1)[None, :], (b, seeds.shape[-1])
        )
        res = graph_search(
            blocks, nbr, valid, qdv / sq_scale, seed_b,
            metric=DistanceType.L2, k=k_exp, k_radius=k, epsilon=epsilon,
            width=width,
            hash_bits=max(int(np.ceil(np.log2(max(n_local, 2)))), 10),
            exact_hash=True, block_mode=True, seed_x=codes,
        )
        # local exact re-rank with the true metric, then merge over ICI
        ids1, d1 = _rerank_body(x, q, res.ids, res.ids >= 0, metric, k)
        my = jax.lax.axis_index(AXIS)
        gids = jnp.where(ids1 >= 0, ids1 + my * n_local, -1)
        all_d = jax.lax.all_gather(d1, AXIS, axis=1).reshape(b, -1)
        all_i = jax.lax.all_gather(gids, AXIS, axis=1).reshape(b, -1)
        neg, sel = jax.lax.top_k(-all_d, k)
        out_i = jnp.take_along_axis(all_i, sel, axis=1)
        out_i = jnp.where(jnp.isfinite(-neg), out_i, -1)
        return out_i, -neg

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(AXIS, None),
                  P(AXIS, None), P(), P(AXIS, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


def build_local_knng_shards(
    x_s: np.ndarray, val_s: np.ndarray, e: int, metric: DistanceType
) -> np.ndarray:
    """Exact per-shard KNNG over each shard's local vectors (the normal way
    to populate a fresh sharded index: each agent builds its own graph, as
    the reference ecosystem's per-agent NGT indexes do)."""
    import jax.numpy as jnp  # local to avoid device work at import

    p, n_local, _ = x_s.shape
    nbr_s = np.full((p, n_local, e), -1, np.int32)
    nbrd_s = np.full((p, n_local, e), np.inf, np.float32)
    for s in range(p):
        rows = jnp.asarray(x_s[s])
        d = np.array(D.pairwise(DistanceType(metric), rows, rows))
        d[:, ~val_s[s]] = np.inf
        d[~val_s[s], :] = np.inf
        np.fill_diagonal(d, np.inf)
        nn = np.argsort(d, axis=1)[:, :e].astype(np.int32)
        nd = np.take_along_axis(d, nn, axis=1)
        nn[~np.isfinite(nd)] = -1
        nbr_s[s] = nn
        nbrd_s[s] = nd.astype(np.float32)
    return nbr_s, nbrd_s


def shard_host_index(
    x_host: np.ndarray,
    nbr_host: np.ndarray,
    valid_host: np.ndarray,
    p: int,
    nbr_dist_host: np.ndarray | None = None,
):
    """Split a host-built index into P self-contained shards (round-robin,
    remapping adjacency to local ids; cross-shard edges dropped — the
    per-shard graphs are rebuilt or refined after sharding in practice).
    Pass ``nbr_dist_host`` to carry edge distances (required by the SPMD
    build step's sorted insert); surviving edges stay distance-sorted."""
    n = x_host.shape[0]
    n_local = (n + p - 1) // p
    x_s = np.zeros((p, n_local, x_host.shape[1]), x_host.dtype)
    nbr_s = np.full((p, n_local, nbr_host.shape[1]), -1, np.int32)
    nbrd_s = np.full((p, n_local, nbr_host.shape[1]), np.inf, np.float32)
    val_s = np.zeros((p, n_local), bool)
    owner = np.arange(n) % p
    local = np.arange(n) // p
    g2l = np.stack([owner, local], axis=1)
    for s in range(p):
        ids = np.nonzero(owner == s)[0]
        x_s[s, : len(ids)] = x_host[ids]
        val_s[s, : len(ids)] = valid_host[ids]
        adj = nbr_host[ids]
        ok = adj >= 0
        same = np.zeros_like(adj, dtype=bool)
        same[ok] = g2l[adj[ok], 0] == s
        remapped = np.full_like(adj, -1)
        dd = np.full(adj.shape, np.inf, np.float32)
        remapped[same] = g2l[adj[same], 1]
        if nbr_dist_host is not None:
            dd[same] = nbr_dist_host[ids][same]
        # compact: dropped (cross-shard) edges move to the tail, surviving
        # edges keep their distance order (input rows are distance-sorted)
        key = np.where(remapped >= 0, np.arange(adj.shape[1])[None, :],
                       np.iinfo(np.int32).max)
        order = np.argsort(key, axis=1, kind="stable")
        nbr_s[s, : len(ids)] = np.take_along_axis(remapped, order, axis=1)
        nbrd_s[s, : len(ids)] = np.take_along_axis(dd, order, axis=1)
    return x_s, nbr_s, nbrd_s, val_s, n_local
