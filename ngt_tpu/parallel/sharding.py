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
    ):
        self.mesh = mesh
        self.metric = DistanceType(metric)
        p, n_local, d = x_shards.shape
        assert p == mesh.devices.size
        self.n_local = n_local
        sh = NamedSharding(mesh, P(AXIS, None, None))
        flat = lambda a: a.reshape(p * n_local, *a.shape[2:])
        self.x = jax.device_put(flat(x_shards), NamedSharding(mesh, P(AXIS, None)))
        self.nbr = jax.device_put(
            flat(nbr_shards), NamedSharding(mesh, P(AXIS, None))
        )
        self.valid = jax.device_put(
            flat(valid_shards), NamedSharding(mesh, P(AXIS))
        )
        del sh
        self.seed_ids_local = jnp.asarray(seed_ids_local, jnp.int32)

    def search(self, queries: jax.Array, k: int = 10, epsilon: float = 0.1,
               width: int = 64) -> tuple[jax.Array, jax.Array]:
        fn = _sharded_search(
            self.mesh, self.metric, k, epsilon, width, self.n_local
        )
        return fn(self.x, self.nbr, self.valid, queries, self.seed_ids_local)


@functools.lru_cache(maxsize=None)
def _sharded_search(mesh, metric, k, epsilon, width, n_local):
    def local(x, nbr, valid, q, seeds):
        # x: [n_local, D], q: [B, D] (replicated), seeds: [S] local ids
        b = q.shape[0]
        seed_b = jnp.broadcast_to(seeds[None, :], (b, seeds.shape[0]))
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
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(), P()),
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
    valid: jax.Array
    new_neighbor_ids: jax.Array    # [B, K] global ids chosen for the new nodes
    new_neighbor_dists: jax.Array


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
    each shard scatters (a) the object rows it owns and (b) reverse edges
    whose target it owns.  ``new_gids``/dest slots are precomputed on host
    (the id allocator is serial there, like the reference's repository)."""

    def local(x, nbr, valid, newx, new_gids, seeds):
        # x [n_local, D]; newx [B, D] replicated; new_gids [B] global slots
        b = newx.shape[0]
        my = jax.lax.axis_index(AXIS)
        seed_b = jnp.broadcast_to(seeds[None, :], (b, seeds.shape[0]))
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

        # -- scatter object rows owned by this shard
        owner = new_gids // n_local
        local_slot = jnp.where(owner == my, new_gids % n_local, 0)
        mine = owner == my
        x = x.at[local_slot].set(
            jnp.where(mine[:, None], newx, x[local_slot])
        )
        valid = valid.at[local_slot].set(valid[local_slot] | mine)

        # -- new nodes' own adjacency rows (local ids on the owning shard)
        nn_local = jnp.where(
            (nn_i >= 0) & (nn_i // n_local == my), nn_i % n_local, -1
        )
        # note: cross-shard edges are dropped in this layout — each shard's
        # subgraph is self-contained (vald semantics); the merged candidate
        # list still spans shards for result quality.
        e_width = nbr.shape[1]
        nn_row = jnp.full((b, e_width), -1, jnp.int32)
        nn_row = nn_row.at[:, : nn_local.shape[1]].set(nn_local)
        nbr = nbr.at[local_slot].set(
            jnp.where(mine[:, None], nn_row, nbr[local_slot])
        )

        # -- reverse edges: target rows this shard owns get the new node
        # appended at their worst slot (bounded-degree addEdge semantics)
        tgt_owner = nn_i // n_local
        tgt_mine = (nn_i >= 0) & (tgt_owner == my)
        tgt_local = jnp.where(tgt_mine, nn_i % n_local, 0)
        src_local = jnp.where(
            mine[:, None] & tgt_mine, (new_gids % n_local)[:, None], -1
        )
        flat_t = tgt_local.reshape(-1)
        flat_s = src_local.reshape(-1)
        rows = nbr[flat_t]
        rows = jnp.where(
            (flat_s >= 0)[:, None]
            & (jnp.arange(rows.shape[1])[None, :] == rows.shape[1] - 1),
            flat_s[:, None],
            rows,
        )
        nbr = nbr.at[flat_t].set(rows)
        return x, nbr, valid, nn_i, nn_d

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(), P(), P()),
        out_specs=(P(AXIS, None), P(AXIS, None), P(AXIS), P(), P()),
        check_vma=False,
    )

    def step(x, nbr, valid, newx, new_gids, seeds):
        return BuildStepOut(*smapped(x, nbr, valid, newx, new_gids, seeds))

    return jax.jit(step, donate_argnums=(0, 1, 2))


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
        val_s = np.zeros((p, n_local), bool)
        id_map = np.full((p * n_local,), -1, np.int64)
        owner = np.arange(n) % p
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
            val_s[s, : len(rows)] = True
            id_map[s * n_local : s * n_local + len(rows)] = rows
        seeds_local = np.arange(
            min(seed_size * 4, n_local), dtype=np.int32
        )
        sharded = ShardedGraphIndex(
            mesh, x_s, nbr_s, val_s, seeds_local, metric
        )
        return cls(mesh, sharded, id_map)

    def batch_search(self, queries: np.ndarray, size: int = 10,
                     epsilon: float = 0.1, width: int = 64):
        from ngt_tpu.ops.bruteforce import pad_dim

        q = np.asarray(queries, np.float32)
        d_pad = pad_dim(q.shape[1])
        if q.shape[1] != d_pad:
            qq = np.zeros((len(q), d_pad), np.float32)
            qq[:, : q.shape[1]] = q
            q = qq
        ids, dists = self._sharded.search(
            jnp.asarray(q), k=size, epsilon=epsilon, width=width
        )
        ids = np.asarray(ids)
        dists = np.asarray(dists)
        out = np.where(ids >= 0, self.id_map[np.clip(ids, 0, None)], -1)
        return out.astype(np.int64), dists


def build_local_knng_shards(
    x_s: np.ndarray, val_s: np.ndarray, e: int, metric: DistanceType
) -> np.ndarray:
    """Exact per-shard KNNG over each shard's local vectors (the normal way
    to populate a fresh sharded index: each agent builds its own graph, as
    the reference ecosystem's per-agent NGT indexes do)."""
    import jax.numpy as jnp  # local to avoid device work at import

    p, n_local, _ = x_s.shape
    nbr_s = np.full((p, n_local, e), -1, np.int32)
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
    return nbr_s


def shard_host_index(
    x_host: np.ndarray, nbr_host: np.ndarray, valid_host: np.ndarray, p: int
):
    """Split a host-built index into P self-contained shards (round-robin,
    remapping adjacency to local ids; cross-shard edges dropped — the
    per-shard graphs are rebuilt or refined after sharding in practice)."""
    n = x_host.shape[0]
    n_local = (n + p - 1) // p
    x_s = np.zeros((p, n_local, x_host.shape[1]), x_host.dtype)
    nbr_s = np.full((p, n_local, nbr_host.shape[1]), -1, np.int32)
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
        remapped[same] = g2l[adj[same], 1]
        nbr_s[s, : len(ids)] = np.sort(
            np.where(remapped >= 0, remapped, np.iinfo(np.int32).max), axis=1
        )
        nbr_s[s][nbr_s[s] == np.iinfo(np.int32).max] = -1
    return x_s, nbr_s, val_s, n_local
