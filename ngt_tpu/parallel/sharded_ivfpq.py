"""Mesh-sharded IVF+PQ search — the billion-scale layout over ICI.

The reference's NGTQ is explicitly its billion-object subsystem
(NGTQ/Quantizer.h; reference README.md:31) but is single-process: scale
beyond one machine is delegated to external sharding wrappers (ngtd/vald,
README.md:30,97).  Here the quantized index itself is sharded over a
``jax.sharding.Mesh``:

* coarse centroids are REPLICATED (tiny — C x D floats) and every shard
  computes the same global top-``nprobe`` probe list;
* each centroid's inverted lists (bucketed int8 decoded-residual rows,
  quant.ivfpq.host_blocks) live on exactly ONE shard, assigned by greedy
  balance of record counts, so aggregate HBM — not one chip's — bounds
  index size;
* every shard MXU-scores the probed centroids it owns (non-owned probes
  see empty chains and score +inf), exact-refines its own local top
  candidates against its shard of the raw rows, and the per-shard exact
  top-k merge is ONE ``all_gather`` over ICI + a replicated top-k —
  the same merge discipline as parallel.sharding._sharded_search;
* because refinement happens before the merge, the result is the exact
  re-rank of the UNION of per-shard candidate lists — a superset of the
  single-device candidate list at equal expansion, so sharded recall is
  >= single-device recall by construction.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ngt_tpu.ops import distances as D
from ngt_tpu.parallel.sharding import AXIS
from ngt_tpu.properties import DistanceType
from ngt_tpu.quant.ivfpq import BUCKET_LEN, IVFPQIndex, _probe_lists


class ShardedIVFPQ:
    """Distributed quantized search over a built :class:`IVFPQIndex`.

    Construction moves the bucketed lists + raw rows to the mesh;
    persistence stays with the underlying ``IVFPQIndex`` (save/open it,
    then re-shard — the shard layout is derived state, like the device
    mirror)."""

    def __init__(self, mesh: Mesh, idx: IVFPQIndex):
        if not idx.built:
            raise ValueError("shard a BUILT IVFPQIndex")
        if idx._raw is None:
            raise ValueError("sharded refine needs raw vectors")
        idx._flush_pending()
        self.mesh = mesh
        self.metric = idx.metric
        self.dimension = idx.dimension
        nshard = mesh.devices.size
        c = len(idx.centroids)
        assign = idx._assign
        valid = (
            idx._valid if idx._valid.size else np.ones(len(assign), bool)
        )
        self._ids = idx._ids.copy()   # internal row -> external object id
        counts = np.bincount(assign[valid], minlength=c)

        # greedy balance: heaviest centroid to the lightest shard
        shard_of = np.zeros(c, np.int32)
        loads = np.zeros(nshard, np.int64)
        for ci in np.argsort(-counts, kind="stable"):
            s = int(np.argmin(loads))
            shard_of[ci] = s
            loads[s] += counts[ci]
        self.shard_loads = loads

        blocks = [
            idx.host_blocks(np.nonzero((shard_of[assign] == s) & valid)[0])
            for s in range(nshard)
        ]
        nb = max(b["bucket_ids"].shape[0] for b in blocks)
        bc = max(b["cent_buckets"].shape[1] for b in blocks)
        d = idx.dimension
        cent_buckets = np.full((nshard, c, bc), -1, np.int32)
        # the -1 (empty) sentinel must keep pointing at an invalid chain
        # after clipping, so slot 0 of every shard's bucket table is kept
        # out of reach by clip only when pos ids mark it invalid — pos -1
        # entries already score +inf via the ids>=0 mask in _probe_lists.
        bucket_pos = np.full((nshard, nb, BUCKET_LEN), -1, np.int32)
        bucket_vals = np.zeros((nshard, nb, BUCKET_LEN, d), np.int8)
        bucket_norm = np.zeros((nshard, nb, BUCKET_LEN), np.float32)
        gid_flat = np.full((nshard, nb * BUCKET_LEN), -1, np.int32)
        raw_flat = np.zeros((nshard, nb * BUCKET_LEN, d), np.float32)
        raw = idx._raw
        for s, b in enumerate(blocks):
            nbs = b["bucket_ids"].shape[0]
            bcs = b["cent_buckets"].shape[1]
            cent_buckets[s, :, :bcs] = b["cent_buckets"]
            ids = b["bucket_ids"]                      # [nbs, L] global ids
            ok = ids >= 0
            pos = np.where(
                ok,
                (np.arange(nbs * BUCKET_LEN, dtype=np.int32)
                 .reshape(nbs, BUCKET_LEN)),
                -1,
            )
            bucket_pos[s, :nbs] = pos
            bucket_vals[s, :nbs] = b["bucket_vals"]
            bucket_norm[s, :nbs] = b["bucket_norm"]
            flat_ids = ids.reshape(-1)
            sel = flat_ids >= 0
            gid_flat[s, : nbs * BUCKET_LEN] = flat_ids
            raw_flat[s, : nbs * BUCKET_LEN][sel] = np.asarray(
                raw[flat_ids[sel]], np.float32
            )
        self.scale = blocks[0]["scale"]
        self.nb, self.bc = nb, bc

        row = NamedSharding(mesh, P(AXIS, None))
        flat = lambda a: a.reshape(nshard * a.shape[1], *a.shape[2:])
        self.centroids = jax.device_put(
            np.asarray(idx.centroids, np.float32), NamedSharding(mesh, P())
        )
        self.cent_buckets = jax.device_put(flat(cent_buckets), row)
        self.bucket_pos = jax.device_put(flat(bucket_pos), row)
        self.bucket_vals = jax.device_put(flat(bucket_vals), row)
        self.bucket_norm = jax.device_put(flat(bucket_norm), row)
        self.gid_flat = jax.device_put(
            gid_flat.reshape(-1), NamedSharding(mesh, P(AXIS))
        )
        self.raw_flat = jax.device_put(flat(raw_flat), row)

    def memory_report(self) -> dict:
        """Per-shard device bytes (aggregate HBM is the capacity bound)."""
        per = {
            "bucket_vals": self.bucket_vals.nbytes,
            "bucket_norm": self.bucket_norm.nbytes,
            "bucket_pos": self.bucket_pos.nbytes,
            "raw_flat": self.raw_flat.nbytes,
        }
        n = self.mesh.devices.size
        return {
            "n_shards": n,
            "total_bytes": int(sum(per.values())),
            "per_shard_bytes": int(sum(per.values()) // n),
            "shard_loads": [int(v) for v in self.shard_loads],
        }

    def batch_search(
        self,
        queries: np.ndarray,
        size: int = 10,
        nprobe: int = 8,
        result_expansion: float = 3.0,
    ):
        """Exact-refined quantized search over all shards (replicated
        queries in, replicated results out)."""
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        nprobe = min(nprobe, self.centroids.shape[0])
        kloc = max(int(np.ceil(size * max(result_expansion, 1.0))), size)
        fn = _sharded_ivfpq_search(
            self.mesh, self.metric, nprobe, size, kloc
        )
        out_i, out_d = fn(
            self.centroids, self.cent_buckets, self.bucket_pos,
            self.bucket_vals, self.bucket_norm, self.gid_flat,
            self.raw_flat, jnp.float32(self.scale), jnp.asarray(q),
        )
        rows = np.asarray(out_i)
        if len(self._ids):   # internal rows -> stable external ids
            safe = np.clip(rows, 0, len(self._ids) - 1)
            rows = np.where(rows >= 0, self._ids[safe], -1)
        return rows, np.asarray(out_d)


@functools.lru_cache(maxsize=None)
def _sharded_ivfpq_search(mesh, metric, nprobe, size, kloc):
    def local(centroids, cent_buckets, bucket_pos, bucket_vals,
              bucket_norm, gid_flat, raw_flat, scale, qd):
        b = qd.shape[0]
        # replicated global probe: every shard picks the same centroids
        cd = D.pairwise(DistanceType.L2, qd, centroids)
        _, probe = jax.lax.top_k(-cd, nprobe)              # [B, P]
        qr = qd[:, None, :] - jnp.take(centroids, probe, axis=0)
        pos, _ = _probe_lists(
            cent_buckets, bucket_pos, bucket_vals, bucket_norm, scale,
            qr, probe, k=kloc,
        )                                                  # local positions
        safe = jnp.clip(pos, 0, raw_flat.shape[0] - 1)
        rows = jnp.take(raw_flat, safe, axis=0)            # [B, kloc, D]
        gids = jnp.where(pos >= 0, jnp.take(gid_flat, safe), -1)
        dd = D.gathered(metric, qd, rows)
        dd = jnp.where(gids >= 0, dd, jnp.inf)
        # exact per-shard top-kloc merge over ICI
        all_d = jax.lax.all_gather(dd, AXIS, axis=1).reshape(b, -1)
        all_i = jax.lax.all_gather(gids, AXIS, axis=1).reshape(b, -1)
        neg, sel = jax.lax.top_k(-all_d, size)
        out_i = jnp.take_along_axis(all_i, sel, axis=1)
        return jnp.where(jnp.isfinite(-neg), out_i, -1), -neg

    smapped = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(AXIS, None), P(AXIS, None), P(AXIS, None),
                  P(AXIS, None), P(AXIS), P(AXIS, None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)
