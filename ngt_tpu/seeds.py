"""Seed selection — the TPU replacement for the reference's DVPTree.

The reference seeds graph search by descending a vantage-point tree to a
leaf and taking its members (``GraphAndTreeIndex::getSeedsFromTree``,
reference lib/NGT/Index.h:1524-1567; tree in Tree.{h,cpp}/Node.{h,cpp}), or
random nodes for tree-less indexes (``GraphIndex::getRandomSeeds``,
Index.h:1070-1090).  Pointer-tree descent is hostile to TPUs; an equivalent
seeding signal — "a few graph nodes near the query" — comes from scoring the
query against a small set of representative rows with ONE matmul and taking
the top ``seed_size``.  Representatives are a uniform sample of live ids,
refreshed as the index grows (build) or k-means centroids' nearest members
(finalized index), giving leaf-like locality without any pointers.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ngt_tpu.ops import distances as D
from ngt_tpu.properties import DistanceType


@functools.partial(jax.jit, static_argnames=("metric",))
def _nearest_row(cents, rows, metric):
    """argmin on device: downloading the [k, sample] distance matrix to
    argmin on host cost ~1 GB over the tunnel at k=4096 (was most of the
    optimize_seeds wall time)."""
    return jnp.argmin(D.pairwise(metric, cents, rows), axis=1)


def default_reps(n_live: int) -> int:
    """Representative count scaling: one matmul over reps replaces tree
    descent, so reps are cheap — n/32 keeps cluster coverage high (with R
    reps, a cluster of m members lacks a rep with prob ~exp(-R*m/n); at
    n/32 a 200-member cluster is uncovered with prob e^-6.25 ≈ 0.2%)."""
    return int(min(max(1024, n_live // 32), 65536))


class Seeder:
    """Holds representative object ids + their rows on device."""

    def __init__(self, metric: DistanceType, seed_size: int = 10):
        self.metric = DistanceType(metric)
        self.seed_size = int(seed_size)
        self.rep_ids: np.ndarray = np.zeros((0,), np.int32)
        self._rep_rows: jax.Array | None = None
        self._rep_sq: jax.Array | None = None
        self._rep_ids_dev: jax.Array | None = None
        self._rng = np.random.default_rng(0x5EED)

    @property
    def num_reps(self) -> int:
        return len(self.rep_ids)

    def refresh(self, live_ids: np.ndarray, x_host: np.ndarray, num_reps: int):
        """Resample representatives from the live id set."""
        live_ids = np.asarray(live_ids)
        if len(live_ids) == 0:
            self.rep_ids = np.zeros((0,), np.int32)
            self._rep_rows = None
            return
        num = int(min(max(num_reps, 1), len(live_ids)))
        sel = (
            live_ids
            if num >= len(live_ids)
            else self._rng.choice(live_ids, size=num, replace=False)
        )
        sel = np.sort(sel).astype(np.int32)
        # pad to a power-of-two bucket by repeating the first id so rep-array
        # shapes stay stable across refreshes (bounds jit recompiles);
        # duplicate seeds are deduped inside graph_search
        bucket = 1 << max(int(np.ceil(np.log2(max(len(sel), 1)))), 4)
        if len(sel) < bucket:
            sel = np.concatenate(
                [sel, np.full(bucket - len(sel), sel[0], np.int32)]
            )
        self.set_representatives(sel, x_host)

    def set_representatives(self, rep_ids: np.ndarray, x_host: np.ndarray):
        self.rep_ids = np.asarray(rep_ids, dtype=np.int32)
        rows = jnp.asarray(x_host[self.rep_ids])
        self._rep_rows = rows
        self._rep_sq = D.sq_norms(rows)
        # device copy: re-uploading rep_ids per batch costs ~1 ms over the
        # tunneled device at 1M-scale rep counts
        self._rep_ids_dev = jnp.asarray(self.rep_ids)

    def verify(self, live_mask: np.ndarray, x_host: np.ndarray) -> list:
        """Seed-structure invariants — the role of DVPTree::verify
        (reference Tree.h:380-403: child pointers + leaf membership): every
        representative must be a LIVE object and its cached device row must
        match the authoritative host row (a stale row would seed searches
        toward vectors that no longer exist)."""
        errs: list = []
        if self.num_reps == 0:
            return errs
        ids = self.rep_ids
        n = len(live_mask)
        if (ids < 0).any() or (ids >= n).any():
            errs.append("representative id out of range")
            return errs
        dead = ~np.asarray(live_mask)[ids]
        if dead.any():
            errs.append(f"{int(dead.sum())} representatives are dead objects")
        if self._rep_rows is not None:
            cached = np.asarray(self._rep_rows)
            if cached.shape != x_host[ids].shape or not np.array_equal(
                cached, x_host[ids]
            ):
                errs.append("representative rows stale vs object store")
        return errs

    def seeds_for(self, queries: jax.Array, seed_size: int | None = None) -> jax.Array:
        """queries [B, D_pad] -> seed ids [B, S] int32 (device)."""
        s = int(seed_size or self.seed_size)
        if self._rep_rows is None or self.num_reps == 0:
            return jnp.full((queries.shape[0], s), -1, jnp.int32)
        d = D.seed_scores(
            self.metric, queries, self._rep_rows, rep_sq=self._rep_sq
        )
        s_eff = min(s, self.num_reps)
        # approx_max_k (PartialReduce HW) instead of exact top_k: over a
        # [B, reps] tile the exact top_k costs ~60 ms (~25% of a whole
        # eps=0 query batch at 1M) while the approximate selector is ~free;
        # seeds are a heuristic entry set, and measured recall at 1M is
        # unchanged.  On CPU backends this lowers to an exact reduction.
        _, idx = jax.lax.approx_max_k(-d, s_eff)
        ids = jnp.take(self._rep_ids_dev, idx, axis=0)
        if s_eff < s:
            ids = jnp.concatenate(
                [ids, jnp.full((queries.shape[0], s - s_eff), -1, jnp.int32)], axis=1
            )
        return ids

    def finalize_kmeans(
        self,
        live_ids: np.ndarray,
        x_host: np.ndarray,
        num_reps: int = 1024,
        sample: int = 65536,
        iters: int = 10,
    ):
        """Replace random representatives with k-means centroids' nearest
        live objects — locality comparable to the reference's tree leaves
        (DVPTree clusters by pivot distance; Node.cpp:145-227), at the cost
        of one offline k-means."""
        from ngt_tpu.quant.clustering import kmeans
        from ngt_tpu.ops import distances as D
        import jax.numpy as jnp

        if self.metric in (
            DistanceType.HAMMING,
            DistanceType.JACCARD,
            DistanceType.SPARSE_JACCARD,
        ):
            return  # no meaningful centroid mean; keep sampled reps
        live_ids = np.asarray(live_ids)
        if len(live_ids) == 0:
            return
        if num_reps > 4096:
            # k-means at this k costs a [sample, k] one-hot matmul per
            # iteration; coverage (rep count) matters more than centroid
            # placement at scale — keep the uniform sample
            self.refresh(live_ids, x_host, num_reps)
            return
        pool = (
            live_ids
            if len(live_ids) <= sample
            else self._rng.choice(live_ids, size=sample, replace=False)
        )
        k = int(min(num_reps, len(pool)))
        # pow2-bucket k so the jitted k-means program (static k) is reused
        # across index sizes: an unbucketed k compiled a fresh ~k-step
        # seeding scan per size (~40 s at k≈3000 over the tunnel).  Random
        # init, not kmeans++: centroids snap to their nearest live member
        # below, so placement precision beyond Lloyd iterations is wasted.
        k = min(1 << max(int(np.ceil(np.log2(max(k, 1)))), 0), len(pool))
        rows = x_host[pool].astype(np.float32)
        cents, _ = kmeans(rows, k, iters=iters, mode="random")
        # nearest live object per centroid (one pairwise block; argmin on
        # device — only k int32 ids come back over the tunnel)
        nearest = pool[
            np.asarray(
                _nearest_row(jnp.asarray(cents), jnp.asarray(rows), self.metric)
            )
        ]
        sel = np.unique(nearest).astype(np.int32)
        bucket = 1 << max(int(np.ceil(np.log2(max(len(sel), 1)))), 4)
        if len(sel) < bucket:
            sel = np.concatenate(
                [sel, np.full(bucket - len(sel), sel[0], np.int32)]
            )
        self.set_representatives(sel, x_host)

    def state_dict(self) -> dict:
        return {"rep_ids": self.rep_ids, "seed_size": self.seed_size}
