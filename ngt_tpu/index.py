"""Index facade — create / insert / build / search / save / open.

API mirrors the reference's Python surface (``ngtpy``; reference
python/src/ngtpy.cpp:28-639 and the ``NGT::Index`` facade, lib/NGT/Index.h:42-547):
zero-based external ids by default (ngtpy.cpp:70-75), ``insert`` +
``build_index`` resume semantics (only unindexed objects are built;
Index.cpp:648-651), epsilon/edge-size search knobs, and an index directory
with an NGT-compatible ``prf`` file.

Device-side layout: objects in one HBM matrix, adjacency in a fixed-width
int32 matrix, searches batched (``batch_search`` is the TPU-native entry;
``search`` wraps a batch of one).
"""

from __future__ import annotations

import io
import json
import math
import os
import shutil
from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from ngt_tpu.graph.build import DeviceMirror, build_anng, remove_object, _bucket, _pad_ids
from ngt_tpu.graph.search import (  # noqa: F401
    graph_search,
    seeded_search,
    wrap_hash_bits as _wrap_hash_bits,
)
from ngt_tpu.graph.storage import GraphStore
from ngt_tpu.ops import bruteforce as BF
from ngt_tpu.properties import (
    DistanceType,
    IndexType,
    ObjectType,
    Property,
    resolve_distance_type,
    resolve_object_type,
)
from ngt_tpu.seeds import Seeder, default_reps
from ngt_tpu.store import VectorStore

FORMAT_VERSION = 1


class Index:
    def __init__(
        self,
        path: Optional[str] = None,
        prop: Optional[Property] = None,
        zero_based_numbering: bool = True,
        memory_mapped: bool = False,
    ):
        self.path = path
        self.zero_based = zero_based_numbering
        if path is not None and os.path.exists(os.path.join(path, "prf")):
            self._load(path, memory_mapped=memory_mapped)
            return
        if prop is None:
            raise ValueError("need an existing index path or a Property")
        self.prop = prop.copy()
        self.store = VectorStore(
            dimension=prop.dimension,
            metric=prop.distance_type,
            object_type=prop.object_type,
        )
        self.graph = GraphStore(max_edges=prop.max_edges)
        self.seeder = Seeder(prop.distance_type, seed_size=prop.seed_size)
        self._mirror: Optional[DeviceMirror] = None
        self._qg = None  # lazily-built sq8 mirror (search_mode routing)

    # ------------------------------------------------------------- ids -----
    def _ext(self, internal: np.ndarray | int):
        if isinstance(internal, (int, np.integer)):
            return int(internal) - 1 if self.zero_based else int(internal)
        out = np.asarray(internal)
        if self.zero_based:
            out = np.where(out >= 0, out - 1, out)
        return out

    def _int(self, external: int) -> int:
        return int(external) + 1 if self.zero_based else int(external)

    # --------------------------------------------------------- mutation ----
    def insert(self, v) -> int:
        """Insert one vector (no graph node yet — call build_index;
        mirrors ngtpy insert, ngtpy.cpp:126-143)."""
        return self._ext(self.store.insert(np.asarray(v)))

    def batch_insert(self, vs, build: bool = True) -> np.ndarray:
        """Insert many vectors and (by default) index them
        (ngtpy batch_insert, ngtpy.cpp:145-170)."""
        ids = self.store.batch_insert(np.asarray(vs))
        if build:
            self.build_index()
        return self._ext(ids)

    def batch_insert_dedup(
        self, vs, radius: float, build: bool = True
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Range-gated deduplicating insert — the reference's
        ``createIndex(objects, ids, range, threadSize)`` (Index.cpp:1303-1352):
        an object whose nearest indexed object, or nearest EARLIER batch
        member that itself got inserted, lies within ``radius`` is NOT
        inserted; it reports that object instead (InsertionResult.identical,
        Index.h:284-290).  NGTQ grows its codebooks with exactly this call
        (NGTQ/Quantizer.h:1681-1717).

        Returns ``(ids, identical, dist)`` per input row: the external id
        (the surviving object's id for deduplicated rows), the identical
        flag, and the matched distance (0 for inserted rows).

        TPU design: the store check is ONE exact device scan (the reference
        resolves against its approximate in-build search results, so exact
        is >= reference fidelity); the intra-batch check is a blocked
        pairwise top-m, with serial resolution only over rows that actually
        have a within-radius earlier neighbor."""
        import jax
        import jax.numpy as jnp

        from ngt_tpu.ops import distances as D

        qdtype = np.int64 if self.store.sparse else np.float32
        vs = np.asarray(vs, dtype=qdtype)
        if vs.ndim == 1:
            vs = vs[None]
        prepared = self.store._prepare(vs)
        b = len(prepared)
        radius = float(radius)

        # nearest already-indexed object (exact device scan)
        store_id = np.full(b, -1, np.int64)
        store_d = np.full(b, np.inf, np.float32)
        if len(self.store) > 0:
            sid, sd = self.batch_linear_search(vs, size=1)
            store_id = np.asarray(sid)[:, 0].astype(np.int64)
            store_d = np.asarray(sd)[:, 0].astype(np.float32)
            store_id[~np.isfinite(store_d)] = -1

        # intra-batch top-m EARLIER neighbors (blocked pairwise, j < i mask)
        m = int(min(16, max(b - 1, 1)))
        inb_j = np.full((b, m), -1, np.int64)
        inb_d = np.full((b, m), np.inf, np.float32)
        if b > 1:
            xb = jnp.asarray(prepared)
            step = 4096
            for s in range(0, b, step):
                dd = D.pairwise(self.store.metric, xb[s : s + step], xb)
                rows = jnp.arange(s, min(s + step, b))[:, None]
                dd = jnp.where(jnp.arange(b)[None, :] < rows, dd, jnp.inf)
                neg, jj = jax.lax.top_k(-dd, m)
                d_h, j_h = jax.device_get((-neg, jj))
                inb_d[s : s + step] = d_h
                inb_j[s : s + step] = j_h
            inb_j[~np.isfinite(inb_d)] = -1

        identical = np.zeros(b, bool)
        match_store = np.full(b, -1, np.int64)  # external id when matched
        match_batch = np.full(b, -1, np.int64)  # batch row when matched
        match_d = np.zeros(b, np.float32)
        inserted = np.zeros(b, bool)
        cand = (store_d <= radius) | (inb_d[:, 0] <= radius)
        inserted[~cand] = True
        for i in np.nonzero(cand)[0]:
            best_d = store_d[i] if store_d[i] <= radius else np.inf
            best_b = -1
            saturated = True
            for j, dj in zip(inb_j[i], inb_d[i]):
                if dj > radius or not np.isfinite(dj):
                    saturated = False
                    break
                if inserted[j]:
                    # ascending list: the first inserted entry is the
                    # nearest inserted one
                    if dj < best_d:
                        best_d, best_b = float(dj), int(j)
                    saturated = False
                    break
            if saturated and m < b - 1:
                # every top-m entry was a within-radius NON-inserted row:
                # a farther inserted neighbor may hide beyond the window —
                # exact re-check against all earlier inserted rows
                prev = np.nonzero(inserted[:i])[0]
                if len(prev):
                    dall = np.asarray(
                        D.pairwise(
                            self.store.metric,
                            jnp.asarray(prepared[i][None]),
                            jnp.asarray(prepared[prev]),
                        )
                    )[0]
                    jj = int(np.argmin(dall))
                    if dall[jj] <= radius and dall[jj] < best_d:
                        best_d, best_b = float(dall[jj]), int(prev[jj])
            if np.isfinite(best_d):
                identical[i] = True
                match_d[i] = best_d
                if best_b >= 0:
                    match_batch[i] = best_b
                else:
                    match_store[i] = store_id[i]
            else:
                inserted[i] = True

        new_ids = np.full(b, -1, np.int64)
        rows = np.nonzero(inserted)[0]
        if len(rows):
            ids_int = self.store.batch_insert(vs[rows])
            new_ids[rows] = np.asarray(self._ext(ids_int))
            if build:
                self.build_index()
        out_ids = new_ids.copy()
        mb = match_batch >= 0
        out_ids[mb] = new_ids[match_batch[mb]]
        ms = match_store >= 0
        out_ids[ms] = match_store[ms]
        dist = np.where(inserted, np.float32(0), match_d).astype(np.float32)
        return out_ids, identical, dist

    def build_index(self, num_threads: int = 0) -> None:
        """Create graph nodes for all unindexed objects
        (Index::createIndex; Index.cpp:609-629). ``num_threads`` accepted for
        API parity; parallelism is the device batch."""
        del num_threads
        n = self.store.repository_size
        self.graph.ensure_capacity(self.store._x.shape[0])
        live = self.store._valid[:n]
        has = self.graph._has_node[:n]
        pending = np.nonzero(live & ~has)[0].astype(np.int32)
        algo = self.prop.build_algorithm
        fresh = self.graph.node_count() == 0
        big_append = len(pending) >= self.prop.bulk_append_threshold
        if algo == "bulk" or (
            algo == "auto" and len(pending) > 0 and (fresh or big_append)
        ):
            from ngt_tpu.graph.build import build_bulk

            self._mirror = build_bulk(
                self.store, self.graph, self.seeder, self.prop, pending,
                self._mirror,
            )
        else:
            self._mirror = build_anng(
                self.store, self.graph, self.seeder, self.prop, pending,
                self._mirror,
            )

    def remove(self, external_id: int) -> None:
        oid = self._int(external_id)
        if not self.store.contains(oid):
            raise KeyError(f"no such object id: {external_id}")
        touched = remove_object(self.store, self.graph, oid, self.store.metric)
        if self._mirror is not None:
            # incremental: scatter only the changed rows (a full HBM
            # re-upload per removal makes a removal batch O(n·removals);
            # the reference's delete path is likewise incremental,
            # Graph.cpp:641-864)
            self._mirror.update_rows(touched, touched)
        if self.seeder.num_reps and (self.seeder.rep_ids == oid).any():
            # the removed object was a seed representative: resample (the
            # reference replaces the removed tree slot with a nearby live
            # object, Index.h:1423-1453)
            live = np.nonzero(self.store._valid[: self.store.repository_size])[0]
            if len(live):
                self.seeder.refresh(
                    live.astype(np.int32), self.store._x, self.seeder.num_reps
                )
            else:
                self.seeder.rep_ids = np.zeros((0,), np.int32)
                self.seeder._rep_rows = None
                self.seeder._rep_ids_dev = None

    def batch_remove(self, external_ids) -> None:
        """Delete a set of objects with batch-wide passes: one vectorized
        reverse scan for the whole set, one repair program, one mirror
        scatter (vs one full O(N*E) scan per id in ``remove``).  Matches the
        reference's per-delete semantics (removeEdgesReliably,
        Graph.cpp:641-864) applied to every id."""
        from ngt_tpu.graph.build import batch_remove_objects

        oids = np.unique([self._int(e) for e in np.asarray(external_ids).ravel()])
        for oid in oids:
            if not self.store.contains(int(oid)):
                raise KeyError(f"no such object id: {oid}")
        touched = batch_remove_objects(
            self.store, self.graph, oids, self.store.metric
        )
        if self._mirror is not None:
            self._mirror.update_rows(touched, touched)
        if self.seeder.num_reps and np.isin(self.seeder.rep_ids, oids).any():
            live = np.nonzero(self.store._valid[: self.store.repository_size])[0]
            if len(live):
                self.seeder.refresh(
                    live.astype(np.int32), self.store._x, self.seeder.num_reps
                )
            else:
                self.seeder.rep_ids = np.zeros((0,), np.int32)
                self.seeder._rep_rows = None
                self.seeder._rep_ids_dev = None

    def get_object(self, external_id: int) -> np.ndarray:
        return self.store.get(self._int(external_id))

    def get_edges(self, external_id: int) -> list[tuple[int, float]]:
        """Sorted (neighbor id, distance) edges of one graph node — the
        analogue of ngt_get_edges (reference Capi.cpp GraphNode accessor);
        ids use this index's id base (1-based unless ``zero_based``)."""
        oid = self._int(external_id)
        if not self.graph.has_node(oid):
            raise KeyError(f"no graph node for id {external_id}")
        ids, dists = self.graph.get_node(oid)
        return [
            (int(self._ext(int(i))), float(d))
            for i, d in zip(ids, dists)
            if i >= 0
        ]

    def make_sparse_object(self, ids) -> np.ndarray:
        """Pack a feature-id set for a Sparse-Jaccard index (the analogue of
        Index::makeSparseObject, reference Index.cpp:303-320)."""
        from ngt_tpu.store import pad_sparse

        return pad_sparse([ids], self.store.dimension)[0]

    def insert_sparse(self, ids) -> int:
        return self.insert(self.make_sparse_object(ids))

    def optimize_seeds(self, num_reps: int = 0) -> None:
        """Upgrade seed representatives from a random sample to k-means
        centroids' nearest members (tree-leaf-like locality).  num_reps=0
        scales with index size — shrinking the rep set below default_reps
        collapses entry-point coverage at scale."""
        n = self.store.repository_size
        live = np.nonzero(
            self.store._valid[:n] & self.graph._has_node[:n]
        )[0].astype(np.int32)
        reps = num_reps if num_reps > 0 else default_reps(len(live))
        self.seeder.finalize_kmeans(live, self.store._x, num_reps=reps)

    def __len__(self) -> int:
        return len(self.store)

    # ------------------------------------------------------------ search ----
    def _ensure_mirror(self) -> DeviceMirror:
        if self._mirror is None:
            self._mirror = DeviceMirror(self.store, self.graph)
            self._mirror.sync_full()
        return self._mirror

    def _auto_width(self, k: int, epsilon: float) -> int:
        if self.prop.search_width > 0:
            return max(self.prop.search_width, k)
        # wider exploration for bigger ε, mirroring the reference's dynamic
        # edge policy intent (Graph.h:675-692); rounded to a power of two so
        # nearby ε values share one compiled program
        w = max(64, 2 * k, int(k * (1.0 + 8.0 * max(epsilon, 0.0))))
        return 1 << int(math.ceil(math.log2(w)))

    def _maybe_qg(self):
        """The maintained sq8 neighbor-block mirror for auto-routed searches
        (the role NGTQG plays as the reference's production path,
        NGTQ/QuantizedGraph.h:192-320).  Returns None when routing does not
        apply; the mirror self-refreshes on store mutations (see
        quant/qgraph.py _dev_codes/_dev_blocks version keys)."""
        from ngt_tpu.graph.build import _SQ8_METRICS

        self._qg_size_blocked = False
        mode = self.prop.search_mode
        if mode == "exact" or self.store.sparse:
            return None
        if self.store.metric not in _SQ8_METRICS:
            return None
        cooldown = getattr(self, "_qg_cooldown_until", 0.0)
        if cooldown:
            import time as _time

            if _time.monotonic() < cooldown:
                return None   # device HBM was exhausted; exact path for now
            self._qg_cooldown_until = 0.0
        n = self.graph.node_count()
        if mode != "qg" and n < self.prop.search_qg_threshold:
            return None
        if n == 0:
            return None
        from ngt_tpu.quant.qgraph import QuantizedGraphIndex

        if mode != "qg" and self._qg is None:
            # proactive fit check with the AUTO-SELECTED block format
            # (pick_mode: sq8 while the budget admits wide blocks, pq4 —
            # 0.25 B/dim — past that, which carries one chip to 4M+ rows).
            # Past the point where even the 16-edge block-width FLOOR of the
            # chosen format exceeds the HBM budget, skip the mirror: the eb
            # formula's max(16, budget) would ship blocks far over budget
            # and thrash the OOM-shrink retry loop before falling back.
            # NGT_TPU_QG_MAX_GB caps the floor-width block bytes the auto
            # route may attempt; explicit search_mode="qg" (or ShardedQG
            # over a mesh, the intended path at this scale) still forces it.
            import os as _os

            cap = self.store._x.shape[0]
            d_pad = self.store.d_pad
            fmt = QuantizedGraphIndex.pick_mode(cap, d_pad)
            bpd = d_pad if fmt == "sq8" else -(-d_pad // 4)   # bytes/row-edge
            floor_bytes = cap * 8 * bpd + cap * bpd   # floor blocks + codes
            max_gb = float(_os.environ.get("NGT_TPU_QG_MAX_GB", "9"))
            if floor_bytes > max_gb * (1 << 30):
                from ngt_tpu.utils import logger

                self._qg_size_blocked = True
                if not getattr(self, "_qg_size_warned", False):
                    self._qg_size_warned = True
                    logger.warning(
                        "%s mirror skipped: %d-row blocks need %.1f GiB "
                        "even at the width floor (> NGT_TPU_QG_MAX_GB=%g); "
                        "auto-routing falls through to %s "
                        "(ShardedQG or search_mode='qg' still force blocks)",
                        fmt, cap, floor_bytes / (1 << 30), max_gb,
                        "an IVFPQ mirror"
                        if self.prop.search_fallback == "ivfpq"
                        else "the exact path",
                    )
                return None
        if self._qg is None:
            self._qg = QuantizedGraphIndex.quantize(self, mode="auto")
        return self._qg

    def _maybe_ivfpq(self):
        """The auto crossover past the sq8/pq4 block ceiling: when
        ``_maybe_qg`` skipped because even floor-width neighbor blocks
        exceed the device HBM budget (~8M rows at 128d on one 16 GB chip),
        "auto" routing maintains an IVFPQ mirror instead of dropping to the
        exact traversal — the reference's own large-dataset answer is its
        NGTQ index (README.md:31; Graph.h:290-349 is the graph-side memory
        switch).  Opt out with properties.search_fallback="exact".  Env
        knobs: NGT_TPU_AUTO_IVFPQ_NPROBE (default 32),
        NGT_TPU_AUTO_IVFPQ_EXP (result expansion, default 16),
        NGT_TPU_AUTO_IVFPQ_RAW_GB (device-raw budget, default 4; larger
        corpora spill raw vectors to an mmap file for host refine).
        The mirror rebuilds when the store mutates
        (VectorStore.mutation_count key)."""
        if self.prop.search_fallback != "ivfpq":
            return None
        if self.store.object_type not in (
            ObjectType.FLOAT, ObjectType.BFLOAT16, ObjectType.UINT8,
        ):
            return None
        key = (self.store.mutation_count, self.store.repository_size)
        if (
            getattr(self, "_ivfpq_mirror", None) is not None
            and self._ivfpq_key == key
        ):
            return self._ivfpq_mirror
        import os as _os
        import tempfile as _tempfile
        import time as _time

        from ngt_tpu.quant.ivfpq import IVFPQIndex
        from ngt_tpu.utils import logger

        n = self.store.repository_size
        live = np.nonzero(self.store._valid[:n])[0]
        if len(live) == 0:
            return None
        raw_gb = float(_os.environ.get("NGT_TPU_AUTO_IVFPQ_RAW_GB", "4"))
        raw_bytes = len(live) * self.store.dimension * 4
        if raw_bytes <= raw_gb * (1 << 30):
            raw_store, raw_path = "device", None
        else:
            raw_store = "mmap"
            raw_path = _os.path.join(
                self.path if self.path else _tempfile.gettempdir(),
                "auto_ivfpq_raw.f32",
            )
        n_centroids = int(min(1 << 14, max(256, len(live) // 2048)))
        logger.warning(
            "building the auto IVFPQ mirror for %d rows (%d centroids, "
            "raw=%s) — one-time cost; search_fallback='exact' opts out",
            len(live), n_centroids, raw_store,
        )
        t0 = _time.time()
        ivf = IVFPQIndex(
            dimension=self.store.dimension,
            n_centroids=n_centroids,
            metric=self.store.metric,
            raw_store=raw_store,
            raw_path=raw_path,
        )
        step = 1 << 20
        x = self.store._x
        for s in range(0, len(live), step):
            sel = live[s : s + step]
            ivf.batch_insert(
                np.asarray(x[sel, : self.store.dimension], np.float32)
            )
        ivf.build()
        logger.warning("auto IVFPQ mirror built in %.0f s", _time.time() - t0)
        self._ivfpq_mirror = ivf
        self._ivfpq_ids = live.astype(np.int64)  # mirror row -> external id
        self._ivfpq_key = key
        return ivf

    def _resolve_edge_size(self, edge_size: int, epsilon: float) -> int:
        """Per-search edge count (NeighborhoodGraph::getEdgeSize,
        reference Graph.h:675-692): -1 = property default, 0 = unlimited,
        >0 = explicit, -2 = dynamic ``base + 10^(ε·rate)`` (Graph.h:683-686,
        where explorationCoefficient = 1 + ε)."""
        if edge_size == -1:
            return min(self.prop.edge_size_for_search, self.graph.e_max)
        if edge_size == 0:
            return self.graph.e_max
        if edge_size == -2:
            add = 10.0 ** (epsilon * float(self.prop.dynamic_edge_size_rate))
            e = self.prop.dynamic_edge_size_base + int(min(add, 2**31 - 1))
            return min(e, self.graph.e_max)
        if edge_size > 0:
            return min(int(edge_size), self.graph.e_max)
        raise ValueError(f"invalid edge size: {edge_size}")

    def batch_search(
        self,
        queries,
        size: int = 10,
        epsilon: float = 0.1,
        radius: float = float("inf"),
        edge_size: int = -1,
        width: int = 0,
        expand: int = 0,
        expected_accuracy: float = -1.0,
        with_stats: bool = False,
        ef: int = 0,
    ):
        """TPU-native batched k-NN. queries: [B, dim] host or device array.
        Returns (ids [B, k] external, dists [B, k]); -1 id = empty slot.
        ``expected_accuracy`` > 0 maps to ε via the accuracy table
        (reference Index.h:1156-1158).  ``ef`` > size drives the radius
        rule from the ef-th best pool distance (properties.search_ef;
        rank-based widening — the adaptive alternative to epsilon)."""
        if expected_accuracy > 0:
            from ngt_tpu.optimizer import AccuracyTable

            if not self.prop.accuracy_table:
                raise ValueError(
                    "expected_accuracy needs an accuracy table; run "
                    "ngt_tpu.optimizer.generate_accuracy_table first"
                )
            epsilon = AccuracyTable.from_string(
                self.prop.accuracy_table
            ).get_epsilon(expected_accuracy)
        # auto-route through the sq8 neighbor-block mirror (opt-out via
        # prop.search_mode="exact"): the quantized traversal + exact re-rank
        # is 2-3x the exact path's throughput at equal recall at scale
        if (
            not with_stats
            and edge_size == -1
            and not np.isfinite(radius)
            and expand == 0
            and width == 0
        ):
            qg = self._maybe_qg()
            if qg is not None:
                import time as _time

                import jax as _jax

                try:
                    return qg.batch_search(
                        queries, size=size, epsilon=epsilon,
                        result_expansion=self.prop.result_expansion,
                        ef=ef,
                    )
                except _jax.errors.JaxRuntimeError as exc:
                    # the wrapper already shrank its neighbor blocks to the
                    # width floor; the multi-tenant chip simply cannot fit
                    # the sq8 mirror right now.  Serve this call on the
                    # exact path and stop re-trying the mirror for a while
                    # (each failed block gather costs seconds of enqueue).
                    if "RESOURCE_EXHAUSTED" not in str(exc):
                        raise
                    from ngt_tpu.utils import logger

                    logger.warning(
                        "sq8 mirror does not fit in free device HBM; "
                        "serving on the exact path (retry in 60s)"
                    )
                    # drop the mirror's device tensors NOW: the chip is out
                    # of HBM and the exact path still needs room for its
                    # query upload and search scratch
                    qg.release_device()
                    self._qg_cooldown_until = _time.monotonic() + 60.0
            elif getattr(self, "_qg_size_blocked", False):
                # past the block ceiling: serve from the IVFPQ mirror (the
                # qg->ivfpq crossover; _maybe_ivfpq docstring has the knobs)
                ivf = self._maybe_ivfpq()
                if ivf is not None:
                    import os as _os

                    nprobe = int(
                        _os.environ.get("NGT_TPU_AUTO_IVFPQ_NPROBE", "32")
                    )
                    exp = float(
                        _os.environ.get("NGT_TPU_AUTO_IVFPQ_EXP", "16")
                    )
                    q = self.store.prepare_queries_host(
                        np.asarray(queries, np.float32)
                    )[:, : self.store.dimension]
                    rows, dists = ivf.batch_search(
                        q, size=size, nprobe=nprobe,
                        result_expansion=exp, mode="refine",
                    )
                    rows = np.asarray(rows)
                    ok = (rows >= 0) & (rows < len(self._ivfpq_ids))
                    ids = np.where(
                        ok,
                        self._ivfpq_ids[np.clip(rows, 0, len(self._ivfpq_ids) - 1)]
                        - (1 if self.zero_based else 0),
                        -1,
                    )
                    return ids, np.asarray(dists)
        mirror = self._ensure_mirror()
        qdtype = np.int64 if self.store.sparse else np.float32
        q = self.store.prepare_queries(np.asarray(queries, dtype=qdtype))
        b = q.shape[0]
        bpad = _bucket(b)
        if bpad != b:
            q = jnp.concatenate([q, jnp.tile(q[:1], (bpad - b, 1))], axis=0)
        if self.seeder.num_reps == 0 and self.graph.node_count() > 0:
            live = np.nonzero(self.graph._has_node)[0].astype(np.int32)
            self.seeder.refresh(live, self.store._x, default_reps(len(live)))
        e = self._resolve_edge_size(edge_size, epsilon)
        bits, exact = _wrap_hash_bits(mirror.capacity, self.prop.visited_bits_log2)
        rep_rows, rep_sq = self.seeder._rep_rows, self.seeder._rep_sq
        if mirror.sqnorm is None:
            rep_sq = None
        # exploration rank: pool size kk = ef keeps the frontier alive until
        # the ef-th best stops improving; the first `size` rows are returned
        if ef <= 0:
            ef = max(int(self.prop.search_ef), 0)
        kk = min(max(int(size), ef), 4 * int(size) + 64) if ef > 0 else int(size)
        res = seeded_search(
            mirror.x,
            mirror.nbr,
            mirror.valid,
            mirror.sqnorm,
            rep_rows,
            rep_sq,
            self.seeder._rep_ids_dev
            if self.seeder._rep_ids_dev is not None
            else jnp.asarray(self.seeder.rep_ids),
            q,
            jnp.float32(epsilon),
            jnp.float32(radius),
            jnp.int32(e),
            metric=self.store.metric,
            k=kk,
            s=int(self.prop.seed_size),
            width=width if width > 0 else self._auto_width(kk, epsilon),
            max_iters=0,
            hash_bits=bits,
            exact_hash=exact,
            expand=expand if expand > 0 else max(self.prop.search_expand, 1),
        )
        ids = self._ext(np.asarray(res.ids)[:b, : int(size)])
        dists = np.asarray(res.dists)[:b, : int(size)]
        if with_stats:
            return ids, dists, {
                "visit_count": np.asarray(res.visit_count)[:b],
                "distance_count": np.asarray(res.dist_count)[:b],
                "iters": int(res.iters),
            }
        return ids, dists

    def search(
        self,
        query,
        size: int = 10,
        epsilon: float = 0.1,
        radius: float = float("inf"),
        edge_size: int = -1,
        expected_accuracy: float = -1.0,
        with_distance: bool = True,
    ):
        """Single-query search returning [(id, dist)] like ngtpy
        (ngtpy.cpp:172-240)."""
        qdtype = np.int64 if self.store.sparse else np.float32
        ids, dists = self.batch_search(
            np.asarray(query, dtype=qdtype)[None, :],
            size=size,
            epsilon=epsilon,
            radius=radius,
            edge_size=edge_size,
            expected_accuracy=expected_accuracy,
        )
        out = [
            (int(i), float(d))
            for i, d in zip(ids[0], dists[0])
            if i >= (0 if self.zero_based else 1) and np.isfinite(d)
        ]
        if with_distance:
            return out
        return [i for i, _ in out]

    def linear_search(self, query, size: int = 10):
        """Exact search (ngtpy linear_search; ObjectSpaceRepository.h:466)."""
        x, valid, sqn = self.store.device_arrays()
        qdtype = np.int64 if self.store.sparse else np.float32
        q = self.store.prepare_queries(np.asarray(query, dtype=qdtype)[None, :])
        ids, dists = BF.linear_search(
            q, x, valid, self.store.metric, int(size), x_sqnorm=sqn
        )
        ids = self._ext(np.asarray(ids))[0]
        dists = np.asarray(dists)[0]
        return [
            (int(i), float(d))
            for i, d in zip(ids, dists)
            if i >= (0 if self.zero_based else 1) and np.isfinite(d)
        ]

    def batch_linear_search(self, queries, size: int = 10):
        """Exact batched top-k — also the ground-truth generator for the
        recall harness (reference generates GT with `ngt search -i s`)."""
        x, valid, sqn = self.store.device_arrays()
        qdtype = np.int64 if self.store.sparse else np.float32
        q = self.store.prepare_queries(np.asarray(queries, dtype=qdtype))
        ids, dists = BF.linear_search(
            q, x, valid, self.store.metric, int(size), x_sqnorm=sqn
        )
        return self._ext(np.asarray(ids)), np.asarray(dists)

    # ------------------------------------------------------------ verify ----
    def verify(self) -> list[str]:
        """Structural invariant check (the analogue of GraphIndex::verify +
        GraphAndTreeIndex::verify, reference Index.h:940-1053,
        Index.cpp:1438-1615). Returns a list of problems (empty = ok)."""
        errs: list[str] = []
        n = self.store.repository_size
        live = self.store._valid[:n]
        has = self.graph._has_node[:n]
        if (live & ~has).any():
            errs.append(f"{int((live & ~has).sum())} objects lack graph nodes")
        if (~live & has).any():
            errs.append(f"{int((~live & has).sum())} graph nodes lack objects")
        nbr = self.graph.nbr_ids[:n]
        deg = self.graph.degree[:n]
        col = np.arange(nbr.shape[1])[None, :]
        in_deg = col < deg[:, None]
        edges = nbr[in_deg]
        if len(edges):
            if (edges < 0).any():
                errs.append("negative edge inside degree range")
            bad = ~live[np.clip(edges, 0, n - 1)] | (edges >= n)
            if bad.any():
                errs.append(f"{int(bad.sum())} edges point to dead/out-of-range ids")
        # self edges
        rows = np.nonzero((nbr == np.arange(n)[:, None]) & in_deg)[0]
        if len(rows):
            errs.append(f"{len(rows)} self-edges")
        # sortedness (within degree only; padding is +inf — swap in a large
        # finite value so diff never computes inf-inf)
        d = np.where(
            np.isfinite(self.graph.nbr_dist[:n]),
            self.graph.nbr_dist[:n],
            np.float32(3.0e38),
        )
        dd = np.diff(d, axis=1)
        within = in_deg[:, 1:]
        if not (dd[within] >= -1e-6).all():
            errs.append("edge lists not sorted by distance")
        errs.extend(self.seeder.verify(live, self.store._x[:n]))
        return errs

    def check_graph(self, sample: int = 1024, seed: int = 0) -> dict:
        """Re-derive sampled nodes' edges by EXACT search and compare with
        the stored adjacency — the reference's checkGraph diagnostic
        (GraphIndex, Index.h:886-938: re-searches every node and prints
        edges that diverge).  The TPU form is batched: one exact device
        top-k over the sampled rows.

        Returns {'checked', 'mean_overlap', 'min_overlap', 'divergent'}
        where overlap is the fraction of a node's stored edges found in
        its re-derived exact top-(degree) neighbor list, and 'divergent'
        counts nodes with overlap < 1.  ANNG rows hold approximate edges
        plus reverse insertions, so overlap < 1 is normal there; the
        fresh bulk-built graph holds exact rows (overlap 1 for the k-NN
        prefix is the healthy signature)."""
        n = self.store.repository_size
        live = np.nonzero(self.store._valid[:n] & self.graph._has_node[:n])[0]
        if len(live) == 0:
            return {"checked": 0, "mean_overlap": 1.0, "min_overlap": 1.0,
                    "divergent": 0}
        rng = np.random.default_rng(seed)
        pick = (
            live if len(live) <= sample
            else np.sort(rng.choice(live, sample, replace=False))
        )
        deg = self.graph.degree[pick].astype(np.int64)
        kmax = int(max(deg.max(), 1))
        x, valid, sqn = self.store.device_arrays()
        q = jnp.asarray(self.store._x[pick])
        # k+1: the exact list contains the node itself at distance 0
        ids, _ = BF.linear_search(
            q, x, valid, self.store.metric, kmax + 1, x_sqnorm=sqn
        )
        ids = np.asarray(ids)
        ids = np.where(ids == pick[:, None], -1, ids)  # drop self-hit
        stored = self.graph.nbr_ids[pick]
        overlaps = np.empty(len(pick), np.float64)
        for i in range(len(pick)):
            d = int(deg[i])
            if d == 0:
                overlaps[i] = 1.0
                continue
            exact = set(ids[i][ids[i] >= 0][:d].tolist())
            row = stored[i, :d]
            overlaps[i] = sum(1 for e in row if int(e) in exact) / d
        return {
            "checked": int(len(pick)),
            "mean_overlap": float(overlaps.mean()),
            "min_overlap": float(overlaps.min()),
            "divergent": int((overlaps < 1.0).sum()),
        }

    def statistics(self) -> dict:
        """Graph statistics (the analogue of showStatisticsOfGraph,
        reference Index.cpp:800-1154): degree histograms, edge-length stats,
        10-NN edge coverage (the reference's 'd10' metrics)."""
        n = self.store.repository_size
        has = self.graph._has_node[:n]
        deg = self.graph.degree[:n][has]
        nbr = self.graph.nbr_ids[:n]
        dist = self.graph.nbr_dist[:n]
        col = np.arange(nbr.shape[1])[None, :]
        in_rng = col < self.graph.degree[:n][:, None]
        edges = nbr[in_rng]
        indeg = np.bincount(
            edges[edges >= 0], minlength=n
        )[has] if len(edges) else np.zeros(0, int)
        lens = dist[in_rng]
        lens = lens[np.isfinite(lens)]
        d10 = dist[:, : min(10, dist.shape[1])]
        d10 = d10[np.isfinite(d10)]
        out = {
            "nodes": int(has.sum()),
            "edges": int(deg.sum()),
            "outdegree": {
                "min": int(deg.min()) if len(deg) else 0,
                "mean": float(deg.mean()) if len(deg) else 0.0,
                "max": int(deg.max()) if len(deg) else 0,
                "histogram": np.bincount(deg).tolist() if len(deg) else [],
            },
            "indegree": {
                "min": int(indeg.min()) if len(indeg) else 0,
                "mean": float(indeg.mean()) if len(indeg) else 0.0,
                "max": int(indeg.max()) if len(indeg) else 0,
                "zero": int((indeg == 0).sum()) if len(indeg) else 0,
            },
            "edge_length": {
                "mean": float(lens.mean()) if len(lens) else 0.0,
                "mean_10nn": float(d10.mean()) if len(d10) else 0.0,
            },
        }
        return out

    # ------------------------------------------------------- persistence ----
    def save(self, path: Optional[str] = None) -> None:
        path = path or self.path
        if path is None:
            raise ValueError("no path")
        os.makedirs(path, exist_ok=True)
        self.prop.dimension = self.store.dimension
        self.prop.save(os.path.join(path, "prf"))
        n = self.store.repository_size
        # each array is its own .npy so a reopen can MEMORY-MAP the files:
        # multiple reader processes then share one page cache copy — the
        # role of the reference's shared-memory index ("no lock function …
        # should be used only for reference", README.md:85, PersistentRepository)
        np.save(os.path.join(path, "objects.npy"), self.store._x[:n])
        gs = self.graph.state_dict(n)
        ss = self.store.state_dict()
        for name, arr in (
            ("nbr_ids", gs["nbr_ids"]),
            ("nbr_dist", gs["nbr_dist"]),
            ("degree", gs["degree"]),
            ("has_node", gs["has_node"]),
            ("valid", ss["valid"]),
            ("free", ss["free"]),
        ):
            np.save(os.path.join(path, name + ".npy"), arr)
        legacy = os.path.join(path, "graph.npz")
        if os.path.exists(legacy):
            os.remove(legacy)
        np.savez(os.path.join(path, "seeds.npz"), rep_ids=self.seeder.rep_ids)
        with open(os.path.join(path, "meta.json"), "w") as fh:
            json.dump(
                {
                    "format_version": FORMAT_VERSION,
                    "size": n,
                    "e_max": int(self.graph.e_max),
                    "framework": "ngt_tpu",
                },
                fh,
            )
        self.path = path

    def _load(self, path: str, memory_mapped: bool = False) -> None:
        self.prop = Property.load_dir(path)
        # copy-on-write mmap: readers share pages; writes stay process-local
        mm = "c" if memory_mapped else None
        x = np.load(os.path.join(path, "objects.npy"), mmap_mode=mm)
        if os.path.exists(os.path.join(path, "graph.npz")):  # round-1 format
            g = dict(np.load(os.path.join(path, "graph.npz")))
        else:
            g = {
                name: np.load(os.path.join(path, name + ".npy"), mmap_mode=mm)
                for name in (
                    "nbr_ids", "nbr_dist", "degree", "has_node", "valid",
                    "free",
                )
            }
            with open(os.path.join(path, "meta.json")) as fh:
                g["e_max"] = json.load(fh)["e_max"]
        self.store = VectorStore.from_state(
            {
                "x": x,
                "valid": g["valid"],
                "free": g["free"],
                "dimension": self.prop.dimension,
                "metric": int(self.prop.distance_type),
                "object_type": int(self.prop.object_type),
            },
            copy=not memory_mapped,
        )
        self.graph = GraphStore.from_state(
            {k: g[k] for k in ("nbr_ids", "nbr_dist", "degree", "has_node", "e_max")},
            copy=not memory_mapped,
        )
        self.graph.ensure_capacity(self.store._x.shape[0])
        self.seeder = Seeder(self.prop.distance_type, seed_size=self.prop.seed_size)
        seeds = np.load(os.path.join(path, "seeds.npz"))
        rep = seeds["rep_ids"]
        if len(rep):
            self.seeder.set_representatives(rep, self.store._x)
        self._mirror = None
        self._qg = None
        self.path = path

    def close(self) -> None:
        self._mirror = None
        self._qg = None

    @staticmethod
    def destroy(path: str) -> None:
        """Delete index files (NGT::Index::destroy, Index.h:496)."""
        shutil.rmtree(path)

    # -------------------------------------------------------- text export ---
    def export_index(self, fh) -> None:
        """Portable LOSSLESS text export: properties + objects + the graph
        adjacency + seed representatives (the reference's exportIndex
        round-trips obj/grp/tre as text, Index.h:703-715; a vectors-only
        export would silently degrade an ONNG to a rebuilt ANNG on
        import)."""
        from ngt_tpu import native

        n = self.store.repository_size
        dim = self.store.dimension
        # accept text OR binary streams; a 1M export is ~2 GB of text, and
        # bytes->str decoding alone costs seconds, so prefer 'wb' files
        binary = not isinstance(fh, io.TextIOBase)
        ws = (lambda s: fh.write(s.encode("ascii"))) if binary else fh.write
        wb = fh.write if binary else (lambda b: fh.write(b.decode("ascii")))
        ws("# ngt_tpu export v2\n")
        ws(json.dumps(self.prop.to_prf()) + "\n")
        ws(f"# objects {n - 1}\n")
        chunk = 65536  # bound native buffer memory, not a format feature
        use_native = native.available()
        for off in range(1, n, chunk):
            hi = min(off + chunk, n)
            data = (
                native.format_obj_rows(
                    self.store._x[off:hi, :dim], self.store._valid[off:hi]
                )
                if use_native
                else None
            )
            if data is not None:
                wb(data)
                continue
            for oid in range(off, hi):
                if not self.store._valid[oid]:
                    ws("-\n")
                    continue
                v = self.store._x[oid, :dim]
                ws("+" + "\t".join(repr(float(t)) for t in v) + "\n")
        ws(f"# graph {n - 1} {self.graph.e_max}\n")
        nbr, dist, deg = (
            self.graph.nbr_ids, self.graph.nbr_dist, self.graph.degree,
        )
        for off in range(1, n, chunk):
            hi = min(off + chunk, n)
            data = (
                native.format_graph_rows(
                    nbr[off:hi], dist[off:hi], deg[off:hi],
                    self.graph._has_node[off:hi],
                )
                if use_native
                else None
            )
            if data is not None:
                wb(data)
                continue
            for oid in range(off, hi):
                if not self.graph._has_node[oid]:
                    ws("-\n")
                    continue
                d = int(deg[oid])
                ws(
                    "\t".join(
                        f"{int(nbr[oid, j])}:{float(dist[oid, j])!r}"
                        for j in range(d)
                    )
                    + "\n"
                )
        ws("# seeds\n")
        ws(" ".join(str(int(r)) for r in self.seeder.rep_ids) + "\n")

    @classmethod
    def import_index(cls, fh, path: Optional[str] = None) -> "Index":
        # text or binary stream (prefer 'rb' files: a 1M export is ~2 GB of
        # text and str<->bytes conversion alone costs seconds)
        binary = isinstance(fh.read(0), bytes)
        rl = (lambda: fh.readline().decode("ascii")) if binary else fh.readline
        header = rl()
        if not header.startswith("# ngt_tpu export"):
            raise ValueError("not an ngt_tpu export stream")
        v2 = header.strip().endswith("v2")
        prop = Property.from_prf(json.loads(rl()))
        idx = cls(prop=prop)
        if not v2:
            if binary:
                fh = io.TextIOWrapper(fh, encoding="ascii")
            return cls._import_v1(idx, fh, path)
        from ngt_tpu import native

        line = rl()
        assert line.startswith("# objects"), "malformed export: objects"
        n_obj = int(line.split()[2])
        dim = idx.store.dimension
        # fast path: one read, whole-section native parses (a per-line
        # Python loop costs tens of minutes at 1M rows); the pure-Python
        # branch below keeps the package working without a toolchain
        rest = fh.read() if native.available() else None
        if rest is not None and binary:
            data, rest = rest, None
        else:
            data = rest.encode("ascii") if rest is not None else None
        parsed = (
            native.parse_obj_rows(data, n_obj, dim)
            if data is not None
            else None
        )
        if parsed is not None:
            xs, vm, off = parsed
            if vm.any():
                # occupy every slot so line i <-> internal id i+1, then free
                # the hole slots (they have no graph rows)
                idx.store.batch_insert(xs)
                for h in np.nonzero(~vm)[0]:
                    idx.store.remove(int(h) + 1)
            nl = data.index(b"\n", off)
            gline = data[off:nl].decode("ascii")
            assert gline.startswith("# graph"), "malformed export: graph"
            e_max = int(gline.split()[3])
            gparsed = native.parse_graph_rows(data[nl + 1 :], n_obj, e_max)
            assert gparsed is not None, "malformed export: graph rows"
            nb, dd, dg, hs, gused = gparsed
            g = GraphStore(max_edges=e_max, capacity=max(n_obj + 1, 16))
            g.nbr_ids[1 : n_obj + 1] = nb
            g.nbr_dist[1 : n_obj + 1] = dd
            g.degree[1 : n_obj + 1] = dg
            g._has_node[1 : n_obj + 1] = hs
            idx.graph = g
            idx.graph.ensure_capacity(idx.store._x.shape[0])
            tail = data[nl + 1 + gused :].decode("ascii").splitlines()
            if tail and tail[0].startswith("# seeds") and len(tail) > 1:
                toks = tail[1].split()
                if toks:
                    idx.seeder.set_representatives(
                        np.array([int(t) for t in toks], np.int32),
                        idx.store._x,
                    )
            if path:
                idx.save(path)
            return idx
        xs = np.zeros((n_obj, dim), np.float32)
        vm = np.zeros((n_obj,), bool)
        if data is not None:
            lines = iter(data.decode("ascii").splitlines())
        elif rest is not None:
            lines = iter(rest.splitlines())
        elif binary:
            lines = (ln.decode("ascii") for ln in fh)
        else:
            lines = fh
        for i in range(n_obj):
            row = next(lines).rstrip("\n")
            if row.startswith("+"):
                vals = [float(t) for t in row[1:].split("\t")]
                xs[i, : len(vals)] = vals
                vm[i] = True
        if vm.any():
            # occupy every slot so line i <-> internal id i+1, then free the
            # hole slots without graph surgery (they have no graph rows)
            idx.store.batch_insert(xs)
            for h in np.nonzero(~vm)[0]:
                idx.store.remove(int(h) + 1)
        line = next(lines)
        assert line.startswith("# graph"), "malformed export: graph"
        e_max = int(line.split()[3])
        g = GraphStore(max_edges=e_max, capacity=max(n_obj + 1, 16))
        for i in range(n_obj):
            row = next(lines).rstrip("\n")
            oid = i + 1
            if row == "-":
                continue
            if row:
                pairs = [tok.split(":") for tok in row.split("\t")]
                ids = np.array([int(p[0]) for p in pairs], np.int32)
                ds = np.array([float(p[1]) for p in pairs], np.float32)
            else:
                ids = np.zeros((0,), np.int32)
                ds = np.zeros((0,), np.float32)
            d = len(ids)
            g.nbr_ids[oid, :d] = ids
            g.nbr_dist[oid, :d] = ds
            g.degree[oid] = d
            g._has_node[oid] = True
        idx.graph = g
        idx.graph.ensure_capacity(idx.store._x.shape[0])
        line = next(lines, "")
        if line.startswith("# seeds"):
            toks = next(lines, "").split()
            if toks:
                idx.seeder.set_representatives(
                    np.array([int(t) for t in toks], np.int32), idx.store._x
                )
        if path:
            idx.save(path)
        return idx

    @staticmethod
    def _import_v1(idx: "Index", fh, path: Optional[str]) -> "Index":
        """Legacy vectors-only stream: rebuild the graph (round-1 format)."""
        vecs, holes = [], []
        for i, line in enumerate(fh):
            line = line.rstrip("\n")
            if line.startswith("+"):
                vecs.append(
                    (i, np.array([float(t) for t in line[1:].split("\t")]))
                )
            else:
                holes.append(i)
        if vecs:
            mat = np.zeros((len(vecs) + len(holes), len(vecs[0][1])),
                           np.float32)
            mat[:] = vecs[0][1]
            for i, v in vecs:
                mat[i] = v
            idx.store.batch_insert(mat)
            idx.build_index()
            for h in holes:
                idx.remove(h if idx.zero_based else h + 1)
        if path:
            idx.save(path)
        return idx




# ---------------------------------------------------------------- factory ---


def create(
    path: Optional[str],
    dimension: int,
    edge_size_for_creation: int = 10,
    edge_size_for_search: int = 40,
    distance_type="L2",
    object_type="Float",
    max_edges: int = 0,
    **kwargs,
) -> Index:
    """Create a new index (ngtpy.create, ngtpy.cpp:505-529)."""
    prop = Property(
        dimension=dimension,
        edge_size_for_creation=edge_size_for_creation,
        edge_size_for_search=edge_size_for_search,
        distance_type=resolve_distance_type(distance_type),
        object_type=resolve_object_type(object_type),
        index_type=IndexType.GRAPH_AND_TREE,
    )
    prop.max_edges = max_edges if max_edges > 0 else max(
        64, 2 * edge_size_for_creation
    )
    for key, val in kwargs.items():
        if not hasattr(prop, key):
            raise TypeError(f"unknown property: {key}")
        setattr(prop, key, val)
    idx = Index(prop=prop)
    idx.path = path
    if path:
        os.makedirs(path, exist_ok=True)
        idx.save(path)
    return idx


def open_index(
    path: str,
    zero_based_numbering: bool = True,
    memory_mapped: bool = False,
) -> Index:
    """Open an existing index (ngtpy.Index ctor, ngtpy.cpp:58-75).

    ``memory_mapped=True`` opens the object/adjacency files as
    copy-on-write memmaps: concurrent reader processes share one page-cache
    copy (the reference's shared-memory multi-process read story,
    README.md:85); local mutations stay process-private."""
    return Index(
        path=path,
        zero_based_numbering=zero_based_numbering,
        memory_mapped=memory_mapped,
    )
