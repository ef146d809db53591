"""IVF+PQ index — the NGTQ analogue (billion-scale quantized search).

The reference's NGTQ (NGTQ/Quantizer.h) = a global codebook (coarse
centroids held in an NGT graph index), per-centroid inverted lists of packed
(objectID, localID[M]) records, per-subspace local codebooks over residuals,
and raw objects in an ArrayFile; search = global-codebook lookup ->
aggregate candidates from inverted lists via LUTs -> optional exact
refinement (five AggregationModes, Quantizer.h:2266-2549); insert assigns
to existing centroids and k-means-rebuilds local codebooks at capacity
(Quantizer.h:1846-1959).

TPU redesign:
* the global codebook is a dense centroid matrix — scoring a query batch
  against all C centroids is ONE matmul + top-nprobe (a graph index over
  centroids is pointless when the MXU does C=100k in microseconds);
* inverted lists are BUCKETED: fixed-size buckets of ``bucket_len`` records
  chained per centroid (``cent_buckets [C, B] -> bucket_ids/codes [NB, L]``)
  — memory is O(N + C·bucket_len) instead of the O(C·L_max·M) a flat
  padded layout costs on skewed clusters, while every probe stays a
  static-shape gather;
* records are PACKED: two 4-bit PQ codes per byte when ksub <= 16 (the
  reference packs local ids the same way, localIDByteSize/compressIntoUint4,
  Quantizer.h:45-143, 1305-1327);
* residual PQ scoring = per-probe LUT gather-sum (the reference's cached
  LUTs, Quantizer.h:683-760 — on TPU every LUT is computed once per
  (query, probe) and reused for the whole list, i.e. always "cached");
* aggregation modes mirror the reference's search modes
  (NGTQCommand.h:299-312): ``approx``/``lut``/``cached-lut`` = LUT sum
  (identical on TPU by construction), ``refine`` = exact re-rank of the
  approximate top-k' (ExactDistance after approx), ``exact`` = exact
  distances for every probed record;
* raw objects can live on device, in host RAM, or in an on-disk memmap
  (``raw_store``) — the ArrayFile analogue (ArrayFile.h:32-219) that keeps
  indexes bigger than HBM/RAM refinable;
* incremental insert assigns to EXISTING centroids with EXISTING codebooks
  (no retrain); codebooks retrain + re-encode only when the index has grown
  past ``rebuild_factor`` x its trained size (``rebuild()``), mirroring the
  reference's rebuild-at-capacity.
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from ngt_tpu.ops import distances as D
from ngt_tpu.properties import DistanceType
from ngt_tpu.quant.clustering import kmeans
from ngt_tpu.quant.pq import ProductQuantizer, pack_codes4, unpack_codes4

_F32 = jnp.float32
_PREC = jax.lax.Precision.HIGHEST
INF = np.float32(np.inf)

#: records per inverted-list bucket (multiple of the 128-lane width; small
#: enough that per-centroid padding waste stays below bucket_len records)
BUCKET_LEN = 128


@functools.partial(jax.jit, static_argnames=("k",))
def _probe_lists(
    cent_buckets, bucket_ids, bucket_vals, bucket_norm, scale, qr, probe,
    *, k,
):
    """Score the probed centroids' bucket chains on the MXU.

    ADC scoring is a LUT gather in the reference (Quantizer.h:957-1095,
    vpshufb); per-element gathers are the one thing a TPU does at scalar
    speed (measured 0.5 s/probe at 200k scale).  But the LUT sum is
    algebraically ``sum_m lut[b,m,code] = |qr|^2 - 2 qr.recon + |recon|^2``
    with ``recon`` the PQ-decoded record, so the whole aggregation becomes
    a contiguous 128 B row gather (the HBM-friendly access pattern) plus a
    batched matvec — MXU work instead of scalar work (~40x faster).

    cent_buckets [C, Bc]; bucket_ids [NB, L]; bucket_vals [NB, L, d] int8
    (decoded residuals, scaled); bucket_norm [NB, L] f32 = |recon|^2;
    qr [B, P, d] query residuals; probe [B, P].  Scans over the P probes
    with an incremental top-k merge (all-probes-at-once would materialize
    [B, P, Bc, L] plus the gathered rows — HBM-hostile on skewed
    clusters); each record belongs to exactly one centroid list, so the
    running merge is exact."""
    b, p = probe.shape
    bc = cent_buckets.shape[1]
    ll = bucket_ids.shape[1]
    kcap = min(k, p * bc * ll)

    def body(carry, pi):
        best_d, best_i = carry
        pr = jax.lax.dynamic_index_in_dim(probe, pi, axis=1, keepdims=False)
        qrp = jax.lax.dynamic_index_in_dim(qr, pi, axis=1, keepdims=False)
        qsq = jnp.sum(qrp * qrp, axis=1)                   # [B]
        bsel = jnp.take(cent_buckets, pr, axis=0)          # [B, Bc]
        ok_b = bsel >= 0
        bsafe = jnp.clip(bsel, 0, bucket_ids.shape[0] - 1)
        ids = jnp.take(bucket_ids, bsafe, axis=0)          # [B, Bc, L]
        vals = jnp.take(bucket_vals, bsafe, axis=0)        # [B, Bc, L, d] i8
        norm = jnp.take(bucket_norm, bsafe, axis=0)        # [B, Bc, L]
        dot = jnp.einsum(
            "brld,bd->brl",
            vals.astype(jnp.bfloat16),
            qrp.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        d2 = qsq[:, None, None] - (2.0 * scale) * dot + norm
        ok = (ids >= 0) & ok_b[..., None]
        d2 = jnp.where(ok, d2, jnp.inf)
        cat_d = jnp.concatenate([best_d, d2.reshape(b, -1)], axis=1)
        cat_i = jnp.concatenate([best_i, ids.reshape(b, -1)], axis=1)
        neg, sel = jax.lax.top_k(-cat_d, kcap)
        return (-neg, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (
        jnp.full((b, kcap), jnp.inf, _F32),
        jnp.full((b, kcap), -1, jnp.int32),
    )
    (out_d, out_i), _ = jax.lax.scan(
        body, init, jnp.arange(p, dtype=jnp.int32)
    )
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    return out_i, out_d


@functools.partial(jax.jit, static_argnames=("nprobe", "k"))
def _search_approx(
    centroids, cent_buckets, bucket_ids, bucket_vals, bucket_norm, scale,
    qd, *, nprobe, k,
):
    """Whole approximate stage in ONE device program: coarse probe +
    query residuals + MXU bucket scoring.  Over the tunneled TPU each
    eager op is a separate ~0.2-1 s dispatch; the unfused pipeline spent
    ~4 s/call on round trips alone."""
    cd = D.pairwise(DistanceType.L2, qd, centroids)
    _, probe = jax.lax.top_k(-cd, nprobe)                  # [B, P]
    cent_rows = jnp.take(centroids, probe, axis=0)         # [B, P, D]
    qr = qd[:, None, :] - cent_rows                        # [B, P, D]
    ids, dists = _probe_lists(
        cent_buckets, bucket_ids, bucket_vals, bucket_norm, scale,
        qr, probe, k=k,
    )
    return probe, ids, dists


@functools.partial(jax.jit, static_argnames=("size", "metric"))
def _rerank_rows(qd, rows, ids, *, size, metric):
    """Exact re-rank of gathered candidate rows (one device program)."""
    dd = D.gathered(metric, qd, rows)
    dd = jnp.where(ids >= 0, dd, jnp.inf)
    neg, sel = jax.lax.top_k(-dd, min(size, ids.shape[1]))
    out_i = jnp.take_along_axis(ids, sel, axis=1)
    return jnp.where(jnp.isfinite(-neg), out_i, -1), -neg


@functools.partial(jax.jit, static_argnames=("size", "metric"))
def _rerank_gather(qd, x, ids, *, size, metric):
    """Exact re-rank with the raw-row gather fused in (device raw store;
    ``x`` may be a lossless uint8 mirror — cast after the gather so HBM
    traffic stays 1 B/component)."""
    rows = jnp.take(x, jnp.clip(ids, 0, x.shape[0] - 1), axis=0)
    rows = rows.astype(jnp.float32)
    return _rerank_rows(qd, rows, ids, size=size, metric=metric)


@jax.jit
def _assign_chunk(xc, cents):
    d = D.pairwise(DistanceType.L2, xc, cents)
    return jnp.argmin(d, axis=1), jnp.min(d, axis=1)


@functools.partial(jax.jit, static_argnames=("m",))
def _encode_chunk_dev(xc, cents, assign, codebooks, pq_mean, m):
    """Residual + PQ encode fused on device: ships the (narrow) object
    chunk instead of a host-materialized f32 residual matrix — for uint8
    corpora that is 4x less tunnel traffic on a 10M build."""
    from ngt_tpu.quant.pq import _encode

    resid = xc.astype(_F32) - jnp.take(cents, assign, axis=0) - pq_mean
    return _encode(resid, codebooks, m)


class IVFPQIndex:
    """NGTQ-style quantized index (API mirrors NGTQ::Index,
    Quantizer.h:2720-2939: insert/search/save/open, result-expansion,
    validate; plus rebuild-at-capacity)."""

    def __init__(
        self,
        dimension: int,
        n_centroids: int = 256,
        dsub: int = 2,
        ksub: int = 16,
        metric: DistanceType = DistanceType.L2,
        keep_raw: bool = True,
        raw_store: str = "device",   # "device" | "host" | "mmap" | "none"
        raw_path: str | None = None,  # backing file for raw_store="mmap"
        rebuild_factor: float = 2.0,
        train_sample: int = 262_144,
        device_refine_max_bytes: int = 4 << 30,
        centroid_mode: str = "dynamic",   # "dynamic" | "static"
    ):
        self.dimension = dimension
        self.metric = DistanceType(metric)
        self.n_centroids = int(n_centroids)
        self.pq = ProductQuantizer(dimension, dsub=dsub, ksub=ksub)
        self.packed = self.pq.ksub <= 16
        if not keep_raw:
            raw_store = "none"
        self.raw_store = raw_store
        self.raw_path = raw_path
        self.rebuild_factor = float(rebuild_factor)
        self.train_sample = int(train_sample)
        self.device_refine_max_bytes = int(device_refine_max_bytes)
        self.centroids: np.ndarray | None = None
        #: reference CentroidCreationModeDynamic (Quantizer.h:174-205): an
        #: insert whose nearest coarse centroid lies beyond ``global_range``
        #: CREATES a centroid instead of degrading into a far bucket
        #: (insert-time growth, Quantizer.h:1895-1959).  "static" freezes
        #: the trained set (rebuild() remains the recovery path).
        self.centroid_mode = centroid_mode
        #: gating radius, learned at build(): the 99.9th percentile of the
        #: training population's own assignment distances (the reference
        #: takes globalRange as a user parameter; deriving it keeps the
        #: stationary-distribution false-creation rate ~0.1%)
        self.global_range = 0.0
        self._raw = None                       # ndarray | memmap | None
        self._pending: list[np.ndarray] = []   # inserted, not yet encoded
        self._assign = np.zeros((0,), np.int32)
        self._codes = np.zeros((0, 0), np.uint8)  # packed when self.packed
        # stable external object ids + liveness (the reference's records
        # carry objectID explicitly, Quantizer.h:45-143; remove() tombstones
        # and compress() reclaims, NGTQCommand.h:430-496, Quantizer.h:2747)
        self._ids = np.zeros((0,), np.int64)
        self._valid = np.zeros((0,), bool)
        self._next_id = 0
        self._trained_size = 0
        self._dev = None

    # ------------------------------------------------------------- sizing --
    @property
    def size(self) -> int:
        n = len(self._assign) + sum(len(a) for a in self._pending)
        if self.raw_store == "mmap" and self._raw is not None:
            # mmap spills pending straight to the raw file (see batch_insert)
            n = max(n, self._raw.shape[0])
        return n

    @property
    def live_size(self) -> int:
        """Records that remove() has not tombstoned (+ unencoded tail)."""
        return int(self._valid.sum()) + (self.size - len(self._assign))

    @property
    def built(self) -> bool:
        return self.centroids is not None

    def needs_rebuild(self) -> bool:
        """True when the index grew past rebuild_factor x its trained size —
        the analogue of a local codebook hitting capacity
        (Quantizer.h:1846-1893)."""
        return (
            self.built
            and self.size > self.rebuild_factor * max(self._trained_size, 1)
        )

    def memory_report(self) -> dict:
        """Bytes per component (the role of getSharedMemorySize,
        Quantizer.h:2672-2684)."""
        n = len(self._assign)
        mp = self._codes.shape[1] if self._codes.size else (
            (self.pq.m + 1) // 2 if self.packed else self.pq.m
        )
        raw = 0 if self._raw is None or self.raw_store == "mmap" else (
            self._raw.nbytes
        )
        return {
            "objects": int(n),
            "live": int(self._valid.sum()),
            "removed": int(n - self._valid.sum()),
            "codes_bytes": int(n * mp),
            "ids_bytes": int(n * self._ids.itemsize),  # int64 ids
            "centroid_bytes": int(
                0 if self.centroids is None else self.centroids.nbytes
            ),
            "raw_bytes_resident": int(raw),
            "raw_store": self.raw_store,
        }

    # ------------------------------------------------------------ mutation --
    def batch_insert(self, x: np.ndarray) -> None:
        """Queue vectors; encoded lazily.  After ``build()`` new batches are
        assigned to EXISTING centroids with EXISTING codebooks — no silent
        full retrain (the reference's insert path, Quantizer.h:1895-1959).
        Call ``rebuild()`` (or let ``needs_rebuild`` tell you) once the
        index outgrows its codebooks."""
        x = np.asarray(x, np.float32)
        if x.ndim == 1:
            x = x[None]
        if x.shape[1] != self.dimension:
            raise ValueError(
                f"dimension mismatch: got {x.shape[1]}, want {self.dimension}"
            )
        if len(x) == 0:
            return  # np.memmap cannot map an empty file; no-op like host
        if self.raw_store == "mmap":
            # spill straight to the raw file: pending rows never accumulate
            # in host RAM (at 100M x 128 f32 the old list held 51 GB and
            # build()'s concatenate doubled it), and build()/flush stream
            # the unencoded tail back in device-chunk slices
            if self.raw_path is None:
                raise ValueError("raw_store='mmap' needs raw_path")
            self._append_raw(x)
        else:
            self._pending.append(x)
        if self.built:
            self._flush_pending()

    def _append_raw(self, x: np.ndarray) -> None:
        if self.raw_store == "none":
            return
        if self.raw_store == "mmap":
            if self.raw_path is None:
                raise ValueError("raw_store='mmap' needs raw_path")
            old = 0 if self._raw is None else self._raw.shape[0]
            new = np.memmap(
                self.raw_path, dtype=np.float32, mode="r+" if old else "w+",
                shape=(old + len(x), self.dimension),
            )
            new[old:] = x
            new.flush()
            self._raw = new
        else:
            self._raw = (
                x.copy() if self._raw is None
                else np.concatenate([self._raw, x], axis=0)
            )

    def _encode_assigned(self, x: np.ndarray, assign: np.ndarray) -> np.ndarray:
        """Encode ``x - centroids[assign]`` in ~1M-row device chunks: a
        single 10M-row encode would stage >5 GB on device, and
        materializing the full residual matrix on host costs 2x the corpus
        in transient RSS.  The residual is computed ON DEVICE from the
        narrowest lossless upload of the chunk (uint8 for SIFT-like data:
        4x less tunnel traffic)."""
        from ngt_tpu.graph.build import _upload_f32

        mp = (self.pq.m + 1) // 2 if self.packed else self.pq.m
        out = np.empty((len(x), mp), np.uint8)
        cents = jnp.asarray(self.centroids)
        cb = jnp.asarray(self.pq.codebooks)
        mean = jnp.asarray(self.pq.mean)
        step = 1 << 20
        for s in range(0, len(x), step):
            xc = _upload_f32(np.ascontiguousarray(x[s : s + step]))
            codes = np.asarray(
                _encode_chunk_dev(
                    xc, cents, jnp.asarray(assign[s : s + step]), cb,
                    mean, self.pq.m,
                )
            )
            out[s : s + step] = pack_codes4(codes) if self.packed else codes
        return out

    def _unflushed(self):
        """Rows inserted but not yet encoded.  For raw_store='mmap' this is
        a memmap VIEW of the raw file's tail — the assign/encode loops
        slice it chunk-wise, so it is never materialized whole."""
        if self.raw_store == "mmap":
            if self._raw is None:
                return np.zeros((0, self.dimension), np.float32)
            return self._raw[len(self._assign):]
        if not self._pending:
            return np.zeros((0, self.dimension), np.float32)
        if len(self._pending) == 1:
            return self._pending[0]
        return np.concatenate(self._pending, axis=0)

    def _grow_centroids(self, x, dist: np.ndarray) -> bool:
        """Insert-time coarse-centroid creation (the reference's default
        CentroidCreationModeDynamic, Quantizer.h:174-205, insert growth
        :1895-1959): rows whose nearest centroid lies beyond global_range
        seed new centroids, greedily (farthest-first) so the new set is
        mutually > global_range apart.  PQ codebooks stay frozen — new
        buckets reuse the residual codebooks, exactly like the reference's
        shared local codebook.  Returns True when centroids were added."""
        out_mask = dist > self.global_range
        if not out_mask.any():
            return False
        xo_all = np.asarray(x[out_mask], np.float32)
        xo = xo_all
        d_rem = dist[out_mask].copy()
        new: list[np.ndarray] = []
        # safety valve: one flush may at most double the centroid count
        # (a pathological batch must not mint one bucket per row)
        cap = max(len(self.centroids), 1024)
        # seeds are POINTS, and same-cluster point-to-point distances run
        # sqrt(2)x the point-to-mean distances global_range was learned
        # from — dedup at 1.5x so one new cluster mints ONE seed, not a
        # fragment per sample (fragmented buckets gut nprobe recall)
        dedup = 1.5 * self.global_range
        while len(xo) and len(new) < cap:
            j = int(np.argmax(d_rem))
            c0 = xo[j]
            new.append(c0)
            dd = np.linalg.norm(xo - c0[None, :], axis=1)
            keep = dd > dedup
            xo, d_rem = xo[keep], np.minimum(d_rem[keep], dd[keep])
        cents = np.stack(new).astype(np.float32)
        # Lloyd-refine the seeds into means of the outlier population they
        # will own (a point seed sits on its cluster's shell; its mean sits
        # at the center, halving the radius the next flush must cover).
        # Subsample: the [outliers, new] distance matrix must stay host-sized.
        if len(xo_all) * len(cents) > (1 << 26):
            sel = np.random.default_rng(0).choice(
                len(xo_all), (1 << 26) // max(len(cents), 1), replace=False
            )
            xo_all = xo_all[np.sort(sel)]
        for _ in range(3):
            dd = np.linalg.norm(
                xo_all[:, None, :] - cents[None, :, :], axis=2
            )
            a = np.argmin(dd, axis=1)
            for j in range(len(cents)):
                m = a == j
                if m.any():
                    cents[j] = xo_all[m].mean(axis=0)
        self.centroids = np.concatenate([self.centroids, cents], axis=0)
        self._dev = None
        return True

    def _flush_pending(self) -> None:
        """Assign + encode every pending batch against the current
        codebooks and grow the inverted lists."""
        x = self._unflushed()
        if len(x) == 0:
            self._pending = []
            return
        if self.centroid_mode == "dynamic" and self.global_range > 0.0:
            assign, dist = self._assign_to_centroids(x, return_dist=True)
            if self._grow_centroids(x, dist):
                # re-assign the whole batch against the grown set (a new
                # centroid may also be nearer to an in-range row)
                assign = self._assign_to_centroids(x)
        else:
            assign = self._assign_to_centroids(x)
        codes = self._encode_assigned(x, assign)
        self._assign = np.concatenate([self._assign, assign])
        self._codes = (
            codes if self._codes.size == 0
            else np.concatenate([self._codes, codes], axis=0)
        )
        new_ids = np.arange(
            self._next_id, self._next_id + len(assign), dtype=np.int64
        )
        self._ids = np.concatenate([self._ids, new_ids])
        self._valid = np.concatenate([self._valid, np.ones(len(assign), bool)])
        self._next_id += len(assign)
        if self.raw_store != "mmap":
            self._append_raw(np.asarray(x))
        self._pending = []
        self._dev = None

    def _assign_to_centroids(
        self, x: np.ndarray, return_dist: bool = False
    ):
        from ngt_tpu.graph.build import _upload_f32

        cd = jnp.asarray(self.centroids)
        out = np.empty(len(x), np.int32)
        dist = np.empty(len(x), np.float32) if return_dist else None
        step = 65536
        for s in range(0, len(x), step):
            chunk = x[s : s + step]
            if len(chunk) < step and len(x) > step:
                # pad the ragged tail to the fixed chunk shape (one compile)
                pad = np.zeros((step, x.shape[1]), x.dtype)
                pad[: len(chunk)] = chunk
                a, d = jax.device_get(_assign_chunk(_upload_f32(pad), cd))
                out[s:] = a[: len(chunk)]
                if return_dist:
                    dist[s:] = d[: len(chunk)]
            else:
                a, d = jax.device_get(
                    _assign_chunk(_upload_f32(np.ascontiguousarray(chunk)), cd)
                )
                out[s : s + step] = a
                if return_dist:
                    dist[s : s + step] = d
        return (out, dist) if return_dist else out

    def build(self, kmeans_iters: int = 15, seed: int = 0) -> None:
        """Train global + local codebooks on (a sample of) the pending data,
        then encode everything (the batch path of NGTQ insert + codebook
        build, Quantizer.h:1846-1959)."""
        if self.built:
            self._flush_pending()
            return
        x = self._unflushed()
        if len(x) == 0:
            raise ValueError("nothing to build")
        rng = np.random.default_rng(seed)
        train = x
        if len(x) > self.train_sample:
            # sorted sample indices: sequential-ish reads from a memmap
            # source instead of 256k random 512 B seeks
            train = x[np.sort(rng.choice(len(x), self.train_sample,
                                         replace=False))]
        c = min(self.n_centroids, len(train))
        self.centroids, _ = kmeans(train, c, iters=kmeans_iters, seed=seed)
        assign, adist = self._assign_to_centroids(x, return_dist=True)
        # gating radius for dynamic centroid creation (see __init__): the
        # training population's own assignment-distance tail
        self.global_range = float(np.quantile(adist, 0.999)) if len(adist) else 0.0
        if len(x) > self.train_sample:
            pick = np.sort(rng.choice(len(x), self.train_sample,
                                      replace=False))
            rs = x[pick] - self.centroids[assign[pick]]
        else:
            rs = np.asarray(x) - self.centroids[assign]
        self.pq.fit(rs, center=False)
        codes = self._encode_assigned(x, assign)
        self._assign = assign
        self._codes = codes
        if len(self._ids) != len(assign):   # fresh build (rebuild restores)
            self._ids = np.arange(len(assign), dtype=np.int64)
            self._next_id = len(assign)
        self._valid = np.ones(len(assign), bool)
        if self.raw_store != "mmap":   # mmap: rows are already in the file
            self._raw = None
            self._append_raw(np.asarray(x))
        self._pending = []
        self._trained_size = len(x)
        self._dev = None

    def rebuild(self, kmeans_iters: int = 15, seed: int = 0) -> None:
        """Retrain codebooks on the CURRENT population and re-encode — the
        analogue of buildMultipleLocalCodebooks + replaceInvertedIndexEntry
        at capacity (Quantizer.h:1846-1893).  Requires raw vectors.
        Tombstoned records are reclaimed first (a rebuild re-encodes the raw
        store, so dead rows must not be resurrected); external ids are
        preserved across the rebuild."""
        self._flush_pending()
        if self._raw is None:
            raise ValueError("rebuild needs raw vectors (raw_store != 'none')")
        if self._valid.size and not self._valid.all():
            self.compress()
        keep_ids, keep_next = self._ids.copy(), self._next_id
        if self.raw_store == "mmap":
            # resetting _assign makes the WHOLE raw file the unflushed set;
            # build() streams it in chunks — nothing moves to host RAM
            self._pending = []
        else:
            self._pending = [np.asarray(self._raw, np.float32)]
            self._raw = None
        self.centroids = None
        self._assign = np.zeros((0,), np.int32)
        self._codes = np.zeros((0, 0), np.uint8)
        self._ids = np.zeros((0,), np.int64)
        self._valid = np.zeros((0,), bool)
        self.build(kmeans_iters=kmeans_iters, seed=seed)
        self._ids, self._next_id = keep_ids, keep_next
        self._valid = np.ones(len(keep_ids), bool)

    def remove(self, ids, force: bool = False) -> int:
        """Tombstone objects by external id (the ngtq remove command,
        NGTQCommand.h:430-496): removed records stop appearing in searches;
        storage is reclaimed by :meth:`compress`.  Unknown or
        already-removed ids raise unless ``force`` (NGT::Index::remove's
        force semantics, Index.h:1386-1421).  Returns the count removed."""
        if not self.built:
            raise ValueError("build the index before removing")
        self._flush_pending()
        # dedupe: repeated ids in one call would each pass the liveness
        # check (it reads pre-removal state) and inflate the count
        req = np.unique(np.atleast_1d(np.asarray(ids, np.int64)))
        n = len(self._ids)
        pos = np.searchsorted(self._ids, req)   # _ids is strictly increasing
        safe = np.clip(pos, 0, max(n - 1, 0))
        ok = (pos < n) & (self._ids[safe] == req) if n else np.zeros(
            len(req), bool
        )
        ok &= self._valid[safe] if n else False
        if not ok.all() and not force:
            raise ValueError(
                "unknown or already-removed ids: "
                f"{req[~ok][:8].tolist()}"
            )
        self._valid[safe[ok]] = False
        self._dev = None
        return int(ok.sum())

    def compress(self) -> int:
        """Physically drop tombstoned records, preserving external ids —
        NGTQ::Index::compress rebuilds the inverted index into a temp file
        and renames it over the old one (Quantizer.h:2747-2760); the mmap
        raw store gets the same tmp-write + rename treatment here.  Returns
        the number of records reclaimed."""
        self._flush_pending()
        if not self._valid.size or bool(self._valid.all()):
            return 0
        keep = np.nonzero(self._valid)[0]
        dropped = len(self._valid) - len(keep)
        self._assign = self._assign[keep]
        if self._codes.size:
            self._codes = np.ascontiguousarray(self._codes[keep])
        self._ids = self._ids[keep]
        self._valid = np.ones(len(keep), bool)
        if self._raw is not None:
            if self.raw_store == "mmap":
                tmp = self.raw_path + ".tmp"
                new = np.memmap(
                    tmp, dtype=np.float32, mode="w+",
                    shape=(max(len(keep), 1), self.dimension),
                )
                step = 1 << 20
                for s in range(0, len(keep), step):
                    new[s : s + step] = self._raw[keep[s : s + step]]
                new.flush()
                del new
                self._raw = None
                os.replace(tmp, self.raw_path)
                if len(keep):
                    self._raw = np.memmap(
                        self.raw_path, dtype=np.float32, mode="r+",
                        shape=(len(keep), self.dimension),
                    )
            else:
                self._raw = np.ascontiguousarray(np.asarray(self._raw)[keep])
        self._dev = None
        return dropped

    def _ext_ids(self, rows: np.ndarray) -> np.ndarray:
        """Map internal record rows (-1 padded) to external object ids."""
        if not len(self._ids):
            return rows
        safe = np.clip(rows, 0, len(self._ids) - 1)
        return np.where(rows >= 0, self._ids[safe], -1)

    # -------------------------------------------------------------- device --
    def host_blocks(self, record_sel: np.ndarray | None = None) -> dict:
        """Host-side bucketed inverted lists over ``record_sel`` (global
        record ids; None = all records).  Shared by the single-device
        mirror and the mesh-sharded layout (parallel.sharded_ivfpq), which
        calls it once per shard with that shard's records.

        PQ-decoded residuals are stored as int8 rows: ADC scoring ==
        L2(qr, recon), so storing recon (scaled to int8) turns the LUT
        aggregation into an MXU matvec over contiguous 128 B rows (see
        _probe_lists).  The 4-bit codes stay the authoritative/persisted
        format."""
        self._flush_pending()
        c = len(self.centroids)
        if record_sel is None:
            record_sel = np.nonzero(self._valid)[0].astype(np.int64)
        else:
            record_sel = np.asarray(record_sel, np.int64)
            if self._valid.size:   # tombstoned records never enter buckets
                record_sel = record_sel[self._valid[record_sel]]
        assign = self._assign[record_sel]
        counts = np.bincount(assign, minlength=c)
        nbuckets = np.maximum((counts + BUCKET_LEN - 1) // BUCKET_LEN, 0)
        b_cap = max(int(nbuckets.max()), 1)
        nb = max(int(nbuckets.sum()), 1)
        cent_buckets = np.full((c, b_cap), -1, np.int32)
        bucket_start = np.concatenate([[0], np.cumsum(nbuckets)[:-1]])
        for ci in np.nonzero(nbuckets)[0]:
            cent_buckets[ci, : nbuckets[ci]] = np.arange(
                bucket_start[ci], bucket_start[ci] + nbuckets[ci]
            )
        bucket_ids = np.full((nb, BUCKET_LEN), -1, np.int32)
        d = self.dimension
        bucket_vals = np.zeros((nb, BUCKET_LEN, d), np.int8)
        bucket_norm = np.zeros((nb, BUCKET_LEN), np.float32)
        order = record_sel[np.argsort(assign, kind="stable")]
        sorted_assign = self._assign[order]
        starts = np.searchsorted(sorted_assign, np.arange(c))
        slot = np.arange(len(order)) - starts[sorted_assign]
        brow = bucket_start[sorted_assign] + slot // BUCKET_LEN
        bcol = slot % BUCKET_LEN
        bucket_ids[brow, bcol] = order.astype(np.int32)
        shift = self.pq.mean.reshape(self.pq.m, self.pq.dsub)
        entry_max = float(
            np.abs(self.pq.codebooks + shift[:, None, :]).max()
        )
        scale = max(entry_max, 1e-12) / 127.0
        step = 1 << 19
        for s in range(0, len(order), step):
            sel = order[s : s + step]
            codes = self._codes[sel]
            if self.packed:
                codes = unpack_codes4(codes, self.pq.m)
            recon = self.pq.decode(codes)
            v8 = np.clip(np.rint(recon / scale), -127, 127).astype(np.int8)
            bucket_vals[brow[s : s + step], bcol[s : s + step]] = v8
            bucket_norm[brow[s : s + step], bcol[s : s + step]] = (
                scale * scale
            ) * np.sum(v8.astype(np.float32) ** 2, axis=1)
        return {
            "cent_buckets": cent_buckets,
            "bucket_ids": bucket_ids,
            "bucket_vals": bucket_vals,
            "bucket_norm": bucket_norm,
            "scale": np.float32(scale),
        }

    def _raw_as_u8(self) -> np.ndarray | None:
        """Lossless uint8 view of the raw store, or None.  Integral
        [0, 255] corpora (real SIFT descriptors) get a device-resident
        refine mirror at 1 B/component — without it every refined search
        pays a host memmap gather + candidate-row upload."""
        if self._raw is None:
            return None
        n = self._raw.shape[0]
        if n * self.dimension > self.device_refine_max_bytes:
            return None
        out = np.empty((n, self.dimension), np.uint8)
        step = 1 << 20
        for s in range(0, n, step):
            c = np.asarray(self._raw[s : s + step])
            r = np.rint(c)
            if not (
                (c == r).all() and r.min() >= 0.0 and r.max() <= 255.0
            ):
                return None
            out[s : s + step] = r.astype(np.uint8)
        return out

    def _device(self):
        """Bucketed inverted lists on device (see module docstring)."""
        if self._dev is not None:
            return self._dev
        hb = self.host_blocks()
        if self.raw_store == "device" and self._raw is not None:
            x_dev = jnp.asarray(np.asarray(self._raw))
        else:
            u8 = self._raw_as_u8()
            x_dev = jnp.asarray(u8) if u8 is not None else None
        self._dev = {
            "centroids": jnp.asarray(self.centroids),
            "cent_buckets": jnp.asarray(hb["cent_buckets"]),
            "bucket_ids": jnp.asarray(hb["bucket_ids"]),
            "bucket_vals": jnp.asarray(hb["bucket_vals"]),
            "bucket_norm": jnp.asarray(hb["bucket_norm"]),
            "scale": hb["scale"],
            "x": x_dev,
        }
        return self._dev

    def _raw_rows(self, ids: np.ndarray) -> jax.Array:
        """Candidate raw rows for refinement, from wherever raw lives."""
        dev = self._device()
        if dev["x"] is not None:
            safe = jnp.clip(jnp.asarray(ids), 0, dev["x"].shape[0] - 1)
            return jnp.take(dev["x"], safe, axis=0)
        if self._raw is None:
            raise ValueError("refinement needs raw vectors")
        safe = np.clip(ids, 0, self._raw.shape[0] - 1)
        return jnp.asarray(np.asarray(self._raw)[safe])  # host gather (mmap)

    # -------------------------------------------------------------- search --
    def batch_search(
        self,
        queries: np.ndarray,
        size: int = 10,
        nprobe: int = 8,
        result_expansion: float = 3.0,
        mode: str = "refine",
    ):
        """IVFADC search.  ``mode`` mirrors the reference's aggregation
        modes (Quantizer.h:2266-2549, CLI letters NGTQCommand.h:299-312):

        * ``"approx"`` / ``"lut"`` / ``"cached-lut"`` (a/l/c) — LUT-summed
          approximate distances (on TPU the LUT is computed once per
          (query, probe) and reused, so these coincide by construction);
        * ``"refine"`` (r) — approximate top-(size·expansion), exact
          re-rank (ExactDistance after approx; the default);
        * ``"exact"`` (e) — exact distances for EVERY probed record.
        """
        if not self.built:
            self.build()
        dev = self._device()
        q = np.asarray(queries, np.float32)
        if q.ndim == 1:
            q = q[None]
        b = len(q)
        nprobe = min(nprobe, len(self.centroids))
        mode = {
            "a": "approx", "l": "lut", "c": "cached-lut", "r": "refine",
            "e": "exact",
        }.get(mode, mode)
        refine = mode == "refine"
        k_exp = (
            max(int(np.ceil(size * max(result_expansion, 1.0))), size)
            if refine
            else size
        )

        qd = jnp.asarray(q)
        if mode == "exact":
            cd = D.pairwise(DistanceType.L2, qd, dev["centroids"])
            _, probe = jax.lax.top_k(-cd, nprobe)
            return self._search_exact(qd, probe, size)

        # stage A (one dispatch): probe + residuals + MXU bucket scoring
        probe, ids, dists = _search_approx(
            dev["centroids"], dev["cent_buckets"], dev["bucket_ids"],
            dev["bucket_vals"], dev["bucket_norm"], dev["scale"],
            qd, nprobe=nprobe, k=k_exp,
        )
        if refine:
            # stage B (one dispatch): exact re-rank; raw-row gather fused
            # on device when raw lives there, host memmap gather otherwise
            if dev["x"] is not None:
                out_i, out_d = _rerank_gather(
                    qd, dev["x"], ids, size=size, metric=self.metric
                )
            else:
                ids_h = np.asarray(ids)
                if self._raw is None:
                    raise ValueError("refinement needs raw vectors")
                safe = np.clip(ids_h, 0, self._raw.shape[0] - 1)
                rows = jnp.asarray(np.asarray(self._raw)[safe])
                out_i, out_d = _rerank_rows(
                    qd, rows, jnp.asarray(ids_h), size=size,
                    metric=self.metric,
                )
            return self._ext_ids(np.asarray(out_i)), np.asarray(out_d)
        ids = ids[:, :size]
        dists = jnp.sqrt(jnp.maximum(dists[:, :size], 0))
        return self._ext_ids(np.asarray(ids)), np.asarray(dists)

    def _search_exact(self, qd, probe, size):
        """Exact distances for every probed record (AggregationMode
        ExactDistance, Quantizer.h:2266-2304): gather probed ids, score the
        raw rows with the true metric."""
        dev = self._device()
        bsel = jnp.take(dev["cent_buckets"], probe, axis=0)
        bsafe = jnp.clip(bsel, 0, dev["bucket_ids"].shape[0] - 1)
        ids = jnp.take(dev["bucket_ids"], bsafe, axis=0)
        ids = jnp.where((bsel >= 0)[..., None], ids, -1)
        b = ids.shape[0]
        flat = np.asarray(ids.reshape(b, -1))
        rows = self._raw_rows(flat)
        dd = D.gathered(self.metric, qd, rows)
        dd = jnp.where(jnp.asarray(flat) >= 0, dd, jnp.inf)
        neg, sel = jax.lax.top_k(-dd, size)
        out_i = jnp.take_along_axis(jnp.asarray(flat), sel, axis=1)
        out_d = -neg
        out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
        return self._ext_ids(np.asarray(out_i)), np.asarray(out_d)

    def search(self, query, size=10, nprobe=8, result_expansion=3.0,
               mode: str = "refine"):
        ids, dists = self.batch_search(
            np.asarray(query, np.float32)[None, :], size=size, nprobe=nprobe,
            result_expansion=result_expansion, mode=mode,
        )
        return [
            (int(i), float(d))
            for i, d in zip(ids[0], dists[0])
            if i >= 0 and np.isfinite(d)
        ]

    # ------------------------------------------------------------- audits --
    def verify(self) -> list[str]:
        """Inverted-index consistency (reference NGTQ validate/verify,
        Quantizer.h:2140-2246, 2612-2668)."""
        errs = []
        if not self.built:
            return ["index not built"]
        self._flush_pending()
        n = self.size
        if self._assign.shape[0] != n or self._codes.shape[0] != n:
            errs.append("assignment/code count mismatch")
        if len(self._assign) and (
            (self._assign < 0).any()
            or (self._assign >= len(self.centroids)).any()
        ):
            errs.append("assignment out of range")
        codes = self._codes
        if self.packed and codes.size:
            codes = unpack_codes4(codes, self.pq.m)
        if codes.size and (codes >= self.pq.ksub).any():
            errs.append("code out of range")
        if self._raw is not None and self._raw.shape[0] != n:
            errs.append("raw object count mismatch")
        if (self._ids.shape[0] != len(self._assign)
                or self._valid.shape[0] != len(self._assign)):
            errs.append("id/validity count mismatch")
        elif len(self._ids) > 1 and not bool((np.diff(self._ids) > 0).all()):
            errs.append("external ids not strictly increasing")
        return errs

    def quantization_error(self, sample: int = 1024, seed: int = 0) -> dict:
        """Mean |ADC - exact| distance error over a sample — the reference's
        quantization-error audit (Quantizer.h:2552-2584)."""
        self._flush_pending()
        if self._raw is None:
            raise ValueError("audit needs raw vectors")
        rng = np.random.default_rng(seed)
        live = np.nonzero(self._valid)[0]
        pick = live[rng.choice(len(live), size=min(sample, len(live)),
                               replace=False)]
        x = np.asarray(self._raw)[pick]
        codes = self._codes[pick]
        if self.packed:
            codes = unpack_codes4(codes, self.pq.m)
        recon = self.pq.decode(codes) + self.centroids[self._assign[pick]]
        err = np.linalg.norm(x - recon, axis=1)
        scale = np.linalg.norm(x - x.mean(0), axis=1).mean() or 1.0
        return {
            "mean_reconstruction_error": float(err.mean()),
            "relative_error": float(err.mean() / scale),
            "max_reconstruction_error": float(err.max()),
        }

    # -------------------------------------------------------- persistence --
    def save(self, path: str) -> None:
        self._flush_pending()
        os.makedirs(path, exist_ok=True)
        raw = (
            np.zeros((0, self.dimension), np.float32)
            if self._raw is None or self.raw_store == "mmap"
            else np.asarray(self._raw)
        )
        np.savez(
            os.path.join(path, "ivfpq.npz"),
            centroids=self.centroids,
            assign=self._assign,
            codes=self._codes,
            ids=self._ids,
            valid=self._valid,
            x=raw,
            **{f"pq_{k}": v for k, v in self.pq.state_dict().items()},
        )
        with open(os.path.join(path, "ivfpq.json"), "w") as fh:
            json.dump(
                {
                    "dimension": self.dimension,
                    "metric": int(self.metric),
                    "n_centroids": self.n_centroids,
                    "raw_store": self.raw_store,
                    "raw_path": self.raw_path,
                    "packed": self.packed,
                    "trained_size": self._trained_size,
                    "rebuild_factor": self.rebuild_factor,
                    "next_id": self._next_id,
                    "centroid_mode": self.centroid_mode,
                    "global_range": self.global_range,
                },
                fh,
            )

    @classmethod
    def open(cls, path: str) -> "IVFPQIndex":
        with open(os.path.join(path, "ivfpq.json")) as fh:
            meta = json.load(fh)
        st = np.load(os.path.join(path, "ivfpq.npz"))
        idx = cls(
            meta["dimension"],
            n_centroids=meta["n_centroids"],
            dsub=int(st["pq_dsub"]),
            ksub=int(st["pq_ksub"]),
            metric=DistanceType(meta["metric"]),
            raw_store=meta.get("raw_store", "device"),
            raw_path=meta.get("raw_path"),
            rebuild_factor=meta.get("rebuild_factor", 2.0),
            centroid_mode=meta.get("centroid_mode", "static"),
        )
        idx.global_range = float(meta.get("global_range", 0.0))
        idx.centroids = st["centroids"]
        idx._assign = st["assign"]
        codes = st["codes"]
        if not meta.get("packed", False) and idx.packed:
            codes = pack_codes4(codes)  # round-1 unpacked format
        idx._codes = codes
        if idx.raw_store == "mmap":
            n = len(idx._assign)
            idx._raw = np.memmap(
                idx.raw_path, dtype=np.float32, mode="r",
                shape=(n, idx.dimension),
            )
        elif idx.raw_store != "none" and st["x"].size:
            idx._raw = st["x"].astype(np.float32)
        idx.pq = ProductQuantizer.from_state(
            {
                "codebooks": st["pq_codebooks"],
                "mean": st["pq_mean"],
                "dsub": int(st["pq_dsub"]),
                "ksub": int(st["pq_ksub"]),
                "dimension": int(st["pq_dimension"]),
            }
        )
        n = len(idx._assign)
        idx._ids = (
            st["ids"] if "ids" in st.files
            else np.arange(n, dtype=np.int64)   # round-1 format
        )
        idx._valid = (
            st["valid"].astype(bool) if "valid" in st.files
            else np.ones(n, bool)
        )
        idx._next_id = int(meta.get(
            "next_id", int(idx._ids.max()) + 1 if n else 0
        ))
        idx._trained_size = int(meta.get("trained_size", len(idx._assign)))
        return idx
