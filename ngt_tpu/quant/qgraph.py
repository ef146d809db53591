"""Quantized-graph search — the NGTQG analogue.

The reference's NGTQG (NGTQ/QuantizedGraph.h) re-encodes each graph node's
edge targets as interleaved 4-bit PQ codes and scores ALL neighbors of a
popped node at once with an AVX512 ``vpshufb`` LUT kernel
(Quantizer.h:957-1095), then optionally re-ranks the expanded candidate list
exactly (``searchQuantizedGraph``, QuantizedGraph.h:192-320).

TPU redesign: PQ codes live in one dense [N, M] uint8 matrix; the traversal
is the SAME batched best-first kernel as the exact search
(graph.search.graph_search) with a PQ-LUT scorer plugged in — per hop it
gathers neighbor code rows and does a take_along_axis-sum, the vector-unit
equivalent of the vpshufb gather.  ``result_expansion`` widens the
approximate search and one fused device program re-ranks exactly.
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from ngt_tpu.graph.search import graph_search
from ngt_tpu.ops import distances as D
from ngt_tpu.quant.pq import ProductQuantizer, make_packed_scorer
from ngt_tpu.properties import DistanceType
from ngt_tpu.seeds import default_reps

_F32 = jnp.float32


def _rerank_body(x, queries, cand_ids, cand_ok, metric, k):
    """Re-rank candidate ids exactly (reference resultExpansion re-rank,
    QuantizedGraph.h:270-299)."""
    safe = jnp.clip(cand_ids, 0, x.shape[0] - 1)
    rows = jnp.take(x, safe, axis=0)                 # [B, C, D]
    d = D.gathered(metric, queries, rows)
    d = jnp.where(cand_ok, d, jnp.inf)
    neg, sel = jax.lax.top_k(-d, k)
    ids = jnp.take_along_axis(cand_ids, sel, axis=1)
    dd = -neg
    ids = jnp.where(jnp.isfinite(dd), ids, -1)
    return ids, dd


_exact_rerank = functools.partial(jax.jit, static_argnames=("metric", "k"))(
    _rerank_body
)


def _tail_refine_body(
    x, codes, nbr_full, valid, q, qdv, pool_ids, ids1, *, metric, k, eb,
    r_sel, scorer=None,
):
    """Edge-tail refinement — the loop-free recall stage behind the eps=0
    headline.  The traversal provably cannot miss a true top-k that is
    within the first ``eb`` edges of any expanded node (admission radius is
    monotone non-increasing, so any such candidate scores below the final
    radius whenever it is seen); measured at 1M, the misses hide in the
    adjacency TAIL (columns >= eb, which the eb-wide neighbor blocks never
    score) of the top-k results themselves: tail candidates of the exact
    top-10 contain 99.8% of all true neighbors (vs 96.8% from the traversal
    alone).  One sq8 gather+score of k*(e_max-eb) tail ids, keep the best
    ``r_sel``, and one exact re-rank of pool+refine — no sequential loop.

    The reference has no analogue (its QuantizedNode stream is the full row,
    maxNoOfEdges=128, QuantizedGraph.h:64-115 — it never truncates hops the
    way an HBM block budget does; this stage buys the truncation back)."""
    n = x.shape[0]
    b, kk = ids1.shape
    safe1 = jnp.clip(ids1, 0, n - 1)
    tails = jnp.take(nbr_full, safe1, axis=0)[:, :, eb:]   # [B, k, T]
    t = tails.shape[2]
    cand = tails.reshape(b, kk * t)
    safe_c = jnp.clip(cand, 0, n - 1)
    ok = (cand >= 0) & jnp.take(valid, safe_c, axis=0)
    rows = jnp.take(codes, safe_c, axis=0)                  # [B, k*T, M]
    # sq8: scaled-L2 over int8 rows (qdv = q/scale); pq4: ADC LUT sum over
    # packed nibbles (qdv = the flattened per-query LUT)
    if scorer is None:
        dd = D.gathered(DistanceType.L2, qdv, rows)
    else:
        dd = scorer(qdv, rows)
    dd = jnp.where(ok, dd, jnp.inf)
    _, sel = jax.lax.top_k(-dd, min(r_sel, kk * t))
    tid = jnp.take_along_axis(cand, sel, axis=1)
    tid = jnp.where(
        jnp.isfinite(jnp.take_along_axis(dd, sel, axis=1)), tid, -1
    )
    merged = jnp.concatenate([pool_ids, tid], axis=1)
    # dedupe (tail candidates often already sit in the pool): sort ids,
    # flag repeats, scatter the flags back (same trick as seed dedup)
    srt = jnp.sort(merged, axis=1)
    dup_s = jnp.concatenate(
        [jnp.zeros((b, 1), bool), (srt[:, 1:] == srt[:, :-1]) & (srt[:, 1:] >= 0)],
        axis=1,
    )
    order = jnp.argsort(merged, axis=1)
    dup = jnp.zeros_like(dup_s).at[
        jnp.arange(b)[:, None], order
    ].set(dup_s)
    m_ok = (merged >= 0) & ~dup
    return _rerank_body(x, q, merged, m_ok, metric, k)


_tail_refine = functools.partial(
    jax.jit, static_argnames=("metric", "k", "eb", "r_sel", "scorer")
)(_tail_refine_body)


@functools.partial(
    jax.jit,
    static_argnames=(
        "metric", "k", "k_exp", "s", "width", "hash_bits", "exact_hash",
        "expand", "normalize_q", "refine", "eb", "kr", "mode", "m", "ksub",
    ),
)
def _qg_fused_search(
    blocks, nbr_eb, valid, codes, x, rep_rows, rep_sq, rep_ids, q,
    sq_scale, epsilon, edge_limit, nbr_full=None, codebooks=None,
    pq_mean=None, *, metric, k, k_exp, s, width, hash_bits, exact_hash,
    expand, normalize_q, refine=0, eb=0, kr=0, mode="sq8", m=0, ksub=16,
):
    """Seed selection + quantized block traversal + exact re-rank as ONE
    device program.  The un-fused wrapper paid 3+ dispatches per batch over
    the tunneled device (eager seed ops, graph_search, rerank) — the
    measured gap between direct graph_search calls and the production
    wrapper at 1M (BASELINE.md round 2e: 24.7k vs 21.6k qps).

    Two block formats share the program structure (static ``mode``):

    * ``sq8``: traversal queries are q/scale, scorer is plain L2 over int8
      block rows;
    * ``pq4``: the per-query ADC lookup table is computed IN-PROGRAM from
      the (tiny, VMEM-resident) codebooks and the traversal scores PACKED
      4-bit block rows with the one-hot LUT sum (quant.pq.make_packed_scorer
      — the TPU vpshufb analogue, reference Quantizer.h:957-1095).  pq4
      blocks are 4x smaller (0.25 B/dim, matching the reference's 0.5 B/dim
      stream at QuantizedGraph.h:24 halved again by padding-free packing),
      which is what lets one 16 GB chip hold 4M+ rows at full block width.
    """
    # queries may arrive as f16 (NGT_TPU_QG_Q16 halves the tunnel upload);
    # widen to f32 FIRST so every downstream contraction keeps f32 inputs
    q = q.astype(jnp.float32)
    # 1. seed selection (selection-only scores; the traversal re-scores the
    #    chosen seeds against the quantized codes in-program)
    sd = D.seed_scores(metric, q, rep_rows, rep_sq=rep_sq)
    _, si = jax.lax.approx_max_k(-sd, min(s, rep_rows.shape[0]))
    seeds = jnp.take(rep_ids, si, axis=0)
    # 2. traversal queries (plain angular metrics normalize to match the
    #    normalized codes — see _sq8_rows)
    qdv = q.astype(jnp.float32)
    if normalize_q:
        qn = jnp.sqrt(jnp.sum(qdv * qdv, axis=1, keepdims=True))
        qdv = qdv / jnp.maximum(qn, 1e-30)
    if mode == "sq8":
        qt = qdv / sq_scale
        scorer = None
    else:
        # per-query LUT [B, M, K] of squared subvector distances, computed
        # on device (pq.ProductQuantizer.lut semantics, Quantizer.h:683-706)
        dsub = codebooks.shape[2]
        qc = qdv - pq_mean[None, :]
        qs = qc[:, : m * dsub].reshape(q.shape[0], m, dsub)
        diff = qs[:, :, None, :] - codebooks[None, :, :, :]
        qt = jnp.sum(diff * diff, axis=-1).reshape(q.shape[0], -1)
        scorer = make_packed_scorer(m, ksub)
    res = graph_search(
        blocks, nbr_eb, valid, qt, seeds,
        metric=DistanceType.L2, k=k_exp, k_radius=kr if kr > 0 else k,
        epsilon=epsilon, width=width, edge_size=edge_limit,
        hash_bits=hash_bits, exact_hash=exact_hash, expand=expand,
        scorer=scorer, block_mode=True, seed_x=codes,
    )
    # 3. exact re-rank with the true metric over the f32 mirror
    ids1, d1 = _rerank_body(x, q, res.ids, res.ids >= 0, metric, k)
    if refine <= 0 or nbr_full is None or nbr_full.shape[1] <= eb:
        return ids1, d1
    # 4. edge-tail refinement (see _tail_refine_body)
    return _tail_refine_body(
        x, codes, nbr_full, valid, q, qt, res.ids, ids1,
        metric=metric, k=k, eb=eb, r_sel=refine, scorer=scorer,
    )


@jax.jit
def _gather_blocks(codes, nbr):
    """Per-node neighbor code blocks, gathered and flattened in ONE fused
    program (see _dev_blocks for the layout rationale)."""
    safe = jnp.clip(nbr, 0, codes.shape[0] - 1)
    return jnp.take(codes, safe, axis=0).reshape(nbr.shape[0], -1)


@functools.partial(jax.jit, donate_argnums=(0,))
def _fill_blocks_slab(blocks, codes, nbr_slab, start):
    """Donated slab write into the preallocated block tensor: the one-shot
    gather transiently needs ~2x the block bytes (gather output + layout
    copy), which is exactly what kept eb>=12 from ever fitting at 4M.
    Slab-filling caps the transient at one slab."""
    safe = jnp.clip(nbr_slab, 0, codes.shape[0] - 1)
    rows = jnp.take(codes, safe, axis=0).reshape(nbr_slab.shape[0], -1)
    return jax.lax.dynamic_update_slice(blocks, rows, (start, jnp.int32(0)))


def _norm_rows(xr, normalize):
    if normalize:
        nrm = jnp.sqrt(jnp.sum(xr * xr, axis=1, keepdims=True))
        xr = xr / jnp.maximum(nrm, 1e-30)
    return xr


@functools.partial(jax.jit, static_argnames=("normalize",))
def _absmax_dev(x, valid, *, normalize):
    """Max |component| over live (optionally row-normalized) rows."""
    xr = jnp.where(valid[:, None], _norm_rows(x.astype(jnp.float32), normalize), 0.0)
    return jnp.max(jnp.abs(xr))


@functools.partial(jax.jit, static_argnames=("normalize",))
def _sq8_chunk_dev(x, valid, inv_scale, *, normalize):
    """Device-side sq8 encode of one row chunk from the mirror's corpus —
    no host round trip (the host encode + upload was 20+ s at 1M on this
    1-core host; the corpus is already ON the device in mirror.x)."""
    xr = jnp.where(valid[:, None], _norm_rows(x.astype(jnp.float32), normalize), 0.0)
    return jnp.clip(jnp.round(xr * inv_scale), -127, 127).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("m", "normalize"))
def _pq4_chunk_dev(x, valid, codebooks, mean, *, m, normalize):
    """Device-side pq4 encode of one row chunk (per-subspace nearest
    centroid via MXU matmuls, two nibbles per byte — pq.pack_codes4
    semantics).  Chunked by the caller: the [N, m, ksub] distance
    intermediate is 4 GiB at 1M rows if done whole."""
    from ngt_tpu.quant.pq import _encode

    xr = _norm_rows(x.astype(jnp.float32), normalize)
    xr = jnp.where(valid[:, None], xr, mean[None, :])  # dead rows: code of 0-residual
    codes = _encode(xr - mean[None, :], codebooks, m)   # [N, m] uint8
    lo = codes[:, 0::2]
    hi = codes[:, 1::2]
    return lo | (hi << jnp.uint8(4))


class QuantizedGraphIndex:
    """NGTQG-style index: exact vectors + quantized codes + the host index's
    graph.  Two code formats:

    * ``sq8`` (default): per-vector int8 scalar quantization with ONE global
      scale — scoring is a plain (scaled) L2 over 128-lane int8 rows, the
      layout the TPU VPU actually likes.  A single scale keeps the ranking
      EXACTLY monotone with true quantized L2.
    * ``pq4``: the reference's 4-bit product codes + LUT sum
      (QuantizedGraph.h:24, Quantizer.h:957-1095) — 4x smaller blocks
      (0.25 B/dim vs 1 B/dim), the production format past the scale where
      sq8 neighbor blocks stop fitting the HBM budget (``pick_mode``).

    Build from a finished Index via ``quantize`` (the analogue of
    ``ngtqg quantize``; NGTQG::Index::quantize, QuantizedGraph.h:456-475);
    ``mode="auto"`` selects the format by HBM budget."""

    #: minimum sq8 block width the auto-format keeps sq8 down to.  Round-4
    #: 1M A/B: sq8 at the eb=16 FLOOR with tail refine holds 0.9858@32k qps
    #: (0.9907 with ef=14) while pq4 at eb=64 collapses to 0.73-0.81 on the
    #: clone corpus — 4-bit codes cannot separate sigma=12 clones (the
    #: round-2j IVFPQ finding), so narrow sq8 + refine beats wide pq4
    #: wherever the corpus has near-duplicates.  pq4 remains the explicit
    #: option for smooth corpora / archival parity.
    SQ8_MIN_EB = 8

    def __init__(self, index, pq: ProductQuantizer | None, codes: np.ndarray,
                 mode: str = "pq4", sq_scale: float = 1.0,
                 block_edges: int = 0):
        self.index = index
        self.pq = pq
        # [cap, ceil(M/2)] uint8 PACKED nibbles (pq4; pack_codes4) or
        # [cap, D_pad] int8 (sq8)
        self.codes = codes
        self.mode = mode
        self.sq_scale = float(sq_scale)
        #: neighbors per block row (0 = all e_max edges).  Blocks cost
        #: N*block_edges*M bytes of HBM; cap them for large indexes
        self.block_edges = int(block_edges)
        self._codes_dev = None
        #: store.mutation_count at last encode — objects inserted/removed
        #: after quantize() trigger a re-encode instead of silently carrying
        #: all-zero codes
        self._codes_mut = index.store.mutation_count

    # ------------------------------------------------------------------
    @staticmethod
    def _sq8_rows(index, x_rows: np.ndarray) -> np.ndarray:
        """Rows the sq8 codes are built from.  Plain angular metrics
        (COSINE/ANGLE — stored UN-normalized, unlike the Normalized*
        variants) encode the ROW-NORMALIZED vectors: L2 ranking on unit
        rows equals the cosine/angle ranking, so the scaled-L2 traversal
        stays rank-faithful; the exact re-rank then scores the raw mirror
        with the true metric."""
        if index.store.metric in (DistanceType.COSINE, DistanceType.ANGLE):
            nrm = np.linalg.norm(x_rows, axis=1, keepdims=True)
            return x_rows / np.maximum(nrm, 1e-30)
        return x_rows

    @classmethod
    def pick_mode(cls, cap: int, d_pad: int) -> str:
        """Auto block-format selection by HBM budget: sq8 while the budget
        admits >= SQ8_MIN_EB block columns, else pq4 (whose 0.25 B/dim
        blocks run ~4x wider for the same bytes).  The reference flips an
        analogous scale switch at 5M objects (NGT_LARGE_DATASET,
        Graph.h:287-380) and streams 4-bit codes in NGTQG
        (QuantizedGraph.h:24,64-115)."""
        if d_pad % 4:
            return "sq8"   # pq4 packing needs dim % 4 == 0 (dsub=2, paired)
        gb = float(os.environ.get("NGT_TPU_QG_BLOCK_GB", "6"))
        eb_sq8 = int(gb * (1 << 30)) // max(cap * d_pad, 1)
        return "sq8" if eb_sq8 >= cls.SQ8_MIN_EB else "pq4"

    #: rows used to train the pq4 codebooks (k-means over every row at 4M+
    #: pays minutes for no measurable codebook quality; 256k is already
    #: ~4000 samples per (subspace, centroid) cell)
    PQ_FIT_SAMPLE = 1 << 18
    #: encode/upload chunk (bounds the [M, chunk, dsub] device transpose)
    PQ_ENCODE_CHUNK = 1 << 19

    #: device-side encode chunk (bounds the [chunk, m, ksub] pq distance
    #: intermediate to ~1 GiB and the sq8 f32 widening to ~128 MB)
    DEV_ENCODE_CHUNK = 1 << 18

    @classmethod
    def _quantize_device(cls, index, dsub, ksub, iters, mode):
        """Encode straight from the device mirror — zero host round trips.
        The host path uploads the corpus it just downloaded (quantize(pq4)
        measured 59 s at 1M; this path is a handful of device programs)."""
        store = index.store
        d_pad = store.d_pad
        n = store.repository_size
        mirror = index._ensure_mirror()
        cap = store._x.shape[0]
        normalize = store.metric in (DistanceType.COSINE, DistanceType.ANGLE)
        valid_dev = jnp.asarray(store._valid[:cap])
        step = cls.DEV_ENCODE_CHUNK
        if mode == "sq8":
            if not normalize and str(mirror.x.dtype) == "uint8":
                # integral corpus, narrow mirror: the CODES ARE THE CORPUS
                # (scale 1, u8) — zero extra HBM for the code matrix and the
                # traversal scores EXACT distances (no quantization loss;
                # sq8's max/127 scale costs ~1 bit on 0..255 data, which is
                # admission noise exactly at the near-tie margins that
                # dominate clone-heavy corpora)
                self = cls(index, None, np.zeros((cap, d_pad), np.uint8),
                           mode="sq8", sq_scale=1.0)
                self._codes_dev = mirror.x
                self._codes_mut = store.mutation_count
                self._codes_host_stale = True
                return self
            scale = max(
                float(
                    _absmax_dev(
                        mirror.x[i : i + step], valid_dev[i : i + step],
                        normalize=normalize,
                    )
                )
                for i in range(0, cap, step)
            ) / 127.0
            scale = max(scale, 1e-30)
            inv = jnp.float32(1.0 / scale)
            chunks = [
                _sq8_chunk_dev(
                    mirror.x[i : i + step], valid_dev[i : i + step], inv,
                    normalize=normalize,
                )
                for i in range(0, cap, step)
            ]
            codes_dev = (
                jnp.concatenate(chunks) if len(chunks) > 1 else chunks[0]
            )
            self = cls(index, None, np.zeros((cap, d_pad), np.int8),
                       mode="sq8", sq_scale=scale)
        else:
            # fit on the SAME deterministic live-row sample as the host path
            live_idx = np.nonzero(store._valid[:n])[0]
            if len(live_idx) > cls.PQ_FIT_SAMPLE:
                sel = np.random.default_rng(12345).choice(
                    len(live_idx), cls.PQ_FIT_SAMPLE, replace=False
                )
                fit_ids = live_idx[np.sort(sel)]
            else:
                fit_ids = live_idx
            rows = _norm_rows(
                jnp.take(mirror.x, jnp.asarray(fit_ids), axis=0).astype(
                    jnp.float32
                ),
                normalize,
            )
            pq = ProductQuantizer(d_pad, dsub=dsub, ksub=ksub)
            if pq.m % 2:
                raise ValueError("device pq4 needs an even subspace count")
            mean_dev = jnp.mean(rows, axis=0)
            resid = rows - mean_dev[None, :]
            xs = resid.reshape(len(fit_ids), pq.m, dsub).transpose(1, 0, 2)
            from ngt_tpu.quant.clustering import _kmeans_multi

            cents, _ = _kmeans_multi(
                xs, jax.random.PRNGKey(0), k=ksub, iters=iters,
                mode="kmeans++",
            )
            pq.codebooks = np.asarray(cents, np.float32)
            pq.mean = np.asarray(mean_dev, np.float32)
            cb_dev = jnp.asarray(pq.codebooks)
            chunks = [
                _pq4_chunk_dev(
                    mirror.x[i : i + step], valid_dev[i : i + step],
                    cb_dev, mean_dev, m=pq.m, normalize=normalize,
                )
                for i in range(0, cap, step)
            ]
            codes_dev = (
                jnp.concatenate(chunks) if len(chunks) > 1 else chunks[0]
            )
            self = cls(index, pq, np.zeros((cap, pq.m // 2), np.uint8),
                       mode="pq4")
            self._cb_dev = cb_dev
            self._mean_dev = jnp.asarray(pq.mean)
        self._codes_dev = codes_dev
        self._codes_mut = store.mutation_count
        self._codes_host_stale = True   # self.codes is a lazy placeholder
        return self

    @classmethod
    def quantize(
        cls, index, dsub: int = 2, ksub: int = 16, iters: int = 20,
        mode: str = "sq8",
    ) -> "QuantizedGraphIndex":
        store = index.store
        d_pad = store.d_pad
        if mode == "auto":
            mode = cls.pick_mode(store._x.shape[0], d_pad)
        if (
            not store.sparse
            and os.environ.get("NGT_TPU_QG_HOST_QUANTIZE", "") != "1"
            and not (mode == "pq4" and (d_pad // dsub) % 2)
        ):
            try:
                return cls._quantize_device(index, dsub, ksub, iters, mode)
            except jax.errors.JaxRuntimeError:
                from ngt_tpu.utils import logger

                logger.warning(
                    "device-side quantize failed (device pressure?); "
                    "falling back to the host encode path"
                )
        n = store.repository_size
        live = store._valid[:n]
        x = store._x[:n].astype(np.float32)
        if mode == "sq8":
            rows = cls._sq8_rows(index, x[live])
            scale = float(np.abs(rows).max()) / 127.0 if live.any() else 1.0
            scale = scale or 1.0
            codes = np.zeros((store._x.shape[0], d_pad), np.int8)
            codes[:n][live] = np.clip(
                np.round(rows / scale), -127, 127
            ).astype(np.int8)
            return cls(index, None, codes, mode="sq8", sq_scale=scale)
        # quantize over the padded dim so code gathers align with the
        # mirror; plain angular metrics fit/encode the normalized rows
        # (same rank-faithfulness argument as _sq8_rows)
        rows = cls._sq8_rows(index, x[live])
        pq = ProductQuantizer(d_pad, dsub=dsub, ksub=ksub)
        fit_rows = rows
        if len(rows) > cls.PQ_FIT_SAMPLE:
            sel = np.random.default_rng(12345).choice(
                len(rows), cls.PQ_FIT_SAMPLE, replace=False
            )
            fit_rows = rows[np.sort(sel)]
        pq.fit(fit_rows, iters=iters)
        mp = (pq.m + 1) // 2
        codes = np.zeros((store._x.shape[0], mp), np.uint8)
        codes[:n][live] = cls._pq4_encode_chunked(pq, rows)
        return cls(index, pq, codes, mode="pq4")

    @classmethod
    def _pq4_encode_chunked(cls, pq: ProductQuantizer, rows: np.ndarray):
        from ngt_tpu.quant.pq import pack_codes4

        out = np.empty((len(rows), (pq.m + 1) // 2), np.uint8)
        step = cls.PQ_ENCODE_CHUNK
        for i in range(0, len(rows), step):
            out[i : i + step] = pack_codes4(pq.encode(rows[i : i + step]))
        return out

    # ------------------------------------------------------------------
    def _encode_rows(self, x_live: np.ndarray) -> np.ndarray:
        if self.mode == "sq8":
            if self.codes.dtype == np.uint8:
                # u8-exact codes (integral corpus, scale 1): keep exactness
                # while the data allows; an out-of-range mutation falls back
                # to scaled int8 via a full re-encode
                if (
                    len(x_live) == 0
                    or (
                        np.all((x_live >= 0) & (x_live <= 255))
                        and np.array_equal(np.rint(x_live), x_live)
                    )
                ):
                    return np.rint(x_live).astype(np.uint8)
                self.codes = self.codes.astype(np.int8)  # switch schemes
            x_live = self._sq8_rows(self.index, x_live)
            peak = float(np.abs(x_live).max()) if len(x_live) else 1.0
            if peak > 127.0 * self.sq_scale:
                self.sq_scale = peak / 127.0
            return np.clip(
                np.round(x_live / self.sq_scale), -127, 127
            ).astype(np.int8)
        return self._pq4_encode_chunked(
            self.pq, self._sq8_rows(self.index, x_live)
        )

    def _dev_codes(self):
        store = self.index.store
        cap = store._x.shape[0]
        stale = store.mutation_count != self._codes_mut
        if self.codes.shape[0] < cap:
            grown = np.zeros((cap, self.codes.shape[1]), self.codes.dtype)
            grown[: self.codes.shape[0]] = self.codes
            self.codes = grown
            stale = True
        if stale:
            # objects were inserted/removed after quantize(): re-encode all
            # live rows (zero-padded codes would silently degrade recall;
            # slot reuse also leaves stale codes behind)
            n = store.repository_size
            live = store._valid[:n]
            self.codes[:] = 0
            if live.any():
                x_live = store._x[:n][live].astype(np.float32)
                self.codes[:n][live] = self._encode_rows(x_live)
            self._codes_mut = store.mutation_count
            self._codes_dev = None
            self._codes_host_stale = False
        if self._codes_dev is None:
            self._codes_dev = jnp.asarray(self.codes)
        return self._codes_dev

    def _host_codes(self) -> np.ndarray:
        """Host copy of the codes.  After a device-side quantize the host
        array is a lazy placeholder — materialize it on first host need
        (save, sharded distribution)."""
        if getattr(self, "_codes_host_stale", False):
            if self._codes_dev is not None:
                # np.array, not asarray: the download must be WRITABLE (the
                # re-encode path mutates it; asarray of a jax array is a
                # read-only view)
                self.codes = np.array(self._codes_dev)
                self._codes_host_stale = False
            else:
                # device codes were released before materialization:
                # force a host re-encode from the store
                self._codes_mut = -1
                self._dev_codes()
        return self.codes

    def _dev_pq(self):
        """Device copies of the (tiny) pq4 codebooks + global mean — the
        fused program computes the per-query ADC LUT in-program from these
        instead of paying an extra host dispatch per chunk."""
        if getattr(self, "_cb_dev", None) is None:
            self._cb_dev = jnp.asarray(self.pq.codebooks, jnp.float32)
            self._mean_dev = jnp.asarray(self.pq.mean, jnp.float32)
        return self._cb_dev, self._mean_dev

    def release_device(self) -> None:
        """Free every device buffer this mirror holds (codes, neighbor
        blocks, adjacency slice).  Called when the auto-route falls back to
        the exact path after a device OOM: the chip is multi-tenant and
        already out of HBM at that point, so keeping hundreds of MB of
        now-unused sq8 tensors alive can starve even the tiny query upload
        the exact path needs next.  Host state is untouched — the mirror
        rebuilds its device arrays on the next successful route."""
        # a device-side quantize leaves the host codes as a lazy
        # placeholder; pull them down before dropping the device copy
        # (downloading frees HBM pressure, unlike a later 20 s host
        # re-encode)
        if getattr(self, "_codes_host_stale", False):
            try:
                self._host_codes()
            except Exception:
                self._codes_mut = -1   # force re-encode on next use
                self._codes_host_stale = False
        mirror = getattr(self.index, "_mirror", None)
        mirror_nbr = getattr(mirror, "nbr", None)
        mirror_x = getattr(mirror, "x", None)
        for attr in ("_codes_dev", "_blocks_dev", "_nbr_eb", "_cb_dev",
                     "_mean_dev"):
            buf = getattr(self, attr, None)
            if buf is not None:
                # never delete a buffer the exact-path mirror still owns
                # (a full-width adjacency slice can alias mirror.nbr, and
                # u8-exact codes ARE mirror.x)
                if buf is not mirror_nbr and buf is not mirror_x:
                    try:
                        buf.delete()
                    except Exception:
                        pass
                setattr(self, attr, None)
        self._blocks_for = None

    def _resolve_refine(self, e_max: int, eb: int) -> int:
        """search_refine resolution: explicit >= 0 honored; -1 = AUTO,
        min(64, e_max - eb).  The refinement budget should track the tail
        the block truncation cut: at eb=16 refine=64 buys +1.2 recall pts
        over 32 (0.9977 vs 0.9858 at 1M); at eb=48 (tail 32) anything past
        32 adds nothing and costs ~7% qps (BASELINE.md rounds 3a/4)."""
        r = int(self.index.prop.search_refine)
        if r >= 0:
            return r
        return min(64, max(0, int(e_max) - int(eb)))

    def _effective_block_edges(self) -> int:
        if self.block_edges > 0:
            return min(self.block_edges, self.index.graph.e_max)
        cap = self.index.store._x.shape[0]
        m = self.codes.shape[1]
        # blocks cost cap*eb*m bytes; target <= ~6 GiB (NGT_TPU_QG_BLOCK_GB
        # overrides) but never fewer than 16 edges per hop (too-narrow
        # blocks cripple traversal quality).  6 GiB admits full-width eb=40
        # blocks at 1M x 128d, the measured dominant operating point
        # (recall@10 0.966 vs 0.949 at eb=32 for ~4% qps; BASELINE.md 2f)
        gb = float(os.environ.get("NGT_TPU_QG_BLOCK_GB", "6"))
        budget = int(gb * (1 << 30)) // max(cap * m, 1)
        # width floor 16 while it fits the budget; under pressure (4M+ sq8)
        # respect the budget down to 8 — tail refine buys the truncation
        # back (round-4 A/B: eb=16+refine=32 holds 0.9858 at 1M)
        floor = max(8, min(16, budget))
        return int(min(self.index.graph.e_max, max(floor, budget)))

    def _shrink_blocks(self) -> bool:
        """Halve the neighbor-block width after a device OOM (shared-chip
        HBM pressure is a runtime condition, not a config error: the 16 GB
        chip is multi-tenant and free HBM varies run to run).  Returns False
        once the width floor (16) is reached."""
        eb = self._effective_block_edges()
        if getattr(self, "_blocks_dev", None) is not None:
            self._blocks_dev.delete()
            self._blocks_dev = None
            self._blocks_for = None
        if eb <= 8:
            return False
        self.block_edges = max(8, eb // 2)
        from ngt_tpu.utils import logger

        logger.warning(
            "device OOM on sq8 neighbor blocks; retrying at eb=%d",
            self.block_edges,
        )
        return True

    def _dev_blocks(self):
        """Per-node neighbor code blocks [N, eb*M] + the matching adjacency
        slice [N, eb] — the reference's QuantizedNode stream
        (QuantizedGraph.h:64-115): one contiguous row read per hop scores
        every neighbor (random per-neighbor gathers run at ~1% of HBM
        bandwidth on TPU; contiguous block rows do not)."""
        codes = self._dev_codes()
        cap = codes.shape[0]
        mirror = self.index._ensure_mirror()
        eb = self._effective_block_edges()
        # keyed on the mirror's monotone version counter, NOT id(mirror.nbr):
        # CPython can reuse an id() after the old array is GC'd, which would
        # nondeterministically serve stale adjacency blocks
        key = (mirror.version, self._codes_mut, eb, cap)
        if (
            getattr(self, "_blocks_dev", None) is not None
            and getattr(self, "_blocks_for", None) == key
        ):
            return self._blocks_dev, self._nbr_eb
        if getattr(self, "_blocks_dev", None) is not None:
            # free the stale block tensor BEFORE gathering the new one —
            # at 1M x eb=32..40 each copy is 4-5 GiB of HBM and holding
            # both live OOMs the chip on an eb switch
            self._blocks_dev.delete()
            self._blocks_dev = None
        self._blocks_for = key
        nbr = mirror.nbr[:, :eb]
        m = codes.shape[1]
        if cap * eb * m <= (2 << 30):
            # one fused gather+reshape (an EAGER take would materialize a
            # [N, eb, M] int8 intermediate in padded tile layout — 4x the
            # logical bytes at small eb)
            blocks = _gather_blocks(codes, nbr)
        else:
            # large blocks: preallocate once and slab-fill with donation —
            # the one-shot gather transiently costs ~2x the block bytes
            # (output + layout copy), the silent ghost behind the round-4
            # eb>=12 OOMs at 4M (6.4 GiB blocks needed ~13 GiB to gather)
            blocks = jnp.zeros((cap, eb * m), codes.dtype)
            # byte-bounded chunks: the transient gather costs ~2x the CHUNK
            # bytes, so bound chunks at ~1 GiB rather than a fixed row count
            # (at d_pad=960 a 512k-row chunk is 5.9 GiB and the fill compile
            # itself OOMs HBM — measured on the gist-960 arm)
            step = max(1 << 14, (1 << 30) // max(eb * m, 1))
            step = min(1 << 19, 1 << int(step).bit_length() - 1)
            for s in range(0, cap, step):
                blocks = _fill_blocks_slab(
                    blocks, codes, nbr[s : s + step], jnp.int32(s)
                )
        self._blocks_dev = blocks
        self._nbr_eb = nbr
        return blocks, nbr

    def batch_search(
        self,
        queries,
        size: int = 10,
        epsilon: float = 0.02,
        result_expansion: float = 3.0,
        edge_size: int = -1,
        width: int = 0,
        expand: int = 0,   # candidates expanded per loop step; 0 = the
                           # index's search_expand property (beam >1 trades
                           # distance computations for fewer sequential
                           # steps, like the exact path)
        ef: int = 0,       # exploration rank (properties.search_ef); 0 =
                           # the index property.  Drives the radius-shrink
                           # rule from the ef-th best pool distance instead
                           # of the size-th — rank-based widening, the
                           # adaptive alternative to epsilon
    ):
        """Approximate traversal over PQ scores + exact re-rank.
        Defaults mirror the reference (ε=0.02, expansion=3.0;
        bin/ngtqg/README.md:62-69)."""
        idx = self.index
        mirror = idx._ensure_mirror()
        k_exp = max(int(math.ceil(size * max(result_expansion, 1.0))), size)
        if ef <= 0:
            ef = max(int(idx.prop.search_ef), 0)
        kr = min(max(int(size), ef), k_exp) if ef > 0 else int(size)
        if idx.seeder.num_reps == 0 and idx.graph.node_count() > 0:
            live = np.nonzero(idx.graph._has_node)[0].astype(np.int32)
            idx.seeder.refresh(live, idx.store._x, default_reps(len(live)))

        if (
            (self.mode == "sq8" or (self.mode == "pq4" and self.pq is not None))
            and not idx.store.sparse
            and idx.seeder._rep_rows is not None
            and os.environ.get("NGT_TPU_QG_NO_FUSE", "") != "1"
        ):
            # route BEFORE uploading: the fused path uploads per chunk so
            # chunk i+1's host->device transfer overlaps chunk i's compute
            qh = np.asarray(queries, dtype=np.float32)
            if qh.ndim == 1:
                qh = qh[None, :]
            while True:
                try:
                    return self._batch_search_fused(
                        qh, size, k_exp, epsilon, edge_size, width, expand,
                        kr,
                    )
                except jax.errors.JaxRuntimeError as exc:
                    msg = str(exc)
                    # shared-chip HBM pressure: shrink the block width and
                    # retry instead of failing the search (free HBM on the
                    # multi-tenant chip varies run to run)
                    if "RESOURCE_EXHAUSTED" in msg:
                        if self._shrink_blocks():
                            continue
                        raise
                    # rare axon-runtime dispatch flake, same as the build
                    # path (graph/build.py): a bare INVALID_ARGUMENT.
                    # Anything else (real shape bugs) must surface — the
                    # eager redo would mask it on every batch.
                    if "INVALID_ARGUMENT" not in msg:
                        raise
                    from ngt_tpu.utils import logger

                    logger.warning(
                        "fused sq8 search dispatch failed; redoing the "
                        "batch on the eager path"
                    )
                    break

        q = idx.store.prepare_queries(np.asarray(queries, dtype=np.float32))
        b0 = q.shape[0]
        from ngt_tpu.graph.build import _bucket

        bpad = _bucket(b0)
        if bpad != b0:
            q = jnp.concatenate([q, jnp.tile(q[:1], (bpad - b0, 1))], axis=0)

        if self.mode == "sq8":
            # scaled queries: d_scaled = ||q/s - c||, monotone with the true
            # quantized distance (single global scale) — plain L2 scorer.
            # Plain angular metrics normalize the query to match the
            # normalized codes (_sq8_rows).
            qdv = jnp.asarray(q, jnp.float32)
            if idx.store.metric in (DistanceType.COSINE, DistanceType.ANGLE):
                qn = jnp.sqrt(jnp.sum(qdv * qdv, axis=1, keepdims=True))
                qdv = qdv / jnp.maximum(qn, 1e-30)
            queries_dev = qdv / self.sq_scale
            scorer = None
        else:
            qh = np.asarray(q)
            if idx.store.metric in (DistanceType.COSINE, DistanceType.ANGLE):
                qh = qh / np.maximum(
                    np.linalg.norm(qh, axis=1, keepdims=True), 1e-30
                )
            lut = self.pq.lut(qh)                          # [B, M, K]
            queries_dev = lut.reshape(lut.shape[0], -1)
            scorer = make_packed_scorer(self.pq.m, self.pq.ksub)

        seeds = idx.seeder.seeds_for(q, seed_size=idx.prop.seed_size)

        from ngt_tpu.index import _wrap_hash_bits

        bits, exact = _wrap_hash_bits(mirror.capacity,
                                      idx.prop.visited_bits_log2)
        blocks, nbr_eb = self._dev_blocks()
        eb = nbr_eb.shape[1]
        # score all resident block columns (see _batch_search_fused)
        e = eb if edge_size in (-1, 0) else min(int(edge_size), eb)
        res = graph_search(
            blocks,
            nbr_eb,
            mirror.valid,
            queries_dev,
            seeds,
            metric=DistanceType.L2,
            k=k_exp,
            k_radius=int(kr),
            epsilon=float(epsilon),
            width=width if width > 0 else max(64, 2 * k_exp),
            edge_size=int(e),
            hash_bits=bits,
            exact_hash=exact,
            expand=expand if expand > 0 else max(idx.prop.search_expand, 1),
            scorer=scorer,
            block_mode=True,
            seed_x=self._dev_codes(),
        )
        ids, dists = _exact_rerank(
            mirror.x, q, res.ids, res.ids >= 0, idx.store.metric, int(size)
        )
        refine = self._resolve_refine(mirror.nbr.shape[1], eb)
        if refine > 0 and mirror.nbr.shape[1] > eb:
            ids, dists = _tail_refine(
                mirror.x, self._dev_codes(), mirror.nbr, mirror.valid, q,
                queries_dev, res.ids, ids,
                metric=idx.store.metric, k=int(size), eb=int(eb),
                r_sel=refine, scorer=scorer,
            )
        ids, dists = jax.device_get((ids, dists))
        return idx._ext(ids[:b0]), dists[:b0]

    def _batch_search_fused(
        self, qh, size, k_exp, epsilon, edge_size, width, expand, kr=0
    ):
        """Production fast path (sq8 AND pq4): the batch runs as CHUNKED
        dispatches of one fused device program (_qg_fused_search) instead of
        traversal + rerank.  Chunking pipelines the ~100 MB/s tunnel: chunk
        i+1's query upload overlaps chunk i's compute, and all result
        downloads are deferred to one device_get.  Measured at 1M/batch 8192:
        20.5k qps unchunked -> 26.4k at chunk=2048 (BASELINE.md round 2f)
        -> 45.9k at chunk=512 (round 3g: the dispatch queue stays deeper
        with finer grains; 128 is too fine — per-dispatch overhead wins —
        so 512 is the measured knee on both the SIFT and angular arms)."""
        idx = self.index
        mirror = idx._ensure_mirror()
        from ngt_tpu.graph.build import _bucket
        from ngt_tpu.index import _wrap_hash_bits

        bits, exact = _wrap_hash_bits(mirror.capacity,
                                      idx.prop.visited_bits_log2)
        blocks, nbr_eb = self._dev_blocks()
        eb = nbr_eb.shape[1]
        # score ALL resident block columns: the rows are already read per
        # hop, and clamping to edge_size_for_search (40) was silently
        # discarding the eb=48 widening the block budget paid for
        e = eb if edge_size in (-1, 0) else min(int(edge_size), eb)
        seeder = idx.seeder
        if self.mode == "pq4":
            cb_dev, mean_dev = self._dev_pq()
            mkw = dict(mode="pq4", m=int(self.pq.m), ksub=int(self.pq.ksub))
        else:
            cb_dev = mean_dev = None
            mkw = dict(mode="sq8")
        kw = dict(
            metric=idx.store.metric, k=int(size), k_exp=int(k_exp),
            s=int(idx.prop.seed_size),
            width=width if width > 0 else max(64, 2 * k_exp),
            hash_bits=bits, exact_hash=exact,
            expand=expand if expand > 0 else max(idx.prop.search_expand, 1),
            normalize_q=idx.store.metric in
            (DistanceType.COSINE, DistanceType.ANGLE),
            refine=self._resolve_refine(mirror.nbr.shape[1], eb),
            eb=int(eb),
            kr=int(kr),
            **mkw,
        )
        b0 = qh.shape[0]
        chunk = int(os.environ.get("NGT_TPU_QG_CHUNK", "512"))
        if b0 <= chunk:
            # single dispatch, pow2-bucketed like the eager path
            bounds = [(0, b0, _bucket(b0))]
        else:
            # full chunks (only the last is row-padded) so ONE compiled
            # program shape serves every chunk of every large batch
            bounds = [
                (i, min(i + chunk, b0), chunk) for i in range(0, b0, chunk)
            ]
        # f16 query upload: the chunked dispatch is tunnel-bound, so halving
        # the upload bytes buys throughput; the fused program widens back to
        # f32 before any contraction.  Opt-in until measured per-deployment.
        q16 = os.environ.get("NGT_TPU_QG_Q16", "0") == "1"
        outs = []
        for lo, hi, pad in bounds:
            qc = qh[lo:hi]
            if hi - lo < pad:
                qc = np.concatenate(
                    [qc, np.repeat(qc[:1], pad - (hi - lo), axis=0)], axis=0
                )
            qp = idx.store.prepare_queries_host(qc)
            if q16 and qp.dtype == np.float32:   # u8 stores already ship 1 B
                # guard the narrowing: components beyond the f16 range would
                # become inf and poison the seed matmul (cf. _upload_f32's
                # lossless-narrowing check, graph/build.py) — keep f32 then
                if np.abs(qp).max(initial=0.0) <= np.float32(65504.0):
                    qp = qp.astype(np.float16)
            qd = jnp.asarray(qp)
            outs.append(_qg_fused_search(
                blocks, nbr_eb, mirror.valid, self._dev_codes(), mirror.x,
                seeder._rep_rows, seeder._rep_sq, seeder._rep_ids_dev,
                qd, jnp.float32(self.sq_scale), jnp.float32(epsilon),
                jnp.int32(e), mirror.nbr, cb_dev, mean_dev, **kw,
            ))
        got = jax.device_get(outs)
        ids = np.concatenate([g[0] for g in got], axis=0)[:b0]
        dists = np.concatenate([g[1] for g in got], axis=0)[:b0]
        return idx._ext(ids), dists

    def search(self, query, size: int = 10, epsilon: float = 0.02,
               result_expansion: float = 3.0):
        ids, dists = self.batch_search(
            np.asarray(query, np.float32)[None, :],
            size=size, epsilon=epsilon, result_expansion=result_expansion,
        )
        lo = 0 if self.index.zero_based else 1
        return [
            (int(i), float(d))
            for i, d in zip(ids[0], dists[0])
            if i >= lo and np.isfinite(d)
        ]

    # ------------------------------------------------------------------
    def save(self, path: str | None = None) -> None:
        """Persist under <index>/qg/ like the reference
        (QuantizedGraph.h:152-162)."""
        base = path or self.index.path
        if base is None:
            raise ValueError("no path")
        self.index.save(base)
        qg = os.path.join(base, "qg")
        os.makedirs(qg, exist_ok=True)
        n = self.index.store.repository_size
        extra = self.pq.state_dict() if self.pq is not None else {}
        np.savez(
            os.path.join(qg, "quantized.npz"),
            codes=self._host_codes()[:n],
            mode=self.mode,
            sq_scale=self.sq_scale,
            packed=self.mode == "pq4",
            **extra,
        )

    @classmethod
    def open(cls, path: str) -> "QuantizedGraphIndex":
        from ngt_tpu.index import open_index

        idx = open_index(path)
        st = np.load(os.path.join(path, "qg", "quantized.npz"))
        mode = str(st["mode"]) if "mode" in st else "pq4"
        if mode == "sq8":
            codes = np.zeros(
                (idx.store._x.shape[0], st["codes"].shape[1]),
                st["codes"].dtype,   # int8, or uint8 for u8-exact codes
            )
            codes[: st["codes"].shape[0]] = st["codes"]
            return cls(idx, None, codes, mode="sq8",
                       sq_scale=float(st["sq_scale"]))
        pq = ProductQuantizer.from_state(
            {k: st[k] for k in ("codebooks", "mean", "dsub", "ksub", "dimension")}
        )
        saved = st["codes"]
        if "packed" not in st or not bool(st["packed"]):
            from ngt_tpu.quant.pq import pack_codes4

            saved = pack_codes4(saved)  # round-1 unpacked format
        codes = np.zeros((idx.store._x.shape[0], (pq.m + 1) // 2), np.uint8)
        codes[: saved.shape[0]] = saved
        return cls(idx, pq, codes)
