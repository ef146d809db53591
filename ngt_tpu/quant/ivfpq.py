"""IVF+PQ index — the NGTQ analogue (billion-scale quantized search).

The reference's NGTQ (NGTQ/Quantizer.h) = a global codebook (coarse
centroids held in an NGT graph index), per-centroid inverted lists of packed
(objectID, localID[M]) records, per-subspace local codebooks over residuals,
and raw objects in an ArrayFile; search = global-codebook lookup ->
aggregate candidates from inverted lists via LUTs -> optional exact
refinement (five AggregationModes, Quantizer.h:2266-2549).

TPU redesign:
* the global codebook is a dense centroid matrix — scoring a query batch
  against all C centroids is ONE matmul + top-nprobe (a graph index over
  centroids is pointless when the MXU does C=100k in microseconds);
* inverted lists are fixed-width padded arrays ``list_ids[C, L]`` /
  ``list_codes[C, L, M]`` so a probe is a static-shape gather;
* residual PQ scoring = LUT take_along_axis sum (quant.pq), batched over
  the nprobe gathered lists;
* refinement (AggregationMode exact / exact-after-approx) = exact re-rank
  of the approximate top-k' against the raw vectors kept on device.
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
from ngt_tpu.quant.pq import ProductQuantizer

_F32 = jnp.float32
_PREC = jax.lax.Precision.HIGHEST
INF = np.float32(np.inf)


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "m"))
def _ivfpq_search(
    list_ids, list_codes, list_valid, lut_flat, q_cent_d,
    *, nprobe, k, m,
):
    """One fused IVF+PQ probe.
    centroids [C, D]; list_ids [C, L]; list_codes [C, L, M];
    lut_flat [B, M*K] residual LUTs per (query, probed centroid) are NOT
    precomputable per centroid — the reference solves this with per-centroid
    cached LUTs; here the LUT is computed against the PQ codebooks of the
    RESIDUAL space, shared across centroids, and the centroid term is added
    separately:  d^2(q, c + r) ≈ ||q - c||^2 + (2(q-c)·r̂ + ||r̂||^2) — we use
    the standard IVFADC decomposition with LUTs built on (q - c) per probe.

    For exactness of the decomposition we pass per-probe LUTs below instead;
    this kernel just gathers lists and sums LUT entries.
    lut_flat here: [B, P, M*K] per-probe LUTs;
    q_cent_d: [B, P] ids of probed centroids.
    """
    b = lut_flat.shape[0]
    p = lut_flat.shape[1]
    kk = lut_flat.shape[2] // m
    probe_ids = q_cent_d                                  # [B, P] int32
    ids = jnp.take(list_ids, probe_ids, axis=0)           # [B, P, L]
    codes = jnp.take(list_codes, probe_ids, axis=0)       # [B, P, L, M]
    ok = jnp.take(list_valid, probe_ids, axis=0)          # [B, P, L]
    lut = lut_flat.reshape(b, p, m, kk)
    vals = jnp.take_along_axis(
        lut[:, :, None, :, :],                            # [B, P, 1, M, K]
        codes.astype(jnp.int32)[:, :, :, :, None],        # [B, P, L, M, 1]
        axis=4,
    )[..., 0]
    d2 = jnp.sum(vals, axis=-1)                           # [B, P, L]
    d2 = jnp.where(ok, d2, jnp.inf)
    flat_d = d2.reshape(b, -1)
    flat_i = ids.reshape(b, -1)
    neg, sel = jax.lax.top_k(-flat_d, k)
    out_i = jnp.take_along_axis(flat_i, sel, axis=1)
    out_d = -neg
    out_i = jnp.where(jnp.isfinite(out_d), out_i, -1)
    return out_i, out_d


class IVFPQIndex:
    """NGTQ-style quantized index (API mirrors NGTQ::Index,
    Quantizer.h:2720-2939: insert/search/save/open, result-expansion)."""

    def __init__(
        self,
        dimension: int,
        n_centroids: int = 256,
        dsub: int = 2,
        ksub: int = 16,
        metric: DistanceType = DistanceType.L2,
        keep_raw: bool = True,
    ):
        self.dimension = dimension
        self.metric = DistanceType(metric)
        self.n_centroids = int(n_centroids)
        self.pq = ProductQuantizer(dimension, dsub=dsub, ksub=ksub)
        self.keep_raw = keep_raw
        self.centroids: np.ndarray | None = None
        self._x: list[np.ndarray] = []        # raw objects (ArrayFile analogue)
        self._assign: np.ndarray | None = None
        self._codes: np.ndarray | None = None
        self._built = False
        self._dev = None

    # ------------------------------------------------------------------
    def batch_insert(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float32)
        if x.shape[1] != self.dimension:
            raise ValueError(
                f"dimension mismatch: got {x.shape[1]}, want {self.dimension}"
            )
        self._x.append(x)
        self._built = False

    @property
    def size(self) -> int:
        return sum(len(a) for a in self._x)

    def build(self, kmeans_iters: int = 15, seed: int = 0) -> None:
        """Train global + local codebooks, encode residuals, build lists
        (the batch path of NGTQ insert + codebook rebuild,
        Quantizer.h:1846-1959)."""
        x = np.concatenate(self._x, axis=0) if self._x else np.zeros(
            (0, self.dimension), np.float32
        )
        if len(x) == 0:
            raise ValueError("nothing to build")
        c = min(self.n_centroids, len(x))
        self.centroids, assign = kmeans(x, c, iters=kmeans_iters, seed=seed)
        resid = x - self.centroids[assign]
        self.pq.fit(resid, center=False)
        codes = self.pq.encode(resid)
        self._assign = assign
        self._codes = codes
        self._x = [x]
        self._built = True
        self._dev = None

    # ------------------------------------------------------------------
    def _device(self):
        if self._dev is not None:
            return self._dev
        x = self._x[0]
        c = len(self.centroids)
        counts = np.bincount(self._assign, minlength=c)
        l_max = max(int(counts.max()), 1)
        list_ids = np.full((c, l_max), -1, np.int32)
        list_codes = np.zeros((c, l_max, self.pq.m), np.uint8)
        order = np.argsort(self._assign, kind="stable")
        sorted_assign = self._assign[order]
        starts = np.searchsorted(sorted_assign, np.arange(c))
        slot = np.arange(len(x)) - starts[sorted_assign]
        list_ids[sorted_assign, slot] = order.astype(np.int32)
        list_codes[sorted_assign, slot] = self._codes[order]
        self._dev = {
            "centroids": jnp.asarray(self.centroids),
            "list_ids": jnp.asarray(list_ids),
            "list_codes": jnp.asarray(list_codes),
            "list_valid": jnp.asarray(list_ids >= 0),
            "x": jnp.asarray(x) if self.keep_raw else None,
        }
        return self._dev

    def batch_search(
        self,
        queries: np.ndarray,
        size: int = 10,
        nprobe: int = 8,
        result_expansion: float = 3.0,
        refine: bool = True,
    ):
        """IVFADC search: probe top-nprobe centroids, LUT-score their lists,
        optional exact refinement (the reference's AggregationModes: refine=
        False ≈ ApproximateDistance, True ≈ ExactDistance after approx,
        Quantizer.h:2266-2549)."""
        if not self._built:
            self.build()
        dev = self._device()
        q = np.asarray(queries, np.float32)
        b = len(q)
        nprobe = min(nprobe, len(self.centroids))
        k_exp = (
            max(int(np.ceil(size * max(result_expansion, 1.0))), size)
            if refine
            else size
        )

        # centroid scoring: one matmul
        qd = jnp.asarray(q)
        cd = D.pairwise(DistanceType.L2, qd, dev["centroids"])
        _, probe = jax.lax.top_k(-cd, nprobe)              # [B, P]

        # per-probe residual LUTs: LUT of (q - centroid_p), all on device
        # (the PQ was fit on residuals with center=False, so mean is zero)
        from ngt_tpu.quant.pq import _lut

        cent_rows = jnp.take(dev["centroids"], probe, axis=0)  # [B, P, D]
        qr = (qd[:, None, :] - cent_rows).reshape(b * nprobe, -1)
        lut = _lut(qr, jnp.asarray(self.pq.codebooks), self.pq.m)
        lut_flat = lut.reshape(b, nprobe, -1)

        ids, dists = _ivfpq_search(
            dev["list_ids"], dev["list_codes"],
            dev["list_valid"], lut_flat, probe,
            nprobe=nprobe, k=min(k_exp, dev["list_ids"].shape[1] * nprobe),
            m=self.pq.m,
        )
        if refine and dev["x"] is not None:
            safe = jnp.clip(ids, 0, dev["x"].shape[0] - 1)
            rows = jnp.take(dev["x"], safe, axis=0)
            dd = D.gathered(self.metric, qd, rows)
            dd = jnp.where(ids >= 0, dd, jnp.inf)
            neg, sel = jax.lax.top_k(-dd, size)
            ids = jnp.take_along_axis(ids, sel, axis=1)
            dists = -neg
            ids = jnp.where(jnp.isfinite(dists), ids, -1)
        else:
            ids, dists = ids[:, :size], jnp.sqrt(jnp.maximum(dists[:, :size], 0))
        return np.asarray(ids), np.asarray(dists)

    def search(self, query, size=10, nprobe=8, result_expansion=3.0):
        ids, dists = self.batch_search(
            np.asarray(query, np.float32)[None, :], size=size, nprobe=nprobe,
            result_expansion=result_expansion,
        )
        return [
            (int(i), float(d))
            for i, d in zip(ids[0], dists[0])
            if i >= 0 and np.isfinite(d)
        ]

    # ------------------------------------------------------------------
    def verify(self) -> list[str]:
        """Inverted-index consistency (reference NGTQ validate/verify,
        Quantizer.h:2140-2246, 2612-2668)."""
        errs = []
        if not self._built:
            return ["index not built"]
        n = self.size
        if self._assign.shape[0] != n or self._codes.shape[0] != n:
            errs.append("assignment/code count mismatch")
        if (self._assign < 0).any() or (
            self._assign >= len(self.centroids)
        ).any():
            errs.append("assignment out of range")
        if (self._codes >= self.pq.ksub).any():
            errs.append("code out of range")
        return errs

    def save(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "ivfpq.npz"),
            centroids=self.centroids,
            assign=self._assign,
            codes=self._codes,
            x=self._x[0] if self.keep_raw else np.zeros((0, self.dimension)),
            **{f"pq_{k}": v for k, v in self.pq.state_dict().items()},
        )
        with open(os.path.join(path, "ivfpq.json"), "w") as fh:
            json.dump(
                {
                    "dimension": self.dimension,
                    "metric": int(self.metric),
                    "n_centroids": self.n_centroids,
                    "keep_raw": self.keep_raw,
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
            keep_raw=meta["keep_raw"],
        )
        idx.centroids = st["centroids"]
        idx._assign = st["assign"]
        idx._codes = st["codes"]
        idx._x = [st["x"].astype(np.float32)]
        idx.pq = ProductQuantizer.from_state(
            {
                "codebooks": st["pq_codebooks"],
                "mean": st["pq_mean"],
                "dsub": int(st["pq_dsub"]),
                "ksub": int(st["pq_ksub"]),
                "dimension": int(st["pq_dimension"]),
            }
        )
        idx._built = True
        return idx
