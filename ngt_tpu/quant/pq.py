"""Product quantization: codebooks, encoding, asymmetric-distance LUTs.

TPU redesign of the reference's PQ machinery (NGTQ/Quantizer.h):

* codebook training: the reference builds one NGT index per subspace and
  k-means-rebuilds it at capacity (Quantizer.h:1846-1893); here all M
  subspace codebooks train in ONE vmapped k-means program
  (quant.clustering.kmeans_multi);
* encoding: per-subspace nearest-centroid, one batched matmul per subspace
  block — codes are [N, M] uint8 (4-bit codebooks stay unpacked on device;
  HBM is cheap relative to gather alignment);
* asymmetric distance: per-query lookup tables [M, ksub] of squared
  subvector distances (the float/uint8 LUTs of
  ``QuantizedObjectDistance::createFloatL2DistanceLookup``,
  Quantizer.h:683-760); scoring a set of codes is a gather + sum — the
  TPU analogue of the AVX512 ``vpshufb`` kernel (Quantizer.h:957-1095).

Distances are squared L2 over (optionally mean-centered) vectors; for the
normalized metrics the stored vectors are unit-norm so the L2 ranking equals
the cosine ranking (the same trick the reference uses).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ngt_tpu.quant.clustering import kmeans_multi

_F32 = jnp.float32
_PREC = jax.lax.Precision.HIGHEST


@functools.partial(jax.jit, static_argnames=("m",))
def _encode(x, codebooks, m):
    """x [N, D], codebooks [M, K, dsub] -> codes [N, M] uint8."""
    n, d = x.shape
    dsub = d // m
    xs = x.reshape(n, m, dsub).transpose(1, 0, 2)          # [M, N, dsub]

    def one(sub_x, sub_c):
        dot = jnp.dot(sub_x, sub_c.T, preferred_element_type=_F32,
                      precision=_PREC)
        d2 = (
            jnp.sum(sub_x * sub_x, axis=-1, keepdims=True)
            - 2.0 * dot
            + jnp.sum(sub_c * sub_c, axis=-1)[None, :]
        )
        return jnp.argmin(d2, axis=1).astype(jnp.uint8)

    return jax.vmap(one)(xs, codebooks).T                  # [N, M]


@functools.partial(jax.jit, static_argnames=("m",))
def _lut(q, codebooks, m):
    """q [B, D] -> LUT [B, M, K] of squared subvector distances."""
    b, d = q.shape
    dsub = d // m
    qs = q.reshape(b, m, dsub)                              # [B, M, dsub]
    diff = qs[:, :, None, :] - codebooks[None, :, :, :]     # [B, M, K, dsub]
    return jnp.sum(diff * diff, axis=-1)                    # [B, M, K]


def pack_codes4(codes: np.ndarray) -> np.ndarray:
    """Pack two 4-bit codes per byte: [N, M] uint8 (values < 16) ->
    [N, ceil(M/2)] uint8, low nibble = even subspace (the reference packs
    the same way in compressIntoUint4, NGTQ/Quantizer.h:1305-1327; halves
    HBM for the code matrix and the neighbor blocks)."""
    n, m = codes.shape
    if m % 2:
        codes = np.concatenate(
            [codes, np.zeros((n, 1), np.uint8)], axis=1
        )
    lo = codes[:, 0::2]
    hi = codes[:, 1::2]
    return (lo | (hi << 4)).astype(np.uint8)


def unpack_codes4(packed: np.ndarray, m: int) -> np.ndarray:
    """Inverse of pack_codes4 (host side)."""
    lo = packed & 0x0F
    hi = packed >> 4
    out = np.empty((packed.shape[0], packed.shape[1] * 2), np.uint8)
    out[:, 0::2] = lo
    out[:, 1::2] = hi
    return out[:, :m]


@functools.lru_cache(maxsize=None)  # stable identity: scorer is a static
def make_packed_scorer(m: int, k: int):  # jit arg of graph_search
    """Scorer over PACKED 4-bit codes with the graph_search scorer
    signature: unpack on the VPU (two cheap bitwise ops) instead of paying
    2x HBM for unpacked bytes.  m = subspace count (LUT layout), k = ksub.
    The packed byte's low nibble is the even subspace (pack_codes4)."""

    def adc_packed(lut_flat, packed, rows_sq=None, q_sq=None):
        # lut_flat: [B, M*K]; packed: [B, E, ceil(M/2)] uint8
        b = lut_flat.shape[0]
        e, mp = packed.shape[1], packed.shape[2]
        lo = (packed & jnp.uint8(0x0F)).astype(jnp.int32)
        hi = (packed >> jnp.uint8(4)).astype(jnp.int32)
        codes = jnp.stack([lo, hi], axis=3).reshape(b, e, 2 * mp)[:, :, :m]
        lut = lut_flat.reshape(b, 1, m, k)
        idx = codes[:, :, :, None]
        kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, k), 3)
        vals = jnp.sum(jnp.where(idx == kk, lut, 0.0), axis=3)
        return jnp.sum(vals, axis=-1)

    return adc_packed


def adc_gathered(lut_flat: jax.Array, codes: jax.Array, rows_sq=None,
                 q_sq=None) -> jax.Array:
    """PQ scorer with the graph_search scorer signature.
    lut_flat: [B, M*K] (LUT reshaped); codes: [B, E, M] uint8 gathered rows.
    Returns approximate squared distances [B, E].

    Formulated as a one-hot masked sum instead of take_along_axis: the
    gather lowering materializes the [B, E, M, K] broadcast, while eq+mul+
    reduce fuses into one VPU loop — the TPU stand-in for the reference's
    vpshufb LUT shuffle (Quantizer.h:957-1095)."""
    b = lut_flat.shape[0]
    e, m = codes.shape[1], codes.shape[2]
    k = lut_flat.shape[1] // m
    lut = lut_flat.reshape(b, 1, m, k)
    idx = codes.astype(jnp.int32)[:, :, :, None]            # [B, E, M, 1]
    kk = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, k), 3)
    vals = jnp.sum(jnp.where(idx == kk, lut, 0.0), axis=3)  # [B, E, M]
    return jnp.sum(vals, axis=-1)


class ProductQuantizer:
    def __init__(self, dimension: int, dsub: int = 2, ksub: int = 16):
        if dimension % dsub:
            raise ValueError("dimension must be divisible by dsub")
        self.dimension = dimension
        self.dsub = int(dsub)
        self.m = dimension // dsub
        self.ksub = int(ksub)
        self.codebooks: np.ndarray | None = None   # [M, ksub, dsub]
        self.mean: np.ndarray | None = None        # [D] global centroid

    def fit(self, x: np.ndarray, iters: int = 20, seed: int = 0,
            center: bool = True) -> "ProductQuantizer":
        x = np.asarray(x, np.float32)[:, : self.dimension]
        # single global centroid = mean (NGTQG GLOBAL_SIZE=1,
        # QuantizedGraph.h:24,396-400)
        self.mean = x.mean(axis=0) if center else np.zeros(
            self.dimension, np.float32
        )
        resid = x - self.mean
        xs = resid.reshape(len(x), self.m, self.dsub).transpose(1, 0, 2)
        # chunk the vmapped subspace axis: one shot over all M subspaces
        # allocates M x |sample| x dsub k-means buffers — fine at M=64
        # (d=128) but 64 GB-class at M=480 (d=960, measured compile OOM).
        # ~64 subspaces per dispatch keeps the 128d case one dispatch.
        step = max(1, (1 << 25) // max(len(x) * self.dsub, 1))
        if self.m <= step:
            cents, _ = kmeans_multi(xs, self.ksub, iters=iters, seed=seed)
        else:
            parts = [
                kmeans_multi(xs[s : s + step], self.ksub, iters=iters,
                             seed=seed + s)[0]
                for s in range(0, self.m, step)
            ]
            cents = np.concatenate([np.asarray(p) for p in parts], axis=0)
        self.codebooks = np.asarray(cents, np.float32)
        return self

    def encode(self, x: np.ndarray) -> np.ndarray:
        x = np.asarray(x, np.float32)[:, : self.dimension] - self.mean
        return np.asarray(
            _encode(jnp.asarray(x), jnp.asarray(self.codebooks), self.m)
        )

    def decode(self, codes: np.ndarray) -> np.ndarray:
        cb = self.codebooks  # [M, K, dsub]
        out = cb[np.arange(self.m)[None, :], codes.astype(np.int64)]  # [N,M,dsub]
        return out.reshape(len(codes), self.dimension) + self.mean

    def lut(self, queries) -> jax.Array:
        q = np.asarray(queries, np.float32)[:, : self.dimension] - self.mean
        return _lut(jnp.asarray(q), jnp.asarray(self.codebooks), self.m)

    def state_dict(self) -> dict:
        return {
            "codebooks": self.codebooks,
            "mean": self.mean,
            "dsub": self.dsub,
            "ksub": self.ksub,
            "dimension": self.dimension,
        }

    @classmethod
    def from_state(cls, st: dict) -> "ProductQuantizer":
        pq = cls(int(st["dimension"]), int(st["dsub"]), int(st["ksub"]))
        pq.codebooks = st["codebooks"]
        pq.mean = st["mean"]
        return pq
