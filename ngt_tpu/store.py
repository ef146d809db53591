"""VectorStore — the object space (reference layer 2) as dense arrays.

Replaces the reference's per-object heap allocations
(``Object``/``ObjectRepository``/``ObjectSpaceRepository``, reference
lib/NGT/ObjectRepository.h, ObjectSpaceRepository.h) with one host numpy
matrix (authoritative, append-in-place with geometric growth) mirrored to a
device HBM array on demand.  Keeps the reference's conventions:

* IDs are 1-based; slot 0 is a dummy row (reference Common.h:1711 inserts a
  null at index 0).  The validity mask makes row 0 (and removed rows) never
  match a search.
* removed IDs go to a free list and are reused by later inserts
  (``Repository::removedList``, reference Common.h:1747-1774).
* normalized metrics L2-normalize at insertion
  (reference ObjectSpaceRepository.h:560-618).
* feature dim is zero-padded to the TPU lane width (the analogue of
  ``getPaddedDimension``, reference ObjectSpace.h:249).
"""

from __future__ import annotations

import heapq
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ngt_tpu.ops import distances as D
from ngt_tpu.ops.bruteforce import pad_dim
from ngt_tpu.properties import DistanceType, ObjectType


_OBJECT_DTYPES = {
    ObjectType.FLOAT: np.float32,
    ObjectType.UINT8: np.uint8,
    ObjectType.BFLOAT16: np.float32,  # host copy in f32; device mirror bf16
}


def pad_sparse(id_lists, dimension: int) -> np.ndarray:
    """Pack variable-length feature-id sets into a sorted, -1-padded int32
    matrix — the analogue of ``Index::makeSparseObject`` which packs uint32
    ids into float bit patterns (reference Index.cpp:303-320)."""
    out = np.full((len(id_lists), dimension), -1, np.int32)
    for i, ids in enumerate(id_lists):
        ids = sorted(int(v) for v in ids)
        if len(ids) > dimension:
            raise ValueError(
                f"sparse object has {len(ids)} ids; index dimension is "
                f"{dimension}"
            )
        out[i, : len(ids)] = ids
    return out


class VectorStore:
    def __init__(
        self,
        dimension: int,
        metric: DistanceType = DistanceType.L2,
        object_type: ObjectType = ObjectType.FLOAT,
        capacity: int = 1024,
        pad_multiple: int = 128,
    ):
        if dimension <= 0:
            raise ValueError("dimension must be positive")
        self.dimension = int(dimension)
        self.metric = DistanceType(metric)
        self.object_type = ObjectType(object_type)
        self.pad_multiple = pad_multiple
        self.d_pad = pad_dim(dimension, pad_multiple)
        # sparse-Jaccard objects are sorted feature-id sets (int32, -1 pad)
        self.sparse = self.metric == DistanceType.SPARSE_JACCARD
        self._dtype = np.int32 if self.sparse else _OBJECT_DTYPES[self.object_type]
        self._pad_value = -1 if self.sparse else 0

        cap = max(int(capacity), 16)
        self._x = np.full((cap, self.d_pad), self._pad_value, dtype=self._dtype)
        self._valid = np.zeros((cap,), dtype=bool)
        self._size = 1  # next fresh slot; slot 0 is the dummy
        self._free: list[int] = []  # min-heap of reusable ids
        self._device_x: Optional[jax.Array] = None
        self._device_valid: Optional[jax.Array] = None
        self._device_sqnorm: Optional[jax.Array] = None
        self._device_rows = 0  # rows already mirrored (prefix is immutable-ish)
        self._dirty = True
        #: bumped on every insert/remove — lets derived structures (e.g.
        #: quantized codes) detect staleness without holding array refs
        self.mutation_count = 0

        # the reference normalizes only the "Normalized*" metrics at insert
        # (ObjectSpaceRepository::setDistanceType, ObjectSpaceRepository.h:346-441)
        # and computes Cosine/Angle with explicit norms (PrimitiveComparator.h:487).
        self.normalize = self.metric in (
            DistanceType.NORMALIZED_L2,
            DistanceType.NORMALIZED_COSINE,
            DistanceType.NORMALIZED_ANGLE,
        )

    # ----------------------------------------------------------- sizing ----
    def __len__(self) -> int:
        """Number of live objects."""
        return int(self._valid.sum())

    @property
    def repository_size(self) -> int:
        """1 + highest slot ever used (reference Repository::size semantics)."""
        return self._size

    def _ensure_capacity(self, n: int) -> None:
        if n <= self._x.shape[0]:
            return
        cap = self._x.shape[0]
        while cap < n:
            cap *= 2
        x = np.full((cap, self.d_pad), self._pad_value, dtype=self._dtype)
        x[: self._x.shape[0]] = self._x
        self._x = x
        valid = np.zeros((cap,), dtype=bool)
        valid[: self._valid.shape[0]] = self._valid
        self._valid = valid
        self._device_x = None  # device mirror must be re-shaped
        self._device_rows = 0
        self._dirty = True

    # ---------------------------------------------------------- mutation ----
    def _prepare(self, v: np.ndarray) -> np.ndarray:
        v = np.asarray(v)
        if v.ndim == 1:
            v = v[None, :]
        if self.sparse:
            # rows are -1-padded sorted id sets of width <= dimension
            if v.shape[-1] > self.dimension:
                raise ValueError(
                    f"sparse width {v.shape[-1]} exceeds dimension "
                    f"{self.dimension}"
                )
            out = np.full((v.shape[0], self.d_pad), -1, np.int32)
            out[:, : v.shape[-1]] = np.sort(
                np.where(v < 0, np.iinfo(np.int32).max, v), axis=-1
            )
            out[out == np.iinfo(np.int32).max] = -1
            return out
        if v.shape[-1] != self.dimension:
            raise ValueError(
                f"dimension mismatch: got {v.shape[-1]}, want {self.dimension}"
            )
        out = np.zeros((v.shape[0], self.d_pad), dtype=self._dtype)
        if self.normalize:
            vf = v.astype(np.float64)
            norms = np.linalg.norm(vf, axis=-1, keepdims=True)
            if np.any(norms == 0):
                raise ValueError("cannot normalize a zero vector")
            out[:, : self.dimension] = (vf / norms).astype(self._dtype)
        else:
            out[:, : self.dimension] = v.astype(self._dtype)
        return out

    def insert(self, v: np.ndarray) -> int:
        """Insert one vector; returns its 1-based id (reuses removed slots,
        reference Common.h:1747-1760)."""
        row = self._prepare(v)[0]
        if self._free:
            oid = heapq.heappop(self._free)
        else:
            oid = self._size
            self._size += 1
            self._ensure_capacity(self._size)
        self._x[oid] = row
        self._valid[oid] = True
        self._dirty = True
        self.mutation_count += 1
        return oid

    def batch_insert(self, vs: np.ndarray) -> np.ndarray:
        rows = self._prepare(vs)
        n = rows.shape[0]
        ids = np.empty((n,), dtype=np.int32)
        i = 0
        while self._free and i < n:
            ids[i] = heapq.heappop(self._free)
            i += 1
        fresh = n - i
        if fresh:
            start = self._size
            self._size += fresh
            self._ensure_capacity(self._size)
            ids[i:] = np.arange(start, start + fresh, dtype=np.int32)
        self._x[ids] = rows
        self._valid[ids] = True
        self._dirty = True
        self.mutation_count += 1
        return ids

    def remove(self, oid: int) -> None:
        if not (0 < oid < self._size) or not self._valid[oid]:
            raise KeyError(f"no such object id: {oid}")
        self._valid[oid] = False
        self._x[oid] = self._pad_value
        heapq.heappush(self._free, int(oid))
        self._dirty = True
        self.mutation_count += 1

    def get(self, oid: int) -> np.ndarray:
        if not (0 < oid < self._size) or not self._valid[oid]:
            raise KeyError(f"no such object id: {oid}")
        return np.array(self._x[oid, : self.dimension])

    def contains(self, oid: int) -> bool:
        return 0 < oid < self._size and bool(self._valid[oid])

    # ------------------------------------------------------------ device ----
    def device_arrays(self):
        """(x [cap, d_pad], valid [cap], sqnorm [cap] or None) on device.

        The whole store is re-uploaded when dirty; incremental row scatter is
        an optimization applied by the build loop, which owns its own device
        mirrors."""
        if self._dirty or self._device_x is None:
            x = self._x
            if self.object_type == ObjectType.BFLOAT16:
                dx = jnp.asarray(x, dtype=jnp.bfloat16)
            else:
                # narrowest lossless dtype (u8 for integral corpora): 4x
                # less upload + resident HBM; distance entry points cast
                # to f32 in-program, so results are bit-identical
                from ngt_tpu.utils import narrow_host

                dx = jnp.asarray(narrow_host(x))
            self._device_x = dx
            self._device_valid = jnp.asarray(self._valid)
            if self.metric in (
                DistanceType.L2,
                DistanceType.COSINE,
                DistanceType.ANGLE,
                DistanceType.POINCARE,
            ):
                self._device_sqnorm = D.sq_norms(dx)
            else:
                self._device_sqnorm = None
            self._dirty = False
        return self._device_x, self._device_valid, self._device_sqnorm

    def release_device(self) -> None:
        """Drop the store's cached device arrays (the linear-search upload
        is 2 GiB of f32 at 4M rows; a search-only deployment that computed
        its ground truth once should not keep it resident)."""
        for attr in ("_device_x", "_device_valid", "_device_sqnorm"):
            buf = getattr(self, attr, None)
            if buf is not None:
                try:
                    buf.delete()
                except Exception:
                    pass
            setattr(self, attr, None)
        self._dirty = True

    def prepare_queries_host(self, q: np.ndarray) -> np.ndarray:
        """Pad (and for normalized metrics, normalize) queries on the host
        (reference allocates query objects the same way it allocates stored
        objects; ObjectSpaceRepository.h:560-618).  Dense metrics only."""
        q = np.asarray(q, dtype=np.float32)
        if q.ndim == 1:
            q = q[None, :]
        if q.shape[-1] != self.dimension:
            raise ValueError(
                f"query dimension mismatch: got {q.shape[-1]}, want {self.dimension}"
            )
        if self.normalize:
            norms = np.linalg.norm(q, axis=-1, keepdims=True)
            norms[norms == 0] = 1.0
            q = q / norms
        out = np.zeros((q.shape[0], self.d_pad), dtype=self._dtype)
        out[:, : self.dimension] = q.astype(self._dtype)
        return out

    def prepare_queries(self, q: np.ndarray) -> jax.Array:
        """Host prep + device upload (see prepare_queries_host)."""
        if self.sparse:
            return jnp.asarray(self._prepare(np.asarray(q, dtype=np.int64)))
        return jnp.asarray(self.prepare_queries_host(q))

    # -------------------------------------------------------- persistence ----
    def state_dict(self) -> dict:
        return {
            "x": self._x[: self._size],
            "valid": self._valid[: self._size],
            "free": np.asarray(sorted(self._free), dtype=np.int32),
            "dimension": self.dimension,
            "metric": int(self.metric),
            "object_type": int(self.object_type),
        }

    @classmethod
    def from_state(cls, state: dict, copy: bool = True) -> "VectorStore":
        vs = cls(
            dimension=int(state["dimension"]),
            metric=DistanceType(int(state["metric"])),
            object_type=ObjectType(int(state["object_type"])),
            capacity=max(int(state["x"].shape[0]), 16) if copy else 16,
        )
        n = state["x"].shape[0]
        if copy:
            vs._ensure_capacity(n)
            vs._x[:n] = state["x"]
            vs._valid[:n] = state["valid"]
        else:
            # adopt the arrays as-is (e.g. copy-on-write memmaps: readers
            # share the page cache; growth falls back to a private copy via
            # _ensure_capacity)
            vs._x = state["x"]
            vs._valid = np.array(state["valid"])
        vs._size = n
        vs._free = [int(i) for i in state["free"]]
        heapq.heapify(vs._free)
        vs._dirty = True
        return vs
