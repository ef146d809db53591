"""Index properties & enums, interoperable with the reference's `prf` files.

Mirrors the merged ``NGT::Property`` (reference lib/NGT/Index.h:1603-1651 =
Index::Property keys from Index.h:105-261 + NeighborhoodGraph::Property keys
from Graph.h:423-489).  Enum integer codes match the reference exactly
(ObjectSpace.h:166-186 for distance/object types, Index.h for index types,
Graph.h:269-285 for graph/seed types) so a `prf` written by either side is
readable by the other.
"""

from __future__ import annotations

import dataclasses
import enum
import os
from typing import Dict


class DistanceType(enum.IntEnum):
    """Distance metrics (codes = reference ObjectSpace.h:166-180)."""

    NONE = -1
    L1 = 0
    L2 = 1
    HAMMING = 2
    ANGLE = 3
    COSINE = 4
    NORMALIZED_ANGLE = 5
    NORMALIZED_COSINE = 6
    JACCARD = 7
    SPARSE_JACCARD = 8
    NORMALIZED_L2 = 9
    POINCARE = 100
    LORENTZ = 101


#: string names accepted by the CLI / Python API (reference Command.cpp:70-100)
DISTANCE_TYPE_NAMES: Dict[str, DistanceType] = {
    "L1": DistanceType.L1,
    "L2": DistanceType.L2,
    "Hamming": DistanceType.HAMMING,
    "Angle": DistanceType.ANGLE,
    "Cosine": DistanceType.COSINE,
    "Normalized Angle": DistanceType.NORMALIZED_ANGLE,
    "Normalized Cosine": DistanceType.NORMALIZED_COSINE,
    "Jaccard": DistanceType.JACCARD,
    "Sparse Jaccard": DistanceType.SPARSE_JACCARD,
    "Normalized L2": DistanceType.NORMALIZED_L2,
    "Poincare": DistanceType.POINCARE,
    "Lorentz": DistanceType.LORENTZ,
}


class ObjectType(enum.IntEnum):
    """Stored vector dtype (codes = reference ObjectSpace.h:182-186)."""

    NONE = 0
    UINT8 = 1
    FLOAT = 2
    # TPU extension: bfloat16 storage halves HBM traffic on the hot path.
    BFLOAT16 = 100


class IndexType(enum.IntEnum):
    """Reference Index::Property::IndexType (Index.h:47-51)."""

    NONE = 0
    GRAPH_AND_TREE = 1
    GRAPH = 2


class GraphType(enum.IntEnum):
    """Reference NeighborhoodGraph::GraphType (Graph.h:269-277)."""

    NONE = 0
    ANNG = 1
    KNNG = 2
    BKNNG = 3
    ONNG = 4
    IANNG = 5
    DNNG = 6


class SeedType(enum.IntEnum):
    """Reference NeighborhoodGraph::SeedType (Graph.h:279-285)."""

    NONE = 0
    RANDOM_NODES = 1
    FIXED_NODES = 2
    FIRST_NODE = 3
    ALL_LEAF_NODES = 4


class DatabaseType(enum.IntEnum):
    """Reference Index::Property::DatabaseType (Index.h:53-57)."""

    NONE = 0
    MEMORY = 1
    MEMORY_MAPPED_FILE = 2


@dataclasses.dataclass
class Property:
    """Merged index + graph properties.

    Defaults mirror the reference (Index.h:60-103 ``Property::setDefault`` and
    Graph.h:396-422), except TPU-specific knobs documented inline.
    """

    # ---- Index::Property (reference Index.h:105-190 export keys) ----
    dimension: int = 0
    thread_pool_size: int = 32          # kept for prf interop; unused on TPU
    object_type: ObjectType = ObjectType.FLOAT
    distance_type: DistanceType = DistanceType.L2
    index_type: IndexType = IndexType.GRAPH_AND_TREE
    database_type: DatabaseType = DatabaseType.MEMORY
    object_alignment: int = 0
    path_adjustment_interval: int = 0
    prefetch_offset: int = 0            # prf interop only; no CPU prefetch on TPU
    prefetch_size: int = 0
    accuracy_table: str = ""

    # ---- NeighborhoodGraph::Property (reference Graph.h:383-524) ----
    truncation_threshold: int = 0
    edge_size_for_creation: int = 10
    edge_size_for_search: int = 40
    edge_size_limit_for_creation: int = 5
    insertion_radius_coefficient: float = 1.1
    seed_size: int = 10
    seed_type: SeedType = SeedType.NONE
    truncation_thread_pool_size: int = 8
    batch_size_for_creation: int = 200  # device batches may be larger; see build
    graph_type: GraphType = GraphType.ANNG
    dynamic_edge_size_base: int = 30
    dynamic_edge_size_rate: int = 20
    build_time_limit: float = 0.0
    outgoing_edge: int = 10
    incoming_edge: int = 80

    # ---- TPU-native extensions (not in the reference prf) ----
    #: fixed adjacency width on device; rows beyond degree are -1 padded
    max_edges: int = 64
    #: beam (candidate-pool) width of the batched search; 0 = auto from k
    search_width: int = 0
    #: log2 of the visited-bitmap size per query; 0 = auto from index size
    visited_bits_log2: int = 0
    #: number of coarse seed centroids; 0 = auto (~sqrt(N) capped)
    seed_centroids: int = 0
    #: device build batch (the reference uses batch_size_for_creation=200 for
    #: its thread pool; on TPU larger batches amortize dispatch)
    device_batch_size: int = 1024
    #: candidates expanded per search step (1 = exact reference best-first
    #: order; >1 = fewer sequential steps, more distance computations)
    search_expand: int = 1
    #: quantized-graph edge-tail refinement: sq8-score the adjacency tail
    #: (columns the HBM-budgeted neighbor blocks can't hold) of the exact
    #: top-k and keep the best `search_refine` for the final re-rank;
    #: 0 = off, -1 = AUTO: min(64, e_max - eb) — the refinement budget
    #: should scale with the truncated tail (round-4: at eb=16 refine=64
    #: reaches 0.9977 vs 0.9858 at refine=32; at eb=48 refine=64 adds
    #: nothing over 32 and costs ~7% qps).  Loop-free; measured at 1M it
    #: lifts eps=0 recall@10 from ~0.968 toward the 0.998 tail-candidate
    #: ceiling (quant/qgraph.py _tail_refine_body)
    search_refine: int = -1
    #: insertion-search backend: "auto"/"exact" = f32 row gathers (the
    #: reference's semantics exactly); "sq8" = int8 neighbor blocks + exact
    #: re-rank (opt-in: block maintenance outweighs the traversal savings on
    #: current hardware — see graph/build.py)
    build_mode: str = "auto"
    #: graph construction: "auto" = bulk exact-KNN matmul for fresh indexes
    #: AND for appends of >= bulk_append_threshold objects (measured 23x the
    #: incremental rate at equal recall); incremental batched search for
    #: small appends; "incremental"/"anng" forces the reference-style
    #: growth; "bulk" forces the matmul path
    build_algorithm: str = "auto"
    #: minimum pending objects before "auto" routes an APPEND through the
    #: bulk scan-and-merge (small appends stay incremental — resume
    #: semantics at negligible cost)
    bulk_append_threshold: int = 4096
    #: query routing: "auto" = route batch_search through a maintained sq8
    #: neighbor-block mirror above search_qg_threshold objects (the
    #: production path, ~2-3x exact at 1M — the role NGTQG plays for the
    #: reference, NGTQ/QuantizedGraph.h:192-320); "exact" = always traverse
    #: f32 rows; "qg" = always route (when the metric allows)
    search_mode: str = "auto"
    #: minimum indexed objects before "auto" builds the sq8 mirror.  The
    #: round-3e re-sweep (BASELINE.md; post fused/chunked dispatch +
    #: edge-tail refinement) measured the routed path strictly dominating
    #: exact — higher recall AND higher qps — at every size down to the 5k
    #: measurement floor, so only genuinely tiny indexes (where the
    #: quantize cost can't amortize) stay exact
    search_qg_threshold: int = 5_000
    #: result-expansion factor for the routed sq8 search (the reference's
    #: resultExpansion default 3.0, bin/ngtqg/README.md:62-69)
    result_expansion: float = 3.0
    #: exploration rank (HNSW-ef analogue, a TPU extension): drive the
    #: traversal's radius-shrink rule from the `search_ef`-th best pool
    #: distance instead of the k-th (reference Graph.cpp:609-616 always uses
    #: k).  Rank-based widening admits "the next few best" adaptively,
    #: where epsilon widens multiplicatively — on corpora whose distances
    #: concentrate (angular) a tiny epsilon already floods admission, so
    #: this is the finer recall/qps lever.  0 = off (radius rank = k)
    search_ef: int = 0
    #: what "auto" routing serves once the corpus outgrows even floor-width
    #: sq8/pq4 neighbor blocks (the _maybe_qg size skip, ~8M rows at 128d
    #: on one 16 GB chip): "ivfpq" = maintain an IVFPQ mirror (the
    #: reference's own large-dataset answer is its NGTQ index,
    #: README.md:31); "exact" = fall back to the exact graph traversal
    search_fallback: str = "ivfpq"

    # -- NGT prf key mapping (reference Index.h:105-190, Graph.h:423-489) --
    _PRF_KEYS = {
        "Dimension": ("dimension", int),
        "ThreadPoolSize": ("thread_pool_size", int),
        "ObjectType": ("object_type", int),
        "DistanceType": ("distance_type", int),
        "IndexType": ("index_type", int),
        "DatabaseType": ("database_type", int),
        "ObjectAlignment": ("object_alignment", int),
        "PathAdjustmentInterval": ("path_adjustment_interval", int),
        "PrefetchOffset": ("prefetch_offset", int),
        "PrefetchSize": ("prefetch_size", int),
        "AccuracyTable": ("accuracy_table", str),
        "TruncationThreshold": ("truncation_threshold", int),
        "EdgeSizeForCreation": ("edge_size_for_creation", int),
        "EdgeSizeForSearch": ("edge_size_for_search", int),
        "EdgeSizeLimitForCreation": ("edge_size_limit_for_creation", int),
        "EpsilonForInsertionOrder": ("insertion_radius_coefficient", float),
        "InsertionRadiusCoefficient": ("insertion_radius_coefficient", float),
        "SeedSize": ("seed_size", int),
        "SeedType": ("seed_type", int),
        "TruncationThreadPoolSize": ("truncation_thread_pool_size", int),
        "BatchSizeForCreation": ("batch_size_for_creation", int),
        "GraphType": ("graph_type", int),
        "DynamicEdgeSizeBase": ("dynamic_edge_size_base", int),
        "DynamicEdgeSizeRate": ("dynamic_edge_size_rate", int),
        "BuildTimeLimit": ("build_time_limit", float),
        "OutgoingEdge": ("outgoing_edge", int),
        "IncomingEdge": ("incoming_edge", int),
        # TPU extensions
        "MaxEdges": ("max_edges", int),
        "SearchWidth": ("search_width", int),
        "VisitedBitsLog2": ("visited_bits_log2", int),
        "SeedCentroids": ("seed_centroids", int),
        "DeviceBatchSize": ("device_batch_size", int),
        "SearchExpand": ("search_expand", int),
        "SearchRefine": ("search_refine", int),
        "SearchEf": ("search_ef", int),
        "BuildMode": ("build_mode", str),
        "BuildAlgorithm": ("build_algorithm", str),
        "BulkAppendThreshold": ("bulk_append_threshold", int),
        "SearchMode": ("search_mode", str),
        "SearchQgThreshold": ("search_qg_threshold", int),
        "ResultExpansion": ("result_expansion", float),
        "SearchFallback": ("search_fallback", str),
    }

    _ENUM_FIELDS = {
        "object_type": ObjectType,
        "distance_type": DistanceType,
        "index_type": IndexType,
        "database_type": DatabaseType,
        "graph_type": GraphType,
        "seed_type": SeedType,
    }

    def to_prf(self) -> str:
        """Serialize to the reference's tab-separated `prf` text format
        (PropertySet::save, reference Common.h:631-646)."""
        lines = []
        for key, (attr, _typ) in self._PRF_KEYS.items():
            if key in ("EpsilonForInsertionOrder",):
                continue  # alias, don't double-write
            val = getattr(self, attr)
            if isinstance(val, enum.IntEnum):
                val = int(val)
            lines.append(f"{key}\t{val}")
        return "\n".join(lines) + "\n"

    @classmethod
    def from_prf(cls, text: str) -> "Property":
        prop = cls()
        for line in text.splitlines():
            if not line.strip():
                continue
            parts = line.split("\t", 1)
            if len(parts) != 2:
                continue
            key, raw = parts
            if key not in cls._PRF_KEYS:
                continue
            attr, typ = cls._PRF_KEYS[key]
            try:
                val = typ(raw) if typ is not int else int(float(raw))
            except ValueError:
                continue
            if attr in cls._ENUM_FIELDS:
                try:
                    val = cls._ENUM_FIELDS[attr](val)
                except ValueError:
                    pass
            setattr(prop, attr, val)
        return prop

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            fh.write(self.to_prf())

    @classmethod
    def load(cls, path: str) -> "Property":
        with open(path) as fh:
            return cls.from_prf(fh.read())

    @classmethod
    def load_dir(cls, index_dir: str) -> "Property":
        return cls.load(os.path.join(index_dir, "prf"))

    def copy(self) -> "Property":
        return dataclasses.replace(self)


def resolve_distance_type(value) -> DistanceType:
    """Accept an enum, an int code, or an NGT-style / pythonic name."""
    if isinstance(value, DistanceType):
        return value
    if isinstance(value, int):
        return DistanceType(value)
    if isinstance(value, str):
        if value in DISTANCE_TYPE_NAMES:
            return DISTANCE_TYPE_NAMES[value]
        norm = value.strip().lower().replace("-", "_").replace(" ", "_")
        for name, dt in DISTANCE_TYPE_NAMES.items():
            if name.lower().replace(" ", "_") == norm:
                return dt
        try:
            return DistanceType[norm.upper()]
        except KeyError:
            raise ValueError(f"unknown distance type: {value!r}")
    raise TypeError(f"cannot resolve distance type from {value!r}")


def resolve_object_type(value) -> ObjectType:
    if isinstance(value, ObjectType):
        return value
    if isinstance(value, int):
        return ObjectType(value)
    if isinstance(value, str):
        norm = value.strip().lower()
        mapping = {
            "float": ObjectType.FLOAT,
            "float32": ObjectType.FLOAT,
            "f": ObjectType.FLOAT,
            "uint8": ObjectType.UINT8,
            "byte": ObjectType.UINT8,
            "c": ObjectType.UINT8,
            "bfloat16": ObjectType.BFLOAT16,
            "bf16": ObjectType.BFLOAT16,
        }
        if norm in mapping:
            return mapping[norm]
        raise ValueError(f"unknown object type: {value!r}")
    raise TypeError(f"cannot resolve object type from {value!r}")
