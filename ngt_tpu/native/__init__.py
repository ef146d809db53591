"""Native host runtime (C++ via ctypes) with pure-numpy fallbacks.

Compiles ``src/ngt_tpu_native.cpp`` with g++ on first use (cached .so next
to the source); every entry point has a numpy fallback so the package works
without a toolchain.  See the .cpp header for what is native and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "ngt_tpu_native.cpp")
_SO = os.path.join(_DIR, "src", "_ngt_tpu_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_SO)
            lib.tsv_parse.restype = ctypes.c_long
            lib.tsv_parse.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_long, ctypes.c_long,
            ]
            lib.tsv_count_rows.restype = ctypes.c_long
            lib.tsv_count_rows.argtypes = [ctypes.c_char_p]
            lib.connected_components.restype = ctypes.c_int64
            lib.connected_components.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ]
            lib.constrained_reverse.restype = ctypes.c_int64
            lib.constrained_reverse.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.union_pairs.restype = ctypes.c_int64
            lib.union_pairs.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
            ]
            lib.format_obj_rows.restype = ctypes.c_int64
            lib.format_obj_rows.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p,
                ctypes.c_int64,
            ]
            lib.format_graph_rows.restype = ctypes.c_int64
            lib.format_graph_rows.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p,
                ctypes.c_int64,
            ]
            lib.parse_obj_rows.restype = ctypes.c_int64
            lib.parse_obj_rows.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.parse_graph_rows.restype = ctypes.c_int64
            lib.parse_graph_rows.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.adjust_paths_phase2.restype = ctypes.c_int64
            lib.adjust_paths_phase2.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.edge_dist_lookup.restype = None
            lib.edge_dist_lookup.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
            ]
            lib.merge_edges.restype = None
            lib.merge_edges.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64,
            ]
            _lib = lib
        except Exception as exc:  # pragma: no cover - toolchain missing
            print(f"ngt_tpu.native: falling back to numpy ({exc})",
                  file=sys.stderr)
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


_CAPI_SRC = os.path.join(_DIR, "src", "ngt_tpu_capi.c")
_CAPI_SO = os.path.join(_DIR, "src", "libngt_tpu_c.so")


def build_capi() -> str:
    """Build the C-ABI shared library (the analogue of the reference's C
    API, lib/NGT/Capi.h:60-212; see ngt_tpu_capi.c).  Returns the .so
    path.  The library embeds CPython, so C programs link it plus
    libpython."""
    import sysconfig

    if os.path.exists(_CAPI_SO) and (
        os.path.getmtime(_CAPI_SO) >= os.path.getmtime(_CAPI_SRC)
    ):
        return _CAPI_SO
    inc = sysconfig.get_paths()["include"]
    libdir = sysconfig.get_config_var("LIBDIR") or ""
    ver = sysconfig.get_config_var("LDVERSION") or sysconfig.get_config_var(
        "VERSION"
    )
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-o", _CAPI_SO, _CAPI_SRC,
        f"-I{inc}", f"-L{libdir}", f"-lpython{ver}",
        f"-Wl,-rpath,{libdir}",
    ]
    subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    return _CAPI_SO


def parse_tsv(path: str, dimension: int) -> np.ndarray:
    """Bulk TSV float ingestion; extra columns ignored (the reference's
    appendText contract, ObjectRepository.h:108-145)."""
    lib = _load()
    if lib is None:
        data = np.loadtxt(path, delimiter="\t", dtype=np.float32, ndmin=2)
        if data.shape[1] < dimension:
            out = np.zeros((len(data), dimension), np.float32)
            out[:, : data.shape[1]] = data
            return out
        return np.ascontiguousarray(data[:, :dimension])
    n = lib.tsv_count_rows(path.encode())
    if n < 0:
        raise IOError(f"cannot read {path}")
    out = np.zeros((n, dimension), dtype=np.float32)
    got = lib.tsv_parse(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, dimension,
    )
    if got < 0:
        raise IOError(f"cannot read {path}")
    return out[:got]


def connected_components(
    nbr_ids: np.ndarray, has_node: np.ndarray
) -> tuple[np.ndarray, int]:
    """Component label (root id) per node, -1 for non-nodes; returns
    (labels, n_components).  Numpy fallback: vectorized label propagation."""
    n, e_max = nbr_ids.shape
    lib = _load()
    if lib is not None:
        nbr_c = np.ascontiguousarray(nbr_ids, np.int32)
        has_c = np.ascontiguousarray(has_node.view(np.uint8))
        labels = np.empty(n, np.int32)
        roots = lib.connected_components(
            nbr_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            has_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            np.int64(n), np.int64(e_max),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return labels, int(roots)
    # fallback: min-label propagation over the symmetrized edge list
    labels = np.where(has_node, np.arange(n, dtype=np.int64), -1)
    src = np.repeat(np.arange(n), e_max)
    dst = nbr_ids.reshape(-1).astype(np.int64)
    ok = (dst >= 0) & (dst < n)
    ok &= has_node[src] & has_node[np.clip(dst, 0, n - 1)]
    src, dst = src[ok], dst[ok]
    a = np.concatenate([src, dst])
    b = np.concatenate([dst, src])
    # hooking + shortcutting to fixpoint: edge propagation alone needs up to
    # diameter rounds (a chain graph has diameter n-1, so a fixed sublinear
    # bound leaves components overcounted); pointer jumping (labels[v] :=
    # labels[labels[v]]) makes the combination converge in O(log n) rounds,
    # and the n+1 cap is a true upper bound either way
    live_mask = labels >= 0
    for _ in range(n + 1):
        new = labels.copy()
        np.minimum.at(new, a, labels[b])
        jumped = np.where(live_mask, new[np.clip(new, 0, n - 1)], -1)
        new = np.where(live_mask, np.minimum(new, jumped), -1)
        if (new == labels).all():
            break
        labels = new
    live = labels[has_node]
    return labels.astype(np.int32), int(len(np.unique(live)))


def union_pairs(
    labels: np.ndarray, a: np.ndarray, b: np.ndarray
) -> tuple[np.ndarray, int]:
    """Union the (representative-id) pairs ``(a[i], b[i])`` into an existing
    component labeling and return (min-canonical labels, n_components).
    ``labels`` holds a representative node id per node, -1 for non-nodes.
    Used to finish connectivity exactly after a narrow union-find: the pairs
    are the device-extracted edges crossing the narrow components."""
    n = len(labels)
    lib = _load()
    out = np.ascontiguousarray(labels, np.int32).copy()
    a = np.ascontiguousarray(a, np.int32)
    b = np.ascontiguousarray(b, np.int32)
    if lib is not None:
        comps = lib.union_pairs(
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int64(n),
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int64(len(a)),
        )
        return out, int(comps)
    # numpy/python fallback (fine at test scale)
    parent = np.where(labels >= 0, labels, np.arange(n, dtype=np.int32))

    def find(v: int) -> int:
        r = int(v)
        while parent[r] != r:
            parent[r] = parent[parent[r]]
            r = int(parent[r])
        return r

    for x, y in zip(a.tolist(), b.tolist()):
        if 0 <= x < n and 0 <= y < n:
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[ry] = rx
    roots = np.fromiter(
        (find(i) if labels[i] >= 0 else -1 for i in range(n)),
        np.int32, count=n,
    )
    mn = np.full(n, n, np.int64)
    live = np.nonzero(labels >= 0)[0]
    np.minimum.at(mn, roots[live], live)
    out = np.where(
        labels >= 0, mn[np.clip(roots, 0, n - 1)], -1
    ).astype(np.int32)
    return out, int(len(np.unique(out[out >= 0])))


def constrained_reverse(
    nbr_ids: np.ndarray, nbr_dist: np.ndarray, degree: np.ndarray,
    out_edges: int, in_edges: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Constrained reverse-edge selection (the serial core of
    reconstructGraphWithConstraint, reference GraphReconstructor.h:565-715).
    Returns selected (rid, src, dist) triples."""
    n, e_w = nbr_ids.shape
    lib = _load()
    if lib is not None:
        nbr_c = np.ascontiguousarray(nbr_ids, np.int32)
        dist_c = np.ascontiguousarray(nbr_dist, np.float32)
        deg_c = np.ascontiguousarray(degree, np.int32)
        cap = int(degree.sum())
        out_rid = np.empty(max(cap, 1), np.int32)
        out_src = np.empty(max(cap, 1), np.int32)
        out_d = np.empty(max(cap, 1), np.float32)
        m = lib.constrained_reverse(
            nbr_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            dist_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            deg_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int64(n), np.int64(e_w),
            np.int64(out_edges), np.int64(in_edges),
            out_rid.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out_rid[:m], out_src[:m], out_d[:m]
    # pure-python fallback (same algorithm; fine at test scale)
    rev: dict[int, list[tuple[int, float]]] = {}
    for u in range(n):
        for j in range(int(degree[u])):
            t = int(nbr_ids[u, j])
            if 0 <= t < n:
                rev.setdefault(t, []).append((u, float(nbr_dist[u, j])))
    indeg = np.zeros(n, np.int64)
    outdeg = np.zeros(n, np.int64)
    rid_o, src_o, d_o = [], [], []
    for rid in sorted(rev, key=lambda t: (len(rev[t]), t)):
        for s, dd in rev[rid]:
            if indeg[s] >= in_edges:
                continue
            if indeg[s] > 0 and outdeg[rid] >= out_edges:
                continue
            rid_o.append(rid)
            src_o.append(s)
            d_o.append(dd)
            indeg[s] += 1
            outdeg[rid] += 1
    return (
        np.asarray(rid_o, np.int32), np.asarray(src_o, np.int32),
        np.asarray(d_o, np.float32),
    )


def adjust_paths_phase2(
    nbr: np.ndarray, deg: np.ndarray, cand_bits: np.ndarray, min_edges: int,
    snap_period: int = 1,
) -> np.ndarray | None:
    """Serial rank-ordered shortcut re-insertion (phase 2 of
    adjustPathsEffectively, reference GraphReconstructor.h:197-386) over the
    device-detected candidate bits.  ``snap_period`` selects the R(C)
    visibility rule shared with the device pass (see the .cpp docstring;
    R(1) = the exact rank-synchronous rule, 0 = one full-width window).
    Returns kept [n, e] bool, or None when the native lib is unavailable
    (caller falls back to the numpy rank loop, which computes the identical
    result ~50x slower at 1M)."""
    lib = _load()
    if lib is None:
        return None
    n, e = nbr.shape
    nbr_c = np.ascontiguousarray(nbr, np.int32)
    deg_c = np.ascontiguousarray(deg, np.int32)
    cand_c = np.ascontiguousarray(cand_bits)
    kept = np.empty((n, e), np.uint8)
    got = lib.adjust_paths_phase2(
        nbr_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        deg_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cand_c.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int64(n), np.int64(e), np.int64(cand_bits.shape[2]),
        np.int64(min_edges), np.int64(snap_period),
        kept.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if got < 0:
        return None
    return kept.view(bool)


def edge_dist_lookup(
    nbr: np.ndarray, dist: np.ndarray, deg: np.ndarray,
    qnbr: np.ndarray, qdeg: np.ndarray, symmetric: bool = False,
) -> np.ndarray:
    """out[u, j] = distance of edge (u -> qnbr[u, j]) resolved from u's
    ORIGINAL row; with ``symmetric``, ids absent from u's row fall back to
    the mirror edge (qnbr[u, j] -> u) — reconstruction-family rows are
    unions of original + reversed edges, so one direction always exists.
    +inf where neither does.  Saves the f32 half of ONNG device row
    downloads (distances are permutations of rows the host already holds).
    Numpy fallback: one flat searchsorted over (u << 32 | id) packed
    keys."""
    n, w = nbr.shape
    qw = qnbr.shape[1]
    lib = _load()
    if lib is not None:
        nbr_c = np.ascontiguousarray(nbr, np.int32)
        dist_c = np.ascontiguousarray(dist, np.float32)
        deg_c = np.ascontiguousarray(deg, np.int32)
        qnbr_c = np.ascontiguousarray(qnbr, np.int32)
        qdeg_c = np.ascontiguousarray(qdeg, np.int32)
        out = np.empty((n, qw), np.float32)
        lib.edge_dist_lookup(
            nbr_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            dist_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            deg_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int64(n), np.int64(w),
            qnbr_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            qdeg_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int64(qw), np.int64(1 if symmetric else 0),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out
    rows = np.arange(n, dtype=np.int64)[:, None]
    ok = nbr >= 0
    keys = np.where(ok, (rows << 32) | nbr.astype(np.int64),
                    np.iinfo(np.int64).max)
    order = np.argsort(keys, axis=1, kind="stable")
    skeys = np.take_along_axis(keys, order, axis=1).reshape(-1)
    sdist = np.take_along_axis(
        np.asarray(dist, np.float32), order, axis=1
    ).reshape(-1)

    def flat_lookup(qk):
        pos = np.searchsorted(skeys, qk)
        pos = np.clip(pos, 0, len(skeys) - 1)
        hit = skeys[pos] == qk
        res = np.full(len(qk), np.inf, np.float32)
        res[hit] = sdist[pos[hit]]
        return res

    qok = qnbr >= 0
    qkeys = np.where(qok, (rows << 32) | qnbr.astype(np.int64), -1).reshape(-1)
    out = flat_lookup(qkeys)
    if symmetric:
        miss = np.isinf(out) & qok.reshape(-1)
        if miss.any():
            u_flat = np.repeat(np.arange(n, dtype=np.int64), qw)[miss]
            t_flat = qnbr.reshape(-1).astype(np.int64)[miss]
            inb = (t_flat >= 0) & (t_flat < n)
            mk = np.where(inb, (t_flat << 32) | u_flat, -1)
            out[miss] = flat_lookup(mk)
    return out.reshape(n, qw)


def format_obj_rows(x: np.ndarray, valid: np.ndarray) -> bytes | None:
    """Format object rows as the v2 text-export lines ("+v\\tv...\\n" /
    "-\\n").  Returns None when the native lib is unavailable (caller falls
    back to the Python loop).  %.9g is lossless for float32."""
    lib = _load()
    if lib is None:
        return None
    n, d = x.shape
    x = np.ascontiguousarray(x, np.float32)
    v = np.ascontiguousarray(valid[:n].view(np.uint8))
    cap = int(n * (d * 20 + 3) + 16)
    buf = np.empty(cap, np.uint8)  # not create_string_buffer: no memset
    m = lib.format_obj_rows(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int64(n), np.int64(d),
        ctypes.cast(buf.ctypes.data, ctypes.c_char_p), np.int64(cap),
    )
    if m < 0:
        return None
    return buf[:m].tobytes()


def format_graph_rows(
    nbr: np.ndarray, dist: np.ndarray, deg: np.ndarray, has: np.ndarray
) -> bytes | None:
    """Format adjacency rows as the v2 text-export lines
    ("id:dist\\t...\\n" / "-\\n")."""
    lib = _load()
    if lib is None:
        return None
    n, e = nbr.shape
    nbr = np.ascontiguousarray(nbr, np.int32)
    dist = np.ascontiguousarray(dist, np.float32)
    deg = np.ascontiguousarray(deg[:n], np.int32)
    has = np.ascontiguousarray(has[:n].view(np.uint8))
    cap = int(int(np.minimum(deg, e).sum()) * 34 + n * 3 + 16)
    buf = np.empty(cap, np.uint8)
    m = lib.format_graph_rows(
        nbr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        deg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        has.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int64(n), np.int64(e),
        ctypes.cast(buf.ctypes.data, ctypes.c_char_p), np.int64(cap),
    )
    if m < 0:
        return None
    return buf[:m].tobytes()


def parse_obj_rows(
    data: bytes, n: int, d: int
) -> tuple[np.ndarray, np.ndarray, int] | None:
    """Parse n object-export lines -> (x [n,d] f32, valid [n] bool, bytes
    consumed); None when the native lib is unavailable or input malformed
    (caller falls back to the Python parser)."""
    lib = _load()
    if lib is None:
        return None
    x = np.empty((n, d), np.float32)  # the parser writes every slot
    valid = np.empty((n,), np.uint8)
    used = lib.parse_obj_rows(
        data, np.int64(len(data)), np.int64(n), np.int64(d),
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if used < 0:
        return None
    return x, valid.view(bool), int(used)


def parse_graph_rows(
    data: bytes, n: int, e: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int] | None:
    """Parse n graph-export lines -> (nbr, dist, deg, has, bytes consumed)."""
    lib = _load()
    if lib is None:
        return None
    nbr = np.empty((n, e), np.int32)  # the parser writes every slot
    dist = np.empty((n, e), np.float32)
    deg = np.empty((n,), np.int32)
    has = np.empty((n,), np.uint8)
    used = lib.parse_graph_rows(
        data, np.int64(len(data)), np.int64(n), np.int64(e),
        nbr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        deg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        has.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if used < 0:
        return None
    return nbr, dist, deg, has.view(bool), int(used)


def merge_edges(
    nbr_ids: np.ndarray, nbr_dist: np.ndarray, degree: np.ndarray,
    has_node: np.ndarray, targets: np.ndarray, srcs: np.ndarray,
    dists: np.ndarray,
) -> bool:
    """In-place bulk edge merge; returns False when the native lib is
    unavailable (caller falls back to the numpy path)."""
    lib = _load()
    if lib is None:
        return False
    assert nbr_ids.flags.c_contiguous and nbr_dist.flags.c_contiguous
    targets = np.ascontiguousarray(targets, np.int64)
    srcs = np.ascontiguousarray(srcs, np.int32)
    dists = np.ascontiguousarray(dists, np.float32)
    lib.merge_edges(
        nbr_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nbr_dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        degree.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        has_node.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int64(nbr_ids.shape[1]),
        targets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        srcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dists.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        np.int64(len(targets)),
    )
    return True
