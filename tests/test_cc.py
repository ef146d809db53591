"""Connected-component labeling: the one-shot host path (narrow union-find
+ device-extracted cross edges + union_pairs) must equal the full-graph
labels on structures where narrow partitions genuinely differ (chains of
cliques — the case that made the warm-started device pass iterate)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ngt_tpu import native
from ngt_tpu.graph.build import (
    _cc_cross_count,
    _cc_cross_pairs,
    _cc_labels_device,
    _bucket,
)


def _host_onehot_labels(nbr, has, w):
    """The production recipe from _cc_labels_bulk, minus the scan plumbing:
    narrow UF on the first w columns, then union the crossing edges."""
    cap = nbr.shape[0]
    labels, _ = native.connected_components(
        np.ascontiguousarray(nbr[:, :w]), has
    )
    l0 = jnp.asarray(np.where(labels >= 0, labels, cap).astype(np.int32))
    nbr_dev = jnp.asarray(nbr)
    cnt = int(_cc_cross_count(nbr_dev, l0))
    if cnt == 0:
        merged, comps = native.union_pairs(
            labels, np.zeros(0, np.int32), np.zeros(0, np.int32)
        )
        return merged, comps
    a, b = _cc_cross_pairs(nbr_dev, l0, _bucket(cnt))
    return native.union_pairs(labels, np.asarray(a), np.asarray(b))


def _sym(nbr):
    """Symmetrize a directed adjacency into fixed-width rows (pad -1)."""
    n, e = nbr.shape
    rows = [[] for _ in range(n)]
    for u in range(n):
        for v in nbr[u]:
            if v >= 0:
                rows[u].append(v)
                rows[v].append(u)
    width = max(len(r) for r in rows)
    out = np.full((n, width), -1, np.int32)
    for u, r in enumerate(rows):
        out[u, : len(r)] = sorted(set(r))[: width]
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_chain_of_cliques_matches_device(seed):
    # 20 cliques of 12, chained: clique i links to clique i+1 by ONE edge
    # placed LAST in the row (so a narrow slice misses it) — narrow UF sees
    # 20 components, the full graph is one
    rng = np.random.default_rng(seed)
    k, c = 12, 20
    n = k * c
    nbr = np.full((n, k), -1, np.int32)
    for ci in range(c):
        ids = np.arange(ci * k, (ci + 1) * k, dtype=np.int32)
        for j, u in enumerate(ids):
            others = np.delete(ids, j)
            rng.shuffle(others)
            nbr[u, : k - 1] = others[: k - 1]
        if ci + 1 < c:
            nbr[ids[0], k - 1] = (ci + 1) * k  # the bridge, last column
    has = np.ones(n, bool)
    labels, comps = _host_onehot_labels(nbr, has, w=4)
    dev = np.asarray(_cc_labels_device(jnp.asarray(nbr), jnp.asarray(has)))
    # same partition: labels equal up to canonical form (both are min-id)
    assert comps == 1
    np.testing.assert_array_equal(labels, dev)


def test_isolated_components_and_dead_slots():
    # 3 components + invalid slots; narrow width 2 splits one of them
    nbr = np.array(
        [
            [1, 2, 3, -1],   # comp A: 0-1-2-3 (3 reachable only via col 2)
            [0, 2, -1, -1],
            [0, 1, -1, -1],
            [0, -1, -1, -1],
            [5, -1, -1, -1],  # comp B: 4-5
            [4, -1, -1, -1],
            [-1, -1, -1, -1],  # dead slot (invalid)
            [8, -1, -1, -1],  # comp C: 7-8
            [7, -1, -1, -1],
        ],
        np.int32,
    )
    has = np.array([1, 1, 1, 1, 1, 1, 0, 1, 1], bool)
    labels, comps = _host_onehot_labels(nbr, has, w=2)
    dev = np.asarray(_cc_labels_device(jnp.asarray(nbr), jnp.asarray(has)))
    assert comps == 3
    np.testing.assert_array_equal(labels[has], dev[has])
    assert labels[6] == -1  # dead slot keeps the non-node marker


def test_union_pairs_fallback_matches_native():
    rng = np.random.default_rng(7)
    n = 200
    labels = np.arange(n, dtype=np.int32)
    labels[::17] = -1  # some dead slots keep their -1
    dead = labels < 0
    a = rng.integers(0, n, 300).astype(np.int32)
    b = rng.integers(0, n, 300).astype(np.int32)
    a[dead[a]] = 0
    b[dead[b]] = 0
    lab_n, c_n = native.union_pairs(labels, a, b)
    # force the numpy fallback
    import ngt_tpu.native as nat

    old = nat._lib, nat._tried
    nat._lib, nat._tried = None, True
    try:
        lab_f, c_f = native.union_pairs(labels, a, b)
    finally:
        nat._lib, nat._tried = old
    assert c_n == c_f
    np.testing.assert_array_equal(lab_n, lab_f)
