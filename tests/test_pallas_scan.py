"""Parity tests for the fused Pallas bulk-scan kernel (ops/pallas_scan.py).

Run in interpret mode on the CPU backend; the compiled path is exercised on
real TPU by the build benchmark (NGT_TPU_SCAN_IMPL=pallas forces it; the
auto-route engages at n >= 512k on the TPU backend only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ngt_tpu.ops import bruteforce as BF
from ngt_tpu.ops import pallas_scan as PS


def _np_window_ref(q16, x16, ss, window=128):
    """bf16-input window-min reference in numpy (f32 accumulation)."""
    dot = q16.astype(np.float32) @ x16.astype(np.float32).T
    d2 = ss[None, :] - 2.0 * dot
    b, n = d2.shape
    d3 = d2.reshape(b, n // window, window)
    wd = d3.min(-1)
    wi = d3.argmin(-1) + np.arange(n // window)[None, :] * window
    return wd, wi


def test_window_candidates_match_numpy():
    rng = np.random.default_rng(7)
    n, d, b = 4096, 128, 256
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = x[:b]
    ss = (x ** 2).sum(1).astype(np.float32)
    q16 = np.asarray(jnp.asarray(q, jnp.bfloat16))
    x16 = np.asarray(jnp.asarray(x, jnp.bfloat16))
    wd, wi = PS.fused_scan_candidates(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(x, jnp.bfloat16),
        jnp.asarray(ss), chunk=2048, qsub=256, interpret=True,
    )
    rwd, rwi = _np_window_ref(q16, x16, ss)
    np.testing.assert_allclose(np.asarray(wd), rwd, rtol=1e-4, atol=1e-3)
    assert (np.asarray(wi) == rwi).mean() > 0.999


def test_invalid_rows_masked():
    rng = np.random.default_rng(3)
    n, d, b = 2048, 128, 64
    x = rng.standard_normal((n, d)).astype(np.float32)
    ss = (x ** 2).sum(1).astype(np.float32)
    # kill the first window entirely, and one row of the second
    ss[:128] = float(PS.BIG)
    ss[130] = float(PS.BIG)
    wd, wi = PS.fused_scan_candidates(
        jnp.asarray(x[:b], jnp.bfloat16), jnp.asarray(x, jnp.bfloat16),
        jnp.asarray(ss), chunk=2048, qsub=64, interpret=True,
    )
    wd, wi = np.asarray(wd), np.asarray(wi)
    assert (wd[:, 0] >= float(PS.BIG) * 0.5).all()   # dead window stays BIG
    assert (wi[:, 1] != 130).all()                   # masked row never wins


def test_bulk_knn_pallas_self_hit_and_exact_distances():
    """Top-1 of a stored row is itself (distance 0 lives in its own window,
    so the window min always retains it), and every returned distance must
    equal the exact f32 distance of that id (the re-rank is exact)."""
    rng = np.random.default_rng(11)
    n, d, k = 4096, 128, 4
    x = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.ones(n, bool)
    sq = (x ** 2).sum(1).astype(np.float32)
    ids = jnp.arange(64, dtype=jnp.int32)
    pi, pd = BF.fast_knn_l2_bulk(
        ids, jnp.asarray(x), jnp.asarray(valid), jnp.asarray(sq),
        k=k, kc=4 * k, qblock=64, scan_impl="pallas",
    )
    pi, pd = np.asarray(pi), np.asarray(pd)
    assert (pi[:, 0] == np.arange(64)).all()
    np.testing.assert_allclose(pd[:, 0], 0.0, atol=1e-3)
    for qi in range(0, 64, 7):
        for r in range(k):
            true_d = np.sqrt(((x[pi[qi, r]] - x[qi]) ** 2).sum())
            np.testing.assert_allclose(pd[qi, r], true_d, rtol=1e-5,
                                       atol=1e-4)


def test_bulk_knn_pallas_recall_on_dense_data():
    """Window loss is ~C(k,2)*window/N: at n=32768/k=5 the expected loss
    is ~0.8%, so recall must stay high.  (At the production scale of 1M
    the same bound is ~0.06%.)"""
    rng = np.random.default_rng(5)
    n, d, k = 32768, 128, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.ones(n, bool)
    sq = (x ** 2).sum(1).astype(np.float32)
    ids = jnp.arange(256, dtype=jnp.int32)
    gt_i, _ = BF.linear_search(
        jnp.asarray(x[:256]), jnp.asarray(x), jnp.asarray(valid),
        __import__("ngt_tpu.properties", fromlist=["DistanceType"]).DistanceType.L2,
        k,
    )
    pi, _ = BF.fast_knn_l2_bulk(
        ids, jnp.asarray(x), jnp.asarray(valid), jnp.asarray(sq),
        k=k, kc=8 * k, qblock=256, scan_impl="pallas",
    )
    rec = BF.recall_at_k(np.asarray(pi), np.asarray(gt_i), k)
    assert rec >= 0.95, rec


def test_bulk_knn_pallas_with_removed_slots():
    rng = np.random.default_rng(9)
    n, d, k = 2048, 128, 5
    x = rng.standard_normal((n, d)).astype(np.float32)
    valid = np.ones(n, bool)
    valid[100:200] = False
    sq = (x ** 2).sum(1).astype(np.float32)
    ids = jnp.arange(64, dtype=jnp.int32)
    pi, pd = BF.fast_knn_l2_bulk(
        ids, jnp.asarray(x), jnp.asarray(valid), jnp.asarray(sq),
        k=k, kc=4 * k, qblock=64, scan_impl="pallas",
    )
    pi = np.asarray(pi)
    assert ((pi < 100) | (pi >= 200)).all()


def test_build_bulk_pallas_flake_falls_back_to_xla(tmp_path, monkeypatch):
    """The axon runtime rarely flakes a Pallas dispatch with a bare
    INVALID_ARGUMENT JaxRuntimeError that only surfaces at the post-scan
    sync pull.  build_bulk must catch it BEFORE any graph state exists,
    redo the whole scan on the XLA path, and end up with exactly the index
    an XLA-only build produces."""
    import ngt_tpu

    rng = np.random.default_rng(33)
    data = rng.standard_normal((2048, 128)).astype(np.float32)

    monkeypatch.setenv("NGT_TPU_SCAN_IMPL", "xla")
    ref = ngt_tpu.create(str(tmp_path / "ref"), dimension=128)
    ref.batch_insert(data, build=True)

    # the fresh-build sync pulls a 0-d int32 (all_i[0, 0]); flake exactly
    # that first pull, pass everything else through untouched
    monkeypatch.setenv("NGT_TPU_SCAN_IMPL", "pallas")
    real_get = jax.device_get
    state = {"armed": True}

    def flaky_get(tree):
        if (
            state["armed"]
            and isinstance(tree, jax.Array)
            and tree.shape == ()
            and tree.dtype == jnp.int32
        ):
            state["armed"] = False
            raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: test flake")
        return real_get(tree)

    monkeypatch.setattr(jax, "device_get", flaky_get)
    idx = ngt_tpu.create(str(tmp_path / "flaky"), dimension=128)
    idx.batch_insert(data, build=True)
    monkeypatch.setattr(jax, "device_get", real_get)

    assert not state["armed"], "the injected flake never fired"
    assert idx.verify() == []
    n = ref.graph.node_count()
    assert idx.graph.node_count() == n
    np.testing.assert_array_equal(
        idx.graph.nbr_ids[: n + 1], ref.graph.nbr_ids[: n + 1]
    )
    np.testing.assert_array_equal(
        idx.graph.degree[: n + 1], ref.graph.degree[: n + 1]
    )


def test_build_bulk_end_to_end_with_pallas_scan(tmp_path, monkeypatch):
    """Full bulk build routed through the Pallas scan (interpret mode on
    CPU): the index must be structurally sound and searchable.  Window
    loss at small n is material (~1 of k+1 candidates per row), so the
    assertions are structural + recall-banded, not exact-parity."""
    import ngt_tpu

    monkeypatch.setenv("NGT_TPU_SCAN_IMPL", "pallas")
    rng = np.random.default_rng(21)
    data = rng.standard_normal((2048, 128)).astype(np.float32)
    idx = ngt_tpu.create(str(tmp_path / "pidx"), dimension=128)
    idx.batch_insert(data, build=True)
    assert idx.verify() == []
    ids, _ = idx.batch_search(data[::64], size=10, epsilon=0.1)
    assert (np.asarray(ids)[:, 0] == np.arange(0, 2048, 64)).all()
    gt, _ = idx.batch_linear_search(data[::64], size=10)
    rec = BF.recall_at_k(np.asarray(ids), np.asarray(gt), 10)
    assert rec >= 0.85, rec
