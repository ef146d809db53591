"""Quantization: k-means, PQ codec, quantized-graph search."""

import os

import jax
import numpy as np
import pytest

import ngt_tpu
from ngt_tpu.ops.bruteforce import recall_at_k
from ngt_tpu.quant.clustering import kmeans, kmeans_multi, mean_squared_error
from ngt_tpu.quant.pq import ProductQuantizer
from ngt_tpu.quant.qgraph import QuantizedGraphIndex


def test_kmeans_separable(rng):
    # 4 well-separated blobs must be recovered
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    x = np.concatenate(
        [c + rng.normal(scale=0.3, size=(50, 2)).astype(np.float32) for c in centers]
    )
    cents, assign = kmeans(x, 4, iters=20)
    mse = mean_squared_error(x, cents, assign)
    assert mse < 0.5
    # each blob maps to exactly one cluster
    for blob in range(4):
        labels = assign[blob * 50 : (blob + 1) * 50]
        assert len(set(labels.tolist())) == 1


def test_kmeans_multi_matches_single(rng):
    xs = rng.normal(size=(4, 200, 8)).astype(np.float32)
    cents, assign = kmeans_multi(xs, 16, iters=10, seed=3)
    assert cents.shape == (4, 16, 8)
    for m in range(4):
        mse = mean_squared_error(xs[m], cents[m], assign[m])
        base = (xs[m] ** 2).sum(1).mean()
        assert mse < base  # quantization reduces energy


def test_pq_roundtrip_error(rng):
    x = rng.normal(size=(500, 32)).astype(np.float32)
    pq = ProductQuantizer(32, dsub=2, ksub=16).fit(x)
    codes = pq.encode(x)
    assert codes.shape == (500, 16) and codes.dtype == np.uint8
    assert codes.max() < 16
    rec = pq.decode(codes)
    rel = ((x - rec) ** 2).sum() / (x**2).sum()
    assert rel < 0.35, f"relative PQ error {rel}"


def test_pq_lut_matches_decode(rng):
    x = rng.normal(size=(300, 16)).astype(np.float32)
    q = rng.normal(size=(5, 16)).astype(np.float32)
    pq = ProductQuantizer(16, dsub=2, ksub=16).fit(x)
    codes = pq.encode(x)
    lut = np.asarray(pq.lut(q))  # [B, M, K]
    # ADC distance via LUT == distance to decoded vector
    approx = lut[
        np.arange(5)[:, None, None],
        np.arange(pq.m)[None, :, None],
        codes[None, :, :].transpose(0, 2, 1),
    ]
    # approx: [B, M, N] -> sum over M
    adc = approx.sum(axis=1)
    dec = pq.decode(codes)
    want = ((q[:, None, :] - dec[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(adc, want, rtol=2e-3, atol=2e-3)


@pytest.fixture(scope="module")
def qg_setup():
    # clustered data (real embeddings have local structure; uniform gaussian
    # is the PQ worst case and not representative)
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(20, 32)).astype(np.float32) * 4
    data = (
        centers[rng.integers(0, 20, size=2000)]
        + rng.normal(size=(2000, 32)).astype(np.float32)
    )
    queries = (
        centers[rng.integers(0, 20, size=48)]
        + rng.normal(size=(48, 32)).astype(np.float32)
    )
    idx = ngt_tpu.create(None, dimension=32)
    idx.batch_insert(data, build=True)
    qg = QuantizedGraphIndex.quantize(idx, dsub=2, ksub=16)
    return idx, qg, data, queries


def test_quantized_graph_recall(qg_setup):
    idx, qg, data, queries = qg_setup
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    # tight synthetic clusters are the ADC worst case — result_expansion is
    # the recall knob (reference default 3.0, bin/ngtqg/README.md:62-69)
    ids, dists = qg.batch_search(
        queries, size=10, epsilon=0.1, result_expansion=6.0
    )
    rec = recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10)
    assert rec >= 0.85, f"NGTQG-style recall {rec}"
    # distances are exact after re-rank
    j = np.asarray(ids)[0, 0]
    want = np.linalg.norm(queries[0] - data[j])
    np.testing.assert_allclose(dists[0, 0], want, rtol=1e-3)


def test_quantized_graph_recall_sift(sift5k):
    """NGTQG-style search on the canonical SIFT corpus: recall@10 >= 0.9 at
    the reference's default operating point."""
    data = sift5k[:3000]
    rng = np.random.default_rng(3)
    queries = data[rng.choice(len(data), 32, replace=False)] + np.float32(0.5)
    idx = ngt_tpu.create(None, dimension=128)
    idx.batch_insert(data, build=True)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    qg = QuantizedGraphIndex.quantize(idx, dsub=2, ksub=16)
    ids, _ = qg.batch_search(queries, size=10, epsilon=0.1,
                             result_expansion=3.0)
    rec = recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10)
    assert rec >= 0.9, f"SIFT NGTQG recall {rec}"


def test_quantized_graph_expansion_tradeoff(qg_setup):
    idx, qg, data, queries = qg_setup
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    r1 = recall_at_k(
        np.asarray(qg.batch_search(queries, 10, 0.1, result_expansion=1.0)[0]),
        np.asarray(gt_ids), 10,
    )
    r3 = recall_at_k(
        np.asarray(qg.batch_search(queries, 10, 0.1, result_expansion=3.0)[0]),
        np.asarray(gt_ids), 10,
    )
    assert r3 >= r1


def test_quantized_graph_single_and_persist(qg_setup, tmp_path):
    idx, qg, data, queries = qg_setup
    res = qg.search(data[77], size=5)
    assert res[0][0] == 77 and res[0][1] < 1e-3
    path = os.path.join(tmp_path, "qgidx")
    qg.save(path)
    qg2 = QuantizedGraphIndex.open(path)
    res2 = qg2.search(data[77], size=5)
    assert res2[0][0] == 77


def test_pack_codes4_roundtrip(rng):
    from ngt_tpu.quant.pq import pack_codes4, unpack_codes4

    for m in (8, 9, 64):
        codes = rng.integers(0, 16, size=(37, m)).astype(np.uint8)
        packed = pack_codes4(codes)
        assert packed.shape == (37, (m + 1) // 2)
        np.testing.assert_array_equal(unpack_codes4(packed, m), codes)


def test_search_mode_auto_routing(rng):
    """Index.batch_search auto-routes through the sq8 mirror (search_mode),
    keeping recall, and the mirror tracks post-quantize inserts."""
    data = rng.normal(size=(1200, 24)).astype(np.float32)
    queries = rng.normal(size=(32, 24)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=24, search_mode="qg")
    idx.batch_insert(data, build=True)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    ids, dists = idx.batch_search(queries, size=10, epsilon=0.1)
    assert idx._qg is not None, "routing did not build the sq8 mirror"
    rec = recall_at_k(np.asarray(ids), np.asarray(gt_ids), 10)
    assert rec >= 0.9, f"routed recall {rec}"
    # distances are exact (re-ranked), not quantized
    j = int(np.asarray(ids)[0, 0])
    want = float(np.linalg.norm(queries[0] - data[j]))
    np.testing.assert_allclose(float(dists[0, 0]), want, rtol=1e-3)
    # post-quantize insert: codes must refresh, not stay zero
    new = rng.normal(size=(24,)).astype(np.float32) * 0.01
    nid = idx.insert(new)
    idx.build_index()
    res = idx.search(new, size=3, epsilon=0.1)
    assert res[0][0] == nid
    # opt-out returns the exact path
    idx.prop.search_mode = "exact"
    ids2, _ = idx.batch_search(queries, size=10, epsilon=0.1)
    rec2 = recall_at_k(np.asarray(ids2), np.asarray(gt_ids), 10)
    assert rec2 >= 0.9


@pytest.fixture(scope="module")
def fused_setup():
    """ONE 1500x24 routed index shared by the fused-dispatch tests (they
    are search-only A/Bs; per-test builds were half the file's wall time)."""
    rng = np.random.default_rng(42)
    data = rng.normal(size=(1500, 24)).astype(np.float32)
    queries = rng.normal(size=(32, 24)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=24, search_mode="qg")
    idx.batch_insert(data, build=True)
    return idx, data, queries


def test_sq8_fused_matches_eager(fused_setup, monkeypatch):
    """The fused sq8 program (seed select + traversal + rerank in ONE device
    program) must return the same results as the eager route it replaced —
    NGT_TPU_QG_NO_FUSE=1 forces the eager path for the A/B."""
    idx, data, queries = fused_setup
    ids_f, d_f = idx.batch_search(queries, size=10, epsilon=0.1)
    monkeypatch.setenv("NGT_TPU_QG_NO_FUSE", "1")
    ids_e, d_e = idx.batch_search(queries, size=10, epsilon=0.1)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_e), rtol=1e-5)
    assert (np.asarray(ids_f) == np.asarray(ids_e)).mean() > 0.99  # ties only


def test_sq8_fused_flake_falls_back_to_eager(fused_setup, monkeypatch):
    """A JaxRuntimeError from the fused dispatch (the rare axon runtime
    flake) must not fail the search: batch_search redoes the batch on the
    eager path and returns its results."""
    from ngt_tpu.quant import qgraph as QG

    idx, data, queries = fused_setup
    ids_f, d_f = idx.batch_search(queries, size=10, epsilon=0.1)

    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: test flake")

    monkeypatch.setattr(QG, "_qg_fused_search", boom)
    ids_e, d_e = idx.batch_search(queries, size=10, epsilon=0.1)
    assert calls["n"] == 1
    np.testing.assert_allclose(np.asarray(d_e), np.asarray(d_f), rtol=1e-5)
    assert (np.asarray(ids_e) == np.asarray(ids_f)).mean() > 0.99


def test_sq8_fused_oom_shrinks_blocks(rng, monkeypatch):
    """RESOURCE_EXHAUSTED from the fused dispatch (shared-chip HBM
    pressure) must shrink the neighbor-block width and retry, not fail
    the search."""
    from ngt_tpu.quant import qgraph as QG

    data = rng.normal(size=(1500, 24)).astype(np.float32)
    queries = rng.normal(size=(16, 24)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=24, search_mode="qg",
                         edge_size_for_creation=40)
    idx.batch_insert(data, build=True)
    qg = idx._maybe_qg()
    eb0 = qg._effective_block_edges()
    assert eb0 > 16
    real = QG._qg_fused_search
    calls = {"n": 0}

    def oom_once(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise jax.errors.JaxRuntimeError(
                "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)"
            )
        return real(*a, **k)

    monkeypatch.setattr(QG, "_qg_fused_search", oom_once)
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.1)
    assert calls["n"] == 2
    assert qg._effective_block_edges() == max(16, eb0 // 2)
    # subsequent searches run at the shrunken width with identical results
    ids2, _ = idx.batch_search(queries, size=10, epsilon=0.1)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))


def test_auto_route_oom_falls_back_to_exact(rng, monkeypatch):
    """When the sq8 mirror cannot fit in free device HBM at all (shared
    chip), Index.batch_search serves the call on the exact path and
    cools down the routing instead of failing."""
    data = rng.normal(size=(1500, 24)).astype(np.float32)
    queries = rng.normal(size=(16, 24)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=24, search_mode="qg")
    idx.batch_insert(data, build=True)
    qg = idx._maybe_qg()
    # populate the mirror's device tensors with one successful routed search
    idx.batch_search(queries[:4], size=5, epsilon=0.1)
    assert qg._codes_dev is not None

    def boom(*a, **k):
        raise jax.errors.JaxRuntimeError(
            "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)"
        )

    monkeypatch.setattr(qg, "batch_search", boom)
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.1)
    # the fallback must have freed the mirror's device buffers — the chip
    # is out of HBM at that point and the exact path needs the room
    assert qg._codes_dev is None and qg._blocks_dev is None
    idx.prop.search_mode = "exact"
    ids_e, _ = idx.batch_search(queries, size=10, epsilon=0.1)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids_e))
    # routing stays cooled down, then resumes
    idx.prop.search_mode = "qg"
    assert idx._maybe_qg() is None
    idx._qg_cooldown_until = 0.0
    assert idx._maybe_qg() is qg


def test_sq8_fused_chunked_matches_unchunked(fused_setup, monkeypatch):
    """Chunked dispatch (upload/compute pipelining) must return exactly the
    whole-batch results — including the row-padded final chunk."""
    idx, data, _ = fused_setup
    rng = np.random.default_rng(7)
    queries = rng.normal(size=(100, 24)).astype(np.float32)  # 3 chunks + pad
    ids_u, d_u = idx.batch_search(queries, size=10, epsilon=0.1)
    monkeypatch.setenv("NGT_TPU_QG_CHUNK", "48")
    ids_c, d_c = idx.batch_search(queries, size=10, epsilon=0.1)
    np.testing.assert_allclose(np.asarray(d_c), np.asarray(d_u), rtol=1e-5)
    assert (np.asarray(ids_c) == np.asarray(ids_u)).mean() > 0.99


def test_sq8_fused_q16_upload(fused_setup, monkeypatch):
    """NGT_TPU_QG_Q16=1 ships queries as f16 over the link; the fused
    program widens back to f32 before any contraction, so results must
    stay within f16-rounding of the f32 upload (recall-equivalent)."""
    idx, data, queries = fused_setup
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    ids_f, d_f = idx.batch_search(queries, size=10, epsilon=0.1)
    monkeypatch.setenv("NGT_TPU_QG_Q16", "1")
    ids_h, d_h = idx.batch_search(queries, size=10, epsilon=0.1)
    # f16 mantissa loss perturbs distances ~1e-3 relatively; ranking of
    # the re-ranked top-10 must stay essentially identical
    assert (np.asarray(ids_h) == np.asarray(ids_f)).mean() > 0.95
    rec = recall_at_k(np.asarray(ids_h), np.asarray(gt_ids), 10)
    rec_f = recall_at_k(np.asarray(ids_f), np.asarray(gt_ids), 10)
    assert rec >= rec_f - 0.02
    # overflow guard: a component beyond the f16 range (would become inf
    # and poison the seed matmul) keeps that batch's upload f32
    big = queries.copy()
    big[0, 0] = 1.0e6
    ids_b16, _ = idx.batch_search(big, size=10, epsilon=0.1)  # q16 still set
    monkeypatch.delenv("NGT_TPU_QG_Q16")
    ids_b32, _ = idx.batch_search(big, size=10, epsilon=0.1)
    np.testing.assert_array_equal(np.asarray(ids_b16), np.asarray(ids_b32))


def test_sq8_fused_cosine(rng, monkeypatch):
    """Fused path on a normalized metric: queries are normalized in-program
    (normalize_q) and must match the eager route."""
    data = rng.normal(size=(1200, 24)).astype(np.float32)
    queries = rng.normal(size=(24, 24)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=24, distance_type="Cosine",
                         search_mode="qg")
    idx.batch_insert(data, build=True)
    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    ids_f, d_f = idx.batch_search(queries, size=10, epsilon=0.1)
    rec = recall_at_k(np.asarray(ids_f), np.asarray(gt_ids), 10)
    assert rec >= 0.9, f"fused cosine recall {rec}"
    monkeypatch.setenv("NGT_TPU_QG_NO_FUSE", "1")
    ids_e, d_e = idx.batch_search(queries, size=10, epsilon=0.1)
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_e), rtol=1e-5)


def test_pq4_fused_matches_eager_with_refine(rng, monkeypatch):
    """pq4 through the PRODUCTION path (fused chunked dispatch + edge-tail
    refinement): must match the eager route bit-for-bit and beat the
    unrefined pass — same guarantees the sq8 path has (VERDICT round-3
    missing #1: pq4 was excluded from the fused/refine stages)."""
    from ngt_tpu.quant.qgraph import QuantizedGraphIndex

    # modest center spread: PQ distortion scales with total per-cell
    # variance while neighbor distances scale with the within-cluster noise,
    # so huge center scales make ANY 4-bit code rank-blind (the clone-corpus
    # effect, BASELINE.md round 2j)
    centers = rng.normal(size=(30, 32)).astype(np.float32) * 3
    data = (
        centers[rng.integers(0, 30, size=2500)]
        + rng.normal(size=(2500, 32)).astype(np.float32)
    )
    queries = (
        centers[rng.integers(0, 30, size=48)]
        + rng.normal(size=(48, 32)).astype(np.float32)
    )
    idx = ngt_tpu.create(None, dimension=32, edge_size_for_creation=24)
    idx.batch_insert(data, build=True)
    gt, _ = idx.batch_linear_search(queries, size=10)
    qg = QuantizedGraphIndex.quantize(idx, mode="pq4")
    # narrow blocks so the adjacency holds a TAIL for the refine stage
    qg.block_edges = 16
    assert idx._ensure_mirror().nbr.shape[1] > 16
    # wide op point: the synthetic cluster-center spread dominates per-cell
    # variance (PQ's worst case — BASELINE.md notes real corpora behave far
    # better); the test pins PARITY and refine monotonicity, the production
    # recall claims are pinned by the TPU bench at 1M/4M
    kw = dict(size=10, epsilon=0.1, result_expansion=6.0)
    ids_f, d_f = qg.batch_search(queries, **kw)
    monkeypatch.setenv("NGT_TPU_QG_NO_FUSE", "1")
    ids_e, d_e = qg.batch_search(queries, **kw)
    monkeypatch.delenv("NGT_TPU_QG_NO_FUSE")
    np.testing.assert_allclose(np.asarray(d_f), np.asarray(d_e), rtol=1e-5)
    assert (np.asarray(ids_f) == np.asarray(ids_e)).mean() > 0.99
    # refine must engage and not lose recall vs the unrefined pass
    idx.prop.search_refine = 0
    ids_0, _ = qg.batch_search(queries, **kw)
    idx.prop.search_refine = 32
    rec_f = recall_at_k(np.asarray(ids_f), np.asarray(gt), 10)
    rec_0 = recall_at_k(np.asarray(ids_0), np.asarray(gt), 10)
    assert rec_f >= rec_0
    assert rec_f >= 0.8, f"pq4 refined recall {rec_f}"


def test_pick_mode_budget(monkeypatch):
    """Auto block-format selection: sq8 while the HBM budget admits
    >= SQ8_MIN_EB block columns, pq4 beyond (the reference's analogous
    scale switch is NGT_LARGE_DATASET at 5M, Graph.h:287-380)."""
    from ngt_tpu.quant.qgraph import QuantizedGraphIndex as QGI

    monkeypatch.setenv("NGT_TPU_QG_BLOCK_GB", "6")
    assert QGI.pick_mode(1 << 20, 128) == "sq8"    # eb=48 at 1M
    assert QGI.pick_mode(2 << 20, 128) == "sq8"    # eb=25 at 2M
    # narrow sq8 + tail refine beats pq4 on clone-heavy data (round-4 A/B)
    # so sq8 holds down to the eb=8 floor: 4M (eb=12) stays sq8
    assert QGI.pick_mode(4 << 20, 128) == "sq8"
    assert QGI.pick_mode(16 << 20, 128) == "pq4"   # eb=3 < floor -> pq4
    # unpackable dims stay sq8
    assert QGI.pick_mode(16 << 20, 129) == "sq8"
    monkeypatch.setenv("NGT_TPU_QG_BLOCK_GB", "1")
    assert QGI.pick_mode(4 << 20, 128) == "pq4"    # eb=2 under a 1 GiB cap


def test_auto_route_picks_pq4_when_budget_tight(rng, monkeypatch):
    """Index.batch_search auto-routing builds a pq4 mirror when the sq8
    block budget is too tight (the 4M+ single-chip regime, reproduced here
    by shrinking NGT_TPU_QG_BLOCK_GB)."""
    centers = rng.normal(size=(24, 32)).astype(np.float32) * 3
    data = (
        centers[rng.integers(0, 24, size=2000)]
        + rng.normal(size=(2000, 32)).astype(np.float32)
    )
    queries = (
        centers[rng.integers(0, 24, size=32)]
        + rng.normal(size=(32, 32)).astype(np.float32)
    )
    # 2048 rows x 128 d_pad: budget 0.001 GiB -> eb_sq8 = 4 < 24 -> pq4
    monkeypatch.setenv("NGT_TPU_QG_BLOCK_GB", "0.001")
    idx = ngt_tpu.create(None, dimension=32, search_mode="qg",
                         edge_size_for_creation=24)
    idx.batch_insert(data, build=True)
    gt, _ = idx.batch_linear_search(queries, size=10)
    idx.prop.result_expansion = 6.0   # PQ worst-case synthetic corpus (see
    ids, _ = idx.batch_search(queries, size=10, epsilon=0.1)  # refine test)
    assert idx._qg is not None and idx._qg.mode == "pq4"
    rec = recall_at_k(np.asarray(ids), np.asarray(gt), 10)
    assert rec >= 0.8, f"auto-routed pq4 recall {rec}"


# ---------------------------------------------------------------- IVF+PQ ----


@pytest.fixture(scope="module")
def ivf_setup():
    rng = np.random.default_rng(21)
    centers = rng.normal(size=(30, 24)).astype(np.float32) * 4
    data = (
        centers[rng.integers(0, 30, size=3000)]
        + rng.normal(size=(3000, 24)).astype(np.float32)
    )
    queries = (
        centers[rng.integers(0, 30, size=32)]
        + rng.normal(size=(32, 24)).astype(np.float32)
    )
    from ngt_tpu.quant.ivfpq import IVFPQIndex

    ivf = IVFPQIndex(24, n_centroids=64, dsub=2, ksub=16)
    ivf.batch_insert(data)
    ivf.build()
    return ivf, data, queries


def test_ivfpq_recall(ivf_setup):
    ivf, data, queries = ivf_setup
    assert ivf.verify() == []
    full = np.linalg.norm(queries[:, None, :] - data[None, :, :], axis=-1)
    gt = np.argsort(full, axis=1)[:, :10]
    ids, dists = ivf.batch_search(queries, size=10, nprobe=16, mode="refine")
    rec = recall_at_k(ids, gt, 10)
    assert rec >= 0.9, f"IVF+PQ recall {rec}"
    # refined distances are exact
    want = full[0, ids[0, 0]]
    np.testing.assert_allclose(dists[0, 0], want, rtol=1e-3)


def test_ivfpq_nprobe_tradeoff(ivf_setup):
    ivf, data, queries = ivf_setup
    full = np.linalg.norm(queries[:, None, :] - data[None, :, :], axis=-1)
    gt = np.argsort(full, axis=1)[:, :10]
    r2 = recall_at_k(ivf.batch_search(queries, 10, nprobe=2)[0], gt, 10)
    r16 = recall_at_k(ivf.batch_search(queries, 10, nprobe=16)[0], gt, 10)
    assert r16 >= r2


def test_ivfpq_approx_mode(ivf_setup):
    ivf, data, queries = ivf_setup
    ids, dists = ivf.batch_search(queries, size=10, nprobe=16, mode="approx")
    full = np.linalg.norm(queries[:, None, :] - data[None, :, :], axis=-1)
    gt = np.argsort(full, axis=1)[:, :10]
    assert recall_at_k(ids, gt, 10) >= 0.7  # approximate-only mode


def test_ivfpq_aggregation_modes(ivf_setup):
    """The reference's AggregationModes (Quantizer.h:2266-2549): exact
    scores every probed record; refine >= approx; lut/cached-lut coincide
    with approx on TPU by construction."""
    ivf, data, queries = ivf_setup
    full = np.linalg.norm(queries[:, None, :] - data[None, :, :], axis=-1)
    gt = np.argsort(full, axis=1)[:, :10]
    recs = {}
    for mode in ("approx", "lut", "cached-lut", "refine", "exact"):
        ids, dists = ivf.batch_search(queries, size=10, nprobe=16, mode=mode)
        recs[mode] = recall_at_k(ids, gt, 10)
    assert recs["lut"] == recs["approx"] == recs["cached-lut"]
    assert recs["refine"] >= recs["approx"]
    assert recs["exact"] >= recs["refine"] - 0.01
    # exact mode distances are true metric distances
    ids, dists = ivf.batch_search(queries, size=10, nprobe=16, mode="exact")
    np.testing.assert_allclose(dists[0, 0], full[0, ids[0, 0]], rtol=1e-3)


def test_ivfpq_incremental_insert(ivf_setup):
    """Insert after build() assigns to EXISTING centroids without retrain
    (Quantizer.h:1895-1959); rebuild() retrains at capacity."""
    from ngt_tpu.quant.ivfpq import IVFPQIndex

    rng = np.random.default_rng(31)
    data = rng.normal(size=(2000, 24)).astype(np.float32) * 2
    ivf = IVFPQIndex(24, n_centroids=32, rebuild_factor=2.0)
    ivf.batch_insert(data)
    ivf.build()
    cents_before = ivf.centroids.copy()
    extra = rng.normal(size=(500, 24)).astype(np.float32) * 2
    ivf.batch_insert(extra)
    assert ivf.size == 2500
    # no retrain happened: trained centroids are immutable (dynamic mode may
    # APPEND for out-of-range rows — the reference's insert-time growth —
    # but never moves or retrains the existing set)
    np.testing.assert_array_equal(
        ivf.centroids[: len(cents_before)], cents_before
    )
    assert not ivf.needs_rebuild()
    assert ivf.verify() == []
    # the new objects are findable
    ids, _ = ivf.batch_search(extra[:8], size=1, nprobe=8)
    assert (ids[:, 0] >= 2000).mean() >= 0.9
    # growth past rebuild_factor flags a rebuild; rebuild() retrains
    ivf.batch_insert(rng.normal(size=(2000, 24)).astype(np.float32) * 2)
    assert ivf.needs_rebuild()
    ivf.rebuild()
    assert not ivf.needs_rebuild()
    assert ivf.verify() == []
    assert ivf.size == 4500


def test_ivfpq_memory_and_audit(ivf_setup):
    ivf, data, queries = ivf_setup
    rep = ivf.memory_report()
    # packed 4-bit codes: half a byte per subspace code
    assert rep["codes_bytes"] == ivf.size * ((ivf.pq.m + 1) // 2)
    audit = ivf.quantization_error(sample=256)
    assert 0 < audit["relative_error"] < 0.5


def test_ivfpq_persist(ivf_setup, tmp_path):
    from ngt_tpu.quant.ivfpq import IVFPQIndex

    ivf, data, queries = ivf_setup
    p = os.path.join(tmp_path, "ivf")
    ivf.save(p)
    ivf2 = IVFPQIndex.open(p)
    assert ivf2.verify() == []
    a, _ = ivf.batch_search(queries[:4], size=5)
    b, _ = ivf2.batch_search(queries[:4], size=5)
    np.testing.assert_array_equal(a, b)


def test_ivfpq_mmap_spill(ivf_setup, tmp_path):
    """raw_store='mmap' spills pending inserts straight to the raw file
    (no host-RAM accumulation: at 100M rows the old pending list held
    51 GB), and build/rebuild stream it back in chunks.  Results must be
    identical to the in-RAM raw_store='host' path."""
    from ngt_tpu.quant.ivfpq import IVFPQIndex

    ref, data, queries = ivf_setup
    raw = os.path.join(tmp_path, "raw.f32")
    ivf = IVFPQIndex(24, n_centroids=64, dsub=2, ksub=16,
                     raw_store="mmap", raw_path=raw)
    # multi-batch pre-build insert: rows land in the file, not in RAM
    for s in range(0, len(data), 700):
        ivf.batch_insert(data[s : s + 700])
    assert ivf._pending == []
    assert ivf.size == len(data)
    assert os.path.getsize(raw) == data.nbytes
    ivf.build()
    assert ivf.verify() == []
    # identical build inputs -> identical centroids/codes as the host path
    np.testing.assert_array_equal(ivf.centroids, ref.centroids)
    np.testing.assert_array_equal(ivf._codes, ref._codes)
    a, _ = ref.batch_search(queries, size=10, nprobe=16, mode="refine")
    b, _ = ivf.batch_search(queries, size=10, nprobe=16, mode="refine")
    np.testing.assert_array_equal(a, b)
    # post-build insert flushes through the file too
    rng = np.random.default_rng(5)
    extra = rng.normal(size=(64, 24)).astype(np.float32)
    ivf.batch_insert(extra)
    assert ivf._pending == [] and ivf.size == len(data) + 64
    ids, _ = ivf.batch_search(extra[:8], size=1, nprobe=16)
    assert (ids[:, 0] >= len(data)).mean() >= 0.9
    # rebuild streams from the file (nothing re-materialized in RAM)
    ivf.rebuild()
    assert ivf.verify() == []
    assert ivf.size == len(data) + 64
    # persistence round-trip keeps the mmap wiring
    p = os.path.join(tmp_path, "ivf_mmap")
    ivf.save(p)
    re = IVFPQIndex.open(p)
    assert re.verify() == []
    c, _ = ivf.batch_search(queries[:4], size=5, mode="refine")
    d, _ = re.batch_search(queries[:4], size=5, mode="refine")
    np.testing.assert_array_equal(c, d)


def test_ivfpq_remove_compress(tmp_path):
    """remove() tombstones by stable external id (ngtq remove,
    NGTQCommand.h:430-496); compress() reclaims rows while preserving ids
    (NGTQ::Index::compress, Quantizer.h:2747-2760); rebuild() never
    resurrects tombstones."""
    from ngt_tpu.quant.ivfpq import IVFPQIndex

    rng = np.random.default_rng(7)
    data = rng.normal(size=(1500, 24)).astype(np.float32)
    queries = data[:16] + 0.01 * rng.normal(size=(16, 24)).astype(np.float32)
    ivf = IVFPQIndex(24, n_centroids=32, dsub=2, ksub=16)
    ivf.batch_insert(data)
    ivf.build()
    ids0, _ = ivf.batch_search(queries, size=5, nprobe=32)
    assert (ids0[:, 0] == np.arange(16)).all()
    # tombstoned records vanish from every aggregation mode
    assert ivf.remove(np.arange(16)) == 16
    assert ivf.live_size == len(data) - 16 and ivf.size == len(data)
    for mode in ("refine", "approx", "exact"):
        ids1, _ = ivf.batch_search(queries, size=5, nprobe=32, mode=mode)
        assert not np.isin(ids1, np.arange(16)).any(), mode
    assert ivf.verify() == []
    # double-remove raises; force skips the dead one and removes the live
    with pytest.raises(ValueError):
        ivf.remove([0])
    # duplicate ids within ONE call count (and tombstone) once
    assert ivf.remove([17, 17]) == 1
    assert ivf.live_size == len(data) - 17
    assert ivf.remove([0, 16], force=True) == 1
    # compress physically reclaims; external ids and results are unchanged
    before, bd = ivf.batch_search(queries, size=5, nprobe=32)
    assert ivf.compress() == 18
    assert ivf.size == len(data) - 18 and ivf._raw.shape[0] == ivf.size
    after, ad = ivf.batch_search(queries, size=5, nprobe=32)
    np.testing.assert_array_equal(before, after)
    np.testing.assert_allclose(bd, ad, rtol=1e-5)
    assert ivf.verify() == []
    # persistence round-trips tombstones + ids
    ivf.remove([20])
    p = os.path.join(tmp_path, "ivf_rm")
    ivf.save(p)
    re = IVFPQIndex.open(p)
    assert re.live_size == ivf.live_size
    a, _ = ivf.batch_search(queries[:4], size=5, nprobe=32)
    b, _ = re.batch_search(queries[:4], size=5, nprobe=32)
    np.testing.assert_array_equal(a, b)
    # new inserts get FRESH ids past every id ever assigned
    re.batch_insert(data[:2])
    ids2, _ = re.batch_search(data[:1], size=1, nprobe=32)
    assert ids2[0, 0] >= len(data)
    # rebuild reclaims tombstones, keeps ids strictly increasing
    re.rebuild()
    assert re.verify() == []
    assert (np.diff(re._ids) > 0).all()
    ids3, _ = re.batch_search(data[:1], size=1, nprobe=32)
    assert ids3[0, 0] == ids2[0, 0]


def test_ivfpq_remove_compress_mmap(tmp_path):
    """The mmap raw store compacts via tmp-write + rename (the reference's
    ivt-tmp dance, Quantizer.h:2747-2760) and stays consistent."""
    from ngt_tpu.quant.ivfpq import IVFPQIndex

    rng = np.random.default_rng(11)
    data = rng.normal(size=(900, 24)).astype(np.float32)
    raw = os.path.join(tmp_path, "raw.f32")
    ivf = IVFPQIndex(24, n_centroids=16, dsub=2, ksub=16,
                     raw_store="mmap", raw_path=raw)
    ivf.batch_insert(data)
    ivf.build()
    assert ivf.remove(np.arange(100)) == 100
    assert ivf.compress() == 100
    assert os.path.getsize(raw) == (900 - 100) * 24 * 4
    assert ivf.verify() == []
    ids, _ = ivf.batch_search(data[100:108], size=1, nprobe=16)
    np.testing.assert_array_equal(ids[:, 0], np.arange(100, 108))


def test_ivfpq_dimension_check():
    from ngt_tpu.quant.ivfpq import IVFPQIndex

    ivf = IVFPQIndex(24)
    with pytest.raises(ValueError):
        ivf.batch_insert(np.zeros((5, 7), np.float32))


def _lowrank_angular(n=6000, d=48, n_q=96, rank=12, seed=3):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(rank, d)).astype(np.float32)
    x = (rng.normal(size=(n, rank)).astype(np.float32) @ A
         + rng.normal(size=(n, d)).astype(np.float32) * 0.3)
    q = (rng.normal(size=(n_q, rank)).astype(np.float32) @ A
         + rng.normal(size=(n_q, d)).astype(np.float32) * 0.3)
    return x, q


@pytest.mark.parametrize("metric", ["Cosine", "Angle"])
def test_angular_bulk_build_metric_distances(metric):
    """The angular bf16 fast scan (build_bulk) must store TRUE metric
    distances: cosine distance = |a-b|^2/2 and angle = acos(1-|a-b|^2/2)
    on unit rows (graph/build.py _l2_to_metric)."""
    import ngt_tpu

    x, q = _lowrank_angular(n=2000)
    idx = ngt_tpu.create(None, dimension=x.shape[1], distance_type=metric,
                         edge_size_for_creation=20)
    idx.batch_insert(x, build=True)
    nbr = idx.graph.nbr_ids[1]
    nbrd = idx.graph.nbr_dist[1]
    x0 = x[0]
    for t, dv in zip(nbr[:5], nbrd[:5]):
        if t < 0:
            continue
        xt = x[t - 1]  # internal ids are 1-based
        cos = float(x0 @ xt / (np.linalg.norm(x0) * np.linalg.norm(xt)))
        true = (1.0 - cos) if metric == "Cosine" else float(
            np.arccos(np.clip(cos, -1.0, 1.0))
        )
        assert abs(true - dv) < 1e-3


@pytest.fixture(scope="module")
def angular_setup():
    """ONE 12k cosine index + exact-traversal baseline shared by the sq8
    and pq4 rank-faithfulness params (the build dominated the file's wall
    time when each param rebuilt it)."""
    import ngt_tpu
    from ngt_tpu.ops.bruteforce import recall_at_k

    x, q = _lowrank_angular()
    idx = ngt_tpu.create(None, dimension=x.shape[1], distance_type="Cosine",
                         edge_size_for_creation=24)
    idx.batch_insert(x, build=True)
    gt, _ = idx.batch_linear_search(q, size=10)
    idx.prop.search_mode = "exact"
    ids_e, _ = idx.batch_search(q, size=10, epsilon=0.1)
    rec_e = recall_at_k(np.asarray(ids_e), np.asarray(gt), 10)
    return idx, q, np.asarray(gt), rec_e


@pytest.mark.parametrize("mode", ["sq8", "pq4"])
def test_angular_quantized_routing_rank_faithful(angular_setup, mode):
    """sq8/pq4 traversal on plain Cosine encodes ROW-NORMALIZED vectors
    (qgraph._sq8_rows) so the scaled-L2 / LUT ranking matches the angular
    ranking — recall must be in the same band as the exact traversal."""
    from ngt_tpu.ops.bruteforce import recall_at_k
    from ngt_tpu.quant.qgraph import QuantizedGraphIndex

    idx, q, gt, rec_e = angular_setup
    qg = QuantizedGraphIndex.quantize(idx, mode=mode)
    ids_q, _ = qg.batch_search(q, size=10, epsilon=0.1, result_expansion=3.0)
    rec_q = recall_at_k(np.asarray(ids_q), gt, 10)
    assert rec_q >= rec_e - 0.05, (rec_e, rec_q)
    assert rec_q >= 0.85


def test_ivfpq_dynamic_centroids(rng):
    """Insert-time coarse-centroid growth (reference
    CentroidCreationModeDynamic, Quantizer.h:174-205): vectors landing in a
    region the trained centroids never saw must mint new centroids, and
    post-growth recall must stay within 1 pt of a full rebuild (the round-3
    verdict's drift bound)."""
    from ngt_tpu.quant.ivfpq import IVFPQIndex

    d = 24
    # training distribution: clusters around 8 far-apart anchors
    anchors = rng.normal(size=(8, d)).astype(np.float32) * 30
    train = (anchors[rng.integers(0, 8, 4000)]
             + rng.normal(size=(4000, d)).astype(np.float32))
    # post-build inserts: 8 NEW anchors, twice the trained size
    anchors2 = rng.normal(size=(8, d)).astype(np.float32) * 30 + 150
    extra = (anchors2[rng.integers(0, 8, 8000)]
             + rng.normal(size=(8000, d)).astype(np.float32))

    dyn = IVFPQIndex(d, n_centroids=32, centroid_mode="dynamic")
    dyn.batch_insert(train)
    dyn.build()
    n0 = len(dyn.centroids)
    assert dyn.global_range > 0
    dyn.batch_insert(extra)
    assert len(dyn.centroids) > n0          # growth happened

    # static twin degrades (new region crammed into old buckets) unless
    # rebuilt; dynamic must match the rebuilt index within 1 pt
    reb = IVFPQIndex(d, n_centroids=32, centroid_mode="static")
    reb.batch_insert(train)
    reb.build()
    reb.batch_insert(extra)
    reb.rebuild()

    q = (np.concatenate([anchors, anchors2])[rng.integers(0, 16, 256)]
         + rng.normal(size=(256, d)).astype(np.float32))
    allx = np.concatenate([train, extra])
    di = np.linalg.norm(q[:, None] - allx[None], axis=-1)
    gt = np.argsort(di, axis=1)[:, :10]

    ids_d, _ = dyn.batch_search(q, size=10, nprobe=8, result_expansion=10)
    ids_r, _ = reb.batch_search(q, size=10, nprobe=8, result_expansion=10)
    rec_d = recall_at_k(np.asarray(ids_d), gt, 10)
    rec_r = recall_at_k(np.asarray(ids_r), gt, 10)
    assert rec_d >= rec_r - 0.01
    # persistence round-trips the mode + range
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        dyn.save(td)
        back = IVFPQIndex.open(td)
        assert back.centroid_mode == "dynamic"
        assert back.global_range == pytest.approx(dyn.global_range)
        assert len(back.centroids) == len(dyn.centroids)


def test_u8_exact_codes_integral_corpus(rng, monkeypatch):
    """Integral corpora: the sq8 codes ARE the narrow mirror (shared u8
    buffer, scale 1) — zero extra HBM for the code matrix and EXACT
    traversal scoring (sq8's max/127 scale loses ~1 bit on 0..255 data).
    Save/open preserves the scheme; a non-integral mutation switches to
    scaled int8 codes cleanly."""
    import tempfile
    import shutil

    from ngt_tpu.quant.qgraph import QuantizedGraphIndex

    data = np.rint(
        np.clip(rng.normal(size=(2000, 32)) * 20 + 100, 0, 255)
    ).astype(np.float32)
    q = data[rng.choice(2000, 32)] + rng.normal(size=(32, 32)).astype(
        np.float32
    )
    idx = ngt_tpu.create(None, dimension=32)
    idx.batch_insert(data, build=True)
    gt, _ = idx.batch_linear_search(q, size=10)
    qg = QuantizedGraphIndex.quantize(idx, mode="sq8")
    assert qg._codes_dev is idx._mirror.x
    assert qg.sq_scale == 1.0
    i1, _ = qg.batch_search(q, size=10, epsilon=0.05)
    r1 = recall_at_k(np.asarray(i1), np.asarray(gt), 10)

    monkeypatch.setenv("NGT_TPU_QG_HOST_QUANTIZE", "1")
    qg2 = QuantizedGraphIndex.quantize(idx, mode="sq8")
    monkeypatch.delenv("NGT_TPU_QG_HOST_QUANTIZE")
    assert qg2.codes.dtype == np.int8
    i2, _ = qg2.batch_search(q, size=10, epsilon=0.05)
    r2 = recall_at_k(np.asarray(i2), np.asarray(gt), 10)
    assert r1 >= r2 - 1e-9

    d = tempfile.mkdtemp()
    try:
        qg.save(d)
        qg3 = QuantizedGraphIndex.open(d)
        assert qg3.codes.dtype == np.uint8 and qg3.sq_scale == 1.0
        i3, _ = qg3.batch_search(q, size=10, epsilon=0.05)
        assert (np.asarray(i3) == np.asarray(i1)).mean() > 0.99
    finally:
        shutil.rmtree(d)
    # non-integral mutation switches schemes without breaking the search
    idx.batch_insert(data[:8] + np.float32(1.0 / 3.0), build=True)
    i4, _ = qg.batch_search(q, size=10, epsilon=0.05)
    assert qg.codes.dtype == np.int8
    r4 = recall_at_k(np.asarray(i4), np.asarray(gt), 10)
    assert r4 >= r2 - 0.02


def test_resolve_refine_auto(rng):
    """search_refine=-1 resolves to min(64, e_max - eb); explicit values
    are honored (BASELINE round-4d geometry)."""
    data = rng.normal(size=(600, 24)).astype(np.float32)
    idx = ngt_tpu.create(None, dimension=24)
    idx.batch_insert(data, build=True)
    qg = QuantizedGraphIndex.quantize(idx, mode="sq8")
    assert idx.prop.search_refine == -1
    assert qg._resolve_refine(80, 48) == 32
    assert qg._resolve_refine(80, 16) == 64
    assert qg._resolve_refine(80, 8) == 64
    assert qg._resolve_refine(16, 16) == 0
    idx.prop.search_refine = 7
    assert qg._resolve_refine(80, 16) == 7
    idx.prop.search_refine = 0
    assert qg._resolve_refine(80, 16) == 0
