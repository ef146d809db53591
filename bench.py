"""Benchmark: ANNG build + batched k-NN search, recall-constrained QPS.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference's documented ANNG search on the same
bundled 5k x 128 SIFT corpus runs 0.18-0.48 ms/query single-threaded
(reference bin/ngt/README.md:254-324) => ~3030 QPS at the midpoint (0.33 ms).
vs_baseline = our batched QPS at recall@10 >= 0.9 divided by that.
"""

import json
import os
import sys
import time

import numpy as np


def load_dataset():
    path = "/root/reference/data/sift-dataset-5k.tsv"
    if os.path.exists(path):
        data = np.loadtxt(path, delimiter="\t", dtype=np.float32)
        # column 129 is a row label; SIFT is 128-dim (the reference's TSV
        # reader likewise parses only `dimension` columns)
        return data[:, :128], "sift5k"
    rng = np.random.default_rng(0)
    return rng.normal(size=(5000, 128)).astype(np.float32) * 20 + 100, "synth5k"


def main():
    import jax

    # persistent compile cache: the search kernel compile (~20-60 s on the
    # tunneled TPU) amortizes across bench runs
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/ngt_tpu_jax"),  # shared with the CLI
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    import jax.numpy as jnp

    # warm the device data channel OUTSIDE every timed phase: the first
    # host->device transfer of a process over the axon tunnel has been
    # measured at 3-224 s (channel establishment), independent of size
    t0 = time.time()
    np.asarray(jnp.zeros((8, 8))[0, 0])
    print(f"# device channel warmup {time.time()-t0:.1f}s", file=sys.stderr)

    import ngt_tpu

    data, name = load_dataset()
    rng = np.random.default_rng(7)
    n_q = 1024
    # queries: perturbed base vectors (the reference's query-extraction tool
    # midpoints stored objects similarly; Optimizer.h:1139-1199)
    qi = rng.choice(len(data), size=n_q, replace=False)
    queries = data[qi] + rng.normal(size=(n_q, data.shape[1])).astype(np.float32)

    from ngt_tpu.ops.bruteforce import recall_at_k

    t0 = time.time()
    idx = ngt_tpu.create(None, dimension=data.shape[1])
    idx.batch_insert(data, build=True)
    build_s = time.time() - t0

    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    gt_ids = np.asarray(gt_ids)

    def timed(fn, reps=3):
        """min-of-reps wall time (the reference's trial scheme,
        Command.cpp:302-318) — robust to shared-TPU throughput noise."""
        fn()  # compile + warm
        best_dt = float("inf")
        ids = None
        for _ in range(reps):
            t0 = time.time()
            ids, _ = fn()
            best_dt = min(best_dt, time.time() - t0)
        return ids, best_dt

    best = None
    for eps in (0.02, 0.05, 0.1, 0.2):
        ids, dt = timed(
            lambda e=eps: idx.batch_search(queries, size=10, epsilon=e)
        )
        rec = recall_at_k(np.asarray(ids), gt_ids, 10)
        qps = n_q / dt
        print(
            f"# anng eps={eps} recall@10={rec:.4f} qps={qps:.0f} build={build_s:.1f}s",
            file=sys.stderr,
        )
        if rec >= 0.90 and (best is None or qps > best[0]):
            best = (qps, rec, eps)

    # quantized-graph operating points (the reference's own headline curve
    # is NGT-qg; result_expansion default 3.0, bin/ngtqg/README.md:62-69)
    try:
        from ngt_tpu.quant.qgraph import QuantizedGraphIndex

        qg = QuantizedGraphIndex.quantize(idx, mode="sq8")
        for eps, rexp in ((0.02, 3.0), (0.02, 6.0), (0.05, 3.0), (0.1, 3.0)):
            ids, dt = timed(
                lambda e=eps, r=rexp: qg.batch_search(
                    queries, size=10, epsilon=e, result_expansion=r
                )
            )
            rec = recall_at_k(np.asarray(ids), gt_ids, 10)
            qps = n_q / dt
            print(
                f"# qg-sq8 eps={eps} exp={rexp} recall@10={rec:.4f} qps={qps:.0f}",
                file=sys.stderr,
            )
            if rec >= 0.90 and (best is None or qps > best[0]):
                best = (qps, rec, eps)
    except Exception as exc:  # pragma: no cover
        print(f"# qg bench skipped: {exc}", file=sys.stderr)

    # angular-metric arm (the glove-100-angular axis of the baseline; the
    # real corpus is not fetchable here, so a deterministic 100k low-rank
    # Gaussian on the 100-sphere stands in — smooth angular structure with
    # glove-like correlated directions; stderr info only, not the headline)
    try:
        rng2 = np.random.default_rng(3)
        rank, n_ang, nq_ang = 25, 100_000, 512
        A = rng2.normal(size=(rank, 100)).astype(np.float32)
        ang = (
            rng2.normal(size=(n_ang, rank)).astype(np.float32) @ A
            + rng2.normal(size=(n_ang, 100)).astype(np.float32) * 0.3
        )
        aq = (
            rng2.normal(size=(nq_ang, rank)).astype(np.float32) @ A
            + rng2.normal(size=(nq_ang, 100)).astype(np.float32) * 0.3
        )
        aidx = ngt_tpu.create(
            None, dimension=100, distance_type="Cosine",
            edge_size_for_creation=40,
        )
        t0 = time.time()
        aidx.batch_insert(ang, build=True)
        ab = time.time() - t0
        agt, _ = aidx.batch_linear_search(aq, size=10)
        for eps in (0.02, 0.05, 0.1):
            ids, dt = timed(
                lambda e=eps: aidx.batch_search(aq, size=10, epsilon=e)
            )
            arec = recall_at_k(np.asarray(ids), np.asarray(agt), 10)
            print(
                f"# angular100k(auto) eps={eps} recall@10={arec:.4f} "
                f"qps={len(aq)/dt:.0f} build={ab:.1f}s",
                file=sys.stderr,
            )
        # the reference's published glove curves come from the ONNG recipe
        # (create -E 40 -> reconstruct-graph -o 10 -i 120,
        # bin/ngt/README.md:329-338).  Measured here (BASELINE.md round-2e):
        # from this engine's exact-KNNG bulk build the reconstruction only
        # pays above the ~0.985 recall floor (it REMOVES exact edges), so
        # the arm is opt-in — the recipe's win case is a weak ANNG start.
        if os.environ.get("NGT_TPU_BENCH_ANGULAR_ONNG", "0") == "1":
            from ngt_tpu.optimizer import GraphOptimizer

            t0 = time.time()
            GraphOptimizer(
                out_edges=10, in_edges=120, tune_parameters=False
            ).execute(aidx)
            print(
                f"# angular100k onng reconstruct={time.time()-t0:.1f}s",
                file=sys.stderr,
            )
            for eps in (0.02, 0.05, 0.1):
                ids, dt = timed(
                    lambda e=eps: aidx.batch_search(aq, size=10, epsilon=e)
                )
                arec = recall_at_k(np.asarray(ids), np.asarray(agt), 10)
                print(
                    f"# angular100k-onng(auto) eps={eps} recall@10={arec:.4f} "
                    f"qps={len(aq)/dt:.0f}",
                    file=sys.stderr,
                )
    except Exception as exc:  # pragma: no cover
        print(f"# angular bench skipped: {exc}", file=sys.stderr)

    # ---- 1M north-star curve (BASELINE.md: sift-128-euclidean at 1M) ----
    # Deterministic corpus: the bundled 5k SIFT tiled 200x with sigma=12
    # noise (seed 0); exact GT computed on device and cached.  Baseline:
    # the reference's documented NGTQG search on SIFT1M runs 0.5034
    # ms/query (k=20, eps=0.02; bin/ngtqg/README.md:107-118) => 1987 QPS
    # single-thread; reference ANNG build: 63.35 s on 24 threads
    # (bin/ngtqg/README.md:86-93).
    m1 = None
    if os.environ.get("NGT_TPU_BENCH_1M", "1") != "0":
        try:
            m1 = bench_1m(data, timed, rng)
        except Exception as exc:  # pragma: no cover
            print(f"# 1M bench failed: {exc}", file=sys.stderr)

    if m1 is not None:
        print(
            json.dumps(
                {
                    "metric": "sift1m_qps_at_recall95_k10",
                    "value": round(m1, 1),
                    "unit": "qps",
                    "vs_baseline": round(m1 / 1987.0, 3),
                }
            )
        )
        return

    if best is None:
        qps, rec, eps = 0.0, 0.0, 0.0
    else:
        qps, rec, eps = best
    baseline_qps = 3030.0
    print(
        json.dumps(
            {
                "metric": f"{name}_qps_at_recall90_k10",
                "value": round(qps, 1),
                "unit": "qps",
                "vs_baseline": round(qps / baseline_qps, 3),
            }
        )
    )


def bench_1m(base5k, timed, rng):
    """1M-scale recall/QPS curve: exact ANNG path vs the auto-routed sq8
    production path, plus an ONNG reconstruction when NGT_TPU_BENCH_ONNG=1.
    Returns the best qps at recall@10 >= 0.95 (the headline)."""
    import ngt_tpu
    from ngt_tpu.ops.bruteforce import recall_at_k

    cache = os.path.expanduser("~/.cache/ngt_tpu_bench")
    os.makedirs(cache, exist_ok=True)
    # production-scale batch: per-query overhead amortizes with batch size
    # at equal recall (measured 14.3k qps @1024 -> 19.1k @4096 -> 21.6k
    # @8192, plateau at 16384)
    n_q = 8192
    # integral uint8-valued corpus like the real sift-128-euclidean (SIFT
    # descriptors are uint8); also lets the build ship 4x fewer bytes over
    # the tunnel (graph/build.py _upload_f32)
    corpus_f = os.path.join(cache, "sift1m_sigma12_u8.npy")
    if os.path.exists(corpus_f):
        data = np.load(corpus_f, mmap_mode="r")
        data = np.ascontiguousarray(data).astype(np.float32)
    else:
        g = np.random.default_rng(0)
        data = np.tile(base5k, (200, 1))
        data += g.normal(scale=12.0, size=data.shape).astype(np.float32)
        np.clip(np.rint(data), 0, 255, out=data)
        np.save(corpus_f, data.astype(np.uint8))
        data = data.astype(np.float32)
    g2 = np.random.default_rng(1)
    # replace=True: n_q exceeds the 5k base rows; each draw gets its own
    # noise so queries stay distinct
    queries = base5k[g2.choice(len(base5k), n_q, replace=True)] + g2.normal(
        scale=12.0, size=(n_q, 128)
    ).astype(np.float32)

    t0 = time.time()
    idx = ngt_tpu.create(None, dimension=128, edge_size_for_creation=40)
    idx.batch_insert(data, build=True)
    build_s = time.time() - t0
    print(
        f"# 1M build={build_s:.1f}s ({len(data)/build_s:.0f} obj/s; "
        f"reference: 63.4s on 24 CPU threads)",
        file=sys.stderr,
    )

    gt_f = os.path.join(cache, f"sift1m_u8_gt10_q{n_q}.npy")
    if os.path.exists(gt_f):
        gt_ids = np.load(gt_f)
    else:
        gt_ids, _ = idx.batch_linear_search(queries, size=10)
        gt_ids = np.asarray(gt_ids)
        np.save(gt_f, gt_ids)

    best = None
    # exact traversal curve (opt out of routing for this arm)
    idx.prop.search_mode = "exact"
    for eps in (0.0, 0.02, 0.05, 0.1):
        ids, dt = timed(
            lambda e=eps: idx.batch_search(queries, size=10, epsilon=e)
        )
        rec = recall_at_k(np.asarray(ids), gt_ids, 10)
        qps = n_q / dt
        print(
            f"# 1M anng-exact eps={eps} recall@10={rec:.4f} qps={qps:.0f}",
            file=sys.stderr,
        )
        if rec >= 0.95 and (best is None or qps > best):
            best = qps
    # production path: auto-routed sq8 neighbor blocks (the sub-0.02 arms
    # matter: recall at eps=0.02 is already ~0.98, so the best qps at the
    # 0.95 recall floor usually sits below it)
    idx.prop.search_mode = "auto"
    for eps in (0.0, 0.01, 0.02, 0.05, 0.1):
        ids, dt = timed(
            lambda e=eps: idx.batch_search(queries, size=10, epsilon=e)
        )
        rec = recall_at_k(np.asarray(ids), gt_ids, 10)
        qps = n_q / dt
        print(
            f"# 1M qg-sq8(auto) eps={eps} recall@10={rec:.4f} qps={qps:.0f}",
            file=sys.stderr,
        )
        if rec >= 0.95 and (best is None or qps > best):
            best = qps

    if os.environ.get("NGT_TPU_BENCH_ONNG", "0") == "1":
        from ngt_tpu.optimizer import GraphOptimizer

        t0 = time.time()
        GraphOptimizer(
            out_edges=10, in_edges=120, tune_parameters=False
        ).execute(idx)
        print(f"# 1M onng reconstruct={time.time()-t0:.1f}s", file=sys.stderr)
        for mode in ("exact", "auto"):
            idx.prop.search_mode = mode
            for eps in (0.02, 0.05):
                ids, dt = timed(
                    lambda e=eps: idx.batch_search(
                        queries, size=10, epsilon=e
                    )
                )
                rec = recall_at_k(np.asarray(ids), gt_ids, 10)
                qps = n_q / dt
                print(
                    f"# 1M onng({mode}) eps={eps} recall@10={rec:.4f} "
                    f"qps={qps:.0f}",
                    file=sys.stderr,
                )
                if rec >= 0.95 and (best is None or qps > best):
                    best = qps
    return best


if __name__ == "__main__":
    main()
