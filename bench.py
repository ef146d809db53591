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

    # angular-metric spot-check (the glove-100-angular axis of the baseline;
    # the real corpus is not fetchable in this environment, so a clustered
    # normalized synthetic stands in — stderr info only, not the headline)
    try:
        rng2 = np.random.default_rng(3)
        centers = rng2.normal(size=(64, 100)).astype(np.float32)
        ang = centers[rng2.integers(0, 64, size=20000)] + rng2.normal(
            size=(20000, 100)
        ).astype(np.float32) * 0.4
        aq = centers[rng2.integers(0, 64, size=512)] + rng2.normal(
            size=(512, 100)
        ).astype(np.float32) * 0.4
        aidx = ngt_tpu.create(None, dimension=100, distance_type="Cosine")
        aidx.batch_insert(ang, build=True)
        agt, _ = aidx.batch_linear_search(aq, size=10)
        ids, dt = timed(
            lambda: aidx.batch_search(aq, size=10, epsilon=0.05)
        )
        arec = recall_at_k(np.asarray(ids), np.asarray(agt), 10)
        print(
            f"# angular20k eps=0.05 recall@10={arec:.4f} qps={len(aq)/dt:.0f}",
            file=sys.stderr,
        )
    except Exception as exc:  # pragma: no cover
        print(f"# angular bench skipped: {exc}", file=sys.stderr)

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


if __name__ == "__main__":
    main()
