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
    import ngt_tpu

    data, name = load_dataset()
    rng = np.random.default_rng(7)
    n_q = 1024
    # queries: perturbed base vectors (the reference's query-extraction tool
    # midpoints stored objects similarly; Optimizer.h:1139-1199)
    qi = rng.choice(len(data), size=n_q, replace=False)
    queries = data[qi] + rng.normal(size=(n_q, data.shape[1])).astype(np.float32)

    t0 = time.time()
    idx = ngt_tpu.create(None, dimension=data.shape[1])
    idx.batch_insert(data, build=True)
    build_s = time.time() - t0

    gt_ids, _ = idx.batch_linear_search(queries, size=10)
    gt_ids = np.asarray(gt_ids)

    best = None
    for eps in (0.02, 0.05, 0.1, 0.15, 0.2, 0.3):
        ids, _ = idx.batch_search(queries, size=10, epsilon=eps)  # compile+warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            ids, dists = idx.batch_search(queries, size=10, epsilon=eps)
        dt = (time.time() - t0) / reps
        from ngt_tpu.ops.bruteforce import recall_at_k

        rec = recall_at_k(np.asarray(ids), gt_ids, 10)
        qps = n_q / dt
        print(
            f"# eps={eps} recall@10={rec:.4f} qps={qps:.0f} build={build_s:.1f}s",
            file=sys.stderr,
        )
        if rec >= 0.90 and (best is None or qps > best[0]):
            best = (qps, rec, eps)

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
