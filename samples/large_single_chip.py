"""4M-row single-chip production recipe (the reference's large-dataset
regime, NGT_LARGE_DATASET at 5M — lib/NGT/Graph.h:287-380).

Round-4 certified operating point on one 16 GB TPU chip (BASELINE.md 4g):
recall@10 0.9836 at 10.7k qps (batch 4096) on a 4M x 128 uint8-valued
corpus, index built in ~3-4 minutes.  The pieces that make it fit:

* narrow device mirror (uint8 corpus = 1 B/dim resident);
* u8-exact shared codes (the sq8 code matrix IS the mirror);
* slab-filled neighbor blocks (eb=12 under a 6 GiB budget);
* AUTO edge-tail refinement + `ef` rank widening for the recall tier.

Run:  python samples/large_single_chip.py [--n 4000000]
"""

import argparse
import time

import numpy as np

import ngt_tpu
from ngt_tpu.ops.bruteforce import recall_at_k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=4096)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    base = rng.integers(0, 200, size=(5000, args.dim)).astype(np.float32)
    reps = (args.n + len(base) - 1) // len(base)
    data = np.tile(base, (reps, 1))[: args.n]
    data += rng.normal(scale=12.0, size=data.shape).astype(np.float32)
    np.clip(np.rint(data), 0, 255, out=data)  # integral -> u8 mirror path

    t0 = time.time()
    idx = ngt_tpu.create(None, dimension=args.dim, edge_size_for_creation=40)
    idx.batch_insert(data, build=True)
    print(f"build {args.n} rows: {time.time()-t0:.1f}s")

    q = base[rng.choice(len(base), args.queries)] + rng.normal(
        scale=12.0, size=(args.queries, args.dim)
    ).astype(np.float32)
    gt, _ = idx.batch_linear_search(q, size=10)
    idx.store.release_device()   # drop the GT scan's device corpus copy
    _ = idx.graph.degree         # free the deferred f32 distance copy

    idx.prop.result_expansion = 10.0
    t0 = time.time()
    ids, _ = idx.batch_search(q, size=10, epsilon=0.0, ef=96)
    ids, _ = idx.batch_search(q, size=10, epsilon=0.0, ef=96)  # warm rerun
    dt = time.time() - t0
    rec = recall_at_k(np.asarray(ids), np.asarray(gt), 10)
    print(f"recall@10={rec:.4f} qps={2 * args.queries / dt:.0f}")


if __name__ == "__main__":
    main()
