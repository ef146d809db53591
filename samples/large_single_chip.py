"""Large single-chip production recipes (the reference's large-dataset
regime, NGT_LARGE_DATASET at 5M — lib/NGT/Graph.h:287-380).

Round-4 certified operating point on one 16 GB TPU chip (BASELINE.md 4g):
recall@10 0.9836 at 10.7k qps (batch 4096) on a 4M x 128 uint8-valued
corpus, index built in ~3-4 minutes.  The pieces that make it fit:

* narrow device mirror (uint8 corpus = 1 B/dim resident);
* u8-exact shared codes (the sq8 code matrix IS the mirror);
* slab-filled neighbor blocks (eb=12 under a 6 GiB budget);
* AUTO edge-tail refinement + `ef` rank widening for the recall tier.

8M on one chip needs TWO more knobs (BASELINE.md round 5g):

* `--stage 2000000` — one-shot bulk assembly transiently holds ~2x the
  scan outputs and RESOURCE_EXHAUSTs; staged 2M bulk appends (each
  auto-routed through the scan-and-merge path) keep the peak bounded;
* `--block-gb 8` — resolves the sq8 neighbor blocks to the eb=8 width
  floor (8 GiB at 8M x 128 d), the last width that fits beside the u8
  mirror and the adjacency on a 16 GB chip.

Run:  python samples/large_single_chip.py [--n 4000000]
      python samples/large_single_chip.py --n 8000000 --stage 2000000 \
          --block-gb 8
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ngt_tpu
from ngt_tpu.ops.bruteforce import recall_at_k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=4096)
    ap.add_argument("--stage", type=int, default=0,
                    help="rows per staged bulk append (0 = one-shot build)")
    ap.add_argument("--block-gb", type=float, default=0,
                    help="override NGT_TPU_QG_BLOCK_GB for the search phase")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    base = rng.integers(0, 200, size=(5000, args.dim)).astype(np.float32)
    reps = (args.n + len(base) - 1) // len(base)
    data = np.tile(base, (reps, 1))[: args.n]
    data += rng.normal(scale=12.0, size=data.shape).astype(np.float32)
    np.clip(np.rint(data), 0, 255, out=data)  # integral -> u8 mirror path

    t0 = time.time()
    idx = ngt_tpu.create(None, dimension=args.dim, edge_size_for_creation=40)
    step = args.stage if args.stage > 0 else args.n
    for lo in range(0, args.n, step):
        idx.batch_insert(data[lo:lo + step], build=True)
        if args.stage:
            # materialize the deferred adjacency NOW: at 8M the deferred
            # device ids+dists (~2 x cap x e_max x 4 B) are the largest
            # residents, and holding them through the next stage's scan is
            # what RESOURCE_EXHAUSTs (round 5g).  The download is bounded
            # (~1-2 min/stage over the tunnel) and the next merge works
            # from the host rows.
            _ = idx.graph.degree
            print(f"  staged append -> {min(lo + step, args.n)} rows "
                  f"({time.time()-t0:.1f}s)", flush=True)
    print(f"build {args.n} rows: {time.time()-t0:.1f}s")

    q = base[rng.choice(len(base), args.queries)] + rng.normal(
        scale=12.0, size=(args.queries, args.dim)
    ).astype(np.float32)
    gt, _ = idx.batch_linear_search(q, size=10)
    idx.store.release_device()   # drop the GT scan's device corpus copy
    _ = idx.graph.degree         # free the deferred f32 distance copy
    if args.block_gb:
        os.environ["NGT_TPU_QG_BLOCK_GB"] = str(args.block_gb)

    for ef, rexp in ((48, 5.0), (72, 8.0), (96, 10.0)):
        idx.prop.result_expansion = rexp
        t0 = time.time()
        ids, _ = idx.batch_search(q, size=10, epsilon=0.0, ef=ef)
        ids, _ = idx.batch_search(q, size=10, epsilon=0.0, ef=ef)  # warm
        dt = time.time() - t0
        rec = recall_at_k(np.asarray(ids), np.asarray(gt), 10)
        print(f"ef={ef} rexp={rexp} recall@10={rec:.4f} "
              f"qps={2 * args.queries / dt:.0f}", flush=True)


if __name__ == "__main__":
    main()
