"""NGTQ-scale demonstration: 10M-row IVF+PQ build + search on one TPU chip.

The reference positions NGTQ as its billion-scale subsystem (NGTQ/Quantizer.h;
bin/ngtq usage NGTQ/NGTQCommand.h:574-613).  This demo builds a 10M x 128
index under a stated memory budget and reports recall/QPS against exact GT:

* corpus: bundled 5k SIFT tiled 2000x + sigma=12 noise, rounded to uint8
  (the value domain of real SIFT descriptors), deterministic (seed 0);
* index: 4096 coarse centroids, PQ m=64 (dsub=2) ksub=16 -> packed 4-bit
  codes, 32 B/object; raw vectors in an on-disk float32 memmap (the
  ArrayFile analogue) so host RSS stays bounded;
* budget: device inverted lists ~= 10M * (32 B codes + 4 B ids) ~ 360 MB
  HBM + query-time probe tensors; host RSS target < 16 GB peak
  (transient build concatenation), raw 5 GB on DISK, not RAM.

Run:  python samples/ngtq_10m.py [--n 10000000] [--queries 1024]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) / 1e6
    return 0.0


def load_base5k() -> np.ndarray:
    path = "/root/reference/data/sift-dataset-5k.tsv"
    data = np.loadtxt(path, delimiter="\t", dtype=np.float32)
    return data[:, :128]  # column 129 is a row label


def make_corpus(cache: str, n: int) -> np.ndarray:
    """Deterministic uint8 corpus on disk; returned as a read-only memmap."""
    path = os.path.join(cache, f"sift{n//1_000_000}m_u8.npy")
    if not os.path.exists(path):
        base = load_base5k()
        reps = (n + len(base) - 1) // len(base)
        out = np.lib.format.open_memmap(
            path, mode="w+", dtype=np.uint8, shape=(n, 128)
        )
        g = np.random.default_rng(0)
        t0 = time.time()
        for r in range(reps):
            s = r * len(base)
            e = min(s + len(base), n)
            blk = base[: e - s] + g.normal(
                scale=12.0, size=(e - s, 128)
            ).astype(np.float32)
            out[s:e] = np.clip(np.rint(blk), 0, 255).astype(np.uint8)
        out.flush()
        print(f"# corpus generated in {time.time()-t0:.0f}s", file=sys.stderr)
    return np.load(path, mmap_mode="r")


def exact_gt(corpus, queries, k, cache, tag):
    """Exact top-k by blocked device scan (corpus streamed in u8 segments)."""
    import jax
    import jax.numpy as jnp

    gt_f = os.path.join(cache, f"gt{k}_{tag}.npy")
    if os.path.exists(gt_f):
        return np.load(gt_f)
    qd = jnp.asarray(queries)
    qsq = jnp.sum(qd * qd, axis=1)
    best_d = np.full((len(queries), k), np.inf, np.float32)
    best_i = np.full((len(queries), k), -1, np.int64)
    seg = 1 << 21
    prec = jax.lax.Precision.HIGHEST

    @jax.jit
    def seg_topk(xu8, qd, qsq):
        x = xu8.astype(jnp.float32)
        xsq = jnp.sum(x * x, axis=1)
        d = qsq[:, None] - 2.0 * jnp.dot(
            qd, x.T, precision=prec
        ) + xsq[None, :]
        neg, idx = jax.lax.top_k(-d, k)
        return -neg, idx

    t0 = time.time()
    for s in range(0, len(corpus), seg):
        xu8 = jnp.asarray(np.ascontiguousarray(corpus[s : s + seg]))
        dd, ii = jax.device_get(seg_topk(xu8, qd, qsq))
        cat_d = np.concatenate([best_d, dd], axis=1)
        cat_i = np.concatenate([best_i, ii.astype(np.int64) + s], axis=1)
        order = np.argsort(cat_d, axis=1, kind="stable")[:, :k]
        best_d = np.take_along_axis(cat_d, order, axis=1)
        best_i = np.take_along_axis(cat_i, order, axis=1)
    print(f"# exact GT in {time.time()-t0:.0f}s", file=sys.stderr)
    np.save(gt_f, best_i)
    return best_i


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--queries", type=int, default=1024)
    ap.add_argument("--centroids", type=int, default=4096)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.cache/ngt_tpu_jax"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass

    from ngt_tpu.quant.ivfpq import IVFPQIndex
    from ngt_tpu.ops.bruteforce import recall_at_k

    cache = os.path.expanduser("~/.cache/ngt_tpu_bench")
    os.makedirs(cache, exist_ok=True)
    corpus = make_corpus(cache, args.n)

    g = np.random.default_rng(1)
    base = load_base5k()
    queries = base[g.choice(len(base), args.queries, replace=False)]
    queries = queries + g.normal(scale=12.0, size=queries.shape).astype(
        np.float32
    )

    gt = exact_gt(
        corpus, queries, 10, cache, f"{args.n//1_000_000}m_q{args.queries}"
    )

    raw_path = os.path.join(cache, f"ivfpq_raw_{args.n//1_000_000}m.f32")
    idx_dir = os.path.join(
        cache, f"ivfpq_idx_{args.n//1_000_000}m_c{args.centroids}"
    )
    if os.path.exists(os.path.join(idx_dir, "ivfpq.json")):
        t0 = time.time()
        idx = IVFPQIndex.open(idx_dir)
        print(f"# reopened in {time.time()-t0:.0f}s", file=sys.stderr)
    else:
        idx = IVFPQIndex(
            dimension=128,
            n_centroids=args.centroids,
            dsub=2,
            ksub=16,
            raw_store="mmap",
            raw_path=raw_path,
        )
        t0 = time.time()
        step = 1 << 20
        for s in range(0, args.n, step):
            idx.batch_insert(np.asarray(corpus[s : s + step], np.float32))
        idx.build()
        build_s = time.time() - t0
        idx.save(idx_dir)
        print(f"# build={build_s:.0f}s", file=sys.stderr)
    rep = idx.memory_report()
    print(
        f"# n={idx.size} rss_peak={rss_gb():.1f}GB "
        f"codes={rep['codes_bytes']/1e6:.0f}MB ids={rep['ids_bytes']/1e6:.0f}MB "
        f"raw={rep['raw_store']}(disk)",
        file=sys.stderr,
    )

    qchunk = 256  # bounds the per-probe gather tensors on device
    for nprobe, exp in ((8, 3.0), (16, 3.0), (16, 10.0), (16, 30.0),
                        (32, 30.0)):
        # warm
        idx.batch_search(
            queries[:qchunk], size=10, nprobe=nprobe,
            result_expansion=exp, mode="refine",
        )
        t0 = time.time()
        out = []
        for s in range(0, len(queries), qchunk):
            ids, _ = idx.batch_search(
                queries[s : s + qchunk], size=10, nprobe=nprobe,
                result_expansion=exp, mode="refine",
            )
            out.append(ids)
        dt = time.time() - t0
        ids = np.concatenate(out, axis=0)
        rec = recall_at_k(ids, gt, 10)
        print(
            f"# ivfpq-refine nprobe={nprobe} exp={exp:g} "
            f"recall@10={rec:.4f} qps={len(queries)/dt:.0f}",
            file=sys.stderr,
        )
    errs = idx.verify()
    print(f"# verify: {errs if errs else 'ok'}", file=sys.stderr)
    print(f"# rss_peak={rss_gb():.1f}GB", file=sys.stderr)


if __name__ == "__main__":
    main()
