"""True multi-PROCESS distributed test: two OS processes, four virtual CPU
devices each, one jax.distributed rendezvous, one global 8-device mesh.

This is the multi-host deployment shape (the reference delegates it to
ngtd/vald; here it is first-class — parallel/multihost.py): every process
holds only its own corpus shards, and the all_gather top-k merge crosses
the process boundary over the distributed runtime.  The worker asserts
exact agreement with single-process brute force."""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_distributed_search():
    env = dict(os.environ)
    # the workers pin their own backend (cpu x4 + gloo collectives)
    env.pop("XLA_FLAGS", None)
    coord = f"localhost:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        assert f"MULTIHOST_OK pid={pid} procs=2 devices=8" in out, out[-500:]
