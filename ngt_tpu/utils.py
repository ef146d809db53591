"""Small runtime utilities mirroring the reference's layer-1 helpers.

* log control — the analogue of ``StdOstreamRedirector`` /
  ``Index::enableLog/disableLog`` (reference Common.h:285-332,
  Index.h:493-494): the engine logs through the ``ngt_tpu`` logger; these
  flip its level (the reference dup2's stderr to /dev/null).
* process-memory probes — ``Common::getProcessVmSize/VmPeak/VmRSS``
  (reference Common.h:279-283) read from /proc the same way.
* ``Timer`` — wall-clock phase timer (reference Common.h:2121-2162).
"""

from __future__ import annotations

import logging
import time

logger = logging.getLogger("ngt_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("ngt_tpu: %(message)s"))
    logger.addHandler(_h)
    logger.setLevel(logging.WARNING)


def enable_log() -> None:
    logger.setLevel(logging.INFO)


def disable_log() -> None:
    logger.setLevel(logging.CRITICAL)


def _proc_status_kb(key: str) -> int:
    try:
        with open("/proc/self/status") as fh:
            for line in fh:
                if line.startswith(key + ":"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def get_process_vm_size() -> int:
    """VmSize in KiB (Common::getProcessVmSize, Common.h:279)."""
    return _proc_status_kb("VmSize")


def get_process_vm_peak() -> int:
    return _proc_status_kb("VmPeak")


def get_process_vm_rss() -> int:
    return _proc_status_kb("VmRSS")


class Timer:
    """start/stop accumulating wall timer (reference Common.h:2121-2162)."""

    def __init__(self):
        self.time = 0.0
        self._t0 = None

    def start(self):
        self._t0 = time.time()
        return self

    def stop(self):
        if self._t0 is not None:
            self.time += time.time() - self._t0
            self._t0 = None
        return self

    def reset(self):
        self.time = 0.0
        self._t0 = None
        return self


def narrow_host(xh):
    """The narrowest LOSSLESS host representation of an f32 matrix
    (uint8 / int16 / f16 / unchanged).  Never lossy — used so integral
    (SIFT-like) corpora move over the tunnel and sit in HBM at 1 B/dim
    while every distance entry point still computes in f32."""
    import numpy as np

    try:
        if xh.dtype == np.float32 and xh.size:
            mn = float(xh.min())
            mx = float(xh.max())
            if 0 <= mn and mx <= 255:
                xi = xh.astype(np.uint8)
                if np.array_equal(xi.astype(np.float32), xh):
                    return xi
            elif -32768 <= mn and mx <= 32767:
                xi = xh.astype(np.int16)
                if np.array_equal(xi.astype(np.float32), xh):
                    return xi
            x16 = xh.astype(np.float16)
            if np.array_equal(x16.astype(np.float32), xh):
                return x16
    except (ValueError, OverflowError):  # non-finite min/max etc.
        pass
    return xh
