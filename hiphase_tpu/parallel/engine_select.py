"""Engine selection and device-health resilience.

A production deployment must survive a degraded accelerator link: this
environment's TPU is reached through a tunnel whose round-trip can swing
from milliseconds to minutes, and a phasing run that silently stalls for
hours on a sick interconnect is worse than one that finishes on the host.
The reference has no analog (it is CPU-only and fail-fast, ref:
src/main.rs:20-73); this module is the TPU build's failure-detection /
recovery subsystem (SURVEY.md §5.3):

  * `probe_accelerator` — answers "is there a non-CPU backend that
    completes a tiny computation within a deadline?" without risking the
    main thread (the probe runs on a daemon thread; a hung backend strands
    only that thread).
  * `choose_engine` — resolves ``--engine auto``: device engine when the
    probe passes, native C++ beam otherwise, host A* as the last resort.
  * `ResilientSolver` — wraps the device solver so every JAX interaction
    runs on one dedicated worker thread under a deadline; on timeout the
    run degrades to the native engine and every outstanding block is
    re-solved on the host. Device results that arrive after degradation are
    discarded (block identity is tracked, nothing is emitted twice). The
    native and device engines produce bit-identical results by construction
    (see phasing/native_beam.py), so a mid-run engine change cannot change
    output bytes.
"""

from __future__ import annotations

import logging
import os
import queue
import threading

logger = logging.getLogger(__name__)

# Deadline for one device interaction (submit/drain of a batch). Generous:
# a cold batch may legitimately include a 10-60 s XLA compile on tunneled
# backends; a healthy warm interaction is milliseconds.
DEVICE_CALL_TIMEOUT = float(os.environ.get("HIPHASE_TPU_DEVICE_TIMEOUT", 90))
PROBE_TIMEOUT = float(os.environ.get("HIPHASE_TPU_PROBE_TIMEOUT", 10))


def probe_accelerator(timeout: float = PROBE_TIMEOUT) -> bool:
    """True iff a non-CPU JAX backend answers a tiny computation in time."""
    result: list[bool] = []

    def _probe():
        try:
            import jax
            import jax.numpy as jnp
            devs = jax.devices()
            if not devs or devs[0].platform == "cpu":
                result.append(False)
                return
            import numpy as np
            np.asarray(jnp.zeros(8) + 1)
            result.append(True)
        except Exception:  # pragma: no cover - backend import failures
            result.append(False)

    import threading
    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout)
    if not result:
        logger.warning("Accelerator probe did not answer within %.1fs; "
                       "treating device as unavailable", timeout)
        return False
    return result[0]


def choose_engine(requested: str) -> str:
    """Resolve the --engine flag. 'auto' picks the best available engine:
    device when healthy, native host beam otherwise, A* oracle last."""
    if requested != "auto":
        return requested
    from hiphase_tpu.io import native as native_lib
    if probe_accelerator():
        return "tpu"
    if native_lib.available():
        return "native"
    return "astar"


class _DaemonCaller:
    """Runs calls sequentially on one daemon thread with a per-call
    deadline. Daemon matters: a call stuck inside a hung backend must not
    block interpreter shutdown (concurrent.futures joins its workers at
    exit, which would hang the whole process)."""

    def __init__(self, name: str):
        self._q: queue.Queue = queue.Queue()
        self._t = threading.Thread(target=self._run, daemon=True, name=name)
        self._t.start()

    def _run(self):
        while True:
            fn, args, box, done = self._q.get()
            try:
                box.append(("ok", fn(*args)))
            except BaseException as e:  # propagate to caller (fail-fast)
                box.append(("err", e))
            done.set()

    def call(self, fn, args, timeout: float):
        """Returns fn(*args), raises its exception, or raises TimeoutError
        after `timeout` seconds (the call keeps running; its result is
        abandoned)."""
        box: list = []
        done = threading.Event()
        self._q.put((fn, args, box, done))
        if not done.wait(timeout):
            raise TimeoutError
        kind, val = box[0]
        if kind == "err":
            raise val
        return val


class ResilientSolver:
    """Device solver with deadline-supervised calls and host fallback.

    All device work runs on one daemon worker thread. If a call exceeds
    ``timeout`` the solver flips to the native engine permanently for this
    run: outstanding blocks re-solve on the host, late device results are
    dropped, and subsequent submissions go straight to the native solver.
    """

    def __init__(self, device_solver, native_solver,
                 timeout: float = DEVICE_CALL_TIMEOUT):
        self._device = device_solver
        self._native = native_solver
        self._timeout = timeout
        self._caller = _DaemonCaller("device-solver")
        self._outstanding: dict[int, object] = {}  # block_index -> BlockData
        self.degraded = False

    # -- internal ----------------------------------------------------------
    def _call(self, fn, *args):
        """Run a device-solver method under the deadline; returns results or
        flips to degraded mode (never raises on timeout)."""
        try:
            return self._caller.call(fn, args, self._timeout)
        except TimeoutError:
            logger.warning(
                "Device call exceeded %.0fs; degrading to the native host "
                "engine for the remainder of the run (%d blocks re-solve "
                "on host)", self._timeout, len(self._outstanding))
            self.degraded = True
            return None

    def _emit_device_results(self, results):
        out = []
        for pr, hr in results:
            idx = pr.phase_block.block_index
            if self._outstanding.pop(idx, None) is not None:
                out.append((pr, hr))
        return out

    def _resolve_outstanding_native(self):
        out = []
        pending = [self._outstanding.pop(k)
                   for k in sorted(self._outstanding.keys())]
        for data in pending:
            out.extend(self._native.submit(data))
        out.extend(self._native.drain())
        return out

    # -- public (mirrors BatchedDeviceSolver) ------------------------------
    def submit(self, data):
        if self.degraded:
            return self._native.submit(data)
        self._outstanding[data.phase_block.block_index] = data
        results = self._call(self._device.submit, data)
        if results is None:
            return self._resolve_outstanding_native()
        return self._emit_device_results(results)

    def drain(self):
        if self.degraded:
            return self._native.drain()
        results = self._call(self._device.drain)
        if results is None:
            return self._resolve_outstanding_native()
        out = self._emit_device_results(results)
        out.extend(self._native.drain())
        return out
