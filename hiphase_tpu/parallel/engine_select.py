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


# A dispatch→result round-trip above this is a remote/tunneled device; the
# per-batch host<->device transfers of the solve pipeline then cost more
# than the native host engine's entire solve, so 'auto' prefers the host.
# Locally-attached TPUs measure well under 1 ms.
LATENCY_THRESHOLD_S = float(
    os.environ.get("HIPHASE_TPU_DEVICE_LATENCY_THRESHOLD", 0.005))


PROBE_CACHE_TTL = float(os.environ.get("HIPHASE_TPU_PROBE_TTL", 300))


def _probe_cache_path() -> str:
    return os.path.join(os.path.expanduser("~/.cache/hiphase_tpu"),
                        "device_probe.json")


def _probe_cache_read() -> tuple[bool, float | None] | None:
    if os.environ.get("HIPHASE_TPU_PROBE_CACHE") == "0":
        return None
    try:
        import json
        import time
        with open(_probe_cache_path()) as fh:
            d = json.load(fh)
        if time.time() - d["time"] > PROBE_CACHE_TTL:
            return None
        if d.get("platforms") != os.environ.get("JAX_PLATFORMS", ""):
            return None
        return bool(d["healthy"]), d.get("latency")
    except Exception:
        return None


def _probe_cache_write(healthy: bool, latency: float | None) -> None:
    if os.environ.get("HIPHASE_TPU_PROBE_CACHE") == "0":
        return
    try:
        import json
        import time
        path = _probe_cache_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump({"healthy": healthy, "latency": latency,
                       "time": time.time(),
                       "platforms": os.environ.get("JAX_PLATFORMS", "")}, fh)
    except Exception:
        pass


def probe_accelerator(timeout: float = PROBE_TIMEOUT
                      ) -> tuple[bool, float | None]:
    """(healthy, median round-trip seconds) for a non-CPU JAX backend.
    The probe runs on a daemon thread; a hung backend strands only it.
    The result is disk-cached for PROBE_CACHE_TTL seconds so a degraded
    link costs the probe timeout once, not once per process."""
    cached = _probe_cache_read()
    if cached is not None:
        return cached
    result: list[tuple[bool, float | None]] = []

    def _probe():
        try:
            import time

            import jax
            import jax.numpy as jnp
            import numpy as np
            devs = jax.devices()
            if not devs or devs[0].platform == "cpu":
                result.append((False, None))
                return
            x = jax.device_put(np.zeros(8, dtype=np.float32))
            np.asarray(x + 1)  # compile + first transfer
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                np.asarray(x + 1)
                times.append(time.perf_counter() - t0)
            times.sort()
            result.append((True, times[len(times) // 2]))
        except Exception:  # pragma: no cover - backend import failures
            result.append((False, None))

    import threading
    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(timeout)
    if not result:
        logger.warning("Accelerator probe did not answer within %.1fs; "
                       "treating device as unavailable", timeout)
        _probe_cache_write(False, None)
        return False, None
    _probe_cache_write(*result[0])
    return result[0]


def choose_engine(requested: str) -> str:
    """Resolve the --engine flag. 'auto' picks the fastest available
    engine: the device when it is healthy AND locally attached (round-trip
    under LATENCY_THRESHOLD_S), the native host beam otherwise, the A*
    oracle last. All engines produce identical output, so this is purely a
    performance decision."""
    if requested != "auto":
        return requested
    from hiphase_tpu.io import native as native_lib
    healthy, latency = probe_accelerator()
    if healthy and (latency is not None and latency < LATENCY_THRESHOLD_S):
        return "tpu"
    if healthy:
        logger.info("Accelerator answers but round-trip is %.1f ms "
                    "(threshold %.1f ms): a remote/tunneled device loses to "
                    "the native host engine for this pipeline; using "
                    "'native' (force with --engine tpu)",
                    1e3 * (latency or 0), 1e3 * LATENCY_THRESHOLD_S)
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


class DeferredUpgradeSolver:
    """Starts on the native host solver and switches to a lazily-built
    device solver if the (still running) engine probe resolves to 'tpu'.
    Engines are bit-identical, so the mid-run switch cannot change output;
    a probe that never answers costs nothing."""

    def __init__(self, native_solver, probe_future, make_device_solver):
        self._sol = native_solver
        self._native = native_solver
        self._future = probe_future
        self._make = make_device_solver

    @property
    def degraded(self) -> bool:
        return getattr(self._sol, "degraded", False)

    def _maybe_upgrade(self) -> list:
        if self._future is None or not self._future.done():
            return []
        choice = self._future.result()
        self._future = None
        if choice != "tpu":
            return []
        out = self._native.drain()
        logger.info("Device probe resolved in favor of the accelerator; "
                    "upgrading engine to 'tpu' mid-run")
        self._sol = self._make()
        return out

    def submit(self, data):
        out = self._maybe_upgrade()
        out.extend(self._sol.submit(data))
        return out

    def drain(self):
        self._future = None  # too late to benefit from an upgrade
        return self._sol.drain()


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
