"""Profiling / observability subsystem (SURVEY.md §5).

The reference instruments ad hoc: cProfile harnesses and wall-clock prints
around the Fortran kernels (/root/reference/pyaceqd/two_time/correlations.py:11-12,
441-443, 530-536).  Here it is a first-class subsystem:

- ``PYACEQD_TPU_PROFILE=1``  enables per-phase wall timers (negligible
  overhead: two clock reads per phase).
- ``PYACEQD_TPU_PROFILE=trace``  additionally captures a ``jax.profiler``
  trace (TensorBoard/XProf format) under ``PYACEQD_TPU_PROFILE_DIR``
  (default /tmp/pyaceqd_tpu_trace) for kernel-level analysis.

Usage::

    from pyaceqd_tpu.utils import profiling
    with profiling.phase("pt_build"):
        ...
    profiling.report()   # {"pt_build": {"calls": 1, "total_s": 2.3}, ...}

Phases are nested-safe (inner phases are timed independently) and
thread-safe.  The engine hot paths are pre-instrumented: ``pt_build``
(process-tensor construction), ``setup`` (Trotter unitaries + superoperator
assembly), ``device_run`` (compile + scan execution + transfer; JAX caches
compilation, so the first call's excess over later calls is compile time).
"""

import contextlib
import os
import threading
import time

_LOCK = threading.Lock()
_PHASES = {}
_TRACE_ACTIVE = False


def enabled():
    return bool(os.environ.get("PYACEQD_TPU_PROFILE", ""))


def trace_requested():
    return os.environ.get("PYACEQD_TPU_PROFILE", "") == "trace"


def reset():
    with _LOCK:
        _PHASES.clear()


@contextlib.contextmanager
def phase(name):
    """Time a named phase (no-op unless PYACEQD_TPU_PROFILE is set)."""
    if not enabled():
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        with _LOCK:
            rec = _PHASES.setdefault(name, {"calls": 0, "total_s": 0.0,
                                            "max_s": 0.0})
            rec["calls"] += 1
            rec["total_s"] += dt
            rec["max_s"] = max(rec["max_s"], dt)


def report(printout=False):
    """Snapshot of phase timings; optionally pretty-print."""
    with _LOCK:
        snap = {k: dict(v) for k, v in _PHASES.items()}
    if printout and snap:
        width = max(len(k) for k in snap)
        for k in sorted(snap, key=lambda k: -snap[k]["total_s"]):
            v = snap[k]
            print(f"  {k:<{width}}  {v['total_s']:8.3f}s total  "
                  f"{v['calls']:5d} calls  {v['max_s']:7.3f}s max")
    return snap


@contextlib.contextmanager
def trace(name="pyaceqd_tpu"):
    """Capture a jax.profiler trace when PYACEQD_TPU_PROFILE=trace."""
    global _TRACE_ACTIVE
    if not trace_requested() or _TRACE_ACTIVE:
        yield
        return
    import jax
    d = os.environ.get("PYACEQD_TPU_PROFILE_DIR", "/tmp/pyaceqd_tpu_trace")
    _TRACE_ACTIVE = True
    try:
        with jax.profiler.trace(d):
            yield
        print(f"[profiling] jax.profiler trace written to {d}")
    finally:
        _TRACE_ACTIVE = False
