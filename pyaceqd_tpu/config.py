"""Precision / device configuration.

TPU v5e has no native float64: complex128 fails to compile (verified on this
hardware), while complex64 eigh/expm/matmul all work.  Therefore:

- On CPU (tests, golden validation, the driver's virtual-mesh dry runs) we
  enable JAX x64 and default to complex128, matching the reference's accuracy
  envelope (ACE writes doubles; reference kernels are complex*16,
  /root/reference/pyaceqd/two_time/propagate_tau.f90).
- On TPU we default to complex64 and keep all hot-loop math in single
  precision, which is what the MXU natively supports.

Override with env ``PYACEQD_TPU_PRECISION=single|double`` or
:func:`set_precision` (call before building any simulation).
"""

import os

import jax
import numpy as np


def _host_cache_key() -> str:
    """Hash of the host CPU identity (ISA feature flags) and jax version.

    JAX's persistent-cache key covers the HLO and compile options but NOT the
    host CPU features the XLA:CPU AOT backend specializes for — loading an
    entry compiled on an AVX-512/AMX host onto a plainer machine makes XLA
    log 'could lead to execution errors such as SIGILL' per load.  Keying the
    cache DIRECTORY by host identity gives each machine its own cache instead
    of sharing incompatible executables through a synced home dir."""
    import hashlib
    import platform
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    raw = "|".join((jax.__version__, platform.machine(), flags))
    return hashlib.sha256(raw.encode()).hexdigest()[:12]


def _init_compilation_cache():
    """Enable JAX's persistent compilation cache (measured r2: the flagship
    bench spent 545 s in compile vs 7 s running — the cache removes that tax
    on every rerun).  Opt out with PYACEQD_TPU_COMPILE_CACHE=0; redirect with
    PYACEQD_TPU_COMPILE_CACHE=<dir>."""
    env = os.environ.get("PYACEQD_TPU_COMPILE_CACHE", "").strip()
    if env == "0":
        return
    cache_dir = env or os.path.join(
        os.path.expanduser("~"), ".cache", "pyaceqd_tpu", "jaxcache",
        _host_cache_key())
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default gates (>1 s compile, >0 bytes) skip mid-size programs that
        # still dominate interactive reruns; cache everything non-trivial
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - never break import over a cache
        pass


_init_compilation_cache()


def _detect_backend() -> str:
    try:
        return jax.default_backend()
    except Exception:
        return "cpu"


_PRECISION = None  # "single" | "double"


def _init_precision():
    global _PRECISION
    if _PRECISION is not None:
        return
    env = os.environ.get("PYACEQD_TPU_PRECISION", "").strip().lower()
    if env in ("single", "double"):
        prec = env
    else:
        prec = "double" if _detect_backend() == "cpu" else "single"
    set_precision(prec)


def set_precision(prec: str):
    """Set global precision: "double" (complex128, CPU) or "single" (complex64, TPU)."""
    global _PRECISION
    if prec not in ("single", "double"):
        raise ValueError("precision must be 'single' or 'double'")
    _PRECISION = prec
    if prec == "double":
        jax.config.update("jax_enable_x64", True)
    # CRITICAL on TPU: the default matmul precision routes f32 matrix-matrix
    # products through the MXU in bfloat16 (~3 decimal digits).  Density-
    # matrix propagation multiplies thousands of near-identity matrices, and
    # bf16 rounding of the U rho U^dagger sandwich produces O(5%) errors in
    # decay rates (measured on v5e: exp(-0.94) instead of exp(-1) after 100
    # steps).  Matvec chains are unaffected (VPU, full f32), which is why the
    # bug only appears in sandwich/matmul forms.  'highest' forces the
    # 3-pass f32 MXU algorithm; our matrices are tiny (d<=18, chi<=128), so
    # the throughput cost is negligible against the correctness requirement.
    jax.config.update("jax_default_matmul_precision", "highest")


def precision() -> str:
    _init_precision()
    return _PRECISION


def cdtype():
    """Complex dtype for on-device simulation state."""
    return np.complex128 if precision() == "double" else np.complex64


def rdtype():
    """Real dtype matching :func:`cdtype`."""
    return np.float64 if precision() == "double" else np.float32
