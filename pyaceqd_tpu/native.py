"""ctypes bindings for the native PT-MPO builder (native/ptmpo_native.cpp).

The builder is the host-side "graph construction" stage — the counterpart of
the reference's external C++ PT-MPO engine (ACE, driven through
pyaceqd/general_system.py) — producing the per-step process-tensor MPO that
the XLA propagation path consumes.  Falls back to the pure-numpy
implementation in engine/ptmpo.py when the shared library has not been built
(``make -C native``) or when PYACEQD_TPU_NATIVE=0.
"""

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib_path():
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "native", "libptmpo_native.so")


def _build_lib():
    """Best-effort compile of the native library (g++ + system LAPACK)."""
    import subprocess
    native_dir = os.path.dirname(_lib_path())
    try:
        subprocess.run(["make", "-C", native_dir], check=True,
                       capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def _find_openblas():
    """Locate scipy's bundled LP64 OpenBLAS (symbols prefixed scipy_)."""
    import glob
    try:
        import scipy
        libs = os.path.join(os.path.dirname(os.path.dirname(scipy.__file__)),
                            "scipy.libs")
        hits = glob.glob(os.path.join(libs, "libscipy_openblas-*.so"))
        if hits:
            return hits[0]
    except Exception:
        pass
    return ""


def get_lib(auto_build=True):
    """Load (building if necessary) the native library, or None."""
    global _LIB, _TRIED
    if _LIB is not None:
        return _LIB
    if _TRIED:
        return None
    _TRIED = True
    if os.environ.get("PYACEQD_TPU_NATIVE", "1") == "0":
        return None
    path = _lib_path()
    src = os.path.join(os.path.dirname(path), "ptmpo_native.cpp")
    stale = (os.path.exists(path) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(path))
    if (not os.path.exists(path) or stale) and auto_build:
        if not _build_lib():
            if not os.path.exists(path):
                return None
            # rebuild failed but a (stale) binary exists: loading it would
            # silently run old native code against newer Python expectations
            # (ADVICE r4) — warn so the mismatch is visible
            import warnings
            warnings.warn(
                "pyaceqd_tpu.native: rebuild of {} failed; falling back to "
                "the STALE library at {} (source is newer).  Run `make -C "
                "native` to see the compiler error.".format(src, path))
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.pt_init.restype = ctypes.c_int
    lib.pt_init.argtypes = [ctypes.c_char_p]
    rc = lib.pt_init(_find_openblas().encode())
    if rc < 0:
        return None
    c128 = np.ctypeslib.ndpointer(np.complex128, flags="C_CONTIGUOUS")
    f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    try:
        lib.pt_build2.restype = ctypes.c_int
        lib.pt_build2.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, c128, c128, i32, ctypes.c_double, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, c128, i32, i32]
    except AttributeError:  # pragma: no cover - stale pre-v2 library
        pass
    lib.ptinf_new.restype = ctypes.c_void_p
    lib.ptinf_new.argtypes = [ctypes.c_int] * 6 + [c128, c128, i32]
    lib.ptinf_step.restype = ctypes.c_int
    lib.ptinf_step.argtypes = [ctypes.c_void_p, ctypes.c_double, c128, i32,
                               f64, i32, c128, i32, ctypes.c_int]
    lib.ptinf_seed.restype = None
    lib.ptinf_seed.argtypes = [ctypes.c_void_p, ctypes.c_int]
    try:
        lib.ptinf_capped.restype = ctypes.c_int
        lib.ptinf_capped.argtypes = [ctypes.c_void_p]
    except AttributeError:  # pragma: no cover - pre-capped-flag library
        pass
    lib.ptinf_double.restype = None
    lib.ptinf_double.argtypes = [ctypes.c_void_p]
    lib.ptinf_free.restype = None
    lib.ptinf_free.argtypes = [ctypes.c_void_p]
    lib.ptinf_prof.restype = None
    lib.ptinf_prof.argtypes = [ctypes.c_void_p, f64]
    _LIB = lib
    return _LIB


class NativePtinfStepper:
    """Per-iteration worker for the stationary PT build, backed by the C++
    library (see native/ptmpo_native.cpp 'stationary (ptinf) stepper').  Same
    contract as ptinf._PyStepper: step() -> None while the window fills, else
    (Q, schmidt_spectrum, L_win); seed(period) locks ranks / seeds alignment;
    double() doubles the elementwise period."""

    def __init__(self, b0, bD, d_of_g, w_eff, chi_max, max_period):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native ptmpo library unavailable")
        self._lib = lib
        G = len(b0)
        D = bD.shape[1] if len(bD) else 1
        b0 = np.ascontiguousarray(b0, dtype=np.complex128)
        bD = np.ascontiguousarray(bD, dtype=np.complex128)
        if bD.size == 0:
            bD = np.zeros((1, D, G), dtype=np.complex128)
        d_of_g = np.ascontiguousarray(d_of_g, dtype=np.int32)
        self._chi_pad = int(chi_max)
        self._G = G
        self._h = lib.ptinf_new(G, D, bD.shape[0], int(w_eff), int(chi_max),
                                int(max_period), b0, bD.reshape(-1), d_of_g)
        cp = self._chi_pad
        self._q = np.zeros((cp, G, cp), dtype=np.complex128)
        self._qd = np.zeros(2, dtype=np.int32)
        self._spec = np.zeros(cp, dtype=np.float64)
        self._sl = np.zeros(1, dtype=np.int32)
        self._lw = np.zeros((cp, cp), dtype=np.complex128)
        self._ld = np.zeros(2, dtype=np.int32)

    def step(self, thr):
        rc = self._lib.ptinf_step(self._h, float(thr), self._q.reshape(-1),
                                  self._qd, self._spec, self._sl,
                                  self._lw.reshape(-1), self._ld,
                                  self._chi_pad)
        if rc == 0:
            return None
        if rc < 0:
            raise RuntimeError("native ptinf_step: bond exceeded chi_pad")
        Q = self._q[:self._qd[0], :, :self._qd[1]].copy()
        spec = self._spec[:self._sl[0]].copy()
        L = self._lw[:self._ld[0], :self._ld[1]].copy()
        return Q, spec, L

    def seed(self, period):
        self._lib.ptinf_seed(self._h, int(period))

    def capped(self):
        """True if any unlocked truncation so far was bound by chi_max (the
        cap, not the SVD threshold, decided a cut)."""
        if not hasattr(self._lib, "ptinf_capped"):
            return None
        return bool(self._lib.ptinf_capped(self._h))

    def prof(self):
        """Per-section cumulative seconds (PYACEQD_TPU_NATIVE_PROF=1 runs)."""
        buf = np.zeros(16, dtype=np.float64)
        self._lib.ptinf_prof(self._h, buf)
        keys = ("zip", "qr1", "svd", "qr2", "emit", "lwin", "spec", "steps",
                "max_bond", "avg_bond", "warm_s", "warm_n", "rand_s",
                "rand_n", "exact_s", "exact_n")
        return dict(zip(keys, buf.tolist()))

    def double(self):
        self._lib.ptinf_double(self._h)

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.ptinf_free(self._h)
                self._h = None
        except Exception:
            pass


def build_pt_tensors_native(eta, nu, mu, n_steps, threshold=1e-8, chi_max=64,
                            eta_cut=1e-10, verbose=False, b0_scale=None,
                            stats=None, tile_tol="auto"):
    """Native equivalent of engine.ptmpo.build_pt_tensors (same 4-sweep
    segment-scoped structure, flush truncation, and converged-emission
    tiling — see that docstring).

    Returns a list of n_steps (chi_l, G, chi_r) complex tensors, or None if
    the native library is unavailable (caller falls back to numpy).
    stats, if a dict, receives ``capped`` (whether chi_max, not the SVD
    threshold, bound any truncation) and ``tiled_from`` (emission index
    tiling started at, when it fired) — same contract as the numpy builder —
    plus ``rsvd_n``, the number of truncations that took the randomized SVD
    path (0 by default: the finite path is all-exact since the r5
    adjudication; PYACEQD_TPU_NATIVE_RSVD=1 opts the zip pre-truncation in
    for throwaway builds)."""
    lib = get_lib()
    if lib is None or not hasattr(lib, "pt_build2"):
        return None
    from pyaceqd_tpu.engine.ptmpo import influence_factors
    n_mem = len(eta)
    b0, bD, d_of_g = influence_factors(eta, nu, mu)
    if b0_scale is not None:
        b0 = b0 * np.asarray(b0_scale)
    G = len(b0)
    D = bD.shape[1] if len(bD) else 1
    mags = np.abs(eta)
    big = np.where(mags[1:] > eta_cut * mags[0])[0]
    w_eff = int(big[-1] + 1) if len(big) else 1
    if tile_tol == "auto":
        tile_tol = max(10.0 * float(threshold), 1e-9)
    tile_tol = float(tile_tol or 0.0)

    b0 = np.ascontiguousarray(b0, dtype=np.complex128)
    bD = np.ascontiguousarray(bD, dtype=np.complex128)
    if bD.size == 0:
        bD = np.zeros((1, D, G), dtype=np.complex128)
    d_of_g = np.ascontiguousarray(d_of_g, dtype=np.int32)

    chi_pad = int(chi_max)
    out = np.zeros((n_steps, chi_pad, G, chi_pad), dtype=np.complex128)
    dims = np.zeros((n_steps, 2), dtype=np.int32)
    info = np.zeros(2, dtype=np.int32)
    rc = lib.pt_build2(n_steps, n_mem, G, D, w_eff, b0, bD.reshape(-1),
                       d_of_g, float(threshold), int(chi_max), chi_pad,
                       tile_tol, out.reshape(-1), dims.reshape(-1), info)
    if rc == -1:  # a bond exceeded the pad (shouldn't happen: pad == chi_max)
        chi_pad = 2 * chi_pad
        out = np.zeros((n_steps, chi_pad, G, chi_pad), dtype=np.complex128)
        rc = lib.pt_build2(n_steps, n_mem, G, D, w_eff, b0, bD.reshape(-1),
                           d_of_g, float(threshold), int(chi_max), chi_pad,
                           tile_tol, out.reshape(-1), dims.reshape(-1), info)
    if rc not in (0, 1):  # 1 = success with the cap binding somewhere
        return None
    if stats is not None:
        stats["capped"] = rc == 1
        stats["rsvd_n"] = int(info[1])
        if info[0] >= 0:
            stats["tiled_from"] = int(info[0])
    return [np.ascontiguousarray(out[i, :dims[i, 0], :, :dims[i, 1]])
            for i in range(n_steps)]
