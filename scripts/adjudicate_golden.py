"""Adjudicate the r4 finite-builder golden drift (VERDICT r4 item 1).

The r4 finite-PT builder rewrite (a81b4fe 2-sweep + flush-tail truncation,
6239ae3 _strip_norm/tiling) shifted finite-PT numerics; the committed goldens
(phonon_tls x_fin, biexciton_g2 G_re) now drift 9.4e-5 / 9.8e-6 past the 1e-6
gate.  This script decides WHICH builder is right: it recomputes the
phonon_tls finite observable with the current builder at the golden threshold
(1e-8) and at progressively tighter thresholds (1e-10, 1e-11, chi_max 128),
treating the threshold-converged answer as truth, and reports

    |x_fin(thr=8, NEW) - truth|   vs   |x_fin(golden=OLD builder) - truth|

If the NEW number is closer to (or within noise of) truth, the goldens are
regenerated deliberately; if the OLD number is closer, the rewrite lost
accuracy and must be fixed.

Run: JAX_PLATFORMS=cpu python scripts/adjudicate_golden.py
"""

import os
import shutil
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PYACEQD_TPU_PRECISION", "double")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLD = os.path.join(REPO, "tests", "golden")


def run_phonon_tls_fin(threshold, chi_max, cache, window_tol=None):
    from pyaceqd_tpu.models.tls import tls
    from pyaceqd_tpu.pulses import Pulse
    p = Pulse(tau=3, e_start=0, w_gain=0, t0=10, e0=1)
    kw = {}
    if window_tol is not None:
        kw["window_tol"] = window_tol
    r = tls(0, 24, p, dt=0.1, t_mem=3.2, use_infinite=False,
            lindblad=True, phonons=True, ae=3.0, temperature=4,
            threshold=threshold, temp_dir=cache, chi_max=chi_max,
            gamma_e=0.0, **kw)
    return np.real(np.asarray(r[2]))


def main():
    cache = tempfile.mkdtemp(prefix="adjudicate_")
    try:
        golden = np.load(os.path.join(GOLD, "phonon_tls.npz"))
        x_old = np.asarray(golden["x_fin"])

        print("computing NEW builder @ thr=8 chi=64 (golden config) ...",
              flush=True)
        x_new = run_phonon_tls_fin(8, 64, cache)

        rows = []
        for thr, chi in ((9, 128), (10, 128), (11, 128)):
            print(f"computing referee @ thr={thr} chi={chi} ...", flush=True)
            rows.append(((thr, chi), run_phonon_tls_fin(thr, chi, cache)))

        # convergence of the referee ladder itself
        for i in range(len(rows) - 1):
            d = np.max(np.abs(rows[i][1] - rows[i + 1][1]))
            print(f"  referee ladder |thr={rows[i][0][0]} - "
                  f"thr={rows[i+1][0][0]}| = {d:.3e}")
        truth = rows[-1][1]

        e_new = np.max(np.abs(x_new - truth))
        e_old = np.max(np.abs(x_old - truth))
        print(f"\n|x_fin NEW(thr=8) - truth| = {e_new:.3e}")
        print(f"|x_fin OLD golden  - truth| = {e_old:.3e}")
        print(f"|NEW - OLD|                = "
              f"{np.max(np.abs(x_new - x_old)):.3e}")
        if e_new <= e_old * 1.1:
            print("\nVERDICT: NEW builder is as-or-more accurate -> "
                  "regenerate goldens deliberately (make_golden.py).")
        else:
            print("\nVERDICT: NEW builder LOST accuracy -> fix the builder.")
    finally:
        shutil.rmtree(cache, ignore_errors=True)


if __name__ == "__main__":
    main()
