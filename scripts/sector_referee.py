"""Static exact-kernel referee for sector-aware truncation (VERDICT r2 item 5).

The adversarial worst case documented in NOTES_round2 "Multi-level bath
accuracy": darkmodel coupling diag(0,1,1,2), dt=0.2, ALL-coherence initial
state, identity system propagator.  Every Liouville sector (i,j) then decays
by the EXACT discrete truncated-kernel dephasing

    rho_ij(n) = rho_ij(0) * exp(-G_n(i,j)),
    G_n = dnu * [n (eta_0 nu - eta_0* mu) + sum_d (n-d)(eta_d nu - eta_d* mu)]

with nu = B_ii, mu = B_jj, dnu = nu - mu.  At n_mem = 102 the plain relative
threshold truncates the Delta=2 sector wholesale (err 0.1125 measured at
chi=13); sector_norm=True rebuilds on the group-boosted functional and must
push that below 1e-2 at comparable chi.

Usage: JAX_PLATFORMS=cpu python scripts/sector_referee.py [n_mem] [chi_max]
       JAX_PLATFORMS=cpu python scripts/sector_referee.py [n_mem] [chi_max] --stationary
The --stationary mode runs the SAME exact-kernel check against the stationary
(infinite) engine: build_stationary_pt on the onsite-tail eta, identity system
propagator, all-coherence initial state, n = n_init + 3 periods of steps.
This is the chi~25 regime where NOTES_round2 measured the 0.1125
relative-threshold floor on the Delta=2 sector.
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from pyaceqd_tpu.engine import ptmpo, spectral  # noqa: E402

DT = 0.2
TEMP = 4.0
AE = 3.0


def exact_sector_dephasing(eta, n_mem, n, nu_g, mu_g):
    """exp(-G_n) for a path constant in Liouville group (nu_g, mu_g)."""
    dnu = nu_g - mu_g
    A = lambda e: dnu * (e * nu_g - np.conj(e) * mu_g)
    G = np.zeros(n, dtype=complex)
    for nn in range(1, n + 1):
        s = nn * A(eta[0])
        for dd in range(1, min(nn - 1, n_mem - 1) + 1):
            s += (nn - dd) * A(eta[dd])
        G[nn - 1] = s
    return np.exp(-G)


def run(n_mem, chi_max, threshold=1e-8, n_extra=8):
    d = 4
    B = np.diag([0.0, 1.0, 1.0, 2.0])
    g_of_s, nu, mu = ptmpo.liouville_groups(B)
    J = spectral.QDPhononJ(ae=AE)
    eta = spectral.eta_coefficients(J, DT, n_mem, TEMP, absorb_tail=False)
    n = n_mem + n_extra

    U = np.broadcast_to(np.eye(d), (n, d, d)).copy()
    rho0 = np.full((d, d), 1.0 / d, dtype=complex)   # all-coherence
    W = np.eye(d * d, dtype=complex)                  # every element
    mto = np.zeros((0, d * d, d * d))
    mks = np.zeros((0,), np.int32)

    rows = {}
    for tag, sn in (("plain", False), ("sector_norm", True)):
        t0 = time.time()
        pt = ptmpo.assemble_process_tensor(eta, g_of_s, nu, mu,
                                           np.zeros((d, d)), n,
                                           threshold=threshold,
                                           chi_max=chi_max, sector_norm=sn)
        t_build = time.time() - t0
        out, _ = ptmpo.propagate_pt(pt, U, None, rho0.reshape(-1), W, mto, mks)
        out = np.asarray(out)                          # (n+1, d2)
        errs = {}
        for s in range(d * d):
            g = g_of_s[s]
            # convention validated at thr=1e-13 / n_mem=4: engine matches
            # this expression to 7e-14 (no conjugation)
            exact = rho0.reshape(-1)[s] * \
                exact_sector_dephasing(eta, n_mem, n, nu[g], mu[g])
            err = np.max(np.abs(out[1:, s] - exact))
            key = abs(round(nu[g] - mu[g], 6))
            errs[key] = max(errs.get(key, 0.0), err)
        rows[tag] = dict(chi=pt.chi, build_s=round(t_build, 1),
                         err_by_dnu={k: float(f"{v:.3e}") for k, v in
                                     sorted(errs.items())})
        print(tag, rows[tag], flush=True)
    return rows


def run_stationary(n_mem, chi_max, threshold=1e-8, n_extra=24):
    """Same exact-kernel referee against the STATIONARY engine (ptinf).

    Uses the onsite-tail eta the stationary builder requires; the exact
    dephasing expression consumes the identical eta, so the comparison stays
    kernel-exact.  n = n_init + n_extra covers several bulk cycles."""
    from pyaceqd_tpu.engine import ptinf
    d = 4
    B = np.diag([0.0, 1.0, 1.0, 2.0])
    g_of_s, nu, mu = ptmpo.liouville_groups(B)
    J = spectral.QDPhononJ(ae=AE)
    eta = spectral.eta_coefficients(J, DT, n_mem, TEMP, absorb_tail="onsite")

    rho0 = np.full((d, d), 1.0 / d, dtype=complex)
    W = np.eye(d * d, dtype=complex)
    mto = np.zeros((0, d * d, d * d))
    mks = np.zeros((0,), np.int32)

    rows = {}
    for tag, sn in (("plain", False), ("sector_norm", True)):
        t0 = time.time()
        pt = ptinf.build_stationary_pt(eta, g_of_s, nu, mu, np.zeros((d, d)),
                                       threshold=threshold, chi_max=chi_max,
                                       sector_norm=sn, verbose=True)
        t_build = time.time() - t0
        n = pt.n_init + n_extra
        U = np.broadcast_to(np.eye(d), (n, d, d)).copy()
        out, _ = ptinf.propagate_ptinf(pt, U, None, rho0.reshape(-1), W,
                                       mto, mks)
        out = np.asarray(out)
        errs = {}
        for s in range(d * d):
            g = g_of_s[s]
            exact = rho0.reshape(-1)[s] * \
                exact_sector_dephasing(eta, n_mem, n, nu[g], mu[g])
            err = np.max(np.abs(out[1:, s] - exact))
            key = abs(round(nu[g] - mu[g], 6))
            errs[key] = max(errs.get(key, 0.0), err)
        rows[tag] = dict(chi=pt.chi, period=pt.period,
                        residual=float(f"{pt.build_residual:.3e}"),
                        build_s=round(t_build, 1),
                        err_by_dnu={k: float(f"{v:.3e}") for k, v in
                                    sorted(errs.items())})
        print(tag, rows[tag], flush=True)
    return rows


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_mem = int(args[0]) if len(args) > 0 else 102
    chi_max = int(args[1]) if len(args) > 1 else 128
    if "--stationary" in sys.argv:
        run_stationary(n_mem, chi_max)
    else:
        run(n_mem, chi_max)
