"""Phonon spectral density and discretized-influence-functional coefficients.

Implements the superohmic deformation-potential coupling of a QD exciton to
LA phonons ("QDPhonon" in the reference's PT-generation vocabulary,
/root/reference/pyaceqd/general_system/general_system.py:182-186):

    J(w) = w^3 / (4 pi^2 rho hbar c_s^5) *
           (D_e exp(-w^2 a_e^2 / 4 c_s^2) - D_h exp(-w^2 a_h^2 / 4 c_s^2))^2

with GaAs material constants, electron confinement length a_e [nm] and hole
confinement a_h = a_e / factor_ah (reference exposes ``factor_ah``,
general_system.py:184-185; default 1.15).

Also computes the QUAPI/TEMPO eta coefficients — double time integrals of the
bath correlation function over time-step cells — used to build the process
tensor, and the exact independent-boson-model dephasing function used as the
engine's analytic validation target.

All frequencies in rad/ps, times in ps, energies in meV.
"""

import numpy as np

from pyaceqd_tpu.constants import hbar

K_B = 0.08617333262  # meV / K

# GaAs material parameters (standard values for QD exciton-LA-phonon coupling)
RHO_GAAS = 5370.0       # kg / m^3
C_S_GAAS = 5110.0       # m / s
D_E_GAAS = 7.0          # eV   electron deformation potential
D_H_GAAS = -3.5         # eV   hole deformation potential


class QDPhononJ:
    """Superohmic J(w) for a QD with Gaussian confinement.

    a_e in nm; temperature in K; w in rad/ps; J(w) in 1/ps (so that
    C(tau) = int dw J(w)[coth(hbar w/2kT)cos - i sin] is in 1/ps^2).
    """

    def __init__(self, ae=3.0, factor_ah=1.15, rho=RHO_GAAS, c_s=C_S_GAAS,
                 D_e=D_E_GAAS, D_h=D_H_GAAS):
        self.ae = ae
        self.ah = ae / factor_ah
        # prefactor in SI: 1/(4 pi^2 rho hbar_SI c^5) [1/(J^2 s^4 / ...)]
        hbar_SI = 1.054571817e-34
        eV = 1.602176634e-19
        self._pref_SI = (D_e * eV, D_h * eV, 4 * np.pi**2 * rho * hbar_SI * c_s**5)
        self.c_s_nm_ps = c_s * 1e-3  # nm / ps
        # exponent scales: (w a / 2 c)^2 with w in rad/ps, a in nm, c in nm/ps

    def __call__(self, w):
        """J(w), w in rad/ps, result in 1/ps."""
        w = np.asarray(w, dtype=float)
        De, Dh, denom = self._pref_SI
        w_SI = w * 1e12
        fe = De * np.exp(-(w * self.ae / (2 * self.c_s_nm_ps)) ** 2)
        fh = Dh * np.exp(-(w * self.ah / (2 * self.c_s_nm_ps)) ** 2)
        J_SI = w_SI**3 / denom * (fe - fh) ** 2  # 1/s, per rad/s
        # C_ps [1/ps^2] = C_SI [1/s^2] * 1e-24 and dw_SI = 1e12 dw_ps, so
        # J_ps(w_ps) = J_SI(w_SI) * 1e12 * 1e-24 = J_SI * 1e-12
        return J_SI * 1e-12

    def polaron_shift(self):
        """delta_p = int J(w)/w dw in rad/ps (energy shift hbar*delta_p meV)."""
        w, dw = _omega_grid(self, 30.0)
        return np.trapezoid(self(w) / w, w)


class TabulatedJ:
    """J(w) from a file of (energy[meV], J[value]) rows — the reference's
    ``Boson_J_from_file`` path (general_system.py:179)."""

    def __init__(self, filename):
        data = np.genfromtxt(filename)
        self._w = data[:, 0] / hbar  # meV -> rad/ps
        self._J = data[:, 1]

    def __call__(self, w):
        return np.interp(np.asarray(w, dtype=float), self._w, self._J,
                         left=0.0, right=0.0)

    def polaron_shift(self):
        w = self._w[self._w > 1e-9]
        return np.trapezoid(self(w) / w, w)


def _omega_grid(J, e_max_mev, n=40000):
    """Integration grid avoiding w=0 (integrands are finite there but we
    evaluate from a small positive offset)."""
    w_max = e_max_mev / hbar
    w = np.linspace(w_max / n, w_max, n)
    return w, w[1] - w[0]


def coth(x):
    return 1.0 / np.tanh(x)


def eta_coefficients(J, dt, n_mem, temperature, e_max_mev=7.0,
                     absorb_tail=True):
    """QUAPI eta coefficients for time step dt and memory n_mem steps.

    eta[0]   = int dw J/w^2 [coth(hw/2kT)(1-cos w dt) - i(w dt - sin w dt)]
    eta[d>0] = int dw J/w^2 * 2(1-cos w dt) [coth(hw/2kT) cos(w d dt) - i sin(w d dt)]

    (double integrals of C(t-t') over same/offset dt-cells; see e.g. the
    QUAPI/TEMPO literature).  Returns complex array of length n_mem.

    absorb_tail folds the kernel beyond the memory window back into the
    window (QUAPI "termination").  A sharp cut (absorb_tail=False) leaves the
    long-time dephasing rate off by -Re(tail), which for the superohmic QD
    kernel is a spurious coherence GROWTH linear in t (measured: |rho_01| off
    by 0.15 after 20 ps at t_mem=1.6); absorption restores the exact rate and
    leaves only a constant offset.  Modes:

    - True / "last": eta[n_mem-1] += sum_{d >= n_mem} eta_d.  Most accurate
      (offset (n_mem-1)*T; measured IBM |mag| error at 40 ps: t_mem=1.6
      5e-3, 3.2 3.6e-5, 6.4 6e-8 vs sharp 0.5 / 3.8e-3 / 1.2e-7) — use for
      the FINITE builder.  The lumped bump at the window edge destabilizes
      the stationary builder's periodic fixed point (engine/ptinf.py).
    - "onsite": eta[0] += sum_{d >= n_mem} eta_d.  Slightly larger constant
      offset (sum d*eta_d; measured 1.8e-2 / 3.5e-4 / 4.7e-8) but touches
      only the on-site factor, PRESERVING the stationary builder's periodic
      fixed point — use for the infinite/repeat engine.
    - False: sharp cut, bit-parity with ACE's t_mem semantics (reference
      general_system.py:161-174 relies on t_mem >= 6.4 instead).
    """
    w, _ = _omega_grid(J, e_max_mev)
    Jw = J(w) / w**2
    if temperature > 0:
        cth = coth(hbar * w / (2 * K_B * temperature))
    else:
        cth = np.ones_like(w)
    # tail extent: cover the physical kernel decay (~10 ps for the QD
    # superohmic bath) plus the slow power-law residue
    if absorb_tail not in (False, True, "last", "onsite"):
        raise ValueError(f"absorb_tail must be False, True/'last' or "
                         f"'onsite', got {absorb_tail!r}")
    n_tail = max(int(round(10.0 / dt)), 2 * n_mem) if absorb_tail else 0
    n_tot = n_mem + n_tail
    eta = np.empty(n_tot, dtype=complex)
    eta[0] = np.trapezoid(Jw * (cth * (1 - np.cos(w * dt))
                                - 1j * (w * dt - np.sin(w * dt))), w)
    base = Jw * 2 * (1 - np.cos(w * dt))
    dw = w[1] - w[0]
    # trapezoid with uniform grid == dot with weights; vectorize over d in
    # chunks (d-major phase matrix)
    wt = np.full(len(w), dw)
    wt[0] = wt[-1] = dw / 2
    bw = base * wt
    cw = cth * bw

    def _fill(lo_all, hi_all):
        for lo in range(lo_all, hi_all, 256):
            hi = min(hi_all, lo + 256)
            ph = np.outer(np.arange(lo, hi), w * dt)
            eta[lo:hi] = np.cos(ph) @ cw - 1j * (np.sin(ph) @ bw)

    _fill(1, n_tot)
    if absorb_tail:
        # the fixed ~10 ps horizon covers the QD superohmic kernel, but a
        # TabulatedJ / long-memory bath may decay slower — grow the horizon
        # until a doubling stops MOVING THE ABSORBED SUM (ADVICE r2), capped
        # at 16x to bound the cost.  The per-coefficient magnitude is the
        # wrong signal: the finite-T kernel has an oscillating algebraic
        # ~1/d tail whose magnitude never reaches machine level, while the
        # signed sum converges fast (measured, QD bath dt=0.1: total
        # absorbed tail 1.4e-6*|eta0|, captured to 6e-7 by the 10 ps
        # horizon and converging ~1/D after — far below the absorption
        # modes' own systematic offsets ~1e-4, see the mode docs above).
        sum_cut = 1e-6 * max(abs(eta[0]), 1e-300)
        n_cap = n_mem + 16 * n_tail
        block = np.inf
        while block > sum_cut and n_tot < n_cap:
            new_tot = min(2 * n_tot, n_cap)
            eta = np.concatenate([eta, np.empty(new_tot - n_tot, complex)])
            _fill(n_tot, new_tot)
            block = abs(np.sum(eta[n_tot:new_tot]))
            n_tot = new_tot
        if block > 10 * sum_cut:
            import warnings
            warnings.warn(
                f"eta tail absorption truncated at {n_tot} steps with the "
                f"last doubling still contributing |sum|={block:.2e} "
                f"(cut {sum_cut:.2e}); the absorbed dephasing rate is "
                f"partially corrected — check the bath kernel's decay")
    if absorb_tail == "onsite":
        eta[0] += np.sum(eta[n_mem:])
    elif absorb_tail:
        eta[n_mem - 1] += np.sum(eta[n_mem:])
    return eta[:n_mem]


def ibm_dephasing(J, t, temperature, e_max_mev=7.0, subtract_polaron=True):
    """Exact independent-boson-model off-diagonal factor for a TLS coupled
    diagonally (boson_op = |1><1|): rho_01(t)/rho_01(0) = exp(-Gamma + i Psi).

    Gamma(t) = int dw J/w^2 coth(hw/2kT)(1-cos wt)
    Psi(t)   = int dw J/w^2 (sin wt - wt)     [polaron-subtracted: + wt back]

    This is the engine's primary accuracy gate: the PT-MPO propagation must
    reproduce it (pure dephasing is exactly solvable; SURVEY.md §4).
    """
    w, _ = _omega_grid(J, e_max_mev)
    Jw = J(w) / w**2
    if temperature > 0:
        cth = coth(hbar * w / (2 * K_B * temperature))
    else:
        cth = np.ones_like(w)
    t = np.atleast_1d(np.asarray(t, dtype=float))
    gamma = np.array([np.trapezoid(Jw * cth * (1 - np.cos(w * ti)), w) for ti in t])
    psi = np.array([np.trapezoid(Jw * np.sin(w * ti), w) for ti in t])
    if not subtract_polaron:
        psi = psi - np.trapezoid(Jw * w, w) * t
    return np.exp(-gamma + 1j * psi)
