"""General toolbox: adaptive time grids, density-matrix helpers, operator-string
generators, concurrence, dynamical-map algebra, unit conversions.

Functional parity with the reference's ``pyaceqd/tools.py``; implementations
are original.  Host-side (NumPy) by design: these run once per simulation
setup.  Batched/accelerated versions of the dynamical-map propagation live in
``pyaceqd_tpu.engine.dynmap`` (lax.scan / Pallas); the loops here are the
small, obviously-correct references used in cross-method tests.
"""

import itertools
import re
from functools import wraps
from typing import Optional

import numpy as np



# ---------------------------------------------------------------------------
# adaptive time grids  (reference: pyaceqd/tools.py:9-135)
# ---------------------------------------------------------------------------

def _merge_intervals(intervals):
    """Merge sorted, possibly-overlapping [start, end] intervals in place.

    Touching bounds merge too: [[0,1],[1,2]] -> [[0,2]].
    (reference semantics: pyaceqd/tools.py:9-26)
    """
    out = []
    for iv in intervals:
        if out and iv[0] <= out[-1][1]:
            out[-1][1] = max(out[-1][1], iv[1])
        else:
            out.append(list(iv))
    # mutate the caller's list like the reference does
    intervals[:] = out
    return intervals


def get_gaussian_t(t0, tend, *pulses, dt_max=1.0, dt_min=0.01, interval_per_step=0.05):
    """Pulse-area-equidistant time sampling: emit a grid point whenever the
    accumulated pulse area grows by ``interval_per_step``, at most ``dt_max``
    apart, on a ``dt_min`` base grid.  (reference: pyaceqd/tools.py:28-44)"""
    t_test = np.arange(t0, tend, dt_min)
    integ = np.zeros_like(t_test)
    for p in pulses:
        integ = integ + p.get_integral(t_test)
    t_array = [t0]
    counter = 0
    n_max = int(dt_max / dt_min)
    acc = 0.0
    for i in range(1, len(t_test)):
        acc += integ[i] - integ[i - 1]
        counter += 1
        if acc >= interval_per_step or counter == n_max:
            t_array.append(t_test[i])
            counter = 0
            acc = 0.0
    return np.array(t_array)


def construct_t(t0, tend, dt_small=0.1, dt_big=1.0, dt_exp=None, *pulses, factor_tau=4,
                simple_exp=False, gaussian_t=False, add_tend=True):
    """t-axis with ``dt_small`` sampling inside +-factor_tau*tau of each pulse and
    ``dt_big`` elsewhere; optional exponential tail.  (reference: pyaceqd/tools.py:46-107)"""
    # many call sites (incl. the reference's own, e.g. onephoton.py:84) pass
    # pulses right after dt_big, so the first pulse lands in the dt_exp slot;
    # treat a pulse-like dt_exp as the first pulse
    if dt_exp is not None and hasattr(dt_exp, "get_total"):
        pulses = (dt_exp,) + tuple(pulses)
        dt_exp = None
    if dt_exp is None:
        dt_exp = dt_small
    t0s, taus = [], []
    for _p in pulses:
        if t0 < _p.t0 < tend:
            t0s.append(_p.t0)
            taus.append(_p.tau)
        else:
            if _p.t0 > tend:
                print("WARNING: tend is smaller than the end of a pulse")
            if _p.t0 < t0:
                print("WARNING: t0 is greater than the start of a pulse")
    t0s = np.array(t0s)
    taus = np.array(taus)
    start_v = t0s - factor_tau * taus
    end_v = t0s + factor_tau * taus
    order = np.argsort(start_v)
    intervals = [[start_v[i], end_v[i]] for i in order]
    intervals = _merge_intervals(intervals)
    if not intervals:  # no pulse in range: uniform coarse grid
        ts = [np.arange(t0, tend, dt_big)]
        if add_tend:
            ts.append(np.array([tend]))
        return np.concatenate(ts, axis=0)
    if intervals[0][0] < t0:
        print("WARNING: t0 is greater than the start of the first pulse")
    if intervals[-1][1] > tend:
        print("WARNING: tend is smaller than the end of the last pulse")
    ts = [np.arange(t0, intervals[0][0], dt_big)]
    if simple_exp and len(intervals) == 1 and intervals[0][1] != 0:
        if gaussian_t:
            ts.append(get_gaussian_t(intervals[0][0], intervals[0][1], *pulses,
                                     dt_max=dt_big, dt_min=dt_small, interval_per_step=0.05))
        else:
            ts.append(np.arange(intervals[0][0], intervals[0][1], dt_small))
        _exp_part = np.exp(np.arange(np.log(intervals[0][1]), np.log(tend), dt_exp))
        ts.append(np.round(_exp_part))
        ts.append(np.array([tend]))
        return np.concatenate(ts, axis=0)
    for i in range(len(intervals)):
        if i > 0:
            ts.append(np.arange(intervals[i - 1][1], intervals[i][0], dt_big))
        ts.append(np.arange(intervals[i][0], intervals[i][1], dt_small))
    ts.append(np.arange(intervals[-1][1], tend, dt_big))
    if add_tend:
        ts.append(np.array([tend]))
    return np.concatenate(ts, axis=0)


def round_to_dt(t, dt):
    """Round grid to multiples of dt, dropping duplicates but keeping order.
    (reference: pyaceqd/tools.py:109-117)"""
    result = np.round(np.asarray(t) / dt) * dt
    _, idx = np.unique(result, return_index=True)
    return result[np.sort(idx)]


def simple_t_gaussian(t0, texp, tend, dt_small=0.1, dt_big=1.0, *pulses, decimals=2,
                      exp_part=True, add_tend=True):
    """Gaussian (area-equidistant) spacing on [t0, texp], then exponential (or
    dt_big-linear) spacing to tend.  (reference: pyaceqd/tools.py:119-135)"""
    ts = [get_gaussian_t(t0, texp, *pulses, dt_max=dt_big, dt_min=dt_small, interval_per_step=0.05)]
    if exp_part:
        ts.append(np.exp(np.arange(np.log(texp - t0), np.log(tend - t0), dt_small)) + t0)
    else:
        ts.append(np.arange(texp, tend, dt_big))
    if add_tend:
        ts.append(np.array([tend]))
    return round_to_dt(np.concatenate(ts, axis=0), dt_small)


# ---------------------------------------------------------------------------
# csv / (de)serialization  (reference: pyaceqd/tools.py:137-186)
# ---------------------------------------------------------------------------

def export_csv(filename, *arg, precision=4, delimit=',', verbose=False):
    """Save columns to a delimited text file with fixed precision."""
    fmt = ["%.{k}f".format(k=precision)] * len(arg)
    np.savetxt(filename, np.c_[arg], fmt=fmt, delimiter=delimit, newline='\n')
    if verbose:
        print("[i] csv saved to {}".format(filename))


def serialize_dm(rho):
    """Flatten a density matrix into a real vector [Re..., Im...]."""
    return np.concatenate((np.real(rho).flatten(), np.imag(rho).flatten()))


def deserialize_dm(v):
    dim = int(np.sqrt(len(v) / 2))
    return v[:dim**2].reshape((dim, dim)) + 1j * v[dim**2:].reshape((dim, dim))


# ---------------------------------------------------------------------------
# concurrence / density-matrix composition  (reference: pyaceqd/tools.py:167-201)
# ---------------------------------------------------------------------------

def concurrence(rho):
    """Wootters concurrence of a two-qubit density matrix (4x4).

    C = max(0, l1 - l2 - l3 - l4) with l_i the sorted square roots of the
    eigenvalues of rho.T_f.rho*.T_f, T_f the spin-flip (antidiagonal -1,1,1,-1).
    (reference: pyaceqd/tools.py:167-172)
    """
    T_matrix = np.flip(np.diag([-1., 1., 1., -1.]), axis=1)
    M_matrix = rho @ T_matrix @ np.conjugate(rho) @ T_matrix
    _eigvals = np.real(np.linalg.eigvals(M_matrix))
    _eigvals = np.sqrt(np.abs(np.sort(_eigvals)))
    return np.max([0.0, _eigvals[-1] - np.sum(_eigvals[:-1])])


def compose_dm(outputs, dim=2):
    """Assemble rho(t) from per-matrix-element output traces.

    outputs[0] is the time axis; outputs[1:] are the upper-triangle matrix
    elements in the order produced by :func:`output_ops_dm`; the lower triangle
    is filled by conjugation.  (reference: pyaceqd/tools.py:188-201)
    """
    rho = np.zeros((len(outputs[0]), dim, dim), dtype=np.complex128)
    n = 1
    for j in range(dim):
        for k in range(j, dim):
            rho[:, j, k] = outputs[n]
            rho[:, k, j] = np.conjugate(outputs[n])
            n += 1
    t = np.real(outputs[0])
    return t, rho


# ---------------------------------------------------------------------------
# operator-string generators  (reference: pyaceqd/tools.py:203-304)
# ---------------------------------------------------------------------------

def generate_basis_states(dim):
    """Cartesian-product basis index tuples for a composite space with subsystem
    dimensions ``dim`` (list)."""
    return list(itertools.product(*[range(d) for d in dim]))


def basis_states(dim):
    """Readable |i,j,...> labels for a (composite) space."""
    if not isinstance(dim, list):
        dim = [dim]
    out = []
    for bs in generate_basis_states(dim):
        out.append('|' + ','.join(str(i) for i in bs) + '⟩')
    return out


def matrix_element_operators(basis_states, dim, readable=False):
    """Operator strings |b><k| (upper triangle incl. diagonal) for each pair of
    composite basis states."""
    operators = []
    for i in range(len(basis_states)):
        bra_state = basis_states[i]
        for j in range(i, len(basis_states)):
            ket_state = basis_states[j]
            parts = []
            for k, (b, kk) in enumerate(zip(bra_state, ket_state)):
                if readable:
                    parts.append(f'|{b}⟩⟨{kk}|_{dim[k]}')
                else:
                    parts.append(f'|{b}><{kk}|_{dim[k]}')
            sep = ' ⊗ ' if readable else ' otimes '
            operators.append(sep.join(parts))
    return operators


def output_ops_dm(dim=[2, 2], readable=False):
    """Output-operator strings whose expectation values give the full density
    matrix (upper triangle); feed results to :func:`compose_dm`."""
    if not isinstance(dim, (list, tuple)):
        dim = [dim]
    return matrix_element_operators(generate_basis_states(dim), dim, readable=readable)


def op_to_matrix(op):
    """Parse a single ``|n><m|_d`` string (optionally parenthesized) to a dense
    matrix.  Kept for reference parity (pyaceqd/tools.py:260-304); the general
    expression parser is :func:`pyaceqd_tpu.ops.dsl.parse_operator`."""
    dim_match = re.search(r"_(\d+)(?:\[.*\])?", op)
    if not dim_match:
        raise ValueError(f"Invalid dimension format in operator: {op}")
    dim = int(dim_match.group(1))
    match = re.match(r"[(]*\|(\d+)><(\d+)\|_[\d)]*", op)
    if match:
        ket_idx = int(match.group(1))
        bra_idx = int(match.group(2))
        if ket_idx >= dim or bra_idx >= dim:
            raise ValueError(f"Index out of bounds: ket_idx={ket_idx}, bra_idx={bra_idx}, dim={dim}")
        m = np.zeros((dim, dim), dtype=complex)
        m[ket_idx, bra_idx] = 1.0
        return m
    # fall back to the general parser for composite expressions
    from pyaceqd_tpu.ops.dsl import parse_operator
    return parse_operator(op)


# ---------------------------------------------------------------------------
# calibration files  (reference: pyaceqd/tools.py:308-346)
# ---------------------------------------------------------------------------

def read_calibration_file(calibration_file):
    """Read experimentally measured quantum-dot parameters from an INI file.

    Returns (E_X, E_Y, E_Dx, E_Dy, E_binding, gamma_e, gamma_b, gamma_d,
    g_ex, g_hx, g_ez, g_hz)."""
    import configparser
    config = configparser.ConfigParser()
    config.read(calibration_file)

    central_wavelength = float(config['EMISSION']['exciton_wavelength'])  # nm
    biexciton_wavelength = float(config['EMISSION']['biexciton_wavelength'])
    dark_wavelength = float(config['EMISSION']['dark_wavelength'])

    fss_bright = float(config['SPLITTING']['fss_bright']) * 1e-3  # meV
    fss_dark = float(config['SPLITTING']['fss_dark']) * 1e-3

    lifetime_exciton = float(config['LIFETIMES']['exciton'])  # ps
    lifetime_biexciton = float(config['LIFETIMES']['biexciton'])

    g_ex = float(config['G_FACTORS']['g_ex'])
    g_hx = float(config['G_FACTORS']['g_hx'])
    g_ez = float(config['G_FACTORS']['g_ez'])
    g_hz = float(config['G_FACTORS']['g_hz'])

    exciton_meV = 1239.8e3 / central_wavelength
    biexciton_meV = 1239.8e3 / biexciton_wavelength
    dark_meV = 1239.8e3 / dark_wavelength

    exciton_x_energy = fss_bright / 2
    exciton_y_energy = -fss_bright / 2
    binding_energy = -(exciton_meV - biexciton_meV)
    dark_energy = dark_meV - exciton_meV
    dark_x_energy = dark_energy + fss_dark / 2
    dark_y_energy = dark_energy - fss_dark / 2

    gamma_e = 1 / lifetime_exciton
    gamma_b = 1 / (lifetime_biexciton * 2)
    gamma_d = 0

    return (exciton_x_energy, exciton_y_energy, dark_x_energy, dark_y_energy,
            binding_energy, gamma_e, gamma_b, gamma_d, g_ex, g_hx, g_ez, g_hz)


# ---------------------------------------------------------------------------
# resampling / basis rotation  (reference: pyaceqd/tools.py:352-398)
# ---------------------------------------------------------------------------

def resample(x, y, z, s_x, s_y):
    """Down-sample a 2D map by integer strides (s_x, s_y)."""
    x_new = np.asarray(x)[: (len(x) // s_x) * s_x : s_x][: len(x) // s_x]
    y_new = np.asarray(y)[: (len(y) // s_y) * s_y : s_y][: len(y) // s_y]
    z_new = np.asarray(z)[: len(y_new) * s_y : s_y, : len(x_new) * s_x : s_x]
    return x_new, y_new, z_new


def rotate_basis(rho, U_rot):
    """rho -> U rho U^dagger (batched over leading axes)."""
    return U_rot @ rho @ U_rot.conj().T


# ---------------------------------------------------------------------------
# dynamical-map algebra  (reference: pyaceqd/tools.py:446-734)
# host-numpy reference implementations; see engine/dynmap.py for the
# scan/vmap/Pallas fast paths.
# ---------------------------------------------------------------------------

def default_pinv_rcond():
    """pinv cutoff matched to the precision the maps were computed at.

    The reference uses rcond=1e-12 (f64 ACE maps, reference tools.py:446-484).
    Device maps computed at single precision carry ~1e-7 relative noise; a
    1e-12 cut KEEPS those noise directions, and after a rank-deficient MTO
    insertion (e.g. the G2 sandwich sigma.rho.sigma^dag, a rank-1 superop)
    the pinv amplifies them by ~1e5 (measured: purity G2 tl blocks hit 2e5,
    corrupting the G2 integrals by the same factor).  3e-6 cuts safely above
    the f32 noise floor."""
    from pyaceqd_tpu import config
    return 1e-12 if config.precision() == "double" else 3e-6


def calc_tl_dynmap_pseudo(dm, times, debug=False, rcond=None):
    """Time-local maps E(t_{i+1}, t_i) from accumulated maps E(t_{i+1}, t_0).

    E(t_{i+1},t_i) = E(t_{i+1},t_0) @ pinv(E(t_i,t_0), rcond) with rcond
    matched to the map precision (see default_pinv_rcond; reference
    semantics: pyaceqd/tools.py:446-484 at fixed 1e-12).
    """
    if rcond is None:
        rcond = default_pinv_rcond()
    times = np.round(times, 4)
    n = dm.shape[1]
    _dm_tl = np.zeros((len(times) - 1, n, n), dtype=complex)
    _dm_tl[0] = dm[0]
    for i in range(1, len(_dm_tl)):
        _dm_tl[i] = dm[i] @ np.linalg.pinv(dm[i - 1], rcond=rcond)
    return _dm_tl


def extract_dms(dm, times, tau_c, t_MTOs):
    """Split time-local maps into the within-memory blocks around t=0 and each
    MTO time, plus the stationary map beyond the memory time tau_c.
    (reference semantics: pyaceqd/tools.py:486-545)

    Returns (tl_map, [block_initial, block_mto_1, ...]); each block has
    len_tauc = index of first time > t0+tau_c maps."""
    i_timelocal = np.where(times > times[0] + tau_c)[0][0]
    len_tauc = i_timelocal
    i_tmtos = []
    for t_MTO in t_MTOs:
        hits = np.where(times == t_MTO)[0]
        if len(hits) == 0:
            raise ValueError(
                f"t_MTO {t_MTO} not found in times array. Make sure that t_MTO is included in the times array.")
        i_tmtos.append(hits[0])
    tl_dms = [dm[:len_tauc]]
    for i_tmto in i_tmtos:
        tl_dms.append(dm[i_tmto:i_tmto + len_tauc])
    tl_map = dm[i_timelocal]
    return tl_map, tl_dms


def check_tl_map_params(tl_map, rho0):
    n = int(rho0.shape[0])
    if rho0.shape[1] != n:
        raise ValueError(f"rho0 must be a {n}x{n} matrix")
    if tl_map.shape != (n**2, n**2):
        raise ValueError("tl_map must be a {}x{} matrix, is {}".format(n**2, n**2, np.shape(tl_map)))
    return n


def use_tl_map(tl_map, times, rho0):
    """Propagate rho0 with a single stationary map over the whole grid."""
    n = check_tl_map_params(tl_map, rho0)
    rho = np.zeros((len(times), n * n), dtype=complex)
    rho[0] = rho0.reshape(n * n)
    for i in range(len(times) - 1):
        rho[i + 1] = tl_map @ rho[i]
    return rho.reshape(len(times), n, n)


def use_dm_block(dm, rho0):
    """Propagate rho0 through a chain of per-step maps."""
    n = check_tl_map_params(dm[0], rho0)
    rho = np.zeros((len(dm) + 1, n * n), dtype=complex)
    rho[0] = rho0.reshape(n * n)
    for i in range(len(dm)):
        rho[i + 1] = dm[i] @ rho[i]
    return rho.reshape(len(dm) + 1, n, n)


def tl_pad_stationary(tl_map, times, rho):
    """Extend an existing rho(t) trajectory to len(times) with the stationary map."""
    n = check_tl_map_params(tl_map, rho[0])
    rho_complete = np.zeros((len(times), n, n), dtype=complex)
    rho_complete[: len(rho)] = rho
    flat = rho_complete.reshape(len(times), n * n)
    for i in range(len(rho), len(times)):
        flat[i] = tl_map @ flat[i - 1]
    return flat.reshape(len(times), n, n)


def tl_pad_stationary_nsteps(tl_map, n_steps, rho):
    """rho(k) = tl_map^k rho, k = 1..n_steps (rho is a single matrix)."""
    n = check_tl_map_params(tl_map, rho)
    out = np.zeros((n_steps, n * n), dtype=complex)
    cur = rho.reshape(n * n)
    for i in range(n_steps):
        cur = tl_map @ cur
        out[i] = cur
    return out.reshape(n_steps, n, n)


def use_tl_map_mto(tl_map, dm_1, dm_2, times, rho0, t_MTO, debug=False):
    """Piecewise propagation: dm_1 block, stationary map to t_MTO, dm_2 block
    (contains the MTO), stationary map to the end.
    (reference semantics: pyaceqd/tools.py:630-675)"""
    n = check_tl_map_params(tl_map, rho0)
    n_sq = n * n
    rho = np.zeros((len(times), n_sq), dtype=complex)
    rho[0] = rho0.reshape(n_sq)
    times = np.round(times, 5)
    i_mto = np.where(times >= t_MTO)[0][0]
    if debug:
        print("info on piecewise application: ", i_mto, times[i_mto], len(dm_1), len(dm_2))
    i_dm1 = min(i_mto, len(dm_1))
    if i_mto < len(dm_1):
        print("caution: t_MTO is smaller than tau_c")
    for i in range(i_dm1):
        rho[i + 1] = dm_1[i] @ rho[i]
    for i in range(i_dm1, i_mto):
        rho[i + 1] = tl_map @ rho[i]
    for i in range(i_mto, i_mto + len(dm_2)):
        rho[i + 1] = dm_2[i - i_mto] @ rho[i]
    for i in range(i_mto + len(dm_2), len(times) - 1):
        rho[i + 1] = tl_map @ rho[i]
    return rho.reshape(len(times), n, n)


def check_tlmap_frobenius(tl_map, times, filename="dynmap_tl_frobenius", xlim=25,
                          check_against_i=None):
    """Map-convergence diagnostics: Frobenius norm of adjacent-map differences,
    map norms, and singular values, saved as PNGs.
    (reference semantics: pyaceqd/tools.py:677-734)"""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    norms_diff = np.zeros((len(times) - 3), dtype=float)
    for i in range(len(times) - 3):
        ref = tl_map[check_against_i] if check_against_i is not None else tl_map[i + 1]
        norms_diff[i] = np.linalg.norm(tl_map[i] - ref)
    ix = np.where((times - times[0] > 0) & (times - times[0] < xlim))[0]
    plt.clf()
    plt.xlabel("Time"); plt.ylabel("Norm")
    plt.title("difference of adjacent dynamical maps")
    plt.plot(times[ix] - times[0], norms_diff[ix - 1])
    plt.yscale('log'); plt.xlim(0, xlim)
    plt.savefig(filename + "_diff.png"); plt.clf()

    norms = np.linalg.norm(tl_map, axis=(1, 2))
    plt.xlabel("Time"); plt.ylabel("Norm")
    plt.title("Norm of dynamical maps")
    plt.plot(times[ix] - times[0], norms[ix])
    plt.yscale('log'); plt.tight_layout(); plt.xlim(0, xlim)
    plt.savefig(filename + "_norms.png"); plt.clf()

    sv = np.linalg.svd(tl_map, compute_uv=False)
    for i in range(sv.shape[1]):
        plt.plot(times[ix] - times[0], sv[ix, i], label=f"sv {i+1}")
    plt.xlabel("Time"); plt.ylabel("Singular values")
    plt.title("Singular values of dynamical maps")
    plt.yscale('log'); plt.ylim(1e-30, 1e2); plt.xlim(0, xlim)
    plt.savefig(filename + "_sv.png"); plt.clf()


# ---------------------------------------------------------------------------
# units  (reference: pyaceqd/tools.py:736-770)
# ---------------------------------------------------------------------------

def nm_to_mev(lambda_light):
    _HBAR = 0.6582119514  # meV ps
    _c_light = 299.792e3  # nm/ps
    return _HBAR * 2 * np.pi * _c_light / lambda_light


def mev_to_nm(energy_light):
    _HBAR = 0.6582119514
    _c_light = 299.792e3
    return _HBAR * 2 * np.pi * _c_light / energy_light


def ghz_to_mev(ghz):
    h = 2 * np.pi * 0.6582119514
    return ghz * h * 1e-3


def mev_to_ghz(mev):
    h = 2 * np.pi * 0.6582119514
    return mev / (h * 1e-3)


# ---------------------------------------------------------------------------
# sparse ranges / array union  (reference: pyaceqd/tools.py:772-831)
# ---------------------------------------------------------------------------

def with_filename(func):
    @wraps(func)
    def wrapper(start: float = 0.1, stop: float = 12, num: int = 101, nth: int = 10,
                get_inverse: bool = False, round_to: int = 8, filename: Optional[str] = None):
        result = func(start, stop, num, nth, get_inverse, round_to)
        if filename is not None:
            suffix = "_inverse" if get_inverse else "_sparse"
            return result, filename + suffix
        return result
    return wrapper


@with_filename
def get_sparse_range(start=0.1, stop=12, num=101, nth=10, get_inverse=False, round_to=8):
    range_full = np.linspace(start, stop, num)
    range_sparse = range_full[::nth]
    if get_inverse:
        inverse = sorted(set(range_full) - set(range_sparse))
        return np.round(inverse, round_to)
    return range_sparse


def get_union(arr_x1, arr_x2, arr_z1, arr_z2, axis_z=None):
    """Union of two x-grids with their z-data, sorted by x, de-duplicated."""
    len_x1, len_x2 = len(arr_x1), len(arr_x2)
    arr_z1, arr_z2 = np.asarray(arr_z1), np.asarray(arr_z2)
    if arr_z1.ndim == 1:
        arr_z1 = arr_z1.reshape((len_x1, 1))
    if arr_z2.ndim == 1:
        arr_z2 = arr_z2.reshape((len_x2, 1))
    if axis_z is None:
        if arr_z1.shape[0] == arr_z1.shape[1]:
            return ValueError("Cannot determine axis for z arrays.")
        if arr_z1.shape[0] == len_x1 and arr_z2.shape[0] == len_x2:
            axis_z = 0
        elif arr_z1.shape[1] == len_x1 and arr_z2.shape[1] == len_x2:
            axis_z = 1
        else:
            raise ValueError("Cannot determine axis for z arrays.")
    arr_x = np.concatenate((arr_x1, arr_x2))
    arr_z = np.concatenate((arr_z1, arr_z2), axis=axis_z)
    arr_x, indices = np.unique(arr_x, return_index=True)
    arr_z = arr_z[indices] if axis_z == 0 else arr_z[:, indices]
    return arr_x, arr_z
