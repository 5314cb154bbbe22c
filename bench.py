"""Headline benchmark: PT-MPO propagation steps/sec for the four-level
biexciton with the superohmic phonon bath at 4 K (BASELINE.json config 3+2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

vs_baseline is MEASURED (not estimated): the baseline is a single-threaded
numpy complex128 loop performing the identical per-step work at identical
(d^2, chi) shapes — dissipator half-steps, the U rho U^dagger sandwich, and
the PT-MPO bond contraction — i.e. what a single-core CPU engine (ACE's
propagation stage) does per step.  The reference publishes no numbers
(BASELINE.md), so this is the honest apples-to-apples single-core rate on
this machine; the gate in BASELINE.json is >=50x.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# honor an explicit JAX_PLATFORMS=cpu even though this machine's
# sitecustomize re-forces the axon TPU backend via jax.config
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    import jax
    jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("PYACEQD_TPU_PROFILE", "1")


def measure_single_core_baseline(pt, n_steps, d, reps=3, n_time=60):
    """Single-threaded numpy complex128 per-step loop at identical shapes:
    the measured stand-in for single-core ACE propagation (VERDICT r1 item 7).
    Returns steps/sec."""
    d2 = d * d
    chi = pt.chi
    stack = np.asarray(pt.stack[:n_steps], dtype=np.complex128)
    g_of_s = np.asarray(pt.g_of_s)
    rng = np.random.default_rng(0)
    U = np.linalg.qr(rng.standard_normal((d, d))
                     + 1j * rng.standard_normal((d, d)))[0]
    E_half = np.eye(d2, dtype=np.complex128)
    A = np.zeros((chi, d2), dtype=np.complex128)
    A[0, 0] = 1.0
    n_time = min(n_time, n_steps)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        B = A.copy()
        for k in range(n_time):
            B = B @ E_half.T
            Bm = B.reshape(chi, d, d)
            Bm = np.einsum('ij,ajk,lk->ail', U, Bm, np.conj(U))
            B = Bm.reshape(chi, d2) @ E_half.T
            Qs = stack[k][:, g_of_s, :]
            B = np.einsum('asb,as->bs', Qs, B)
        best = min(best, time.perf_counter() - t0)
    return n_time / best


def main():
    from pyaceqd_tpu.engine import hamiltonian as ham
    from pyaceqd_tpu.engine import ptmpo
    from pyaceqd_tpu.parallel.sweep import area_sweep
    from pyaceqd_tpu.pulses import ChirpedPulse
    from pyaceqd_tpu.utils import profiling

    dt = 0.1
    t_mem = 6.4
    t_end = 30.0
    n_steps = int(round(t_end / dt))
    # batched sweep: every lane is an independent propagation (a 64x64
    # pulse-area/detuning map); single-chip HBM supports 4096 lanes x 300
    # steps in one compiled program (8192 OOMs on eigh tile-padding temps)
    n_areas = 4096

    spec, _ = ham.build_system(
        system_op=["-4.0*|3><3|_4"],
        lindblad_ops=[["|0><1|_4", 0.01], ["|0><2|_4", 0.01],
                      ["|1><3|_4", 0.01], ["|2><3|_4", 0.01]],
        interaction_ops=[["|1><0|_4+|3><1|_4", "x"], ["|2><0|_4+|3><2|_4", "y"]],
        initial="|0><0|_4",
        output_ops=["|0><0|_4", "|1><1|_4", "|2><2|_4", "|3><3|_4"],
        boson_op="1*(|1><1|_4 + |2><2|_4) + 2*|3><3|_4")

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    with profiling.phase("pt_build"):
        pt = ptmpo.get_process_tensor(
            boson_op=spec.boson_coupling, dt=dt, t_mem=t_mem, ae=3.0,
            temperature=4, n_steps=n_steps, threshold="8",
            system_prefix="b_linear_bench", temp_dir=cache_dir)
    spec.H0 = spec.H0 + pt.counter_term

    p_unit = ChirpedPulse(tau_0=3.0, e_start=-2.0, alpha=0, e0=1, t0=12.0)
    areas = np.linspace(0, 12, n_areas)

    # compile + warm up
    with profiling.phase("compile_and_first_run"):
        t, outs = area_sweep(spec, [p_unit], areas, 0, t_end, dt, pt=pt)
    # sanity gate: trace preservation across the batch.  The worst-lane
    # drift at this config is NOT float noise but the documented chi_max=64
    # truncation level of the weight-2 biexciton sector under the strongest
    # drive lanes: measured 1.76e-3 at FLOAT64 on CPU with the identical
    # cached PT (docs/accuracy.md: 1.1e-3 "strong drive" in round 1; drops
    # ~6x at chi_max=128 at 4x the matmul cost).  The gate sits just above
    # the known physics level so any REAL leak (a regression, not
    # truncation) still trips it.
    trace = np.real(outs.sum(axis=2))
    trace_err = float(np.max(np.abs(trace - 1.0)))
    trace_ok = bool(trace_err < 2.5e-3)

    # timed runs (program cached; each run = n_areas independent PT-MPO
    # propagations of n_steps each).  Per-rep best: the tunnel to the chip
    # occasionally stalls a transfer (measured 3x swings on identical
    # programs), and a single slow rep should not define the number.
    reps = 3
    per_rep = []
    for _ in range(reps):
        t0 = time.time()
        with profiling.phase("steady_run"):
            t, outs = area_sweep(spec, [p_unit], areas, 0, t_end, dt, pt=pt)
        per_rep.append(time.time() - t0)
    steps_per_sec = n_areas * n_steps / min(per_rep)

    with profiling.phase("baseline_single_core"):
        fin = pt.materialize(n_steps) if hasattr(pt, "bulk") else pt
        base = measure_single_core_baseline(fin, n_steps, spec.dim)

    phases = {k: round(v["total_s"], 3) for k, v in profiling.report().items()}
    print(json.dumps({
        "metric": "PT-MPO propagation steps/sec (4-level biexciton + phonons, 4K, chi={}, batch={})".format(pt.chi, n_areas),
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / base, 2),
        "baseline_steps_per_sec": round(base, 1),
        "baseline_source": "measured: single-thread numpy c128 loop, identical per-step work and shapes",
        "trace_ok": trace_ok,
        "trace_err": trace_err,
        "phases_s": phases,
    }))


if __name__ == "__main__":
    main()
