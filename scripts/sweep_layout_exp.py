"""Layout experiment for the headline sweep kernel (VERDICT r3 item 5).

Hypotheses, from a traffic model of _area_sweep_pt_core at chi=25, d=4,
B=4096 (the bench shapes):
  H1. The hostsafe wrapper re-uploads every argument (PT stack ~24 MB,
      fields, ...) per call and downloads the (B, n+1, n_out) complex
      outputs per call — through the axon TUNNEL, which a local v5e host
      would not pay.  Measure compute-only: args device_put once, the
      compiled program timed with block_until_ready, readback timed apart.
  H2. The per-step VPU sandwich materializes (B, chi, d, d, d) broadcast
      temps (~200 MB/step at bench shapes); folding
      E_half . (U (x) U*) . E_half into ONE per-lane (d^2 x d^2)
      superoperator matmul per step trades 2x the FLOPs for ~7x less HBM
      traffic.

Variants: base (shipped core) and superop (H2 fold), each timed
compute-only and with readback.

Usage: python scripts/sweep_layout_exp.py [n_areas] [reps]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from pyaceqd_tpu.parallel import sweep as sw
from pyaceqd_tpu.pulses import ChirpedPulse
from pyaceqd_tpu.utils import cplx

n_areas = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def _area_sweep_pt_superop(stack, caps, g_of_s, H0, C, F_unit, scales,
                           E_half, rho0_vec, W, dt, has_diss, n_sq):
    """Superop-folded variant: per step k and lane B, the full system map
    E_half . (U rho U^H) . E_half is ONE (d^2, d^2) matrix
    S = E (U (x) U*) E, applied as a batched (chi, d2) @ (d2, d2) matmul."""
    d = H0.shape[0]
    d2 = d * d
    chi = stack.shape[1]
    B = scales.shape[0]
    U = sw._batched_unitaries(H0, C, F_unit, scales, dt, n_sq)  # (n, B, d, d)
    A0 = jnp.zeros((B, chi, d2), dtype=rho0_vec.dtype).at[:, 0].set(
        rho0_vec[None])

    def body(A, xs):
        Uk, Qk, cap_k = xs
        y = jnp.einsum('a,Bas,ms->Bm', cap_k, A, W)
        # S[B,(ij),(kl)] = U_ik U*_jl (row-major vec); A rows are vec(rho),
        # applied as A @ S^T; dissipator halves fold in: S = E S_U E
        S = jnp.einsum('Bik,Bjl->Bijkl', Uk, jnp.conj(Uk)).reshape(B, d2, d2)
        if has_diss:
            S = E_half @ S @ E_half
        A = jnp.einsum('Bas,Bts->Bat', A, S)
        Qs = Qk[:, g_of_s, :]
        return jnp.einsum('asb,Bas->Bbs', Qs, A), y

    A_f, ys = jax.lax.scan(body, A0, (U, stack, caps[:-1]))
    y_last = jnp.einsum('a,Bas,ms->Bm', caps[-1], A_f, W)
    return jnp.concatenate([jnp.swapaxes(ys, 0, 1), y_last[:, None]], axis=1)


# device-resident runner + one-element completion force + separate readback:
# shared library helpers (utils/cplx.device_runner / force / readback) — the
# bench's run_config times its headline the same way


def main():
    spec, pt, n_steps = bench.build_bench_system()
    p_unit = ChirpedPulse(tau_0=3.0, e_start=-2.0, alpha=0, e0=1, t0=12.0)
    areas = np.linspace(0, 12, n_areas)
    variants = {}
    for name, kern in (("base", "base"), ("mxu", "mxu")):
        os.environ["PYACEQD_TPU_SWEEP_KERNEL"] = kern
        _, _, fn, args, statics = sw._prep_sweep(
            spec, [p_unit], areas, 0, bench.T_END, bench.DT, pt, None)
        variants[name] = (fn.__wrapped__, args, statics)
    variants["superop"] = (_area_sweep_pt_superop,) + variants["base"][1:]

    ref = None
    for name, (fn, args, statics) in variants.items():
        upload, run = cplx.device_runner(fn, statics.keys())
        split_dev = upload(args)
        t0 = time.time()
        out = run(split_dev, **statics)
        cplx.force(out)
        compile_s = time.time() - t0
        tc, tr = [], []
        for _ in range(reps):
            t0 = time.time()
            out = run(split_dev, **statics)
            cplx.force(out)
            tc.append(time.time() - t0)
            t0 = time.time()
            host = cplx.readback(out)
            tr.append(time.time() - t0)
        lane_steps = n_areas * n_steps
        print(f"{name:8s}: compute {min(tc):.3f}s ({lane_steps/min(tc):,.0f} "
              f"lane-steps/s)  +readback {min(tr):.3f}s "
              f"(total {lane_steps/(min(tc)+min(tr)):,.0f}/s)  "
              f"[compile {compile_s:.1f}s]  per-rep {[f'{x:.3f}' for x in tc]}",
              flush=True)
        if ref is None:
            ref = host
        else:
            print(f"          max|out - base| = "
                  f"{np.max(np.abs(host - ref)):.2e}", flush=True)


if __name__ == "__main__":
    main()
