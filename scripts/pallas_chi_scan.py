"""Pallas-vs-XLA decision measurement (VERDICT r1 item 10).

Benchmarks ops/pallas_pt.py against the XLA batch-explicit scan at growing
bond dimension chi on the REAL chip (its claimed win regime is large chi
where per-step matmuls are MXU-sized).  Synthetic PT stacks (random,
normalized) — throughput only, correctness is covered by
tests/test_pallas_pt.py.

Run: python scripts/pallas_chi_scan.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_pt(n, chi, G, seed=0):
    rng = np.random.default_rng(seed)
    stack = (rng.standard_normal((n, chi, G, chi))
             + 1j * rng.standard_normal((n, chi, G, chi))) / np.sqrt(chi)
    caps = np.ones((n + 1, chi), dtype=complex) / chi
    return stack.astype(np.complex64), caps.astype(np.complex64)


def main():
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    from pyaceqd_tpu.ops import pallas_pt
    from pyaceqd_tpu.parallel.sweep import _area_sweep_pt_core  # noqa: F401
    from pyaceqd_tpu.engine.branched import _vmapped_runs_pt_core

    d = 4
    d2 = d * d
    n = 150
    B = 1024
    G = 9
    rng = np.random.default_rng(1)
    U = np.linalg.qr(rng.standard_normal((n, d, d))
                     + 1j * rng.standard_normal((n, d, d)))[0].astype(np.complex64)
    E = np.eye(d2, dtype=np.complex64)
    rho0 = np.zeros(d2, dtype=np.complex64)
    rho0[0] = 1
    W = np.eye(d2, dtype=np.complex64)[:4]
    g_of_s = np.arange(d2) % G

    for chi in (32, 64, 128, 256):
        stack, caps = synth_pt(n, chi, G)
        # XLA lane core (the production path): B lanes via trivial mto fan-out
        mks = np.zeros((B, 0), dtype=np.int32)
        gks = np.full((B, 1), n, dtype=np.int32)
        sops = np.zeros((0, d2, d2), dtype=np.complex64)

        def run_xla():
            out = _vmapped_runs_pt_core(stack, caps, g_of_s.astype(np.int32),
                                        U, E, rho0, W, sops, mks, gks,
                                        mto_before=(), has_diss=False)
            return np.asarray(out)

        run_xla()
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            run_xla()
        xla_sps = reps * B * n / (time.perf_counter() - t0)

        U_b = np.broadcast_to(U[:, None], (n, B, d, d))

        try:
            def run_pallas():
                out = pallas_pt.pt_area_sweep_pallas(
                    stack, caps, g_of_s, U_b, E, rho0, W)
                return np.asarray(out)

            run_pallas()
            t0 = time.perf_counter()
            for _ in range(reps):
                run_pallas()
            pl_sps = reps * B * n / (time.perf_counter() - t0)
        except Exception as e:
            pl_sps = float("nan")
            print(f"chi={chi}: pallas failed: {type(e).__name__}: {e}")
        print(f"chi={chi:4d}  xla={xla_sps:12.0f} lane-steps/s  "
              f"pallas={pl_sps:12.0f}  ratio(pallas/xla)={pl_sps/xla_sps:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
