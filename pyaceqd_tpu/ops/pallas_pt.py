"""Fused Pallas kernel for the batched PT-MPO propagation sweep.

The XLA lax.scan version round-trips the contraction state A (B, chi, d^2)
through HBM every step; this kernel keeps A resident in VMEM across the
whole time axis (sequential inner grid) and streams only the per-step PT
tensor and step unitaries from HBM — the pipeline pattern from the Pallas
guide (sequential grid + scratch carry).

Layout: A lives as (chi, d2, B_blk) with the lane block in the 128-wide
minor dimension; the bond contraction is then d2 clean (chi, chi) @
(chi, B_blk) MXU matmuls, and the U rho U^dag sandwich is an unrolled
VPU broadcast over the minor dim.  Complex arithmetic is explicit
(re, im) float32 pairs — complex is neither Pallas- nor axon-boundary-safe.

STATUS (measured on v5e, biexciton bench shapes chi=64, d2=16, 300 steps,
4096 lanes): correct (matches the XLA core to f32 precision,
tests/test_pallas_pt.py) but ~35x SLOWER than the batch-explicit lax.scan
core in parallel/sweep.py.  The physics granularity is too small for a
hand-rolled pipeline here: the per-step work is 16 (64,64)@(64,B) dots plus
unrolled 4x4/16x16 broadcast MACs, and Mosaic's per-op overhead on those
small vectors dominates, while XLA fuses the same chain tightly.  Kept as a
working reference for the VMEM-resident-carry pattern (sequential grid +
scratch, prefetch-clamped block streams) for when a genuinely large-d2 or
large-chi workload shows up; NOT wired into the production sweep path.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _build_call(n, B_pad, B_blk, chi, d, m, dtype=jnp.float32):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d2 = d * d
    L = B_pad // B_blk

    def kernel(q_re, q_im, u_re, u_im, c_re, c_im, r_re, r_im,
               e_re, e_im, w_re, w_im, y_re, y_im, a_re, a_im):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _init():
            a_re[...] = jnp.zeros((chi, d2, B_blk), dtype)
            a_im[...] = jnp.zeros((chi, d2, B_blk), dtype)
            a_re[0, :, :] = jnp.broadcast_to(r_re[0][:, None], (d2, B_blk))
            a_im[0, :, :] = jnp.broadcast_to(r_im[0][:, None], (d2, B_blk))

        Ar, Ai = a_re[...], a_im[...]                    # (chi, d2, B)

        # ---- readout: y[m, b] = sum_a cap[a] sum_s W[m, s] A[a, s, b]
        # as a (1, chi) @ (chi, d2*B) dot (no lane->sublane reshape of caps)
        car = c_re[0, 0:1, :]                            # (1, chi)
        cai = c_im[0, 0:1, :]
        A2r = Ar.reshape(chi, d2 * B_blk)
        A2i = Ai.reshape(chi, d2 * B_blk)
        Sr = (jnp.dot(car, A2r, preferred_element_type=dtype)
              - jnp.dot(cai, A2i, preferred_element_type=dtype)
              ).reshape(d2, B_blk)
        Si = (jnp.dot(car, A2i, preferred_element_type=dtype)
              + jnp.dot(cai, A2r, preferred_element_type=dtype)
              ).reshape(d2, B_blk)
        Wr, Wi = w_re[...], w_im[...]                    # (m, d2)
        y_re[0, 0] = jnp.dot(Wr, Sr, preferred_element_type=dtype) \
            - jnp.dot(Wi, Si, preferred_element_type=dtype)
        y_im[0, 0] = jnp.dot(Wr, Si, preferred_element_type=dtype) \
            + jnp.dot(Wi, Sr, preferred_element_type=dtype)

        @pl.when(t < n)
        def _step():
            Er, Ei = e_re[...], e_im[...]                # (d2, d2)

            def e_mix(Xr, Xi):
                # X'[a, t, b] = sum_s E[t, s] X[a, s, b]; unrolled over (t, s)
                # as VPU broadcast-MACs (Mosaic has no 3D batched dot here)
                rows_r, rows_i = [], []
                for tt in range(d2):
                    accr = Er[tt, 0] * Xr[:, 0, :] - Ei[tt, 0] * Xi[:, 0, :]
                    acci = Er[tt, 0] * Xi[:, 0, :] + Ei[tt, 0] * Xr[:, 0, :]
                    for s in range(1, d2):
                        accr = accr + Er[tt, s] * Xr[:, s, :] \
                            - Ei[tt, s] * Xi[:, s, :]
                        acci = acci + Er[tt, s] * Xi[:, s, :] \
                            + Ei[tt, s] * Xr[:, s, :]
                    rows_r.append(accr)
                    rows_i.append(acci)
                return jnp.stack(rows_r, axis=1), jnp.stack(rows_i, axis=1)

            Xr, Xi = e_mix(Ar, Ai)
            # ---- sandwich: X'[a, (i j), b] = sum_kl U[i,k] X[a,(k l),b] U*[j,l]
            Ur, Ui = u_re[0], u_im[0]                    # (d, d, B)
            X4r = Xr.reshape(chi, d, d, B_blk)
            X4i = Xi.reshape(chi, d, d, B_blk)
            # left: T[a, i, l, b] = sum_k U[i, k, b] X[a, k, l, b]  (unrolled k)
            Tr = jnp.zeros((chi, d, d, B_blk), dtype)
            Ti = jnp.zeros((chi, d, d, B_blk), dtype)
            for k in range(d):
                ur = Ur[:, k, :][None, :, None, :]       # (1, d_i, 1, B)
                ui = Ui[:, k, :][None, :, None, :]
                xr = X4r[:, k, :, :][:, None, :, :]      # (chi, 1, d_l, B)
                xi = X4i[:, k, :, :][:, None, :, :]
                Tr = Tr + ur * xr - ui * xi
                Ti = Ti + ur * xi + ui * xr
            # right: Y[a, i, j, b] = sum_l T[a, i, l, b] conj(U)[j, l, b]
            Yr = jnp.zeros((chi, d, d, B_blk), dtype)
            Yi = jnp.zeros((chi, d, d, B_blk), dtype)
            for l in range(d):
                ur = Ur[:, l, :][None, None, :, :]       # (1, 1, d_j, B)
                ui = Ui[:, l, :][None, None, :, :]
                tr = Tr[:, :, l, :][:, :, None, :]       # (chi, d_i, 1, B)
                ti = Ti[:, :, l, :][:, :, None, :]
                Yr = Yr + tr * ur + ti * ui              # * conj(U) = (ur, -ui)
                Yi = Yi + ti * ur - tr * ui
            Xr = Yr.reshape(chi, d2, B_blk)
            Xi = Yi.reshape(chi, d2, B_blk)
            Xr, Xi = e_mix(Xr, Xi)
            # ---- bond contraction: A'[c, s, b] = sum_a Q[a, s, c] X[a, s, b]
            # unrolled over s into clean 2D MXU dots (chi, chi) @ (chi, B)
            Qr, Qi = q_re[0], q_im[0]                    # (chi, d2, chi)
            ns_r, ns_i = [], []
            for s in range(d2):
                qr = Qr[:, s, :]
                qi = Qi[:, s, :]
                xr = Xr[:, s, :]
                xi = Xi[:, s, :]
                ns_r.append(jnp.dot(qr.T, xr, preferred_element_type=dtype)
                            - jnp.dot(qi.T, xi, preferred_element_type=dtype))
                ns_i.append(jnp.dot(qr.T, xi, preferred_element_type=dtype)
                            + jnp.dot(qi.T, xr, preferred_element_type=dtype))
            a_re[...] = jnp.stack(ns_r, axis=1)
            a_im[...] = jnp.stack(ns_i, axis=1)

    grid_spec = pl.GridSpec(
        grid=(L, n + 1),
        in_specs=[
            # grid runs to t = n (readout-only row): clamp the per-step
            # streams — the pipeline prefetches blocks even when pl.when
            # skips the compute, and an out-of-range block index crashes
            # the device
            pl.BlockSpec((1, chi, d2, chi),
                         lambda l, t: (jnp.minimum(t, n - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),      # q_re
            pl.BlockSpec((1, chi, d2, chi),
                         lambda l, t: (jnp.minimum(t, n - 1), 0, 0, 0),
                         memory_space=pltpu.VMEM),      # q_im
            pl.BlockSpec((1, d, d, B_blk),
                         lambda l, t: (jnp.minimum(t, n - 1), 0, 0, l),
                         memory_space=pltpu.VMEM),      # u_re
            pl.BlockSpec((1, d, d, B_blk),
                         lambda l, t: (jnp.minimum(t, n - 1), 0, 0, l),
                         memory_space=pltpu.VMEM),      # u_im
            # (n+1, 8, chi): rows padded to the 8-sublane tile
            pl.BlockSpec((1, 8, chi), lambda l, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # c_re
            pl.BlockSpec((1, 8, chi), lambda l, t: (t, 0, 0),
                         memory_space=pltpu.VMEM),      # c_im
            pl.BlockSpec((1, d2), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),      # r_re
            pl.BlockSpec((1, d2), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),      # r_im
            pl.BlockSpec((d2, d2), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),      # e_re
            pl.BlockSpec((d2, d2), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),      # e_im
            pl.BlockSpec((m, d2), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),      # w_re
            pl.BlockSpec((m, d2), lambda l, t: (0, 0),
                         memory_space=pltpu.VMEM),      # w_im
        ],
        out_specs=[
            pl.BlockSpec((1, 1, m, B_blk), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),      # y_re
            pl.BlockSpec((1, 1, m, B_blk), lambda l, t: (l, t, 0, 0),
                         memory_space=pltpu.VMEM),      # y_im
        ],
        scratch_shapes=[pltpu.VMEM((chi, d2, B_blk), dtype)] * 2,
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((L, n + 1, m, B_blk), dtype)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(jax.default_backend() == "cpu"),
    )


def pt_area_sweep_pallas(stack, caps, g_of_s, U, E_half, rho0_vec, W,
                         B_blk=256):
    """outputs (B, n+1, m) complex128 — drop-in for the XLA sweep core.

    stack (n, chi, G, chi), caps (n+1, chi) complex; U (n, B, d, d) complex
    (per-lane step unitaries, already including any drive scaling);
    E_half (d2, d2); rho0_vec (d2,); W (m, d2)."""
    n, chi, G, _ = stack.shape
    B = U.shape[1]
    d = U.shape[2]
    d2 = d * d
    m = W.shape[0]
    B_blk = min(B_blk, max(64, B))
    B_pad = ((B + B_blk - 1) // B_blk) * B_blk

    f32 = lambda x: np.asarray(x, dtype=np.float32)
    stack_g = np.asarray(stack)[:, :, np.asarray(g_of_s), :]  # (n, chi, d2, chi)
    U_t = np.transpose(np.asarray(U), (0, 2, 3, 1))           # (n, d, d, B)
    if B_pad != B:
        U_t = np.concatenate(
            [U_t, np.zeros((n, d, d, B_pad - B), U_t.dtype)], axis=3)

    call = _build_call(n, B_pad, B_blk, chi, d, m)
    args = []
    for x in (stack_g, U_t):
        args += [f32(x.real), f32(x.imag)]
    caps = np.asarray(caps)
    caps8 = np.zeros((caps.shape[0], 8, caps.shape[1]), complex)
    caps8[:, 0, :] = caps  # sublane-tile padding; kernel reads row 0
    args += [f32(caps8.real), f32(caps8.imag)]
    r = np.asarray(rho0_vec).reshape(1, d2)
    args += [f32(r.real), f32(r.imag)]
    E = np.asarray(E_half)
    args += [f32(E.real), f32(E.imag)]
    Wm = np.asarray(W)
    args += [f32(Wm.real), f32(Wm.imag)]
    y_re, y_im = jax.jit(lambda *a: call(*a))(*args)
    y = np.asarray(y_re) + 1j * np.asarray(y_im)              # (L, n+1, m, B_blk)
    y = np.transpose(y, (0, 3, 1, 2)).reshape(B_pad, n + 1, m)
    return y[:B]
