"""Dynamical-map algebra on device: map-chain propagation, time-local map
extraction, binary-power skipping, and map-based correlation kernels.

This subsumes both of the reference's Fortran/OpenMP/BLAS modules:

- propagate_tau.f90 (zgemv chains of d^2 x d^2 maps over tau, OpenMP over the
  t grid: propagate_tau/calc_onetime_parallel/calc_onetime_parallel_block/
  calc_twotime_phonon_block)
- the pure-python map loops in tools.py:567-675

as batched lax.scan / vmap programs: the tau axis is the scan (a strict
recurrence), the t1 axis is the vmapped batch that fills the TPU lanes.
Binary-power skipping (twophoton_new.py:599-613, timebin_tl.f90:23-47) becomes
an O(log n) squaring chain of d^2 x d^2 matmuls on the MXU.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pyaceqd_tpu import config
from pyaceqd_tpu.utils.cplx import hostsafe


@hostsafe
def propagate_maps(maps, rho0_vec):
    """rho_{k+1} = maps[k] rho_k; returns trajectory (len(maps)+1, d^2)."""
    def body(rho, M):
        rho = M @ rho
        return rho, rho
    _, traj = jax.lax.scan(body, rho0_vec, maps)
    return jnp.concatenate([rho0_vec[None], traj], axis=0)


@hostsafe(static_argnames=("n_steps",))
def propagate_stationary(tl_map, rho0_vec, n_steps):
    """rho_k = tl_map^k rho_0, k=1..n_steps; returns (n_steps, d^2)."""
    def body(rho, _):
        rho = tl_map @ rho
        return rho, rho
    _, traj = jax.lax.scan(body, rho0_vec, None, length=n_steps)
    return traj


def matrix_power_traced(M, n):
    """M^n for a traced non-negative integer n via binary exponentiation
    (log2(n_max) squarings; the skip-ahead of timebin_tl.f90 fast_propagate)."""
    n = jnp.asarray(n, dtype=jnp.int32)
    d2 = M.shape[0]

    def body(carry, _):
        result, base, k = carry
        result = jnp.where(k & 1, base @ result, result)
        base = base @ base
        return (result, base, k >> 1), None

    n_bits = 32
    (result, _, _), _ = jax.lax.scan(
        body, (jnp.eye(d2, dtype=M.dtype), M, n), None, length=n_bits)
    return result


@hostsafe
def calc_tl_dynmap(dm):
    """Time-local maps from accumulated maps, batched on device.

    dm[i] = E(t_{i+1}, t_0);  out[i] = E(t_{i+1}, t_i) = dm[i] @ pinv(dm[i-1]).
    Device version of tools.calc_tl_dynmap_pseudo (reference tools.py:446-484):
    one batched SVD-pinv + one batched matmul instead of a Python loop.
    The pinv cutoff is matched to the precision the maps carry (f64: 1e-12,
    the reference's value; f32: 3e-6 — see tools.default_pinv_rcond for the
    measured failure mode of a too-tight cut on rank-deficient MTO maps)."""
    from pyaceqd_tpu.tools import default_pinv_rcond
    inv_prev = jnp.linalg.pinv(dm[:-1], rcond=default_pinv_rcond())
    rest = jnp.einsum('nij,njk->nik', dm[1:], inv_prev)
    return jnp.concatenate([dm[:1], rest], axis=0)


@hostsafe(static_argnames=("n_tau",))
def map_trunk_and_branches(maps, rho0_vec, t1_ks, S_branch, W_tau, W_zero, n_tau):
    """Map-chain analogue of engine.branched: trunk through per-step maps,
    branches start at traced indices t1_ks with S_branch applied, propagate
    n_tau further map steps, reading out W_tau.

    Replaces propagate_tau.f90::calc_onetime_parallel (reference
    two_time/correlations.py:534,782): OpenMP-over-t1 becomes vmap-over-t1.

    Returns (G0 (B, m0), Gtau (B, n_tau, m))."""
    traj = propagate_maps(maps, rho0_vec)

    def one_branch(k):
        zero = jnp.zeros((), dtype=k.dtype)
        rho_b = S_branch @ traj[k]
        win = jax.lax.dynamic_slice(
            maps, (k, zero, zero), (n_tau, maps.shape[1], maps.shape[2]))

        def body(rho, M):
            rho = M @ rho
            return rho, W_tau @ rho

        _, ys = jax.lax.scan(body, rho_b, win)
        return ys

    Gtau = jax.vmap(one_branch)(t1_ks)
    G0 = traj[t1_ks] @ W_zero.T
    return G0, Gtau


@hostsafe(static_argnames=("n_tau",))
def stationary_branches(tl_map, rho_t1s, S_branch, W_tau, n_tau):
    """Branches that all propagate with ONE stationary map (QRT beyond the
    memory time; reference correlations.py:840-860 np.linalg.matrix_power path).

    rho_t1s: (B, d^2) trunk states at the insertion times.
    Returns (B, n_tau, m)."""
    def one_branch(rho):
        rho_b = S_branch @ rho

        def body(r, _):
            r = tl_map @ r
            return r, W_tau @ r

        _, ys = jax.lax.scan(body, rho_b, None, length=n_tau)
        return ys

    return jax.vmap(one_branch)(rho_t1s)


@hostsafe(static_argnames=("n_tau", "n_mem"))
def block_branches(block_maps, tl_map2, rho_t1s, n_tau, n_mem):
    """Branches that first run through a per-branch map *block* (the
    MTO-dependent within-memory maps) and then continue with a stationary map.

    Replaces propagate_tau.f90::calc_twotime_phonon_block (reference
    two_time/purity.py:709-711): block_maps (B, n_mem, d^2, d^2) already
    include the MTO at step 0, rho_t1s (B, d^2) are PRE-MTO trunk states.

    Returns (B, n_tau, d^2): the branch state after 1..n_tau steps."""
    def one_branch(blocks, rho):
        def body_block(r, M):
            r = M @ r
            return r, r
        # short-tau request (tau_max < t_mem): only the first n_tau block
        # maps are needed and the stationary tail is empty
        r_mem, traj_mem = jax.lax.scan(body_block, rho,
                                       blocks[:min(n_mem, n_tau)])

        def body_tl(r, _):
            r = tl_map2 @ r
            return r, r
        _, traj_tl = jax.lax.scan(body_tl, r_mem, None,
                                  length=max(0, n_tau - n_mem))
        return jnp.concatenate([traj_mem, traj_tl], axis=0)

    return jax.vmap(one_branch)(block_maps, rho_t1s)


@hostsafe(static_argnames=("n_tau", "n_tb", "n_map"))
def block_periodic_branches(maps_full, dm_s, blocks, rho_t1s, t1_ks, W_tau,
                            n_tau, n_tb, n_map):
    """Phonon-case branch propagation with per-branch MTO-dependent map
    blocks: the batched twin of propagate_tau.f90::calc_twotime_phonon_block
    (reference two_time/purity.py:602-604, 709-711).

    Each branch i starts from the PRE-insertion trunk state rho_t1s[i] at grid
    index t1_ks[i]; until the first bin boundary after t1 it uses its own
    block maps blocks[i] (which CONTAIN the inserted operators at step 0) and
    the stationary map dm_s beyond the block; after crossing a bin boundary it
    follows the periodic background maps_full (pulse block + stationary map
    per bin).  Returns (B, n_tau) of W_tau . rho after 1..n_tau steps.
    """
    d2 = maps_full.shape[1]

    def one_branch(block, rho, k1):
        zero = jnp.zeros((), dtype=k1.dtype)
        cross = (k1 // n_tb + 1) * n_tb  # first bin boundary after t1
        win = jax.lax.dynamic_slice(maps_full, (k1, zero, zero),
                                    (n_tau, d2, d2))

        def body(r, xs):
            Mwin, k = xs
            m = k1 + k
            Mb = block[jnp.minimum(k, n_map - 1)]
            M = jnp.where(m < cross,
                          jnp.where(k < n_map, Mb, dm_s),
                          Mwin)
            r = M @ r
            return r, W_tau @ r

        ks = jnp.arange(n_tau, dtype=jnp.int32)
        _, ys = jax.lax.scan(body, rho, (win, ks))
        return ys[:, 0]

    return jax.vmap(one_branch)(blocks, rho_t1s, t1_ks)


@hostsafe(static_argnames=("mto_before",))
def _map_runs_core(maps, rho0_vec, W, mto_sops, mto_ks_batch, gather_ks,
                   mto_before=()):
    n = maps.shape[0]
    n_mto = len(mto_before)

    def one_run(mks, gks):
        def apply_mtos(rho, k, before_phase):
            for i in range(n_mto):
                if mto_before[i] == before_phase:
                    rho = jnp.where(k == mks[i], mto_sops[i] @ rho, rho)
            return rho

        def body(rho, xs):
            Mk, k = xs
            rho = apply_mtos(rho, k, True)
            y = W @ rho
            rho = apply_mtos(rho, k, False)
            rho = Mk @ rho
            return rho, y

        ks = jnp.arange(n, dtype=jnp.int32)
        rho_f, ys = jax.lax.scan(body, rho0_vec, (maps, ks))
        rho_f = apply_mtos(rho_f, jnp.int32(n), True)
        y_pre = W @ rho_f
        # slot n+1: after ALL events at the final index fire, so gathers at
        # index k+1 always see the post-event state even at the boundary
        rho_f = apply_mtos(rho_f, jnp.int32(n), False)
        y_post = W @ rho_f
        outputs = jnp.concatenate([ys, y_pre[None], y_post[None]], axis=0)
        return outputs[gks]

    return jax.vmap(one_run)(mto_ks_batch, gather_ks)


def batched_mto_map_runs(maps, rho0_vec, sops, before, mto_ks, gather_ks, W,
                         chunk=1024, mesh=None):
    """Fully general multi-insertion fan-out over a chain of per-step
    dynamical maps: the map-world twin of branched.batched_mto_runs, and the
    batched replacement for timebin_tl.f90::four_time_8op (OpenMP over t1
    becomes a vmapped lane per (t1, t2) pair).

    maps: (n, d^2, d^2); sops: (m, d^2, d^2) event superoperators shared by
    all runs; mto_ks: (B, m) per-run insertion step indices; gather_ks: (B, g)
    step indices at which W @ rho is collected (pre-event at that index).
    Returns (B, g, n_out).
    """
    from pyaceqd_tpu import config
    cdt = config.cdtype()
    maps = np.asarray(maps, dtype=cdt)
    mto_ks = np.asarray(mto_ks, dtype=np.int32)
    gather_ks = np.asarray(gather_ks, dtype=np.int32)
    B = mto_ks.shape[0]
    n_valid = B
    if mesh is not None:
        # lanes sharded over the mesh 'batch' axis (multi-chip twin of the
        # reference's OpenMP-over-t1 in timebin_tl.f90::four_time_8op)
        from pyaceqd_tpu.parallel import mesh as mesh_util
        M = int(mesh.devices.size)
        chunk = max(M, (chunk // M) * M)
        mto_ks, _ = mesh_util.pad_to_multiple(mto_ks, chunk)
        gather_ks, _ = mesh_util.pad_to_multiple(gather_ks, chunk)
        B = mto_ks.shape[0]
    out = []
    for lo in range(0, B, chunk):
        hi = min(B, lo + chunk)
        mk, gk = mto_ks[lo:hi], gather_ks[lo:hi]
        if mesh is not None:
            from pyaceqd_tpu.parallel import mesh as mesh_util
            mk = mesh_util.shard_batch(mk, mesh)
            gk = mesh_util.shard_batch(gk, mesh)
        out.append(np.asarray(_map_runs_core(
            maps, np.asarray(rho0_vec, dtype=cdt), np.asarray(W, dtype=cdt),
            np.asarray(sops, dtype=cdt), mk, gk,
            mto_before=tuple(before))))
    return np.concatenate(out, axis=0)[:n_valid]


@hostsafe
def _masked_segment_core(maps, states, starts, stops):
    n = maps.shape[0]

    def body(S, xs):
        Mk, k = xs
        S_next = S @ Mk.T
        active = (k >= starts) & (k < stops)
        return jnp.where(active[:, None], S_next, S), None

    ks = jnp.arange(n, dtype=jnp.int32)
    S_f, _ = jax.lax.scan(body, states, (maps, ks))
    return S_f


@hostsafe
def _masked_segment_events_core(maps, states, starts, stops, sops, mks):
    n = maps.shape[0]
    m = sops.shape[0]

    def body(S, xs):
        Mk, k = xs
        Se = S
        for i in range(m):  # static unroll over the event slots
            hit = mks[:, i] == k
            Se = jnp.where(hit[:, None], Se @ sops[i].T, Se)
        S_next = Se @ Mk.T
        active = (k >= starts) & (k < stops)
        return jnp.where(active[:, None], S_next, S), None

    ks = jnp.arange(n, dtype=jnp.int32)
    S_f, _ = jax.lax.scan(body, states, (maps, ks))
    return S_f


def masked_segment_runs(maps, states, starts, stops, sops=None, mto_ks=None):
    """Advance each lane's state through the shared map chain over its OWN
    step range: lane b applies maps[k] for starts[b] <= k < stops[b] and is
    frozen elsewhere.  One scan over the chain serves every lane (the per-step
    work is a single (B, d^2) @ (d^2, d^2) matmul on the MXU) — the building
    block for kernels that interleave cheap time-local transport with exact
    in-window segments at per-lane offsets (timebin/twophoton_new.py
    eightops_phonon).

    With ``sops`` (m, d^2, d^2) and ``mto_ks`` (B, m): lane b applies sops[i]
    immediately BEFORE the step map at the chain index mto_ks[b, i] (matching
    the windowed-PT after-phase insertion ordering); an index outside the
    lane's active range never fires.

    maps: (n, d^2, d^2); states: (B, d^2); starts/stops: (B,) int32.
    Returns the advanced states (B, d^2)."""
    cdt = config.cdtype()
    args = (np.asarray(maps, dtype=cdt), np.asarray(states, dtype=cdt),
            np.asarray(starts, dtype=np.int32), np.asarray(stops, dtype=np.int32))
    if sops is None:
        return np.asarray(_masked_segment_core(*args))
    return np.asarray(_masked_segment_events_core(
        *args, np.asarray(sops, dtype=cdt), np.asarray(mto_ks, dtype=np.int32)))


def extract_dms_device(dm_tl, times, tau_c, t_MTOs):
    """Device-friendly extract_dms (reference tools.py:486-545): returns the
    stationary map and the within-memory blocks as stacked arrays."""
    times = np.asarray(times)
    i_timelocal = int(np.where(times > times[0] + tau_c)[0][0])
    blocks = [np.asarray(dm_tl[:i_timelocal])]
    for t_MTO in t_MTOs:
        hits = np.where(times == t_MTO)[0]
        if len(hits) == 0:
            raise ValueError(f"t_MTO {t_MTO} not found in times array.")
        i = int(hits[0])
        blocks.append(np.asarray(dm_tl[i:i + i_timelocal]))
    return np.asarray(dm_tl[i_timelocal]), blocks
