"""Pallas PT-sweep kernel vs a numpy reference (interpret mode on CPU).

The kernel itself is experimental (see its module docstring: correct on the
real chip but slower than the XLA core at the model zoo's small d^2); this
test pins its semantics so it stays usable."""

import numpy as np
import pytest

from pyaceqd_tpu.ops.pallas_pt import pt_area_sweep_pallas


def _reference(stack, caps, g_of_s, U, E, rho0, W):
    n, chi = stack.shape[0], stack.shape[1]
    B, d = U.shape[1], U.shape[2]
    d2 = d * d
    m = W.shape[0]
    A = np.zeros((B, chi, d2), complex)
    A[:, 0] = rho0
    ys = np.zeros((B, n + 1, m), complex)
    for t in range(n):
        ys[:, t] = np.einsum('a,Bas,ms->Bm', caps[t], A, W)
        A = A @ E.T
        Am = A.reshape(B, chi, d, d)
        Am = np.einsum('Bik,Bakl,Bjl->Baij', U[t], Am, np.conj(U[t]))
        A = Am.reshape(B, chi, d2) @ E.T
        A = np.einsum('asb,Bas->Bbs', stack[t][:, g_of_s, :], A)
    ys[:, n] = np.einsum('a,Bas,ms->Bm', caps[n], A, W)
    return ys


def test_pallas_pt_matches_reference():
    rng = np.random.default_rng(0)
    n, chi, G, d, B, m = 12, 8, 5, 4, 7, 3
    d2 = d * d
    stack = (rng.normal(size=(n, chi, G, chi))
             + 1j * rng.normal(size=(n, chi, G, chi))) / chi
    caps = rng.normal(size=(n + 1, chi)) + 1j * rng.normal(size=(n + 1, chi))
    g_of_s = rng.integers(0, G, size=d2)
    U = rng.normal(size=(n, B, d, d)) + 1j * rng.normal(size=(n, B, d, d))
    E = np.eye(d2) + 0.01 * rng.normal(size=(d2, d2))
    rho0 = rng.normal(size=d2) + 1j * rng.normal(size=d2)
    W = rng.normal(size=(m, d2)) + 1j * rng.normal(size=(m, d2))
    y_ref = _reference(stack, caps, g_of_s, U, E, rho0, W)
    y_pal = pt_area_sweep_pallas(stack, caps, g_of_s, U, E, rho0, W, B_blk=64)
    rel = np.max(np.abs(y_pal - y_ref)) / np.max(np.abs(y_ref))
    assert rel < 1e-5  # f32 kernel vs f64 reference


def test_pallas_pt_lane_padding():
    # B not a multiple of B_blk: padded lanes must not corrupt real lanes
    rng = np.random.default_rng(1)
    n, chi, G, d, m = 6, 4, 3, 2, 2
    d2 = d * d
    stack = (rng.normal(size=(n, chi, G, chi))
             + 1j * rng.normal(size=(n, chi, G, chi))) / chi
    caps = rng.normal(size=(n + 1, chi)) + 1j * rng.normal(size=(n + 1, chi))
    g_of_s = rng.integers(0, G, size=d2)
    E = np.eye(d2).astype(complex)
    rho0 = rng.normal(size=d2) + 1j * rng.normal(size=d2)
    W = rng.normal(size=(m, d2)) + 1j * rng.normal(size=(m, d2))
    U3 = rng.normal(size=(n, 3, d, d)) + 1j * rng.normal(size=(n, 3, d, d))
    y3 = pt_area_sweep_pallas(stack, caps, g_of_s, U3, E, rho0, W, B_blk=64)
    y_ref = _reference(stack, caps, g_of_s, U3, E, rho0, W)
    assert y3.shape == y_ref.shape
    assert np.max(np.abs(y3 - y_ref)) / np.max(np.abs(y_ref)) < 1e-5
