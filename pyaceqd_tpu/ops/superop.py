"""Superoperator construction in the row-major vec convention.

Convention: vec(rho)[i*d + j] = rho[i, j]  (NumPy C-order flatten), matching
how the reference reshapes density matrices when applying ACE dynamical maps
(e.g. ``rho0.reshape(dim**2)`` + ``dm @ rho``,
/root/reference/pyaceqd/tools.py:567-608).  In this convention:

    vec(A rho B) = (A  ⊗  B^T) vec(rho)

so left-multiplication is A ⊗ I, right-multiplication is I ⊗ B^T,
the commutator superoperator is H ⊗ I - I ⊗ H^T, and the Lindblad
dissipator for collapse operator L with rate gamma is

    D[L] = gamma [ L ⊗ L*  -  1/2 (L†L ⊗ I  +  I ⊗ (L†L)^T) ].

All builders return NumPy complex128 host arrays; the engine casts them to
the configured device dtype once per simulation.
"""

import numpy as np


def vec(rho: np.ndarray) -> np.ndarray:
    """Row-major vectorization."""
    return np.reshape(rho, (-1,))


def unvec(v: np.ndarray, d: int) -> np.ndarray:
    return np.reshape(v, (d, d))


def left_mult(A: np.ndarray) -> np.ndarray:
    """Superoperator for rho -> A rho."""
    d = A.shape[0]
    return np.kron(A, np.eye(d, dtype=A.dtype))


def right_mult(B: np.ndarray) -> np.ndarray:
    """Superoperator for rho -> rho B."""
    d = B.shape[0]
    return np.kron(np.eye(d, dtype=B.dtype), B.T)


def sandwich(O: np.ndarray) -> np.ndarray:
    """Superoperator for rho -> O rho O^dagger (ACE apply_Operator semantics,
    /root/reference/pyaceqd/general_system/general_system.py:283)."""
    return np.kron(O, O.conj())


def commutator(H: np.ndarray) -> np.ndarray:
    """Superoperator for rho -> [H, rho]."""
    d = H.shape[0]
    I = np.eye(d, dtype=H.dtype)
    return np.kron(H, I) - np.kron(I, H.T)


def dissipator(L: np.ndarray, rate: float = 1.0) -> np.ndarray:
    """Lindblad dissipator superoperator: rate * D[L]."""
    d = L.shape[0]
    I = np.eye(d, dtype=L.dtype)
    LdL = L.conj().T @ L
    return rate * (np.kron(L, L.conj()) - 0.5 * (np.kron(LdL, I) + np.kron(I, LdL.T)))


def trace_vector(O: np.ndarray) -> np.ndarray:
    """Row vector w such that w @ vec(rho) = Tr(O rho)."""
    return vec(O.T)


def vpu_sandwich(rho_m, U):
    """U rho U^dagger for stacked density matrices rho_m (..., d, d) with a
    single U (d, d), as broadcast-multiply-reduce.

    On TPU, dot_general on d<=6 matrices pads the 128-wide MXU tiles ~32x;
    the elementwise broadcast keeps the contraction on the VPU (measured 2.6x
    faster at d=4, and it vmaps to the batch-explicit form for free)."""
    import jax.numpy as jnp
    t1 = (U[..., :, :, None] * rho_m[..., None, :, :]).sum(axis=-2)
    return (t1[..., :, None, :] * jnp.conj(U)[..., None, :, :]).sum(axis=-1)
